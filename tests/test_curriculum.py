"""Curriculum ordering: the approx-percentile production path must
agree with the registered exact form at test sf, and the cutpoint
aggregation must stay a normal partial+final agg (no window, no
corpus-grain sort) in both forms."""

from __future__ import annotations

import pytest

from spark_kinesis_article_analysis_spark.functions.curriculum import (
    corpus_curriculum_order,
    curriculum_phases,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from tests.conftest import SF_SMOKE


@pytest.mark.parity
class TestCurriculum:
    def test_approx_path_matches_exact_at_test_sf(self, spark):
        """accuracy >> n makes the Greenwald-Khanna summary exact, so
        the production path must be ROW-identical to the exact spec —
        any divergence here is a phase-rule drift, not approx error."""
        exact = {
            r.doc_id: (r.source, r.score, r.phase, r.shuffle_key)
            for r in corpus_curriculum_order(spark, SF_SMOKE).collect()
        }
        approx = {
            r.doc_id: (r.source, r.score, r.phase, r.shuffle_key)
            for r in curriculum_phases(spark, SF_SMOKE).collect()
        }
        assert approx == exact
        assert exact, "empty corpus — test is vacuous"

    def test_phases_cover_and_are_ordered(self, spark):
        """Every doc gets a phase in 1..4; quartile cutpoints mean no
        phase may hold more than ~half the corpus even with ties
        (boundary docs fall LEFT, piling onto the lower phase)."""
        rows = corpus_curriculum_order(spark, SF_SMOKE).collect()
        phases = [r.phase for r in rows]
        assert set(phases) <= {1, 2, 3, 4}
        # scores must be non-decreasing across phase boundaries
        by_phase: dict[int, list[float]] = {}
        for r in rows:
            by_phase.setdefault(r.phase, []).append(r.score)
        ordered = sorted(by_phase)
        for lo, hi in zip(ordered, ordered[1:]):
            assert max(by_phase[lo]) <= min(by_phase[hi]), (lo, hi)

    def test_no_window_in_either_plan(self, spark):
        """The scale claim: phase assignment is a broadcast of 3 doubles
        + a map projection — neither form may plan a Window (the ntile
        shape this operator exists to avoid)."""
        for df in (
            corpus_curriculum_order(spark, SF_SMOKE),
            curriculum_phases(spark, SF_SMOKE),
        ):
            plan = inspect.explain_str(df)
            assert "Window" not in plan, plan
            assert "CartesianProduct" not in plan, plan
