"""PQ / IVFPQ ANN quality floors (VERDICT r11 item 3).

``bench.py`` records ADC and IVFPQ recall@5 every round alongside the
IVF curve, but a record is not a gate: the oracles reproduce the
QUANTIZED computation, not the exact neighbors, so a codebook edit
could halve ADC quality with every hash-match staying green. These
floors make such an edit fail loudly, mirroring tests/test_ivf.py.

Measured values (r12, sf0.01 geometry): ADC 0.20, IVFPQ 0.20 — the
synthetic corpus is near-isotropic, PQ's theoretical worst case (no
cluster structure for the per-subspace codebooks to exploit; see
SCALE.md round 11). At sf0.1 the pair measures 0.28/0.20. Floors sit
one 1/25 recall step (0.04) under the sf0.01 measurement so corpus
regeneration noise passes and algorithmic regressions do not.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS


def _recall(spark, sf_dir: str, name: str) -> float:
    from spark_kinesis_article_analysis_spark.registry import all_specs

    specs = all_specs()
    exact = (
        specs["sim_cosine_topk"].build(spark, sf_dir).select("query_id", "neighbor_id")
    )
    total = exact.count()
    assert total > 0, "exact top-k came back empty — recall undefined"
    approx = specs[name].build(spark, sf_dir).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    return hits / total


@pytest.mark.parity
class TestPqRecallFloor:
    def test_adc_recall_at_5_floor(self, spark):
        """Brute-force ADC over the full encoded corpus: recall@5 >= 0.16
        (sf0.01 measures 0.20). Below the floor means the codebook
        training or the distance-table/scan arithmetic regressed."""
        recall = _recall(spark, SF_CORRECTNESS, "sim_pq_adc_topk")
        assert recall >= 0.16, f"ADC recall@5 fell to {recall:.3f}"

    def test_ivfpq_recall_at_5_floor(self, spark):
        """The composed IVF-candidates + ADC-scoring stack: recall@5 >=
        0.15 (sf0.01 measures 0.20; the VERDICT r11 suggested floor).
        IVFPQ recall <= max(IVF candidate recall, ADC ranking quality)
        by construction, so a drop isolates to whichever half moved —
        cross-check tests/test_ivf.py."""
        recall = _recall(spark, SF_CORRECTNESS, "sim_ivfpq_topk")
        assert recall >= 0.15, f"IVFPQ recall@5 fell to {recall:.3f}"
