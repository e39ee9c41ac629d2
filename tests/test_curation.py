"""Semantic + plan pins for the corpus-curation surface
(functions/curation.py). Cross-engine exactness is covered by
test_oracle_parity and the doc-family fuzz; these pin the containment
math against the Jaccard twin and the domain cap's budget/determinism
contract and skew-bounded plan."""

from __future__ import annotations

from spark_kinesis_article_analysis_spark.functions.curation import (
    CONTAINMENT_MIN,
    DOMAIN_CAP,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS

SPECS = all_specs()


class TestContainment:
    def test_thresholds_and_bounds(self, spark):
        rows = SPECS["dedup_containment"].build(spark, SF_CORRECTNESS).collect()
        assert rows, "fixture corpus should surface containment pairs"
        for r in rows:
            assert 0 < r["containment_a"] <= 1 and 0 < r["containment_b"] <= 1, r
            assert max(r["containment_a"], r["containment_b"]) >= CONTAINMENT_MIN, r
            assert r["doc_a"] < r["doc_b"], r

    def test_containment_dominates_jaccard(self, spark):
        """|A∩B|/|A| >= |A∩B|/|A∪B| always — every Jaccard pair at the
        shared 0.1 floor must also appear in the containment frame when
        either side reaches 0.5, and its containment values must bound
        its Jaccard from above (the short-side sensitivity this operator
        exists for)."""
        cont = {
            (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
            for r in SPECS["dedup_containment"].build(spark, SF_CORRECTNESS).collect()
        }
        jac = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in SPECS["dedup_ngram_jaccard"].build(spark, SF_CORRECTNESS).collect()
        }
        overlap = set(cont) & set(jac)
        assert overlap, "fixtures should produce pairs visible to both"
        for pair in overlap:
            ca, cb = cont[pair]
            # rounding on both sides is 6 digits; allow one ulp of it
            assert max(ca, cb) >= jac[pair] - 1e-6, (pair, cont[pair], jac[pair])

    def test_plan_single_index_shuffle(self, spark):
        """Same inverted-index shape as dedup_ngram_jaccard: no shingle-
        grain self-join (which would scan the corpus twice), no cartesian
        product."""
        df = SPECS["dedup_containment"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert "CartesianProduct" not in plan, plan


class TestDomainCap:
    def test_budget_and_audit_contract(self, spark):
        out = SPECS["corpus_domain_cap"].build(spark, SF_CORRECTNESS).collect()
        by_src: dict = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src) > 1
        for src, rows in by_src.items():
            kept = [r for r in rows if r["kept"]]
            assert len(kept) == min(DOMAIN_CAP, len(rows)), src
            ranks = sorted(r["domain_rank"] for r in kept)
            assert ranks == list(range(1, len(kept) + 1)), (src, ranks)
            assert all(r["domain_rank"] is None for r in rows if not r["kept"]), src

    def test_selection_is_deterministic(self, spark):
        a = {
            (r["doc_id"], r["kept"])
            for r in SPECS["corpus_domain_cap"].build(spark, SF_CORRECTNESS).collect()
        }
        b = {
            (r["doc_id"], r["kept"])
            for r in SPECS["corpus_domain_cap"].build(spark, SF_CORRECTNESS).collect()
        }
        assert a == b

    def test_plan_is_sharded_rank_plus_broadcast(self, spark):
        """Two row_number windows (the (source, salt) shard rank and the
        survivor re-rank) and a BROADCAST winner join — never a single
        full-domain window over the corpus (the hot-domain straggler) and
        never a shuffled join against the bounded winner set."""
        import re

        df = SPECS["corpus_domain_cap"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan
        assert inspect.has_broadcast_join(df), plan
