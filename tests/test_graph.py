"""Semantic pins for the integer-exact PageRank (functions/graph.py).
Cross-engine exactness is covered by test_oracle_parity; these pin the
mass-conservation arithmetic and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.functions.graph import (
    PR_NODE_MAX,
    PR_ROUNDS,
    PR_SCALE,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS

SPECS = all_specs()
_TELEPORT = 15 * PR_SCALE // 100


class TestPagerankPortable:
    def test_mass_conservation_within_floor_leakage(self, spark):
        """Total rank mass stays within the floor-division leakage bound
        of N * SCALE: each edge contribution floors away < 1 unit, and
        the geometric damping bounds the accumulated loss by
        E * rounds (loose) below the ideal fixed point."""
        out = SPECS["graph_pagerank_portable"].build(spark, SF_CORRECTNESS).collect()
        n = len(out)
        assert 0 < n <= PR_NODE_MAX
        total = sum(r["rank"] for r in out)
        n_edges = 2 * n - 1  # one modular edge per node + tree edges for node >= 2
        assert total <= n * PR_SCALE
        assert total >= n * PR_SCALE - 20 * n_edges * PR_ROUNDS
        # Every node keeps at least the teleport mass, and the root of
        # the tree edges (node 1) accumulates strictly more than it.
        ranks = {r["node"]: r["rank"] for r in out}
        assert all(v >= _TELEPORT for v in ranks.values())
        assert ranks[1] > _TELEPORT

    def test_plan_shape(self, spark):
        """Each round is an equi-join + aggregate: no cartesian/nested
        loop anywhere, and the N scalar reaches the edge derivation as a
        broadcast. Inspects the lazy frames (the registered builder
        checkpoints the result to release the edge cache, which truncates
        the inspectable plan)."""
        from spark_kinesis_article_analysis_spark.functions.graph import (
            _pagerank_frames,
        )

        df, edges = _pagerank_frames(spark, SF_CORRECTNESS)
        try:
            plan = inspect.explain_str(df)
            assert "CartesianProduct" not in plan, plan
            assert inspect.has_broadcast_join(df), plan
        finally:
            edges.unpersist()

    def test_builder_releases_edge_cache(self, spark):
        """The registered builder must not leak cached edge lists across
        repeated builds (bench warmups, fuzz rotation) — r7 ADVICE. Each
        build legitimately adds ONE persistent RDD (the localCheckpoint
        of the result, released when the frame is GC'd); a leaked edge
        cache would add a second per build."""
        def n_persistent() -> int:
            return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

        before = n_persistent()
        SPECS["graph_pagerank_portable"].build(spark, SF_CORRECTNESS).collect()
        SPECS["graph_pagerank_portable"].build(spark, SF_CORRECTNESS).collect()
        grown = n_persistent() - before
        assert grown <= 2, (
            f"persistent RDDs grew by {grown} over 2 builds (expected <= 2 "
            "checkpoint RDDs): the edge cache leaked"
        )
