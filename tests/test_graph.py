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
        broadcast."""
        df = SPECS["graph_pagerank_portable"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert "CartesianProduct" not in plan, plan
        assert inspect.has_broadcast_join(df), plan
