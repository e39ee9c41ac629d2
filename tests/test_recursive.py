"""Semantic + plan pins for the WITH RECURSIVE surface
(operators/recursive.py). Exact cross-engine parity is covered by
test_oracle_parity; these pin closed-form facts about the recursion
itself and the loop-body plan shape."""

from __future__ import annotations

import math

from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS

SPECS = all_specs()


class TestRecursiveBom:
    def test_closed_form_on_full_binary_subtrees(self, spark):
        """Roots whose whole binary subtree fits under max partkey have
        exactly 2^(d+1)-1 components at depth d — check the largest
        root (8), whose subtree is complete in the sf0.01 part table
        (keys to 1999: 8's deepest descendants are 1024..2047 clipped,
        so depth 7 with the 255-node complete-through-depth-7 count)."""
        out = {r["root"]: r for r in SPECS["sql_recursive_bom"].build(spark, SF_CORRECTNESS).collect()}
        assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}
        r8 = out[8]
        assert r8["n_components"] == 255 and r8["max_depth"] == 7
        # Every root's tree contains at least itself plus both direct
        # children (keys 2r, 2r+1 <= 17 all exist).
        assert all(out[r]["n_components"] >= 3 for r in out)
        # Nested subtree consistency: root 4's tree is a sub-multiset of
        # root 2's, which is a sub-multiset of root 1's.
        assert out[1]["n_components"] > out[2]["n_components"] > out[4]["n_components"]

    def test_plan_is_unionloop(self, spark):
        df = SPECS["sql_recursive_bom"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert "UnionLoop" in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestRecursiveAncestors:
    def test_chain_len_is_floor_log2(self, spark):
        out = SPECS["sql_recursive_ancestors"].build(spark, SF_CORRECTNESS).collect()
        assert len(out) == 512
        for r in out:
            assert r["chain_len"] == int(math.floor(math.log2(r["custkey"]))), r
            # Path-key sum: k + k//2 + ... + 1, computable directly.
            k, s = r["custkey"], 0
            while k >= 1:
                s += k
                k //= 2
            assert r["ancestor_key_sum"] == s, r

    def test_plan_is_unionloop_no_join(self, spark):
        """Pure-projection recursion: the loop body must contain no join
        at all — each iteration is a map over the previous frontier."""
        df = SPECS["sql_recursive_ancestors"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert "UnionLoop" in plan, plan
        assert "Join" not in plan, plan
