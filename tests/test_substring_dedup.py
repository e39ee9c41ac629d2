"""Semantic + plan tests for the substring-grain dedup module
(functions/substring.py): ExactSubstr-style duplication stats and
RefinedWeb-style boilerplate removal.

Exact-parity vs DuckDB is covered by test_oracle_parity (both specs are
oracle-backed); generative hunting by the _DOC_SPECS rotation in
test_differential_fuzz. These tests pin the SEMANTICS on corpora where
the right answer is computable by hand, and the plan shapes the module
docstrings claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.functions.substring import (
    BOILER_DF_MIN,
    GRAM_CHARS,
    GRAM_STRIDE,
    boilerplate_filter,
    substring_cut,
    substring_dedup_stats,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS

SPECS = all_specs()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSubstringDedupStats:
    def test_identical_docs_fully_flagged_unique_doc_untouched(self, spark):
        shared = "abcdefghij" * 4  # 40 chars -> gram starts 1, 11, 21
        other = "0123456789" * 4
        out = {
            r["doc_id"]: r
            for r in substring_dedup_stats(
                _docs(spark, [(1, shared), (2, shared), (3, other)])
            ).collect()
        }
        assert out[1]["n_grams"] == out[2]["n_grams"] == 3
        assert out[1]["dup_grams"] == out[2]["dup_grams"] == 3
        assert out[1]["dup_ratio"] == 1.0
        assert out[3]["dup_grams"] == 0 and out[3]["dup_ratio"] == 0.0

    def test_within_document_repetition_never_flags(self, spark):
        # One doc made of the same 20-char block twice: its stride-grams
        # repeat INSIDE the doc, but distinct-doc frequency stays 1.
        block = "qwertyuiopasdfghjkl;"
        assert len(block) == GRAM_CHARS
        out = substring_dedup_stats(_docs(spark, [(1, block * 2)])).collect()
        assert len(out) == 1 and out[0]["dup_grams"] == 0

    def test_shared_prefix_flags_only_covered_grams(self, spark):
        # Docs share the first 25 chars; gram at position 11 spans
        # chars 11-30, which differ between the docs -> only the
        # position-1 gram is duplicated.
        prefix = "SHARED-PREFIX-25-chars..."  # 25 chars
        assert len(prefix) == 25
        a, b = prefix + "AAAAAAAAAAAAAAA", prefix + "BBBBBBBBBBBBBBB"
        out = {
            r["doc_id"]: r
            for r in substring_dedup_stats(_docs(spark, [(1, a), (2, b)])).collect()
        }
        assert out[1]["n_grams"] == 3  # 40 chars: starts 1, 11, 21
        assert out[1]["dup_grams"] == 1 and out[2]["dup_grams"] == 1

    def test_short_and_null_docs_absent(self, spark):
        out = substring_dedup_stats(
            _docs(spark, [(1, "x" * (GRAM_CHARS - 1)), (2, None), (3, "y" * GRAM_CHARS)])
        ).collect()
        assert {r["doc_id"] for r in out} == {3}
        assert out[0]["n_grams"] == 1  # exactly one full-width start

    def test_stride_arithmetic_boundary(self, spark):
        # length == GRAM_CHARS + GRAM_STRIDE - 1 -> still one gram;
        # +1 more char -> two grams.
        one = "a" * (GRAM_CHARS + GRAM_STRIDE - 1)
        two = "b" * (GRAM_CHARS + GRAM_STRIDE)
        out = {
            r["doc_id"]: r["n_grams"]
            for r in substring_dedup_stats(_docs(spark, [(1, one), (2, two)])).collect()
        }
        assert out == {1: 1, 2: 2}


class TestBoilerplateFilter:
    def test_boilerplate_dropped_from_every_copy(self, spark):
        # 'the cookie banner' (one 3-word segment) appears in 3 docs ->
        # dropped everywhere, including its first occurrence; the 2-doc
        # segment 'real content here' survives both copies.
        rows = [
            (1, "the cookie banner"),
            (2, "the cookie banner real content here"),
            (3, "the cookie banner real content here"),
        ]
        out = {r["doc_id"]: r for r in boilerplate_filter(_docs(spark, rows)).collect()}
        assert out[1]["segs_kept"] == 0 and out[1]["clean_text"] is None
        assert out[2]["clean_text"] == "real content here"
        assert out[3]["segs_dropped"] == 1
        assert BOILER_DF_MIN == 3

    def test_below_threshold_segments_survive(self, spark):
        rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma")]
        out = boilerplate_filter(_docs(spark, rows)).collect()
        assert all(r["clean_text"] == "alpha beta gamma" for r in out)

    def test_contrast_with_keep_first_segment_dedup(self, spark):
        # The policy difference vs corpus.segment_dedup: on a segment in
        # >= DF_MIN docs, keep-first retains exactly ONE copy while
        # boilerplate removal retains ZERO.
        from spark_kinesis_article_analysis_spark.functions.corpus import segment_dedup

        rows = [(i, "the cookie banner") for i in range(1, 4)]
        keep_first = segment_dedup(_docs(spark, rows)).agg(F.sum("segs_kept")).first()[0]
        boiler = boilerplate_filter(_docs(spark, rows)).agg(F.sum("segs_kept")).first()[0]
        assert keep_first == 1 and boiler == 0

    def test_reassembly_preserves_order_around_dropped_segment(self, spark):
        # 9 words = 3 segments; the middle one is boilerplate (3 docs).
        mid = "drop this segment"
        rows = [
            (1, f"first part here {mid} last part here"),
            (2, f"other lead words {mid} other tail words"),
            (3, mid),
        ]
        out = {r["doc_id"]: r for r in boilerplate_filter(_docs(spark, rows)).collect()}
        assert out[1]["clean_text"] == "first part here last part here"
        assert out[2]["clean_text"] == "other lead words other tail words"
        assert out[1]["segs_kept"] == 2 and out[1]["segs_dropped"] == 1

    def test_null_text_doc_present_with_empty_segment(self, spark):
        # NULL -> '' (one empty segment), mirroring the oracle's
        # coalesce: the doc stays in the output.
        out = boilerplate_filter(_docs(spark, [(1, None), (2, "alpha beta gamma")])).collect()
        assert {r["doc_id"] for r in out} == {1, 2}


class TestSubstringCut:
    def test_identical_docs_fully_cut(self, spark):
        shared = "abcdefghij" * 4  # 40 chars, all grams duplicated
        out = {
            r["doc_id"]: r
            for r in substring_cut(_docs(spark, [(1, shared), (2, shared)])).collect()
        }
        # flags at 1, 11, 21 -> merged interval [1, 40]: nothing survives
        assert out[1]["clean_text"] == "" and out[1]["n_removed_chars"] == 40
        assert out[2]["clean_text"] == ""

    def test_shared_prefix_cuts_only_flagged_interval(self, spark):
        prefix = "SHARED-PREFIX-25-chars..."  # 25 chars; only gram @1 is shared
        a, b = prefix + "AAAAAAAAAAAAAAA", prefix + "BBBBBBBBBBBBBBB"
        out = {
            r["doc_id"]: r for r in substring_cut(_docs(spark, [(1, a), (2, b)])).collect()
        }
        # removed [1, 20]; chars 21..40 survive
        assert out[1]["clean_text"] == a[GRAM_CHARS:]
        assert out[1]["n_removed_chars"] == GRAM_CHARS
        assert out[2]["clean_text"] == b[GRAM_CHARS:]

    def test_unique_and_short_docs_pass_through(self, spark):
        rows = [(1, "a unique forty character string right here!"), (2, "short one"), (3, None), (4, "")]
        out = {r["doc_id"]: r for r in substring_cut(_docs(spark, rows)).collect()}
        assert set(out) == {1, 2}  # NULL and empty text excluded
        assert out[1]["clean_text"] == rows[0][1] and out[1]["n_removed_chars"] == 0
        assert out[2]["clean_text"] == "short one"

    def test_overlapping_flags_merge(self, spark):
        # Docs share chars 1..30 -> flags at 1 and 11; intervals [1,20]
        # and [11,30] merge to [1,30]; tails (10 chars) differ per doc.
        shared30 = "0123456789" * 3
        a, b = shared30 + "AAAAAAAAAA", shared30 + "BBBBBBBBBB"
        out = {
            r["doc_id"]: r for r in substring_cut(_docs(spark, [(1, a), (2, b)])).collect()
        }
        assert out[1]["clean_text"] == "AAAAAAAAAA" and out[1]["n_removed_chars"] == 30

    def test_agrees_with_stats_flags(self, spark):
        """A doc has n_removed_chars == 0 exactly when the stats operator
        reports dup_grams == 0 (docs long enough to gram at all)."""
        rows = [
            (1, "abcdefghij" * 4),
            (2, "abcdefghij" * 4),
            (3, "a unique forty character string right here!"),
        ]
        cut = {r["doc_id"]: r for r in substring_cut(_docs(spark, rows)).collect()}
        stats = {
            r["doc_id"]: r for r in substring_dedup_stats(_docs(spark, rows)).collect()
        }
        for d in stats:
            assert (cut[d]["n_removed_chars"] == 0) == (stats[d]["dup_grams"] == 0)


class TestSubstringPlans:
    def test_substring_dedup_plan_shape(self, spark):
        """Gram extraction stays JVM-side (no Python eval node), the flag
        join is a real equi-join (no nested loop / cartesian), and the
        parquet scan prunes to (doc_id, text)."""
        df = SPECS["text_substring_dedup"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
        assert "EvalPython" not in plan, plan
        assert "Window" not in plan, plan
        assert set(inspect.read_schema_columns(df)) <= {"doc_id", "text"}, plan

    def test_boilerplate_plan_shape(self, spark):
        """Same claims for the segment form — and reassembly is the
        collect_list aggregate, never a corpus-grain window."""
        df = SPECS["text_boilerplate_segments"].build(spark, SF_CORRECTNESS)
        plan = inspect.explain_str(df)
        assert "CartesianProduct" not in plan, plan
        assert "EvalPython" not in plan, plan
        assert "Window" not in plan, plan
        assert set(inspect.read_schema_columns(df)) <= {"doc_id", "text"}, plan
