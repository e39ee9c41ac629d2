"""Curriculum ordering — the training-schedule stage of an LLM data
pipeline: assign every document a curriculum PHASE by quality quartile
and a deterministic intra-phase shuffle key, so the trainer streams
easy->hard (or any phase permutation) with a reproducible order and no
global sort.

Scale shape (the reason this isn't just ``ntile()``): a global NTILE
is a single-partition window — the one-reducer sort that dies first at
100 TB. Instead the quartile CUTPOINTS are computed once (an exact
percentile aggregate, 3 doubles) and broadcast back; phase assignment
and the shuffle key are then pure map-side expressions — zero windows,
zero corpus-grain sorts. The consumer orders by (phase, shuffle_key)
with a range-partitioned write, which Spark plans as a scalable range
shuffle, not a single reducer. The shuffle key is content-addressed
(md5 of the doc id — the ``corpus_shuffle_deterministic`` /
``split_hash_assign`` discipline), so the order is stable across runs,
engines, and partitionings.

Quality proxy here is mean word length (``n_chars / token count`` —
deterministic from the table; any scored column slots in: the gopher
gate's signals, ``text_unigram_logprob``, a classifier score). Rounded
to 6 on both sides before comparison so phase boundaries are
engine-portable; boundary docs (score == cutpoint) fall LEFT
(phase = 1 + count of cutpoints strictly below), same rule both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "corpus_curriculum_order",
    oracle=r"""
WITH s AS (
    SELECT doc_id, source,
           round(n_chars / len(string_split_regex(text, '[ \t\n\x0b\f\r]+')), 6) AS score
    FROM documents WHERE text IS NOT NULL
),
cuts AS (
    SELECT round(quantile_cont(score, 0.25), 6) AS c1,
           round(quantile_cont(score, 0.5), 6)  AS c2,
           round(quantile_cont(score, 0.75), 6) AS c3
    FROM s
)
SELECT doc_id, source, score,
       CAST(1 + CASE WHEN score > c1 THEN 1 ELSE 0 END
              + CASE WHEN score > c2 THEN 1 ELSE 0 END
              + CASE WHEN score > c3 THEN 1 ELSE 0 END AS INT) AS phase,
       md5(doc_id::VARCHAR) AS shuffle_key
FROM s, cuts
""",
    tags=("corpus", "curriculum", "ordering", "north-star", "scale"),
    doc=(
        "Curriculum ordering: quality-quartile phase (exact percentile "
        "cutpoints broadcast back — NO global ntile window, the "
        "one-reducer sort that dies first at scale) plus a "
        "content-addressed intra-phase shuffle key (md5 of the doc id — "
        "reproducible across runs/engines/partitionings). The trainer "
        "streams ORDER BY (phase, shuffle_key) via a range shuffle. "
        "Phase assignment and the key are pure map expressions; the only "
        "aggregate is 3 doubles."
    ),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        "doc_id",
        "source",
        F.round(F.col("n_chars") / F.size(F.split("text", r"\s+")), 6).alias("score"),
    )
    cuts = scored.agg(
        F.round(F.expr("percentile(score, 0.25)"), 6).alias("c1"),
        F.round(F.expr("percentile(score, 0.5)"), 6).alias("c2"),
        F.round(F.expr("percentile(score, 0.75)"), 6).alias("c3"),
    )
    return (
        scored.join(F.broadcast(cuts))
        .select(
            "doc_id",
            "source",
            "score",
            (
                F.lit(1)
                + (F.col("score") > F.col("c1")).cast("int")
                + (F.col("score") > F.col("c2")).cast("int")
                + (F.col("score") > F.col("c3")).cast("int")
            ).alias("phase"),
            F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        )
    )
