"""Curriculum ordering — the training-schedule stage of an LLM data
pipeline: assign every document a curriculum PHASE by quality quartile
and a deterministic intra-phase shuffle key, so the trainer streams
easy->hard (or any phase permutation) with a reproducible order and no
global sort.

Scale shape (the reason this isn't just ``ntile()``): a global NTILE
is a single-partition window — the one-reducer sort that dies first at
100 TB. Instead the quartile CUTPOINTS are computed once (3 doubles)
and broadcast back; phase assignment and the shuffle key are then pure
map-side expressions — zero windows, zero corpus-grain sorts. The
consumer orders by (phase, shuffle_key) with a range-partitioned
write, which Spark plans as a scalable range shuffle, not a single
reducer. The shuffle key is content-addressed (md5 of the doc id — the
``corpus_shuffle_deterministic`` / ``split_hash_assign`` discipline),
so the order is stable across runs, engines, and partitionings.

Cutpoint paths, stated honestly (r11 verdict item 6 — the earlier
docstring claimed the one-reducer bottleneck was avoided while the
EXACT percentile buffered every corpus score in one final aggregation
buffer):

* The registered spec uses exact ``percentile_disc`` — the
  oracle-parity twin. Discrete, not continuous (ADVICE r11): the
  cutpoint is an exact corpus value, so cross-engine agreement is a
  value comparison, not a last-ulp interpolation coincidence
  (``quantile_cont``'s midpoint arithmetic could flip a rounded
  cutpoint between Spark and DuckDB). Exact percentiles DO buffer all
  values of the aggregation in one buffer — fine at oracle scale,
  not the 100 TB path.
* :func:`curriculum_phases` is the production path: cutpoints from
  ``approx_percentile`` (Greenwald-Khanna summaries — MERGEABLE
  partial state, bounded by the accuracy parameter, never by corpus
  size), identical map-side phase assignment. At test sf the approx
  summary is exact (accuracy >> n) and pytest pins full agreement
  with the exact form; at 100 TB the phase boundary can move by the
  documented 1/accuracy rank error — harmless for a curriculum, which
  needs stable quantile BANDS, not exact order statistics.

Quality proxy here is mean word length (``n_chars / token count`` —
deterministic from the table; any scored column slots in: the gopher
gate's signals, ``text_unigram_logprob``, a classifier score). Scores
are rounded to 6 on both sides before comparison; boundary docs
(score == cutpoint) fall LEFT (phase = 1 + count of cutpoints strictly
below), same rule both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        "source",
        F.round(F.col("n_chars") / F.size(F.split("text", r"\s+")), 6).alias("score"),
    )


def _phase_projection(scored: DataFrame, cuts: DataFrame) -> DataFrame:
    """Broadcast the 3-double cutpoint row back and assign phases as a
    pure map expression — shared by the exact spec and the approx
    production path so the assignment rule cannot drift."""
    return scored.join(F.broadcast(cuts)).select(
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


@register(
    "corpus_curriculum_order",
    oracle=r"""
WITH s AS (
    SELECT doc_id, source,
           round(n_chars / len(string_split_regex(text, '[ \t\n\x0b\f\r]+')), 6) AS score
    FROM documents WHERE text IS NOT NULL
),
cuts AS (
    SELECT quantile_disc(score, 0.25) AS c1,
           quantile_disc(score, 0.5)  AS c2,
           quantile_disc(score, 0.75) AS c3
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
        "Curriculum ordering: quality-quartile phase from DISCRETE "
        "percentile cutpoints (percentile_disc — exact corpus values, "
        "so the Spark/DuckDB agreement is a value comparison, not an "
        "interpolation coincidence) broadcast back as 3 doubles — NO "
        "global ntile window — plus a content-addressed intra-phase "
        "shuffle key (md5 of the doc id — reproducible across runs/"
        "engines/partitionings). The trainer streams ORDER BY (phase, "
        "shuffle_key) via a range shuffle. Phase assignment and the key "
        "are pure map expressions. This exact form is the oracle-parity "
        "twin; exact percentiles buffer the group's values in one "
        "aggregation buffer, so the 100 TB path is curriculum_phases "
        "(approx_percentile — mergeable bounded summaries), pinned "
        "equal at test sf in tests/test_curriculum.py."
    ),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir)
    cuts = scored.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY score)").alias("c1"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY score)").alias("c2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY score)").alias("c3"),
    )
    return _phase_projection(scored, cuts)


def curriculum_phases(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """The production-scale twin of ``corpus_curriculum_order``:
    identical output schema and phase rule, but cutpoints come from
    ``approx_percentile(score, ..., accuracy)`` — Greenwald-Khanna
    quantile summaries whose partial state is MERGEABLE and bounded by
    ``accuracy`` (not by corpus size), so the cutpoint aggregation is a
    normal partial+final agg with no one-reducer value buffer. Rank
    error is <= 1/accuracy of the corpus per cutpoint — a phase BAND
    boundary, not a correctness boundary. At test sf (n << accuracy)
    the summary is exact and pytest pins row-identical agreement with
    the registered exact form."""
    scored = _scored(spark, sf_dir)
    cuts = scored.agg(
        F.expr(
            f"approx_percentile(score, array(0.25, 0.5, 0.75), {accuracy})"
        ).alias("q")
    ).select(
        F.col("q")[0].alias("c1"), F.col("q")[1].alias("c2"), F.col("q")[2].alias("c3")
    )
    return _phase_projection(scored, cuts)
