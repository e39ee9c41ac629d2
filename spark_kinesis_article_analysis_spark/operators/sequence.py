"""Event-sequence pattern matching — the MATCH_RECOGNIZE-shaped
operator, rewritten as fold-to-string + regex.

``funnel_user_stages`` answers "did the user pass stages in order" with
a join cascade; the general form — "how many times does PATTERN occur
in a user's event sequence", with backtracking, negations, optional
steps — is what SQL standardizes as MATCH_RECOGNIZE (no Spark or DuckDB
support). The portable rewrite: fold each user's time-ordered event
TYPE INITIALS into one string (the five fixture types have distinct
initials: s/e/c/v/p for signup/error/click/view/purchase), then run
ordinary regexes over it. Regex engines scan left-to-right with
non-overlapping greedy matches on both engines, so counts agree; the
patterns stick to literal characters and negated character classes —
the constructs RE2 (DuckDB) and java.util.regex execute identically
(the fuzz-found divergence class is shorthand like \\s, avoided).

Patterns measured per user:

* ``v[^p]*p``  — a view CONVERTING to a purchase with no purchase in
  between (each purchase closes at most one conversion window).
* ``ee+``      — error bursts: two-plus consecutive errors.
* ``s[^p]*v[^p]*p`` (existence) — the signup -> view -> purchase funnel
  with no earlier purchase, the funnel spec's regex twin.

Scale shape: one user-keyed aggregate (collect_list is bounded by the
user's event count — the same per-key bound every sessionizer accepts);
the fold sorts (ts, event_id) structs inside the row and the regexes
are map-side over the folded string. NULL ts / NULL user rows are
excluded on both sides (the NULL-ts window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register

#: pattern -> output column (shared literal regex strings).
P_CONVERT = "v[^p]*p"
P_ERRBURST = "ee+"
P_FUNNEL = "s[^p]*v[^p]*p"


@register(
    "seq_pattern_events",
    oracle=f"""
WITH seqs AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
          AND event_type IS NOT NULL
    GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS BIGINT)                          AS seq_len,
       CAST(len(regexp_extract_all(seq, '{P_CONVERT}')) AS BIGINT)  AS n_conversions,
       CAST(len(regexp_extract_all(seq, '{P_ERRBURST}')) AS BIGINT) AS n_error_bursts,
       regexp_matches(seq, '{P_FUNNEL}')                    AS funnel_hit
FROM seqs
""",
    tags=("sequence", "pattern", "match-recognize", "temporal"),
    doc=(
        "MATCH_RECOGNIZE-shaped sequence analysis: fold each user's "
        "time-ordered event-type initials into a string (one user-keyed "
        "aggregate; ties break on event_id) and count regex patterns over "
        "it — view-to-purchase conversions with no intervening purchase, "
        "2+ error bursts, and the signup->view->purchase funnel hit. "
        "Non-overlapping greedy match counts agree across RE2 and Java "
        "for the literal/negated-class constructs used; shorthand classes "
        "(the known cross-engine divergence) are avoided."
    ),
)
def seq_pattern_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    seqs = (
        e.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("ini")).alias(
                "s"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["ini"]), ""
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit(P_CONVERT)).cast("long").alias("n_conversions"),
        F.regexp_count("seq", F.lit(P_ERRBURST)).cast("long").alias("n_error_bursts"),
        F.regexp_like("seq", F.lit(P_FUNNEL)).alias("funnel_hit"),
    )
