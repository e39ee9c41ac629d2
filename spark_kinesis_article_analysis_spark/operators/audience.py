"""Audience overlap — exact distinct-user set intersections between
event types.

The marketing/analytics form of a sketch-set operation ("how many users
who viewed also purchased"): for every event-type pair, the size of the
intersection of the two distinct-user sets, plus each side's distinct
total and the Jaccard of the pair. The engine's sketch family answers
this approximately (theta/HLL-style); with a bounded type universe the
EXACT relational form is one distinct fold and one self-equi-join:

1. distinct (event_type, user_id) — ONE corpus-grain shuffle; at 100 TB
   this is the same map-side-combined distinct every funnel needs,
2. self-join on user_id with type_a < type_b — fan-out per user is
   C(k, 2) where k <= |event types| (5 here), a constant,
3. per-pair count + a broadcast join back to the per-type totals.

Jaccard = inter / (n_a + n_b - inter) — one exact-integer division,
rounded 6 (identically on both engines).

NULL users own no audience membership and are excluded on both sides;
NULL event types likewise (a set with no name is not a set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "agg_audience_overlap",
    oracle="""
WITH du AS (
    SELECT DISTINCT event_type, user_id FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY event_type),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM du a JOIN du b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_common,
       round(n_common / CAST(ta.n + tb.n - n_common AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN tot ta ON ta.event_type = type_a
JOIN tot tb ON tb.event_type = type_b
""",
    tags=("aggregate", "set-ops", "audience", "distinct"),
    doc=(
        "Exact audience-overlap matrix: distinct users per event type, "
        "intersection size and Jaccard for every type pair (type_a < "
        "type_b). One distinct (type, user) shuffle; the self-join fans "
        "out C(k, 2) rows per user for k bounded by the type universe, "
        "and the per-type totals broadcast back. The exact twin of a "
        "theta-sketch set-operation query."
    ),
)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    du = e.select("event_type", "user_id").distinct()
    tot = du.groupBy("event_type").agg(F.count("*").alias("n"))
    a = du.alias("a")
    b = du.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    ta = tot.alias("ta")
    tb = tot.alias("tb")
    return (
        pairs.join(F.broadcast(ta), F.col("type_a") == F.col("ta.event_type"))
        .join(F.broadcast(tb), F.col("type_b") == F.col("tb.event_type"))
        .select(
            "type_a",
            "type_b",
            F.col("ta.n").alias("n_a"),
            F.col("tb.n").alias("n_b"),
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("ta.n") + F.col("tb.n") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
