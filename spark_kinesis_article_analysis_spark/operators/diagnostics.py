"""Data-distribution diagnostics — the queries an operator of a 100 TB
pipeline runs BEFORE picking a partitioning strategy.

Skew is the single biggest silent killer at scale (one hot key
serializes a reducer while 999 executors idle); ``diag_key_skew``
quantifies it per key so salting / AQE-skew-join decisions are driven
by a measured ratio instead of a post-mortem. The same two-phase shape
(per-key counts, then a bounded top-k against broadcast globals) stays
cheap at any corpus size: one shuffle at key grain, one single-row
stats fold, one TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register

#: how many of the hottest keys to report
SKEW_TOP = 20


@register(
    "diag_key_skew",
    oracle=f"""
WITH c AS (
    SELECT user_id, count(*) AS cnt
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
),
g AS (SELECT sum(cnt) AS total, avg(cnt) AS mean_cnt, count(*) AS n_keys FROM c)
SELECT user_id, cnt,
       round(cnt / CAST(total AS DOUBLE), 6) AS share,
       round(cnt / mean_cnt, 4)              AS skew_ratio,
       n_keys
FROM c, g
ORDER BY cnt DESC, user_id ASC
LIMIT {SKEW_TOP}
""",
    tags=("diagnostics", "skew", "scale"),
    doc=(
        "Shuffle-key skew profile for events.user_id: the hottest "
        f"{SKEW_TOP} keys with their row count, corpus share, and ratio "
        "to the mean key size — the number that decides between a plain "
        "hash join and a salted/AQE-skew plan. Two bounded phases: one "
        "key-grain count shuffle (map-side partial), a single-row "
        "global-stats fold broadcast back, and a TakeOrderedAndProject "
        "cut — nothing at corpus grain leaves the first aggregation."
    ),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    stats = counts.agg(
        F.sum("cnt").alias("total"),
        F.avg("cnt").alias("mean_cnt"),
        F.count("*").alias("n_keys"),
    )
    return (
        counts.join(F.broadcast(stats))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("total").cast("double"), 6).alias("share"),
            F.round(F.col("cnt") / F.col("mean_cnt"), 4).alias("skew_ratio"),
            "n_keys",
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        .limit(SKEW_TOP)
    )
