"""Analytic (OVER-clause) window functions: ranking, offsets, frames.

Distinct from the *time* windows of the reference (``F.window`` is a
grouping construct); absent from the reference entirely (SURVEY.md §2
Part B).

Determinism discipline: every ORDER BY carries a unique-key tiebreak so
rank/lag/frame results are identical across engines regardless of
physical row order.

Scale notes: each query is one shuffle on the partition key, then a
per-partition sort. Skewed partition keys (one giant customer) are the
classic hazard — at 100 TB either pre-aggregate, or split frames with
a two-level key. No driver-side work anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "window_ranking",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    tags=("window-analytic", "ranking"),
    doc="row_number / rank / dense_rank / ntile over a keyed ordering.",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       round(o_totalprice - coalesce(lag(o_totalprice) OVER w, 0.0), 4) AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC)
""",
    tags=("window-analytic", "offset"),
    doc="lag/lead offsets along each customer's order history.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc_nulls_first(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 4
        ).alias("price_delta"),
    )


@register(
    "window_frames_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_total,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
           AS moving_avg3
FROM orders
""",
    tags=("window-analytic", "frames"),
    doc="ROWS frames: running total + 3-row moving average per customer.",
)
def window_frames_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ordering = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc_nulls_first(), F.col("o_orderkey").asc())
    running = ordering.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = ordering.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(running), 4).alias("running_total"),
        F.round(F.avg("o_totalprice").over(moving), 6).alias("moving_avg3"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT p_brand, p_partkey, p_size,
       count(*) OVER (PARTITION BY p_brand ORDER BY p_size
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar_smaller
FROM part
""",
    tags=("window-analytic", "range-frame"),
    doc="RANGE frame over a numeric ordering (peers within 5 size units).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_size").asc()).rangeBetween(-5, W.currentRow)
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.count("*").over(w).alias("n_similar_smaller"),
    )


@register(
    "window_first_last_nth",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w                 AS first_price,
       last_value(o_totalprice)  OVER w                 AS latest_price,
       nth_value(o_totalprice, 2) OVER w                AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window-analytic", "first-last-nth"),
    doc="first_value/last_value/nth_value over an explicit full-partition frame.",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_first(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist()    OVER w, 6) AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal NULLS FIRST, c_custkey)
""",
    tags=("window-analytic", "distribution"),
    doc=(
        "percent_rank + cume_dist distribution functions over per-segment "
        "balance order. NULLS FIRST pinned in the oracle: Spark ASC is "
        "NULLS FIRST, DuckDB ASC defaults NULLS LAST — a NULL balance "
        "shifts EVERY row's cume_dist in the partition (fuzz-found)."
    ),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:

    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_first(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
