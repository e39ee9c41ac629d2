"""Join surface: broadcast/shuffled equi-joins (all outer flavors),
semi/anti, non-equi (range/theta), and an as-of join.

Absent from the reference (single-stream pipeline, SURVEY.md §2 Part B);
this is the standard surface any user of the engine needs.

Scale notes (100 TB):
- Constant-size dims (region: 5 rows, nation: 25) broadcast
  unconditionally — the fact side never shuffles for them. The
  SF-SCALING "dims" (customer/supplier/part grow linearly with the
  corpus in TPC-H) are hinted broadcast here because they fit at every
  test/bench SF, but the hint is a size claim, not physics: at 100 TB
  customer is TB-scale and the right plan is an un-hinted join — AQE
  broadcasts while it fits and falls back to sort-merge (over bucketed
  layouts, see tests/test_scale_layout.py) when it stops fitting.
- Fact-fact equi-joins (orders x lineitem) sort-merge on the key; at
  scale the right layout is bucketing both tables by orderkey so the
  exchange disappears — AQE + skew-join handles stragglers otherwise.
- The theta join is windowed to a bounded key (same brand) so the
  quadratic blow-up is per-group, not global; a pure cross join is
  deliberately not part of the surface.
- The as-of join is expressed with an analytic window over the unioned
  stream (sort within user partitions) rather than an inequality join —
  linear in rows after one shuffle, vs quadratic for the naive
  range-join formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "join_broadcast_dim",
    oracle="""
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("join", "broadcast", "agg"),
    doc=(
        "Fact x broadcast dim inner join + aggregate — the canonical "
        "star-schema probe. The hint is honest at this corpus's scale; "
        "see the module scale note for why a TPC-H customer table stops "
        "being broadcastable at 100 TB (it scales with SF)."
    ),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total_price"))
    )


@register(
    "join_multiway_star",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
GROUP BY n_name
""",
    tags=("join", "multiway", "star-schema"),
    doc="TPC-H Q5-shaped 5-way star join: fact chain + broadcast dims, revenue by nation.",
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0.0), 4) AS total_price
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
    tags=("join", "left-outer"),
    doc="LEFT OUTER join preserving customers with no orders (count=0, sum=0).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_price"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       count(DISTINCT c.c_custkey) AS n_customers,
       count(DISTINCT s.s_suppkey) AS n_suppliers
FROM customer c FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY coalesce(c.c_nationkey, s.s_nationkey)
""",
    tags=("join", "full-outer"),
    doc="FULL OUTER join: nations having customers, suppliers, or both.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.groupBy(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey")
    ).agg(
        F.countDistinct(c.c_custkey).alias("n_customers"),
        F.countDistinct(s.s_suppkey).alias("n_suppliers"),
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""",
    tags=("join", "semi"),
    doc="LEFT SEMI join (EXISTS): customers with at least one big order.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tags=("join", "anti"),
    doc="LEFT ANTI join (NOT EXISTS): customers with no orders at all.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_range_theta",
    oracle="""
SELECT a.p_brand AS p_brand, count(*) AS n_pairs
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size < b.p_size
GROUP BY a.p_brand
""",
    tags=("join", "non-equi", "theta"),
    doc=(
        "Theta join bounded by an equi key: same-brand part pairs where one is "
        "strictly larger. The equi conjunct keeps it a hash join with a residual "
        "predicate instead of a full BNLJ."
    ),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "part").alias("a")
    b = load(spark, sf_dir, "part").alias("b")
    return (
        a.join(b, (F.col("a.p_brand") == F.col("b.p_brand")) & (F.col("a.p_size") < F.col("b.p_size")))
        .groupBy(F.col("a.p_brand").alias("p_brand"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_interval_range",
    oracle="""
SELECT o_orderpriority, count(*) AS n_late_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
""",
    tags=("join", "range", "interval"),
    doc="Equi join + event-interval residual: lineitems shipped >60 days after order.",
)
def join_interval_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_lines"))
    )


@register(
    "join_asof_last_purchase",
    oracle="""
SELECT event_id, user_id, ts, last_purchase_ts
FROM (
    SELECT event_id, user_id, ts, event_type,
           max(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
    FROM events
)
WHERE event_type = 'click'
""",
    tags=("join", "asof"),
    doc=(
        "As-of join (Spark has no native one): for each click, the most recent "
        "purchase timestamp by the same user at-or-before it. Expressed as a "
        "running max over the time-sorted per-user stream — one shuffle, linear "
        "work, no inequality join blow-up (the scalable formulation; the "
        "general two-relation, payload-carrying form is "
        "operators/temporal.asof_join). The oracle window pins NULLS FIRST "
        "to match Spark's ascending sort, so a NULL-ts row gets a NULL "
        "match on both engines instead of DuckDB's tail placement seeing "
        "every purchase."
    ),
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return (
        ev.withColumn("last_purchase_ts", F.max(purchase_ts).over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )


@register(
    "join_range_binned",
    oracle="""
WITH periods AS (
    SELECT i AS promo_id,
           TIMESTAMP '1996-01-01' + i * INTERVAL 1 MONTH AS p_start,
           TIMESTAMP '1996-01-01' + i * INTERVAL 1 MONTH + INTERVAL 45 DAY AS p_end
    FROM (SELECT unnest(generate_series(0, 11)) AS i)
)
SELECT o_orderkey, promo_id, p_start, p_end
FROM orders JOIN periods
  ON o_orderdate >= p_start AND o_orderdate < p_end
""",
    tags=("join", "range", "binned", "scale"),
    doc=(
        "Binned range join: overlapping 45-day promo periods matched to "
        "orders. The naive plan is a BroadcastNestedLoopJoin evaluating "
        "every (order, period) pair; here each period explodes into the "
        "months it covers and the join is month-EQUI + residual range "
        "filter — hash-joinable, partition-prunable, and O(n + matches) "
        "instead of O(n x periods) at 100 TB. The oracle is the plain "
        "range-join semantics, proving the rewrite is lossless."
    ),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = F.lit("1996-01-01").cast("timestamp")
    periods = spark.range(12).select(
        F.col("id").cast("int").alias("promo_id"),
        F.timestamp_add("MONTH", F.col("id"), base).alias("p_start"),
        F.timestamp_add(
            "DAY", F.lit(45), F.timestamp_add("MONTH", F.col("id"), base)
        ).alias("p_end"),
    )
    # explode each period into the calendar months it overlaps -> equi key
    binned = periods.select(
        "promo_id",
        "p_start",
        "p_end",
        F.explode(
            F.sequence(
                F.date_trunc("month", "p_start"),
                F.date_trunc("month", F.timestamp_add("DAY", F.lit(-1), F.col("p_end"))),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("bin_month"),
    )
    return (
        o.withColumn("bin_month", F.date_trunc("month", "o_orderdate"))
        .join(F.broadcast(binned), "bin_month")
        .filter(
            (F.col("o_orderdate") >= F.col("p_start"))
            & (F.col("o_orderdate") < F.col("p_end"))
        )
        .select("o_orderkey", "promo_id", "p_start", "p_end")
    )
