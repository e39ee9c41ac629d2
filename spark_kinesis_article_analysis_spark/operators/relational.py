"""Relational core: filters/predicates, sort/limit/top-k, set ops, distinct.

The reference has none of these (SURVEY.md §2 Part B — its pipeline has
no ``.filter()``, no sorts, no set ops), so this module supplies the
standard surface over the TPC-H-ish corpus.

Scale notes: every query here is a single scan plus at most one shuffle
(sort or aggregate). Filters are plain Catalyst predicates so they push
into the parquet scan (visible as ``PushedFilters`` in the plan);
projections prune columns at the reader (``ReadSchema``). Global top-k
plans as ``TakeOrderedAndProject`` (per-partition heap + driver merge of
k rows — no full sort, no full shuffle) which is exactly what you want
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_returnflag IN ('A', 'R')
  AND l_quantity IS NOT NULL
  AND l_extendedprice > 1000.0
""",
    tags=("filter", "pushdown"),
    doc="Comparison + BETWEEN + IN + IS NOT NULL predicate stack, pushed to the scan.",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.02, 0.08)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").isNotNull()
        & (F.col("l_extendedprice") > 1000.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@register(
    "filter_like_rlike",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name LIKE '%a%' AND regexp_matches(p_type, '^[A-Z]')
  AND p_brand NOT LIKE 'Brand#4%'
""",
    tags=("filter", "string-predicate"),
    doc="LIKE / NOT LIKE / regex predicate filters.",
)
def filter_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%a%")
        & F.col("p_type").rlike("^[A-Z]")
        & ~F.col("p_brand").like("Brand#4%")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "sort_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
    tags=("sort", "limit", "topk"),
    doc="Global top-k: ORDER BY + LIMIT, planned as TakeOrderedAndProject (no full sort).",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # unique-key tiebreak keeps the result deterministic under ties
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_name, c_acctbal
FROM (
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
    FROM customer
) WHERE rn <= 3
""",
    tags=("topk", "window-analytic"),
    doc="Top-k per group via row_number() — the scalable per-group top-k idiom.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
    doc="DISTINCT over a projection (hash aggregate, map-side partial).",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "setop_union_all",
    oracle="""
SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT s_suppkey AS key, s_name AS name FROM supplier
""",
    tags=("setop", "union"),
    doc="UNION ALL (unionByName) of two conformed projections.",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"), F.col("c_name").alias("name"))
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return c.unionByName(s)


@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "intersect"),
    doc="INTERSECT (distinct) of nation keys present on both sides.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "except"),
    doc="EXCEPT ALL (bag semantics) — exceptAll().",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("tpch", "q6", "agg", "pushdown"),
    doc="TPC-H Q6 shape: fully-pushed-down scan + single global aggregate.",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-01'
  AND l_shipdate  > TIMESTAMP '1996-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
    tags=("tpch", "q3", "join", "topk"),
    doc="TPC-H Q3 shape: selective dim filter -> fact join -> grouped revenue -> top-10.",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-06-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-06-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
WITH big AS (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 4) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
""",
    tags=("tpch", "q18", "join", "having"),
    doc=(
        "TPC-H Q18 shape (large-volume orders): HAVING-filtered aggregate over "
        "the fact feeds back as a broadcast semi-filter on the same fact — the "
        "self-referential agg-then-filter pattern. The qualifying-order set is "
        "tiny by construction, so it broadcasts and lineitem shuffles once."
    ),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("oq"))
        .filter(F.col("oq") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "funnel_user_stages",
    oracle="""
WITH ev AS (
    -- funnel hygiene (fuzz find #14): an event with no timestamp cannot
    -- be ordered in a funnel, and an event with no user cannot be
    -- attributed to one. Without this, Spark's ts-sorted array form
    -- surfaces NULL-ts signups first (min(ts) skips them here) and its
    -- single groupBy chains stages inside the NULL-user group (the
    -- equi-join cascade below never matches NULL = NULL).
    SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
su AS (
    SELECT user_id, min(ts) AS t0 FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
vw AS (
    SELECT e.user_id, min(e.ts) AS t1 FROM ev e JOIN su ON e.user_id = su.user_id
    WHERE e.event_type = 'view' AND e.ts >= su.t0 GROUP BY e.user_id
),
ck AS (
    SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN vw ON e.user_id = vw.user_id
    WHERE e.event_type = 'click' AND e.ts >= vw.t1 GROUP BY e.user_id
),
pu AS (
    SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN ck ON e.user_id = ck.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= ck.t2 GROUP BY e.user_id
)
SELECT su.user_id,
       make_timestamp(epoch_us(su.t0)) AS t_signup,
       make_timestamp(epoch_us(vw.t1)) AS t_view,
       make_timestamp(epoch_us(ck.t2)) AS t_click,
       make_timestamp(epoch_us(pu.t3)) AS t_purchase,
       CAST(1 + CASE WHEN vw.t1 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN ck.t2 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN pu.t3 IS NULL THEN 0 ELSE 1 END AS INT) AS stages_reached
FROM su
LEFT JOIN vw ON su.user_id = vw.user_id
LEFT JOIN ck ON su.user_id = ck.user_id
LEFT JOIN pu ON su.user_id = pu.user_id
""",
    tags=("events", "funnel", "analytics"),
    doc=(
        "Ordered conversion funnel (signup -> view -> click -> purchase): each "
        "stage is the earliest qualifying event at-or-after the previous "
        "stage's timestamp. Single-shuffle design: ONE groupBy collects each "
        "user's time-sorted event array, then every stage timestamp is a "
        "map-side higher-order filter over that array (a 4-stage join "
        "cascade costs 7 exchanges; this costs 1). Per-user state is bounded "
        "by that user's event count — cap with a per-user limit for "
        "adversarial keys at 100 TB."
    ),
)
def funnel_user_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL ts / NULL user excluded on both engine sides (fuzz find #14,
    # rationale in the oracle's ev CTE)
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    stages = ["signup", "view", "click", "purchase"]
    evs = (
        ev.filter(F.col("event_type").isin(stages))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs"))
    )

    def first_ts(event_type: str, after):
        # earliest event of this type at-or-after `after`; arrays are
        # ts-sorted so the first qualifying element IS the min. F.get
        # (not element_at) so an empty match yields null under ANSI.
        arr = F.filter(
            "evs",
            lambda x: (x["event_type"] == event_type)
            & (x["ts"] >= after if after is not None else F.lit(True)),
        )
        return F.get(arr, 0)["ts"]

    d = evs.withColumn("t_signup", first_ts("signup", None)).filter(
        F.col("t_signup").isNotNull()
    )
    d = d.withColumn("t_view", first_ts("view", F.col("t_signup")))
    d = d.withColumn("t_click", first_ts("click", F.col("t_view")))
    d = d.withColumn("t_purchase", first_ts("purchase", F.col("t_click")))
    reached = (
        F.lit(1)
        + F.when(F.col("t_view").isNull(), 0).otherwise(1)
        + F.when(F.col("t_click").isNull(), 0).otherwise(1)
        + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
    )
    return d.select(
        "user_id", "t_signup", "t_view", "t_click", "t_purchase",
        reached.cast("int").alias("stages_reached"),
    )


@register(
    "cohort_retention_hourly",
    oracle="""
WITH f AS (
    SELECT user_id, date_trunc('hour', min(ts)) AS cohort_hour FROM events GROUP BY user_id
),
act AS (
    SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
)
SELECT make_timestamp(epoch_us(f.cohort_hour)) AS cohort_hour,
       count(*)                                AS cohort_size,
       count(a.user_id)                        AS retained_next_hour,
       round(count(a.user_id) / count(*), 6)   AS retention_rate
FROM f LEFT JOIN act a
  ON a.user_id = f.user_id AND a.h = f.cohort_hour + INTERVAL 1 HOUR
GROUP BY f.cohort_hour
""",
    tags=("events", "cohort", "retention", "analytics"),
    doc=(
        "Cohort retention: users bucketed by first-seen hour; retained = any "
        "activity in the following hour. Two keyed aggregations + one "
        "co-partitioned left join on user_id — the cohort table is "
        "users-grain (small), so at 100 TB it broadcasts against the "
        "activity-grain side."
    ),
)
def cohort_retention_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    f = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("cohort_hour"))
        .alias("f")
    )
    act = ev.select("user_id", F.date_trunc("hour", "ts").alias("h")).distinct().alias("a")
    joined = f.join(
        act,
        (F.col("a.user_id") == F.col("f.user_id"))
        & (F.col("a.h") == F.col("f.cohort_hour") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(F.col("f.cohort_hour").alias("cohort_hour")).agg(
        F.count("*").alias("cohort_size"),
        F.count(F.col("a.user_id")).alias("retained_next_hour"),
        F.round(F.count(F.col("a.user_id")) / F.count("*"), 6).alias("retention_rate"),
    )


@register(
    "tpch_q12_shipmode_priority",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    tags=("tpch", "q12", "join", "conditional-agg"),
    doc=(
        "TPC-H Q12 shape: fact-fact join + priority-bucketed conditional "
        "counts (CASE inside sum). One join shuffle, one 2-row agg."
    ),
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT 100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
    tags=("tpch", "q14", "join", "ratio"),
    doc=(
        "TPC-H Q14 shape: month-filtered fact joined to a broadcast dim, "
        "conditional-revenue ratio in one global aggregate. Raw IEEE "
        "division output (round() half-tie rules differ across engines)."
    ),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_revenue_pct"))
    )
