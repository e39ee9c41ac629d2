"""Aggregation surface: the full agg-function set, pivot, cube/rollup/
grouping sets, exact + approximate distinct, percentiles.

The reference's only aggregate is ``avg`` (``process_articles.py:81``);
this module supplies the rest of SURVEY.md §2 Part B.

Float discipline: double-valued aggregates are rounded (4-6 digits) on
BOTH the Spark and oracle side — partial/final aggregation order differs
between engines, so raw double sums differ in final ulps. Integer-fed
aggregates (counts, int sums, avg over ints) are exact and not rounded.

Scale notes: everything here is partial+final hash aggregation (map-side
combine before the exchange) — shuffle volume is group cardinality, not
row count. ``approx_count_distinct`` (HLL++) and ``percentile_approx``
(Greenwald-Khanna) are the 100 TB paths where exact distinct/percentile
would need a full shuffle of distinct values; both are mergeable
sketches so they stay one-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "agg_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                      AS sum_qty,
       round(sum(l_extendedprice), 4)                                 AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)              AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 6)                                      AS avg_qty,
       round(avg(l_extendedprice), 6)                                 AS avg_price,
       round(avg(l_discount), 6)                                      AS avg_disc,
       count(*)                                                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "tpch-q1"),
    doc="TPC-H Q1-shaped pricing summary: 8 aggregates over 2 group keys.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_minmax_argminmax",
    oracle="""
SELECT o_orderstatus,
       min(o_totalprice)              AS min_price,
       max(o_totalprice)              AS max_price,
       min(o_orderdate)               AS first_date,
       max(o_orderdate)               AS last_date,
       -- struct-min, NOT arg_min: both engines' argmin is ARBITRARY
       -- among tied ordering values (fuzz-found: two 0.0-price orders,
       -- Spark picked one key, DuckDB the other). min/max over a
       -- (price, key) struct pins ties to the smallest/largest key; the
       -- FILTER reproduces min_by's ignore-NULL-ordering-values rule
       -- (a NULL price field would otherwise sort FIRST in Spark's
       -- struct comparison and LAST in DuckDB's).
       (min(struct_pack(p := o_totalprice, k := o_orderkey))
            FILTER (o_totalprice IS NOT NULL)).k AS cheapest_order,
       (max(struct_pack(p := o_totalprice, k := o_orderkey))
            FILTER (o_totalprice IS NOT NULL)).k AS priciest_order
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "minmax", "argminmax"),
    doc=(
        "min/max over numbers and timestamps + deterministic argmin/argmax "
        "(struct-min with key tie-break — min_by/arg_min are arbitrary "
        "among ties on BOTH engines, found by the relational fuzzer)."
    ),
)
def agg_minmax_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cheapest = F.expr(
        "min(struct(o_totalprice AS p, o_orderkey AS k)) "
        "FILTER (WHERE o_totalprice IS NOT NULL)"
    )["k"]
    priciest = F.expr(
        "max(struct(o_totalprice AS p, o_orderkey AS k)) "
        "FILTER (WHERE o_totalprice IS NOT NULL)"
    )["k"]
    return o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        cheapest.alias("cheapest_order"),
        priciest.alias("priciest_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey)  AS n_suppliers,
       count(DISTINCT l_partkey)  AS n_parts,
       count(*)                   AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
    doc="Exact COUNT(DISTINCT) — expand-based multi-distinct planning.",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_approx_sketches",
    oracle=None,  # HLL++/GK sketches are approximate; exactness checked in pytest vs exact values
    tags=("agg", "approx", "hll", "percentile"),
    doc=(
        "The 100 TB cardinality/quantile path: approx_count_distinct (HLL++) and "
        "percentile_approx (GK sketch) — mergeable one-pass sketches; rows-only "
        "check here, error-bound asserts live in tests/test_rows_only.py. "
        "Quartiles are emitted as scalar q25/q75 columns (not the array form): "
        "the driver's rows-only canonicalizer sorts every column and an "
        "array<double> cell is unhashable there."
    ),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.25, 10000).alias("q25"),
        F.percentile_approx("l_extendedprice", 0.75, 10000).alias("q75"),
    )


@register(
    "agg_stats_moments",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS stddev_qty,
       round(var_samp(l_quantity), 6)    AS var_qty,
       round(stddev_pop(l_discount), 6)  AS stddevp_disc,
       round(var_pop(l_discount), 6)     AS varp_disc
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
    doc="Sample/population stddev and variance.",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_discount"), 6).alias("stddevp_disc"),
        F.round(F.var_pop("l_discount"), 6).alias("varp_disc"),
    )


@register(
    "agg_collect",
    oracle="""
SELECT n_regionkey,
       -- Spark's collect_set DROPS NULL elements (all-NULL group ->
       -- empty set -> array_join ''); FILTER + coalesce mirrors that
       coalesce(array_to_string(
           list_sort(list(DISTINCT n_name) FILTER (n_name IS NOT NULL)), '|'), '')
           AS nations,
       count(*) AS n
FROM nation
GROUP BY n_regionkey
""",
    tags=("agg", "collect"),
    doc=(
        "collect_set + sort_array serialized to a string — deterministic, "
        "oracle-comparable form of the collect_list/collect_set family."
    ),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), "|").alias("nations"),
        F.count("*").alias("n"),
    )


@register(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "pivot"),
    doc="groupBy().pivot() with explicit value list (conditional aggregation).",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
-- Spark emits ZERO rows for grouping-set aggs over empty input (both
-- DataFrame and SQL forms — probed); DuckDB emits the SQL-standard ()
-- grand-total row with n=0. On non-empty input every rollup row has
-- n >= 1, so this HAVING mirrors Spark exactly and only bites the
-- empty-corpus case.
HAVING count(*) > 0
""",
    tags=("agg", "rollup"),
    doc="ROLLUP hierarchy: (flag, status) -> (flag) -> () subtotals.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 4) AS total, count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING count(*) > 0  -- empty-input parity; see agg_rollup
""",
    tags=("agg", "cube"),
    doc="CUBE: all 4 grouping-set combinations of (status, priority).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total"), F.count("*").alias("n")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT c_mktsegment, c_nationkey, round(sum(c_acctbal), 4) AS bal, count(*) AS n
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
""",
    tags=("agg", "grouping-sets"),
    doc="Explicit GROUPING SETS — two independent group-bys in one pass.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer_gs")
    # grouping sets has no DataFrame-native builder; SQL is the idiomatic form
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, round(sum(c_acctbal), 4) AS bal, count(*) AS n
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "agg_exact_percentile",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6)  AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "percentile"),
    doc=(
        "Exact interpolated percentiles (Spark `percentile` == DuckDB "
        "quantile_cont). Both percentages share ONE percentile(col, "
        "array(...)) aggregate: each separate percentile() call buffers "
        "and sorts the full per-group value multiset independently, so "
        "folding them pays that cost once (measured 2.1x at sf0.1, "
        "values identical). Exact percentiles stay the small-group "
        "baseline; approx_percentile (agg_approx_sketches) is the "
        "mergeable 100 TB path."
    ),
)
def agg_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9))).alias("__pcts")
        )
        .select(
            "l_returnflag",
            F.round(F.col("__pcts")[0], 6).alias("median_price"),
            F.round(F.col("__pcts")[1], 6).alias("p90_price"),
        )
    )


@register(
    "agg_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value
FROM (
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
)
""",
    tags=("agg", "unpivot"),
    doc="unpivot/melt: wide measures -> long (measure, value) pairs — pivot's inverse.",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    name_map = F.create_map(
        F.lit("l_quantity"), F.lit("quantity"),
        F.lit("l_extendedprice"), F.lit("price"),
        F.lit("l_discount"), F.lit("discount"),
    )
    return melted.select(
        "l_orderkey",
        "l_linenumber",
        name_map[F.col("measure")].alias("measure"),
        F.round("value", 4).alias("value"),
    )


@register(
    "agg_stats_corr_regr",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       regr_count(l_extendedprice, l_quantity)                 AS n_pairs,
       round(corr(l_extendedprice, l_quantity), 6)             AS corr_price_qty,
       round(covar_samp(l_extendedprice, l_quantity), 6)       AS covar_s,
       round(covar_pop(l_extendedprice, l_quantity), 6)        AS covar_p,
       round(regr_slope(l_extendedprice, l_quantity), 6)       AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6)   AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6)          AS r2,
       round(regr_avgx(l_extendedprice, l_quantity), 6)        AS avg_qty,
       round(regr_avgy(l_extendedprice, l_quantity), 6)        AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "statistics", "regression"),
    doc=(
        "Bivariate statistics family per (returnflag, linestatus): "
        "correlation, sample/population covariance, and the SQL-standard "
        "linear-regression aggregates (slope, intercept, R^2, group "
        "means). All are single-pass mergeable co-moment accumulators "
        "(Welford-style partial states merged at the exchange), so the "
        "plan is the same partial+final hash aggregation as a sum — "
        "shuffle volume is group cardinality regardless of corpus size. "
        "Normalized outputs (corr, r2) and O(1e4)-magnitude moments "
        "round to 6dp safely; raw co-moment sums (regr_sxx/sxy/syy) are "
        "deliberately excluded — at 1e7+ magnitude the engines' "
        "different partial-merge orders can flip the 6th decimal."
    ),
)
def agg_stats_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT Spark's corr()/covar_samp()/regr_*() aggregates: under ANSI
    mode (Spark 4 default) those THROW DIVIDE_BY_ZERO when a group has
    zero variance or a single pair — fuzz-found: ONE constant-series
    group kills the whole job, while DuckDB (and the SQL standard)
    return NULL. Each statistic is recomposed from throw-free Welford
    primitives (covar_pop / var_pop / stddev_pop / avg divide by n,
    never n-1 or a variance) with try_divide supplying the standard's
    NULL for the degenerate cases. Pair-filtering is explicit (FILTER on
    both-non-NULL) because the primitives are single-column while the
    bivariate family is defined over complete pairs. Still one
    partial+final hash aggregation."""
    li = load(spark, sf_dir, "lineitem")
    pair = "(l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL)"

    def pf(agg: str) -> F.Column:
        return F.expr(f"{agg} FILTER (WHERE {pair})")

    n = pf("count(*)")
    covp = F.expr("covar_pop(l_extendedprice, l_quantity)")  # pair-only by definition
    sdx = pf("stddev_pop(l_quantity)")
    sdy = pf("stddev_pop(l_extendedprice)")
    varx = pf("var_pop(l_quantity)")
    vary = pf("var_pop(l_extendedprice)")
    avgx = pf("avg(l_quantity)")
    avgy = pf("avg(l_extendedprice)")
    corr = F.try_divide(covp, sdx * sdy)
    slope = F.try_divide(covp, varx)
    r2 = (
        F.when(varx == 0, F.lit(None).cast("double"))
        .when(vary == 0, F.lit(1.0))
        .otherwise(corr * corr)
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        n.alias("n_pairs"),
        F.round(corr, 6).alias("corr_price_qty"),
        F.round(F.try_divide(covp * n, n - 1), 6).alias("covar_s"),
        F.round(covp, 6).alias("covar_p"),
        F.round(slope, 6).alias("slope"),
        F.round(avgy - slope * avgx, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
        F.round(avgx, 6).alias("avg_qty"),
        F.round(avgy, 6).alias("avg_price"),
    )
