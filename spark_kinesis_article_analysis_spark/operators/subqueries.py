"""Subquery surface: scalar (correlated + uncorrelated), IN / NOT IN,
EXISTS, and a bounded cross join.

Catalyst decorrelates these into joins (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery -> semi/anti join), so at 100 TB they cost the
same as the explicit-join formulations in operators/joins.py — the SQL
form is part of the engine surface a user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load, register_views
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "subquery_scalar_correlated",
    oracle="""
SELECT c_custkey, c_mktsegment, round(c_acctbal, 4) AS acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                   WHERE i.c_mktsegment = c.c_mktsegment)
""",
    tags=("subquery", "correlated-scalar"),
    doc="Correlated scalar subquery: customers above their segment's average balance.",
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 4) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                           WHERE i.c_mktsegment = c.c_mktsegment)
        """
    )


@register(
    "subquery_in_exists",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.09)
""",
    tags=("subquery", "in", "exists"),
    doc="IN + correlated EXISTS predicates (planned as left-semi joins).",
)
def subquery_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.09)
        """
    )


@register(
    "subquery_not_in",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
    tags=("subquery", "not-in", "anti"),
    doc="NOT IN (null-aware anti join).",
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("supplier", "customer"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@register(
    "join_cross_bounded",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
""",
    tags=("join", "cross"),
    doc="Explicit cross join, bounded to the 5-row region dim (5x5 minus the 5 self-pairs = 20 pairs).",
)
def join_cross_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "region").alias("a")
    b = load(spark, sf_dir, "region").alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") != F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
    )


@register(
    "sample_seeded",
    oracle=None,  # Bernoulli sampling is engine-RNG-specific -> rows-only; determinism tested in pytest
    tags=("sample",),
    doc=(
        "Seeded Bernoulli sample (TABLESAMPLE): deterministic for a fixed seed "
        "and partitioning within Spark, but engine-specific RNG means no "
        "cross-engine oracle. At 100 TB sampling is the first stage of any "
        "profiling/sketching pass."
    ),
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.sample(fraction=0.1, seed=42).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "sample_stratified",
    oracle=None,  # engine-RNG-specific like sample_seeded -> rows-only; strata tested in pytest
    tags=("sample", "stratified"),
    doc=(
        "Stratified sampling (sampleBy): per-stratum Bernoulli fractions keyed "
        "on lang — the language-rebalancing primitive for corpus curation. "
        "Map-side only (each row draws against its stratum fraction; no "
        "shuffle), so it scales identically to a filter."
    ),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fractions = {"en": 0.8, "de": 0.3, "es": 0.3, "fr": 0.3, "zh": 0.3}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang", "source")
