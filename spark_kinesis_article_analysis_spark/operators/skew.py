"""Skew-handling utilities for 100 TB joins and aggregations.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on
by default in session.py) handles most skew at runtime; these explicit
tools cover the cases AQE can't: a build side too big to split safely,
or aggregation skew (one hot group key).

``salted_join``: replicate the small side R times, salt the big side's
key with ``hash(row) % R`` — a hot key's rows spread over R reducer
partitions instead of one straggler. Result is row-for-row identical to
the plain join (asserted in tests/test_scale_layout.py).

``two_phase_agg``: pre-aggregate on (key, salt) then re-aggregate on
key — the classic hot-key aggregation fix for algebraic aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``salt_buckets`` times. Use when ``big[big_key]`` is heavily skewed
    and the small side is modest (replication multiplies its shuffle
    volume by ``salt_buckets``)."""
    big_salted = big.withColumn(
        "__salt", (F.xxhash64(*[F.col(c) for c in big.columns]) % salt_buckets + salt_buckets) % salt_buckets
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = big_salted.join(
        small_replicated,
        (big_salted[big_key] == small_replicated[small_key])
        & (big_salted["__salt"] == small_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Hot-key-safe sum/count: partial aggregate on (key, salt), then
    final on key. Returns (key, total, n) — extend per aggregate; only
    algebraic aggregates (sum/count/min/max/avg-via-sum) decompose
    this way."""
    salted = df.withColumn("__salt", (F.xxhash64(F.col(value)) % salt_buckets))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value).alias("__s"), F.count("*").alias("__n")
    )
    return partial.groupBy(key).agg(
        F.sum("__s").alias("total"), F.sum("__n").alias("n")
    )
