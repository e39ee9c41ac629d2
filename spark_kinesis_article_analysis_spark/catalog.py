"""Table catalog over the driver's parquet corpus.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scale notes
-----------
At 100 TB the facts (``lineitem``, ``orders``, ``events``, ``documents``,
``embeddings``) are multi-TB directory trees, ideally partitioned by date
(``l_shipdate``/``o_orderdate``/``ts``) and bucketed on their join keys;
the dims stay small enough to broadcast. ``load`` is the one place that
knows this split — queries ask for a table by name and get:

* dims: eagerly marked broadcast-friendly (callers use
  :func:`pyspark.sql.functions.broadcast` at the join site, which is the
  explicit, plan-visible way to pin the strategy),
* facts: a plain scan, so Catalyst keeps predicate pushdown, column
  pruning and partition pruning.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-join these against a fact.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Plain ``spark.read.parquet`` — no caching,
    no collect — so every downstream filter/projection reaches the
    parquet reader (``PushedFilters`` / ``ReadSchema`` in the plan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Some corpus generations write events.ts as parquet
        # TIMESTAMP(NANOS), which the Spark reader rejects outright
        # ([PARQUET_TYPE_ILLEGAL]); with nanosAsLong it surfaces as a
        # LongType nanos column. Truncate to microseconds — the exact
        # truncation DuckDB applies coercing TIMESTAMP_NS -> TIMESTAMP, so
        # the oracle sees identical values (`div` keeps it integral; double
        # division would lose precision above 2^53 ns). Newer generations
        # write TIMESTAMP(MICROS) directly; pass those through untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # TIMESTAMP(MICROS) with isAdjustedToUTC=false infers as NTZ;
            # cast to LTZ (session tz is UTC, so the instant is unchanged)
            # to keep one timestamp type across corpus generations.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return _doubles_for_decimals(df)
    return _doubles_for_decimals(spark.read.parquet(table_path(sf_dir, name)))


def _doubles_for_decimals(df: DataFrame) -> DataFrame:
    """Normalize any DECIMAL column to DOUBLE on load — the money-column
    analogue of the events-ts encoding branch above. Today's corpus
    writes l_quantity/l_extendedprice/o_totalprice/... as float64, and
    every float-discipline rounding choice in the oracles assumes double
    arithmetic; a regeneration that flips them to parquet DECIMAL(12,2)
    (what TPC-H itself specifies) would silently change Spark's
    aggregate types, plans (decimal codegen is wider and slower), and
    rounding behavior. Casting on load keeps the engine's semantics
    invariant under that flip. Residual exposure documented in SCALE.md:
    the DuckDB oracle side would still read DECIMAL and compute exact —
    if the flip ever happens, the money oracles need CAST(col AS DOUBLE)
    at their inputs (probe results in the round-4b notes)."""
    dec = [f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)]
    for c in dec:
        df = df.withColumn(c, F.col(c).cast(T.DoubleType()))
    return df


#: (path, column) -> (min, max) — footer stats never change for an
#: immutable corpus snapshot, so one read serves every build in a session.
_BOUNDS_CACHE: dict[tuple[str, str], tuple | None] = {}


def parquet_column_bounds(path: str, column: str) -> tuple | None:
    """Global (min, max) of ``column`` from parquet row-group footer
    statistics — a driver-side metadata read, NO Spark job and NO data
    scan. This is how a dense-id shard bound should be discovered at
    100 TB: the footers of even a multi-TB table are a few MB of
    metadata, vs. an extra full-column scan for ``agg(min, max)``.

    Returns None when any row group lacks stats for the column (caller
    falls back to the scan).
    """
    import pyarrow.parquet as pq

    key = (path, column)
    if key in _BOUNDS_CACHE:
        return _BOUNDS_CACHE[key]
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(path) else [path]
    )
    lo = hi = None
    try:
        for f in files:
            meta = pq.ParquetFile(f).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            if column not in idx:
                raise KeyError(column)
            ci = idx[column]
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(ci).statistics
                if stats is None or not stats.has_min_max:
                    raise ValueError("missing row-group stats")
                lo = stats.min if lo is None else min(lo, stats.min)
                hi = stats.max if hi is None else max(hi, stats.max)
        out = None if lo is None else (lo, hi)
    except (KeyError, ValueError, OSError):
        out = None
    _BOUNDS_CACHE[key] = out
    return out


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so SQL-form queries can run verbatim."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
