"""File-format sources/sinks beyond the catalog's parquet scans.

The reference only ever *writes* parquet (``process_articles.py:88``);
a complete engine also reads parquet/json/csv and writes partitioned
layouts. Explicit schemas everywhere — inference is a full extra pass
at 100 TB and non-deterministic under schema drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-required JSON lines scan (PERMISSIVE nulls, like the
    pipeline's from_json)."""
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).csv(path, header=header)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Partitioned parquet layout — at 100 TB, partition by a date-ish
    column so queries prune directories, and size files via
    ``spark.sql.files.maxRecordsPerFile`` rather than coalescing to few
    giant files."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same predicate-pushdown/column-pruning contract as
    parquet (both columnar with embedded stats)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan: one `value` string column per line — the
    rawest corpus-ingest format (each line becomes a document/payload)."""
    return spark.read.text(path)
