"""Streaming count-min sketch — the mergeable-sketch property used
live.

The batch spec (``functions/sketches.sketch_countmin_portable``) builds
the d x w cell matrix from a static corpus; the streaming form keeps
the SAME matrix incrementally current as documents arrive, because CMS
cells are plain sums — the sketch is mergeable by construction, so
Structured Streaming's partial-aggregation state IS the sketch. No
custom state handler needed: the cell matrix is a streaming
``groupBy(depth, col).sum(cnt)`` whose state is bounded at d x w rows
FOREVER, no watermark required — the rare unbounded-input streaming
aggregate that is legitimately total (compare the running-distinct and
LSH-bucket states, which need caps or watermarks).

Parity contract (asserted in tests): after consuming any micro-batch
slicing of a corpus, the streamed matrix equals the batch operator's
matrix cell for cell, and point estimates taken from it equal the batch
spec's estimates — arrival order and batch boundaries cannot matter
because integer sums commute.

100 TB posture: the per-batch update is one exchange at (depth, col)
grain after map-side combine (tokens never shuffle raw); state is
d x w integer rows regardless of stream length; ``complete`` output
mode is safe because the result set is the bounded matrix itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.functions.sketches import (
    CMS_DEPTH,
    _col_spark,
)
from spark_kinesis_article_analysis_spark.functions.text import tokens_col


def cms_cell_updates(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> per-token (depth, col) update rows. Map-only
    (explode + hash), streaming-safe; works on batch frames too (the
    batch-twin tests reuse it)."""
    depths = F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    return (
        docs.where(F.col("doc_id").isNotNull())
        .select(F.explode(tokens_col()).alias("term"))
        .select("term", F.explode(depths).alias("depth"))
        .select(
            F.col("depth").cast("int").alias("depth"),
            _col_spark(F.col("depth"), F.col("term")).alias("col"),
        )
    )


def cms_stream(stream_docs: DataFrame) -> DataFrame:
    """Streaming (depth, col, cell) matrix over a document stream. Use
    with ``outputMode('complete')`` — the aggregate is bounded at
    CMS_DEPTH x CMS_WIDTH rows by construction."""
    return cms_cell_updates(stream_docs).groupBy("depth", "col").agg(
        F.count("*").cast("long").alias("cell")
    )
