"""Streaming quality gate — the curation path composed with the wire
sink (VERDICT r11 item 7).

The batch Gopher gate (``functions/gopher.quality_gopher_gate``) is
pure per-document expressions, so the SAME transform is legal inside a
micro-batch; what needed proving is the composition: a documents
STREAM, gated in flight, committing its survivors through the
epoch-fenced S3 manifest sink exactly once across restarts — i.e. the
shape a continuously-ingesting curation pipeline actually runs:

    documents file stream -> gopher_signals (map-only) ->
    filter(gopher_pass) -> writeStream.format("s3_parquet_manifest")
    -> manifest-driven read back.

Exactly-once: the sink commits ONE epoch-keyed manifest per micro-batch
(replay overwrites at the same key, carrying the original commit time —
sources/s3_objects.py), so a restarted query re-emitting a batch cannot
duplicate survivors; asserted across a stop/extend/restart in
tests/test_streaming_gate.py, mirroring TestParquetSinkRestart.

The registered spec is ORACLE-BACKED (stronger than the rows-only ask):
the read-back equals the batch gate's passing rows, which DuckDB
reproduces signal for signal — a hash match proves the stream transform,
the epoch-fenced commit, and the manifest read preserved every surviving
document and every audit signal exactly.

Scale posture: the gate is a zero-shuffle map stage per micro-batch;
sink task writes are multipart-streamed (memory bounded by part size);
commit is one KB-scale PUT per epoch. Nothing in the path holds state,
so throughput is source-bounded at any corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.functions.gopher import gopher_signals
from spark_kinesis_article_analysis_spark.functions.text import tokens_col
from spark_kinesis_article_analysis_spark.operators.s3_batch import s3_options
from spark_kinesis_article_analysis_spark.registry import register

_DONE: dict[str, str] = {}

_COLS = [
    "doc_id",
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "bullet_line_ratio",
    "ellipsis_line_ratio",
    "alpha_word_ratio",
    "n_stop_hits",
    "gopher_pass",
]


def gated_stream(docs: DataFrame) -> DataFrame:
    """Gate a streaming (or batch — same code, the Structured Streaming
    unification) documents frame: signals + pass flag, survivors only."""
    d = docs.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull()).select(
        "doc_id", "text", tokens_col().alias("toks")
    )
    return gopher_signals(d).filter(F.col("gopher_pass")).select(*_COLS)


def run_gate_stream(
    spark: SparkSession, docs_path: str, prefix: str, checkpoint: str
) -> None:
    """One bounded (availableNow) run of the gated stream into the
    manifest sink. Callers own bucket/prefix lifecycle; restartable —
    same checkpoint resumes, replayed epochs fence idempotently."""
    from pyspark import cloudpickle

    from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

    cloudpickle.register_pickle_by_value(_s3o)
    spark.dataSource.register(_s3o.S3ParquetManifestDataSource)
    schema = spark.read.parquet(docs_path).schema  # metadata-only driver read
    reader = spark.readStream.schema(schema)
    if os.path.isfile(docs_path):
        # the file stream source requires a DIRECTORY basePath; a single
        # file (the sf_dir fixture layout) streams via its parent dir +
        # a filename glob so sibling tables never enter the stream
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.parquet(docs_path)
    writer = gated_stream(stream).writeStream.format("s3_parquet_manifest").option(
        "checkpointLocation", checkpoint
    )
    for k, v in s3_options(prefix).items():
        writer = writer.option(k, v)
    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_quality_gate: availableNow query did not finish "
            f"within 300s (exception: {q.exception()})"
        )


def _streamed_prefix(spark: SparkSession, sf_dir: str) -> str:
    """Run the gated stream once per (process, sf_dir); rebuilds reuse
    the committed manifests — the stream_wire lifecycle pattern."""
    import tempfile

    import boto3

    from spark_kinesis_article_analysis_spark.operators.kinesis_batch import (
        _endpoint,
    )
    from spark_kinesis_article_analysis_spark.operators.s3_batch import BUCKET

    prefix = "stream-gate-" + sf_dir.rstrip("/").rsplit("/", 1)[-1]
    if prefix in _DONE:
        return prefix
    client = boto3.client(
        "s3",
        region_name="us-east-1",
        endpoint_url=_endpoint(),
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )
    try:
        client.create_bucket(Bucket=BUCKET)
    except client.exceptions.BucketAlreadyOwnedByYou:
        pass
    run_gate_stream(
        spark,
        f"{sf_dir.rstrip('/')}/documents.parquet",
        prefix,
        tempfile.mkdtemp(prefix="stream_gate_ckpt_"),
    )
    _DONE[prefix] = prefix
    return prefix


@register(
    "stream_quality_gate_end_to_end",
    oracle="""
WITH sig AS (
    SELECT doc_id,
           CAST(len(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT) AS n_words,
           CAST(list_sum(list_prepend(0, list_transform(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), t -> length(t))))
                AS BIGINT) AS word_chars,
           CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
               + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
               AS n_symbols,
           CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(list_filter(string_split(text, chr(10)),
                                l -> starts_with(l, '- ') OR starts_with(l, '* ')))
                AS BIGINT) AS n_bullet_lines,
           CAST(len(list_filter(string_split(text, chr(10)),
                                l -> ends_with(l, '...'))) AS BIGINT) AS n_ellipsis_lines,
           CAST(len(list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'), t -> regexp_matches(t, '[A-Za-z]')))
                AS BIGINT) AS n_alpha_words,
           CAST(len(list_intersect(list_distinct(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')),
                                   ['the', 'a', 'be', 'to', 'of', 'and', 'that', 'have']))
                AS BIGINT) AS n_stop_hits
    FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
)
SELECT doc_id, n_words,
       round(word_chars / greatest(n_words, 1), 6)        AS mean_word_len,
       round(n_symbols / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS symbol_ratio,
       round(n_bullet_lines / CAST(n_lines AS DOUBLE), 6) AS bullet_line_ratio,
       round(n_ellipsis_lines / CAST(n_lines AS DOUBLE), 6) AS ellipsis_line_ratio,
       round(n_alpha_words / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS alpha_word_ratio,
       n_stop_hits,
       TRUE AS gopher_pass
FROM sig
WHERE n_words BETWEEN 50 AND 100000
  AND word_chars / greatest(n_words, 1) BETWEEN 3 AND 10
  AND n_symbols / CAST(greatest(n_words, 1) AS DOUBLE) <= 0.1
  AND n_bullet_lines / CAST(n_lines AS DOUBLE) <= 0.9
  AND n_ellipsis_lines / CAST(n_lines AS DOUBLE) <= 0.3
  AND n_alpha_words / CAST(greatest(n_words, 1) AS DOUBLE) >= 0.8
  AND n_stop_hits >= 2
""",
    tags=("quality", "gopher", "streaming", "curation", "wire-protocol", "north-star"),
    doc=(
        "The curation path composed with the wire sink: a documents "
        "stream gated by the full Gopher rule set IN FLIGHT (map-only "
        "micro-batch transform — the identical expressions the batch "
        "quality_gopher_gate verifies), survivors committed through the "
        "epoch-fenced S3 manifest sink and read back manifest-driven. "
        "Oracle recomputes the passing set with every audit signal, so "
        "a hash match proves stream transform + exactly-once commit + "
        "read-back end to end. Restart idempotence is pinned in "
        "tests/test_streaming_gate.py across a stop/extend/resume."
    ),
)
def stream_quality_gate_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import cloudpickle

    from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

    cloudpickle.register_pickle_by_value(_s3o)
    spark.dataSource.register(_s3o.S3ParquetManifestDataSource)
    prefix = _streamed_prefix(spark, sf_dir)
    reader = spark.read.format("s3_parquet_manifest")
    for k, v in s3_options(prefix).items():
        reader = reader.option(k, v)
    return reader.load().select(*_COLS)
