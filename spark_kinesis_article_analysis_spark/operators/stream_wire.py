"""The reference pipeline end to end ON REAL WIRE PROTOCOLS, streaming
on both ends — the round-11 composition of everything S1/S2:

    documents -> distributed PutRecords producer -> Kinesis HTTP API
    -> ``readStream.format("kinesis_api")`` (executor-parallel
    DataSourceStreamReader: per-shard partitions, arrival-time fences)
    -> parse_articles + word count (process_articles.py:62-75)
    -> ``writeStream.format("s3_parquet_manifest")`` (epoch-fenced
    manifest commit per microbatch, S3 HTTP API)
    -> manifest-driven parallel read back.

The oracle is the same projection straight off ``documents``, so a
hash match proves the whole streaming path — producer, Kinesis service,
executor-parallel streaming read, parse, epoch-fenced object-store
commit, manifest read — preserved every row and every byte exactly
once. ``kinesis_api_batch`` proves the BATCH read path; this proves the
STREAMING path the reference actually runs (process_articles.py:53-91),
with the one semantic divergence the reference's own design forces kept
out: the windowed aggregation is deliberately not part of this spec
(append-mode windows only emit when the watermark closes them, so a
bounded availableNow run would hold back the tail — the window-agg
semantics are driver-verdicted on the batch twin
``article_pipeline_sliding`` and closed-window emission is pinned in
``tests/test_streaming.py``).

Lifecycle: same idempotent per-(process, sf_dir) pattern as
``operators/kinesis_batch`` — the streaming query runs ONCE per process
(availableNow, bounded by the ingested stream), rebuilds reuse the
committed manifests.

r12 note, load-bearing for the registry: this round edited the
underlying wire modules (kinesis_source.py fence-lag warning;
s3_objects.py replay commit-time carry). The registry keys
staleness on THIS file, so this edit re-enters the module's specs
into the verdict window alongside the source change (the r11
dependency-staleness lesson, VERDICT item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_kinesis_article_analysis_spark.operators.article import (
    _EPOCH_2024,
    parse_articles,
    with_word_count,
)
from spark_kinesis_article_analysis_spark.operators.kinesis_batch import (
    _ingested_stream,
    kinesis_options,
)
from spark_kinesis_article_analysis_spark.operators.s3_batch import (
    s3_options,
    streamed_prefix_once,
)
from spark_kinesis_article_analysis_spark.registry import register

_COLS = ["article_id", "title", "author", "publish_date", "content", "word_count"]


def _streamed_prefix(spark: SparkSession, sf_dir: str) -> str:
    """Run the wire-to-wire streaming query once per process: Kinesis
    (executor-parallel stream read) -> parse -> manifest sink. The
    ensure-bucket/memo lifecycle is the shared
    :func:`operators.s3_batch.streamed_prefix_once`."""

    def _run(prefix: str, ckpt: str) -> None:
        from pyspark import cloudpickle

        from spark_kinesis_article_analysis_spark.sources import kinesis_source as _ks
        from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

        cloudpickle.register_pickle_by_value(_ks)
        cloudpickle.register_pickle_by_value(_s3o)
        spark.dataSource.register(_ks.KinesisApiDataSource)
        spark.dataSource.register(_s3o.S3ParquetManifestDataSource)
        stream = _ingested_stream(spark, sf_dir)

        reader = spark.readStream.format("kinesis_api")
        for k, v in kinesis_options(stream).items():
            reader = reader.option(k, v)
        parsed = with_word_count(parse_articles(reader.load())).select(*_COLS)

        writer = parsed.writeStream.format("s3_parquet_manifest").option(
            "checkpointLocation", ckpt
        )
        for k, v in s3_options(prefix).items():
            writer = writer.option(k, v)
        q = writer.trigger(availableNow=True).start()
        finished = q.awaitTermination(300)
        if not finished:
            # memoizing a partial run would serve a half-written table
            # to every later call in the process — fail loudly instead
            # (streamed_prefix_once only memoizes after _run returns)
            q.stop()
            raise TimeoutError(
                "stream_wire_end_to_end: availableNow query did not finish "
                f"within 300s (exception: {q.exception()})"
            )

    return streamed_prefix_once(sf_dir, "stream-wire", _run)


@register(
    "stream_wire_end_to_end",
    oracle=f"""
SELECT CAST(doc_id AS VARCHAR)                                              AS article_id,
       source                                                               AS title,
       lang                                                                 AS author,
       make_timestamp(({_EPOCH_2024} + (doc_id * 137) % 86400) * 1000000)   AS publish_date,
       text                                                                 AS content,
       len(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'))               AS word_count
FROM documents
""",
    tags=("reference", "S1", "S2", "streaming", "wire-protocol", "round-trip"),
    doc=(
        "The reference pipeline streaming on both ends over real wire "
        "protocols: documents -> PutRecords -> Kinesis API -> "
        "executor-parallel streaming read (per-shard partitions, "
        "arrival-time fence offsets) -> parse + word count -> "
        "epoch-fenced manifest commit on the S3 API -> manifest-driven "
        "read back. Oracle is the same projection off documents: a hash "
        "match proves the streaming source, the parse, and the streaming "
        "sink preserved every byte exactly once. At 100 TB this exact "
        "plan runs against the real services with only endpoint URLs "
        "changed; read bandwidth scales with executors on both ends."
    ),
)
def stream_wire_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import cloudpickle

    from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

    cloudpickle.register_pickle_by_value(_s3o)
    spark.dataSource.register(_s3o.S3ParquetManifestDataSource)
    prefix = _streamed_prefix(spark, sf_dir)
    reader = spark.read.format("s3_parquet_manifest")
    for k, v in s3_options(prefix).items():
        reader = reader.option(k, v)
    return reader.load().select(*_COLS)
