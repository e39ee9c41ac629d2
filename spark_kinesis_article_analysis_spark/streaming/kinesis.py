"""Kinesis source binding — the deployment-time counterpart of the test
harness's file-source replay.

The reference consumes Kinesis via the legacy Qubole connector
(``docker-compose.yml:115``, ``spark-sql-kinesis_2.12:1.2.0``); the
maintained public successor is AWS Labs'
``spark-streaming-sql-kinesis-connector`` (format name
``aws-kinesis``). Neither jar ships in this container, so this module
only *builds* the configured reader (pure option plumbing, unit-tested)
and raises a clear error if the connector is absent — everything
downstream of ``.load()`` is the shared transform code, already
exercised by the batch oracle and the file-source streaming tests.

Option mapping mirrors ``reference/app/process_articles.py:53-61``
(streamName / endpointUrl / credentials / regionName /
startingPosition=TRIM_HORIZON / checkpointLocation).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader


@dataclass(frozen=True)
class KinesisConfig:
    stream_name: str
    region: str
    endpoint_url: str | None = None  # LocalStack/VPC endpoints
    access_key: str | None = None
    secret_key: str | None = None  # NB: reference bug passes access key here; not replicated
    starting_position: str = "TRIM_HORIZON"
    checkpoint_location: str | None = None
    format: str = "aws-kinesis"  # AWS Labs connector; "kinesis" for the legacy one

    def options(self) -> dict[str, str]:
        opts: dict[str, str] = {
            "streamName": self.stream_name,
            "regionName": self.region,
            "startingPosition": self.starting_position,
        }
        if self.endpoint_url:
            opts["endpointUrl"] = self.endpoint_url
        if self.access_key:
            opts["awsAccessKeyId"] = self.access_key
        if self.secret_key:
            opts["awsSecretKey"] = self.secret_key
        if self.checkpoint_location:
            opts["checkpointLocation"] = self.checkpoint_location
        return opts


def reader(spark: SparkSession, cfg: KinesisConfig) -> DataStreamReader:
    """Configured (unloaded) reader — call ``.load()`` where the connector
    jar is on the classpath."""
    r = spark.readStream.format(cfg.format)
    for k, v in cfg.options().items():
        r = r.option(k, v)
    return r


def payload(spark: SparkSession, cfg: KinesisConfig) -> DataFrame:
    """Kinesis records -> the one-string-column payload shape the shared
    pipeline consumes (``select(col("data").cast("string"))``,
    process_articles.py:62)."""
    from pyspark.sql import functions as F

    try:
        raw = reader(spark, cfg).load()
    except Exception as exc:
        # Rewrap ONLY the missing-connector failure; auth/stream/option
        # errors from a present connector must propagate as themselves —
        # mislabeling them sends the operator chasing a classpath problem
        # that does not exist.
        msg = str(exc)
        if not (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
            or "ClassNotFoundException" in msg
        ):
            raise
        raise RuntimeError(
            "Kinesis connector not available. Add the AWS Labs "
            "spark-streaming-sql-kinesis-connector jar via spark.jars.packages "
            "and retry; in tests use streaming.pipeline.payload_stream instead."
        ) from exc
    return raw.select(F.col("data").cast("string").alias("data"))
