"""Object-store parquet sink/source over the real S3 wire API (boto3) —
format name ``s3_parquet_manifest``.

The reference writes its parquet output to S3 through S3A
(``process_articles.py:88-90``, endpoint conf ``:43-47``); the S3A jar
(hadoop-aws) is absent from this environment and not installable, so
the binding itself stays conf-passthrough (``streaming/kinesis.py`` /
``session.get_spark(extra_conf=...)``). What CAN be built and tested
here is the part that actually matters at 100 TB: the COMMIT PROTOCOL.

S3 has no atomic rename, so the HDFS FileOutputCommitter
(write-to-temp, rename-to-final) is broken on object stores — a failed
job leaves readable partial output, and rename is a full copy. The
industry answer is manifest commit (EMRFS/S3A committers; the Iceberg/
Delta metadata log is the same idea one level up): tasks PUT data
objects under unreferenced keys, and the job's single atomic commit
point is one PUT of a manifest object listing exactly the objects that
belong to the table. Readers enumerate MANIFESTS, never ListObjects
over data keys — so aborted tasks, task retries, and in-flight jobs are
invisible by construction, and appends are one manifest each.

This module implements that protocol as a Spark 4 Python DataSource:

* write: each task serializes its partition to parquet bytes (pyarrow)
  and PUTs ``<prefix>/data/part-<uuid>.parquet``; the driver's
  ``commit`` PUTs ``<prefix>/manifests/manifest-<uuid>.json`` carrying
  the object list, row counts, and the Spark schema DDL. ``abort``
  deletes the task objects.
* read: list the manifests (paginated), one Spark input partition per
  data object, each read as pyarrow RecordBatches (Arrow path, no
  per-row Python). ``schema()`` comes from the newest manifest, so
  ``spark.read.format("s3_parquet_manifest")`` needs no user schema.

Options (shared surface with the kinesis source): ``bucket``,
``prefix``, ``endpointUrl``, ``regionName``, ``awsAccessKeyId``,
``awsSecretKey``. Tested against the real S3 API served by moto
(``tests/test_s3_manifest.py``), including abort/rogue-object
invisibility and append semantics.
"""

from __future__ import annotations

import io
import json
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

if TYPE_CHECKING:
    from pyspark.sql.types import StructType


def _s3(options: dict):
    import boto3

    kwargs: dict = {"region_name": options.get("regionname", "us-east-1")}
    if options.get("endpointurl"):
        kwargs["endpoint_url"] = options["endpointurl"]
    if options.get("awsaccesskeyid"):
        kwargs["aws_access_key_id"] = options["awsaccesskeyid"]
    if options.get("awssecretkey"):
        kwargs["aws_secret_access_key"] = options["awssecretkey"]
    return boto3.client("s3", **kwargs)


def _norm(options: dict) -> dict:
    opts = {str(k).lower(): v for k, v in options.items()}
    if not opts.get("bucket") or not opts.get("prefix"):
        raise ValueError("s3_parquet_manifest requires bucket + prefix options")
    return opts


def _manifest_keys(client, bucket: str, prefix: str) -> list[str]:
    keys: list[str] = []
    token = None
    while True:
        kwargs = {"Bucket": bucket, "Prefix": f"{prefix}/manifests/"}
        if token:
            kwargs["ContinuationToken"] = token
        resp = client.list_objects_v2(**kwargs)
        keys.extend(o["Key"] for o in resp.get("Contents", []))
        if not resp.get("IsTruncated"):
            break
        token = resp.get("NextContinuationToken")
    return sorted(keys)


def _load_manifests(client, bucket: str, prefix: str) -> list[dict]:
    out = []
    for k in _manifest_keys(client, bucket, prefix):
        body = client.get_object(Bucket=bucket, Key=k)["Body"].read()
        out.append(json.loads(body))
    return out


@dataclass
class _ObjectsCommit(WriterCommitMessage):
    keys: list
    rows: int


class S3ManifestWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: "StructType", overwrite: bool) -> None:
        if overwrite:
            # overwrite would need manifest tombstoning (a delete marker
            # in a NEW manifest, Iceberg-style) to stay atomic — out of
            # scope; the sink is an append-only log like the parquet
            # streaming sink it mirrors.
            raise ValueError("s3_parquet_manifest is append-only; use mode('append')")
        self.options = _norm(options)
        self.schema = schema

    def write(self, iterator: Iterator) -> _ObjectsCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        names = [f.name for f in self.schema.fields]
        rows = [tuple(r) for r in iterator]
        if not rows:
            return _ObjectsCommit(keys=[], rows=0)  # no empty objects
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(c, type=arrow_schema.field(i).type) for i, c in enumerate(cols)],
            names=names,
        )
        buf = io.BytesIO()
        pq.write_table(table, buf)
        key = f"{self.options['prefix']}/data/part-{uuid.uuid4().hex}.parquet"
        _s3(self.options).put_object(
            Bucket=self.options["bucket"], Key=key, Body=buf.getvalue()
        )
        return _ObjectsCommit(keys=[key], rows=len(rows))

    def commit(self, messages) -> None:
        keys = [k for m in messages if m is not None for k in m.keys]
        rows = sum(m.rows for m in messages if m is not None)
        manifest = {
            "objects": keys,
            "rows": rows,
            "schema_ddl": self.schema.simpleString(),
        }
        # THE atomic commit point: a single PUT. Until this object
        # exists, nothing the tasks wrote is reachable by any reader.
        _s3(self.options).put_object(
            Bucket=self.options["bucket"],
            Key=f"{self.options['prefix']}/manifests/manifest-{uuid.uuid4().hex}.json",
            Body=json.dumps(manifest).encode("utf-8"),
        )

    def abort(self, messages) -> None:
        client = _s3(self.options)
        for m in messages:
            if m is None:
                continue
            for k in m.keys:
                client.delete_object(Bucket=self.options["bucket"], Key=k)


class _ObjectPartition(InputPartition):
    def __init__(self, key: str) -> None:
        self.key = key


class S3ManifestReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = _norm(options)

    def partitions(self) -> Sequence[_ObjectPartition]:
        client = _s3(self.options)
        keys: list[str] = []
        for m in _load_manifests(
            client, self.options["bucket"], self.options["prefix"]
        ):
            keys.extend(m["objects"])
        return [_ObjectPartition(k) for k in keys]

    def read(self, partition: _ObjectPartition) -> Iterator:
        import pyarrow.parquet as pq

        if partition is None:
            # the DataSource API probes read() with None when
            # partitions() returned [] (empty table — e.g. a manifest
            # committed over an empty write); same quirk replay_source
            # documents
            return
        body = _s3(self.options).get_object(
            Bucket=self.options["bucket"], Key=partition.key
        )["Body"].read()
        table = pq.read_table(io.BytesIO(body))
        yield from table.to_batches()  # Arrow batches — no per-row Python


class S3ParquetManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "s3_parquet_manifest"

    def schema(self) -> str:
        opts = _norm(self.options)
        manifests = _load_manifests(_s3(opts), opts["bucket"], opts["prefix"])
        if not manifests:
            raise ValueError(
                "s3_parquet_manifest: no committed manifests under "
                f"s3://{opts['bucket']}/{opts['prefix']}/manifests/"
            )
        return manifests[-1]["schema_ddl"]

    def reader(self, schema: "StructType") -> S3ManifestReader:
        return S3ManifestReader(self.options)

    def writer(self, schema: "StructType", overwrite: bool) -> S3ManifestWriter:
        return S3ManifestWriter(self.options, schema, overwrite)
