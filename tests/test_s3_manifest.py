"""The manifest-committed S3 parquet sink/source against the real S3
wire API (moto-served): atomic-commit semantics an oracle can't see.

Row-value correctness of the full round trip is the driver-verdicted
``s3_manifest_roundtrip`` oracle; this file proves the commit protocol:
nothing is readable before the manifest PUT, aborted/rogue objects stay
invisible forever, appends are one manifest each."""

from __future__ import annotations

import json

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_kinesis_article_analysis_spark.operators.kinesis_batch import (  # noqa: E402
    _endpoint,
)
from spark_kinesis_article_analysis_spark.sources.s3_objects import (  # noqa: E402
    S3ManifestReader,
    S3ManifestWriter,
    _load_manifests,
    _s3,
)

_SCHEMA = StructType(
    [StructField("k", LongType()), StructField("v", StringType())]
)
_N = {"n": 0}


def _fresh(prefix_rows=None):
    _N["n"] += 1
    bucket, prefix = f"bucket-{_N['n']}", "t"  # >= 3 chars, S3 naming rule
    opts = {
        "bucket": bucket,
        "prefix": prefix,
        "regionName": "us-east-1",
        "endpointUrl": _endpoint(),
        "awsAccessKeyId": "x",
        "awsSecretKey": "x",
    }
    _s3({k.lower(): v for k, v in opts.items()}).create_bucket(Bucket=bucket)
    return opts


def _write(opts, rows) -> None:
    w = S3ManifestWriter(opts, _SCHEMA, overwrite=False)
    msgs = [w.write(iter(rows))]
    w.commit(msgs)


def _read_rows(opts):
    r = S3ManifestReader(opts)
    out = []
    for p in r.partitions():
        for batch in r.read(p):
            out.extend(zip(*[c.to_pylist() for c in batch.columns]))
    return sorted(out)


class TestManifestCommitProtocol:
    def test_uncommitted_objects_are_invisible(self):
        opts = _fresh()
        w = S3ManifestWriter(opts, _SCHEMA, overwrite=False)
        msg = w.write(iter([(1, "a"), (2, "b")]))  # task output, NO commit
        assert msg.keys  # the object exists in the store...
        assert _read_rows(opts) == []  # ...but no manifest -> invisible
        w.abort([msg])
        client = _s3(w.options)
        listed = client.list_objects_v2(Bucket=opts["bucket"], Prefix="t/data/")
        assert listed.get("KeyCount", 0) == 0  # abort cleaned the objects

    def test_commit_makes_exactly_the_committed_rows_visible(self):
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b"), (3, None)])
        assert _read_rows(opts) == [(1, "a"), (2, "b"), (3, None)]

    def test_rogue_object_under_data_prefix_never_read(self):
        """A retried task's orphan (or any junk under data/) must stay
        unreachable: readers enumerate manifests, not ListObjects."""
        opts = _fresh()
        _write(opts, [(1, "a")])
        client = _s3({k.lower(): v for k, v in opts.items()})
        client.put_object(
            Bucket=opts["bucket"], Key="t/data/part-rogue.parquet", Body=b"junk"
        )
        assert _read_rows(opts) == [(1, "a")]

    def test_append_is_one_manifest_each_and_unions(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        _write(opts, [(2, "b")])
        assert _read_rows(opts) == [(1, "a"), (2, "b")]
        low = {k.lower(): v for k, v in opts.items()}
        assert len(_load_manifests(_s3(low), low["bucket"], low["prefix"])) == 2

    def test_empty_partition_writes_no_object(self):
        opts = _fresh()
        w = S3ManifestWriter(opts, _SCHEMA, overwrite=False)
        msg = w.write(iter([]))
        assert msg.keys == [] and msg.rows == 0

    def test_overwrite_mode_rejected(self):
        with pytest.raises(ValueError, match="append-only"):
            S3ManifestWriter(_fresh(), _SCHEMA, overwrite=True)

    def test_manifest_records_schema_and_rowcount(self):
        opts = _fresh()
        _write(opts, [(7, "z"), (8, "y")])
        low = {k.lower(): v for k, v in opts.items()}
        [m] = _load_manifests(_s3(low), low["bucket"], low["prefix"])
        assert m["rows"] == 2 and "struct<k:bigint,v:string>" == m["schema_ddl"]

    def test_full_engine_write_read_with_inferred_schema(self, spark):
        """spark.write -> spark.read with NO user schema: the reader
        derives it from the newest manifest."""
        from pyspark import cloudpickle

        from spark_kinesis_article_analysis_spark.sources import s3_objects as _m

        cloudpickle.register_pickle_by_value(_m)
        spark.dataSource.register(_m.S3ParquetManifestDataSource)
        opts = _fresh()
        df = spark.createDataFrame([(i, f"s{i}") for i in range(100)], "k long, v string")
        w = df.repartition(4).write.format("s3_parquet_manifest").mode("append")
        for k, v in opts.items():
            w = w.option(k, v)
        w.save()
        r = spark.read.format("s3_parquet_manifest")
        for k, v in opts.items():
            r = r.option(k, v)
        got = r.load()
        assert got.schema.simpleString() == "struct<k:bigint,v:string>"
        assert got.count() == 100
        assert got.agg({"k": "sum"}).collect()[0][0] == sum(range(100))
