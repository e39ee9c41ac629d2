"""Streaming quality gate (streaming/gate_stream.py): exactly-once
restart through the epoch-fenced manifest sink, gate parity with the
batch operator, and the map-only plan claim."""

from __future__ import annotations

import pytest

pytest.importorskip("boto3")
pytest.importorskip("moto")

from pyspark.sql import functions as F  # noqa: E402

PASSING = (
    "the quick brown fox jumps over a lazy dog and then the fox runs "
    "to a river of calm water where the dog waits for a friend that "
    "will not come today because the road is long and the night falls "
    "over a quiet field where every sound has gone to rest and the "
    "moon climbs above a hill that watches the sleeping town below"
)
FAILING = "x y"  # 2 words — fails the >= 50 word-count rule


def _write_docs(spark, path: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(path)


def _read_back(spark, prefix: str):
    from pyspark import cloudpickle

    from spark_kinesis_article_analysis_spark.operators.s3_batch import s3_options
    from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

    cloudpickle.register_pickle_by_value(_s3o)
    spark.dataSource.register(_s3o.S3ParquetManifestDataSource)
    reader = spark.read.format("s3_parquet_manifest")
    for k, v in s3_options(prefix).items():
        reader = reader.option(k, v)
    return reader.load()


def _ensure_bucket():
    import boto3

    from spark_kinesis_article_analysis_spark.operators.kinesis_batch import _endpoint
    from spark_kinesis_article_analysis_spark.operators.s3_batch import BUCKET

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


_N = {"n": 0}


def _fresh_prefix() -> str:
    _N["n"] += 1
    return f"gate-test-{_N['n']}"


class TestStreamingGate:
    def test_exactly_once_across_restart(self, spark, tmp_path):
        """TestParquetSinkRestart shape, manifest sink edition: run the
        gated stream, stop, add data, resume from the SAME checkpoint —
        previously-committed survivors appear exactly once; the failing
        doc never appears."""
        from spark_kinesis_article_analysis_spark.streaming.gate_stream import (
            run_gate_stream,
        )

        _ensure_bucket()
        docs = str(tmp_path / "docs")
        ckpt = str(tmp_path / "ckpt")
        prefix = _fresh_prefix()
        _write_docs(spark, docs, [(1, PASSING), (2, FAILING)])
        run_gate_stream(spark, docs, prefix, ckpt)
        first = _read_back(spark, prefix)
        assert [r.doc_id for r in first.collect()] == [1]

        _write_docs(spark, docs, [(3, PASSING + " and more of the same words")])
        run_gate_stream(spark, docs, prefix, ckpt)  # restart, same checkpoint
        ids = sorted(r.doc_id for r in _read_back(spark, prefix).collect())
        assert ids == [1, 3], f"restart must not duplicate or drop: {ids}"

    def test_gate_parity_with_batch_operator(self, spark, tmp_path):
        """The streamed survivors must equal the batch gate's passing
        rows signal-for-signal on the same documents."""
        from spark_kinesis_article_analysis_spark.functions.gopher import (
            quality_gopher_gate,
        )
        from spark_kinesis_article_analysis_spark.streaming.gate_stream import (
            _COLS,
            run_gate_stream,
        )
        from tests.conftest import SF_SMOKE

        _ensure_bucket()
        prefix = _fresh_prefix()
        run_gate_stream(
            spark,
            f"{SF_SMOKE}/documents.parquet",
            prefix,
            str(tmp_path / "ckpt"),
        )
        got = sorted(map(tuple, _read_back(spark, prefix).select(*_COLS).collect()))
        want = sorted(
            map(
                tuple,
                quality_gopher_gate(spark, SF_SMOKE)
                .filter(F.col("gopher_pass"))
                .select(*_COLS)
                .collect(),
            )
        )
        assert got == want
        assert want, "no document passes the gate at SF_SMOKE — test is vacuous"

    def test_gate_transform_is_map_only(self, spark, tmp_path):
        """The in-flight gate adds no shuffle: batch twin of the exact
        micro-batch plan (Structured Streaming unification) must contain
        zero exchanges."""
        from spark_kinesis_article_analysis_spark.plans import inspect
        from spark_kinesis_article_analysis_spark.streaming.gate_stream import (
            gated_stream,
        )
        from tests.conftest import SF_SMOKE

        batch_twin = gated_stream(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        )
        plan = inspect.explain_str(batch_twin)
        assert "Exchange" not in plan, plan
