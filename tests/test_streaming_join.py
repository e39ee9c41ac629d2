"""Stream-stream watermarked interval join (streaming/join_stream.py):
exactly-once restart through the epoch-fenced manifest sink, batch
parity (the Structured Streaming unification), and the property the
operator exists for — an impression buffered in join state pairs with
a click that arrives in a LATER micro-batch."""

from __future__ import annotations

import pytest

pytest.importorskip("boto3")
pytest.importorskip("moto")

from pyspark.sql import functions as F  # noqa: E402

from tests.test_streaming_gate import (  # noqa: E402
    _ensure_bucket,
    _read_back,
)

_N = {"n": 0}


def _fresh_prefix() -> str:
    _N["n"] += 1
    return f"join-test-{_N['n']}"


def _write_docs(spark, path: str, ids: list[int]) -> None:
    spark.createDataFrame(
        [(i, f"text {i}", "en", "test", 6) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(path)


class TestStreamStreamJoin:
    def test_matches_and_restart_exactly_once(self, spark, tmp_path):
        """Only doc_id % 3 == 0 rows click; run, stop, append more docs,
        resume from the SAME checkpoint — earlier matches appear exactly
        once, new matches appear."""
        from spark_kinesis_article_analysis_spark.streaming.join_stream import (
            run_join_stream,
        )

        _ensure_bucket()
        docs = str(tmp_path / "docs")
        ckpt = str(tmp_path / "ckpt")
        prefix = _fresh_prefix()
        _write_docs(spark, docs, [1, 2, 3, 6])
        run_join_stream(spark, docs, prefix, ckpt)
        ids = sorted(r.doc_id for r in _read_back(spark, prefix).collect())
        assert ids == [3, 6], f"non-clicking docs must not match: {ids}"

        _write_docs(spark, docs, [7, 9])
        run_join_stream(spark, docs, prefix, ckpt)  # restart, same checkpoint
        ids = sorted(r.doc_id for r in _read_back(spark, prefix).collect())
        assert ids == [3, 6, 9], f"restart must not duplicate or drop: {ids}"

    def test_parity_with_batch_join(self, spark):
        """The streamed matched set must equal the identical batch plan
        (same impressions/clicks/joined code on batch frames) on real
        testdata — value-for-value, timestamps included."""
        from spark_kinesis_article_analysis_spark.streaming.join_stream import (
            _COLS,
            clicks,
            impressions,
            joined,
        )
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        got = joined(impressions(docs), clicks(docs)).select(*_COLS)
        want = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", "lang", "source", "n_chars")
            .count()
        )
        rows = got.collect()
        assert len(rows) == want
        # click lands doc_id % 60 seconds after the impression, inside
        # the 2-minute window — pin the interval arithmetic
        for r in rows[:50]:
            delta = (r.click_ts - r.imp_ts).total_seconds()
            assert delta == r.doc_id % 60

    def test_cross_batch_state_buffering(self, spark, tmp_path):
        """The reason stream-stream join keeps state: an impression
        whose click arrives in a LATER micro-batch still matches. Batch
        1 writes only non-clicking ids alongside a future clicker's
        impression... but both sides stream the same file, so the pair
        arrives when the doc does — instead, feed the CLICK side a doc
        file the impression side saw one run earlier via maxFilesPerTrigger=1:
        with two parquet files, availableNow plans multiple micro-batches
        and the join must carry file-1 impressions into file-2's batch."""
        from spark_kinesis_article_analysis_spark.streaming.join_stream import (
            clicks,
            impressions,
            joined,
        )

        docs = str(tmp_path / "docs")
        # two separate files -> maxFilesPerTrigger=1 yields >= 2 batches
        _write_docs(spark, docs, [3])
        _write_docs(spark, docs, [6])
        schema = spark.read.parquet(docs).schema

        def _stream():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(docs)
            )

        out = joined(impressions(_stream()), clicks(_stream()))
        q = (
            out.writeStream.format("memory")
            .queryName("xbatch_join")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), q.exception()
        ids = sorted(
            r.doc_id for r in spark.sql("SELECT doc_id FROM xbatch_join").collect()
        )
        assert ids == [3, 6], f"state must buffer across micro-batches: {ids}"
