"""Pluggable ``article_replay`` Python data source (Spark 4 DataSource
API) — the first-class stand-in for the reference's Kinesis source
(``reference/app/process_articles.py:53-61``; SURVEY §2 S1).

Covers the full source contract:
* batch read: per-shard parallelism, schema, shard-filter pruning;
* streaming read: offset protocol, per-shard rate cap, incremental
  micro-batches over an appended archive;
* exactly-once restart from a checkpoint (the property the reference
  delegates to Kinesis positions + Spark checkpointing);
* the flagship article pipeline running unchanged on this source.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.sources.replay_source import (
    ArticleReplayDataSource,
    write_archive,
)
from spark_kinesis_article_analysis_spark.streaming import pipeline as sp


def _env(aid: str, author: str, ts: str, content: str = "w1 w2 w3 w4") -> dict:
    article = {
        "article_id": aid,
        "title": f"title {aid}",
        "author": author,
        "publish_date": ts,
        "content": content,
    }
    return {"partitionKey": aid, "data": json.dumps(article)}


@pytest.fixture()
def registered(spark):
    # Registration is idempotent per name; re-register to be safe across
    # test ordering.
    spark.dataSource.register(ArticleReplayDataSource)
    return spark


@pytest.fixture()
def archive(tmp_path):
    d = str(tmp_path / "archive")
    write_archive(
        d,
        {
            "shard-000": [
                _env("a1", "alice", "2024-01-01 00:00:30", "a b c d"),
                _env("a2", "alice", "2024-01-01 00:01:30", "a b"),
            ],
            "shard-001": [
                _env("b1", "bob", "2024-01-01 00:00:45", "x y"),
            ],
        },
    )
    return d


class TestBatchRead:
    def test_schema_and_rows(self, registered, archive):
        df = registered.read.format("article_replay").option("path", archive).load()
        assert [f.name for f in df.schema.fields] == [
            "shard_id",
            "sequence_number",
            "partition_key",
            "data",
        ]
        rows = sorted(df.collect(), key=lambda r: (r.shard_id, r.sequence_number))
        assert len(rows) == 3
        assert rows[0].shard_id == "shard-000" and rows[0].sequence_number == 0
        assert rows[0].partition_key == "a1"
        payload = json.loads(bytes(rows[0].data).decode("utf-8"))
        assert payload["author"] == "alice"
        # per-shard sequence numbers are dense from 0 — Kinesis semantics
        assert [r.sequence_number for r in rows if r.shard_id == "shard-000"] == [0, 1]

    def test_one_partition_per_shard(self, registered, archive):
        df = registered.read.format("article_replay").option("path", archive).load()
        n = df.select(F.spark_partition_id().alias("p")).distinct().count()
        assert n == 2, "each shard file should scan as its own partition"

    def test_shard_filter_prunes_partitions(self, registered, archive):
        df = (
            registered.read.format("article_replay")
            .option("path", archive)
            .load()
            .filter(F.col("shard_id") == "shard-001")
        )
        assert df.count() == 1
        # Pruning must be observable in the *physical* partitioning, not
        # just in which partitions happen to produce rows: the filter is
        # narrow, so the stage's partition count equals the scan's. An
        # unpruned scan would still show 2 partitions (one empty).
        assert df.rdd.getNumPartitions() == 1

    def test_downstream_pipeline_batch(self, registered, archive):
        """The reference's transform chain runs unchanged on this source:
        data (binary) -> cast string -> parse -> windowed avg."""
        from spark_kinesis_article_analysis_spark.operators.article import (
            parse_articles,
            windowed_avg_word_count,
            with_word_count,
        )

        raw = registered.read.format("article_replay").option("path", archive).load()
        parsed = with_word_count(parse_articles(raw.select(F.col("data"))))
        out = windowed_avg_word_count(parsed, watermark=None).collect()
        by_author = {r.author for r in out}
        assert by_author == {"alice", "bob"}
        alice_00 = [
            r
            for r in out
            if r.author == "alice" and str(r.window_start) == "2024-01-01 00:00:00"
        ]
        assert alice_00 and alice_00[0].average_word_count == 3.0  # (4+2)/2


class TestStreamRead:
    def test_incremental_batches_and_rate_cap(self, registered, archive, tmp_path):
        """The cap bounds steady-state micro-batches without ever
        re-delivering or dropping a row. The first batch of a reader's
        life is uncapped by design (``latestOffset`` runs before any
        base offset is known — see the stream reader docstring), so the
        cap is asserted on the post-start appends."""
        stream = (
            registered.readStream.format("article_replay")
            .option("path", archive)
            .option("maxRowsPerShardBatch", "1")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("replay_rows")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = registered.sql(
                "SELECT shard_id, sequence_number FROM replay_rows"
            ).collect()
            assert sorted((r.shard_id, r.sequence_number) for r in got) == [
                ("shard-000", 0),
                ("shard-000", 1),
                ("shard-001", 0),
            ]

            # append a 3-row backlog to one shard -> with the cap at 1
            # row/shard/batch it must drain over >=3 further micro-batches,
            # every row exactly once
            batches_before = len([p for p in q.recentProgress if p["numInputRows"] > 0])
            write_archive(
                archive,
                {
                    "shard-001": [
                        _env("b2", "bob", "2024-01-01 00:02:00", "p q r"),
                        _env("b3", "bob", "2024-01-01 00:02:10", "s t"),
                        _env("b4", "bob", "2024-01-01 00:02:20", "u"),
                    ]
                },
            )
            q.processAllAvailable()
            got = registered.sql(
                "SELECT shard_id, sequence_number FROM replay_rows"
            ).collect()
            keys = [(r.shard_id, r.sequence_number) for r in got]
            assert len(keys) == 6 and len(set(keys)) == 6, (
                f"expected 6 exactly-once rows, got {sorted(keys)}"
            )
            nonempty = [p for p in q.recentProgress if p["numInputRows"] > 0]
            assert len(nonempty) - batches_before >= 3, (
                "rate cap should spread the 3-row backlog over >=3 batches"
            )
            assert all(p["numInputRows"] <= 1 for p in nonempty[batches_before:]), (
                "capped batches must carry <=1 row per shard"
            )
        finally:
            q.stop()

    def test_exactly_once_restart_from_checkpoint(self, registered, archive, tmp_path):
        """Stop after committing the archive, append, restart with the
        same checkpoint: only the new rows are delivered (offsets came
        from the checkpoint log, not initialOffset)."""
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sink")

        def start():
            return (
                registered.readStream.format("article_replay")
                .option("path", archive)
                .load()
                .select("shard_id", "sequence_number", "partition_key")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )

        q = start()
        q.processAllAvailable()
        q.stop()
        assert registered.read.parquet(sink).count() == 3

        write_archive(
            archive,
            {
                "shard-000": [_env("a3", "alice", "2024-01-01 00:03:00")],
                # resharding: a brand-new shard appears mid-stream
                "shard-002": [_env("c1", "carol", "2024-01-01 00:03:30")],
            },
        )
        q = start()
        q.processAllAvailable()
        q.stop()
        rows = registered.read.parquet(sink).collect()
        keys = [(r.shard_id, r.sequence_number) for r in rows]
        assert len(rows) == 5, f"expected exactly-once total of 5, got {keys}"
        assert len(set(keys)) == 5
        assert ("shard-002", 0) in keys, "new shard not discovered on restart"

    def test_replay_article_pipeline_restart_matches_batch(
        self, registered, tmp_path
    ):
        """The closest in-env analogue of the reference deployment
        (process_articles.py:53-93): the flagship 5m/1m sliding pipeline
        fed by the article_replay STREAM reader with a parquet sink +
        checkpoint, stopped mid-stream and restarted. Asserts (a)
        exactly-once across the restart and (b) row parity with the
        batch flagship over the full archive."""
        from spark_kinesis_article_analysis_spark.operators.article import (
            parse_articles,
            windowed_avg_word_count,
            with_word_count,
        )

        d = str(tmp_path / "arch3")
        ckpt = str(tmp_path / "ckpt3")
        sink = str(tmp_path / "sink3")
        first = {
            "shard-000": [
                _env("a1", "alice", "2024-01-01 00:00:30", "a b c d"),
                _env("a2", "alice", "2024-01-01 00:01:30", "a b"),
            ],
            "shard-001": [_env("b1", "bob", "2024-01-01 00:00:45", "x y")],
        }
        # far-future close-out rows so every earlier window is past the
        # watermark and APPENDED before the query stops
        second = {
            "shard-000": [_env("z1", "zoe", "2024-01-01 02:00:00", "m")],
            "shard-001": [_env("z2", "zoe", "2024-01-01 04:00:00", "n")],
        }
        write_archive(d, first)

        def start():
            stream = (
                registered.readStream.format("article_replay")
                .option("path", d)
                .load()
            )
            pipe = sp.article_stream(stream.select("data"), watermark="10 seconds")
            return (
                pipe.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )

        q = start()
        q.processAllAvailable()
        q.stop()
        write_archive(d, second)
        q = start()
        q.processAllAvailable()
        q.stop()

        got = registered.read.parquet(sink).collect()
        keys = [(r.author, str(r.window_start)) for r in got]
        assert len(keys) == len(set(keys)), f"duplicate windows after restart: {keys}"

        # batch parity over the same archive via the BATCH reader
        raw = registered.read.format("article_replay").option("path", d).load()
        batch = windowed_avg_word_count(
            with_word_count(parse_articles(raw.select("data"))), watermark=None
        )
        want = {
            (r.author, str(r.window_start)): r.average_word_count
            for r in batch.collect()
        }
        got_map = {
            (r.author, str(r.window_start)): r.average_word_count for r in got
        }
        # the stream emits every window whose end the final watermark
        # passed; zoe's own windows stay open, everything else must match
        closed = {k: v for k, v in want.items() if k[0] != "zoe"}
        assert {k: got_map[k] for k in closed} == closed, (
            f"stream/batch divergence: {got_map} vs {closed}"
        )

    def test_streaming_article_pipeline_on_replay_source(
        self, registered, tmp_path
    ):
        """S1 end-to-end: readStream(article_replay) -> the reference's
        parse/window transforms -> memory sink, watermark closing windows."""
        d = str(tmp_path / "arch2")
        write_archive(
            d,
            {
                "shard-000": [
                    _env("a1", "alice", "2024-01-01 00:00:30", "a b c d"),
                    _env("b1", "bob", "2024-01-01 00:00:45", "a b"),
                ]
            },
        )
        stream = (
            registered.readStream.format("article_replay").option("path", d).load()
        )
        pipe = sp.article_stream(stream.select("data"), watermark="10 seconds")
        q = (
            pipe.writeStream.format("memory")
            .queryName("replay_pipe")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            # watermark has not passed any window end yet -> nothing emitted
            assert registered.sql("SELECT * FROM replay_pipe").count() == 0
            # far-future event closes the earlier windows
            write_archive(
                d, {"shard-000": [_env("c1", "carol", "2024-01-01 02:00:00")]}
            )
            q.processAllAvailable()
            out = registered.sql("SELECT * FROM replay_pipe").collect()
            assert {r.author for r in out} == {"alice", "bob"}
            alice = [r for r in out if r.author == "alice"]
            assert len(alice) == 5  # sliding 5m/1m membership
            assert all(r.average_word_count == 4.0 for r in alice)
        finally:
            q.stop()


class TestWrite:
    def test_batch_write_read_roundtrip(self, registered, tmp_path):
        """Batch writer: rows route to shards (explicit shard_id wins,
        else md5(partition_key) % numShards), staged files land in the
        logs only at commit, and the reader sees positional sequence
        numbers."""
        import os

        d = str(tmp_path / "out_arch")
        rows = [
            ("shard-000", "a1", b'{"k": 1}'),
            ("shard-000", "a2", b'{"k": 2}'),
            ("shard-001", "b1", b'{"k": 3}'),
        ]
        df = registered.createDataFrame(
            rows, "shard_id string, partition_key string, data binary"
        )
        df.coalesce(1).write.format("article_replay").option("path", d).mode(
            "append"
        ).save()
        back = registered.read.format("article_replay").option("path", d).load()
        got = sorted(
            (r.shard_id, r.sequence_number, r.partition_key) for r in back.collect()
        )
        assert got == [
            ("shard-000", 0, "a1"),
            ("shard-000", 1, "a2"),
            ("shard-001", 0, "b1"),
        ]
        # staging fully drained at commit
        assert os.listdir(os.path.join(d, "_staging")) == []

    def test_batch_write_hash_routing(self, registered, tmp_path):
        d = str(tmp_path / "out_arch2")
        df = registered.createDataFrame(
            [(f"pk-{i}", b"x") for i in range(20)],
            "partition_key string, data binary",
        )
        df.write.format("article_replay").option("path", d).option(
            "numShards", "3"
        ).mode("append").save()
        back = registered.read.format("article_replay").option("path", d).load()
        by_shard = {
            r[0]: r[1]
            for r in back.groupBy("shard_id").count().collect()
        }
        assert sum(by_shard.values()) == 20
        assert set(by_shard) <= {"shard-000", "shard-001", "shard-002"}
        assert len(by_shard) >= 2, f"md5 routing should spread keys: {by_shard}"

    def test_overwrite_mode_rejected(self, registered, tmp_path):
        d = str(tmp_path / "out_arch3")
        df = registered.createDataFrame([("p", b"x")], "partition_key string, data binary")
        import pytest as _pytest

        with _pytest.raises(Exception, match="append-only"):
            df.write.format("article_replay").option("path", d).mode("overwrite").save()

    def test_stream_write_idempotent_batch_commit(self, registered, tmp_path):
        """Streaming sink end-to-end (readStream from one archive,
        writeStream into another), then a direct protocol-level check
        that re-committing an already-committed batch id drops the
        staged files instead of double-appending."""
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            ArticleReplayStreamWriter,
            _TempFileCommit,
        )

        src = str(tmp_path / "src_arch")
        dst = str(tmp_path / "dst_arch")
        write_archive(
            src,
            {
                "shard-000": [_env("a1", "alice", "2024-01-01 00:00:30")],
                "shard-001": [_env("b1", "bob", "2024-01-01 00:00:45")],
            },
        )
        stream = (
            registered.readStream.format("article_replay").option("path", src).load()
        )
        q = (
            stream.select("shard_id", "partition_key", "data")
            .writeStream.format("article_replay")
            .option("path", dst)
            .option("checkpointLocation", str(tmp_path / "ckpt_w"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        back = registered.read.format("article_replay").option("path", dst).load()
        assert {(r.shard_id, r.partition_key) for r in back.collect()} == {
            ("shard-000", "a1"),
            ("shard-001", "b1"),
        }

        # replayed commit: same batchId again must be a no-op
        import json as _json
        import os

        w = ArticleReplayStreamWriter({"path": dst})
        staged = os.path.join(dst, "_staging", "shard-000.replay.jsonl")
        os.makedirs(os.path.dirname(staged), exist_ok=True)
        committed = sorted(w._read_log()[0])
        assert committed, "streaming write should have journaled COMMIT entries"
        with open(staged, "w") as f:
            f.write(_json.dumps({"partitionKey": "dup", "data": "d"}) + "\n")
        before = open(os.path.join(dst, "shard-000.jsonl")).read()
        w.commit([_TempFileCommit(temp_files={"shard-000": staged})], committed[-1])
        assert open(os.path.join(dst, "shard-000.jsonl")).read() == before
        assert not os.path.exists(staged), "replayed batch must still drain staging"

    def test_stream_write_crash_between_append_and_commit_rolls_back(
        self, registered, tmp_path
    ):
        """Crash-atomicity: a PREPARE without COMMIT (the crash window
        between appending staged files and journaling the batch) must
        roll the shard logs back to their recorded lengths on recovery,
        so the engine's replay of that batch appends exactly once."""
        import json as _json
        import os

        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            ArticleReplayStreamWriter,
            _TempFileCommit,
        )

        dst = str(tmp_path / "crash_arch")
        w = ArticleReplayStreamWriter({"path": dst})

        def stage(name, envs):
            p = os.path.join(dst, "_staging", name)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "w") as f:
                for e in envs:
                    f.write(_json.dumps(e) + "\n")
            return p

        # batch 0 commits normally
        p0 = stage("shard-000.t0.jsonl", [{"partitionKey": "a", "data": "1"}])
        w.commit([_TempFileCommit(temp_files={"shard-000": p0})], 0)
        good = open(os.path.join(dst, "shard-000.jsonl")).read()

        # simulate batch 1 crashing AFTER the append, BEFORE the COMMIT
        # journal line: perform the steps by hand
        p1 = stage("shard-000.t1.jsonl", [{"partitionKey": "b", "data": "2"}])
        w._append_log(
            "PREPARE 1 "
            + _json.dumps({"shard-000": os.path.getsize(os.path.join(dst, "shard-000.jsonl"))})
        )
        w._append_staged([_TempFileCommit(temp_files={"shard-000": p1})])
        # no COMMIT line -> crash here; the partial append is visible
        assert open(os.path.join(dst, "shard-000.jsonl")).read() != good

        # restart: a fresh writer recovers, truncating the torn append
        w2 = ArticleReplayStreamWriter({"path": dst})
        assert open(os.path.join(dst, "shard-000.jsonl")).read() == good
        # the engine then replays batch 1 -> appended exactly once
        p1b = stage("shard-000.t1b.jsonl", [{"partitionKey": "b", "data": "2"}])
        w2.commit([_TempFileCommit(temp_files={"shard-000": p1b})], 1)
        lines = open(os.path.join(dst, "shard-000.jsonl")).read().strip().splitlines()
        assert len(lines) == 2 and _json.loads(lines[1])["partitionKey"] == "b"
        committed, pending = w2._read_log()
        assert committed == {0, 1} and pending is None


class TestReviewHardening:
    def test_binary_payload_roundtrips_via_base64(self, registered, tmp_path):
        """Non-UTF-8 binary payloads (gzip/avro bytes — the general
        Kinesis record contract) must survive the write->read round trip;
        UTF-8 payloads keep the compact text envelope."""
        d = str(tmp_path / "bin_arch")
        rows = [
            ("shard-000", "gz", b"\x1f\x8b\x08\x00\xff\xfe"),
            ("shard-000", "txt", b'{"k": 1}'),
        ]
        df = registered.createDataFrame(
            rows, "shard_id string, partition_key string, data binary"
        )
        df.coalesce(1).write.format("article_replay").option("path", d).mode(
            "append"
        ).save()
        back = {
            r.partition_key: bytes(r.data)
            for r in registered.read.format("article_replay")
            .option("path", d)
            .load()
            .collect()
        }
        assert back == {"gz": b"\x1f\x8b\x08\x00\xff\xfe", "txt": b'{"k": 1}'}

    def test_streaming_overwrite_rejected(self, registered, tmp_path):
        """Complete output mode hands overwrite=True per micro-batch; the
        append-only sink must reject it instead of silently appending
        cumulative duplicates."""
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            ArticleReplayDataSource,
            RECORD_SCHEMA,
        )

        ds = ArticleReplayDataSource(options={"path": str(tmp_path / "x")})
        with pytest.raises(ValueError, match="append-only"):
            ds.streamWriter(RECORD_SCHEMA, overwrite=True)

    def test_reader_never_counts_uncommitted_rows(self, archive, tmp_path):
        """A writer that crashed mid-append leaves rows in the shard log
        that its recovery will truncate; the reader's latestOffset must
        cap at the dangling PREPARE's pre-append length so rolled-back
        rows are never planned into a batch (and never poison the
        monotonic high-water mark)."""
        import json as _json
        import os

        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            ArticleReplayStreamReader,
        )

        shard = os.path.join(archive, "shard-000.jsonl")
        committed_len = os.path.getsize(shard)
        reader = ArticleReplayStreamReader({"path": archive})
        base = reader.latestOffset()["shard-000"]

        # simulate a crashed writer: PREPARE journaled, rows appended,
        # no COMMIT
        with open(os.path.join(archive, "_committed_batches.log"), "a") as f:
            f.write(f'PREPARE 7 {_json.dumps({"shard-000": committed_len})}\n')
        with open(shard, "a", encoding="utf-8") as f:
            f.write(_json.dumps({"partitionKey": "pk", "data": "torn"}) + "\n")

        assert reader.latestOffset()["shard-000"] == base, (
            "uncommitted rows must not advance the offset"
        )
        # writer recovery commits the epoch -> rows become visible
        with open(os.path.join(archive, "_committed_batches.log"), "a") as f:
            f.write("COMMIT 7\n")
        assert reader.latestOffset()["shard-000"] == base + 1

    def test_torn_final_line_not_counted(self, archive):
        """A partial trailing line (no newline — mid-crash append) is not
        yet durable as a row; the offset must stop before it."""
        import os

        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            ArticleReplayStreamReader,
        )

        shard = os.path.join(archive, "shard-000.jsonl")
        reader = ArticleReplayStreamReader({"path": archive})
        base = reader.latestOffset()["shard-000"]
        with open(shard, "a", encoding="utf-8") as f:
            f.write('{"partitionKey": "pk", "data": "no-newline')  # torn
        assert reader.latestOffset()["shard-000"] == base
        with open(shard, "a", encoding="utf-8") as f:
            f.write('"}\n')  # line completed -> now a row
        assert reader.latestOffset()["shard-000"] == base + 1

    def test_orphaned_staging_swept_at_commit(self, registered, tmp_path):
        """Temp files from tasks that died before returning a commit
        message must not accumulate: any file left under _staging after
        an epoch's commit is an orphan and gets swept."""
        import os

        d = str(tmp_path / "sweep_arch")
        os.makedirs(os.path.join(d, "_staging"), exist_ok=True)
        orphan = os.path.join(d, "_staging", "shard-000.deadtask.jsonl")
        with open(orphan, "w") as f:
            f.write('{"partitionKey": "zombie", "data": "x"}\n')
        df = registered.createDataFrame(
            [("shard-000", "p1", b"live")],
            "shard_id string, partition_key string, data binary",
        )
        df.coalesce(1).write.format("article_replay").option("path", d).mode(
            "append"
        ).save()
        assert os.listdir(os.path.join(d, "_staging")) == []
        rows = registered.read.format("article_replay").option("path", d).load().collect()
        assert [r.partition_key for r in rows] == ["p1"]  # orphan never appended


class TestMalformedEnvelope:
    def test_numeric_partition_key_survives_arrow_read(self, registered, tmp_path):
        """A malformed envelope whose partitionKey is a JSON number must
        not fail the shard scan: the Arrow read path coerces it to its
        string rendering (ADVICE r4 — pa.array(keys, pa.string()) threw
        TypeError, failing the whole shard where the old per-row tuple
        path tolerated the row)."""
        d = str(tmp_path / "archive")
        write_archive(
            d,
            {
                "shard-000": [
                    _env("a1", "alice", "2024-01-01 00:00:30"),
                    {"partitionKey": 42, "data": json.dumps({"article_id": "a2"})},
                    {"partitionKey": None, "data": json.dumps({"article_id": "a3"})},
                ]
            },
        )
        rows = (
            registered.read.format("article_replay")
            .option("path", d)
            .load()
            .orderBy("sequence_number")
            .collect()
        )
        assert [r.partition_key for r in rows] == ["a1", "42", None]


class TestShardSplit:
    """Kinesis-style resharding (SplitShard): the parent seals, children
    open, and the stream reader must deliver every parent row in a
    strictly earlier micro-batch than any child row — the KCL
    parent-before-child rule that preserves per-key order across the
    split — while staying exactly-once."""

    @staticmethod
    def _drive(registered, d, ckpt):
        """Run the stream to exhaustion, collecting (batch_id, rows)."""
        batches = []

        def sink(df, bid):
            rows = [
                (r.shard_id, r.sequence_number, r.partition_key,
                 bytes(r.data).decode("utf-8"))
                for r in df.collect()
            ]
            if rows:
                batches.append((bid, rows))

        q = (
            registered.readStream.format("article_replay")
            .option("path", d)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return batches

    def test_split_seals_parent_and_orders_children_after(
        self, registered, tmp_path
    ):
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            split_shard,
        )

        d = str(tmp_path / "arch")
        # pre-split: keys x and y interleave on the parent
        write_archive(
            d,
            {
                "shard-p": [
                    {"partitionKey": "x", "data": "x-0"},
                    {"partitionKey": "y", "data": "y-0"},
                    {"partitionKey": "x", "data": "x-1"},
                    {"partitionKey": "y", "data": "y-1"},
                ]
            },
        )
        sealed = split_shard(d, "shard-p", ["shard-c0", "shard-c1"])
        assert sealed == 4
        # the sealed parent refuses appends
        with pytest.raises(ValueError, match="sealed"):
            write_archive(d, {"shard-p": [{"partitionKey": "x", "data": "no"}]})
        # a second split of the same parent is refused too
        with pytest.raises(ValueError, match="already sealed"):
            split_shard(d, "shard-p", ["shard-c2"])
        # post-split: each key continues on ONE consistent child
        write_archive(
            d,
            {
                "shard-c0": [
                    {"partitionKey": "x", "data": "x-2"},
                    {"partitionKey": "x", "data": "x-3"},
                ],
                "shard-c1": [{"partitionKey": "y", "data": "y-2"}],
            },
        )
        batches = self._drive(registered, d, str(tmp_path / "ck"))
        all_rows = [r for _, rs in sorted(batches) for r in rs]
        assert len(all_rows) == 7 and len(set(all_rows)) == 7  # exactly-once
        # A fresh start over an already-resharded archive cannot gate the
        # child at the first (blind) poll — the reader can't prove a 0
        # hold wouldn't regress a checkpointed offset — so parent and
        # children may share that batch. partitions() then fuses the
        # lineage-linked slices into ONE sequential ancestors-first
        # partition: DELIVERY order still puts every parent row before
        # any child row.
        shard_seq = [r[0] for r in all_rows]
        last_parent = max(i for i, s in enumerate(shard_seq) if s == "shard-p")
        first_child = min(i for i, s in enumerate(shard_seq) if s != "shard-p")
        assert last_parent < first_child, (
            f"child rows must be delivered after all parent rows: {batches}"
        )
        # per-key order: delivery order reproduces the write order across
        # the split boundary
        for key, want in (("x", ["x-0", "x-1", "x-2", "x-3"]), ("y", ["y-0", "y-1", "y-2"])):
            got = [r[3] for r in all_rows if r[2] == key]
            assert got == want, (key, got, batches)

    def test_split_between_restart_is_exactly_once(self, registered, tmp_path):
        """Stop after the parent is consumed, split + append children,
        restart from the checkpoint: only the child rows arrive, once."""
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            split_shard,
        )

        d = str(tmp_path / "arch")
        ckpt = str(tmp_path / "ck")
        write_archive(
            d,
            {
                "shard-p": [
                    {"partitionKey": "x", "data": "x-0"},
                    {"partitionKey": "y", "data": "y-0"},
                ]
            },
        )
        first = self._drive(registered, d, ckpt)
        assert sorted(r[3] for _, rs in first for r in rs) == ["x-0", "y-0"]

        split_shard(d, "shard-p", ["shard-c0", "shard-c1"])
        write_archive(
            d,
            {
                "shard-c0": [{"partitionKey": "x", "data": "x-1"}],
                "shard-c1": [{"partitionKey": "y", "data": "y-1"}],
            },
        )
        second = self._drive(registered, d, ckpt)  # SAME checkpoint
        got = sorted(r[3] for _, rs in second for r in rs)
        assert got == ["x-1", "y-1"], (
            f"restart must deliver exactly the post-split rows once: {second}"
        )

    def test_gating_holds_while_rate_cap_drains_parent(self, registered, tmp_path):
        """With maxRowsPerShardBatch=1 the parent backlog drains one row
        per batch — children must stay gated through ALL of it. Uses a
        warm-up row so the uncapped first batch (documented reader
        behavior) can't swallow the parent backlog whole."""
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            split_shard,
        )

        d = str(tmp_path / "arch")
        ckpt = str(tmp_path / "ck")
        write_archive(d, {"shard-p": [{"partitionKey": "x", "data": "x-0"}]})

        batches = []

        def sink(df, bid):
            rows = [
                (r.shard_id, r.sequence_number, bytes(r.data).decode("utf-8"))
                for r in df.collect()
            ]
            if rows:
                batches.append((bid, rows))

        def start():
            return (
                registered.readStream.format("article_replay")
                .option("path", d)
                .option("maxRowsPerShardBatch", "1")
                .load()
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        try:
            q.processAllAvailable()  # warm-up: establishes the cap base
            write_archive(
                d,
                {
                    "shard-p": [
                        {"partitionKey": "x", "data": "x-1"},
                        {"partitionKey": "x", "data": "x-2"},
                        {"partitionKey": "x", "data": "x-3"},
                    ]
                },
            )
            split_shard(d, "shard-p", ["shard-c0"])
            write_archive(d, {"shard-c0": [{"partitionKey": "x", "data": "x-4"}]})
            q.processAllAvailable()
        finally:
            q.stop()
        parent_bids = [b for b, rs in batches for r in rs if r[0] == "shard-p"]
        child_bids = [b for b, rs in batches for r in rs if r[0] == "shard-c0"]
        # the 3-row backlog drained over >= 3 capped batches, all before
        # any child batch, and the child row arrived exactly once
        assert len(set(parent_bids)) >= 3
        assert child_bids and max(parent_bids) < min(child_bids)
        payloads = sorted(r[2] for _, rs in batches for r in rs)
        assert payloads == ["x-0", "x-1", "x-2", "x-3", "x-4"]

    def test_child_rows_committed_before_restart_not_redelivered(
        self, registered, tmp_path
    ):
        """ADVICE r8 (high): child rows are consumed and COMMITTED, then
        the query stops and restarts from the checkpoint. On the first
        post-restart poll the reader does not yet know the committed
        offsets (self._high is None); the lineage gate must NOT force the
        child back to 0 — that regresses below the checkpointed offset
        and re-delivers the child's rows. Pre-fix behavior: got
        ['x-1', 'x-2', 'y-1'] instead of ['x-2']."""
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            split_shard,
        )

        d = str(tmp_path / "arch")
        ckpt = str(tmp_path / "ck")
        write_archive(
            d,
            {
                "shard-p": [
                    {"partitionKey": "x", "data": "x-0"},
                    {"partitionKey": "y", "data": "y-0"},
                ]
            },
        )
        split_shard(d, "shard-p", ["shard-c0", "shard-c1"])
        write_archive(
            d,
            {
                "shard-c0": [{"partitionKey": "x", "data": "x-1"}],
                "shard-c1": [{"partitionKey": "y", "data": "y-1"}],
            },
        )
        first = self._drive(registered, d, ckpt)
        assert sorted(r[3] for _, rs in first for r in rs) == [
            "x-0", "x-1", "y-0", "y-1",
        ]

        write_archive(d, {"shard-c0": [{"partitionKey": "x", "data": "x-2"}]})
        second = self._drive(registered, d, ckpt)  # SAME checkpoint
        got = sorted(r[3] for _, rs in second for r in rs)
        assert got == ["x-2"], (
            f"restart must not re-deliver committed child rows: {second}"
        )

    def test_split_with_dangling_prepare_seals_at_committed_prefix(
        self, registered, tmp_path
    ):
        """ADVICE r8 (medium): a writer that crashed between PREPARE and
        COMMIT leaves an uncommitted suffix on the parent log that
        recovery will truncate. A split taken in that state must seal the
        parent at the COMMITTED line count — sealing at the raw newline
        count sets a bar the committed count can never reach, withholding
        the children forever."""
        import os

        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            split_shard,
        )

        d = str(tmp_path / "arch")
        write_archive(
            d,
            {
                "shard-p": [
                    {"partitionKey": "x", "data": "x-0"},
                    {"partitionKey": "x", "data": "x-1"},
                ]
            },
        )
        parent_file = os.path.join(d, "shard-p.jsonl")
        committed_bytes = os.path.getsize(parent_file)
        # crashed writer: fsynced PREPARE, rows appended, no COMMIT
        with open(os.path.join(d, "_committed_batches.log"), "a") as f:
            f.write(f'PREPARE crashed {json.dumps({"shard-p": committed_bytes})}\n')
        with open(parent_file, "a", encoding="utf-8") as f:
            f.write(json.dumps({"partitionKey": "x", "data": "rolled-back"}) + "\n")

        sealed = split_shard(d, "shard-p", ["shard-c0"])
        assert sealed == 2, "seal must stop at the committed prefix, not raw lines"

        write_archive(d, {"shard-c0": [{"partitionKey": "x", "data": "x-2"}]})
        batches = self._drive(registered, d, str(tmp_path / "ck"))
        rows = [r for _, rs in sorted(batches) for r in rs]
        # the uncommitted suffix row never surfaces; the child is NOT
        # withheld (pre-fix: livelock — 'x-2' never arrives because the
        # parent's committed count can never reach a seal of 3); and
        # delivery order keeps parent rows first
        assert [r[3] for r in rows] == ["x-0", "x-1", "x-2"], batches


class TestShardMerge:
    """Kinesis MergeShards: two parents seal, one child opens — the
    child must wait for BOTH parents (per-key order for keys arriving
    from either side), delivery exactly-once."""

    def test_merge_waits_for_all_parents(self, registered, tmp_path):
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            merge_shards,
        )

        d = str(tmp_path / "arch")
        write_archive(
            d,
            {
                "shard-a": [
                    {"partitionKey": "x", "data": "x-0"},
                    {"partitionKey": "x", "data": "x-1"},
                ],
                "shard-b": [{"partitionKey": "y", "data": "y-0"}],
            },
        )
        seals = merge_shards(d, ["shard-a", "shard-b"], "shard-m")
        assert seals == {"shard-a": 2, "shard-b": 1}
        # both parents refuse appends
        for p in ("shard-a", "shard-b"):
            with pytest.raises(ValueError, match="sealed"):
                write_archive(d, {p: [{"partitionKey": "x", "data": "no"}]})
        # post-merge: keys from BOTH parents continue on the child
        write_archive(
            d,
            {
                "shard-m": [
                    {"partitionKey": "x", "data": "x-2"},
                    {"partitionKey": "y", "data": "y-1"},
                ]
            },
        )
        batches = TestShardSplit._drive(registered, d, str(tmp_path / "ck"))
        rows = [r for _, rs in sorted(batches) for r in rs]
        assert sorted(r[3] for r in rows) == ["x-0", "x-1", "x-2", "y-0", "y-1"]
        # fresh start over the already-merged archive: blind first poll
        # can't hold the child (regression risk), so the lineage-linked
        # slices fuse into one ancestors-first partition — every parent
        # row delivers before any child row
        shard_seq = [r[0] for r in rows]
        last_parent = max(i for i, s in enumerate(shard_seq) if s != "shard-m")
        first_child = min(i for i, s in enumerate(shard_seq) if s == "shard-m")
        assert last_parent < first_child, batches
        # per-key order across the merge for both origin parents
        for key, want in (("x", ["x-0", "x-1", "x-2"]), ("y", ["y-0", "y-1"])):
            got = [r[3] for r in rows if r[2] == key]
            assert got == want, (key, got, batches)

    def test_merge_child_held_while_one_parent_lags(self, registered, tmp_path):
        """Rate-cap one parent so it drains over several batches: the
        merge child must stay gated until the SLOWEST parent finishes."""
        from spark_kinesis_article_analysis_spark.sources.replay_source import (
            merge_shards,
        )

        d = str(tmp_path / "arch")
        ckpt = str(tmp_path / "ck")
        write_archive(d, {"shard-a": [{"partitionKey": "x", "data": "x-0"}],
                          "shard-b": [{"partitionKey": "y", "data": "y-0"}]})
        batches = []

        def sink(df, bid):
            rows = [
                (r.shard_id, r.sequence_number, bytes(r.data).decode("utf-8"))
                for r in df.collect()
            ]
            if rows:
                batches.append((bid, rows))

        q = (
            registered.readStream.format("article_replay")
            .option("path", d)
            .option("maxRowsPerShardBatch", "1")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()  # warm-up establishes the cap base
            write_archive(
                d,
                {
                    "shard-b": [
                        {"partitionKey": "y", "data": "y-1"},
                        {"partitionKey": "y", "data": "y-2"},
                        {"partitionKey": "y", "data": "y-3"},
                    ]
                },
            )
            merge_shards(d, ["shard-a", "shard-b"], "shard-m")
            write_archive(d, {"shard-m": [{"partitionKey": "y", "data": "y-4"}]})
            q.processAllAvailable()
        finally:
            q.stop()
        slow_parent_bids = [b for b, rs in batches for r in rs if r[0] == "shard-b"]
        child_bids = [b for b, rs in batches for r in rs if r[0] == "shard-m"]
        assert len(set(slow_parent_bids)) >= 3  # capped drain over >=3 batches
        assert child_bids and max(slow_parent_bids) < min(child_bids)
        assert sorted(r[2] for _, rs in batches for r in rs) == [
            "x-0", "y-0", "y-1", "y-2", "y-3", "y-4",
        ]
