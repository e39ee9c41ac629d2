"""The ``kinesis_api`` source against the real AWS wire protocol
(moto-served endpoint): bounded batch drain, per-shard sequence-number
offsets, restart replay fencing, resharding, option mapping.

The batch round-trip's VALUE correctness is the driver-verdicted
``kinesis_api_batch`` oracle (tests/test_oracle_parity.py runs it too);
this file covers the protocol behaviors an oracle can't see."""

from __future__ import annotations

import json

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from spark_kinesis_article_analysis_spark.operators.kinesis_batch import (  # noqa: E402
    _endpoint,
    kinesis_options,
)
from spark_kinesis_article_analysis_spark.sources.kinesis_source import (  # noqa: E402
    KinesisApiBatchReader,
    KinesisApiStreamReader,
    put_records_partition,
)

_COUNTER = {"n": 0}


def _fresh_stream(shards: int = 2) -> tuple[str, object]:
    _COUNTER["n"] += 1
    name = f"t{_COUNTER['n']}"
    client = boto3.client(
        "kinesis",
        region_name="us-east-1",
        endpoint_url=_endpoint(),
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )
    client.create_stream(StreamName=name, ShardCount=shards)
    return name, client


def _put(client, stream: str, n: int, prefix: str = "r") -> set[bytes]:
    payloads = set()
    for i in range(n):
        data = json.dumps({"k": f"{prefix}{i}"}).encode()
        client.put_record(StreamName=stream, Data=data, PartitionKey=f"{prefix}{i}")
        payloads.add(data)
    return payloads


class TestBatchReader:
    def test_snapshot_drains_every_shard_exactly_once(self):
        stream, client = _fresh_stream(shards=3)
        sent = _put(client, stream, 40)
        reader = KinesisApiBatchReader(kinesis_options(stream))
        parts = reader.partitions()
        assert len(parts) == 3
        rows = [row for p in parts for row in reader.read(p)]
        assert {r[0] for r in rows} == sent
        assert len(rows) == 40  # no duplicates across shard partitions
        # envelope integrity: shard field matches the partition that read it
        for p in parts:
            for row in reader.read(p):
                assert row[5] == p.shard_id

    def test_per_shard_sequence_numbers_ascend(self):
        stream, client = _fresh_stream(shards=1)
        _put(client, stream, 10)
        reader = KinesisApiBatchReader(kinesis_options(stream))
        [part] = reader.partitions()
        seqs = [int(row[3]) for row in reader.read(part)]
        assert seqs == sorted(seqs) and len(set(seqs)) == 10

    def test_missing_stream_name_rejected(self):
        with pytest.raises(ValueError, match="streamName"):
            KinesisApiBatchReader({"regionName": "us-east-1"})

    def test_producer_helper_batches_and_counts(self):
        stream, client = _fresh_stream(shards=2)
        rows = [(f"k{i}", json.dumps({"i": i})) for i in range(1203)]
        n = put_records_partition(kinesis_options(stream), iter(rows))
        assert n == 1203  # crosses the 500-record PutRecords cap twice
        reader = KinesisApiBatchReader(kinesis_options(stream))
        got = sum(len(list(reader.read(p))) for p in reader.partitions())
        assert got == 1203


class TestStreamReader:
    def test_offsets_advance_and_only_new_records_surface(self):
        stream, client = _fresh_stream(shards=2)
        first = _put(client, stream, 12, "a")
        r = KinesisApiStreamReader(kinesis_options(stream))
        start = r.initialOffset()
        rows1, off1 = r.read(start)
        rows1 = list(rows1)
        assert {row[0] for row in rows1} == first
        second = _put(client, stream, 7, "b")
        rows2, off2 = r.read(off1)
        rows2 = list(rows2)
        assert {row[0] for row in rows2} == second  # nothing re-read
        rows3, off3 = r.read(off2)
        assert list(rows3) == [] and off3 == off2  # caught up, offset stable

    def test_read_between_offsets_replays_the_exact_batch(self):
        stream, client = _fresh_stream(shards=2)
        _put(client, stream, 9, "a")
        r = KinesisApiStreamReader(kinesis_options(stream))
        start = r.initialOffset()
        rows, end = r.read(start)
        original = sorted(row[3] for row in rows)
        _put(client, stream, 5, "later")  # must NOT leak into the replay
        replay = sorted(row[3] for row in r.readBetweenOffsets(start, end))
        assert replay == original

    def test_latest_starting_position_skips_history(self):
        stream, client = _fresh_stream(shards=2)
        _put(client, stream, 8, "old")
        opts = dict(kinesis_options(stream))
        opts["startingPosition"] = "LATEST"
        r = KinesisApiStreamReader(opts)
        start = r.initialOffset()
        fresh = _put(client, stream, 3, "new")
        rows, _ = r.read(start)
        assert {row[0] for row in rows} == fresh

    def test_split_shard_drains_parent_then_children_no_dups(self):
        stream, client = _fresh_stream(shards=1)
        before = _put(client, stream, 6, "pre")
        r = KinesisApiStreamReader(kinesis_options(stream))
        rows1, off1 = r.read(r.initialOffset())
        assert {row[0] for row in rows1} == before
        desc = client.describe_stream(StreamName=stream)["StreamDescription"]
        parent = desc["Shards"][0]
        mid = (
            int(parent["HashKeyRange"]["StartingHashKey"])
            + int(parent["HashKeyRange"]["EndingHashKey"])
        ) // 2
        client.split_shard(
            StreamName=stream,
            ShardToSplit=parent["ShardId"],
            NewStartingHashKey=str(mid),
        )
        after = _put(client, stream, 10, "post")
        rows2, off2 = r.read(off1)
        rows2 = list(rows2)
        assert {row[0] for row in rows2} == after
        assert len(rows2) == 10
        # parent closed: recorded in the offset, never re-polled, and a
        # further read stays empty + stable
        assert parent["ShardId"] in off2["closed"]
        rows3, off3 = r.read(off2)
        assert list(rows3) == [] and off3 == off2

    def test_spark_streaming_restart_is_exactly_once(self, spark, tmp_path):
        """Full engine path: readStream through the source, availableNow
        into a parquet sink, stop, ingest more, restart from the same
        checkpoint — the second run appends ONLY the new records."""
        from pyspark import cloudpickle

        from spark_kinesis_article_analysis_spark.sources import (
            kinesis_source as _ks,
        )

        cloudpickle.register_pickle_by_value(_ks)
        spark.dataSource.register(_ks.KinesisApiDataSource)
        stream, client = _fresh_stream(shards=2)
        _put(client, stream, 15, "one")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        def run_once() -> None:
            reader = spark.readStream.format("kinesis_api")
            for k, v in kinesis_options(stream).items():
                reader = reader.option(k, v)
            q = (
                reader.load()
                .selectExpr("cast(data as string) AS payload")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        assert spark.read.parquet(sink).count() == 15
        _put(client, stream, 6, "two")
        run_once()
        got = [r.payload for r in spark.read.parquet(sink).collect()]
        assert len(got) == 21 and len(set(got)) == 21


class TestOptionMapping:
    def test_secret_key_lands_in_the_secret_slot(self, monkeypatch):
        """The reference passes the ACCESS key in both credential slots
        (process_articles.py:45,57); the source must not replicate it."""
        import boto3 as b3

        from spark_kinesis_article_analysis_spark.sources import kinesis_source

        seen = {}

        def capture(service, **kwargs):
            seen.update(kwargs)
            raise RuntimeError("stop")

        monkeypatch.setattr(b3, "client", capture)
        with pytest.raises(RuntimeError):
            kinesis_source._client(
                {
                    "streamname": "s",
                    "regionname": "eu-west-1",
                    "awsaccesskeyid": "AKID",
                    "awssecretkey": "SECRET",
                    "endpointurl": "http://x",
                }
            )
        assert seen["aws_access_key_id"] == "AKID"
        assert seen["aws_secret_access_key"] == "SECRET"
        assert seen["region_name"] == "eu-west-1"
        assert seen["endpoint_url"] == "http://x"

    def test_merge_shards_seals_parents_and_read_terminates(self):
        """merge_shards closure bookkeeping: both parents (ShardToMerge
        + AdjacentShardToMerge) must land in the offset's closed set and
        subsequent reads must reach a stable fixpoint.

        Payload exactness is deliberately NOT asserted here: moto's
        merge_shards diverges from the Kinesis contract — it copies the
        first parent's records into the child shard and routes
        post-merge puts into the SEALED parents — so an exactly-once
        assertion would be testing the mock's bug, not the reader
        (split_shard is faithful and exactness is asserted in
        test_split_shard_drains_parent_then_children_no_dups). Against
        real Kinesis the same reader logic applies: parents drain to
        their seal, children start fresh."""
        stream, client = _fresh_stream(shards=2)
        before = _put(client, stream, 8, "pre")
        r = KinesisApiStreamReader(kinesis_options(stream))
        rows1, off1 = r.read(r.initialOffset())
        assert {row[0] for row in rows1} == before
        desc = client.describe_stream(StreamName=stream)["StreamDescription"]
        open_shards = [
            s for s in desc["Shards"]
            if "EndingSequenceNumber" not in s["SequenceNumberRange"]
        ]
        assert len(open_shards) == 2
        client.merge_shards(
            StreamName=stream,
            ShardToMerge=open_shards[0]["ShardId"],
            AdjacentShardToMerge=open_shards[1]["ShardId"],
        )
        _put(client, stream, 9, "post")
        rows2, off2 = r.read(off1)
        list(rows2)
        for s in open_shards:
            assert s["ShardId"] in off2["closed"]
        # fixpoint: once everything is drained the offset stops moving
        prev = off2
        for _ in range(3):
            rows, nxt = r.read(prev)
            if list(rows) == [] and nxt == prev:
                break
            prev = nxt
        else:
            raise AssertionError(f"read never reached a fixpoint: {prev}")
