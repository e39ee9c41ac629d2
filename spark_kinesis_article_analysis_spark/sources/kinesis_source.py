"""Real Kinesis read path over the AWS wire API (boto3), as a Spark 4
Python DataSource — format name ``kinesis_api``.

The reference consumes Kinesis through a JVM connector jar
(``reference docker-compose.yml:115``) that is absent from this
environment. This source reads the SAME service through the public
HTTP API instead: ``ListShards`` -> ``GetShardIterator`` ->
``GetRecords``, one Spark input partition per shard for the batch
reader (parallel, shard-pruned — the same partitioning unit every
Kinesis connector uses). The output schema mirrors the connector
envelope (``data``/``partitionKey``/``sequenceNumber``/``shardId``/...)
so everything downstream — ``operators/article.parse_articles``, the
window aggregation, the parquet sink — is byte-for-byte the shared
pipeline code.

Option names map 1:1 to ``streaming/kinesis.KinesisConfig`` and the AWS
Labs connector (``streamName``, ``regionName``, ``endpointUrl``,
``awsAccessKeyId``, ``awsSecretKey``, ``startingPosition``). The
``awsSecretKey`` option carries the SECRET key — the reference's
credential swap bug (``process_articles.py:45,57`` passes the access
key in both slots) is deliberately not replicated, same as
``streaming/kinesis.py``.

Two readers:

* **batch** (``spark.read.format("kinesis_api")``): a bounded snapshot
  — each shard drains from its start position until GetRecords reports
  caught-up (no records and ``MillisBehindLatest == 0``) or the shard
  is closed (``NextShardIterator`` null past a split/merge). One input
  partition per shard; boto3 clients are constructed inside ``read()``
  on the worker, never pickled.
* **streaming** (``spark.readStream.format("kinesis_api")``): a
  :class:`SimpleDataSourceStreamReader` with per-shard sequence-number
  offsets — exactly-once across restarts (``readBetweenOffsets``
  replays a committed range by fencing on the recorded end sequence
  numbers). Driver-side by design: the Simple reader is the
  offset/restart CONTRACT proof against the real wire protocol; the
  shard-parallel scale path is the batch reader (and, in a jar-equipped
  deployment, the JVM connector — swap documented in MIGRATION.md).

Resharding: a split/merge closes the parent shard (it gains an
``EndingSequenceNumber`` and its iterator eventually returns a null
``NextShardIterator``). Both readers drain parents before children —
shards are ordered parent-first (Kinesis guarantees a record routed to
a parent precedes any same-key record in its children), and the stream
reader remembers closed shards in the offset so they are never
re-polled.

Tested against the real API served by moto (``tests/test_kinesis_api.py``)
— stream creation, multi-shard ingest, TRIM_HORIZON drain, per-shard
sequence ordering, restart replay, and a split mid-stream.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

if TYPE_CHECKING:
    from pyspark.sql.types import StructType

#: Connector-envelope schema (AWS Labs connector field names).
ENVELOPE_SCHEMA = (
    "data binary, streamName string, partitionKey string, "
    "sequenceNumber string, approximateArrivalTimestamp timestamp, "
    "shardId string"
)

#: GetRecords page size. 1000 keeps round trips low; Kinesis caps the
#: call at 10k records / 10 MB either way.
_GET_LIMIT = 1000


def _client(options: dict):
    """boto3 Kinesis client from connector-style options. Constructed
    lazily inside driver/worker calls — a client is not picklable."""
    import boto3

    kwargs: dict = {"region_name": options.get("regionname", "us-east-1")}
    if options.get("endpointurl"):
        kwargs["endpoint_url"] = options["endpointurl"]
    if options.get("awsaccesskeyid"):
        kwargs["aws_access_key_id"] = options["awsaccesskeyid"]
    if options.get("awssecretkey"):
        # the SECRET key — see module docstring re the reference's swap bug
        kwargs["aws_secret_access_key"] = options["awssecretkey"]
    return boto3.client("kinesis", **kwargs)


def _norm_options(options: dict) -> dict:
    """Lower-case option keys once (Spark lower-cases DataSource option
    names already; normalizing again keeps direct construction in tests
    honest)."""
    return {str(k).lower(): v for k, v in options.items()}


def _list_shards_parent_first(client, stream: str) -> list[dict]:
    """All shards (open and closed), parents before children — the drain
    order that preserves per-key ordering across a reshard."""
    shards: list[dict] = []
    token = None
    while True:
        kwargs = {"StreamName": stream} if token is None else {"NextToken": token}
        resp = client.list_shards(**kwargs)
        shards.extend(resp["Shards"])
        token = resp.get("NextToken")
        if not token:
            break
    by_id = {s["ShardId"]: s for s in shards}

    def depth(s: dict) -> int:
        d, cur = 0, s
        while cur.get("ParentShardId") in by_id:
            cur = by_id[cur["ParentShardId"]]
            d += 1
        return d

    return sorted(shards, key=lambda s: (depth(s), s["ShardId"]))


def _drain_shard(
    client,
    stream: str,
    shard_id: str,
    after_seq: str | None,
    stop_after_seq: str | None = None,
) -> "tuple[list, str | None, bool]":
    """Read a shard's currently-available records.

    Starts AFTER ``after_seq`` (TRIM_HORIZON when None); stops when the
    shard reports caught-up, closes, or (when ``stop_after_seq`` is set,
    the replay fence) the recorded end sequence number is reached.
    Returns (records, last_seq_or_None, closed).
    """
    if after_seq:
        it = client.get_shard_iterator(
            StreamName=stream,
            ShardId=shard_id,
            ShardIteratorType="AFTER_SEQUENCE_NUMBER",
            StartingSequenceNumber=after_seq,
        )["ShardIterator"]
    else:
        it = client.get_shard_iterator(
            StreamName=stream, ShardId=shard_id, ShardIteratorType="TRIM_HORIZON"
        )["ShardIterator"]
    out: list = []
    last_seq: str | None = None
    closed = False
    while it:
        resp = client.get_records(ShardIterator=it, Limit=_GET_LIMIT)
        recs = resp.get("Records", [])
        for r in recs:
            if stop_after_seq is not None and int(r["SequenceNumber"]) > int(
                stop_after_seq
            ):
                return out, last_seq, closed
            out.append(r)
            last_seq = r["SequenceNumber"]
        it = resp.get("NextShardIterator")
        if it is None:
            closed = True  # SHARD_END: the shard was split/merged away
            break
        if not recs and resp.get("MillisBehindLatest", 0) == 0:
            break  # caught up with the tip — bounded snapshot ends here
    return out, last_seq, closed


def _envelope(rec: dict, stream: str, shard_id: str) -> tuple:
    ts = rec.get("ApproximateArrivalTimestamp")
    if ts is not None and ts.tzinfo is not None:
        # Spark converts naive datetimes in the session zone; normalize
        # to naive UTC so the envelope is session-tz independent.
        import datetime as _dt

        ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return (
        bytes(rec["Data"]),
        stream,
        rec["PartitionKey"],
        rec["SequenceNumber"],
        ts,
        shard_id,
    )


class KinesisShardPartition(InputPartition):
    def __init__(self, shard_id: str) -> None:
        self.shard_id = shard_id


class KinesisApiBatchReader(DataSourceReader):
    """Bounded snapshot read: one partition per shard, each draining
    TRIM_HORIZON -> current tip on the executor."""

    def __init__(self, options: dict) -> None:
        self.options = _norm_options(options)
        if not self.options.get("streamname"):
            raise ValueError("kinesis_api requires the streamName option")
        pos = self.options.get("startingposition", "TRIM_HORIZON").upper()
        if pos != "TRIM_HORIZON":
            raise ValueError(
                "kinesis_api batch reads are TRIM_HORIZON snapshots; "
                f"startingPosition={pos!r} is a streaming-only concept here"
            )

    def partitions(self) -> Sequence[KinesisShardPartition]:
        client = _client(self.options)
        shards = _list_shards_parent_first(client, self.options["streamname"])
        return [KinesisShardPartition(s["ShardId"]) for s in shards]

    def read(self, partition: KinesisShardPartition) -> Iterator[tuple]:
        if partition is None:
            return  # empty-partitions probe (see s3_objects read note)
        stream = self.options["streamname"]
        client = _client(self.options)
        recs, _last, _closed = _drain_shard(client, stream, partition.shard_id, None)
        for r in recs:
            yield _envelope(r, stream, partition.shard_id)


class KinesisApiStreamReader(SimpleDataSourceStreamReader):
    """Per-shard sequence-number offsets; exactly-once across restarts.

    Offset layout: ``{"seq": {shard_id: last_sequence_number}},
    {"closed": [shard_id, ...]}`` — primitives only, as the offset
    contract requires. A shard absent from ``seq`` has never been read
    (TRIM_HORIZON); a shard in ``closed`` is fully drained past its
    split/merge and is never polled again."""

    def __init__(self, options: dict) -> None:
        self.options = _norm_options(options)
        if not self.options.get("streamname"):
            raise ValueError("kinesis_api requires the streamName option")

    def initialOffset(self) -> dict:
        pos = self.options.get("startingposition", "TRIM_HORIZON").upper()
        if pos == "TRIM_HORIZON":
            return {"seq": {}, "closed": []}
        if pos == "LATEST":
            # start past everything currently in the stream
            client = _client(self.options)
            stream = self.options["streamname"]
            seq: dict[str, str] = {}
            closed: list[str] = []
            for s in _list_shards_parent_first(client, stream):
                recs, last, was_closed = _drain_shard(
                    client, stream, s["ShardId"], None
                )
                if last is not None:
                    seq[s["ShardId"]] = last
                if was_closed:
                    closed.append(s["ShardId"])
            return {"seq": seq, "closed": closed}
        raise ValueError(f"unsupported startingPosition {pos!r}")

    def read(self, start: dict) -> "tuple[Iterator[tuple], dict]":
        stream = self.options["streamname"]
        client = _client(self.options)
        seq = dict(start.get("seq", {}))
        closed = set(start.get("closed", []))
        out: list[tuple] = []
        # re-list every batch: resharding creates shards mid-stream
        for s in _list_shards_parent_first(client, stream):
            sid = s["ShardId"]
            if sid in closed:
                continue
            recs, last, was_closed = _drain_shard(client, stream, sid, seq.get(sid))
            for r in recs:
                out.append(_envelope(r, stream, sid))
            if last is not None:
                seq[sid] = last
            # a shard is done when its iterator hit SHARD_END, or when
            # the metadata says it's sealed (EndingSequenceNumber set —
            # no record can ever be appended) and we just drained to the
            # tip. The metadata check matters because some servers (moto
            # included) keep vending iterators for sealed shards instead
            # of nulling NextShardIterator.
            if was_closed or "EndingSequenceNumber" in s.get(
                "SequenceNumberRange", {}
            ):
                closed.add(sid)
        return iter(out), {"seq": seq, "closed": sorted(closed)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Failure-recovery replay of a committed range: re-read each
        shard from start's position, fenced at end's recorded sequence
        number — deterministic because sequence numbers are immutable
        and monotonic per shard."""
        stream = self.options["streamname"]
        client = _client(self.options)
        start_seq = start.get("seq", {})
        end_seq = end.get("seq", {})
        start_closed = set(start.get("closed", []))
        out: list[tuple] = []
        for s in _list_shards_parent_first(client, stream):
            sid = s["ShardId"]
            if sid in start_closed or sid not in end_seq:
                continue
            if start_seq.get(sid) == end_seq[sid]:
                continue  # nothing of this shard in the batch
            recs, _last, _closed = _drain_shard(
                client, stream, sid, start_seq.get(sid), stop_after_seq=end_seq[sid]
            )
            for r in recs:
                out.append(_envelope(r, stream, sid))
        return iter(out)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; Kinesis retention is time-based


class KinesisApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_api"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def reader(self, schema: "StructType") -> KinesisApiBatchReader:
        return KinesisApiBatchReader(self.options)

    def simpleStreamReader(self, schema: "StructType") -> KinesisApiStreamReader:
        return KinesisApiStreamReader(self.options)


def put_records_partition(options: dict, rows: "Iterator") -> int:
    """Producer helper for ``foreachPartition``: PutRecords the
    (partition_key, data) rows of one Spark partition in chunks of 500
    (the API cap), retrying per-record throttles. Returns the record
    count (foreachPartition discards it; callers invoking directly can
    assert). This is the distributed form of the reference's
    ``populate_stream.py`` producer loop."""
    opts = _norm_options(options)
    client = _client(opts)
    stream = opts["streamname"]
    batch: list[dict] = []
    n = 0

    def flush() -> None:
        nonlocal batch
        pending = batch
        batch = []
        while pending:
            resp = client.put_records(StreamName=stream, Records=pending)
            if not resp.get("FailedRecordCount"):
                return
            pending = [
                rec
                for rec, r in zip(pending, resp["Records"])
                if "ErrorCode" in r  # throttled/internal-error rows retry
            ]

    for row in rows:
        data = row.data if hasattr(row, "data") else row[1]
        pk = row.partition_key if hasattr(row, "partition_key") else row[0]
        if isinstance(data, str):
            data = data.encode("utf-8")
        batch.append({"Data": data, "PartitionKey": pk})
        n += 1
        if len(batch) >= 500:
            flush()
    flush()
    return n
