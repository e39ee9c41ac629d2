"""Incremental (changes-since) reads, vacuum, and schema evolution for
the manifest table format — the protocol semantics the
``s3_manifest_changes_since`` / ``s3_manifest_vacuumed`` /
``s3_manifest_schema_evolution`` oracles can't see: exactness of the
object-set difference under compaction, range-read composition,
validation of the pin, vacuum's referenced-set judgment (tombstoned
manifests keep their objects live), vacuum idempotence, and the
read-side schema adaptation edges (null-fill, prune, widen, and the
loud incompatible-cast failure)."""

from __future__ import annotations

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from tests.test_s3_manifest import (  # noqa: E402
    _fresh,
    _read_rows,
    _write,
)

from spark_kinesis_article_analysis_spark.sources.s3_objects import (  # noqa: E402
    S3ManifestReader,
    _load_manifests,
    _manifest_keys,
    _s3,
    commit_deletes,
    compact_manifests,
    vacuum_orphans,
)


def _low(opts):
    return {k.lower(): v for k, v in opts.items()}


def _read_since(opts, since=None, snapshot=None):
    o = dict(opts)
    if since is not None:
        o["sinceManifest"] = since
    if snapshot is not None:
        o["snapshotManifest"] = snapshot
    r = S3ManifestReader(o)
    out = []
    for p in r.partitions():
        for batch in r.read(p):
            out.extend(zip(*[c.to_pylist() for c in batch.columns]))
    return sorted(out)


def _manifest_log(opts):
    low = _low(opts)
    return [k for k, _ in _load_manifests(_s3(low), low["bucket"], low["prefix"])]


class TestChangesSince:
    def test_since_reads_exactly_the_post_pin_appends(self):
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b")])
        [pin] = _manifest_log(opts)
        _write(opts, [(3, "c")])
        _write(opts, [(4, "d")])
        assert _read_since(opts, since=pin) == [(3, "c"), (4, "d")]

    def test_post_pin_compaction_does_not_replay_history(self):
        """The compaction manifest re-lists EVERY object; a manifest-
        grain 'after the pin' cut would return the whole table. The
        object-set difference must still return only the new rows."""
        opts = _fresh()
        _write(opts, [(1, "a")])
        [pin] = _manifest_log(opts)
        _write(opts, [(2, "b")])
        compact_manifests(opts)
        assert _read_since(opts, since=pin) == [(2, "b")]

    def test_since_equal_to_head_is_empty(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        [pin] = _manifest_log(opts)
        assert _read_since(opts, since=pin) == []

    def test_since_composes_with_snapshot_as_range_read(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        _write(opts, [(2, "b")])
        _write(opts, [(3, "c")])
        log = _manifest_log(opts)
        assert _read_since(opts, since=log[0], snapshot=log[1]) == [(2, "b")]

    def test_unknown_since_key_raises(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        with pytest.raises(ValueError, match="not a committed manifest"):
            _read_since(opts, since="t/manifests/manifest-nope.json")


class TestVacuum:
    def test_vacuum_deletes_only_unreferenced_objects(self):
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b")])
        low = _low(opts)
        client = _s3(low)
        orphan = "t/data/part-orphan.parquet"
        client.put_object(Bucket=low["bucket"], Key=orphan, Body=b"junk")
        deleted = vacuum_orphans(opts)
        assert deleted == [orphan]
        assert _read_rows(opts) == [(1, "a"), (2, "b")]  # data intact
        listed = client.list_objects_v2(Bucket=low["bucket"], Prefix="t/data/")
        assert all(o["Key"] != orphan for o in listed.get("Contents", []))

    def test_vacuum_keeps_objects_of_tombstoned_manifests(self):
        """Compaction tombstones manifests, not objects: a snapshot read
        pinned before the compaction resolves through the replaced
        manifests, so their objects must survive vacuum."""
        opts = _fresh()
        _write(opts, [(1, "a")])
        [pin] = _manifest_log(opts)
        _write(opts, [(2, "b")])
        compact_manifests(opts)
        assert vacuum_orphans(opts) == []  # nothing is garbage
        assert _read_since(opts, snapshot=pin) == [(1, "a")]  # pin intact
        assert _read_rows(opts) == [(1, "a"), (2, "b")]

    def test_vacuum_is_idempotent(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        low = _low(opts)
        _s3(low).put_object(
            Bucket=low["bucket"], Key="t/data/part-x.parquet", Body=b"junk"
        )
        first = vacuum_orphans(opts)
        assert len(first) == 1
        assert vacuum_orphans(opts) == []

    def test_schema_evolution_read_adapts_old_objects(self):
        """Objects written before a column existed surface under the
        table schema with that column nulled; dropped columns prune;
        both column-at-a-time Arrow, no object rewrite."""
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        opts = _fresh()
        _write(opts, [(1, "a")])  # pre-evolution object: (k, v)
        wide = StructType(
            [
                StructField("k", LongType()),
                StructField("v", StringType()),
                StructField("w", LongType()),
            ]
        )
        r = S3ManifestReader(dict(opts), wide)
        out = []
        for p in r.partitions():
            for batch in r.read(p):
                out.extend(zip(*[c.to_pylist() for c in batch.columns]))
        assert sorted(out) == [(1, "a", None)]
        narrow = StructType([StructField("k", LongType())])
        r = S3ManifestReader(dict(opts), narrow)
        out = []
        for p in r.partitions():
            for batch in r.read(p):
                out.extend(zip(*[c.to_pylist() for c in batch.columns]))
        assert out == [(1,)]

    def test_schema_evolution_incompatible_cast_raises(self):
        """A type change the data can't follow must fail loudly at read,
        never silently corrupt."""
        from pyspark.sql.types import LongType, StructField, StructType

        opts = _fresh()
        _write(opts, [(1, "not-a-number")])
        r = S3ManifestReader(
            dict(opts),
            StructType([StructField("k", LongType()), StructField("v", LongType())]),
        )
        with pytest.raises(Exception, match="parse|[Cc]onvert|[Cc]ast|[Ii]nvalid"):
            for p in r.partitions():
                list(r.read(p))

    def test_vacuum_ignores_manifest_prefix(self):
        """Vacuum reclaims data/ only — the manifest log (including
        tombstoned manifests that pinned snapshots replay) is never
        touched."""
        opts = _fresh()
        _write(opts, [(1, "a")])
        _write(opts, [(2, "b")])
        compact_manifests(opts)
        low = _low(opts)
        before = _manifest_keys(_s3(low), low["bucket"], low["prefix"])
        vacuum_orphans(opts)
        after = _manifest_keys(_s3(low), low["bucket"], low["prefix"])
        assert before == after


class TestRowDeletes:
    """Positional delete manifests (merge-on-read): mask semantics,
    snapshot isolation, composition, compaction fold, and the metadata
    columns the planner addresses rows by."""

    def _data_keys(self, opts):
        low = _low(opts)
        return sorted(
            {
                k
                for _, b in _load_manifests(_s3(low), low["bucket"], low["prefix"])
                for k in b["objects"]
            }
        )

    def test_delete_masks_rows_without_rewriting_objects(self):
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b"), (3, "c")])
        [obj] = self._data_keys(opts)
        before = self._data_keys(opts)
        commit_deletes(opts, {obj: [1]})  # positions are parquet row order
        assert _read_rows(opts) == [(1, "a"), (3, "c")]
        assert self._data_keys(opts) == before  # no rewrite, no new object

    def test_snapshot_before_delete_still_sees_rows(self):
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b")])
        [pin] = _manifest_log(opts)
        [obj] = self._data_keys(opts)
        commit_deletes(opts, {obj: [0]})
        assert _read_rows(opts) == [(2, "b")]
        assert _read_since(opts, snapshot=pin) == [(1, "a"), (2, "b")]

    def test_deletes_compose_and_positions_stay_original(self):
        """Survivors keep their ORIGINAL positions: a second delete
        addressing position 2 must hit the original third row even
        after position 0 was already masked."""
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b"), (3, "c")])
        [obj] = self._data_keys(opts)
        commit_deletes(opts, {obj: [0]})
        commit_deletes(opts, {obj: [2]})
        assert _read_rows(opts) == [(2, "b")]

    def test_compaction_folds_delete_vectors_forward(self):
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b")])
        [obj] = self._data_keys(opts)
        commit_deletes(opts, {obj: [0]})
        compact_manifests(opts)
        assert _read_rows(opts) == [(2, "b")]  # row must NOT resurrect
        low = _low(opts)
        log = _load_manifests(_s3(low), low["bucket"], low["prefix"])
        head = [b for _, b in log if b.get("compaction")][-1]
        assert head.get("deletes") == {obj: [0]}

    def test_unknown_object_rejected(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        with pytest.raises(ValueError, match="unknown data objects"):
            commit_deletes(opts, {"t/data/part-nope.parquet": [0]})

    def test_row_position_metadata_columns(self):
        """withRowPosition materializes (_object_key, _row_pos); after a
        delete, survivors report their ORIGINAL positions."""
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b"), (3, "c")])
        [obj] = self._data_keys(opts)
        commit_deletes(opts, {obj: [1]})
        o = dict(opts)
        o["withRowPosition"] = "true"
        r = S3ManifestReader(o)
        out = []
        for p in r.partitions():
            for batch in r.read(p):
                out.extend(zip(*[c.to_pylist() for c in batch.columns]))
        assert sorted(out) == [(1, "a", obj, 0), (3, "c", obj, 2)]


class TestMergeInto:
    """merge_into (upsert) protocol edges that the oracle can't see:
    pure-insert merges commit no delete manifest, snapshot isolation
    around the merge, and update exactness across multiple objects."""

    def _opts_registered(self, spark):
        from pyspark import cloudpickle

        from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

        cloudpickle.register_pickle_by_value(_s3o)
        spark.dataSource.register(_s3o.S3ParquetManifestDataSource)

    def _write_df(self, spark, opts, rows):
        df = spark.createDataFrame(rows, "k long, v string")
        w = df.coalesce(1).write.format("s3_parquet_manifest").mode("append")
        for kk, vv in opts.items():
            w = w.option(kk, vv)
        w.save()

    def _read_df(self, spark, opts):
        reader = spark.read.format("s3_parquet_manifest")
        for kk, vv in opts.items():
            reader = reader.option(kk, vv)
        return sorted(map(tuple, reader.load().collect()))

    def test_upsert_updates_and_inserts_exactly_once(self, spark):
        from spark_kinesis_article_analysis_spark.sources.s3_objects import merge_into

        self._opts_registered(spark)
        opts = _fresh()
        self._write_df(spark, opts, [(1, "a"), (2, "b")])
        self._write_df(spark, opts, [(3, "c")])  # second object
        [pin] = [k for k in _manifest_log(opts) if True][:1]
        src = spark.createDataFrame([(2, "B2"), (3, "C2"), (9, "new")], "k long, v string")
        key = merge_into(spark, opts, src, "k")
        assert key  # matched rows -> a delete manifest committed
        assert self._read_df(spark, opts) == [
            (1, "a"), (2, "B2"), (3, "C2"), (9, "new"),
        ]
        # snapshot pinned before the merge still sees the original rows
        o = dict(opts)
        o["snapshotManifest"] = pin
        reader = spark.read.format("s3_parquet_manifest")
        for kk, vv in o.items():
            reader = reader.option(kk, vv)
        assert sorted(map(tuple, reader.load().collect())) == [(1, "a"), (2, "b")]

    def test_pure_insert_merge_commits_no_delete(self, spark):
        from spark_kinesis_article_analysis_spark.sources.s3_objects import merge_into

        self._opts_registered(spark)
        opts = _fresh()
        self._write_df(spark, opts, [(1, "a")])
        src = spark.createDataFrame([(7, "g")], "k long, v string")
        assert merge_into(spark, opts, src, "k") == ""
        assert self._read_df(spark, opts) == [(1, "a"), (7, "g")]


class TestDataSkipping:
    """Zone-map stats + pushFilters pruning: exclusion proofs, the
    keep-on-uncertainty default, and stats survival across compaction."""

    def _reader_with(self, opts, *filters):
        from spark_kinesis_article_analysis_spark.sources.s3_objects import (
            S3ManifestPruningReader,
        )

        r = S3ManifestPruningReader(dict(opts))
        leftover = list(r.pushFilters(list(filters)))
        assert leftover == list(filters)  # Spark always re-evaluates
        return r

    def test_range_filters_prune_disjoint_objects(self):
        from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b")])    # object A: k in [1, 2]
        _write(opts, [(10, "c"), (20, "d")])  # object B: k in [10, 20]
        _write(opts, [(30, "e")])             # object C: k = 30
        base = S3ManifestReader(dict(opts))
        assert len(base.partitions()) == 3
        r = self._reader_with(opts, EqualTo(("k",), 15))
        assert len(r.partitions()) == 1  # only B can hold 15
        r = self._reader_with(opts, GreaterThan(("k",), 20))
        assert len(r.partitions()) == 1  # only C
        r = self._reader_with(opts, LessThan(("k",), 1))
        assert len(r.partitions()) == 0  # nothing below every min
        # conjunction: k > 2 AND k < 30 -> only B survives
        r = self._reader_with(opts, GreaterThan(("k",), 2), LessThan(("k",), 30))
        assert len(r.partitions()) == 1

    def test_null_count_pruning(self):
        from pyspark.sql.datasource import IsNotNull, IsNull

        opts = _fresh()
        _write(opts, [(1, "a")])       # v never null
        _write(opts, [(2, None)])      # v always null
        r = self._reader_with(opts, IsNull(("v",)))
        assert len(r.partitions()) == 1
        r = self._reader_with(opts, IsNotNull(("v",)))
        assert len(r.partitions()) == 1

    def test_unknown_column_and_filter_types_keep_objects(self):
        from pyspark.sql.datasource import EqualTo, StringContains

        opts = _fresh()
        _write(opts, [(1, "a")])
        r = self._reader_with(opts, EqualTo(("nope",), 5))
        assert len(r.partitions()) == 1  # statless column: keep
        r = self._reader_with(opts, StringContains(("v",), "zzz"))
        assert len(r.partitions()) == 1  # unhandled filter type: keep

    def test_string_range_pruning_and_rows_read_correctly(self):
        from pyspark.sql.datasource import GreaterThan

        opts = _fresh()
        _write(opts, [(1, "apple"), (2, "banana")])
        _write(opts, [(3, "yak"), (4, "zebra")])
        r = self._reader_with(opts, GreaterThan(("v",), "mango"))
        parts = r.partitions()
        assert len(parts) == 1
        out = []
        for p in parts:
            for batch in r.read(p):
                out.extend(zip(*[c.to_pylist() for c in batch.columns]))
        assert sorted(out) == [(3, "yak"), (4, "zebra")]

    def test_stats_survive_compaction(self):
        from pyspark.sql.datasource import LessThan

        opts = _fresh()
        _write(opts, [(1, "a")])
        _write(opts, [(100, "b")])
        compact_manifests(opts)
        r = self._reader_with(opts, LessThan(("k",), 50))
        assert len(r.partitions()) == 1  # pruning still works post-compaction

    def test_engine_level_scan_prunes_objects(self, spark):
        """Through the real engine: with dataSkipping on, a range
        filter over a two-chunk table SCANS only the matching object —
        observed via the scan node's numOutputRows metric (2 rows of
        object A never leave the source), and the answer is exact."""
        from pyspark import cloudpickle

        from spark_kinesis_article_analysis_spark.sources import s3_objects as _s3o

        cloudpickle.register_pickle_by_value(_s3o)
        spark.dataSource.register(_s3o.S3ParquetManifestDataSource)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        opts = _fresh()
        _write(opts, [(1, "a"), (2, "b")])
        _write(opts, [(100, "c")])

        def scan_rows(with_skipping: bool) -> int:
            reader = spark.read.format("s3_parquet_manifest")
            for kk, vv in opts.items():
                reader = reader.option(kk, vv)
            if with_skipping:
                reader = reader.option("dataSkipping", "true")
            df = reader.load()
            filtered = df.where(df.k > 50)
            assert [tuple(r) for r in filtered.collect()] == [(100, "c")]
            scan = filtered._jdf.queryExecution().executedPlan().collectLeaves().head()
            it = scan.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    return kv._2().value()
            raise AssertionError("numOutputRows metric missing")

        assert scan_rows(with_skipping=False) == 3  # base reader: full scan
        assert scan_rows(with_skipping=True) == 1  # object A pruned at plan


class TestSnapshotAtTime:
    """snapshotAtUs boundary semantics: inclusive at a commit instant,
    floor between commits, loud before the first commit, and
    key-pin precedence."""

    def _ts_of(self, opts, key):
        low = _low(opts)
        return dict(_load_manifests(_s3(low), low["bucket"], low["prefix"]))[key][
            "committed_at_us"
        ]

    def _read_at(self, opts, at_us):
        o = dict(opts)
        o["snapshotAtUs"] = str(at_us)
        r = S3ManifestReader(o)
        out = []
        for p in r.partitions():
            for batch in r.read(p):
                out.extend(zip(*[c.to_pylist() for c in batch.columns]))
        return sorted(out)

    def test_boundaries(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        [k1] = _manifest_log(opts)
        _write(opts, [(2, "b")])
        k2 = [k for k in _manifest_log(opts) if k != k1][0]
        t1, t2 = self._ts_of(opts, k1), self._ts_of(opts, k2)
        assert self._read_at(opts, t1) == [(1, "a")]  # inclusive at commit
        if t2 - t1 > 1:
            assert self._read_at(opts, t1 + 1) == [(1, "a")]  # floor between
        assert self._read_at(opts, t2) == [(1, "a"), (2, "b")]
        assert self._read_at(opts, t2 + 10**9) == [(1, "a"), (2, "b")]  # future
        with pytest.raises(ValueError, match="precedes the first commit"):
            self._read_at(opts, t1 - 1)

    def test_key_pin_wins_over_timestamp(self):
        opts = _fresh()
        _write(opts, [(1, "a")])
        [k1] = _manifest_log(opts)
        _write(opts, [(2, "b")])
        o = dict(opts)
        o["snapshotManifest"] = k1
        o["snapshotAtUs"] = str(self._ts_of(opts, k1) + 10**9)
        r = S3ManifestReader(o)
        out = []
        for p in r.partitions():
            for batch in r.read(p):
                out.extend(zip(*[c.to_pylist() for c in batch.columns]))
        assert sorted(out) == [(1, "a")]
