"""Streaming incremental MinHash-LSH (streaming/dedup_stream.py):
map-only signature parity with the batch pipeline, batch/stream
candidate-pair parity, residency-cap semantics, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.functions.dedup import (
    MINHASH_BANDS,
    MINHASH_HASHES,
    _minhash_lsh_candidates,
    _shingles,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.streaming.dedup_stream import (
    minhash_band_rows,
    minhash_lsh_stream,
)
from spark_kinesis_article_analysis_spark.streaming import pipeline as sp

_ROWS_PER_BAND = MINHASH_HASHES // MINHASH_BANDS


def _batch_minhash_aggs():
    return [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
        for i in range(MINHASH_HASHES)
    ]


def _batch_band_key(band: int):
    return F.xxhash64(
        *[F.col(f"mh{band * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)]
    )


def _batch_pairs(spark, rows) -> set:
    d = spark.createDataFrame(rows, "doc_id long, text string")
    cands = _minhash_lsh_candidates(_shingles(d), _batch_minhash_aggs(), _batch_band_key)
    out = {(r.doc_a, r.doc_b) for r in cands.collect()}
    cands.unpersist()
    return out


def _write_docs_batch(spark, dir_path, idx, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append" if idx else "overwrite"
    ).parquet(dir_path)


def _doc_stream(spark, dir_path):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


def _run(spark, df, name):
    q = sp.start_memory_sink(df, name, "append")
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
    (3, "completely different words in this one document here"),
    (4, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
    (5, None),
    (6, "too short"),
]


class TestMapOnlySignatures:
    def test_band_rows_match_batch_signatures(self, spark):
        """The fold-based signature must equal the explode+groupBy batch
        signature doc-for-doc, band-for-band — the invariant that makes
        stream emissions comparable to batch candidates at all."""
        d = spark.createDataFrame(_CORPUS, "doc_id long, text string")
        got = {
            (r.doc_id, r.band, r.band_key)
            for r in minhash_band_rows(d).collect()
        }
        mh = _shingles(d).groupBy("doc_id").agg(*_batch_minhash_aggs())
        want = set()
        for b in range(MINHASH_BANDS):
            want |= {
                (r.doc_id, b, r.bk)
                for r in mh.select("doc_id", _batch_band_key(b).alias("bk")).collect()
            }
        assert got == want
        # NULL and shingle-less docs are absent, like the batch explode.
        assert {r[0] for r in got}.isdisjoint({5, 6})

    def test_band_rows_plan_is_map_only(self, spark):
        d = spark.createDataFrame(_CORPUS, "doc_id long, text string")
        plan = inspect.explain_str(minhash_band_rows(d))
        assert "Exchange" not in plan, plan


class TestStreamBatchParity:
    def test_stream_pairs_match_batch_candidates(self, spark, tmp_path):
        p = str(tmp_path / "docs")
        _write_docs_batch(spark, p, 0, _CORPUS[:2])
        _write_docs_batch(spark, p, 1, _CORPUS[2:4])
        _write_docs_batch(spark, p, 2, _CORPUS[4:])
        rows = _run(spark, minhash_lsh_stream(_doc_stream(spark, p)), "lsh_parity")
        stream_pairs = {(r.doc_a, r.doc_b) for r in rows}
        assert stream_pairs == _batch_pairs(spark, _CORPUS)
        # The exact dup collides in every band with a full signature match.
        full = [r for r in rows if (r.doc_a, r.doc_b) == (1, 4)]
        assert len(full) == MINHASH_BANDS
        assert all(r.est_jaccard == 1.0 for r in full)

    def test_reingested_doc_is_noop(self, spark, tmp_path):
        p = str(tmp_path / "docs_reingest")
        _write_docs_batch(spark, p, 0, _CORPUS[:1])
        _write_docs_batch(spark, p, 1, _CORPUS[:1])  # same doc_id again
        rows = _run(spark, minhash_lsh_stream(_doc_stream(spark, p)), "lsh_reingest")
        assert rows == []

    def test_residency_cap_bounds_state_not_detection(self, spark, tmp_path):
        """cap=2 with four identical docs in one bucket: docs 3 and 4
        still collide against the two residents (detection), but never
        against each other (neither joined the residency)."""
        same = "identical words repeated across every single document here"
        docs = [(i, same) for i in (1, 2, 3, 4)]
        p = str(tmp_path / "docs_cap")
        _write_docs_batch(spark, p, 0, docs)
        rows = _run(
            spark,
            minhash_lsh_stream(_doc_stream(spark, p), max_bucket_docs=2),
            "lsh_cap",
        )
        pairs = {(r.doc_a, r.doc_b) for r in rows}
        assert pairs == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}
        assert (3, 4) not in pairs


class TestLshCheckpointRestart:
    def test_bucket_state_resumes_across_restart(self, spark, tmp_path):
        """Exactly-once across a checkpointed restart: bucket residency
        recovers from the state store, so post-restart arrivals collide
        against pre-restart residents exactly once — the emitted pair
        multiset equals the batch candidate set (one row per colliding
        band), with no duplicates and no lost collisions."""
        pdir = tmp_path / "docs"
        pdir.mkdir()
        sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run():
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(pdir))
            )
            q = (
                minhash_lsh_stream(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300), "drain did not terminate"

        _write_docs_batch(spark, str(pdir), 0, _CORPUS[:2])
        run()  # first run sees docs 1-2 (the near-dup pair)
        _write_docs_batch(spark, str(pdir), 1, _CORPUS[2:])
        run()  # restart from the same checkpoint; docs 3-6 arrive

        got = spark.read.parquet(sink).collect()
        pairs = {(r.doc_a, r.doc_b) for r in got}
        assert pairs == _batch_pairs(spark, _CORPUS)
        # No duplicate emissions: each (band, pair) appears exactly once.
        keyed = [(r.band, r.doc_a, r.doc_b) for r in got]
        assert len(keyed) == len(set(keyed))
        # The cross-restart collision (doc 4 vs resident docs 1 and 2)
        # is present — state, not just offsets, survived the restart.
        assert (1, 4) in pairs and (2, 4) in pairs
