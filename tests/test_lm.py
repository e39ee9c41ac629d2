"""BPE trainer/encoder: exact differential check against an independent
pure-Python reference (the rows-only spec's correctness evidence — the
greedy in-array merge has no honest SQL oracle), plus reconstruction
invariants and the bigram scorer's sanity properties."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from spark_kinesis_article_analysis_spark.functions.lm import (
    BPE_MERGES,
    bpe_train,
    text_bigram_logprob,
)
from tests.conftest import SF_SMOKE


def _python_bpe(texts: list[str], merges: int):
    """Independent reference: classic word-type-grain BPE (Sennrich et
    al. 2016 pseudocode shape) with the spec's tie-break
    (count DESC, pair lexicographic ASC) and greedy left-to-right
    non-overlapping merging."""
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                vocab[w] += 1
    toks = {w: list(w) for w in vocab}
    table = []
    for _ in range(merges):
        counts = Counter()
        for w, f in vocab.items():
            ts = toks[w]
            for i in range(len(ts) - 1):
                counts[(ts[i], ts[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        table.append((a, b, a + b, cnt))
        for w in toks:
            ts = toks[w]
            out, prev = [], None
            for t in ts:
                if prev is not None and prev == a and t == b:
                    out.append(a + b)
                    prev = None
                elif prev is None:
                    prev = t
                else:
                    out.append(prev)
                    prev = t
            if prev is not None:
                out.append(prev)
            toks[w] = out
    return toks, table


@pytest.mark.parity
class TestBpe:
    def test_merge_table_and_encodings_match_reference(self, spark):
        texts = [
            r.text
            for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("text")
            .collect()
        ]
        ref_toks, ref_table = _python_bpe(texts, BPE_MERGES)
        vocab, table = bpe_train(spark, SF_SMOKE, merges=BPE_MERGES)
        assert table == ref_table, f"merge tables diverge: {table} vs {ref_table}"
        got = {r.word: list(r.toks) for r in vocab.select("word", "toks").collect()}
        assert got == ref_toks

    def test_reconstruction_invariant(self, spark):
        """BPE merging never changes the text: concat(tokens) == word
        for every word at the end of training."""
        vocab, _ = bpe_train(spark, SF_SMOKE, merges=BPE_MERGES)
        from pyspark.sql import functions as F

        bad = vocab.filter(F.concat_ws("", "toks") != F.col("word")).count()
        assert bad == 0

    def test_encode_spec_matches_vocab_join_form(self, spark):
        """The registered encode (map-side merge-table re-encode, r12 —
        no word-type broadcast) must agree row-for-row with the
        join-the-trained-vocab form it replaced, and its plan must not
        join/broadcast any relation at all below the doc_id agg."""
        from pyspark.sql import functions as F

        from spark_kinesis_article_analysis_spark.catalog import load
        from spark_kinesis_article_analysis_spark.functions.lm import (
            text_bpe_train_encode,
        )
        from spark_kinesis_article_analysis_spark.plans import inspect

        got_df = text_bpe_train_encode(spark, SF_SMOKE)
        got = {r.doc_id: (r.n_chars, r.n_bpe_tokens, r.chars_per_token)
               for r in got_df.collect()}
        vocab, _ = bpe_train(spark, SF_SMOKE, merges=BPE_MERGES)
        enc = vocab.select("word", F.size("toks").alias("n_toks"))
        d = load(spark, SF_SMOKE, "documents")
        doc_words = d.select(
            "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
        ).filter(F.length("word") > 0)
        ref = {
            r.doc_id: (r.n_chars, r.n_bpe_tokens, r.chars_per_token)
            for r in doc_words.join(enc, "word")
            .groupBy("doc_id")
            .agg(
                F.sum(F.length("word")).cast("long").alias("n_chars"),
                F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
                F.round(F.sum(F.length("word")) / F.sum("n_toks"), 6).alias(
                    "chars_per_token"
                ),
            )
            .collect()
        }
        assert got == ref
        plan = inspect.explain_str(got_df)
        assert "Join" not in plan, plan  # encode is join-free: pure map + one agg

    def test_merge_counts_decrease_token_count(self, spark):
        """Each applied merge strictly reduces the summed token count of
        the words containing the pair; totals agree with the table."""
        from pyspark.sql import functions as F

        vocab0, _ = bpe_train(spark, SF_SMOKE, merges=0)
        vocabN, table = bpe_train(spark, SF_SMOKE, merges=BPE_MERGES)
        n0 = vocab0.agg(F.sum(F.size("toks") * F.col("freq"))).collect()[0][0]
        nN = vocabN.agg(F.sum(F.size("toks") * F.col("freq"))).collect()[0][0]
        # every weighted merge removes exactly one token occurrence
        assert n0 - nN == sum(cnt for _, _, _, cnt in table)


@pytest.mark.parity
class TestBigramScore:
    def test_word_salad_scores_below_real_text(self, spark, tmp_path):
        """The property the bigram filter exists for: text made of
        COMMON words in random order scores below the real corpus text
        its words came from (a unigram model cannot tell them apart)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import random

        real = "the quick brown fox jumps over the lazy dog " * 20
        words = real.split()
        shuffled = list(words)
        random.Random(7).shuffle(shuffled)  # non-periodic: salad bigrams
        salad = " ".join(shuffled)          # each occur ~once vs 20x real
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([real.strip(), salad], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["a", "a"], pa.string()),
                "n_chars": pa.array([len(real), len(salad)], pa.int64()),
            }
        )
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(tbl, d / "documents.parquet")
        rows = {
            r.doc_id: r.avg_bigram_logprob
            for r in text_bigram_logprob(spark, str(d)).collect()
        }
        assert rows[1] < rows[0], rows
