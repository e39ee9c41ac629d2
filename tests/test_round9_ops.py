"""Unit tests for the round-9 surface: BMP codec byte-level behavior,
nearest-neighbor resize semantics, URL canonicalization properties,
interval-algebra invariants, SemDeDup retention dominance, and the
hashed scorer's three-way (Spark / DuckDB / Python-md5) agreement."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS

SPECS = all_specs()


class TestBmpCodecUnits:
    """Byte-level codec behavior no oracle CTE can see: raster recovery,
    padding widths, the corruption taxonomy."""

    def _gradient(self, w, h, r0=10, g0=20, b0=30):
        import numpy as np

        px = np.empty((h, w, 3), dtype=np.uint8)
        px[:, :, 0] = (r0 + np.arange(w)) % 256
        px[:, :, 1] = g0
        px[:, :, 2] = ((b0 + np.arange(h)) % 256)[:, None]
        return px

    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 32])  # every stride-pad residue
    def test_round_trip_exact_all_pad_widths(self, w):
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_bmp_24,
            encode_bmp_24,
        )

        px = self._gradient(w, 5)
        dec = decode_bmp_24(encode_bmp_24(w, 5, px))
        assert dec is not None
        rw, rh, stride, fsize, raster = dec
        assert (rw, rh) == (w, 5)
        assert stride == (w * 3 + 3) // 4 * 4
        assert fsize == 54 + stride * 5
        assert np.array_equal(raster, px), "raster must round-trip byte-exact"

    def test_bottom_up_flip_and_bgr_swap_verified_in_bytes(self):
        """Read raw pixel bytes straight out of the container: the FIRST
        stored row must be the LAST raster row, in B,G,R order."""
        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            encode_bmp_24,
        )

        px = self._gradient(2, 2, r0=1, g0=2, b0=3)
        payload = encode_bmp_24(2, 2, px)
        first_stored = payload[54:60]  # row y=1 (bottom), pixels x=0,1
        assert first_stored == bytes([4, 2, 1, 4, 2, 2]), first_stored

    def test_corruption_taxonomy_decodes_to_none(self):
        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_bmp_24,
            encode_bmp_24,
        )

        good = encode_bmp_24(4, 3, self._gradient(4, 3))
        assert decode_bmp_24(good) is not None
        cases = {
            "magic": b"XX" + good[2:],
            "short": good[:40],
            "truncated-pixels": good[:-5],
            "bad-bpp": good[:28] + struct.pack("<H", 8) + good[30:],
            "compressed": good[:30] + struct.pack("<I", 1) + good[34:],
            "zero-width": good[:18] + struct.pack("<i", 0) + good[22:],
            "negative-height": good[:22] + struct.pack("<i", -3) + good[26:],
            "size-mismatch": good[:2] + struct.pack("<I", 999) + good[6:],
            "empty": b"",
        }
        for name, b in cases.items():
            assert decode_bmp_24(b) is None, f"{name} must be a clean None"


class TestResizeUnits:
    def test_nearest_picks_even_coordinates(self):
        """out(y', x') == in(2y', 2x') for every output pixel, odd and
        even input dims both."""
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_codec import (
            decode_png_rgb8,
            encode_png_rgb8,
        )

        rng = np.random.default_rng(9)
        for w, h in [(5, 4), (4, 5), (1, 1), (33, 7)]:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            dec = decode_png_rgb8(encode_png_rgb8(w, h, px))
            assert dec is not None
            small = dec[2][::2, ::2]
            assert small.shape == ((h + 1) // 2, (w + 1) // 2, 3)
            for yy in range(small.shape[0]):
                for xx in range(small.shape[1]):
                    assert (small[yy, xx] == px[2 * yy, 2 * xx]).all()


class TestUrlCanonicalProperties:
    def test_canonicalization_is_idempotent(self, spark):
        """canonical(canonical(u)) == canonical(u) over the whole corpus —
        a canonical form that keeps moving isn't canonical."""
        from spark_kinesis_article_analysis_spark.functions.weburl import (
            canonical_url_col,
            raw_url_col,
        )
        from spark_kinesis_article_analysis_spark.catalog import load

        d = load(spark, SF_CORRECTNESS, "documents").where(F.col("doc_id").isNotNull())
        once = d.select(raw_url_col().alias("raw")).select(
            canonical_url_col().alias("raw")
        )
        moved = once.select(
            F.col("raw").alias("c1"), canonical_url_col().alias("c2")
        ).where(F.col("c1") != F.col("c2"))
        assert moved.count() == 0, moved.limit(5).collect()

    def test_dedup_groups_consistent(self, spark):
        """Every canonical group keeps exactly one doc, and it's the min
        doc_id of the group."""
        rows = SPECS["dedup_url_canonical"].build(spark, SF_CORRECTNESS).collect()
        by_canon: dict[str, list] = {}
        for r in rows:
            by_canon.setdefault(r.canonical_url, []).append(r)
        assert any(len(v) > 1 for v in by_canon.values()), (
            "fixture must produce real duplicate groups"
        )
        for canon, members in by_canon.items():
            keepers = [m for m in members if m.kept]
            assert len(keepers) == 1, canon
            assert keepers[0].doc_id == min(m.doc_id for m in members), canon
            assert all(m.n_dups == len(members) for m in members), canon


class TestIntervalInvariants:
    def test_islands_disjoint_ordered_and_cover_inputs(self, spark):
        """Per user: merged islands are strictly separated (half-open —
        gap > 0), n_events sums to the interval count, and every gap
        matches next.start - this.end."""
        rows = (
            SPECS["interval_coalesce"]
            .build(spark, SF_CORRECTNESS)
            .orderBy("user_id", "merged_start_us")
            .collect()
        )
        from collections import defaultdict

        by_user = defaultdict(list)
        for r in rows:
            by_user[r.user_id].append(r)
        merged_any = False
        for u, isl in by_user.items():
            for a, b in zip(isl, isl[1:]):
                assert a.merged_end_us < b.merged_start_us, (u, a, b)
                assert a.gap_to_next_us == b.merged_start_us - a.merged_end_us
            assert isl[-1].gap_to_next_us is None
            merged_any |= any(r.n_events > 1 for r in isl)
        assert merged_any, "fixture durations must actually merge intervals"

    def test_depth_consistent_with_coalesce(self, spark):
        """A user whose max sweep depth is 1 has zero overlapping pairs,
        so every island must be a single event; depth >= 2 implies some
        island merged."""
        depth = {
            r.user_id: r
            for r in SPECS["interval_overlap_depth"].build(spark, SF_CORRECTNESS).collect()
        }
        from collections import defaultdict

        islands = defaultdict(list)
        for r in SPECS["interval_coalesce"].build(spark, SF_CORRECTNESS).collect():
            islands[r.user_id].append(r)
        assert set(depth) == set(islands)
        for u, d in depth.items():
            isl = islands[u]
            assert d.n_intervals == sum(r.n_events for r in isl)
            if d.max_depth == 1:
                # touching ([a,b) meeting [b,c)) merges islands without
                # overlap, so only the converse holds strictly
                assert all(
                    r.n_events == 1 or r.merged_end_us - r.merged_start_us > 0
                    for r in isl
                )
            else:
                assert any(r.n_events > 1 for r in isl), (u, d)


class TestSemanticRetention:
    def test_dropped_iff_dominated(self, spark):
        """Recompute the dominance rule in Python over the collected
        chunk frame: a vector is dropped exactly when some same-chunk
        partner with rounded cosine >= tau sits strictly closer to the
        centroid (vec_id tiebreak)."""
        import math
        from collections import defaultdict

        from spark_kinesis_article_analysis_spark.functions.semantic import (
            SEM_TAU,
            _semantic_chunks,
        )

        ck = _semantic_chunks(spark, SF_CORRECTNESS).collect()
        got = {
            r.vec_id: r.kept
            for r in SPECS["dedup_semantic_cluster"].build(spark, SF_CORRECTNESS).collect()
        }
        chunks = defaultdict(list)
        for r in ck:
            chunks[(r.cluster, r.sub)].append(r)

        def cos(a, b):
            dot = math.fsum(p * q for p, q in zip(a.v, b.v))
            return round(dot / (a.nrm * b.nrm), 6)

        n_dropped = 0
        for members in chunks.values():
            for a in members:
                dominated = any(
                    b.vec_id != a.vec_id
                    and cos(a, b) >= SEM_TAU
                    and (
                        b.cos_cent > a.cos_cent
                        or (b.cos_cent == a.cos_cent and b.vec_id < a.vec_id)
                    )
                    for b in members
                )
                assert got[a.vec_id] == (not dominated), a.vec_id
                n_dropped += dominated
        assert n_dropped > 0, "fixture must produce real semantic drops"


class TestHashedScorerPortability:
    def test_three_way_weight_agreement(self, spark):
        """The md5->bucket->weight arithmetic must agree across Spark
        (conv), DuckDB (hex cast — covered by the oracle), and Python's
        hashlib — recomputed here feature by feature for a corpus
        sample."""
        from spark_kinesis_article_analysis_spark.functions.ranking import (
            HASH_BUCKETS,
            _W_MOD,
            _W_MUL,
        )
        from spark_kinesis_article_analysis_spark.catalog import load

        docs = {
            r.doc_id: r.text
            for r in load(spark, SF_CORRECTNESS, "documents")
            .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
            .limit(25)
            .collect()
        }
        got = {
            r.doc_id: r
            for r in SPECS["text_hashed_ngram_score"].build(spark, SF_CORRECTNESS).collect()
        }

        def weight(feat: str) -> int:
            bucket = int(hashlib.md5(feat.encode()).hexdigest()[:6], 16) % HASH_BUCKETS
            return bucket * _W_MUL % _W_MOD - _W_MOD // 2

        import re

        for doc_id, text in docs.items():
            toks = re.split(r"\s+", text)
            feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            assert got[doc_id].n_feats == len(feats)
            assert got[doc_id].wsum == sum(weight(f) for f in feats), doc_id


class TestBm25Sanity:
    def test_scores_positive_and_rank_consistent(self, spark):
        rows = SPECS["text_bm25_topk"].build(spark, SF_CORRECTNESS).collect()
        assert 0 < len(rows) <= 20
        ordered = sorted(rows, key=lambda r: (-r.score, r.doc_id))
        for want_rank, r in enumerate(ordered, start=1):
            assert r.rank == want_rank
            assert r.score > 0


class TestCountMinProperties:
    def test_one_sided_error_and_collision_visible(self, spark):
        """CMS never under-estimates (min over depths of sums that each
        include the key's own count), and the fixture width is narrow
        enough that SOME probe actually over-estimates — otherwise the
        spec demonstrates nothing about the sketch."""
        rows = SPECS["sketch_countmin_portable"].build(spark, SF_CORRECTNESS).collect()
        assert {r.term for r in rows} == set(
            __import__(
                "spark_kinesis_article_analysis_spark.functions.sketches",
                fromlist=["CMS_PROBES"],
            ).CMS_PROBES
        )
        for r in rows:
            assert r.cms_estimate >= r.true_count, r
            assert r.over_estimate == r.cms_estimate - r.true_count
        assert any(r.over_estimate > 0 for r in rows), (
            "fixture width must force at least one visible collision"
        )


class TestTriangleBruteForce:
    def test_matches_naive_enumeration(self, spark):
        """Recompute edges/wedges/triangles with a naive O(n^3)-ish Python
        closure over the same key-derived graph at sf0.001 — catches an
        orientation or closing bug the (identically-oriented) oracle
        would replicate."""
        from itertools import combinations

        from spark_kinesis_article_analysis_spark.catalog import load
        from spark_kinesis_article_analysis_spark.functions.graph import PR_NODE_MAX

        sf = "/root/testdata/sf0.001"
        keys = [
            r.c_custkey
            for r in load(spark, sf, "customer").select("c_custkey").collect()
            if r.c_custkey is not None and 1 <= r.c_custkey <= PR_NODE_MAX
        ]
        n = len(keys)
        edges = set()
        for u in keys:
            v = (u * 7) % n + 1
            if u != v:
                edges.add((min(u, v), max(u, v)))
            if u >= 2 and u // 2 != u:
                edges.add((min(u, u // 2), max(u, u // 2)))
        tris = sum(
            1
            for a, b, c in combinations(sorted({x for e in edges for x in e}), 3)
            if (a, b) in edges and (b, c) in edges and (a, c) in edges
        )
        got = SPECS["graph_triangle_stats"].build(spark, sf).collect()[0]
        assert got.n_edges == len(edges)
        assert got.n_triangles == tris


class TestTokenBudgetMix:
    def test_prefix_rule_and_budget_range(self, spark):
        """Within each source (md5 order): kept is a PREFIX property —
        once a doc overflows the budget every later doc in hash order is
        also unkept IF its own cumulative total overflows (cum is
        monotone, so kept rows are exactly the cum <= budget prefix);
        budgets sit in [200, 1000)."""
        import hashlib

        rows = SPECS["corpus_token_budget_mix"].build(spark, SF_CORRECTNESS).collect()
        from collections import defaultdict

        by_src = defaultdict(list)
        for r in rows:
            by_src[r.source].append(r)
        kept_some, cut_some = False, False
        for src, ms in by_src.items():
            ms.sort(key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
            assert 200 <= ms[0].budget < 1000
            cum = 0
            for r in ms:
                cum += r.n_tokens
                assert r.cum_tokens == cum, (src, r)
                assert r.kept == (cum <= r.budget), (src, r)
            kept_some |= any(r.kept for r in ms)
            cut_some |= any(not r.kept for r in ms)
        assert kept_some and cut_some, "budgets must land mid-source"


class TestSequencePatterns:
    def test_counts_match_python_re(self, spark):
        """Recompute every pattern with Python's re over independently
        re-sorted sequences — a third regex engine agreeing with both
        Spark (Java) and the oracle (RE2)."""
        import re
        from collections import defaultdict

        from spark_kinesis_article_analysis_spark.catalog import load
        from spark_kinesis_article_analysis_spark.operators.sequence import (
            P_CONVERT,
            P_ERRBURST,
            P_FUNNEL,
        )

        ev = (
            load(spark, SF_CORRECTNESS, "events")
            .where("ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL"
                   " AND event_type IS NOT NULL")
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        seqs = defaultdict(list)
        for r in ev:
            seqs[r.user_id].append((r.ts, r.event_id, r.event_type[0]))
        got = {
            r.user_id: r
            for r in SPECS["seq_pattern_events"].build(spark, SF_CORRECTNESS).collect()
        }
        assert set(got) == set(seqs)
        hit_any = burst_any = False
        for u, items in seqs.items():
            s = "".join(ini for _, _, ini in sorted(items))
            assert got[u].seq_len == len(s)
            assert got[u].n_conversions == len(re.findall(P_CONVERT, s)), u
            assert got[u].n_error_bursts == len(re.findall(P_ERRBURST, s)), u
            assert got[u].funnel_hit == bool(re.search(P_FUNNEL, s)), u
            hit_any |= got[u].funnel_hit
            burst_any |= got[u].n_error_bursts > 0
        assert hit_any and burst_any, "fixture must exercise both patterns"


class TestRankFusion:
    def test_rrf_recomputed_from_member_lists(self, spark):
        """Rebuild both candidate lists from the member specs' outputs
        and recompute RRF in Python — catches a fusion-side rank or
        coalesce bug that identical oracle SQL would replicate."""
        from spark_kinesis_article_analysis_spark.functions.ranking import (
            RRF_K,
            RRF_LIST,
            RRF_TOPK,
            _bm25_scored,
            _hashed_weighted,
            _W_MOD,
        )

        a_rows = _bm25_scored(spark, SF_CORRECTNESS).collect()
        la = {
            r.doc_id: i + 1
            for i, r in enumerate(
                sorted(a_rows, key=lambda r: (-r.score, r.doc_id))[:RRF_LIST]
            )
        }
        b_rows = [r for r in _hashed_weighted(spark, SF_CORRECTNESS).collect() if r.n_feats > 0]
        lb = {
            r.doc_id: i + 1
            for i, r in enumerate(
                sorted(
                    b_rows,
                    key=lambda r: (-round(r.wsum / (r.n_feats * float(_W_MOD)), 6), r.doc_id),
                )[:RRF_LIST]
            )
        }
        want = {}
        for d in set(la) | set(lb):
            want[d] = round(
                (1.0 / (RRF_K + la[d]) if d in la else 0.0)
                + (1.0 / (RRF_K + lb[d]) if d in lb else 0.0),
                6,
            )
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_TOPK]
        got = SPECS["rank_fusion_rrf"].build(spark, SF_CORRECTNESS).collect()
        assert len(got) == len(top)
        fused_from_both = 0
        for r, (doc, rrf) in zip(sorted(got, key=lambda r: r.rank), top):
            assert (r.doc_id, r.rrf) == (doc, rrf), (r, doc, rrf)
            assert r.bm25_rank == la.get(doc) and r.quality_rank == lb.get(doc)
            fused_from_both += r.bm25_rank is not None and r.quality_rank is not None
        assert fused_from_both > 0, (
            "fixture lists must overlap enough that some top-20 doc "
            "carries both ranks"
        )
        assert any(r.bm25_rank is not None for r in got)
        assert any(r.quality_rank is not None for r in got)


class TestGifLzwUnits:
    def test_lzw_round_trip_random_and_adversarial(self):
        import random

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            _lzw_decode_gif,
            _lzw_encode_gif,
        )

        rng = random.Random(99)
        cases = [
            b"",
            b"\x00",
            b"a" * 1000,                      # KwKwK chains
            b"abababababab" * 50,             # classic KwKwK trigger
            bytes(rng.randrange(256) for _ in range(10_000)),  # table overflow -> CLEAR
            bytes(range(256)) * 20,
        ]
        for data in cases:
            enc = _lzw_encode_gif(data)
            assert _lzw_decode_gif(enc) == data, f"len={len(data)}"

    def test_lzw_decoder_rejects_malformed(self):
        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            _lzw_decode_gif,
            _lzw_encode_gif,
        )

        good = _lzw_encode_gif(b"hello world hello world")
        assert _lzw_decode_gif(good[:-2]) is None  # truncated before EOI
        assert _lzw_decode_gif(b"") is None
        # a code far beyond the next unassigned entry: craft 9-bit
        # stream [CLEAR=256, 300] — 300 > len(table) right after clear
        bits = (256) | (300 << 9)
        bad = bytes([bits & 0xFF, (bits >> 8) & 0xFF, (bits >> 16) & 0xFF])
        assert _lzw_decode_gif(bad) is None

    def test_gif_container_round_trip_and_corruption(self):
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_gif87a,
            encode_gif87a,
        )

        w, h, r0, g0 = 19, 7, 250, 77
        idx = ((r0 + np.arange(w) + np.arange(h)[:, None]) % 256).astype(np.uint8)
        payload = encode_gif87a(w, h, idx, g0)
        dec = decode_gif87a(payload)
        assert dec is not None
        rw, rh, raster = dec
        assert (rw, rh) == (w, h)
        assert np.array_equal(raster[:, :, 0], idx)          # palette r = index
        assert (raster[:, :, 1] == g0).all()                 # g constant
        assert np.array_equal(raster[:, :, 2], 255 - idx)    # b = 255 - index
        for bad in (
            b"BAD" + payload[3:],     # smashed signature
            payload[:-1],             # missing trailer
            payload[:40],             # cut inside palette
            payload[:-2] + b"\x01",   # block structure broken
            b"",
        ):
            assert decode_gif87a(bad) is None


class TestJpegCodecUnits:
    def test_constant_block_round_trips_exact(self):
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_jpeg_gray,
            encode_jpeg_gray,
        )

        rng = np.random.default_rng(7)
        for w, h in [(32, 7), (4, 3), (8, 8), (17, 5), (1, 1), (9, 16)]:
            bw, bh = (w + 7) // 8, (h + 7) // 8
            blocks = rng.integers(0, 256, size=(bh, bw))
            px = (
                np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]
            ).astype(np.uint8)
            dec = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
            assert dec is not None and dec[:2] == (w, h)
            assert np.array_equal(dec[2], px), (w, h)

    def test_encoder_refuses_ac_energy(self):
        import numpy as np
        import pytest as _pytest

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            encode_jpeg_gray,
        )

        px = np.arange(64, dtype=np.uint8).reshape(8, 8)  # non-constant
        with _pytest.raises(ValueError):
            encode_jpeg_gray(8, 8, px)

    def test_corruption_taxonomy(self):
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_jpeg_gray,
            encode_jpeg_gray,
        )

        good = encode_jpeg_gray(16, 7, np.full((7, 16), 99, np.uint8))
        assert decode_jpeg_gray(good) is not None
        for name, bad in {
            "magic": b"XX" + good[2:],
            "cut-in-headers": good[:30],
            "no-eoi": good[:-2],
            "empty": b"",
            "scan-truncated": good[: good.index(b"\xff\xda") + 12],
        }.items():
            assert decode_jpeg_gray(bad) is None, name

    def test_decoder_general_ac_path(self):
        """Craft an entropy stream with a real AC coefficient using a
        custom DHT — the decoder's run-length/extend path must
        reconstruct exactly the IDCT our reference arithmetic gives,
        proving the general baseline reader isn't dead code beyond the
        DC-only encoder."""
        import struct

        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            _BitWriter,
            _DC_BITS,
            _DC_VALS,
            _ZIGZAG,
            _canonical_codes,
            _dht_segment,
            _idct8x8,
            decode_jpeg_gray,
        )

        # AC table with EOB (0x00) and (run=0, size=1) (0x01)
        ac_bits = [0, 0, 2] + [0] * 14
        ac_vals = [0x00, 0x01]
        dcc = _canonical_codes(_DC_BITS, _DC_VALS)
        acc = _canonical_codes(ac_bits, ac_vals)
        w = _BitWriter()
        code, ln = dcc[0]  # DC diff 0 -> luma 128 after level shift
        w.put(code, ln)
        code, ln = acc[0x01]  # one AC coef, size 1
        w.put(code, ln)
        w.put(1, 1)  # value +1 at zigzag index 1
        code, ln = acc[0x00]  # EOB
        w.put(code, ln)
        scan = w.flush()
        payload = b"".join(
            [
                b"\xff\xd8",
                b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64),
                b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
                + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]),
                _dht_segment(0x00, _DC_BITS, _DC_VALS),
                _dht_segment(0x10, ac_bits, ac_vals),
                b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0]),
                scan,
                b"\xff\xd9",
            ]
        )
        dec = decode_jpeg_gray(payload)
        assert dec is not None
        coef = np.zeros((8, 8))
        coef.flat[_ZIGZAG[1]] = 1.0
        want = np.clip(np.rint(_idct8x8(coef) + 128.0), 0, 255).astype(np.uint8)
        assert np.array_equal(dec[2], want)


class TestAviCodecUnits:
    def _frames(self, w, h, n, r0=200):
        import numpy as np

        out = []
        for f in range(n):
            px = np.empty((h, w, 3), dtype=np.uint8)
            px[:, :, 0] = (r0 + 7 * f + np.arange(w)) % 256
            px[:, :, 1] = 50
            px[:, :, 2] = 0
            out.append(px)
        return out

    def test_round_trip_exact_multi_frame(self):
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_avi_dib,
            encode_avi_dib,
        )

        for w, h, n in [(5, 3, 1), (32, 7, 5), (4, 4, 2), (1, 1, 3)]:
            frames = self._frames(w, h, n)
            dec = decode_avi_dib(encode_avi_dib(w, h, frames))
            assert dec is not None, (w, h, n)
            rw, rh, got = dec
            assert (rw, rh, len(got)) == (w, h, n)
            for a, b in zip(got, frames):
                assert np.array_equal(a, b)

    def test_corruption_taxonomy(self):
        import struct

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_avi_dib,
            encode_avi_dib,
        )

        good = encode_avi_dib(6, 4, self._frames(6, 4, 2))
        assert decode_avi_dib(good) is not None
        # a '00db' whose data does not match stride*height must fail:
        # append a bogus short frame chunk inside a fresh movi LIST
        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            _riff_chunk,
            _riff_list,
        )

        hdrl_end = good.index(b"LIST", 12 + 4)  # start of the movi LIST
        bad_movi = _riff_list(b"movi", _riff_chunk(b"00db", b"\x00" * 10))
        body = good[12:hdrl_end] + bad_movi
        short_frame = _riff_chunk(b"RIFF", b"AVI " + body)
        for name, bad in {
            "magic": b"XXXX" + good[4:],
            "not-avi": good[:8] + b"WAVE" + good[12:],
            "truncated": good[:40],
            "declared-size-overrun": good[:4] + struct.pack("<I", 10**6) + good[8:],
            "frame-stride-mismatch": short_frame,
            "last-chunk-cut": good[:-2],
            "empty": b"",
        }.items():
            assert decode_avi_dib(bad) is None, name


class TestImageCodecByteFlipFuzz:
    """Robustness hardening for the 100 TB error-row contract: ANY
    mutation of a valid payload must produce either a clean None or a
    successfully decoded result — never an exception. One bad object
    must never kill a scan; these decoders run inside mapInPandas where
    an uncaught error fails the whole task."""

    def _mutants(self, payload: bytes, rng, n=120):
        for _ in range(n):
            kind = rng.randrange(4)
            b = bytearray(payload)
            if kind == 0 and len(b) > 1:  # flip a random byte
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
            elif kind == 1:  # truncate at a random point
                b = b[: rng.randrange(len(b))]
            elif kind == 2 and len(b) > 4:  # overwrite a random u32
                i = rng.randrange(len(b) - 4)
                b[i : i + 4] = rng.randbytes(4)
            else:  # append junk
                b = b + rng.randbytes(rng.randrange(1, 9))
            yield bytes(b)

    def test_all_four_decoders_never_raise(self):
        import random

        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_avi_dib,
            decode_bmp_24,
            decode_gif87a,
            decode_jpeg_gray,
            encode_avi_dib,
            encode_bmp_24,
            encode_gif87a,
            encode_jpeg_gray,
        )

        rng = random.Random(2026)
        w, h = 11, 5
        grad = np.empty((h, w, 3), dtype=np.uint8)
        grad[:, :, 0] = (40 + np.arange(w)) % 256
        grad[:, :, 1] = 7
        grad[:, :, 2] = ((99 + np.arange(h)) % 256)[:, None]
        idx = ((250 + np.arange(w) + np.arange(h)[:, None]) % 256).astype(np.uint8)
        const_cols = np.repeat(
            (np.arange((w + 7) // 8) * 31 % 256), 8
        )[:w][None, :].repeat(h, axis=0).astype(np.uint8)
        payloads = {
            "bmp": (encode_bmp_24(w, h, grad), decode_bmp_24),
            "gif": (encode_gif87a(w, h, idx, 7), decode_gif87a),
            "jpeg": (encode_jpeg_gray(w, h, const_cols), decode_jpeg_gray),
            "avi": (encode_avi_dib(w, h, [grad, grad]), decode_avi_dib),
        }
        for name, (payload, decode) in payloads.items():
            assert decode(payload) is not None, name
            for mutant in self._mutants(payload, rng):
                try:
                    decode(mutant)  # None or a decoded result — both fine
                except Exception as e:  # pragma: no cover
                    raise AssertionError(
                        f"{name} decoder raised {type(e).__name__} on a "
                        f"{len(mutant)}-byte mutant"
                    ) from e


class TestDecoderMemoryBounds:
    def test_jpeg_huge_declared_dims_rejected_without_allocation(self):
        """A crafted SOF0 declaring 65535x65535 must return None before
        attempting the 4 GiB canvas."""
        import struct

        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_jpeg_gray,
            encode_jpeg_gray,
        )

        good = encode_jpeg_gray(8, 8, np.full((8, 8), 5, np.uint8))
        sof = good.index(b"\xff\xc0")
        bad = (
            good[: sof + 5]
            + struct.pack(">HH", 65535, 65535)
            + good[sof + 9 :]
        )
        assert decode_jpeg_gray(bad) is None

    def test_gif_lzw_bomb_aborts_at_declared_raster_size(self):
        """An LZW stream expanding far past width*height must abort
        mid-decode (bounded memory), not decode gigabytes then fail the
        length check."""
        import numpy as np

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            _lzw_decode_gif,
            _lzw_encode_gif,
            decode_gif87a,
            encode_gif87a,
        )

        # a large repetitive index stream compresses tiny but expands big
        bomb = _lzw_encode_gif(b"\x01" * 100_000)
        assert _lzw_decode_gif(bomb, max_output=64) is None
        # splice it into a 4x4 GIF container: decode must return None
        idx = np.zeros((4, 4), dtype=np.uint8)
        payload = encode_gif87a(4, 4, idx, 0)
        # locate the image data: min-code byte follows the descriptor
        desc = payload.index(b"\x2c")
        head = payload[: desc + 11]
        blocks = bytearray()
        for off in range(0, len(bomb), 255):
            chunk = bomb[off : off + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        assert decode_gif87a(bytes(head) + bytes(blocks) + b"\x3b") is None

    def test_avi_nested_list_bomb_returns_none_not_recursionerror(self):
        """~60 KB of back-to-back nested LIST headers (12 bytes buys a
        level => ~5000 deep) must hit the walk depth cap and return None,
        not blow the interpreter recursion limit out of a mapInPandas
        task (ADVICE r9 medium)."""
        import struct

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            decode_avi_dib,
        )

        depth = 5000
        body = b""
        for _ in range(depth):
            # LIST <size> 'bomb' wrapping the previous level
            body = b"LIST" + struct.pack("<I", len(body) + 4) + b"bomb" + body
        payload = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
        assert decode_avi_dib(payload) is None

    def test_gif_huge_declared_dims_rejected_before_lzw(self):
        """A GIF declaring a 65535x65535 raster (u16 maxima => ~4.3e9
        pixels) must return None at the absolute 1<<26-pixel cap before
        the LZW output buffer can grow toward declared-raster size
        (ADVICE r9 low — the relative guard alone lets a ~1 MB stream
        allocate GBs)."""
        import struct

        from spark_kinesis_article_analysis_spark.functions.multimodal_image import (
            GIF_MIN_CODE_SIZE,
            _lzw_encode_gif,
            decode_gif87a,
        )

        w = h = 65535
        head = (
            b"GIF87a"
            + struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # 2-entry global table
            + b"\x00\x00\x00\xff\xff\xff"
            + b"\x2c"
            + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([GIF_MIN_CODE_SIZE])
        )
        bomb = _lzw_encode_gif(b"\x01" * 200_000)
        blocks = bytearray()
        for off in range(0, len(bomb), 255):
            chunk = bomb[off : off + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        assert decode_gif87a(bytes(head) + bytes(blocks) + b"\x3b") is None
