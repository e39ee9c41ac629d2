"""Real WAV/PPM codec tests: parser robustness a hash-green oracle
verdict alone can't prove — chunk walking past foreign chunks, comment-
aware PPM headers, byte-tamper detection, and the plan shape (scan →
two Arrow stages, shuffle-free)."""

from __future__ import annotations

import numpy as np
import pytest

from spark_kinesis_article_analysis_spark.functions.multimodal_codec import (
    FRAME_SAMPLES,
    decode_ppm_p6,
    decode_wav_pcm16,
    encode_ppm_p6,
    encode_wav_pcm16,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


class TestWavCodec:
    def test_round_trip(self):
        samples = [100, -100, 250, 0, -32768, 32767]
        rate, got = decode_wav_pcm16(encode_wav_pcm16(22050, samples))
        assert rate == 22050
        assert got.tolist() == samples

    def test_header_is_exactly_44_bytes(self):
        assert len(encode_wav_pcm16(8000, [])) == 44

    def test_chunk_walk_skips_foreign_chunks(self):
        """A LIST chunk inserted BEFORE fmt/data must not break the read —
        proves the reader walks the chunk list instead of assuming the
        44-byte layout it happens to write."""
        wav = encode_wav_pcm16(8000, [5, -5, 5])
        body = wav[12:]
        foreign = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        riff = b"RIFF" + (4 + len(foreign) + len(body)).to_bytes(4, "little") + b"WAVE"
        rate, got = decode_wav_pcm16(riff + foreign + body)
        assert rate == 8000 and got.tolist() == [5, -5, 5]

    def test_odd_sized_chunk_word_alignment(self):
        """RIFF pads odd-sized chunks to word boundaries; the walker must
        step over the pad byte to find later chunks."""
        wav = encode_wav_pcm16(8000, [7, -7])
        odd = b"JUNK" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # 3 bytes + pad
        body = wav[12:]
        riff = b"RIFF" + (4 + len(odd) + len(body)).to_bytes(4, "little") + b"WAVE"
        rate, got = decode_wav_pcm16(riff + odd + body)
        assert rate == 8000 and got.tolist() == [7, -7]

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda b: b"DEAD" + b[4:],              # smashed RIFF magic
            lambda b: b[:8] + b"XXXX" + b[12:],     # smashed WAVE id
            lambda b: b[:20] + b"\x02\x00" + b[22:],  # stereo (unsupported)
            lambda b: b[:-1],                       # truncated data chunk
        ],
    )
    def test_tampered_payloads_return_none(self, mutate):
        wav = encode_wav_pcm16(16000, [1, 2, 3, 4])
        assert decode_wav_pcm16(mutate(wav)) is None

    def test_square_wave_rms_is_exactly_amp(self):
        amp = 1099  # the synthesis maximum
        wave = np.full(253, amp, dtype="<i2")
        wave[1::2] = -amp
        _, got = decode_wav_pcm16(encode_wav_pcm16(8000, wave))
        x = got.astype(np.float64)
        assert float(np.sqrt((x**2).mean())) == float(amp)  # exact, not approx


class TestPpmCodec:
    def test_round_trip(self):
        raster = bytes(range(24))  # 2x4 RGB
        w, h, got = decode_ppm_p6(encode_ppm_p6(4, 2, raster))
        assert (w, h) == (4, 2)
        assert got.tobytes() == raster

    def test_comment_aware_header(self):
        """'#' comments between header tokens are legal netpbm — a real
        parser must skip them (the synthesizer never writes them, so this
        only passes if the parse is genuinely token-based)."""
        raster = bytes(6)
        payload = b"P6 # comment\n2 # width\n 1\n# maxval next\n255\n" + raster
        w, h, got = decode_ppm_p6(payload)
        assert (w, h) == (2, 1) and got.shape == (1, 2, 3)

    @pytest.mark.parametrize(
        "payload",
        [
            b"P5\n1 1\n255\n\x00\x00\x00",      # wrong magic (P5 is grayscale)
            b"P6\n2 1\n255\n\x00\x00\x00",      # raster shorter than w*h*3
            b"P6\n1 1\n65535\n\x00\x00\x00",    # 16-bit maxval unsupported
            b"P6\n1 1\n255",                    # header never terminates
            b"P6\n-1 1\n255\n",                 # non-digit token
        ],
    )
    def test_malformed_headers_return_none(self, payload):
        assert decode_ppm_p6(payload) is None


class TestCodecSpecs:
    def test_decode_error_rows_are_null_not_fatal(self, spark):
        """Every 97th doc is magic-smashed; the decode spec must keep the
        row with valid=false and NULL features (never raise, never drop)."""
        df = SPECS["multimodal_codec_decode"].build(spark, SF_SMOKE).toPandas()
        bad = df[~df["valid"]]
        assert len(bad) > 0, "corrupt rows missing from the smoke corpus"
        for c in ("sample_rate", "n_samples", "rms", "width", "height", "mean_r"):
            assert bad[c].isna().all(), f"corrupt rows must have NULL {c}"
        good = df[df["valid"]]
        assert len(good) > len(bad)  # corruption is the exception path

    def test_frames_cover_all_samples(self, spark):
        """Per-doc frame sizes must sum to the decoded sample count and
        frame indexes must be gapless — the framing loop loses nothing."""
        dec = SPECS["multimodal_codec_decode"].build(spark, SF_SMOKE).toPandas()
        fr = SPECS["multimodal_codec_frames"].build(spark, SF_SMOKE).toPandas()
        want = dec[dec["valid"] & (dec["mime"] == "audio/wav")].set_index("doc_id")[
            "n_samples"
        ]
        got = fr.groupby("doc_id")["frame_samples"].sum()
        assert got.sort_index().astype("int64").equals(
            want.sort_index().astype("int64")
        )
        for _, g in fr.groupby("doc_id"):
            idx = sorted(g["frame_idx"])
            assert idx == list(range(len(idx)))
            assert (g["frame_samples"] <= FRAME_SAMPLES).all()

    def test_plan_is_scan_plus_arrow_stages_no_shuffle(self, spark):
        """Scale shape: parquet scan pruned to the two key columns, one
        ArrowEvalPython (synth) + one MapInPandas (decode), zero
        exchanges — embarrassingly parallel at any partition count."""
        df = SPECS["multimodal_codec_decode"].build(spark, SF_SMOKE)
        assert inspect.count_exchanges(df) == 0, inspect.explain_str(df)
        cols = inspect.read_schema_columns(df)
        assert set(cols) == {"doc_id", "n_chars"}, cols
        plan = inspect.explain_str(df)
        assert "ArrowEvalPython" in plan and "MapInPandas" in plan, plan

    def test_frames_plan_no_shuffle(self, spark):
        df = SPECS["multimodal_codec_frames"].build(spark, SF_SMOKE)
        assert inspect.count_exchanges(df) == 0, inspect.explain_str(df)
