"""Round-9 image surface: a real BMP (Windows DIB) codec and a real
nearest-neighbor resize stage over decoded rasters.

Raises the honest-codec ceiling the same way WAV/PPM (r7) and PNG (r8)
did — stdlib-only encoders/decoders for formats whose specs allow it,
with the decode features stated in closed form by the oracle:

* **BMP** (`multimodal_codec_bmp`): BITMAPFILEHEADER + 40-byte
  BITMAPINFOHEADER, 24-bit uncompressed pixels, BGR byte order,
  bottom-up row order, each row padded to a 4-byte boundary — all four
  quirks exercised and re-derived by the decoder. Same two-axis
  gradient raster and corrupt-row policy as the PNG spec, so the
  channel-mean closed forms carry over and the row padding/flip is
  *provably* undone (a decoder that forgets the bottom-up flip swaps
  the mean_b ramp direction and hash-fails).
* **Resize** (`multimodal_resize_nearest`): the first *transform* stage
  over decoded pixels — decode the real PNG payload, nearest-neighbor
  downsample by 2 in both axes (``raster[::2, ::2]``, the exact map
  ``out(y', x') = in(2y', 2x')``), and re-derive geometry and channel
  means from the RESIZED raster. Because the source raster is a
  deterministic gradient, the resized means have closed forms too: the
  stride-2 ramp ``(r_byte + 2x') % 256`` wraps at most once over the
  output width, so the oracle can state the exact wrapped sum.

Both run as one Arrow-batched ``mapInPandas`` over a map-only plan —
zero shuffles, zero joins; the per-payload Python work is the
documented codec exception (a production deployment swaps the stdlib
codec for an imaging library behind the same batch signature).
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# resolves the worker function's signature from LIVE annotation objects
# (multimodal_codec.py's convention); stringized annotations raise
# UNSUPPORTED_SIGNATURE.
import struct
from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.functions.multimodal_codec import (
    _B_BYTE,
    _CORRUPT,
    _G_BYTE,
    _HEIGHT,
    _R_BYTE,
    _WIDTH,
    decode_png_rgb8,
    synthesize_png_payloads,
)
from spark_kinesis_article_analysis_spark.registry import register

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

BMP_SCHEMA = (
    "doc_id bigint, valid boolean, width int, height int, "
    "row_stride int, file_size int, mean_r double, mean_b double"
)

RESIZE_SCHEMA = (
    "doc_id bigint, valid boolean, out_width int, out_height int, "
    "mean_r double, mean_b double"
)


def encode_bmp_24(width: int, height: int, raster: "object") -> bytes:
    """Real BMP writer: BITMAPFILEHEADER ('BM', file size, pixel-data
    offset 54) + BITMAPINFOHEADER (24 bpp, BI_RGB). Rows are written
    BOTTOM-UP in BGR order, each padded to a 4-byte boundary — the
    format's three classic traps, all round-tripped."""
    import numpy as np

    px = np.asarray(raster, dtype=np.uint8).reshape(height, width, 3)
    stride = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += pad
    file_size = 54 + len(body)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(body)


def decode_bmp_24(payload: bytes) -> "tuple[int, int, int, int, object] | None":
    """Real BMP reader: magic + header validation (24 bpp, BI_RGB,
    positive bottom-up height), stride recomputation, bottom-up flip and
    BGR->RGB swap. Returns (width, height, stride, file_size, raster) or
    None for anything undecodable — one bad object must never kill a
    100 TB scan."""
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    file_size, _r1, _r2, offset = struct.unpack("<IHHI", payload[2:14])
    (
        bi_size,
        width,
        height,
        planes,
        bpp,
        compression,
    ) = struct.unpack("<IiiHHI", payload[14:34])
    if bi_size != 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    if width <= 0 or height <= 0 or offset < 54:
        return None
    stride = (width * 3 + 3) // 4 * 4
    if len(payload) < offset + stride * height or file_size != 54 + stride * height:
        return None
    rows = []
    for y in range(height):
        base = offset + y * stride
        rows.append(payload[base : base + width * 3])
    bgr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(height, width, 3)
    raster = bgr[::-1, :, ::-1]  # flip bottom-up, swap BGR -> RGB
    return width, height, stride, file_size, raster


def _bmp_params(docs: DataFrame) -> DataFrame:
    """documents -> JVM-computed BMP synthesis parameters (the codec
    module's shared-SQL discipline: Python never derives a value the
    oracle can't restate)."""
    return docs.select(
        "doc_id",
        F.expr(_CORRUPT).alias("corrupt"),
        F.expr(_WIDTH).cast("int").alias("width"),
        F.expr(_HEIGHT).cast("int").alias("height"),
        F.expr(_R_BYTE).cast("int").alias("r_byte"),
        F.expr(_G_BYTE).cast("int").alias("g_byte"),
        F.expr(_B_BYTE).cast("int").alias("b_byte"),
    )


def make_bmp_synthesizer() -> "Callable[..., pd.Series]":
    """pandas_udf(BINARY) body: packs real BMP bytes over the PNG spec's
    two-axis gradient (R ramps along x, G constant, B ramps along y).
    Corrupt rows get the full payload with the 2-byte magic smashed;
    NULL-keyed rows get 4 junk bytes."""
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-local import

    def synth(
        corrupt: pd.Series,
        width: pd.Series,
        height: pd.Series,
        r_byte: pd.Series,
        g_byte: pd.Series,
        b_byte: pd.Series,
    ) -> pd.Series:
        out: list[bytes] = []
        for i in range(len(corrupt)):
            if pd.isna(width.iloc[i]) or pd.isna(height.iloc[i]):
                out.append(b"DEAD")
                continue
            w, h = int(width.iloc[i]), int(height.iloc[i])
            px = np.empty((h, w, 3), dtype=np.uint8)
            px[:, :, 0] = (int(r_byte.iloc[i]) + np.arange(w, dtype=np.int64)) % 256
            px[:, :, 1] = int(g_byte.iloc[i])
            px[:, :, 2] = (
                (int(b_byte.iloc[i]) + np.arange(h, dtype=np.int64)) % 256
            )[:, None]
            payload = encode_bmp_24(w, h, px)
            if bool(corrupt.iloc[i]):
                payload = b"XX" + payload[2:]
            out.append(payload)
        return pd.Series(out)

    return synth


def synthesize_bmp_payloads(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary) of real BMP bytes. One
    Arrow-batched projection, no shuffle."""
    synth_udf = F.pandas_udf(make_bmp_synthesizer(), "binary")
    p = _bmp_params(docs)
    return p.select(
        "doc_id",
        synth_udf("corrupt", "width", "height", "r_byte", "g_byte", "b_byte").alias(
            "payload"
        ),
    )


def make_bmp_decoder() -> "Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    """mapInPandas body: real BMP decode with the codec error-row policy
    (undecodable payload -> valid=false + NULL features)."""
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-local import

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "valid", "width", "height",
                    "row_stride", "file_size", "mean_r", "mean_b",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                feat = dict.fromkeys(cols)
                feat.update(doc_id=doc_id, valid=False)
                dec = decode_bmp_24(b)
                if dec is not None:
                    w, h, stride, fsize, raster = dec
                    feat.update(
                        valid=True,
                        width=w,
                        height=h,
                        row_stride=stride,
                        file_size=fsize,
                        mean_r=float(raster[:, :, 0].astype(np.float64).mean()),
                        mean_b=float(raster[:, :, 2].astype(np.float64).mean()),
                    )
                for k, v in feat.items():
                    cols[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(cols["doc_id"], dtype="Int64"),
                    "valid": pd.array(cols["valid"], dtype="boolean"),
                    "width": pd.array(cols["width"], dtype="Int32"),
                    "height": pd.array(cols["height"], dtype="Int32"),
                    "row_stride": pd.array(cols["row_stride"], dtype="Int32"),
                    "file_size": pd.array(cols["file_size"], dtype="Int32"),
                    "mean_r": pd.array(cols["mean_r"], dtype="Float64"),
                    "mean_b": pd.array(cols["mean_b"], dtype="Float64"),
                }
            )

    return decode


@register(
    "multimodal_codec_bmp",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         {_CORRUPT}  AS corrupt,
         {_WIDTH}    AS width,
         {_HEIGHT}   AS height,
         {_R_BYTE}   AS r_byte,
         {_B_BYTE}   AS b_byte
  FROM documents
)
SELECT doc_id,
       coalesce(NOT corrupt, FALSE)                                    AS valid,
       CAST(CASE WHEN NOT corrupt THEN width  END AS INTEGER)          AS width,
       CAST(CASE WHEN NOT corrupt THEN height END AS INTEGER)          AS height,
       -- BGR rows pad to a 4-byte boundary
       CAST(CASE WHEN NOT corrupt THEN (width * 3 + 3) // 4 * 4 END
            AS INTEGER)                                                AS row_stride,
       -- 14-byte file header + 40-byte info header + padded pixel rows
       CAST(CASE WHEN NOT corrupt THEN 54 + ((width * 3 + 3) // 4 * 4) * height END
            AS INTEGER)                                                AS file_size,
       -- identical gradient raster to the PNG spec: same closed-form
       -- channel means (padding bytes never enter the mean; the
       -- bottom-up flip restores the ramp direction)
       CAST(CASE WHEN NOT corrupt THEN
              (width * r_byte + (width * (width - 1)) // 2
               - 256 * greatest(0, r_byte + width - 256))
              / CAST(width AS DOUBLE) END
            AS DOUBLE)                                                 AS mean_r,
       CAST(CASE WHEN NOT corrupt THEN
              (height * b_byte + (height * (height - 1)) // 2
               - 256 * greatest(0, b_byte + height - 256))
              / CAST(height AS DOUBLE) END
            AS DOUBLE)                                                 AS mean_b
FROM p
""",
    tags=("multimodal", "codec", "bmp", "mapInPandas", "north-star"),
    doc=(
        "REAL BMP codec, oracle-verified: rows synthesize actual 24-bit "
        "BI_RGB bitmaps (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte "
        "order, bottom-up rows, 4-byte row padding) from JVM-computed "
        "parameters over the PNG spec's two-axis gradient; the decoder "
        "validates both headers, recomputes the stride, undoes the flip "
        "and channel swap, and re-derives geometry, declared file size, "
        "and channel means, which the oracle states in closed form. "
        "Corrupt-magic rows (every 97th doc) decode to valid=false + NULL "
        "features — the shared codec error contract."
    ),
)
def multimodal_codec_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return synthesize_bmp_payloads(docs).mapInPandas(
        make_bmp_decoder(), schema=BMP_SCHEMA
    )


def make_resize_decoder() -> (
    "Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]"
):
    """mapInPandas body: real PNG decode, then a REAL nearest-neighbor
    2x downsample (``raster[::2, ::2]`` — out(y', x') = in(2y', 2x'))
    and feature extraction from the resized raster."""
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-local import

    def resize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in ("doc_id", "valid", "out_width", "out_height", "mean_r", "mean_b")
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                feat = dict.fromkeys(cols)
                feat.update(doc_id=doc_id, valid=False)
                dec = decode_png_rgb8(b)
                if dec is not None:
                    _w, _h, raster, _nf = dec
                    small = raster[::2, ::2]
                    feat.update(
                        valid=True,
                        out_width=small.shape[1],
                        out_height=small.shape[0],
                        mean_r=float(small[:, :, 0].astype(np.float64).mean()),
                        mean_b=float(small[:, :, 2].astype(np.float64).mean()),
                    )
                for k, v in feat.items():
                    cols[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(cols["doc_id"], dtype="Int64"),
                    "valid": pd.array(cols["valid"], dtype="boolean"),
                    "out_width": pd.array(cols["out_width"], dtype="Int32"),
                    "out_height": pd.array(cols["out_height"], dtype="Int32"),
                    "mean_r": pd.array(cols["mean_r"], dtype="Float64"),
                    "mean_b": pd.array(cols["mean_b"], dtype="Float64"),
                }
            )

    return resize


@register(
    "multimodal_resize_nearest",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         {_CORRUPT}        AS corrupt,
         ({_WIDTH} + 1) // 2  AS w2,
         ({_HEIGHT} + 1) // 2 AS h2,
         {_R_BYTE}         AS r_byte,
         {_B_BYTE}         AS b_byte
  FROM documents
)
SELECT doc_id,
       coalesce(NOT corrupt, FALSE)                               AS valid,
       CAST(CASE WHEN NOT corrupt THEN w2 END AS INTEGER)         AS out_width,
       CAST(CASE WHEN NOT corrupt THEN h2 END AS INTEGER)         AS out_height,
       -- resized R samples the stride-2 ramp (r_byte + 2x') % 256,
       -- x' = 0..w2-1: max value r_byte + 2(w2-1) < 512, so the ramp
       -- wraps AT MOST once; exactly greatest(0, w2 - ceil((256-r)/2))
       -- = greatest(0, w2 - (257 - r_byte) // 2) samples lose 256.
       CAST(CASE WHEN NOT corrupt THEN
              (w2 * r_byte + w2 * (w2 - 1)
               - 256 * greatest(0, w2 - (257 - r_byte) // 2))
              / CAST(w2 AS DOUBLE) END
            AS DOUBLE)                                            AS mean_r,
       CAST(CASE WHEN NOT corrupt THEN
              (h2 * b_byte + h2 * (h2 - 1)
               - 256 * greatest(0, h2 - (257 - b_byte) // 2))
              / CAST(h2 AS DOUBLE) END
            AS DOUBLE)                                            AS mean_b
FROM p
""",
    tags=("multimodal", "resize", "transform", "mapInPandas", "north-star"),
    doc=(
        "REAL image transform stage: decode the actual PNG payload "
        "(multimodal_codec_png's synthesis), nearest-neighbor downsample "
        "2x in both axes (out(y', x') = in(2y', 2x')), and re-derive "
        "geometry and channel means from the RESIZED raster. The stride-2 "
        "gradient samples wrap mod 256 at most once across the output "
        "width, so the oracle states the exact wrapped sums in closed "
        "form. Undecodable payloads pass through as valid=false + NULL "
        "features — a resize stage must tolerate upstream corruption "
        "without re-classifying it."
    ),
)
def multimodal_resize_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return synthesize_png_payloads(docs).mapInPandas(
        make_resize_decoder(), schema=RESIZE_SCHEMA
    )
