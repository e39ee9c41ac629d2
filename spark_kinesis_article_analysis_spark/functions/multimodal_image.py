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


# ---------------------------------------------------------------------------
# GIF87a codec — real LZW compression, palette indirection
# ---------------------------------------------------------------------------

GIF_SCHEMA = (
    "doc_id bigint, valid boolean, width int, height int, "
    "n_pixels int, palette_size int, mean_r double, mean_b double"
)

#: 256-entry palette: entry i is (r=i, g=g_byte-constant, b=255-i). The
#: linear r/b ramps make the decoded-raster channel means closed-form
#: functions of the INDEX distribution, so the oracle can state them —
#: while the decoder must still run real LZW + palette lookups to get
#: there.
GIF_MIN_CODE_SIZE = 8


def _lzw_encode_gif(indices: "bytes", min_code_size: int = GIF_MIN_CODE_SIZE) -> bytes:
    """GIF-variant LZW: variable code width starting min_code_size+1,
    CLEAR emitted first and whenever the table reaches 4096, END OF
    INFORMATION last; codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        probe = prefix + bytes([b])
        if probe in table:
            prefix = probe
            continue
        emit(table[prefix], width)
        table[probe] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int = GIF_MIN_CODE_SIZE) -> "bytes | None":
    """Inverse of :func:`_lzw_encode_gif`, including the KwKwK case
    (code == next unassigned entry) and mid-stream CLEARs. None on any
    malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    bitbuf = 0
    nbits = 0

    def read(width: int) -> "int | None":
        nonlocal pos, bitbuf, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: "bytes | None" = None
    while True:
        code = read(width)
        if code is None:
            return None  # ran out of bits before EOI
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            return None  # code beyond next unassigned entry
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    # unreachable


def encode_gif87a(width: int, height: int, indices: "object", g_byte: int) -> bytes:
    """Real GIF87a writer: header, logical screen descriptor, 256-entry
    global color table (r=i, g=const, b=255-i), image descriptor, LZW
    image data in 255-byte sub-blocks, trailer."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8).reshape(height, width)
    palette = bytearray()
    for i in range(256):
        palette += bytes([i, g_byte & 0xFF, 255 - i])
    lzw = _lzw_encode_gif(idx.tobytes())
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return b"".join(
        [
            b"GIF87a",
            struct.pack("<HHBBB", width, height, 0xF7, 0, 0),  # GCT, 8-bit, 256 entries
            bytes(palette),
            b"\x2c",
            struct.pack("<HHHHB", 0, 0, width, height, 0),  # no LCT, no interlace
            bytes([GIF_MIN_CODE_SIZE]),
            bytes(blocks),
            b"\x3b",
        ]
    )


def decode_gif87a(payload: bytes) -> "tuple[int, int, object] | None":
    """Real GIF87a reader: signature, screen descriptor, global color
    table, image descriptor validation, sub-block reassembly, LZW
    decode, palette lookup to an RGB raster. Returns
    (width, height, HxWx3 uint8 raster) or None for anything
    undecodable."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    palette = None
    if packed & 0x80:
        n_entries = 2 << (packed & 0x07)
        if off + 3 * n_entries > len(payload):
            return None
        palette = np.frombuffer(
            payload[off : off + 3 * n_entries], dtype=np.uint8
        ).reshape(n_entries, 3)
        off += 3 * n_entries
    if off >= len(payload) or payload[off] != 0x2C or palette is None:
        return None  # plain single-image GIFs only (no extensions)
    if off + 10 > len(payload):
        return None
    left, top, width, height, ipacked = struct.unpack(
        "<HHHHB", payload[off + 1 : off + 10]
    )
    off += 10
    if ipacked & 0x80 or ipacked & 0x40 or not width or not height:
        return None  # no local tables, no interlace
    if left or top or width > sw or height > sh:
        return None
    if off >= len(payload):
        return None
    min_code = payload[off]
    off += 1
    if min_code != GIF_MIN_CODE_SIZE:
        return None
    lzw = bytearray()
    while True:
        if off >= len(payload):
            return None  # missing block terminator
        n = payload[off]
        off += 1
        if n == 0:
            break
        if off + n > len(payload):
            return None
        lzw += payload[off : off + n]
        off += n
    if off >= len(payload) or payload[off] != 0x3B:
        return None  # missing trailer
    indices = _lzw_decode_gif(bytes(lzw), min_code)
    if indices is None or len(indices) != width * height:
        return None
    idx = np.frombuffer(indices, dtype=np.uint8).reshape(height, width)
    if int(idx.max()) >= palette.shape[0]:
        return None
    return width, height, palette[idx]


def make_gif_synthesizer() -> "Callable[..., pd.Series]":
    """pandas_udf(BINARY) body: packs real GIF87a bytes. Index at (y, x)
    is (r_byte + x + y) % 256 — a diagonal ramp, so the LZW dictionary
    sees repeating-but-shifted runs and every scanline differs (a
    decoder that misplaces row boundaries changes the means). Corrupt
    rows get the signature's first 3 bytes smashed; NULL-keyed rows get
    4 junk bytes."""
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-local import

    def synth(
        corrupt: pd.Series,
        width: pd.Series,
        height: pd.Series,
        r_byte: pd.Series,
        g_byte: pd.Series,
    ) -> pd.Series:
        out: list[bytes] = []
        for i in range(len(corrupt)):
            if pd.isna(width.iloc[i]) or pd.isna(height.iloc[i]):
                out.append(b"DEAD")
                continue
            w, h = int(width.iloc[i]), int(height.iloc[i])
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)[:, None]
            idx = ((int(r_byte.iloc[i]) + x + y) % 256).astype(np.uint8)
            payload = encode_gif87a(w, h, idx, int(g_byte.iloc[i]))
            if bool(corrupt.iloc[i]):
                payload = b"BAD" + payload[3:]
            out.append(payload)
        return pd.Series(out)

    return synth


def synthesize_gif_payloads(docs: DataFrame) -> DataFrame:
    synth_udf = F.pandas_udf(make_gif_synthesizer(), "binary")
    p = _bmp_params(docs)  # same JVM-computed parameter family
    return p.select(
        "doc_id",
        synth_udf("corrupt", "width", "height", "r_byte", "g_byte").alias("payload"),
    )


def make_gif_decoder() -> "Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    import numpy as np
    import pandas as pd  # noqa: F811 — worker-local import

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "valid", "width", "height",
                    "n_pixels", "palette_size", "mean_r", "mean_b",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                feat = dict.fromkeys(cols)
                feat.update(doc_id=doc_id, valid=False)
                dec = decode_gif87a(b)
                if dec is not None:
                    w, h, raster = dec
                    feat.update(
                        valid=True,
                        width=w,
                        height=h,
                        n_pixels=w * h,
                        palette_size=256,
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
                    "n_pixels": pd.array(cols["n_pixels"], dtype="Int32"),
                    "palette_size": pd.array(cols["palette_size"], dtype="Int32"),
                    "mean_r": pd.array(cols["mean_r"], dtype="Float64"),
                    "mean_b": pd.array(cols["mean_b"], dtype="Float64"),
                }
            )

    return decode


@register(
    "multimodal_codec_gif",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         {_CORRUPT}  AS corrupt,
         {_WIDTH}    AS width,
         {_HEIGHT}   AS height,
         {_R_BYTE}   AS r_byte
  FROM documents
),
-- index(y, x) = (r_byte + x + y) % 256; max value r_byte + w-1 + h-1
-- <= 255 + 31 + 6 < 512 wraps AT MOST once, so the index sum is
--   w*h*r_byte + h*TRI(w) + w*TRI(h) - 256 * n_wrap,
-- n_wrap = #{{(x, y): r_byte + x + y >= 256}} summed per scanline.
wraps AS (
  SELECT p.doc_id,
         CAST(sum(greatest(0, p.width - greatest(0, 256 - p.r_byte - y.y)))
              AS BIGINT) AS n_wrap
  FROM p, LATERAL unnest(generate_series(0, 6)) AS y(y)
  WHERE NOT coalesce(corrupt, TRUE) AND y.y < p.height
  GROUP BY p.doc_id
)
SELECT p.doc_id,
       coalesce(NOT corrupt, FALSE)                                  AS valid,
       CAST(CASE WHEN NOT corrupt THEN width  END AS INTEGER)        AS width,
       CAST(CASE WHEN NOT corrupt THEN height END AS INTEGER)        AS height,
       CAST(CASE WHEN NOT corrupt THEN width * height END
            AS INTEGER)                                              AS n_pixels,
       CAST(CASE WHEN NOT corrupt THEN 256 END AS INTEGER)           AS palette_size,
       -- palette r = index, so mean_r is the mean index
       CAST(CASE WHEN NOT corrupt THEN
              (width * height * r_byte
               + height * (width * (width - 1)) // 2
               + width * (height * (height - 1)) // 2
               - 256 * w.n_wrap)
              / CAST(width * height AS DOUBLE) END
            AS DOUBLE)                                               AS mean_r,
       -- palette b = 255 - index: exact complement of the index sum
       CAST(CASE WHEN NOT corrupt THEN
              (CAST(255 AS BIGINT) * width * height
               - (width * height * r_byte
                  + height * (width * (width - 1)) // 2
                  + width * (height * (height - 1)) // 2
                  - 256 * w.n_wrap))
              / CAST(width * height AS DOUBLE) END
            AS DOUBLE)                                               AS mean_b
FROM p LEFT JOIN wraps w ON w.doc_id = p.doc_id
""",
    tags=("multimodal", "codec", "gif", "lzw", "mapInPandas", "north-star"),
    doc=(
        "REAL GIF87a codec, oracle-verified: rows synthesize actual GIFs "
        "— logical screen descriptor, 256-entry global color table "
        "(r=i, b=255-i), and genuinely LZW-compressed image data "
        "(variable code width, CLEAR/EOI, 255-byte sub-blocks) over a "
        "diagonal index ramp; the decoder walks the container, "
        "reassembles sub-blocks, runs full LZW (including the KwKwK "
        "case), applies the palette, and re-derives geometry and channel "
        "means, which the oracle states in closed form (the diagonal "
        "ramp wraps mod 256 at most once, so the per-scanline wrap count "
        "is a bounded series sum). Corrupt-signature rows decode to "
        "valid=false + NULL features — the shared codec error contract."
    ),
)
def multimodal_codec_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return synthesize_gif_payloads(docs).mapInPandas(
        make_gif_decoder(), schema=GIF_SCHEMA
    )
