"""Multimodal (image/audio/video) column plumbing.

Media travels as an opaque ``binary`` payload column plus a typed
metadata struct — the schema, partitioning and Arrow-batched UDF
plumbing are real and tested. PIXEL decode is REAL for the
uncompressed formats (24-bit BMP and binary PPM — ``decode_pixels``
as pure Spark byte expressions, ``decode_media`` per-payload in
Python, r8); only COMPRESSED-codec decode (JPEG/PNG/GIF, audio,
video) still raises ``NotImplementedError`` — those libraries are
not in this container — with a deterministic fake feature extractor
standing in so that pipeline shape is exercised end-to-end too.

Scale notes:
* Payloads stay on executors — nothing here collects binary to the
  driver. At 100 TB the payload column dominates scan size; metadata
  queries (`meta.*` filters, kind counts) prune it via parquet column
  pruning, so keep payload in its own column, never inside a struct
  with hot metadata.
* Feature extraction uses ``mapInPandas`` (Arrow batches) — the
  Python boundary is batch-at-a-time, not row-at-a-time, and output
  partitioning inherits the scan (no shuffle).
* Frame sampling is pure Spark (sequence + explode + binary
  substring): no UDF.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_TYPE = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_META_TYPE, False),
    ]
)

KINDS = ["image", "audio", "video"]


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from ``documents`` —
    payload = UTF-8 bytes of the text, kind/meta derived from the id.
    Exists so the binary-column pipeline runs against real testdata
    without shipping binaries."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col(id_col) % 24 + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fmt: str):
    """Pixel decode of a single payload, driver/UDF-side.

    REAL for the uncompressed formats: 24-bit BI_RGB BMP and binary
    PPM (P6) decode here in pure Python (and distributed, in pure
    Spark expressions, via ``decode_pixels`` below) — returns
    ``(width, height, pixels)`` with pixels the flattened top-down
    row-major RGB bytes. COMPRESSED formats (JPEG/PNG/GIF/audio/
    video) still raise: their codecs (PIL/libav/opencv) are not
    available in this container — swap in the real decoder in
    production. Header-level metadata for those is not stubbed — see
    ``with_image_header_meta``."""
    import struct

    f = (fmt or "").lower()
    if f in ("bmp", "bmp8") or payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        off, = struct.unpack_from("<I", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        comp, = struct.unpack_from("<I", payload, 30)
        if planes != 1 or bpp not in (8, 24) or comp != 0 or w <= 0 or h <= 0:
            raise ValueError(
                f"unsupported BMP variant (planes={planes} bpp={bpp} "
                f"compression={comp} w={w} h={h})"
            )
        px = []
        if bpp == 24:
            stride = (w * 3 + 3) & ~3
            for r in range(h):                      # output rows top-down
                base = off + (h - 1 - r) * stride   # source rows bottom-up
                for p in range(w):
                    b, g, rr = payload[base + 3 * p: base + 3 * p + 3]
                    px.extend((rr, g, b))           # BGR on disk → RGB out
        else:  # 8-bit paletted (r9): BGR0 palette after the info header
            # r10 (advice): the palette-at-54 read assumes a 40-byte
            # BITMAPINFOHEADER — a V4/V5 DIB puts the palette later
            # and would silently decode header bytes as colors
            hdr_size, = struct.unpack_from("<I", payload, 14)
            if hdr_size != 40:
                raise ValueError(
                    f"unsupported BMP DIB header size {hdr_size} for "
                    "8-bit palette decode (expected BITMAPINFOHEADER=40)"
                )
            nclr, = struct.unpack_from("<I", payload, 46)
            nclr = nclr or 256
            if off < 54 + 4 * nclr:
                raise ValueError("BMP palette overlaps pixel data")
            stride = (w + 3) & ~3
            for r in range(h):
                base = off + (h - 1 - r) * stride
                for p in range(w):
                    idx = payload[base + p]
                    if idx >= nclr:
                        raise ValueError(
                            f"palette index {idx} >= biClrUsed {nclr}"
                        )
                    e = 54 + 4 * idx
                    b, g, rr = payload[e: e + 3]
                    px.extend((rr, g, b))
        return w, h, px
    if f in ("ppm", "pgm") or payload[:3] in (b"P6\n", b"P5\n"):
        import re as _re

        m = _re.match(rb"^(P[56])\s(\d+)\s(\d+)\s255\s", payload)
        if not m:
            raise ValueError("unsupported PPM/PGM header")
        w, h = int(m.group(2)), int(m.group(3))
        off = m.end()
        if m.group(1) == b"P6":
            return w, h, list(payload[off: off + w * h * 3])
        # P5 grayscale (r9) expanded to R=G=B, matching decode_pixels
        return w, h, [
            v for g in payload[off: off + w * h] for v in (g, g, g)
        ]
    raise NotImplementedError(
        f"media decode for format {fmt!r} requires codec libraries "
        "not present in this environment"
    )


_PNG_SIG = "89504E470D0A1A0A"  # \x89PNG\r\n\x1a\n


def _png_bpp(ctype):
    """Bytes per pixel for the supported 8-bit color types (r14 —
    the full non-palette matrix): 0 gray, 2 RGB, 4 gray+alpha,
    6 RGBA. Garbage-safe: anything else maps to 1 and the IHDR
    check nulls the row."""
    return (
        F.when(ctype == 2, F.lit(3))
        .when(ctype == 4, F.lit(2))
        .when(ctype == 6, F.lit(4))
        .otherwise(F.lit(1))
        .cast("bigint")
    )


def _sig(payload, pos: int, ascii_tag: str):
    """True iff the bytes at 1-based ``pos`` equal ``ascii_tag`` —
    compared as HEX, because ``decode(..., 'UTF-8')`` raises on the
    invalid byte sequences arbitrary binary payloads contain."""
    want = ascii_tag.encode("ascii").hex().upper()
    return F.hex(F.substring(payload, pos, len(ascii_tag))) == want


def _be32(payload, pos: int):
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary
    column — hex of the 4-byte slice parsed base-16. JVM-side string
    ops on 8 hex chars; no UDF. try_cast, not cast: garbage bytes can
    exceed int32 (e.g. reading a PNG width field out of a non-PNG
    payload), and codegen subexpression elimination may evaluate the
    reader EAGERLY, outside the ok-chain's short-circuit — under ANSI
    a plain cast would fail the whole task where the row should just
    null out (r12; same reasoning as zraw's try_element_at)."""
    return F.conv(
        F.hex(F.substring(payload, pos, 4)), 16, 10
    ).try_cast("int")


def _le16(payload, pos: int):
    """Little-endian uint16 at 1-based offset ``pos``: low byte +
    256·high byte."""
    b = lambda p: F.conv(F.hex(F.substring(payload, p, 1)), 16, 10).cast("int")  # noqa: E731
    return b(pos) + b(pos + 1) * F.lit(256)


def _u8(payload, pos):
    """uint8 at 1-based offset ``pos`` (int or Column)."""
    return F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("int")


def _be16(payload, pos):
    """Big-endian uint16 at 1-based offset ``pos`` (int or Column)."""
    return F.conv(F.hex(F.substring(payload, pos, 2)), 16, 10).cast("int")


#: JPEG start-of-frame marker codes (dimensions live in the SOF
#: segment) — every SOFn except the non-frame C4 (DHT), C8 (JPG
#: extension), CC (DAC).
_JPEG_SOF_MARKERS = (
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
)


def _jpeg_dims(p, max_segments: int = 12):
    """(width, height) of a JPEG payload as ONE expression — a bounded
    segment walk compiled to an ``aggregate`` fold, still no UDF:

    JPEG puts its dimensions in the SOF segment at a VARIABLE offset
    (after APPn/EXIF/quant tables...), so unlike PNG/GIF there is no
    fixed-position read. Each fold step looks at the current segment
    (0xFF marker + BE16 length), either captures the SOF dims
    (height @ +5, width @ +7), skips ``2 + len`` bytes, or poisons the
    offset on malformed input; once dims are set (or the offset is
    poisoned) remaining steps pass the state through. ``max_segments``
    bounds work and expression size — real headers reach SOF within a
    handful of segments (APPn + DQT + …); deeper ones return nulls
    rather than scanning unboundedly.
    """
    init = F.struct(
        F.lit(3).alias("o"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
    )

    def step(acc, _):
        o = acc["o"]
        active = acc["w"].isNull() & (o >= 3) & ((o + 3) <= F.length(p))
        m0 = _u8(p, o)
        m1 = _u8(p, o + 1)
        seg = _be16(p, o + 2)
        ok = (m0 == 255) & (seg >= 2)
        is_sof = m1.isin(*[F.lit(x) for x in _JPEG_SOF_MARKERS])
        readable = (o + 8) <= F.length(p)
        new_w = F.when(is_sof & ok & readable, _be16(p, o + 7))
        new_h = F.when(is_sof & ok & readable, _be16(p, o + 5))
        new_o = F.when(~ok | is_sof, F.lit(-1)).otherwise(o + 2 + seg)
        return F.when(
            active,
            F.struct(new_o.alias("o"), new_w.alias("w"), new_h.alias("h")),
        ).otherwise(acc)

    final = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_segments)), init, step
    )
    return final["w"], final["h"]


def with_image_header_meta(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL (non-stubbed) header-level image metadata decode, as pure
    Spark byte expressions — no codec library, no UDF, JVM-side and
    codegen'd:

    * PNG: 8-byte signature, then the IHDR chunk at a FIXED offset —
      width/height are big-endian uint32s at bytes 17-20 / 21-24.
    * GIF (87a/89a): 6-byte signature; logical-screen width/height
      are little-endian uint16s at bytes 7-8 / 9-10.
    * JPEG (r6): FFD8 signature, then a bounded segment walk to the
      SOF marker compiled to one ``aggregate`` fold (``_jpeg_dims``) —
      variable-offset parsing, still pure expressions.

    Appends (img_format, img_width, img_height); unrecognized or
    truncated payloads get nulls.
    """
    p = F.col(payload_col)
    is_png = (
        (F.length(p) >= 24)
        & (F.hex(F.substring(p, 1, 8)) == _PNG_SIG)
        # first chunk must actually BE the IHDR we read the fixed
        # offsets from — a valid signature with a nonstandard first
        # chunk would otherwise decode garbage dimensions
        & _sig(p, 13, "IHDR")
    )
    # signature checks compare HEX bytes, never decode(): Spark 4's
    # ANSI decode RAISES on invalid UTF-8, and arbitrary binary
    # payloads (any real JPEG) are not valid UTF-8
    is_gif = (F.length(p) >= 10) & (
        _sig(p, 1, "GIF87a") | _sig(p, 1, "GIF89a")
    )
    is_jpeg = (F.length(p) >= 4) & (F.hex(F.substring(p, 1, 2)) == "FFD8")
    jw, jh = _jpeg_dims(p)
    fmt = F.when(is_png, "png").when(is_gif, "gif").when(is_jpeg, "jpeg")
    width = (
        F.when(is_png, _be32(p, 17))
        .when(is_gif, _le16(p, 7))
        .when(is_jpeg, jw)
    )
    height = (
        F.when(is_png, _be32(p, 21))
        .when(is_gif, _le16(p, 9))
        .when(is_jpeg, jh)
    )
    return media.select(
        "*",
        fmt.alias("img_format"),
        width.alias("img_width"),
        height.alias("img_height"),
    )


def _le32(payload, pos: int):
    """Little-endian uint32 at 1-based offset ``pos``."""
    return (
        _le16(payload, pos) + _le16(payload, pos + 2) * F.lit(65536)
    ).cast("bigint")


def with_audio_header_meta(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL header-level audio metadata decode for canonical WAV
    (RIFF) files, pure byte expressions: 'RIFF'+'WAVE' signature with
    the fmt chunk in the canonical position (bytes 13-16 = 'fmt ') —
    channels (LE16 @23), sample rate (LE32 @25), bits per sample
    (LE16 @35). Non-canonical chunk orders (rare) and compressed
    codecs parse as nulls — variable-offset chunk walking stays with
    the pixel/PCM decode stub. Appends (audio_format, sample_rate_hz,
    n_channels, bits_per_sample)."""
    p = F.col(payload_col)
    is_wav = (
        (F.length(p) >= 36)
        & _sig(p, 1, "RIFF")
        & _sig(p, 9, "WAVE")
        & _sig(p, 13, "fmt ")
    )
    rate = _le32(p, 25)
    # the LE32 field can hold up to 2^32-1; casting that to int is a
    # non-ANSI wrap to a NEGATIVE rate. Anything past int range is a
    # corrupt header, not a sample rate — null it instead.
    sane_rate = F.when(rate <= F.lit(2147483647), rate.cast("int"))
    return media.select(
        "*",
        F.when(is_wav, "wav").alias("audio_format"),
        F.when(is_wav, sane_rate).alias("sample_rate_hz"),
        F.when(is_wav, _le16(p, 23)).alias("n_channels"),
        F.when(is_wav, _le16(p, 35)).alias("bits_per_sample"),
    )


N_MEDIA_FEATURES = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The feature math is a deterministic byte-histogram-moment fake
    (stands in for the stubbed decoder, see `decode_media`), but the
    execution path — ``mapInPandas``, Arrow transfer, per-batch
    vectorized numpy, schema contract — is exactly the production
    shape. One narrow stage, no shuffle."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                if len(arr) == 0:
                    arr = np.zeros(1)
                # deterministic "embedding": per-bucket byte-value
                # means — replace with decode_media + model in prod.
                # Means stay UNrounded: byte values are integers, so
                # sum/len is bit-exact and cross-engine reproducible;
                # consumers round at the edge (Python round() is
                # half-even, which diverges from SQL half-away ties).
                buckets = np.array_split(arr, n_features)
                out_feats.append(
                    [float(b.mean()) if len(b) else 0.0 for b in buckets]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": out_feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling for video rows — pure Spark, no UDF:
    ``sequence`` over frame indices, ``explode``, binary ``substring``
    slices a per-frame payload window. Returns
    (media_id, frame_idx, frame_payload)."""
    video = media.where(F.col("kind") == "video")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    ).alias("frame_idx")
    return video.select("media_id", idx, "payload").select(
        "media_id",
        "frame_idx",
        F.substring(
            F.col("payload"), F.col("frame_idx") * frame_bytes + 1, frame_bytes
        ).alias("frame_payload"),
    )


# ---------------------------------------------------------------------------
# REAL pixel decode: uncompressed formats (BMP 24-bit, binary PPM P6).
# The codec-library stub above (`decode_media` for JPEG/PNG/...) is an
# environment limitation; these two formats need no codec — the same
# pure-Spark byte toolkit that parses JPEG SOF headers decodes their
# pixels exactly, JVM-side, no UDF. Formats per the published specs
# (Windows BITMAPINFOHEADER; netpbm P6).
# ---------------------------------------------------------------------------


def pixel_value(media_id, k):
    """The deterministic synthetic pixel formula shared by the
    encoders, the DuckDB oracle and the tests: byte k (flattened
    TOP-DOWN row-major RGB) of media ``media_id`` is
    ``(media_id·7 + k·13) mod 256``. The oracle recomputes pixels
    from this closed form, so a Spark encode→binary→decode round trip
    only matches if BOTH sides honor the real file layout (BMP's
    bottom-up rows, BGR order and 4-byte stride padding undone
    correctly)."""
    return F.pmod(media_id * 7 + k * 13, F.lit(256)).cast("int")


def _byte_hex(v):
    """Two-hex-char rendering of the low byte of ``v``."""
    return F.lpad(F.hex(F.pmod(v.cast("bigint"), F.lit(256))), 2, "0")


def _le_hex(v, nbytes: int):
    """Hex string of ``v`` as a little-endian ``nbytes`` integer."""
    if not isinstance(v, Column):
        v = F.lit(v)
    v = v.cast("bigint")
    return F.concat(*[_byte_hex(F.shiftright(v, 8 * i)) for i in range(nbytes)])


def _bmp_stride(w):
    """Bytes per BMP pixel row: 3·w padded up to a 4-byte multiple."""
    raw = w * 3
    return raw + F.pmod(F.lit(4) - F.pmod(raw, F.lit(4)), F.lit(4))


def encode_bmp(media_id, w, h) -> Column:
    """A spec-compliant 24-bit uncompressed BMP (54-byte
    BITMAPFILEHEADER+BITMAPINFOHEADER, bottom-up rows, BGR byte
    order, 4-byte row stride) whose logical top-down RGB pixels are
    ``pixel_value(media_id, k)`` — built entirely as one hex-string
    projection + ``unhex``. Columns ``w``/``h`` must be ≥ 1."""
    stride = _bmp_stride(w)
    img_size = stride * h
    header = F.concat(
        F.lit("424D"),                    # 'BM'
        _le_hex(img_size + 54, 4),        # file size
        F.lit("00000000"),                # reserved
        _le_hex(54, 4),                   # pixel data offset
        _le_hex(40, 4),                   # BITMAPINFOHEADER size
        _le_hex(w, 4),
        _le_hex(h, 4),                    # positive: bottom-up
        _le_hex(1, 2),                    # planes
        _le_hex(24, 2),                   # bits per pixel
        _le_hex(0, 4),                    # BI_RGB (no compression)
        _le_hex(img_size, 4),
        _le_hex(2835, 4),                 # 72 dpi in px/metre
        _le_hex(2835, 4),
        _le_hex(0, 4),
        _le_hex(0, 4),
    )

    def data_byte(i):
        # i = 0-based offset in the pixel data: bottom-up source row
        # r_b, byte j within the padded row; padding bytes are 0,
        # pixel bytes map back to the top-down RGB index k
        r_b = F.floor(i / stride).cast("bigint")
        j = F.pmod(i, stride)
        px = F.floor(j / F.lit(3)).cast("bigint")
        c = F.pmod(j, F.lit(3))          # 0=B, 1=G, 2=R on disk
        k = (h - 1 - r_b) * w * 3 + px * 3 + (F.lit(2) - c)
        return F.when(j >= w * 3, F.lit("00")).otherwise(
            _byte_hex(pixel_value(media_id, k))
        )

    data = F.array_join(
        F.transform(F.sequence(F.lit(0), img_size - 1), data_byte), ""
    )
    return F.unhex(F.concat(header, data))


def encode_ppm(media_id, w, h) -> Column:
    """A binary netpbm P6 payload (``P6\\n<w> <h>\\n255\\n`` + raw
    top-down RGB bytes) with ``pixel_value`` pixels."""
    header = F.encode(
        F.concat(
            F.lit("P6\n"),
            w.cast("string"),
            F.lit(" "),
            h.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    data = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), w * h * 3 - 1),
                lambda k: _byte_hex(pixel_value(media_id, k)),
            ),
            "",
        )
    )
    return F.concat(header, data)


def _palette_channel(idx, c):
    """RGB channel ``c`` (0=R, 1=G, 2=B) of palette entry ``idx`` —
    the deterministic synthetic palette shared by ``encode_bmp8``,
    the decode oracle and the tests: R=(i·5+11)%256, G=(i·3+7)%256,
    B=(i·9+3)%256."""
    r = F.pmod(idx * 5 + 11, F.lit(256))
    g = F.pmod(idx * 3 + 7, F.lit(256))
    b = F.pmod(idx * 9 + 3, F.lit(256))
    return F.when(c == 0, r).when(c == 1, g).otherwise(b)


def _bmp8_stride(w):
    """Bytes per 8-bit BMP pixel row: w padded up to a 4-byte
    multiple."""
    return w + F.pmod(F.lit(4) - F.pmod(w, F.lit(4)), F.lit(4))


def encode_bmp8(media_id, w, h) -> Column:
    """A spec-compliant 8-bit PALETTED uncompressed BMP (r9): 54-byte
    headers + a full 256-entry BGR0 palette (``_palette_channel``) +
    bottom-up index rows at 4-byte stride. The index of top-down
    pixel q is ``pixel_value(media_id, q)``, so the decoded RGB bytes
    have a closed form the oracle recomputes."""
    stride = _bmp8_stride(w)
    img_size = stride * h
    header = F.concat(
        F.lit("424D"),
        _le_hex(img_size + 54 + 1024, 4),  # file size
        F.lit("00000000"),
        _le_hex(54 + 1024, 4),            # pixel data offset
        _le_hex(40, 4),
        _le_hex(w, 4),
        _le_hex(h, 4),                    # positive: bottom-up
        _le_hex(1, 2),
        _le_hex(8, 2),                    # bits per pixel
        _le_hex(0, 4),                    # BI_RGB
        _le_hex(img_size, 4),
        _le_hex(2835, 4),
        _le_hex(2835, 4),
        _le_hex(256, 4),                  # biClrUsed
        _le_hex(0, 4),
    )
    # palette: 256 entries of B, G, R, 0 — a media-independent literal
    palette = F.lit(
        "".join(
            f"{(i * 9 + 3) % 256:02X}{(i * 3 + 7) % 256:02X}"
            f"{(i * 5 + 11) % 256:02X}00"
            for i in range(256)
        )
    )

    def data_byte(i):
        r_b = F.floor(i / stride).cast("bigint")
        px = F.pmod(i, stride)
        q = (h - 1 - r_b) * w + px       # top-down pixel index
        return F.when(px >= w, F.lit("00")).otherwise(
            _byte_hex(pixel_value(media_id, q))
        )

    data = F.array_join(
        F.transform(F.sequence(F.lit(0), img_size - 1), data_byte), ""
    )
    return F.unhex(F.concat(header, palette, data))


def encode_pgm(media_id, w, h) -> Column:
    """A binary netpbm P5 payload (``P5\\n<w> <h>\\n255\\n`` + raw
    top-down grayscale bytes): gray of pixel q is
    ``pixel_value(media_id, q)``."""
    header = F.encode(
        F.concat(
            F.lit("P5\n"),
            w.cast("string"),
            F.lit(" "),
            h.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    data = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), w * h - 1),
                lambda q: _byte_hex(pixel_value(media_id, q)),
            ),
            "",
        )
    )
    return F.concat(header, data)


def _png_raw_byte_fn(media_id, wb, bpp, filtered: bool, value_fn=None):
    """Byte j (1-based) of a synthetic PNG's decompressed scanline
    stream, shared by the stored / fixed-Huffman / dynamic-Huffman
    encoders. Unfiltered (default): filter byte 0, data byte =
    ``pixel_value``. ``filtered`` (r14): scanline r carries filter
    type ``(r + media_id) mod 5`` and the data bytes are the
    closed-form FILTERED values ``(recon - pred) mod 256`` — the
    reconstructed image stays ``pixel_value``, so the decode-side
    oracle is unchanged while the payload exercises all five RFC
    2083 filters."""
    pv = value_fn or pixel_value

    def raw_byte(j):
        r = F.floor((j - 1) / (wb * bpp + 1)).cast("bigint")
        pos = F.pmod(j - 1, wb * bpp + 1)
        if not filtered:
            return F.when(pos == 0, F.lit(0)).otherwise(
                pv(media_id, r * wb * bpp + pos - 1)
            )
        ft = F.pmod(r + media_id, F.lit(5))
        x = pos - 1                      # 0-based offset in the line
        i = r * wb * bpp + x             # 0-based recon index
        a = F.when(
            x >= bpp, pv(media_id, i - bpp)
        ).otherwise(F.lit(0)).cast("bigint")
        b = F.when(
            r > 0, pv(media_id, i - wb * bpp)
        ).otherwise(F.lit(0)).cast("bigint")
        c = F.when(
            (r > 0) & (x >= bpp),
            pv(media_id, i - wb * bpp - bpp),
        ).otherwise(F.lit(0)).cast("bigint")

        def filt(av):
            def filt_b(bv):
                def filt_c(cv):
                    pa = F.abs(bv - cv)
                    pb = F.abs(av - cv)
                    pc = F.abs(av + bv - 2 * cv)
                    paeth = (
                        F.when((pa <= pb) & (pa <= pc), av)
                        .when(pb <= pc, bv)
                        .otherwise(cv)
                    )
                    pred = (
                        F.when(ft == 0, F.lit(0).cast("bigint"))
                        .when(ft == 1, av)
                        .when(ft == 2, bv)
                        .when(ft == 3, F.floor((av + bv) / 2))
                        .otherwise(paeth)
                    )
                    return F.pmod(
                        pv(media_id, i) - pred, F.lit(256)
                    ).cast("int")

                return _let(c, filt_c)

            return _let(b, filt_b)

        return F.when(pos == 0, ft.cast("int")).otherwise(_let(a, filt))

    return raw_byte


def _png_index_value(media_id, q):
    """Index byte of pixel ``q`` in the synthetic PALETTED (color
    type 3) fixtures: ``q mod 256`` — with the 256-entry palette of
    ``_png_plte_hex`` this makes the decoded RGB byte k equal
    ``pixel_value(media_id, k)`` exactly (39*(q mod 256) == 39*q
    mod 256), so the paletted rows share the one closed-form oracle
    while the palette indirection must round-trip correctly for the
    hash to match."""
    return F.pmod(q, F.lit(256)).cast("int")


def _png_value16_fn(media_id):
    """Byte source for 16-BIT fixture scanlines: recon byte i is the
    MSB ``pixel_value(media_id, i//2)`` on even offsets (big-endian
    sample order — what the decoder outputs) and the independent LSB
    formula ``(media_id*3 + (i//2)*5) mod 256`` on odd ones. The
    LSBs never reach the flat-RGB output but DO ride the filters and
    the Adler-32, so the decode still integrity-checks them."""

    def v(mid, i):
        s = F.floor(i / 2).cast("bigint")
        return (
            F.when(F.pmod(i, F.lit(2)) == 0, pixel_value(mid, s))
            .otherwise(
                F.pmod(mid * 3 + s * 5, F.lit(256)).cast("int")
            )
        )

    return v


def _png_plte_hex(media_id):
    """Hex of the synthetic 256-entry PLTE chunk (r14 paletted
    fixtures): palette byte t (entry ``t//3`` channel ``t%3``) is
    ``pixel_value(media_id, t)``; see ``_png_index_value`` for why
    this choice keeps the decode oracle the shared closed form. 768
    data bytes + real CRC-32; the chunk data hex is bound once
    through ``_let`` (it feeds both the payload and the CRC)."""
    td = F.concat(
        F.lit("504C5445"),  # 'PLTE'
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(767)),
                lambda t: _byte_hex(pixel_value(media_id, t)),
            ),
            "",
        ),
    )
    return _let(
        td,
        lambda tdv: F.concat(
            F.lit("00000300"),  # length 768
            tdv,
            _be_hex(F.crc32(F.unhex(tdv)), 4),
        ),
    )


def encode_png(
    media_id,
    w,
    h,
    rgb: bool = False,
    filtered: bool = False,
    color_type: int = None,
    depth16: bool = False,
) -> Column:
    """A spec-compliant grayscale 8-bit PNG (r11) whose top-down gray
    pixel q is ``pixel_value(media_id, q)`` — REAL PNG, not just the
    IHDR stub: signature, IHDR (bit depth 8, color type 0), one IDAT
    whose zlib stream uses a STORED (BTYPE=00, uncompressed) deflate
    block — the one deflate mode that needs no Huffman machinery, so
    both the encode and the decode stay pure byte expressions — and
    IEND. Every chunk carries its true CRC-32 (Spark's builtin
    ``F.crc32`` over the type+data slice) and the zlib stream carries
    its true Adler-32, computed in closed form from prefix sums
    (``b = n + (n+1)·S1 − Σ j·d_j  (mod 65521)``), so a real PNG
    reader accepts the file byte-for-byte. Scanlines use filter 0
    (None). Raw stream must fit one stored block (≤ 65535 bytes).

    ``rgb=True`` (r13): color type 2, stride 3w+1; flat RGB byte k of
    the image is ``pixel_value(media_id, k)`` — one closed form over
    3wh bytes, channel-varying by construction.

    ``filtered=True`` (r14): scanline r uses filter type
    ``(r + media_id) mod 5`` — every image of h >= 5 exercises all
    five RFC 2083 filters (None / Sub / Up / Average / Paeth) — and
    the data bytes carry FILTERED values computed in closed form
    (``filt = recon - pred mod 256`` with the reconstructed
    neighbors straight from ``pixel_value``), so the decoded pixels
    are the SAME closed form as the unfiltered file: the oracle is
    unchanged and a filter-reconstruction mistake on either side
    mismatches the hash."""
    wb = w.cast("bigint")
    hb = h.cast("bigint")
    ct = color_type if color_type is not None else (2 if rgb else 0)
    if ct not in (0, 2, 3, 4, 6):
        raise ValueError(f"encode_png: unsupported color type {ct}")
    if depth16 and ct == 3:
        raise ValueError("encode_png: 16-bit palette is invalid")
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct] * (2 if depth16 else 1)
    # h scanlines of (filter byte + w*bpp data bytes)
    raw_n = hb * (wb * bpp + 1)
    if ct == 3:
        value_fn = _png_index_value
    elif depth16:
        value_fn = _png_value16_fn(media_id)
    else:
        value_fn = None
    raw_byte = _png_raw_byte_fn(
        media_id, wb, bpp, filtered, value_fn=value_fn
    )
    plte = _png_plte_hex(media_id) if ct == 3 else None

    ihdr_td = F.concat(
        F.lit("49484452"),  # 'IHDR'
        _be_hex(w, 4),
        _be_hex(h, 4),
        F.lit(
            (("10" if depth16 else "08") + "%02X" % ct)
            + "00" + "00" + "00"
        ),
    )
    ihdr = F.concat(
        F.lit("0000000D"),
        ihdr_td,
        _be_hex(F.crc32(F.unhex(ihdr_td)), 4),
    )

    def assemble(rb):
        # rb: byte j (1-based) of the decompressed scanline stream
        raw_hex = F.array_join(
            F.transform(
                F.sequence(F.lit(1), raw_n), lambda j: _byte_hex(rb(j))
            ),
            "",
        )
        s1 = F.aggregate(
            F.sequence(F.lit(1), raw_n),
            F.lit(0).cast("bigint"),
            lambda a, j: a + rb(j),
        )
        sw = F.aggregate(
            F.sequence(F.lit(1), raw_n),
            F.lit(0).cast("bigint"),
            lambda a, j: a + j.cast("bigint") * rb(j),
        )
        adler_a = F.pmod(F.lit(1) + s1, F.lit(65521))
        adler_b = F.pmod(raw_n + (raw_n + 1) * s1 - sw, F.lit(65521))
        zstream = F.concat(
            F.lit("7801"),          # CMF/FLG: deflate, (0x7801 % 31) == 0
            F.lit("01"),            # BFINAL=1, BTYPE=00 (stored)
            _le_hex(raw_n, 2),      # LEN
            _le_hex(F.lit(65535) - raw_n, 2),  # NLEN = ~LEN
            raw_hex,
            _be_hex(adler_b * 65536 + adler_a, 4),
        )
        idat_td = F.concat(F.lit("49444154"), zstream)  # 'IDAT' + data
        idat = F.concat(
            _be_hex(raw_n + 11, 4),  # zlib stream = 2 + 5 + raw + 4
            idat_td,
            _be_hex(F.crc32(F.unhex(idat_td)), 4),
        )
        iend = F.lit("00000000" + "49454E44" + "AE426082")
        if ct == 3:
            return F.concat(
                F.lit("89504E470D0A1A0A"), ihdr, plte, idat, iend
            )
        return F.concat(F.lit("89504E470D0A1A0A"), ihdr, idat, iend)

    if filtered:
        # the filtered raw-byte tree is an order of magnitude bigger
        # than the plain one, and assemble() references it three times
        # (hex render + both Adler prefix sums) — stage the stream as
        # one array bound through _let so the tree appears ONCE in
        # the plan (measured: the inlined form took the synthesis
        # select's ANALYSIS from ~3 s to ~25 s; see SCALING_r14.md §4)
        arr = F.transform(F.sequence(F.lit(1), raw_n), raw_byte)
        png_hex = _let(
            arr,
            lambda a: assemble(
                lambda j: F.try_element_at(a, j.cast("int"))
            ),
        )
    else:
        png_hex = assemble(raw_byte)
    # enforce the single-stored-block constraint the docstring states:
    # LEN/NLEN are 16-bit fields, so h·(w+1) > 65535 would silently
    # wrap into a corrupt file. raise_error fails the WHOLE JOB, not
    # just the row — intentional (r13): this is a fixture/synthesis
    # encoder, so oversize dims are a caller programming error, and
    # one corrupt payload hiding in a synthesis pass is worse than the
    # pass aborting (the decode side's null-out convention is for
    # UNTRUSTED inputs; encoder inputs are the caller's own literals).
    return F.when(
        raw_n <= F.lit(65535),
        F.unhex(png_hex),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("encode_png: raw scanline stream h*(w+1) = "),
                raw_n.cast("string"),
                F.lit(" bytes exceeds one stored deflate block (65535)"),
            )
        ).cast("binary")
    )


def sample_value(media_id, i):
    """The deterministic synthetic 8-bit PCM sample formula shared by
    the WAV encoder, the DuckDB oracle and the tests: sample i of
    media ``media_id`` is ``(media_id·11 + i·17) mod 256``."""
    return F.pmod(media_id * 11 + i * 17, F.lit(256)).cast("int")


def encode_wav(media_id, n_samples, sample_rate) -> Column:
    """A spec-compliant 8-bit mono PCM WAV (canonical 44-byte
    RIFF/WAVE header: 16-byte fmt chunk, audio format 1 = PCM, one
    channel, 8 bits/sample, byte rate = block align · rate) whose
    samples are ``sample_value(media_id, i)`` — one hex-string
    projection + ``unhex``, exactly like the image encoders. REAL
    audio: uncompressed PCM needs no codec library, so the decode
    round trip runs in pure Spark expressions (r10 — the 'audio' kind
    had only header metadata and fake features before this)."""
    n = n_samples if isinstance(n_samples, Column) else F.lit(n_samples)
    n = n.cast("bigint")
    header = F.concat(
        F.lit("52494646"),            # 'RIFF'
        _le_hex(n + 36, 4),           # riff chunk size
        F.lit("57415645"),            # 'WAVE'
        F.lit("666D7420"),            # 'fmt '
        _le_hex(16, 4),               # fmt chunk size
        _le_hex(1, 2),                # PCM
        _le_hex(1, 2),                # mono
        _le_hex(sample_rate, 4),
        _le_hex(sample_rate, 4),      # byte rate (8-bit mono)
        _le_hex(1, 2),                # block align
        _le_hex(8, 2),                # bits per sample
        F.lit("64617461"),            # 'data'
        _le_hex(n, 4),
    )
    data = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: _byte_hex(sample_value(media_id, i)),
        ),
        "",
    )
    return F.unhex(F.concat(header, data))


def synthesize_decodable_audio(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Tiny REAL WAV files derived from ``documents`` ids — the audio
    twin of ``synthesize_decodable_media``: n_samples ∈ 4..28, sample
    rate ∈ {8000, 12000, 16000, 20000} Hz, both closed forms of the
    id so the oracle recomputes them without touching binary."""
    mid = F.col(id_col)
    n = (mid % 25 + 4).cast("int")
    rate = (F.lit(8000) + (mid % 4) * 4000).cast("int")
    return docs.select(
        mid.alias("media_id"),
        F.lit("audio").alias("kind"),
        encode_wav(mid, n, rate).alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            rate.alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("wav").alias("format"),
        ).alias("meta"),
    )


def decode_samples(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode of canonical 8-bit mono PCM WAV, pure Spark:
    returns (media_id, audio_format, sample_rate, n_samples, samples)
    with ``samples`` the unsigned 8-bit PCM array. Every header field
    is read from the actual bytes (RIFF/WAVE magic, 16-byte fmt
    chunk, PCM=1, mono, block align 1, 8 bits, 'data' chunk with an
    in-bounds length) — anything else nulls out, including
    multi-channel, 16-bit, or extensible-fmt files whose layout this
    canonical-form parser does not cover. Compressed audio
    (MP3/AAC/...) still requires codec libraries, as documented on
    ``decode_media``."""
    p = F.col(payload_col)
    n = _le32(p, 41)
    ok = (
        (F.length(p) >= 45)
        & (F.hex(F.substring(p, 1, 4)) == "52494646")
        & (F.hex(F.substring(p, 9, 8)) == "57415645666D7420")
        & (_le32(p, 17) == 16)            # canonical fmt size
        & (_le16(p, 21) == 1)             # PCM
        & (_le16(p, 23) == 1)             # mono
        & (_le16(p, 33) == 1)             # block align
        & (_le16(p, 35) == 8)             # bits per sample
        & (F.hex(F.substring(p, 37, 4)) == "64617461")
        & (n > 0)
        & (n + 44 <= F.length(p))
    )
    samples = F.transform(
        F.sequence(F.lit(0), n - 1), lambda k: _u8(p, F.lit(45) + k)
    )
    return media.select(
        "media_id",
        F.when(ok, "wav").alias("audio_format"),
        F.when(ok, _le32(p, 25)).cast("int").alias("sample_rate"),
        F.when(ok, n).cast("int").alias("n_samples"),
        F.when(ok, samples).alias("samples"),
    )


def decode_audio(payload: bytes):
    """Python single-payload twin of ``decode_samples`` (driver/UDF
    side): returns ``(sample_rate, samples)`` for a canonical 8-bit
    mono PCM WAV, raises on anything else."""
    import struct

    if len(payload) < 45 or payload[:4] != b"RIFF" or payload[8:16] != b"WAVEfmt ":
        raise ValueError("not a canonical RIFF/WAVE payload")
    fmt_size, = struct.unpack_from("<I", payload, 16)
    audio_fmt, channels = struct.unpack_from("<HH", payload, 20)
    rate, = struct.unpack_from("<I", payload, 24)
    align, bits = struct.unpack_from("<HH", payload, 32)
    if (fmt_size, audio_fmt, channels, align, bits) != (16, 1, 1, 1, 8):
        raise ValueError(
            f"unsupported WAV variant (fmt_size={fmt_size} fmt={audio_fmt} "
            f"ch={channels} align={align} bits={bits})"
        )
    if payload[36:40] != b"data":
        raise ValueError("missing canonical data chunk")
    n, = struct.unpack_from("<I", payload, 40)
    if n == 0 or 44 + n > len(payload):
        raise ValueError("data chunk length out of bounds")
    return rate, list(payload[44:44 + n])


def luma_value(media_id, f, q):
    """The deterministic synthetic luma formula shared by the Y4M
    encoder, the DuckDB oracle and the tests: luma byte q of frame f
    of media ``media_id`` is ``(media_id·7 + f·31 + q·13) mod 256``."""
    return F.pmod(media_id * 7 + f * 31 + q * 13, F.lit(256)).cast("int")


_Y4M_FRAME_MAGIC = "4652414D450A"  # 'FRAME\n'
# Both Y4M decode paths (Spark + the Python twin) require the stream
# header to end within this many bytes; longer spec-valid headers are
# rejected IDENTICALLY on both paths (r10 advice: the caps must agree).
_Y4M_HEADER_CAP = 80


def encode_y4m(media_id, w, h, n_frames) -> Column:
    """A spec-compliant uncompressed YUV4MPEG2 stream (mono chroma —
    ``Cmono``, so each frame is exactly w·h luma bytes after its
    ``FRAME\\n`` marker) whose frame-f luma plane is
    ``luma_value(media_id, f, ·)``. REAL video: Y4M is the standard
    uncompressed interchange format (what ffmpeg pipes), and like
    BMP/PPM/WAV it needs no codec library, so the decode round trip
    runs in pure Spark expressions (r10 — the 'video' kind had only
    opaque-byte frame slicing before this)."""
    header = F.encode(
        F.concat(
            F.lit("YUV4MPEG2 W"),
            w.cast("string"),
            F.lit(" H"),
            h.cast("string"),
            F.lit(" F25:1 Ip A1:1 Cmono\n"),
        ),
        "UTF-8",
    )

    def frame_hex(f):
        return F.concat(
            F.lit(_Y4M_FRAME_MAGIC),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), w * h - 1),
                    lambda q: _byte_hex(luma_value(media_id, f, q)),
                ),
                "",
            ),
        )

    data = F.unhex(
        F.array_join(
            F.transform(F.sequence(F.lit(0), n_frames - 1), frame_hex), ""
        )
    )
    return F.concat(header, data)


def synthesize_decodable_video(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Tiny REAL Y4M streams derived from ``documents`` ids — the
    video twin of ``synthesize_decodable_media``: w ∈ 2..5, h ∈ 2..4,
    n_frames ∈ 1..5, all closed forms of the id."""
    mid = F.col(id_col)
    w = (mid % 4 + 2).cast("int")
    h = (mid % 3 + 2).cast("int")
    n = (mid % 5 + 1).cast("int")
    return docs.select(
        mid.alias("media_id"),
        F.lit("video").alias("kind"),
        encode_y4m(mid, w, h, n).alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            n.alias("n_frames"),
            F.lit("y4m").alias("format"),
        ).alias("meta"),
    )


def decode_y4m_frames(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL video decode of uncompressed YUV4MPEG2 (mono chroma),
    pure Spark: ONE ROW PER FRAME — (media_id, video_format, width,
    height, n_frames, frame_idx, luma) with ``luma`` the frame's
    top-down w·h luma plane. The variable-length ASCII stream header
    is parsed like PPM's (chars == bytes), the frame count is derived
    from the payload length, and EVERY frame's ``FRAME\\n`` marker is
    verified (``F.forall`` — a stream with one corrupt marker nulls
    out entirely rather than emitting garbage frames). Non-mono
    chroma (420/422/444 subsampled streams) is rejected: their frame
    size differs and this canonical-mono parser does not cover them.
    The header must end within ``_Y4M_HEADER_CAP`` (80) bytes — the
    Python twin ``decode_video`` enforces the SAME cap, so the two
    paths agree on long-parameter headers (r10 advice). Invalid
    payloads yield one row with null decode columns, so the operator
    is total over mixed media tables."""
    p = F.col(payload_col)
    hdr_len = F.least(F.length(p), F.lit(_Y4M_HEADER_CAP))
    hdr = F.array_join(
        F.transform(
            F.sequence(F.lit(1), hdr_len), lambda i: F.char(_u8(p, i))
        ),
        "",
    )
    m = F.regexp_extract(
        hdr, r"^(YUV4MPEG2 W\d+ H\d+ F\d+:\d+[^\n]*Cmono[^\n]*\n)", 1
    )
    # nullif: an unmatched header extracts '' and ANSI cast of ''
    # RAISES on Spark 4 — invalid payloads must null out, not error
    w = F.nullif(F.regexp_extract(m, r" W(\d+)", 1), F.lit("")).cast("int")
    h = F.nullif(F.regexp_extract(m, r" H(\d+)", 1), F.lit("")).cast("int")
    off = F.length(m)  # ASCII header: chars == bytes
    fsize = w * h + 6
    n = F.floor((F.length(p) - off) / fsize).cast("int")
    ok = (
        (F.length(m) > 0)
        & (w > 0)
        & (h > 0)
        & (n >= 1)
        & (F.pmod(F.length(p) - off, fsize) == 0)
        & F.forall(
            F.sequence(F.lit(0), n - 1),
            lambda f: F.hex(F.substring(p, off + f * fsize + 1, 6))
            == _Y4M_FRAME_MAGIC,
        )
    )
    base = media.select(
        "media_id",
        F.when(ok, "y4m").alias("video_format"),
        F.when(ok, w).alias("width"),
        F.when(ok, h).alias("height"),
        F.when(ok, n).alias("n_frames"),
        F.when(ok, off).alias("__off"),
        F.when(ok, fsize).alias("__fsize"),
        p.alias("__p"),
    )
    # outer explode keeps invalid payloads as one null-frame row
    frames = base.select(
        "media_id",
        "video_format",
        "width",
        "height",
        "n_frames",
        F.explode_outer(
            F.when(
                F.col("n_frames").isNotNull(),
                F.sequence(F.lit(0), F.col("n_frames") - 1),
            )
        ).alias("frame_idx"),
        "__p",
        "__off",
        "__fsize",
    )
    luma = F.transform(
        F.sequence(F.lit(0), F.col("width") * F.col("height") - 1),
        lambda q: _u8(
            F.col("__p"),
            F.col("__off")
            + F.col("frame_idx") * F.col("__fsize")
            + 6
            + q
            + 1,
        ),
    )
    return frames.select(
        "media_id",
        "video_format",
        "width",
        "height",
        "n_frames",
        "frame_idx",
        F.when(F.col("frame_idx").isNotNull(), luma).alias("luma"),
    )


def audio_features(decoded: DataFrame) -> DataFrame:
    """Classic per-clip audio features over REAL decoded PCM (r10):
    (media_id, n_samples, mean_level, rms, peak, zero_crossings) from
    ``decode_samples`` output — one shuffle-free projection per clip,
    the shape that holds when the clip table is 100 TB.

    * mean_level / rms: 6dp-rounded mean and root-mean-square of the
      unsigned samples (integer sums underneath, so both engines
      round the same doubles);
    * peak: max sample;
    * zero_crossings: sign changes of the DC-centered signal
      (8-bit PCM silence = 128) — the standard noisiness feature.
    Undecodable rows pass through with null features."""
    s = F.col("samples")
    n = F.size(s)
    total = F.aggregate(
        s, F.lit(0).cast("bigint"), lambda a, v: a + v.cast("bigint")
    )
    sumsq = F.aggregate(
        s,
        F.lit(0).cast("bigint"),
        lambda a, v: a + v.cast("bigint") * v.cast("bigint"),
    )
    # n == 1 guard (r10 advice): sequence(1, n-1) with n=1 yields the
    # DESCENDING [1, 0] and element_at(s, 0) raises — a single-sample
    # clip has zero crossings by definition, so gate the fold.
    zc = F.when(
        n >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: (F.element_at(s, i) - 128)
                * (F.element_at(s, i + 1) - 128)
                < 0,
            )
        ),
    ).otherwise(F.lit(0))
    return decoded.select(
        "media_id",
        "n_samples",
        F.when(
            s.isNotNull(),
            F.round(total / n.cast("double"), 6),
        ).alias("mean_level"),
        F.when(
            s.isNotNull(),
            F.round(F.sqrt(sumsq / n.cast("double")), 6),
        ).alias("rms"),
        F.when(s.isNotNull(), F.array_max(s)).alias("peak"),
        F.when(s.isNotNull(), zc).cast("int").alias("zero_crossings"),
    )


def resize_frames_nearest(
    frames: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor resize of decoded VIDEO frames (r11): the
    single-channel sibling of ``resize_nearest``, over
    ``decode_y4m_frames`` output — fixed-resolution frame
    preprocessing, one shuffle-free projection, exact integer index
    mapping, total over null rows. Returns (media_id, frame_idx,
    width, height, out_w, out_h, luma) with ``luma`` the resized
    top-down plane."""
    if out_w < 1 or out_h < 1:
        raise ValueError("out_w and out_h must be >= 1")
    w = F.col("width").cast("bigint")
    h = F.col("height").cast("bigint")

    def out_px(q):
        y = F.floor(q / out_w).cast("bigint")
        x = F.pmod(q, F.lit(out_w))
        src_x = F.floor((x * w) / F.lit(out_w)).cast("bigint")
        src_y = F.floor((y * h) / F.lit(out_h)).cast("bigint")
        return F.element_at(
            F.col("luma"), (src_y * w + src_x + 1).cast("int")
        )

    resized = F.transform(
        F.sequence(F.lit(0), F.lit(out_w * out_h - 1)), out_px
    )
    return frames.select(
        "media_id",
        "frame_idx",
        "width",
        "height",
        F.lit(out_w).alias("out_w"),
        F.lit(out_h).alias("out_h"),
        F.when(F.col("luma").isNotNull(), resized).alias("luma"),
    )


def audio_frames(
    decoded: DataFrame, frame_len: int = 8, hop: int = 4
) -> DataFrame:
    """Windowed audio framing over REAL decoded PCM (r11): the
    short-time analysis primitive under VAD / silence-trimming /
    feature pipelines — ``audio_features`` is one global summary per
    clip; this emits one row PER FRAME of ``frame_len`` samples at
    ``hop`` stride with the frame's energy stats:
    (media_id, frame_idx, frame_start, n_frame_samples, frame_rms,
    frame_peak). The last frame may be short (>= 1 sample — standard
    framing semantics); a clip shorter than one hop still yields its
    single short frame. One explode + per-frame slice folds, no
    shuffle — the per-clip work is O(n_samples · frame_len / hop) of
    codegen'd integer arithmetic. rms is the 6dp-rounded sqrt of an
    exact integer mean, so every value oracles. Undecodable rows pass
    through as one null-frame row."""
    if frame_len < 1 or hop < 1:
        raise ValueError("frame_len and hop must be >= 1")
    s = F.col("samples")
    n = F.size(s)
    # frames start at 0, hop, 2·hop, ... while start < n
    n_frames = F.when(n >= 1, F.floor((n - 1) / hop).cast("int") + 1)
    framed = decoded.select(
        "media_id",
        "n_samples",
        s.alias("__s"),
        F.explode_outer(
            F.when(
                n_frames.isNotNull(),
                F.sequence(F.lit(0), n_frames - 1),
            )
        ).alias("frame_idx"),
    )
    start = F.col("frame_idx").cast("bigint") * hop
    flen = F.least(
        F.lit(frame_len).cast("bigint"),
        F.size(F.col("__s")).cast("bigint") - start,
    )
    frame = F.slice(F.col("__s"), (start + 1).cast("int"), flen.cast("int"))
    sumsq = F.aggregate(
        frame,
        F.lit(0).cast("bigint"),
        lambda a, v: a + v.cast("bigint") * v.cast("bigint"),
    )
    return framed.select(
        "media_id",
        F.col("frame_idx"),
        F.when(F.col("frame_idx").isNotNull(), start).cast("int").alias(
            "frame_start"
        ),
        F.when(F.col("frame_idx").isNotNull(), flen).cast("int").alias(
            "n_frame_samples"
        ),
        F.when(
            F.col("frame_idx").isNotNull(),
            F.round(F.sqrt(sumsq / flen.cast("double")), 6),
        ).alias("frame_rms"),
        F.when(
            F.col("frame_idx").isNotNull(), F.array_max(frame)
        ).alias("frame_peak"),
    )


def frame_motion(frames: DataFrame) -> DataFrame:
    """Per-frame motion intensity over REAL decoded video (r10):
    (media_id, frame_idx, motion) where motion is the 6dp-rounded
    mean absolute luma difference against the PREVIOUS frame — the
    standard shot-boundary / activity signal. One window keyed by
    media (``lag`` of the luma plane, partition = clip — bounded rows
    per clip however large the table, the natural video shuffle key),
    then a shuffle-free zip_with fold. Frame 0 has no predecessor →
    null motion."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev = F.lag("luma").over(w)
    diff = F.aggregate(
        F.zip_with(
            F.col("luma"), prev, lambda a, b: F.abs(a.cast("bigint") - b)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return frames.select(
        "media_id",
        "frame_idx",
        F.when(
            prev.isNotNull() & F.col("luma").isNotNull(),
            F.round(diff / F.size("luma").cast("double"), 6),
        ).alias("motion"),
    )


def decode_video(payload: bytes):
    """Python single-payload twin of ``decode_y4m_frames``: returns
    ``(w, h, [frame0_luma, frame1_luma, ...])`` for a canonical mono
    Y4M stream, raises on anything else. Like the Spark path, the
    stream header must terminate within the first 80 bytes (r10
    advice: the Spark decoder scans only ``least(len, 80)`` header
    chars, so a spec-valid header with a long parameter tail nulls
    out there — this twin rejects it identically rather than
    silently diverging)."""
    import re as _re

    m = _re.match(rb"^YUV4MPEG2 W(\d+) H(\d+) F\d+:\d+[^\n]*Cmono[^\n]*\n", payload)
    if not m or m.end() > _Y4M_HEADER_CAP:
        raise ValueError(
            "not a canonical mono YUV4MPEG2 payload (header must end "
            f"within {_Y4M_HEADER_CAP} bytes)"
        )
    w, h = int(m.group(1)), int(m.group(2))
    off, fsize = m.end(), w * h + 6
    body = len(payload) - off
    if w <= 0 or h <= 0 or body <= 0 or body % fsize != 0:
        raise ValueError("Y4M frame data length mismatch")
    frames = []
    for f in range(body // fsize):
        s = off + f * fsize
        if payload[s:s + 6] != b"FRAME\n":
            raise ValueError(f"missing FRAME marker at frame {f}")
        frames.append(list(payload[s + 6:s + fsize]))
    return w, h, frames


def resize_nearest(
    decoded: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor resize over REAL decoded pixels (r11): the
    standard image-preprocessing step of a multimodal training
    pipeline (fixed input resolution), as ONE shuffle-free projection
    over ``decode_pixels`` output — output pixel (x, y) samples input
    pixel ``(floor(x·w/out_w), floor(y·h/out_h))`` per channel, the
    textbook integer mapping (exact BIGINT arithmetic, so the oracle
    recomputes every byte from the closed form). Non-decodable rows
    (null pixels) stay one null row, keeping the operator total.
    Returns (media_id, img_format, width, height, out_w, out_h,
    pixels) with ``pixels`` the resized top-down RGB array."""
    if out_w < 1 or out_h < 1:
        raise ValueError("out_w and out_h must be >= 1")
    w = F.col("width").cast("bigint")
    h = F.col("height").cast("bigint")

    def out_byte(k):
        q = F.floor(k / 3).cast("bigint")
        c = F.pmod(k, F.lit(3))
        y = F.floor(q / out_w).cast("bigint")
        x = F.pmod(q, F.lit(out_w))
        src_x = F.floor((x * w) / F.lit(out_w)).cast("bigint")
        src_y = F.floor((y * h) / F.lit(out_h)).cast("bigint")
        return F.element_at(
            F.col("pixels"),
            ((src_y * w + src_x) * 3 + c + 1).cast("int"),
        )

    resized = F.transform(
        F.sequence(F.lit(0), F.lit(out_w * out_h * 3 - 1)), out_byte
    )
    return decoded.select(
        "media_id",
        "img_format",
        "width",
        "height",
        F.lit(out_w).alias("out_w"),
        F.lit(out_h).alias("out_h"),
        F.when(F.col("pixels").isNotNull(), resized).alias("pixels"),
    )


def decode_png(
    payload: bytes,
    fixed_huffman: bool = False,
    dynamic_huffman: bool = False,
    filters: bool = False,
    palette: bool = False,
    depth16: bool = False,
):
    """Python single-payload twin of the Spark ``_png_gray_decode``
    branch: returns ``(w, h, rgb_pixels)`` (gray expanded to R=G=B,
    flattened top-down) for a grayscale-8 stored-deflate PNG, raises
    on anything else. stdlib only, and deliberately NOT
    ``zlib.decompress`` for the deflate payload: the stored blocks are
    parsed by hand under the SAME envelope the Spark path enforces
    (single IDAT, ``_PNG_MAX_CHUNKS`` / ``_PNG_MAX_BLOCKS`` caps,
    BTYPE=00 only) so the two paths accept and reject identically —
    a Huffman-compressed PNG that zlib could inflate raises here just
    like it nulls out in Spark (the r10 twin-parity rule).
    ``zlib.crc32`` / ``zlib.adler32`` verify the checksums.

    ``fixed_huffman`` (r12) mirrors the Spark opt-in: a single FINAL
    fixed-Huffman block (BTYPE=01, ``_inflate_fixed_py``) decodes.
    ``dynamic_huffman`` (r13) likewise: a single FINAL BTYPE=10 block
    (``_inflate_dyn_py``). Anything outside the enabled set — and
    multi/non-final compressed blocks — still raises, just as it
    nulls out in Spark.

    ``palette`` (r14) mirrors the Spark ``png_palette`` opt-in:
    color type 3 decodes — index bytes (one per pixel, filters
    apply to them) looked up in THE PLTE chunk that precedes the
    first IDAT (exactly one, length a multiple of 3 in [3, 768]);
    any index >= the entry count raises, as it nulls out in Spark.

    ``filters`` (r14) mirrors the Spark ``png_filters`` opt-in:
    scanline filters 1-4 (Sub/Up/Average/Paeth) are reconstructed;
    the flag also narrows the stored-envelope raw cap to
    ``_PNG_FH_MAX_RAW`` (the Spark shared-fold bound) so the two
    paths accept and reject identically in filtered mode too."""
    import struct as _struct
    import zlib as _zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    if _struct.unpack(">I", payload[8:12])[0] != 13 or payload[12:16] != b"IHDR":
        raise ValueError("first chunk is not a 13-byte IHDR")
    if _zlib.crc32(payload[12:29]) != _struct.unpack(">I", payload[29:33])[0]:
        raise ValueError("IHDR CRC mismatch")
    w, h = _struct.unpack(">II", payload[16:24])
    depth, ctype, comp, filt, interlace = payload[24:29]
    ctypes_ok = (0, 2, 3, 4, 6) if palette else (0, 2, 4, 6)
    depths_ok = (8, 16) if depth16 else (8,)
    if (
        depth not in depths_ok
        or ctype not in ctypes_ok
        or (depth == 16 and ctype == 3)  # invalid per spec
        or (comp, filt, interlace) != (0, 0, 0)
        or w <= 0
        or h <= 0
    ):
        raise ValueError(
            "unsupported IHDR (need 8-bit color type "
            + ("0/2/3/4/6" if palette else "0/2/4/6")
            + (" or 16-bit non-palette" if depth16 else "")
            + ", no interlace)"
        )
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype] * (
        2 if depth == 16 else 1
    )

    pos, idat, n_idat, done = 33, b"", 0, False
    plte_data, n_plte = None, 0
    for _ in range(_PNG_MAX_CHUNKS):
        if pos + 12 > len(payload):
            raise ValueError("truncated chunk header")
        clen = _struct.unpack(">I", payload[pos:pos + 4])[0]
        if pos + 12 + clen > len(payload):
            raise ValueError("truncated chunk body")
        ctag = payload[pos + 4:pos + 8]
        if _zlib.crc32(payload[pos + 4:pos + 8 + clen]) != _struct.unpack(
            ">I", payload[pos + 8 + clen:pos + 12 + clen]
        )[0]:
            raise ValueError(f"chunk {ctag!r} CRC mismatch")
        if ctag == b"IEND":
            done = True
            break
        if ctag == b"IDAT":
            idat, n_idat = payload[pos + 8:pos + 8 + clen], n_idat + 1
        # mirror _png_plte_walk: only PLTE chunks BEFORE the first
        # IDAT are considered (the walk stops at IDAT, per spec order)
        if ctag == b"PLTE" and n_idat == 0:
            if plte_data is None:
                plte_data = payload[pos + 8:pos + 8 + clen]
            n_plte += 1
        pos += 12 + clen
    if not done:
        raise ValueError(f"no IEND within {_PNG_MAX_CHUNKS} chunks")
    if n_idat != 1:
        raise ValueError(f"need exactly one IDAT, saw {n_idat}")
    if len(idat) < 11:
        raise ValueError("IDAT too short for a zlib stream")

    cmf, flg = idat[0], idat[1]
    if cmf % 16 != 8 or (cmf * 256 + flg) % 31 != 0 or flg & 0x20:
        raise ValueError("bad zlib header")
    if fixed_huffman and (idat[2] & 7) == 3:
        if h * (w * bpp + 1) > _PNG_FH_MAX_RAW:
            raise ValueError("fixed-Huffman raw size beyond bound")
        raw, endbit = _inflate_fixed_py(idat[2:-4])
        if (endbit + 7) // 8 > len(idat) - 6:
            raise ValueError("fixed-Huffman stream overruns data bytes")
    elif dynamic_huffman and (idat[2] & 7) == 5:
        if h * (w * bpp + 1) > _PNG_FH_MAX_RAW:
            raise ValueError("dynamic-Huffman raw size beyond bound")
        raw, endbit = _inflate_dyn_py(idat[2:-4])
        if (endbit + 7) // 8 > len(idat) - 6:
            raise ValueError("dynamic-Huffman stream overruns data bytes")
    else:
        raw, bpos, final = b"", 2, False
        for _ in range(_PNG_MAX_BLOCKS):
            hb = idat[bpos]
            if (hb >> 1) & 3 != 0:
                raise ValueError("non-stored deflate block (codec-bound)")
            blen, nlen = _struct.unpack("<HH", idat[bpos + 1:bpos + 5])
            if nlen != 65535 - blen or bpos + 5 + blen > len(idat) - 4:
                raise ValueError("stored block length mismatch")
            raw += idat[bpos + 5:bpos + 5 + blen]
            final = bool(hb & 1)
            bpos += 5 + blen
            if final:
                break
        if not final:
            raise ValueError(
                f"no final block within {_PNG_MAX_BLOCKS} blocks"
            )
        if bpos != len(idat) - 4:
            raise ValueError("trailing bytes between blocks and Adler-32")
    if _zlib.adler32(raw) != _struct.unpack(">I", idat[-4:])[0]:
        raise ValueError("Adler-32 mismatch")
    stride = w * bpp + 1
    if len(raw) != h * stride:
        raise ValueError("scanline stream length mismatch")
    if filters and len(raw) > _PNG_FH_MAX_RAW:
        raise ValueError("filtered-mode raw size beyond shared bound")
    dstride = w * bpp  # data bytes per line (filter byte stripped)
    recon = []
    for r in range(h):
        row = raw[r * stride:(r + 1) * stride]
        ft = row[0]
        if not filters:
            if ft != 0:
                raise ValueError(
                    f"scanline {r} uses filter {ft} (only 0)"
                )
            recon += list(row[1:])
            continue
        if ft > 4:
            raise ValueError(f"scanline {r} uses unknown filter {ft}")
        for x, fx in enumerate(row[1:]):
            a = recon[r * dstride + x - bpp] if x >= bpp else 0
            b = recon[(r - 1) * dstride + x] if r > 0 else 0
            c = (
                recon[(r - 1) * dstride + x - bpp]
                if (r > 0 and x >= bpp)
                else 0
            )
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            recon.append((fx + pred) % 256)
    if depth == 16:
        # big-endian samples: the MSB (even offsets) is the standard
        # 8-bit downsample; LSBs were integrity-checked by Adler-32
        recon = recon[0::2]
    pixels = []
    if ctype == 3:
        if n_plte != 1:
            raise ValueError(
                f"need exactly one PLTE before IDAT, saw {n_plte}"
            )
        if len(plte_data) % 3 != 0 or not 3 <= len(plte_data) <= 768:
            raise ValueError(f"bad PLTE length {len(plte_data)}")
        n_entries = len(plte_data) // 3
        for idx in recon:
            if idx >= n_entries:
                raise ValueError(
                    f"palette index {idx} >= {n_entries} entries"
                )
            pixels += list(plte_data[3 * idx:3 * idx + 3])
    elif ctype == 2:
        pixels = recon
    elif ctype == 6:          # RGBA: drop every 4th (alpha) byte
        pixels = [b for i, b in enumerate(recon) if i % 4 != 3]
    elif ctype == 4:          # gray+alpha: gray byte expands, alpha drops
        for i in range(0, len(recon), 2):
            g = recon[i]
            pixels += [g, g, g]
    else:
        for g in recon:
            pixels += [g, g, g]
    return w, h, pixels


def synthesize_decodable_media(
    docs: DataFrame, id_col: str = "doc_id", formats=("bmp", "ppm")
) -> DataFrame:
    """Tiny REAL image files derived from ``documents`` ids — the
    first format in ``formats`` for even ids, the second for odd — so
    the pixel-decode path runs against actual encoded binaries on
    real testdata. Dimensions are small (w ∈ 2..6, h ∈ 2..5) to keep
    the decoded pixel arrays oracle-comparable. Formats: 'bmp'
    (24-bit), 'ppm' (P6), 'bmp8' (8-bit paletted, r9), 'pgm' (P5,
    r9), 'png' (grayscale-8 stored-deflate, r11), 'pngf'
    (fixed-Huffman, r12), 'pngd' (dynamic-Huffman, r13), 'pngc' /
    'pngdc' (RGB color-type-2, stored / dynamic, r13), 'pngflt' /
    'pngfltc' / 'pngdflt' / 'pngdfltc' (scanline-FILTERED gray/RGB ×
    stored/dynamic, filters (r+id) mod 5, r14)."""
    even_fmt, odd_fmt = formats
    mid = F.col(id_col)
    w = (mid % 5 + 2).cast("int")
    h = (mid % 4 + 2).cast("int")
    payload = _decodable_payload_expr(id_col, (even_fmt, odd_fmt))
    return docs.select(
        mid.alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.when(mid % 2 == 0, even_fmt).otherwise(odd_fmt).alias(
                "format"
            ),
        ).alias("meta"),
    )


def _media_encoders():
    """Format-name → encoder-expression map for
    ``synthesize_decodable_media`` (hoisted out of the function body
    so the memoized payload builder below can reach it)."""
    return {
        "bmp": encode_bmp,
        "ppm": encode_ppm,
        "bmp8": encode_bmp8,
        "pgm": encode_pgm,
        "png": encode_png,
        "pngf": encode_png_fixed,  # r12: fixed-Huffman zlib stream
        "pngd": encode_png_dyn,    # r13: dynamic-Huffman zlib stream
        # r13: RGB (color type 2) variants — stored and dynamic
        "pngc": lambda m, w, h: encode_png(m, w, h, rgb=True),
        "pngdc": lambda m, w, h: encode_png_dyn(m, w, h, rgb=True),
        # r14: scanline-FILTERED variants (filters (r+id) mod 5 —
        # Sub/Up/Average/Paeth exercised) — stored gray / stored RGB /
        # dynamic gray / dynamic RGB
        "pngflt": lambda m, w, h: encode_png(m, w, h, filtered=True),
        "pngfltc": lambda m, w, h: encode_png(
            m, w, h, rgb=True, filtered=True
        ),
        "pngdflt": lambda m, w, h: encode_png_dyn(
            m, w, h, filtered=True
        ),
        "pngdfltc": lambda m, w, h: encode_png_dyn(
            m, w, h, rgb=True, filtered=True
        ),
        # r14: alpha-carrying color types — gray+alpha (4) stored,
        # RGBA (6) stored, and RGBA dynamic+filtered (the full
        # real-world libpng shape)
        "pngga": lambda m, w, h: encode_png(m, w, h, color_type=4),
        "pnga": lambda m, w, h: encode_png(m, w, h, color_type=6),
        "pngdflta": lambda m, w, h: encode_png_dyn(
            m, w, h, filtered=True, color_type=6
        ),
        # r14: PALETTED (color type 3) — stored, stored+filtered,
        # dynamic, and dynamic+filtered (indexed icons as libpng
        # emits them); indices filter through the 1-byte stride and
        # map through the real PLTE chunk on decode
        "pngp": lambda m, w, h: encode_png(m, w, h, color_type=3),
        "pngpflt": lambda m, w, h: encode_png(
            m, w, h, color_type=3, filtered=True
        ),
        "pngdp": lambda m, w, h: encode_png_dyn(m, w, h, color_type=3),
        "pngdfltp": lambda m, w, h: encode_png_dyn(
            m, w, h, color_type=3, filtered=True
        ),
        # r14: 16-BIT variants — stored gray16 and the fullest
        # composition (DH + filters + RGBA + 16-bit); MSBs carry the
        # closed form, LSBs ride the filters and the Adler-32
        "png16": lambda m, w, h: encode_png(m, w, h, depth16=True),
        "pngdflta16": lambda m, w, h: encode_png_dyn(
            m, w, h, color_type=6, filtered=True, depth16=True
        ),
        # r14: REAL GIFs — 'gif' the uncompressed-shape root-code
        # stream under a 256-entry table, 'gifz' a genuinely
        # dictionary-compressed LZW stream (4-color periodic indices)
        "gif": encode_gif,
        "gifz": encode_gif_lzw,
        # r14: 4-pass INTERLACED variants — pass-permuted streams the
        # decoder must re-order (both the root-code and the real-LZW
        # shapes)
        "gifi": lambda m, w, h: encode_gif(m, w, h, interlaced=True),
        # r14: LOCAL-color-table-only GIF (no global table)
        "gifl": lambda m, w, h: encode_gif(m, w, h, lct=True),
        "gifzi": lambda m, w, h: encode_gif_lzw(
            m, w, h, interlaced=True
        ),
    }


@lru_cache(maxsize=64)
def _decodable_payload_expr(id_col: str, formats: tuple) -> Column:
    """Memoized payload-expression program for
    ``synthesize_decodable_media`` (r14 optimization round, guide
    §1.2 step 2 — per-task/driver work after the plan shape is
    right): the encoder tree is a pure function of ``(id_col,
    formats)`` — no data, schema or session state enters
    construction — and the PNG/GIF encoder programs cost seconds of
    py4j round trips per build (SCALING_r14.md §4: ~4-11 s per
    decode row, roughly half of it on this encode side). Columns are
    immutable, unresolved expression handles, so the cached tree is
    reusable across any number of plans; analysis, codegen and
    execution are untouched and every invocation still computes from
    the parquet inputs."""
    encoders = _media_encoders()
    even_fmt, odd_fmt = formats
    mid = F.col(id_col)
    w = (mid % 5 + 2).cast("int")
    h = (mid % 4 + 2).cast("int")
    return F.when(mid % 2 == 0, encoders[even_fmt](mid, w, h)).otherwise(
        encoders[odd_fmt](mid, w, h)
    )


#: Bounded-walk limits shared by the Spark PNG decoder and its Python
#: twin ``decode_png`` (the r10 advice rule: caps must agree on both
#: paths, pinned by tests). Real single-image PNGs reach IEND within a
#: handful of chunks; the stored-deflate stream of a ≤64 KB-per-block
#: image fits a few blocks.
_PNG_MAX_CHUNKS = 8
_PNG_MAX_BLOCKS = 4


def _be32u(payload, pos):
    """Big-endian uint32 at 1-based offset ``pos`` as BIGINT — CRC-32
    and Adler-32 words exceed the signed-int range ``_be32`` uses."""
    return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast(
        "bigint"
    )


def _png_gray_decode(p, cw, bw, recon=None, plte=None, depth16=False):
    """(ok, w, h, pixels) for a grayscale-8 stored-deflate PNG — the
    pure-expression inverse of ``encode_png``, with REAL integrity
    verification: IHDR + IDAT CRC-32s (``F.crc32``), zlib header
    check, stored-block LEN/~LEN check, Adler-32 recomputed over the
    decompressed stream, and per-scanline filter-0 check. Chunk and
    stored-block walks are bounded ``aggregate`` folds
    (``_PNG_MAX_CHUNKS`` / ``_PNG_MAX_BLOCKS`` — same caps as the
    Python twin ``decode_png``), taken as STAGED COLUMNS ``cw`` /
    ``bw`` (``_png_chunk_walk`` / ``_png_block_walk`` aliased in
    upstream selects): the per-byte reader ``zraw`` references the
    block table once per decompressed byte, so inlining the walks
    would re-run them per byte (measured 43 s -> ~2 s at sf0.1 for
    the staging; CollapseProject keeps multiply-referenced non-cheap
    aliases staged). Supported envelope, all else nulls
    out: bit depth 8, color type 0 (grayscale), no interlace, ONE
    IDAT chunk, stored (BTYPE=00) deflate blocks only — Huffman-coded
    blocks are the genuinely codec-bound case ``decode_media``
    documents. Gray is expanded to R=G=B so ``pixels`` has the same
    shape as every other format."""
    w = _be32(p, 17)
    h = _be32(p, 21)
    # r13/r14: the full 8-bit non-palette color-type matrix — 0 gray
    # (expanded to R=G=B), 2 RGB (copied through), 4 gray+alpha,
    # 6 RGBA (alpha filtered-through but dropped from the flat-RGB
    # output); bpp is total and garbage-safe
    ctype = _u8(p, 26)
    # r14 depth16: bytes/pixel doubles at bit depth 16 (big-endian
    # samples; the reader takes each sample's FIRST byte = MSB, the
    # standard 8-bit downsample); spb None keeps the 8-bit plans
    # byte-identical when the flag is off
    if depth16:
        spb = (
            F.when(_u8(p, 25) == 16, F.lit(2))
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        bpp = _png_bpp(ctype) * spb
    else:
        spb = None
        bpp = _png_bpp(ctype)
    # clamp header-derived sizes BEFORE they feed any sequence/fold:
    # on a non-PNG or corrupt payload these fields are garbage, and
    # codegen subexpression elimination can evaluate the folds
    # EAGERLY (outside the ok-chain's short-circuit) — an unclamped
    # sequence(1, garbage) fails the task instead of nulling the row.
    # The clamp is semantics-preserving: a stored-deflate stream of
    # <= _PNG_MAX_BLOCKS blocks carries at most MAX_BLOCKS*65535 raw
    # bytes, so any raw_n beyond that could never verify anyway
    # (blocks_ok requires cum == raw_n).
    _cap = F.lit(_PNG_MAX_BLOCKS * 65535).cast("bigint")
    _raw0 = h.cast("bigint") * (w.cast("bigint") * bpp + 1)
    _sane = _raw0.isNotNull() & (_raw0 > 0) & (_raw0 <= _cap)
    # degenerate fallbacks: dims 1 (never 0 — pmod by 0 throws under
    # ANSI when hoisted), raw_n 0 (folds iterate nothing real)
    one = F.lit(1).cast("bigint")
    wb = F.when(_sane, w.cast("bigint")).otherwise(one)
    hb = F.when(_sane, h.cast("bigint")).otherwise(one)
    raw_n = F.when(_sane, _raw0).otherwise(F.lit(0).cast("bigint"))
    ihdr_ok = (
        _sane
        &
        (F.length(p) >= 46)  # sig 8 + IHDR 25 + shortest IDAT/IEND tail
        & (F.hex(F.substring(p, 1, 8)) == _PNG_SIG)
        & (_be32(p, 9) == 13)
        & _sig(p, 13, "IHDR")
        & (
            (_u8(p, 25) == 8)
            if not depth16
            else (
                _u8(p, 25).isin(8, 16)
                # palette + 16-bit is invalid per spec
                & ~((ctype == 3) & (_u8(p, 25) == 16))
            )
        )
        & (
            ctype.isin(0, 2, 4, 6)  # 8-bit non-palette matrix (r14)
            if plte is None
            # r14 opt-in png_palette: +3 (paletted); PLTE
            # validity/index bounds enforced by the reader
            else ctype.isin(0, 2, 3, 4, 6)
        )
        & (_u8(p, 27) == 0)   # compression: deflate
        & (_u8(p, 28) == 0)   # filter method 0
        & (_u8(p, 29) == 0)   # no interlace
        & (F.crc32(F.substring(p, 13, 17)) == _be32u(p, 30))
        & (w > 0)
        & (h > 0)
    )

    zs, zl = cw["zs"], cw["zl"]
    chunks_ok = (
        cw["done"] & cw["ok"] & (cw["n_idat"] == 1) & (zl >= 11)
    )

    # --- zlib envelope ----------------------------------------------
    cmf = _u8(p, zs)
    flg = _u8(p, zs + 1)
    zhdr_ok = (
        (F.pmod(cmf, F.lit(16)) == 8)                      # deflate
        & (F.pmod(cmf * 256 + flg, F.lit(31)) == 0)        # FCHECK
        & (F.pmod(F.floor(flg / 32).cast("int"), F.lit(2)) == 0)  # no FDICT
    )

    blocks = bw["blocks"]
    blocks_ok = (
        bw["final"]
        & bw["ok"]
        & (bw["cum"] == raw_n)
        & (bw["bpos"] == zs + zl - 4)  # stream consumed, Adler follows
    )

    def zraw(i):
        # byte i (1-based) of the decompressed stream, via its block.
        # try_element_at, not element_at: on an INVALID png the block
        # table can be empty while the folds below still run — codegen
        # subexpression elimination hoists the shared Adler fold out
        # of the ok-chain's short-circuit (r12, seen once the decode
        # moved to its own PNG-only plan), and ANSI element_at would
        # throw instead of letting the row null out.
        blk = F.try_element_at(
            F.filter(
                blocks,
                lambda b: (i > b["cum"]) & (i <= b["cum"] + b["len"]),
            ),
            F.lit(1),
        )
        return _u8(p, blk["start"] + (i - blk["cum"]) - 1)

    # --- Adler-32 over the decompressed stream -----------------------
    s1 = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + zraw(j),
    )
    sw = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + j.cast("bigint") * zraw(j),
    )
    adler_ok = (
        F.pmod(raw_n + (raw_n + 1) * s1 - sw, F.lit(65521)) * 65536
        + F.pmod(F.lit(1) + s1, F.lit(65521))
    ) == _be32u(p, zs + zl - 4)

    filters_ok, png_byte = _png_pixel_reader(
        zraw, recon, wb, hb, bpp, ctype, p=p, plte=plte, spb=spb
    )
    pixels = F.transform(F.sequence(F.lit(0), wb * hb * 3 - 1), png_byte)
    ok = (
        ihdr_ok & chunks_ok & zhdr_ok & blocks_ok & adler_ok & filters_ok
    )
    return ok, w, h, pixels


def _png_pixel_reader(
    oraw, recon, wb, hb, bpp, ctype, p=None, plte=None, spb=None
):
    """(filters_ok, png_byte) shared by the three deflate-envelope
    decoders. Default (``recon is None``, the pre-r14 plan shape):
    scanlines must use filter 0 and output byte k reads straight out
    of the decompressed stream ``oraw``. With the r14 staged
    reconstruction column ``recon`` (``_png_unfilter`` output):
    filter types 0-4 are accepted, the recon array must be complete
    (exact size, no null entries — a null marks an unknown filter
    type or a short stream), and pixels read from ``recon`` —
    cheaper than the stream reads (one try_element_at on a staged
    array vs the stored path's per-byte block-table probe).

    Channel mapping (r14: the full 8-bit non-palette color-type
    matrix 0/2/4/6): output byte k is pixel ``q = k//3`` channel
    ``c = k%3``; its SOURCE byte inside pixel q's ``bpp`` group is
    ``c`` for the color types (2/6) and 0 (the gray byte) for the
    gray types (0/4) — alpha bytes participate in stride and filter
    reconstruction but are dropped from the flat-RGB output
    contract.

    ``p``/``plte`` (r14, opt-in ``png_palette``): color type 3 —
    the decompressed stream carries one INDEX byte per pixel
    (bpp 1, filters apply to the index bytes) and output byte k is
    palette entry ``idx*3 + c`` read STRAIGHT OUT OF THE PAYLOAD's
    PLTE chunk data (``_png_plte_walk`` staged as ``plte``; the main
    chunk walk has already CRC-verified the chunk). The returned
    ``filters_ok`` additionally requires, for type-3 rows only: one
    PLTE before IDAT, length a multiple of 3 in [3, 768], and EVERY
    index < pl/3 — an out-of-range index must null the row, never
    silently read bytes beyond the palette. When ``plte`` is None
    the expressions are byte-identical to the pre-palette plans."""

    def src_off(k):
        # 0-based offset of output byte k's source in the recon
        # stream: q*bpp + channel*spb (spb = bytes/sample; the first
        # byte of a big-endian sample is its MSB)
        q = F.floor(k / 3).cast("bigint")
        c = F.pmod(k, F.lit(3))
        ch = c if spb is None else c * spb
        return q * bpp + F.when(
            (ctype == 2) | (ctype == 6), ch
        ).otherwise(F.lit(0))

    if recon is None:
        filters_ok = F.forall(
            F.sequence(F.lit(0), hb - 1),
            lambda r: oraw(r * (wb * bpp + 1) + 1) == 0,
        )

        def stream_at(i):
            # decompressed data byte at 0-based offset i, mapped
            # through the per-row filter bytes
            r = F.floor(i / (wb * bpp)).cast("bigint")
            m = F.pmod(i, wb * bpp)
            return oraw(r * (wb * bpp + 1) + 2 + m)

        def png_byte(k):
            return stream_at(src_off(k))

    else:
        filters_ok = (
            F.coalesce(
                F.forall(
                    F.sequence(F.lit(0), hb - 1),
                    lambda r: oraw(r * (wb * bpp + 1) + 1).between(0, 4),
                ),
                F.lit(False),
            )
            & (F.size(recon).cast("bigint") == hb * wb * bpp)
            & F.coalesce(
                F.forall(recon, lambda v: v.isNotNull()), F.lit(False)
            )
        )

        def stream_at(i):
            return F.try_element_at(recon, (i + 1).cast("int"))

        def png_byte(k):
            return stream_at(src_off(k))

    if plte is None:
        return filters_ok, png_byte

    # --- color type 3: palette indirection through the payload -----
    ps, pl = plte["ps"], plte["pl"]
    n_entries = F.floor(pl / 3).cast("bigint")
    plte_ok = F.coalesce(
        plte.isNotNull()
        & plte["ok"]
        & (plte["n_plte"] == 1)
        & (F.pmod(pl, F.lit(3)) == 0)
        & (pl >= 3)
        & (pl <= 768),
        F.lit(False),
    )

    def idx_at(q):
        # pixel q's index byte: source offset q*bpp with bpp == 1
        return stream_at(q)

    idx_ok = F.coalesce(
        F.forall(
            F.sequence(F.lit(0), wb * hb - 1),
            lambda q: F.coalesce(
                idx_at(q).cast("bigint") < n_entries, F.lit(False)
            ),
        ),
        F.lit(False),
    )
    pal_filters_ok = F.when(
        ctype == 3, filters_ok & plte_ok & idx_ok
    ).otherwise(filters_ok)

    base_byte = png_byte

    def pal_png_byte(k):
        q = F.floor(k / 3).cast("bigint")
        c = F.pmod(k, F.lit(3))
        return F.when(
            ctype == 3,
            _u8(p, ps + idx_at(q).cast("bigint") * 3 + c),
        ).otherwise(base_byte(k))

    return pal_filters_ok, pal_png_byte


def _png_chunk_walk(p):
    """Bounded CRC-checking chunk walk (stage 1 of the PNG decode —
    see ``_png_gray_decode``): one struct column
    (pos, zs, zl, n_idat, ok, done) locating THE IDAT chunk."""
    # --- chunk walk: find THE IDAT, CRC-checking every chunk --------
    cinit = F.struct(
        F.lit(34).cast("bigint").alias("pos"),
        F.lit(None).cast("bigint").alias("zs"),   # IDAT data start
        F.lit(None).cast("bigint").alias("zl"),   # IDAT data length
        F.lit(0).alias("n_idat"),
        F.lit(True).alias("ok"),
        F.lit(False).alias("done"),
    )

    def cstep(acc, _):
        pos = acc["pos"]
        clen = _be32(p, pos).cast("bigint")
        readable = (pos + 11 + clen) <= F.length(p)
        crc_ok = F.crc32(F.substring(p, pos + 4, clen + 4)) == _be32u(
            p, pos + 8 + clen
        )
        is_iend = _sig(p, pos + 4, "IEND")
        is_idat = _sig(p, pos + 4, "IDAT")
        bad = clen.isNull() | (clen < 0) | ~readable | ~crc_ok
        adv = pos + 12 + clen
        new = (
            F.when(
                bad,
                F.struct(
                    pos.alias("pos"),
                    acc["zs"].alias("zs"),
                    acc["zl"].alias("zl"),
                    acc["n_idat"].alias("n_idat"),
                    F.lit(False).alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(
                is_iend,
                F.struct(
                    pos.alias("pos"),
                    acc["zs"].alias("zs"),
                    acc["zl"].alias("zl"),
                    acc["n_idat"].alias("n_idat"),
                    acc["ok"].alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(
                is_idat,
                F.struct(
                    adv.alias("pos"),
                    F.coalesce(acc["zs"], pos + 8).alias("zs"),
                    F.coalesce(acc["zl"], clen).alias("zl"),
                    (acc["n_idat"] + 1).alias("n_idat"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                ),
            )
            .otherwise(
                F.struct(
                    adv.alias("pos"),
                    acc["zs"].alias("zs"),
                    acc["zl"].alias("zl"),
                    acc["n_idat"].alias("n_idat"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                )
            )
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_PNG_MAX_CHUNKS)), cinit, cstep
    )


def _png_plte_walk(p):
    """Bounded chunk walk locating THE PLTE chunk (r14, paletted
    color-type-3 support — RFC 2083 §4.1.2): one struct column
    (pos, ps, pl, n_plte, ok, done) where ``ps``/``pl`` are the
    1-based data start and byte length of the first PLTE chunk seen
    BEFORE the first IDAT — the spec orders PLTE strictly before
    IDAT, so the walk stops (done) at IDAT or IEND and a PLTE after
    IDAT is simply never recorded (n_plte stays 0 and the decoder
    nulls the row, matching the Python twin's raise). CRC integrity
    of every visited chunk is already enforced by the main
    ``_png_chunk_walk`` (staged alongside this one), so this walk
    only guards readability/advance; traversal order is identical."""
    pinit = F.struct(
        F.lit(34).cast("bigint").alias("pos"),
        F.lit(None).cast("bigint").alias("ps"),   # PLTE data start
        F.lit(None).cast("bigint").alias("pl"),   # PLTE data length
        F.lit(0).alias("n_plte"),
        F.lit(True).alias("ok"),
        F.lit(False).alias("done"),
    )

    def pstep(acc, _):
        pos = acc["pos"]
        clen = _be32(p, pos).cast("bigint")
        readable = (pos + 11 + clen) <= F.length(p)
        is_stop = _sig(p, pos + 4, "IEND") | _sig(p, pos + 4, "IDAT")
        is_plte = _sig(p, pos + 4, "PLTE")
        bad = clen.isNull() | (clen < 0) | ~readable
        adv = pos + 12 + clen
        new = (
            F.when(
                bad,
                F.struct(
                    pos.alias("pos"),
                    acc["ps"].alias("ps"),
                    acc["pl"].alias("pl"),
                    acc["n_plte"].alias("n_plte"),
                    F.lit(False).alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(
                is_stop,
                F.struct(
                    pos.alias("pos"),
                    acc["ps"].alias("ps"),
                    acc["pl"].alias("pl"),
                    acc["n_plte"].alias("n_plte"),
                    acc["ok"].alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(
                is_plte,
                F.struct(
                    adv.alias("pos"),
                    F.coalesce(acc["ps"], pos + 8).alias("ps"),
                    F.coalesce(acc["pl"], clen).alias("pl"),
                    (acc["n_plte"] + 1).alias("n_plte"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                ),
            )
            .otherwise(
                F.struct(
                    adv.alias("pos"),
                    acc["ps"].alias("ps"),
                    acc["pl"].alias("pl"),
                    acc["n_plte"].alias("n_plte"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                )
            )
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_PNG_MAX_CHUNKS)), pinit, pstep
    )


def _png_block_walk(p, cw):
    """Bounded stored-deflate block walk (stage 2 — see
    ``_png_gray_decode``): one struct column
    (bpos, blocks, cum, final, ok) over the zlib stream located by the
    staged chunk-walk column ``cw``."""
    zs, zl = cw["zs"], cw["zl"]
    binit = F.struct(
        (zs + 2).alias("bpos"),
        F.array().cast(
            "array<struct<start:bigint,cum:bigint,len:bigint>>"
        ).alias("blocks"),
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(False).alias("final"),
        F.lit(True).alias("ok"),
    )

    def bstep(acc, _):
        bpos = acc["bpos"]
        hbyte = _u8(p, bpos)
        blen = _le16(p, bpos + 1).cast("bigint")
        good = (
            hbyte.isNotNull()
            & (F.pmod(F.floor(hbyte / 2).cast("int"), F.lit(4)) == 0)
            & (_le16(p, bpos + 3) == (F.lit(65535) - blen))
            & ((bpos + 4 + blen) <= (zs + zl - 5))
        )
        new = F.when(
            ~good,
            F.struct(
                bpos.alias("bpos"),
                acc["blocks"].alias("blocks"),
                acc["cum"].alias("cum"),
                F.lit(True).alias("final"),
                F.lit(False).alias("ok"),
            ),
        ).otherwise(
            F.struct(
                (bpos + 5 + blen).alias("bpos"),
                F.concat(
                    acc["blocks"],
                    F.array(
                        F.struct(
                            (bpos + 5).alias("start"),
                            acc["cum"].alias("cum"),
                            blen.alias("len"),
                        )
                    ),
                ).alias("blocks"),
                (acc["cum"] + blen).alias("cum"),
                (F.pmod(hbyte, F.lit(2)) == 1).alias("final"),
                F.lit(True).alias("ok"),
            )
        )
        return F.when(acc["final"] | ~acc["ok"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_PNG_MAX_BLOCKS)), binit, bstep
    )


def _png_stored_raw(p, cw, bw, raw_n):
    """The stored-deflate decompressed stream as ONE array<int>
    column (bytes 1..raw_n, 1-based stream order) — the
    materialized form of ``_png_gray_decode``'s per-byte ``zraw``
    reader, used by the r14 filter-reconstruction stage so all three
    deflate envelopes hand the unfilter fold the same shape (the
    FH/DH walks already materialize their ``out`` arrays).
    ``raw_n`` must be caller-clamped (see ``_decode_pixels_png``)."""
    blocks = bw["blocks"]

    def zraw(i):
        blk = F.try_element_at(
            F.filter(
                blocks,
                lambda b: (i > b["cum"]) & (i <= b["cum"] + b["len"]),
            ),
            F.lit(1),
        )
        return _u8(p, blk["start"] + (i - blk["cum"]) - 1)

    return F.transform(F.sequence(F.lit(1), raw_n), zraw)


def _png_unfilter(raw, wb, hb, bpp):
    """PNG scanline-filter RECONSTRUCTION (r14 — filters 0..4: None /
    Sub / Up / Average / Paeth, the full RFC 2083 §6 set real libpng
    output uses) as one bounded fold: ``raw`` is the staged
    decompressed stream (array<int>, ``hb`` scanlines of 1 filter
    byte + ``wb*bpp`` data bytes), the result is the array of
    ``hb*wb*bpp`` reconstructed bytes in top-down row-major order
    (filter bytes stripped). Sequential by construction — Recon(x)
    depends on the already-reconstructed left/up/up-left neighbors —
    so the fold accumulates the recon array and each step reads its
    neighbors back out of the accumulator (lambda-var reads, O(1));
    intermediates chain through ``_let`` so the step's expression
    tree stays analyzable (the FH-walk lesson). An unknown filter
    type or a too-short stream yields NULL entries, which the
    caller's recon-validity check turns into a row null-out; the
    Paeth predictor uses the standard |b−c| / |a−c| / |a+b−2c|
    simplification of |p−x| with p = a+b−c."""
    stride = wb * bpp
    zero = F.lit(0).cast("bigint")

    def step(acc, i):
        r = F.floor(i / stride).cast("bigint")
        x = F.pmod(i, stride)
        ft = F.try_element_at(raw, (r * (stride + 1) + 1).cast("int"))
        fx = F.try_element_at(
            raw, (r * (stride + 1) + 2 + x).cast("int")
        )
        av = F.when(
            x >= bpp,
            F.try_element_at(acc, (i - bpp + 1).cast("int")).cast(
                "bigint"
            ),
        ).otherwise(zero)
        bv = F.when(
            r > 0,
            F.try_element_at(acc, (i - stride + 1).cast("int")).cast(
                "bigint"
            ),
        ).otherwise(zero)
        cv = F.when(
            (r > 0) & (x >= bpp),
            F.try_element_at(
                acc, (i - stride - bpp + 1).cast("int")
            ).cast("bigint"),
        ).otherwise(zero)

        def recon(a):
            def recon_b(b):
                def recon_c(c):
                    pa = F.abs(b - c)
                    pb = F.abs(a - c)
                    pc = F.abs(a + b - 2 * c)
                    paeth = (
                        F.when((pa <= pb) & (pa <= pc), a)
                        .when(pb <= pc, b)
                        .otherwise(c)
                    )
                    pred = (
                        F.when(ft == 0, zero)
                        .when(ft == 1, a)
                        .when(ft == 2, b)
                        .when(ft == 3, F.floor((a + b) / 2))
                        .when(ft == 4, paeth)
                    )  # ft outside 0..4 (or null) -> null entry
                    return F.pmod(fx + pred, F.lit(256)).cast("int")

                return _let(cv, recon_c)

            return _let(bv, recon_b)

        return F.concat(acc, F.array(_let(av, recon)))

    return F.aggregate(
        F.sequence(F.lit(0), hb * stride - 1),
        F.array().cast("array<int>"),
        step,
    )


#: formats decode_pixels can dispatch on
_DECODE_FORMATS = ("bmp", "bmp8", "ppm", "pgm", "png", "gif")


def decode_pixels(
    media: DataFrame,
    payload_col: str = "payload",
    formats=None,
    png_fixed_huffman: bool = False,
    png_dynamic_huffman: bool = False,
    png_filters: bool = False,
    png_palette: bool = False,
    png_16bit: bool = False,
) -> DataFrame:
    """REAL pixel decode of uncompressed formats, pure Spark: returns
    (media_id, img_format, width, height, pixels) where ``pixels`` is
    the flattened TOP-DOWN row-major RGB byte array.

    * BMP: dispatched on the 'BM' magic; data offset, dimensions,
      bpp and compression are read from the actual header (only
      24-bit BI_RGB with positive height — bottom-up — is supported;
      anything else nulls out). Decoding undoes the bottom-up row
      order, per-pixel BGR and the 4-byte row stride.
    * BMP 8-bit paletted (r9): same header dispatch with bpp == 8;
      each index byte is looked up in the BGR0 palette that follows
      BITMAPINFOHEADER (biClrUsed entries; 0 means 256), rows
      bottom-up at a 4-byte-padded one-byte-per-pixel stride.
    * PPM (P6) / PGM (P5, r9): header parsed from the leading ASCII
      bytes (canonical single-whitespace form, as emitted by most
      tools); P6 data is already top-down RGB, P5 grayscale is
      expanded to R=G=B so ``pixels`` has one shape for every format.

    * PNG 8-bit with STORED-deflate zlib (r11, ``_png_gray_decode``;
      r13 RGB; r14 gray+alpha and RGBA — the full non-palette
      color-type matrix 0/2/4/6): signature + IHDR dispatch,
      CRC/Adler verified, gray expanded to R=G=B, alpha decoded
      through the stride/filters then dropped from the flat-RGB
      output. Huffman-compressed PNGs null out here unless the
      opt-in walk flags below are set.

    JPEG/GIF (and compressed PNG) pixel decode still requires
    ``decode_media``'s codec libraries — header metadata for those is
    available via ``with_image_header_meta``.

    Plan shape (r12, the e6_pixel_decode attribution fix): formats
    are DISPATCHED BEFORE the projection — a cheap signature filter
    splits the input into a PNG branch and a non-PNG branch, each
    with its own small projection, unioned back. r11 carried the PNG
    chunk/block-walk expressions inside every caller's single
    projection behind a per-row guard; the guard skips the folds at
    runtime, but the expression tree itself cost non-PNG callers
    ~1.5× (same-session interleaved A/B on BMP/PPM-only input,
    SCALING_r12.md §1 — r10 body 1.95 s vs r11 body 2.88 s at
    sf0.1). With the split, a BMP/PPM/PGM-only input's plan contains
    no PNG expressions at all (byte-identical to the r10 plan modulo
    one cheap signature Filter), and the PNG branch's walks run
    unguarded on rows that are all PNGs. The price is that the
    source is scanned once per branch — for a parquet media table
    that is a second pruned pass over the payload column; the
    per-row interpreted-expression overhead the fat single plan paid
    on EVERY row at any scale measured larger.

    ``formats`` (r12) is the caller's format-inventory CONTRACT: a
    pipeline that knows its media table holds only certain formats
    (usually recorded per-partition in the catalog) passes the
    subset, and the plan contains ONLY those branches — no signature
    filter, no union, no second source pass: ``formats`` without
    'png' is the r10 single-projection shape pruned further to the
    declared formats; ``('png',)`` is the PNG plan alone. Pruning is
    PER-FORMAT (r13 — r12 dispatched png vs non-png only, so e.g.
    ``('bmp',)`` still decoded ppm rows, contradicting this
    contract): rows whose actual format falls outside the declared
    set null out because their branch is absent from the dispatch
    chain, and the undeclared formats' decode expressions are absent
    from the plan. The declaration prunes the plan, it never
    mis-decodes. Default ``None`` keeps full auto-dispatch.

    ``png_fixed_huffman`` (r12) additionally decodes PNGs whose zlib
    stream is one final FIXED-Huffman deflate block (RFC 1951
    §3.2.6) — real LZ77 with back-references, the first class of
    real-world PNGs beyond stored blocks. Opt-in (the walk fold
    would otherwise sit in every PNG caller's plan — the
    e6_pixel_decode lesson).

    ``png_dynamic_huffman`` (r13 — the r12 verdict's #1 remaining
    gap) additionally decodes PNGs whose zlib stream is one final
    DYNAMIC-Huffman deflate block (RFC 1951 §3.2.7, BTYPE=10 — what
    real-world encoders actually emit, zlib included): the
    transmitted code-length code, both canonical Huffman tables and
    the LZ77 symbol stream are all decoded in pure expressions via
    the count-based canonical walk (no tree materialized; see
    ``_dh_decode_sym``). Validated against zlib's own compressor
    output in tests. Same opt-in reasoning; scope: one final block,
    raw ≤ 64 KiB (``_PNG_FH_MAX_RAW``).

    ``png_filters`` (r14 — the r13 verdict's #1 remaining gap)
    additionally reconstructs PNGs whose scanlines use filters 1–4
    (Sub / Up / Average / Paeth, RFC 2083 §6 — what real libpng
    output uses per-line adaptively), across ALL enabled deflate
    envelopes: the decompressed stream is staged once
    (stored-block table / FH walk / DH walk, dispatched on the 3-bit
    block header) and one bounded reconstruction fold
    (``_png_unfilter``) undoes the filters; gray and RGB both.
    Opt-in for the same plan-cost reason; default keeps the
    filter-0-only plans byte-identical to r13. Scope under the flag:
    raw ≤ ``_PNG_FH_MAX_RAW`` for every envelope (the shared
    unfilter stage's fold bound; unfiltered stored-block decode
    keeps its larger multi-block cap).

    GIF (r14): declaring ``'gif'`` in ``formats`` adds REAL GIF
    (LZW) decode — extension-skipping block walk, LZW data sub-block
    table, one bounded fold per LZW code with the dictionary as
    (start, len) windows into the output stream, and a bounds-checked
    global-color-table lookup. GIF rides the EXPLICIT formats
    contract only: the ``formats=None`` auto-dispatch keeps the r12
    png/non-png split so existing default plans stay byte-identical.

    ``png_palette`` (r14 — completes the 8-bit color-type matrix
    0/2/3/4/6) additionally decodes PALETTED (color type 3) PNGs:
    the stream carries one index byte per pixel (filters apply at
    the 1-byte stride), RGB comes from the payload's PLTE chunk —
    located by a bounded pre-IDAT chunk walk (``_png_plte_walk``),
    CRC-verified by the shared chunk walk, length/multiplicity
    validated, and every index bounds-checked against the entry
    count (out-of-range nulls the row). Works across all enabled
    deflate envelopes and both filter modes. Same opt-in reasoning;
    default keeps prior plans byte-identical.
    """
    if formats is not None:
        fs = set(formats)
        unknown = fs - set(_DECODE_FORMATS)
        if unknown:
            raise ValueError(
                f"decode_pixels: unknown formats {sorted(unknown)}; "
                f"supported: {_DECODE_FORMATS}"
            )
        if "gif" in fs:
            # GIF rides the EXPLICIT formats contract only (r14): the
            # auto-dispatch default keeps the r12 png/non-png split so
            # existing formats=None plans stay byte-identical
            rest = fs - {"gif"}
            if not rest:
                return _decode_pixels_gif(media, payload_col)
            has_gif = F.coalesce(
                F.hex(F.substring(F.col(payload_col), 1, 4))
                == "47494638",
                F.lit(False),
            )
            gif = _decode_pixels_gif(
                media.where(has_gif), payload_col
            )
            others = decode_pixels(
                media.where(~has_gif),
                payload_col,
                formats=tuple(sorted(rest)),
                png_fixed_huffman=png_fixed_huffman,
                png_dynamic_huffman=png_dynamic_huffman,
                png_filters=png_filters,
                png_palette=png_palette,
                png_16bit=png_16bit,
            )
            return others.unionByName(gif)
        if "png" not in fs:
            return _decode_pixels_nonpng(media, payload_col, formats=fs)
        if fs == {"png"}:
            return _decode_pixels_png(
                media,
                payload_col,
                fixed_huffman=png_fixed_huffman,
                dynamic_huffman=png_dynamic_huffman,
                filters=png_filters,
                palette=png_palette,
                depth16=png_16bit,
            )
    p = F.col(payload_col)
    # null payloads must route to the non-PNG branch (where they null
    # out), not vanish: coalesce the signature test to false
    has_png_sig = F.coalesce(
        F.hex(F.substring(p, 1, 8)) == _PNG_SIG, F.lit(False)
    )
    non_png = _decode_pixels_nonpng(
        media.where(~has_png_sig),
        payload_col,
        formats=(set(formats) - {"png"}) if formats is not None else None,
    )
    png = _decode_pixels_png(
        media.where(has_png_sig),
        payload_col,
        fixed_huffman=png_fixed_huffman,
        dynamic_huffman=png_dynamic_huffman,
        filters=png_filters,
        palette=png_palette,
        depth16=png_16bit,
    )
    return non_png.unionByName(png)


#: Expression-construction backend for the PNG decode plan. "column"
#: (default) is the per-node py4j/ColumnNode build; "sql" assembles
#: each staged walk as one SQL text via strexpr and hands it to ONE
#: ``F.expr`` per staged column. MEASURED NEGATIVE (SCALING_r14.md
#: §6): the sql path cuts construction from ~3.8 s to ~0.05 s (it
#: eliminates ~31k py4j round trips) but ``F.expr`` parse is LAZY —
#: paid inside each select's eager analysis — and ANTLR on the
#: ~515 KB deeply-nested program costs ~18 s, 3-7x the ColumnNode
#: analysis it replaces (full-flag build+selects: column 8.2 s vs
#: sql 22.6 s, same session). Kept in-tree gated at zero
#: default-plan cost with a byte-identity differential test, the DH
#: peek-walk precedent. Overridable for A/B via env.
_PNG_EXPR_BACKEND = os.environ.get("SPARK_GRAFT_PNG_EXPR", "column")


def _decode_pixels_png(
    media: DataFrame,
    payload_col: str,
    fixed_huffman: bool = False,
    dynamic_huffman: bool = False,
    filters: bool = False,
    palette: bool = False,
    depth16: bool = False,
) -> DataFrame:
    """The PNG-only decode plan: every input row carries the PNG
    signature, so the walk folds are staged as columns (each
    multiply-referenced downstream — CollapseProject keeps them
    staged; see _png_gray_decode for why inlining would re-execute
    the walks per decompressed byte). With ``fixed_huffman`` the
    fixed-Huffman symbol walk (``_png_fixed_walk``) is additionally
    staged, guarded by the cheap 3-bit block-header check so
    stored-block rows never run it — opt-in precisely because of the
    r12 e6_pixel_decode lesson (expressions in a plan cost even the
    rows that skip them at runtime). ``dynamic_huffman`` (r13) stages
    the four BTYPE=10 columns (header / code-lengths walk / tables /
    symbol walk, see the section note above ``_dh_decode_sym``) under
    the same guard pattern — the low-3-bits check routes stored and
    FH rows around every dynamic fold.

    ``filters`` (r14) stages two more columns shared by EVERY
    enabled envelope: ``__praw``, the decompressed stream as one
    array (stored-block reader materialized / FH walk out / DH walk
    out, dispatched on the 3-bit block header), and ``__prc``, the
    ``_png_unfilter`` reconstruction fold over it. The decoders then
    read pixels from ``__prc`` and accept filter types 0-4 instead
    of requiring 0; scope under the flag is raw <= _PNG_FH_MAX_RAW
    for every envelope (the shared fold bound).

    Expression construction vs plan assembly are split (r14,
    ``_png_plan_exprs``) so the expression program can be built under
    either backend: the default ``column`` backend is the per-node
    py4j/ColumnNode build; the gated ``sql`` backend assembles the
    walks as ONE SQL text per staged column via :mod:`strexpr`.
    Tests pin the two backends byte-identical; the sql path is a
    measured NEGATIVE for wall time (see ``_PNG_EXPR_BACKEND``) —
    it exists as the reproducible record of that measurement and as
    a construction-path differential oracle."""
    backend = _PNG_EXPR_BACKEND
    if backend == "sql":
        import sys

        from . import strexpr

        with strexpr.string_backend(sys.modules[__name__]):
            staged_e, finals_e = _png_plan_exprs(
                payload_col, fixed_huffman, dynamic_huffman, filters, palette, depth16
            )
        staged_e = [(n, strexpr.to_col(e)) for n, e in staged_e]
        finals = [strexpr.to_col(e) for e in finals_e]
    else:
        staged_e, finals = _png_plan_exprs_cached(
            payload_col, fixed_huffman, dynamic_huffman, filters, palette, depth16
        )
    df = media
    for n, e in staged_e:
        df = df.select("*", e.alias(n))
    if os.environ.get("SPARK_GRAFT_PNG_SPLIT", "0") == "1":
        # r15 A/B knob (verdict task 3): materialize the staged walk
        # columns before the pixel-assembly select, splitting the one
        # giant expression tree each task evaluates into two smaller
        # ones. localCheckpoint (lazy) — computed per invocation
        # inside the timed plan, nothing crosses runs.
        df = df.localCheckpoint(eager=False)
    return df.select("media_id", *finals)


@lru_cache(maxsize=32)
def _png_plan_exprs_cached(
    payload_col: str,
    fixed_huffman: bool,
    dynamic_huffman: bool,
    filters: bool,
    palette: bool,
    depth16: bool,
):
    """Memoized Column-backend PNG expression program (r14
    optimization round): the program is a pure function of its flag
    signature — no data, schema or session state enters construction
    — and costs ~4-11 s of py4j round trips per build, measured at
    its floor twice (SCALING_r13.md §1, SCALING_r14.md §6). Caching
    the immutable Column trees makes repeat plan builds free;
    analysis, codegen and execution are untouched, and every
    invocation still computes from the parquet inputs. The
    sql/strexpr backend path calls ``_png_plan_exprs`` directly under
    its F-swap context manager and must never share this cache (the
    cached trees are py4j Columns, not strexpr fragments)."""
    staged, finals = _png_plan_exprs(
        payload_col, fixed_huffman, dynamic_huffman, filters, palette, depth16
    )
    return tuple(staged), tuple(finals)


def _png_plan_exprs(
    payload_col: str,
    fixed_huffman: bool = False,
    dynamic_huffman: bool = False,
    filters: bool = False,
    palette: bool = False,
    depth16: bool = False,
):
    """The PNG decode EXPRESSION PROGRAM, backend-agnostic: returns
    ``(staged, finals)`` where ``staged`` is an ordered list of
    ``(column_name, expr)`` (later stages reference earlier ones by
    column name) and ``finals`` are the four aliased output
    expressions ``img_format / width / height / pixels``.  Every
    expression is built through the module-global ``F``, so the same
    code produces Column trees (py4j) or :class:`strexpr.S` fragment
    trees (string backend) depending on what ``F`` is bound to at
    call time."""
    p = F.col(payload_col)
    staged = [("__pcw", _png_chunk_walk(p))]
    staged.append(("__pbw", _png_block_walk(p, F.col("__pcw"))))
    if palette:
        # PLTE located only for type-3 rows; other color types (and
        # garbage payloads) skip the fold at runtime
        staged.append(
            ("__ppl", F.when(_u8(p, 26) == 3, _png_plte_walk(p)))
        )
    plte = F.col("__ppl") if palette else None
    if fixed_huffman or dynamic_huffman or filters:
        w = _be32(p, 17)
        h = _be32(p, 21)
        _bpp = _png_bpp(_u8(p, 26))
        if depth16:
            _bpp = _bpp * (
                F.when(_u8(p, 25) == 16, F.lit(2))
                .otherwise(F.lit(1))
                .cast("bigint")
            )
        _raw0 = h.cast("bigint") * (w.cast("bigint") * _bpp + 1)
        _sane = (
            _raw0.isNotNull()
            & (_raw0 > 0)
            & (_raw0 <= F.lit(_PNG_FH_MAX_RAW).cast("bigint"))
        )
        raw_n = F.when(_sane, _raw0).otherwise(F.lit(0).cast("bigint"))
    if fixed_huffman:
        fh_sig = _sane & (
            F.pmod(_u8(p, F.col("__pcw")["zs"] + 2), F.lit(8)) == 3
        )
        staged.append(
            (
                "__pfw",
                F.when(fh_sig, _png_fixed_walk(p, F.col("__pcw"), raw_n)),
            )
        )
    if dynamic_huffman:
        dh_sig = _sane & (
            F.pmod(_u8(p, F.col("__pcw")["zs"] + 2), F.lit(8)) == 5
        )
        staged.append(
            ("__pdh", F.when(dh_sig, _png_dh_header(p, F.col("__pcw"))))
        )
        staged.append(
            (
                "__pdl",
                F.when(
                    dh_sig,
                    _png_dh_lens_walk(p, F.col("__pcw"), F.col("__pdh")),
                ),
            )
        )
        staged.append(
            (
                "__pdt",
                F.when(
                    dh_sig, _png_dh_tabs(F.col("__pdh"), F.col("__pdl"))
                ),
            )
        )
        staged.append(
            (
                "__pdw",
                F.when(
                    dh_sig,
                    _png_dyn_walk(
                        p, F.col("__pcw"), raw_n, F.col("__pdt")
                    ),
                ),
            )
        )
    recon = None
    if filters:
        # the decompressed stream, one staged array column for every
        # enabled envelope: the 3-bit block header routes each row to
        # its envelope's reader (stored blocks may be non-final ->
        # low3 in {0,1}; one final FH block -> 3; one final DH -> 5).
        low3 = F.pmod(_u8(p, F.col("__pcw")["zs"] + 2), F.lit(8))
        praw = F.when(
            _sane & (low3 <= 1),
            _png_stored_raw(
                p, F.col("__pcw"), F.col("__pbw"), raw_n
            ),
        )
        if fixed_huffman:
            praw = praw.when(low3 == 3, F.col("__pfw")["out"])
        if dynamic_huffman:
            praw = praw.when(low3 == 5, F.col("__pdw")["out"])
        one = F.lit(1).cast("bigint")
        wbf = F.when(_sane, w.cast("bigint")).otherwise(one)
        hbf = F.when(_sane, h.cast("bigint")).otherwise(one)
        staged.append(("__praw", praw))
        staged.append(
            ("__prc", _png_unfilter(F.col("__praw"), wbf, hbf, _bpp))
        )
        recon = F.col("__prc")
    png_ok, png_w, png_h, png_pixels = _png_gray_decode(
        p, F.col("__pcw"), F.col("__pbw"), recon=recon, plte=plte,
        depth16=depth16,
    )
    fmt = F.when(png_ok, "png")
    width = F.when(png_ok, png_w)
    height = F.when(png_ok, png_h)
    pixels = F.when(png_ok, png_pixels)
    if fixed_huffman:
        fh_ok, fh_w, fh_h, fh_pixels = _png_gray_decode_fh(
            p, F.col("__pcw"), F.col("__pfw"), recon=recon, plte=plte,
            depth16=depth16,
        )
        fmt = fmt.when(fh_ok, "png")
        width = width.when(fh_ok, fh_w)
        height = height.when(fh_ok, fh_h)
        pixels = pixels.when(fh_ok, fh_pixels)
    if dynamic_huffman:
        dh_ok, dh_w, dh_h, dh_pixels = _png_gray_decode_dh(
            p, F.col("__pcw"), F.col("__pdw"), recon=recon, plte=plte,
            depth16=depth16,
        )
        fmt = fmt.when(dh_ok, "png")
        width = width.when(dh_ok, dh_w)
        height = height.when(dh_ok, dh_h)
        pixels = pixels.when(dh_ok, dh_pixels)
    finals = [
        fmt.alias("img_format"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        pixels.alias("pixels"),
    ]
    return staged, finals


def _decode_pixels_nonpng(
    media: DataFrame, payload_col: str, formats=None
) -> DataFrame:
    """The uncompressed-format decode plan (BMP-24 / BMP-8 paletted /
    PPM / PGM) — the r10 projection body: no PNG expressions anywhere
    in this plan.

    ``formats`` (r13, advice fix — the contract was previously
    png/non-png granular only): when a proper subset of the
    uncompressed formats is declared, the dispatch chain is built
    from ONLY those formats' branches — undeclared formats null out
    (their ``ok`` predicate never enters the chain) and their decode
    expressions are absent from the plan entirely, per-format, not
    just per-branch."""
    p = F.col(payload_col)
    is_bmp = (F.length(p) >= 54) & (F.hex(F.substring(p, 1, 2)) == "424D")
    is_ppm = (F.length(p) >= 9) & (F.hex(F.substring(p, 1, 3)) == "50360A")
    is_pgm = (F.length(p) >= 9) & (F.hex(F.substring(p, 1, 3)) == "50350A")

    # --- BMP (shared header fields) ---
    b_off = _le32(p, 11)
    b_w = _le32(p, 19)
    b_h = _le32(p, 23)
    b_hdr_ok = (
        is_bmp
        & (_le16(p, 27) == 1)
        & (_le32(p, 31) == 0)
        & (b_h > 0)
        & (b_w > 0)
    )
    b_ok = b_hdr_ok & (_le16(p, 29) == 24)
    b_stride = _bmp_stride(b_w)

    def bmp_row(r):
        # output row r (top-down) reads source row h-1-r; byte j of
        # the RGB output maps to source byte px·3 + (2 − channel)
        return F.transform(
            F.sequence(F.lit(0), b_w * 3 - 1),
            lambda j: _u8(
                p,
                b_off
                + (b_h - 1 - r) * b_stride
                + (F.floor(j / F.lit(3)).cast("bigint") * 3)
                + (F.lit(2) - F.pmod(j, F.lit(3)))
                + 1,
            ),
        )

    bmp_pixels = F.flatten(
        F.transform(F.sequence(F.lit(0), b_h - 1), bmp_row)
    )

    # --- BMP 8-bit paletted (r9) ---
    nclr = _le32(p, 47)
    pal_n = F.when(nclr == 0, F.lit(256)).otherwise(nclr)
    b8_stride = _bmp8_stride(b_w)

    def _b8_idx(q):
        # palette index of pixel q (top-down order) from the
        # bottom-up padded index rows
        r_t = F.floor(q / b_w).cast("bigint")
        px = F.pmod(q, b_w)
        return _u8(p, b_off + (b_h - 1 - r_t) * b8_stride + px + 1)

    b8_ok = (
        b_hdr_ok
        # r10 (advice): the fixed-offset palette read (55 + idx*4) and
        # the biClrUsed read at 47 assume a 40-byte BITMAPINFOHEADER;
        # V4/V5 DIBs place the palette after their larger header, so
        # anything but 40 nulls out instead of decoding header bytes
        & (_le32(p, 15) == 40)
        & (_le16(p, 29) == 8)
        & (b_off >= F.lit(54) + pal_n * 4)
        # an index past biClrUsed reads bytes outside the palette —
        # invalid, whole image nulls out (matches decode_media's raise)
        & ~F.exists(
            F.sequence(F.lit(0), b_w * b_h - 1),
            lambda q: _b8_idx(q) >= pal_n,
        )
    )

    def bmp8_byte(k):
        # output byte k of the top-down RGB array: pixel q, channel c;
        # index byte from the bottom-up padded row, then the BGR0
        # palette entry (B at +0, G at +1, R at +2 — channel c reads
        # offset 2-c)
        q = F.floor(k / F.lit(3)).cast("bigint")
        c = F.pmod(k, F.lit(3))
        r_t = F.floor(q / b_w).cast("bigint")
        px = F.pmod(q, b_w)
        idx = _u8(p, b_off + (b_h - 1 - r_t) * b8_stride + px + 1)
        return _u8(p, F.lit(55) + idx * 4 + (F.lit(2) - c))

    bmp8_pixels = F.transform(
        F.sequence(F.lit(0), b_w * b_h * 3 - 1), bmp8_byte
    )

    # --- PPM ---
    hdr_len = F.least(F.length(p), F.lit(32))
    hdr = F.array_join(
        F.transform(
            F.sequence(F.lit(1), hdr_len), lambda i: F.char(_u8(p, i))
        ),
        "",
    )
    m = F.regexp_extract(hdr, r"^(P6\s\d+\s\d+\s255\s)", 1)
    p_ok = is_ppm & (F.length(m) > 0)
    p_w = F.regexp_extract(hdr, r"^P6\s(\d+)\s", 1).cast("int")
    p_h = F.regexp_extract(hdr, r"^P6\s\d+\s(\d+)\s", 1).cast("int")
    p_off = F.length(m)  # header is pure ASCII: chars == bytes
    ppm_pixels = F.transform(
        F.sequence(F.lit(0), p_w * p_h * 3 - 1),
        lambda k: _u8(p, p_off + k + 1),
    )

    # --- PGM (P5, r9): gray expanded to R=G=B ---
    gm = F.regexp_extract(hdr, r"^(P5\s\d+\s\d+\s255\s)", 1)
    g_ok = is_pgm & (F.length(gm) > 0)
    g_w = F.regexp_extract(hdr, r"^P5\s(\d+)\s", 1).cast("int")
    g_h = F.regexp_extract(hdr, r"^P5\s\d+\s(\d+)\s", 1).cast("int")
    g_off = F.length(gm)
    pgm_pixels = F.transform(
        F.sequence(F.lit(0), g_w * g_h * 3 - 1),
        lambda k: _u8(p, g_off + F.floor(k / F.lit(3)).cast("bigint") + 1),
    )

    branches = [
        ("bmp", b_ok, b_w, b_h, bmp_pixels),
        ("bmp8", b8_ok, b_w, b_h, bmp8_pixels),
        ("ppm", p_ok, p_w, p_h, ppm_pixels),
        ("pgm", g_ok, g_w, g_h, pgm_pixels),
    ]
    if formats is not None:
        fs = set(formats)
        branches = [b for b in branches if b[0] in fs]

    def chain(val_of):
        out = None
        for name, ok, w, h, px in branches:
            v = val_of(name, w, h, px)
            out = F.when(ok, v) if out is None else out.when(ok, v)
        # empty declared set (e.g. formats=('png',) routed here by a
        # caller bug) degenerates to all-null columns, never a decode
        return out if out is not None else F.lit(None)

    fmt = chain(lambda name, w, h, px: F.lit(name))
    width = chain(lambda name, w, h, px: w)
    height = chain(lambda name, w, h, px: h)
    pixels = chain(lambda name, w, h, px: px)
    if not branches:
        pixels = F.lit(None).cast("array<int>")
    return media.select(
        "media_id",
        fmt.cast("string").alias("img_format"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        pixels.alias("pixels"),
    )

def _be_hex(v, nbytes: int):
    """Hex string of ``v`` as a big-endian ``nbytes`` integer."""
    if not isinstance(v, Column):
        v = F.lit(v)
    v = v.cast("bigint")
    return F.concat(
        *[
            _byte_hex(F.shiftright(v, 8 * i))
            for i in range(nbytes - 1, -1, -1)
        ]
    )


def synthesize_header_media(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real JPEG / PNG / GIF header streams derived from document ids
    (r11, closing the r10 'meta row covering JPEG' ask): doc_id % 3
    dispatches the format; dimensions are the closed forms
    ``w = id % 500 + 16``, ``h = id % 300 + 16`` so an oracle can
    verify the encode→``with_image_header_meta``→dims ROUNDTRIP
    without re-implementing the byte walk (the e6_pixel_decode
    pattern; the hand-built struct.pack golden tests cover the parser
    against an independent encoder).

    The JPEG stream exercises the VARIABLE-offset SOF walk for real:
    a JFIF APP0, then ``id % 3`` filler DQT segments of varying
    length, then SOF0 — so the fold must skip 1-3 segments before the
    dims, at different offsets per row. PNG is signature+IHDR at the
    fixed offset; GIF87a/89a alternate by ``id % 2``. All built as
    one hex projection + ``unhex``, no UDF.
    """
    mid = F.col(id_col)
    w = (mid % 500 + 16).cast("int")
    h = (mid % 300 + 16).cast("int")

    # --- JPEG: SOI + APP0(JFIF) + (id%3) DQT fillers + SOF0 + EOI ---
    app0 = F.lit(
        "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0001" + "0001"
        + "00" + "00"
    )
    def dqt(i):
        # segment body: 3 + i bytes keyed on (id, i); len = body + 2
        body_len = 3 + i
        body = F.concat(
            *[_byte_hex(mid * 7 + F.lit(i * 31 + q)) for q in range(body_len)]
        )
        return F.concat(F.lit("FFDB"), _be_hex(body_len + 2, 2), body)

    # 1 + (id % 3) DQT segments in total: dqt(0) always, then up to
    # two more — the SOF lands 1-3 variable-length segments deep
    fillers = F.concat(
        *[
            F.when(mid % 3 > F.lit(i - 1), dqt(i)).otherwise(F.lit(""))
            for i in (1, 2)
        ]
    )
    sof0 = F.concat(
        F.lit("FFC0" + "0011" + "08"),
        _be_hex(h, 2),
        _be_hex(w, 2),
        F.lit("03" + "011100" + "021101" + "031101"),
    )
    jpeg = F.concat(F.lit("FFD8"), app0, dqt(0), fillers, sof0, F.lit("FFD9"))

    # --- PNG: signature + IHDR (fixed offsets; CRC unchecked) -------
    png = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        _be_hex(w, 4),
        _be_hex(h, 4),
        F.lit("08" + "02" + "00" + "00" + "00" + "DEADBEEF"),
    )

    # --- GIF: 87a/89a signature + LE16 logical screen dims ----------
    gif = F.concat(
        F.when(mid % 2 == 0, F.lit("474946383761")).otherwise(
            F.lit("474946383961")
        ),
        _le_hex(w, 2),
        _le_hex(h, 2),
        F.lit("00" + "00" + "00"),
    )

    payload = F.unhex(
        F.when(mid % 3 == 0, jpeg).when(mid % 3 == 1, png).otherwise(gif)
    )
    return docs.select(
        mid.alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
    )


# --- fixed-Huffman deflate PNG (r12) ------------------------------------
#
# RFC 1951 §3.2.6: deflate block type 01 uses a SPEC-FIXED Huffman
# alphabet (no dynamic code-length tree), so a bounded bit-walk fold
# can decode it without any codec library — the first class of
# real-world PNGs beyond stored blocks. Dynamic-Huffman (BTYPE=10)
# remains legitimately env-blocked (`decode_media`).
#
# Fixed literal/length codes (MSB-first):
#   0..143   -> 8 bits, code = lit + 0x30      (00110000..10111111)
#   144..255 -> 9 bits, code = lit + 0x100     (110010000..111111111)
#   256..279 -> 7 bits, code = sym - 256       (0000000..0010111)
#   280..287 -> 8 bits, code = sym - 280 + 0xC0 (11000000..11000111)
# Distance codes: 5 bits MSB-first, 0..29. Extra bits (both tables)
# are read LSB-first per RFC 1951 §3.1.1.

_FH_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27,
                31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195,
                227, 258]
_FH_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3,
                 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
_FH_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97,
                 129, 193, 257, 385, 513, 769, 1025, 1537, 2049,
                 3073, 4097, 6145, 8193, 12289, 16385, 24577]
_FH_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7,
                  7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
#: FH decode is scoped to streams whose raw size fits one stored
#: block's worth of bytes — same bound the stored path enforces per
#: block; keeps the symbol fold bounded on garbage headers.
_PNG_FH_MAX_RAW = 65535


def _pow2(k):
    """2^k for a dynamic small k (Spark's shiftleft/right need literal
    shift amounts) — element_at over a 14-entry literal table (max
    distance extra bits = 13)."""
    return F.element_at(
        F.array(*[F.lit(1 << i) for i in range(14)]), k.cast("int") + 1
    )


def _fh_bit(p, zs, i):
    """Bit ``i`` (0-based) of the deflate data that starts at 1-based
    byte offset ``zs + 2`` — LSB-first within each byte (RFC 1951)."""
    byte = _u8(p, zs + 2 + F.floor(i / 8).cast("bigint"))
    return F.pmod(
        F.floor(byte / _pow2(F.pmod(i, F.lit(8)))).cast("int"), F.lit(2)
    )


def _fh_val(p, zs, i, n):
    """``n`` extra bits at bit pos ``i`` as an LSB-first integer
    (n dynamic, 0..13; n = 0 reads nothing)."""
    return F.when(
        n > 0,
        F.aggregate(
            F.sequence(F.lit(0).cast("bigint"), n.cast("bigint") - 1),
            F.lit(0).cast("bigint"),
            lambda a, j: a
            + _fh_bit(p, zs, i + j).cast("bigint") * _pow2(j),
        ),
    ).otherwise(F.lit(0).cast("bigint"))


def _fh_code(p, zs, i, n: int):
    """``n`` bits at bit pos ``i`` read MSB-first (Huffman code
    order); n is a Python literal."""
    e = F.lit(0)
    for j in range(n):
        e = e * 2 + _fh_bit(p, zs, i + j)
    return e


def _let(value, body):
    """Bind ``value`` as a LAMBDA VARIABLE for ``body`` — the
    one-element ``transform`` trick. Beyond the usual evaluate-once
    property, this keeps the expression TREE small: every plain
    Column reference copies its whole subtree, and the FH symbol
    step references its intermediates (sym, bit positions, lengths)
    so many times that naive inlining blew the ANALYZER's heap
    (tree-size explosion, not a runtime cost). A lambda-var
    reference is one node."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _png_fixed_walk(p, cw, raw_n):
    """Fixed-Huffman symbol walk (stage 2-FH): one struct column
    ``(bp, out, done, ok)`` — ``bp`` the bit position after the walk,
    ``out`` the decompressed byte array. One fold step per SYMBOL
    (≤ raw_n literals/copies + EOB); LZ77 copies, including
    OVERLAPPING ones, are expressed as cyclic repetition of the last
    ``D`` bytes (``out[len − D + (j mod D)]`` — byte-by-byte copy
    semantics in closed form). Any malformed code, over-long output
    or out-of-window distance flips ``ok`` and stops. Null-safe under
    eager subexpression hoisting (try_element_at reads, clamped table
    indices, caller-clamped ``raw_n``); intermediates are chained
    through ``_let`` lambda bindings to keep the step's tree
    analyzable."""
    zs = cw["zs"]
    lenb = F.array(*[F.lit(v) for v in _FH_LEN_BASE])
    lene = F.array(*[F.lit(v) for v in _FH_LEN_EXTRA])
    distb = F.array(*[F.lit(v) for v in _FH_DIST_BASE])
    diste = F.array(*[F.lit(v) for v in _FH_DIST_EXTRA])
    init = F.struct(
        F.lit(3).cast("bigint").alias("bp"),
        F.array().cast("array<int>").alias("out"),
        F.lit(False).alias("done"),
        F.lit(True).alias("ok"),
    )

    def step(acc, _):
        bp = acc["bp"]
        out = acc["out"]

        def with_sym(hdr):
            # hdr: (sym, nb, sok) — decoded symbol, its bit cost,
            # code validity
            sym, nb, sok = hdr["sym"], hdr["nb"], hdr["sok"]
            osz = F.size(out).cast("bigint")
            fail = F.struct(
                bp.alias("bp"), out.alias("out"),
                F.lit(True).alias("done"), F.lit(False).alias("ok"),
            )

            def with_len(lp):
                L, bp2 = lp["L"], lp["bp2"]

                def with_dist(dp):
                    D, bp3 = dp["D"], dp["bp3"]
                    dist_ok = (
                        (dp["dc"] <= 29) & (D >= 1) & (D <= osz)
                        & (L >= 3) & (L <= 258)
                    )
                    copied = F.transform(
                        F.sequence(F.lit(0).cast("bigint"), L - 1),
                        lambda j: F.try_element_at(
                            out, (osz - D + F.pmod(j, D) + 1).cast("int")
                        ),
                    )
                    return F.when(
                        dist_ok,
                        F.struct(
                            bp3.alias("bp"),
                            F.concat(out, copied).alias("out"),
                            F.lit(False).alias("done"),
                            acc["ok"].alias("ok"),
                        ),
                    ).otherwise(fail)

                dc = _fh_code(p, zs, bp2, 5)
                dci = F.least(dc, F.lit(29)).cast("int")
                dext = F.element_at(diste, dci + 1)
                return _let(
                    F.struct(
                        dc.alias("dc"),
                        (
                            F.element_at(distb, dci + 1).cast("bigint")
                            + _fh_val(p, zs, bp2 + 5, dext)
                        ).alias("D"),
                        (bp2 + 5 + dext.cast("bigint")).alias("bp3"),
                    ),
                    with_dist,
                )

            li = F.greatest(
                F.least(sym - 257, F.lit(28)), F.lit(0)
            ).cast("int")
            lext = F.element_at(lene, li + 1)
            len_branch = _let(
                F.struct(
                    (
                        F.element_at(lenb, li + 1).cast("bigint")
                        + _fh_val(p, zs, bp + nb, lext)
                    ).alias("L"),
                    (bp + nb + lext.cast("bigint")).alias("bp2"),
                ),
                with_len,
            )
            return (
                F.when(sym.isNull() | ~sok | (osz > raw_n), fail)
                .when(
                    sym == 256,
                    F.struct(
                        (bp + 7).alias("bp"), out.alias("out"),
                        F.lit(True).alias("done"), acc["ok"].alias("ok"),
                    ),
                )
                .when(
                    sym < 256,
                    F.struct(
                        (bp + nb).alias("bp"),
                        F.concat(
                            out, F.array(sym.cast("int"))
                        ).alias("out"),
                        F.lit(False).alias("done"),
                        acc["ok"].alias("ok"),
                    ),
                )
                .when((sym >= 257) & (sym <= 285), len_branch)
                .otherwise(fail)
            )

        def decode_sym(codes):
            v7, v8, v9 = codes["v7"], codes["v8"], codes["v9"]
            is7 = v7 <= 23
            is8lit = (v8 >= 48) & (v8 <= 191)
            is8hi = (v8 >= 192) & (v8 <= 199)
            is9 = (v9 >= 400) & (v9 <= 511)
            return F.struct(
                (
                    F.when(is7, v7 + 256)
                    .when(is8lit, v8 - 48)
                    .when(is8hi, v8 + 88)
                    .otherwise(v9 - 256)
                ).alias("sym"),
                F.when(is7, F.lit(7))
                .when(is8lit | is8hi, F.lit(8))
                .otherwise(F.lit(9))
                .cast("bigint")
                .alias("nb"),
                (is7 | is8lit | is8hi | is9).alias("sok"),
            )

        def with_codes(v7c):
            v7 = v7c["v7"]
            return _let(
                _let(
                    F.struct(
                        v7.alias("v7"),
                        (v7 * 2 + _fh_bit(p, zs, bp + 7)).alias("v8"),
                    ),
                    lambda c8: F.struct(
                        c8["v7"].alias("v7"),
                        c8["v8"].alias("v8"),
                        (
                            c8["v8"] * 2 + _fh_bit(p, zs, bp + 8)
                        ).alias("v9"),
                    ),
                ),
                lambda codes: _let(decode_sym(codes), with_sym),
            )

        new = _let(
            F.struct(_fh_code(p, zs, bp, 7).alias("v7")), with_codes
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(raw_n + 1, F.lit(1))), init, step
    )


def _png_gray_decode_fh(p, cw, fw, recon=None, plte=None, depth16=False):
    """(ok, w, h, pixels) for a grayscale-8 PNG whose zlib stream is
    ONE final fixed-Huffman deflate block (BTYPE=01) — the FH sibling
    of ``_png_gray_decode``, consuming the staged symbol walk ``fw``
    (``_png_fixed_walk``) instead of the stored-block table. Envelope
    checks mirror the stored path (IHDR + CRC, single IDAT, zlib
    header); integrity is REAL: Adler-32 recomputed over the
    DECOMPRESSED bytes, per-scanline filter-0 check, exact output
    length, and the walk must end on EOB within the stream's bit
    budget. Scope: raw size ≤ ``_PNG_FH_MAX_RAW`` (the fold bound);
    dynamic-Huffman blocks fail the 3-bit header check and null out
    (codec-bound, documented)."""
    w = _be32(p, 17)
    h = _be32(p, 21)
    ctype = _u8(p, 26)
    # r14 depth16: bytes/pixel doubles at bit depth 16 (big-endian
    # samples; the reader takes each sample's FIRST byte = MSB, the
    # standard 8-bit downsample); spb None keeps the 8-bit plans
    # byte-identical when the flag is off
    if depth16:
        spb = (
            F.when(_u8(p, 25) == 16, F.lit(2))
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        bpp = _png_bpp(ctype) * spb
    else:
        spb = None
        bpp = _png_bpp(ctype)
    _cap = F.lit(_PNG_FH_MAX_RAW).cast("bigint")
    _raw0 = h.cast("bigint") * (w.cast("bigint") * bpp + 1)
    _sane = _raw0.isNotNull() & (_raw0 > 0) & (_raw0 <= _cap)
    one = F.lit(1).cast("bigint")
    wb = F.when(_sane, w.cast("bigint")).otherwise(one)
    hb = F.when(_sane, h.cast("bigint")).otherwise(one)
    raw_n = F.when(_sane, _raw0).otherwise(F.lit(0).cast("bigint"))
    ihdr_ok = (
        _sane
        & (F.length(p) >= 46)
        & (F.hex(F.substring(p, 1, 8)) == _PNG_SIG)
        & (_be32(p, 9) == 13)
        & _sig(p, 13, "IHDR")
        & (
            (_u8(p, 25) == 8)
            if not depth16
            else (
                _u8(p, 25).isin(8, 16)
                # palette + 16-bit is invalid per spec
                & ~((ctype == 3) & (_u8(p, 25) == 16))
            )
        )
        & (
            ctype.isin(0, 2, 4, 6)  # 8-bit non-palette matrix (r14)
            if plte is None
            # r14 opt-in png_palette: +3 (paletted); PLTE
            # validity/index bounds enforced by the reader
            else ctype.isin(0, 2, 3, 4, 6)
        )
        & (_u8(p, 27) == 0)
        & (_u8(p, 28) == 0)
        & (_u8(p, 29) == 0)
        & (F.crc32(F.substring(p, 13, 17)) == _be32u(p, 30))
        & (w > 0)
        & (h > 0)
    )
    zs, zl = cw["zs"], cw["zl"]
    chunks_ok = cw["done"] & cw["ok"] & (cw["n_idat"] == 1) & (zl >= 11)
    cmf = _u8(p, zs)
    flg = _u8(p, zs + 1)
    zhdr_ok = (
        (F.pmod(cmf, F.lit(16)) == 8)
        & (F.pmod(cmf * 256 + flg, F.lit(31)) == 0)
        & (F.pmod(F.floor(flg / 32).cast("int"), F.lit(2)) == 0)
    )
    # BFINAL=1 + BTYPE=01: low three bits of the first deflate byte
    btype_fh = F.pmod(_u8(p, zs + 2), F.lit(8)) == 3
    out = fw["out"]
    walk_ok = (
        fw["done"]
        & fw["ok"]
        & (F.size(out).cast("bigint") == raw_n)
        & (fw["bp"] <= (zl - 6) * 8)  # data bytes = zl - 2 hdr - 4 adler
    )

    def oraw(j):  # byte j (1-based) of the decompressed stream
        return F.try_element_at(out, j.cast("int"))

    s1 = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + oraw(j),
    )
    sw = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + j.cast("bigint") * oraw(j),
    )
    adler_ok = (
        F.pmod(raw_n + (raw_n + 1) * s1 - sw, F.lit(65521)) * 65536
        + F.pmod(F.lit(1) + s1, F.lit(65521))
    ) == _be32u(p, zs + zl - 4)
    filters_ok, png_byte = _png_pixel_reader(
        oraw, recon, wb, hb, bpp, ctype, p=p, plte=plte, spb=spb
    )
    pixels = F.transform(F.sequence(F.lit(0), wb * hb * 3 - 1), png_byte)
    ok = (
        ihdr_ok & chunks_ok & zhdr_ok & btype_fh & walk_ok & adler_ok
        & filters_ok
    )
    return ok, w, h, pixels


def encode_png_fixed(media_id, w, h) -> Column:
    """A spec-compliant grayscale-8 PNG whose zlib stream is ONE
    final FIXED-HUFFMAN deflate block (RFC 1951 §3.2.6) carrying the
    scanline bytes as literals + EOB — the encode twin of the r12
    fixed-Huffman decode path, sharing ``encode_png``'s pixel formula
    and real CRC-32/Adler-32. Literal codes: byte b ≤ 143 → 8 bits of
    ``b + 0x30``; b ≥ 144 → 9 bits of ``b + 0x100`` (both MSB-first);
    EOB = seven 0-bits; bits packed LSB-first into bytes (RFC 1951
    §3.1.1). The bit array is handed through a one-element
    ``transform`` so the byte packer sees it as a LAMBDA VARIABLE —
    inlining it would rebuild the whole array once per output byte
    (the expression-staging lesson). stdlib ``zlib.decompress``
    accepts the stream byte-for-byte (pinned in tests — external
    validation, not just our own round trip)."""
    wb = w.cast("bigint")
    hb = h.cast("bigint")
    raw_n = hb * (wb + 1)

    def raw_byte(j):
        r = F.floor((j - 1) / (wb + 1)).cast("bigint")
        pos = F.pmod(j - 1, wb + 1)
        return F.when(pos == 0, F.lit(0)).otherwise(
            pixel_value(media_id, r * wb + pos - 1)
        )

    def lit_bits(b):
        # MSB-first code bits: 8 bits of b+48, or 9 bits of b+256
        return F.when(
            b <= 143,
            F.transform(
                F.sequence(F.lit(7), F.lit(0), F.lit(-1)),
                lambda s: F.pmod(
                    F.floor((b + 48) / _pow2(s)).cast("int"), F.lit(2)
                ),
            ),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(8), F.lit(0), F.lit(-1)),
                lambda s: F.pmod(
                    F.floor((b + 256) / _pow2(s)).cast("int"), F.lit(2)
                ),
            )
        )

    bits = F.concat(
        F.array(F.lit(1), F.lit(1), F.lit(0)),  # BFINAL=1, BTYPE=01
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), raw_n), lambda j: lit_bits(raw_byte(j))
            )
        ),
        F.array(*[F.lit(0)] * 7),  # EOB (fixed code 0000000)
    )

    def pack(bs):
        nbytes = F.floor((F.size(bs) + 7) / 8).cast("bigint")
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), nbytes - 1),
                lambda k: _byte_hex(
                    F.aggregate(
                        F.sequence(F.lit(0), F.lit(7)),
                        F.lit(0),
                        lambda a, i: a
                        + F.coalesce(
                            F.try_element_at(
                                bs, (k * 8 + i + 1).cast("int")
                            ),
                            F.lit(0),
                        )
                        * _pow2(i),
                    )
                ),
            ),
            "",
        )

    zdata_hex = F.element_at(
        F.transform(F.array(bits), lambda bs: pack(bs)), 1
    )

    s1 = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + raw_byte(j),
    )
    sw = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + j.cast("bigint") * raw_byte(j),
    )
    adler_a = F.pmod(F.lit(1) + s1, F.lit(65521))
    adler_b = F.pmod(raw_n + (raw_n + 1) * s1 - sw, F.lit(65521))

    ihdr_td = F.concat(
        F.lit("49484452"),
        _be_hex(w, 4),
        _be_hex(h, 4),
        F.lit("08" + "00" + "00" + "00" + "00"),
    )
    ihdr = F.concat(
        F.lit("0000000D"),
        ihdr_td,
        _be_hex(F.crc32(F.unhex(ihdr_td)), 4),
    )
    zstream = F.concat(
        F.lit("7801"),
        zdata_hex,
        _be_hex(adler_b * 65536 + adler_a, 4),
    )
    idat_td = F.concat(F.lit("49444154"), zstream)
    idat = F.concat(
        # chunk length = zlib bytes: hex length / 2
        _be_hex((F.length(zstream) / 2).cast("bigint"), 4),
        idat_td,
        _be_hex(F.crc32(F.unhex(idat_td)), 4),
    )
    iend = F.lit("00000000" + "49454E44" + "AE426082")
    return F.unhex(
        F.concat(F.lit("89504E470D0A1A0A"), ihdr, idat, iend)
    )


def _inflate_fixed_py(data: bytes):
    """Hand-rolled fixed-Huffman inflate for ONE final block (the
    Python side of the r12 FH path — deliberately NOT
    ``zlib.decompress``, so both paths enforce the identical
    envelope). ``data`` is the deflate byte stream (zlib header and
    Adler both stripped). Returns ``(raw_bytes, end_bit_pos)``;
    raises on any malformed code, length, or distance."""
    bitpos = 3  # past BFINAL + BTYPE (caller checked them)

    def bit(i):
        if i // 8 >= len(data):
            raise ValueError("bit read past deflate stream")
        return (data[i // 8] >> (i % 8)) & 1

    def code(n):
        nonlocal bitpos
        v = 0
        for _ in range(n):
            v = (v << 1) | bit(bitpos)
            bitpos += 1
        return v

    def val(n):
        nonlocal bitpos
        v = 0
        for j in range(n):
            v |= bit(bitpos) << j
            bitpos += 1
        return v

    out = bytearray()
    while True:
        v = code(7)
        if v <= 0x17:
            sym = 256 + v
        else:
            v = (v << 1) | bit(bitpos)
            bitpos += 1
            if 0x30 <= v <= 0xBF:
                sym = v - 0x30
            elif 0xC0 <= v <= 0xC7:
                sym = 280 + v - 0xC0
            else:
                v = (v << 1) | bit(bitpos)
                bitpos += 1
                if 0x190 <= v <= 0x1FF:
                    sym = 144 + v - 0x190
                else:
                    raise ValueError("invalid fixed-Huffman code")
        if sym == 256:
            return bytes(out), bitpos
        if sym < 256:
            out.append(sym)
            continue
        if sym > 285:
            raise ValueError("invalid length symbol")
        length = _FH_LEN_BASE[sym - 257] + val(_FH_LEN_EXTRA[sym - 257])
        dc = code(5)
        if dc > 29:
            raise ValueError("invalid distance code")
        dist = _FH_DIST_BASE[dc] + val(_FH_DIST_EXTRA[dc])
        if dist > len(out):
            raise ValueError("distance beyond decoded window")
        for _ in range(length):  # overlap-safe byte-by-byte copy
            out.append(out[len(out) - dist])
        if len(out) > _PNG_FH_MAX_RAW:
            raise ValueError("decompressed output beyond FH bound")


# --- dynamic-Huffman deflate PNG (r13) ------------------------------------
#
# RFC 1951 §3.2.7 — BTYPE=10, the block type virtually every real PNG
# encoder emits (the r12 verdict's #1 remaining gap). Architecture is
# the r12 fixed-Huffman machinery plus the one genuinely new piece: a
# COUNT-BASED CANONICAL HUFFMAN WALK (`_dh_decode_sym`, the classic
# zlib/puff.c `decode()` — per bit length l, a code of length l is
# recognized from (counts[l], first_l, index_l) alone, so no tree is
# ever materialized: the "decode table" is two small arrays derived
# from the code-lengths vector). Stages, each a column so the
# analyzer sees small trees and each is evaluated once:
#
#   __pdh  header: HLIT/HDIST/HCLEN + the 19 code-length-code lengths
#          — CLOSED FORM, no fold: the transmit order is a fixed
#          permutation, so symbol s's 3-bit field sits at literal
#          offset 17 + 3·inv_order[s] when transmitted at all.
#   __pdl  code-lengths walk: one fold step per CL SYMBOL (≤ 320 —
#          HLIT+257+HDIST+1 is the emitted-length cap and every step
#          emits ≥ 1), each step = a ≤7-step count walk + the 16/17/18
#          repeat semantics.
#   __pdt  tables: counts[1..15] + canonically sorted symbols for the
#          lit/len and distance alphabets (array ops over ≤ 320 ints),
#          plus Kraft over-subscription checks.
#   __pdw  symbol walk: `_png_fixed_walk`'s exact structure with the
#          fixed-table peek replaced by two count walks (lit/len then
#          distance); LZ77 copy semantics shared verbatim.
#
# Scope bounds: raw size ≤ _PNG_FH_MAX_RAW (same fold bound as FH);
# ONE final BTYPE=10 block (multi-block streams null out, documented
# like FH). Incomplete codes are accepted (RFC permits e.g. the
# 1-bit single-distance code); over-subscribed codes and invalid
# symbols flip ok and null out.

#: RFC 1951 §3.2.7 code-length-code transmit order
_DH_CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13,
                2, 14, 1, 15]
_DH_CL_INV = [0] * 19
for _i, _s in enumerate(_DH_CL_ORDER):
    _DH_CL_INV[_s] = _i
del _i, _s


def _dh_decode_sym(p, zs, bp, counts, syms, maxbits: int):
    """ONE canonical-Huffman symbol starting at bit ``bp``: the
    count-based walk (zlib/puff `decode()`): reading MSB-first, after
    l bits the running code is compared against the window of
    length-l codes — ``code_l − first_l < counts[l]`` ⇔ the symbol is
    ``syms[index_l + (code_l − first_l)]`` where ``first_{l+1} =
    (first_l + counts[l])·2`` and ``index_{l+1} = index_l +
    counts[l]`` (canonical codes of one length are consecutive and
    sorted in symbol order — exactly how ``_png_dh_tabs`` sorts).
    Returns struct ``(sym, nb)``; an invalid/over-long code leaves
    ``sym`` null. ``counts`` is 1-indexed (length ``maxbits``);
    ``syms`` is the canonical symbol array."""
    init = F.struct(
        F.lit(0).cast("bigint").alias("code"),
        F.lit(0).cast("bigint").alias("first"),
        F.lit(0).cast("bigint").alias("index"),
        F.lit(None).cast("int").alias("sym"),
        F.lit(0).cast("bigint").alias("nb"),
    )

    def st(acc, l):
        def with_c(t):
            code2, cnt = t["code2"], t["cnt"].cast("bigint")
            hit = (code2 - acc["first"]) < cnt
            return F.when(
                hit,
                F.struct(
                    code2.alias("code"),
                    acc["first"].alias("first"),
                    acc["index"].alias("index"),
                    F.try_element_at(
                        syms,
                        (acc["index"] + code2 - acc["first"] + 1).cast(
                            "int"
                        ),
                    ).alias("sym"),
                    l.cast("bigint").alias("nb"),
                ),
            ).otherwise(
                F.struct(
                    code2.alias("code"),
                    ((acc["first"] + cnt) * 2).alias("first"),
                    (acc["index"] + cnt).alias("index"),
                    acc["sym"].alias("sym"),
                    acc["nb"].alias("nb"),
                )
            )

        return F.when(acc["sym"].isNotNull(), acc).otherwise(
            _let(
                F.struct(
                    (
                        acc["code"] * 2
                        + _fh_bit(p, zs, bp + l.cast("bigint") - 1)
                    ).alias("code2"),
                    F.coalesce(
                        F.try_element_at(counts, l.cast("int")), F.lit(0)
                    ).alias("cnt"),
                ),
                with_c,
            )
        )

    walked = F.aggregate(F.sequence(F.lit(1), F.lit(maxbits)), init, st)
    return F.struct(walked["sym"].alias("sym"), walked["nb"].alias("nb"))


def _pow2w(k):
    """2^k for dynamic k up to 15 (the Huffman-code width) — the
    ``_pow2`` literal-table trick, one wider (its 14 entries stop at
    the max EXTRA-bits count). The index is clamped: the no-hit path
    feeds k = −1, and ANSI ``element_at`` at index 0 throws even
    though the consuming branch is guarded (the eager
    subexpression-hoisting trap)."""
    return F.element_at(
        F.array(*[F.lit(1 << i) for i in range(16)]),
        F.greatest(k.cast("int"), F.lit(0)) + 1,
    ).cast("bigint")


def _dh_prefix_tables(counts, maxbits: int):
    """Per-image STAGED prefix tables for the peek-based symbol
    decode (r14 — the r13 pre-noted byte-arithmetic variant):
    ``lims[l] = Σ_{j≤l} counts[j]·2^(maxbits−j)`` (the first
    ``maxbits``-bit value NOT covered by codes of length ≤ l — the
    zlib ``first``/``count`` walk's limit collapsed into one
    monotone array) and ``cums[l] = Σ_{j≤l} counts[j]`` (the symbol-
    table offset). One ``maxbits``-step fold once per image; the
    per-symbol decode then needs no stateful walk at all (see
    ``_dh_decode_sym_peek``)."""
    init = F.struct(
        F.array().cast("array<bigint>").alias("lims"),
        F.array().cast("array<bigint>").alias("cums"),
        F.lit(0).cast("bigint").alias("lim"),
        F.lit(0).cast("bigint").alias("cum"),
    )

    def st(acc, l):
        c = F.coalesce(
            F.try_element_at(counts, l.cast("int")), F.lit(0)
        ).cast("bigint")
        lim2 = acc["lim"] + c * _pow2w(F.lit(maxbits) - l)
        cum2 = acc["cum"] + c
        return F.struct(
            F.concat(acc["lims"], F.array(lim2)).alias("lims"),
            F.concat(acc["cums"], F.array(cum2)).alias("cums"),
            lim2.alias("lim"),
            cum2.alias("cum"),
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.lit(maxbits)), init, st
    )
    return folded["lims"], folded["cums"]


def _dh_decode_sym_peek(p, zs, bp, lims, cums, syms, maxbits: int):
    """ONE canonical-Huffman symbol starting at bit ``bp`` via the
    PEEK variant (r14 A/B against the stateful count walk
    ``_dh_decode_sym``): read ``maxbits`` bits once as a flat
    MSB-first sum (over-reads past the stream coalesce to 0 — they
    can only sit below the true code's ``lims`` hit, and the walk's
    final bit-budget check still catches genuine overruns), then the
    code length is ``maxbits + 1 − #{l : peek < lims[l]}`` (``lims``
    is monotone, so the hit set is a suffix) and the symbol is one
    arithmetic index into ``syms`` — no per-bit struct fold. Returns
    the same ``(sym, nb)`` struct; an invalid/over-long code (no
    ``lims`` hit) leaves ``sym`` null."""
    peek = F.lit(0).cast("bigint")
    for k in range(maxbits):
        peek = peek + F.coalesce(
            _fh_bit(p, zs, bp + k), F.lit(0)
        ).cast("bigint") * F.lit(1 << (maxbits - 1 - k)).cast("bigint")

    def with_peek(pk):
        def with_l(l):
            # l = 1 reads prefix slot 0, which doesn't exist (both
            # prefixes are 0 there) — and try_element_at THROWS on a
            # literal-zero index (INVALID_INDEX_OF_ZERO), so the index
            # is clamped to 1 and the l = 1 case guarded by the when
            zero = F.lit(0).cast("bigint")
            prev_i = F.greatest(l - 1, F.lit(1)).cast("int")
            lim_prev = F.when(
                l > 1,
                F.coalesce(F.try_element_at(lims, prev_i), zero),
            ).otherwise(zero)
            cum_prev = F.when(
                l > 1,
                F.coalesce(F.try_element_at(cums, prev_i), zero),
            ).otherwise(zero)
            pos = cum_prev + F.floor(
                (pk - lim_prev) / _pow2w(F.lit(maxbits) - l)
            ).cast("bigint")
            sym = F.when(
                l <= maxbits,
                F.try_element_at(syms, (pos + 1).cast("int")),
            ).otherwise(F.lit(None).cast("int"))
            return F.struct(
                sym.cast("int").alias("sym"),
                F.when(l <= maxbits, l.cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
                .alias("nb"),
            )

        return _let(
            (
                F.lit(maxbits + 1)
                - F.size(F.filter(lims, lambda lm: pk < lm))
            ).cast("bigint"),
            with_l,
        )

    return _let(peek, with_peek)


#: symbol-decode implementation for the dynamic-Huffman DATA walk:
#: "fold" = the stateful count walk (_dh_decode_sym), "peek" = the
#: staged-prefix-table arithmetic decode (_dh_decode_sym_peek).
#: Module-level so the r14 A/B (scripts/dh_walk_ab_r14.py) can flip
#: it between plan builds. MEASURED (SCALING_r14.md §2, same-session
#: interleaved at sf0.1, hashes identical): fold 27.2 s vs peek
#: 28.2 s — the second negative result on this line (r13's
#: bit-reversal peek lost 1.6x), so "fold" stays the default and the
#: per-symbol-walk optimization line is closed.
DH_SYM_IMPL = "fold"


def _kraft_ok(counts, maxbits: int):
    """No over-subscription: left_0 = 1, left_l = left_{l-1}·2 −
    counts[l] must never go negative (incomplete codes — left > 0 at
    the end — are accepted; RFC 1951 permits e.g. the one-distance-
    code-in-one-bit case and the walk itself rejects unused space)."""
    folded = F.aggregate(
        F.sequence(F.lit(1), F.lit(maxbits)),
        F.struct(
            F.lit(1).cast("bigint").alias("left"),
            F.lit(True).alias("ok"),
        ),
        lambda acc, l: _let(
            acc["left"] * 2
            - F.coalesce(
                F.try_element_at(counts, l.cast("int")), F.lit(0)
            ).cast("bigint"),
            lambda left2: F.struct(
                left2.alias("left"),
                (acc["ok"] & (left2 >= 0)).alias("ok"),
            ),
        ),
    )
    return folded["ok"]


def _canon_tables(lens, maxbits: int):
    """(counts, syms) for a code-lengths array: counts[l] = #codes of
    length l (1-indexed array of ``maxbits``); syms = symbols with a
    code, sorted canonically by (length, symbol)."""
    counts = F.transform(
        F.sequence(F.lit(1), F.lit(maxbits)),
        lambda l: F.size(F.filter(lens, lambda x: x == l)),
    )
    # try_element_at + a 1-based walk: an EMPTY lens array makes
    # sequence(0, size-1) = sequence(0, -1) = [0, -1] (Spark infers a
    # descending step), and plain element_at then throws under ANSI —
    # the eager-evaluation trap; null lens drop out of the filter
    pairs = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(lens) - 1, F.lit(0))),
            lambda s: F.struct(
                F.try_element_at(lens, (s + 1).cast("int")).alias("len"),
                s.alias("sym"),
            ),
        ),
        lambda e: (e["len"] >= 1) & (e["len"] <= maxbits),
    )
    syms = F.transform(F.array_sort(pairs), lambda e: e["sym"])
    return counts, syms


def _png_dh_header(p, cw):
    """Stage 2-DH-a: closed-form header parse. Struct ``(hlit, hdist,
    bp0, cl_counts, cl_syms, ok)`` — ``bp0`` is the bit position of
    the first code-length SYMBOL (after the 3-bit block header, the
    5+5+4 counts and the (HCLEN+4)·3-bit code-length-code lengths)."""
    zs = cw["zs"]
    hlit = _fh_val(p, zs, F.lit(3).cast("bigint"), F.lit(5)).cast("int")
    hdist = _fh_val(p, zs, F.lit(8).cast("bigint"), F.lit(5)).cast("int")
    hclen = _fh_val(p, zs, F.lit(13).cast("bigint"), F.lit(4)).cast("int")
    inv = F.array(*[F.lit(v) for v in _DH_CL_INV])
    cl_lens = F.transform(
        F.sequence(F.lit(0), F.lit(18)),
        lambda s: _let(
            F.element_at(inv, s + 1),
            lambda pos: F.when(
                pos < hclen + 4,
                _fh_val(
                    p,
                    zs,
                    (F.lit(17) + pos * 3).cast("bigint"),
                    F.lit(3),
                ).cast("int"),
            ).otherwise(F.lit(0)),
        ),
    )
    counts, syms = _canon_tables(cl_lens, 7)
    return F.struct(
        hlit.alias("hlit"),
        hdist.alias("hdist"),
        (F.lit(17) + (hclen + 4).cast("bigint") * 3).alias("bp0"),
        counts.alias("cl_counts"),
        syms.alias("cl_syms"),
        (_kraft_ok(counts, 7) & (F.size(syms) >= 1)).alias("ok"),
    )


#: emitted-lengths cap: HLIT+257 ≤ 288 lit/len + HDIST+1 ≤ 32 dist
_DH_MAX_LENS = 320


def _png_dh_lens_walk(p, cw, hdr):
    """Stage 2-DH-b: decode the HLIT+257+HDIST+1 code lengths. One
    fold step per CODE-LENGTH SYMBOL (each emits ≥ 1 length, so ≤
    ``_DH_MAX_LENS`` steps); each step is a ≤7-bit count walk over
    the code-length alphabet plus the 16 (repeat prev ×3-6) / 17
    (zeros ×3-10) / 18 (zeros ×11-138) repeat semantics. Struct
    ``(bp, lens, ok, done)``; overshooting repeats, a 16 with no
    previous length, or an invalid code flip ``ok``."""
    zs = cw["zs"]
    target = (hdr["hlit"] + 257 + hdr["hdist"] + 1).cast("int")
    init = F.struct(
        hdr["bp0"].cast("bigint").alias("bp"),
        F.array().cast("array<int>").alias("lens"),
        hdr["ok"].alias("ok"),
        (~hdr["ok"]).alias("done"),
    )

    def step(acc, _):
        bp, lens = acc["bp"], acc["lens"]
        fail = F.struct(
            bp.alias("bp"), lens.alias("lens"),
            F.lit(False).alias("ok"), F.lit(True).alias("done"),
        )

        def with_sym(cs):
            sym, nb = cs["sym"], cs["nb"]

            def emit(appended, used_bits):
                return _let(
                    appended,
                    lambda lens2: F.struct(
                        (bp + nb + used_bits).alias("bp"),
                        lens2.alias("lens"),
                        acc["ok"].alias("ok"),
                        (F.size(lens2) >= target).alias("done"),
                    ),
                )

            rep16 = (
                F.lit(3)
                + _fh_val(p, zs, bp + nb, F.lit(2)).cast("int")
            )
            rep17 = (
                F.lit(3)
                + _fh_val(p, zs, bp + nb, F.lit(3)).cast("int")
            )
            rep18 = (
                F.lit(11)
                + _fh_val(p, zs, bp + nb, F.lit(7)).cast("int")
            )
            return (
                F.when(sym.isNull(), fail)
                .when(
                    sym <= 15,
                    emit(
                        F.concat(lens, F.array(sym)),
                        F.lit(0).cast("bigint"),
                    ),
                )
                .when(
                    (sym == 16) & (F.size(lens) >= 1),
                    emit(
                        F.concat(
                            lens,
                            F.array_repeat(
                                F.try_element_at(lens, F.lit(-1)), rep16
                            ),
                        ),
                        F.lit(2).cast("bigint"),
                    ),
                )
                .when(
                    sym == 17,
                    emit(
                        F.concat(
                            lens, F.array_repeat(F.lit(0), rep17)
                        ),
                        F.lit(3).cast("bigint"),
                    ),
                )
                .when(
                    sym == 18,
                    emit(
                        F.concat(
                            lens, F.array_repeat(F.lit(0), rep18)
                        ),
                        F.lit(7).cast("bigint"),
                    ),
                )
                .otherwise(fail)
            )

        return F.when(acc["done"], acc).otherwise(
            _let(
                _dh_decode_sym(
                    p, zs, bp, hdr["cl_counts"], hdr["cl_syms"], 7
                ),
                with_sym,
            )
        )

    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(_DH_MAX_LENS)), init, step
    )
    # exact-target check: a final repeat overshooting HLIT+257+HDIST+1
    # is an RFC error (size > target), as is running out of steps
    # (size < target)
    return F.struct(
        walked["bp"].alias("bp"),
        walked["lens"].alias("lens"),
        (
            walked["ok"]
            & walked["done"]
            & (F.size(walked["lens"]) == target)
        ).alias("ok"),
        walked["done"].alias("done"),
    )


def _png_dh_tabs(hdr, lw):
    """Stage 2-DH-c: split the decoded lengths into the lit/len and
    distance alphabets and derive each side's count/canonical-symbol
    tables (+ Kraft checks; the lit/len code must assign EOB a
    code). Struct ``(ll_counts, ll_syms, d_counts, d_syms, bp0,
    ok)`` — ``bp0`` = first DATA symbol's bit position."""
    n_lit = (hdr["hlit"] + 257).cast("int")
    n_dist = (hdr["hdist"] + 1).cast("int")
    ll_lens = F.slice(lw["lens"], 1, n_lit)
    d_lens = F.slice(lw["lens"], n_lit + 1, n_dist)
    ll_counts, ll_syms = _canon_tables(ll_lens, 15)
    d_counts, d_syms = _canon_tables(d_lens, 15)
    # r14: staged prefix tables for the peek symbol decode (one
    # 15-step fold per alphabet per IMAGE — amortized over raw_n
    # symbol decodes). Gated: the A/B measured the peek walk a WASH-
    # to-slightly-worse (27.2 vs 28.2 s, SCALING_r14.md §2), so the
    # default "fold" plan carries null literals here, not the folds.
    if DH_SYM_IMPL == "peek":
        ll_lims, ll_cums = _dh_prefix_tables(ll_counts, 15)
        d_lims, d_cums = _dh_prefix_tables(d_counts, 15)
    else:
        ll_lims = ll_cums = d_lims = d_cums = F.lit(None).cast(
            "array<bigint>"
        )
    eob_coded = F.coalesce(
        F.try_element_at(ll_lens, F.lit(257)), F.lit(0)
    ) > 0
    return F.struct(
        ll_counts.alias("ll_counts"),
        ll_syms.alias("ll_syms"),
        d_counts.alias("d_counts"),
        d_syms.alias("d_syms"),
        ll_lims.alias("ll_lims"),
        ll_cums.alias("ll_cums"),
        d_lims.alias("d_lims"),
        d_cums.alias("d_cums"),
        lw["bp"].alias("bp0"),
        (
            lw["ok"]
            & _kraft_ok(ll_counts, 15)
            & _kraft_ok(d_counts, 15)
            & eob_coded
        ).alias("ok"),
    )


def _png_dyn_walk(p, cw, raw_n, tabs):
    """Stage 2-DH-d: the symbol walk — ``_png_fixed_walk``'s exact
    fold structure (one step per symbol, cyclic-repetition LZ77
    copies, fail-and-stop semantics) with the fixed-table peek
    replaced by two count walks: lit/len via ``(ll_counts,
    ll_syms)``, then, for length codes, the distance symbol via
    ``(d_counts, d_syms)`` instead of fixed 5 raw bits. Struct
    ``(bp, out, done, ok)``."""
    zs = cw["zs"]
    lenb = F.array(*[F.lit(v) for v in _FH_LEN_BASE])
    lene = F.array(*[F.lit(v) for v in _FH_LEN_EXTRA])
    distb = F.array(*[F.lit(v) for v in _FH_DIST_BASE])
    diste = F.array(*[F.lit(v) for v in _FH_DIST_EXTRA])
    init = F.struct(
        tabs["bp0"].cast("bigint").alias("bp"),
        F.array().cast("array<int>").alias("out"),
        (~tabs["ok"]).alias("done"),
        tabs["ok"].alias("ok"),
    )

    def step(acc, _):
        bp = acc["bp"]
        out = acc["out"]

        def with_sym(hdr):
            sym, nb = hdr["sym"], hdr["nb"]
            osz = F.size(out).cast("bigint")
            fail = F.struct(
                bp.alias("bp"), out.alias("out"),
                F.lit(True).alias("done"), F.lit(False).alias("ok"),
            )

            def with_len(lp):
                L, bp2 = lp["L"], lp["bp2"]

                def with_dist(dp):
                    D, bp3, dsym = dp["D"], dp["bp3"], dp["dsym"]
                    dist_ok = (
                        dsym.isNotNull() & (dsym <= 29)
                        & (D >= 1) & (D <= osz)
                        & (L >= 3) & (L <= 258)
                    )
                    copied = F.transform(
                        F.sequence(F.lit(0).cast("bigint"), L - 1),
                        lambda j: F.try_element_at(
                            out, (osz - D + F.pmod(j, D) + 1).cast("int")
                        ),
                    )
                    return F.when(
                        dist_ok,
                        F.struct(
                            bp3.alias("bp"),
                            F.concat(out, copied).alias("out"),
                            F.lit(False).alias("done"),
                            acc["ok"].alias("ok"),
                        ),
                    ).otherwise(fail)

                def with_dsym(ds):
                    dsym, dnb = ds["sym"], ds["nb"]
                    dci = F.greatest(
                        F.least(F.coalesce(dsym, F.lit(0)), F.lit(29)),
                        F.lit(0),
                    ).cast("int")
                    dext = F.element_at(diste, dci + 1)
                    return _let(
                        F.struct(
                            dsym.alias("dsym"),
                            (
                                F.element_at(distb, dci + 1).cast("bigint")
                                + _fh_val(p, zs, bp2 + dnb, dext)
                            ).alias("D"),
                            (bp2 + dnb + dext.cast("bigint")).alias(
                                "bp3"
                            ),
                        ),
                        with_dist,
                    )

                return _let(
                    _dh_decode_sym_peek(
                        p, zs, bp2, tabs["d_lims"], tabs["d_cums"],
                        tabs["d_syms"], 15,
                    )
                    if DH_SYM_IMPL == "peek"
                    else _dh_decode_sym(
                        p, zs, bp2, tabs["d_counts"], tabs["d_syms"], 15
                    ),
                    with_dsym,
                )

            li = F.greatest(
                F.least(sym - 257, F.lit(28)), F.lit(0)
            ).cast("int")
            lext = F.element_at(lene, li + 1)
            len_branch = _let(
                F.struct(
                    (
                        F.element_at(lenb, li + 1).cast("bigint")
                        + _fh_val(p, zs, bp + nb, lext)
                    ).alias("L"),
                    (bp + nb + lext.cast("bigint")).alias("bp2"),
                ),
                with_len,
            )
            return (
                F.when(sym.isNull() | (osz > raw_n), fail)
                .when(
                    sym == 256,
                    F.struct(
                        (bp + nb).alias("bp"), out.alias("out"),
                        F.lit(True).alias("done"), acc["ok"].alias("ok"),
                    ),
                )
                .when(
                    sym < 256,
                    F.struct(
                        (bp + nb).alias("bp"),
                        F.concat(
                            out, F.array(sym.cast("int"))
                        ).alias("out"),
                        F.lit(False).alias("done"),
                        acc["ok"].alias("ok"),
                    ),
                )
                .when((sym >= 257) & (sym <= 285), len_branch)
                .otherwise(fail)
            )

        new = _let(
            _dh_decode_sym_peek(
                p, zs, bp, tabs["ll_lims"], tabs["ll_cums"],
                tabs["ll_syms"], 15,
            )
            if DH_SYM_IMPL == "peek"
            else _dh_decode_sym(
                p, zs, bp, tabs["ll_counts"], tabs["ll_syms"], 15
            ),
            with_sym,
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(raw_n + 1, F.lit(1))), init, step
    )


def _png_gray_decode_dh(p, cw, dw, recon=None, plte=None, depth16=False):
    """(ok, w, h, pixels) for a grayscale-8 PNG whose zlib stream is
    ONE final DYNAMIC-HUFFMAN deflate block (BTYPE=10) — the DH
    sibling of ``_png_gray_decode_fh``, consuming the staged symbol
    walk ``dw`` (``_png_dyn_walk``; the header/lens/tables stages'
    validity is already folded into ``dw.ok`` via the walk's init).
    Envelope identical to the FH path: IHDR + CRC, single IDAT, zlib
    header, Adler-32 over the DECOMPRESSED bytes, per-scanline
    filter-0, exact output length, walk ends on EOB inside the bit
    budget. Scope: raw ≤ ``_PNG_FH_MAX_RAW``; multi-block and
    non-final dynamic streams null out (documented)."""
    w = _be32(p, 17)
    h = _be32(p, 21)
    ctype = _u8(p, 26)
    # r14 depth16: bytes/pixel doubles at bit depth 16 (big-endian
    # samples; the reader takes each sample's FIRST byte = MSB, the
    # standard 8-bit downsample); spb None keeps the 8-bit plans
    # byte-identical when the flag is off
    if depth16:
        spb = (
            F.when(_u8(p, 25) == 16, F.lit(2))
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        bpp = _png_bpp(ctype) * spb
    else:
        spb = None
        bpp = _png_bpp(ctype)
    _cap = F.lit(_PNG_FH_MAX_RAW).cast("bigint")
    _raw0 = h.cast("bigint") * (w.cast("bigint") * bpp + 1)
    _sane = _raw0.isNotNull() & (_raw0 > 0) & (_raw0 <= _cap)
    one = F.lit(1).cast("bigint")
    wb = F.when(_sane, w.cast("bigint")).otherwise(one)
    hb = F.when(_sane, h.cast("bigint")).otherwise(one)
    raw_n = F.when(_sane, _raw0).otherwise(F.lit(0).cast("bigint"))
    ihdr_ok = (
        _sane
        & (F.length(p) >= 46)
        & (F.hex(F.substring(p, 1, 8)) == _PNG_SIG)
        & (_be32(p, 9) == 13)
        & _sig(p, 13, "IHDR")
        & (
            (_u8(p, 25) == 8)
            if not depth16
            else (
                _u8(p, 25).isin(8, 16)
                # palette + 16-bit is invalid per spec
                & ~((ctype == 3) & (_u8(p, 25) == 16))
            )
        )
        & (
            ctype.isin(0, 2, 4, 6)  # 8-bit non-palette matrix (r14)
            if plte is None
            # r14 opt-in png_palette: +3 (paletted); PLTE
            # validity/index bounds enforced by the reader
            else ctype.isin(0, 2, 3, 4, 6)
        )
        & (_u8(p, 27) == 0)
        & (_u8(p, 28) == 0)
        & (_u8(p, 29) == 0)
        & (F.crc32(F.substring(p, 13, 17)) == _be32u(p, 30))
        & (w > 0)
        & (h > 0)
    )
    zs, zl = cw["zs"], cw["zl"]
    chunks_ok = cw["done"] & cw["ok"] & (cw["n_idat"] == 1) & (zl >= 11)
    cmf = _u8(p, zs)
    flg = _u8(p, zs + 1)
    zhdr_ok = (
        (F.pmod(cmf, F.lit(16)) == 8)
        & (F.pmod(cmf * 256 + flg, F.lit(31)) == 0)
        & (F.pmod(F.floor(flg / 32).cast("int"), F.lit(2)) == 0)
    )
    # BFINAL=1 + BTYPE=10: low three bits of the first deflate byte
    btype_dh = F.pmod(_u8(p, zs + 2), F.lit(8)) == 5
    out = dw["out"]
    walk_ok = (
        dw["done"]
        & dw["ok"]
        & (F.size(out).cast("bigint") == raw_n)
        & (dw["bp"] <= (zl - 6) * 8)

    )

    def oraw(j):  # byte j (1-based) of the decompressed stream
        return F.try_element_at(out, j.cast("int"))

    s1 = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + oraw(j),
    )
    sw = F.aggregate(
        F.sequence(F.lit(1), raw_n),
        F.lit(0).cast("bigint"),
        lambda a, j: a + j.cast("bigint") * oraw(j),
    )
    adler_ok = (
        F.pmod(raw_n + (raw_n + 1) * s1 - sw, F.lit(65521)) * 65536
        + F.pmod(F.lit(1) + s1, F.lit(65521))
    ) == _be32u(p, zs + zl - 4)
    filters_ok, png_byte = _png_pixel_reader(
        oraw, recon, wb, hb, bpp, ctype, p=p, plte=plte, spb=spb
    )
    pixels = F.transform(F.sequence(F.lit(0), wb * hb * 3 - 1), png_byte)
    ok = (
        ihdr_ok & chunks_ok & zhdr_ok & btype_dh & walk_ok & adler_ok
        & filters_ok
    )
    return ok, w, h, pixels


def _dh_header_bits() -> list:
    """The CONSTANT header+code-lengths bit prefix of
    ``encode_png_dyn``'s block (329 bits, stream order): BFINAL=1,
    BTYPE=10, HLIT=0 (257 lit/len codes), HDIST=0 (1 distance code),
    HCLEN=14, the 18 3-bit code-length-code lengths (only syms 9 and
    1 coded, both length 1 → canonical CL code: "1"→0, "9"→1), then
    the 258 CL symbols: 256ד9" + EOB length "1" + one distance
    length "1". The resulting lit/len table is COMPLETE by Kraft
    (256/512 + 1/2 = 1): EOB = 1-bit code 0, literal b = 9-bit code
    256+b; the single 1-bit distance code is never used (all
    literals) — the RFC-sanctioned incomplete-distance case. zlib
    round-trips the stream (pinned in tests)."""
    bits = [1, 0, 1]            # BFINAL=1, BTYPE=2 LSB-first
    bits += [0] * 5             # HLIT = 0
    bits += [0] * 5             # HDIST = 0
    bits += [0, 1, 1, 1]        # HCLEN = 14 LSB-first
    for i in range(18):         # CL-code lengths in transmit order
        v = 1 if i in (_DH_CL_INV[9], _DH_CL_INV[1]) else 0
        bits += [(v >> s) & 1 for s in range(3)]
    bits += [1] * 256 + [0] + [0]   # 256x"9", EOB "1", dist "1"
    return bits


def encode_png_dyn(
    media_id,
    w,
    h,
    rgb: bool = False,
    filtered: bool = False,
    color_type: int = None,
    depth16: bool = False,
) -> Column:
    """A spec-compliant grayscale-8 PNG whose zlib stream is ONE
    final DYNAMIC-HUFFMAN deflate block (RFC 1951 §3.2.7) — the
    encode twin of the r13 BTYPE=10 decode path, sharing
    ``encode_png``'s pixel formula and real CRC-32/Adler-32. The
    transmitted tables are the fixed flat assignment of
    ``_dh_header_bits`` (a legal, complete dynamic code — the
    simplest one that still exercises the full header → CL-code →
    table-build → count-walk pipeline on the decode side); literal
    byte b = 9 bits of ``b + 0x100`` MSB-first, EOB = one 0-bit, bits
    packed LSB-first into bytes. stdlib ``zlib.decompress`` accepts
    the stream byte-for-byte (pinned in tests).

    ``rgb=True`` (r13): color type 2, stride 3w+1, flat RGB byte k =
    ``pixel_value(media_id, k)`` — DH + RGB is the real-world PNG
    shape (what zlib-backed encoders emit for truecolor images).

    ``filtered=True`` (r14): scanlines carry filters
    ``(r + media_id) mod 5`` with closed-form filtered data bytes
    (``_png_raw_byte_fn``) — DH + adaptive filters is exactly what
    libpng emits; the decoded pixels stay the one closed form."""
    wb = w.cast("bigint")
    hb = h.cast("bigint")
    ct = color_type if color_type is not None else (2 if rgb else 0)
    if ct not in (0, 2, 3, 4, 6):
        raise ValueError(f"encode_png_dyn: unsupported color type {ct}")
    if depth16 and ct == 3:
        raise ValueError("encode_png_dyn: 16-bit palette is invalid")
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct] * (2 if depth16 else 1)
    raw_n = hb * (wb * bpp + 1)
    if ct == 3:
        value_fn = _png_index_value
    elif depth16:
        value_fn = _png_value16_fn(media_id)
    else:
        value_fn = None
    raw_byte = _png_raw_byte_fn(
        media_id, wb, bpp, filtered, value_fn=value_fn
    )
    plte = _png_plte_hex(media_id) if ct == 3 else None

    def lit_bits(b):
        # 9 bits of b+256, MSB-first
        return F.transform(
            F.sequence(F.lit(8), F.lit(0), F.lit(-1)),
            lambda s: F.pmod(
                F.floor((b + 256) / _pow2(s)).cast("int"), F.lit(2)
            ),
        )

    def make_bits(rb):
        return F.concat(
            F.array(*[F.lit(b) for b in _dh_header_bits()]),
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), raw_n),
                    lambda j: lit_bits(rb(j)),
                )
            ),
            F.array(F.lit(0)),  # EOB (1-bit code 0)
        )

    def pack(bs):
        nbytes = F.floor((F.size(bs) + 7) / 8).cast("bigint")
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), nbytes - 1),
                lambda k: _byte_hex(
                    F.aggregate(
                        F.sequence(F.lit(0), F.lit(7)),
                        F.lit(0),
                        lambda a, i: a
                        + F.coalesce(
                            F.try_element_at(
                                bs, (k * 8 + i + 1).cast("int")
                            ),
                            F.lit(0),
                        )
                        * _pow2(i),
                    )
                ),
            ),
            "",
        )

    ihdr_td = F.concat(
        F.lit("49484452"),
        _be_hex(w, 4),
        _be_hex(h, 4),
        F.lit(
            (("10" if depth16 else "08") + "%02X" % ct)
            + "00" + "00" + "00"
        ),
    )
    ihdr = F.concat(
        F.lit("0000000D"),
        ihdr_td,
        _be_hex(F.crc32(F.unhex(ihdr_td)), 4),
    )

    def assemble(rb):
        zdata_hex = F.element_at(
            F.transform(F.array(make_bits(rb)), lambda bs: pack(bs)), 1
        )
        s1 = F.aggregate(
            F.sequence(F.lit(1), raw_n),
            F.lit(0).cast("bigint"),
            lambda a, j: a + rb(j),
        )
        sw = F.aggregate(
            F.sequence(F.lit(1), raw_n),
            F.lit(0).cast("bigint"),
            lambda a, j: a + j.cast("bigint") * rb(j),
        )
        adler_a = F.pmod(F.lit(1) + s1, F.lit(65521))
        adler_b = F.pmod(raw_n + (raw_n + 1) * s1 - sw, F.lit(65521))
        zstream = F.concat(
            F.lit("7801"),
            zdata_hex,
            _be_hex(adler_b * 65536 + adler_a, 4),
        )
        idat_td = F.concat(F.lit("49444154"), zstream)
        idat = F.concat(
            # chunk length = zlib bytes: hex length / 2
            _be_hex((F.length(zstream) / 2).cast("bigint"), 4),
            idat_td,
            _be_hex(F.crc32(F.unhex(idat_td)), 4),
        )
        iend = F.lit("00000000" + "49454E44" + "AE426082")
        if ct == 3:
            return F.concat(
                F.lit("89504E470D0A1A0A"), ihdr, plte, idat, iend
            )
        return F.concat(F.lit("89504E470D0A1A0A"), ihdr, idat, iend)

    if filtered:
        # same staging as encode_png: the filtered raw-byte tree is
        # referenced three times (bit emission + both Adler sums) —
        # bind the stream array once through _let (SCALING_r14.md §4)
        arr = F.transform(F.sequence(F.lit(1), raw_n), raw_byte)
        png_hex = _let(
            arr,
            lambda a: assemble(
                lambda j: F.try_element_at(a, j.cast("int"))
            ),
        )
    else:
        png_hex = assemble(raw_byte)
    # r14 advice: the decode paths cap raw at _PNG_FH_MAX_RAW, so an
    # oversize fixture would silently emit a PNG every decoder nulls
    # out — fail the job loudly instead, matching encode_png's
    # caller-error convention (fixture encoders take caller literals).
    return F.when(
        raw_n <= F.lit(_PNG_FH_MAX_RAW),
        F.unhex(png_hex),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("encode_png_dyn: raw scanline stream h*(w*bpp+1) = "),
                raw_n.cast("string"),
                F.lit(
                    " bytes exceeds the decode-side bound "
                    f"({_PNG_FH_MAX_RAW})"
                ),
            )
        ).cast("binary")
    )


def _inflate_dyn_py(data: bytes):
    """Hand-rolled dynamic-Huffman inflate for ONE final BTYPE=10
    block — the Python twin of the Spark ``_png_dh_*`` stages (the
    same count-based canonical walk, the same envelope and caps, the
    r10 twin-parity rule: both paths accept and reject identically).
    ``data`` is the deflate byte stream (zlib header and Adler
    stripped). Returns ``(raw_bytes, end_bit_pos)``; raises on any
    malformed header, code, length, or distance."""
    bitpos = 3  # past BFINAL + BTYPE (caller checked them)

    def bit(i):
        if i // 8 >= len(data):
            raise ValueError("bit read past deflate stream")
        return (data[i // 8] >> (i % 8)) & 1

    def val(n):
        nonlocal bitpos
        v = 0
        for j in range(n):
            v |= bit(bitpos) << j
            bitpos += 1
        return v

    def canon(lens, maxbits):
        counts = [0] * (maxbits + 1)
        for ln in lens:
            if ln:
                counts[ln] += 1
        left = 1
        for ln in range(1, maxbits + 1):
            left = left * 2 - counts[ln]
            if left < 0:
                raise ValueError("over-subscribed code")
        syms = [s for _, s in sorted(
            (ln, s) for s, ln in enumerate(lens) if ln
        )]
        return counts, syms

    def decode(counts, syms, maxbits):
        nonlocal bitpos
        code = first = index = 0
        for ln in range(1, maxbits + 1):
            code = code * 2 + bit(bitpos)
            bitpos += 1
            cnt = counts[ln]
            if code - first < cnt:
                return syms[index + (code - first)]
            index += cnt
            first = (first + cnt) * 2
            code = code  # shifted next round
        raise ValueError("invalid canonical code")

    hlit = val(5) + 257
    hdist = val(5) + 1
    hclen = val(4) + 4
    cl_lens = [0] * 19
    for i in range(hclen):
        cl_lens[_DH_CL_ORDER[i]] = val(3)
    cl_counts, cl_syms = canon(cl_lens, 7)
    if not cl_syms:
        raise ValueError("empty code-length code")
    lens = []
    while len(lens) < hlit + hdist:
        sym = decode(cl_counts, cl_syms, 7)
        if sym <= 15:
            lens.append(sym)
        elif sym == 16:
            if not lens:
                raise ValueError("repeat with no previous length")
            lens += [lens[-1]] * (3 + val(2))
        elif sym == 17:
            lens += [0] * (3 + val(3))
        else:  # 18
            lens += [0] * (11 + val(7))
    if len(lens) != hlit + hdist:
        raise ValueError("code-length repeat overshoots the count")
    ll_lens, d_lens = lens[:hlit], lens[hlit:]
    if hlit < 257 or not ll_lens[256]:
        raise ValueError("lit/len code assigns no EOB")
    ll = canon(ll_lens, 15)
    dd = canon(d_lens, 15)

    out = bytearray()
    while True:
        sym = decode(*ll, 15)
        if sym == 256:
            return bytes(out), bitpos
        if sym < 256:
            out.append(sym)
        elif sym <= 285:
            length = (
                _FH_LEN_BASE[sym - 257] + val(_FH_LEN_EXTRA[sym - 257])
            )
            dc = decode(*dd, 15)
            if dc > 29:
                raise ValueError("invalid distance symbol")
            dist = _FH_DIST_BASE[dc] + val(_FH_DIST_EXTRA[dc])
            if dist > len(out):
                raise ValueError("distance beyond decoded window")
            for _ in range(length):  # overlap-safe byte-by-byte copy
                out.append(out[len(out) - dist])
        else:
            raise ValueError("invalid length symbol")
        if len(out) > _PNG_FH_MAX_RAW:
            raise ValueError("decompressed output beyond bound")


# ---------------------------------------------------------------------------
# GIF (LZW) pixel decode — r14. A second REAL compressed container in
# pure Spark expressions, reusing the PNG machinery's patterns: bounded
# CRC-free block walks (GIF has no chunk CRCs), a sub-block table like
# the stored-deflate block table, one bounded fold per LZW CODE, and
# the paletted lookup (the global color table is read straight out of
# the payload, every decoded index bounds-checked).
#
# LZW dictionary entries all point INTO THE OUTPUT STREAM: when code k
# is decoded its expansion is appended at out[cur..), and the new
# dictionary entry is (prev_start, prev_len + 1) — contiguous in `out`
# because prev's expansion was the immediately preceding append. So
# the walk state needs no string table, only (start, len) pairs — the
# same output-window copy semantics as the deflate LZ77 walk.
#
# Code-width convention (derived, and what giflib/Pillow implement):
# before reading a data code the largest possible value is the
# decoder's next_free (the KwKwK case), so after ADDING an entry the
# width bumps when next_free == 2^width (max 12); at 4096 the table
# freezes until a CLEAR (deferred-clear tolerated). The famous 1x1
# GIF89a spacer pins the convention against external bytes in tests.
#
# Envelope (documented; everything else nulls out): GIF87a/89a, global
# color table present, ONE image covering the full screen at (0, 0),
# no local color table, no interlace, LZW data in <=
# _GIF_MAX_SUBBLOCKS sub-blocks, npix <= _GIF_MAX_PIXELS, trailer
# immediately after the image data. Extensions (graphic control,
# comment, application) are SKIPPED, matching real-world files.
# ---------------------------------------------------------------------------

_GIF_MAX_BLOCKS = 8       #: extension/descriptor walk bound
_GIF_MAX_SUBBLOCKS = 16   #: LZW data sub-blocks (255 B each)
_GIF_MAX_PIXELS = 4096    #: npix bound for the expression walk


def _lzw_decode_py(data: bytes, mcs: int, npix: int):
    """GIF LZW decoder (Python twin of the Spark ``_gif_lzw_walk``):
    returns the index list; raises on anything the Spark walk would
    flip ``ok`` for. Codes are read LSB-first; see the module-section
    note for the width convention."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    total_bits = 8 * len(data)
    bp, width = 0, mcs + 1
    out = []
    tab = []                 # (start, len) into out, per generation
    pstart, plen = 0, 0
    nf = eoi + 1
    for _ in range(2 * npix + 8 + 2):
        if bp + width > total_bits:
            raise ValueError("LZW stream ran out of bits")
        code = 0
        for t in range(width):
            j = bp + t
            code += ((data[j // 8] >> (j % 8)) & 1) << t
        bp += width
        if code == clear:
            tab, pstart, plen = [], 0, 0
            nf, width = eoi + 1, mcs + 1
            continue
        if code == eoi:
            if len(out) != npix:
                raise ValueError(
                    f"EOI after {len(out)} of {npix} pixels"
                )
            return out
        cur = len(out)
        if code < clear:
            out.append(code)
            elen = 1
        elif eoi + 1 <= code < nf:
            s, l = tab[code - eoi - 1]
            out.extend(out[s:s + l])
            elen = l
        elif code == nf and plen > 0:
            out.extend(out[pstart:pstart + plen])
            out.append(out[pstart])
            elen = plen + 1
        else:
            raise ValueError(f"invalid LZW code {code} (next={nf})")
        if len(out) > npix:
            raise ValueError("LZW output beyond pixel count")
        if plen > 0 and nf < 4096:
            tab.append((pstart, plen + 1))
            nf += 1
            if nf == (1 << width) and width < 12:
                width += 1
        pstart, plen = cur, elen
    raise ValueError("no EOI within the code budget")


def _lzw_compress_py(indices, mcs: int):
    """Real GIF LZW compressor (driver-side: precomputes the
    ``encode_gif_lzw`` code streams per (w, h); also the tests'
    reference). Emits CLEAR first and EOI last. The emission WIDTH
    mirrors the DECODER's table state, not the encoder's: the decoder
    adds an entry after EVERY data code except the first after a
    CLEAR (including the encoder's final flush, which adds nothing
    encoder-side) — tracking the encoder's own table for the width
    decision desyncs exactly at a power-of-two boundary hit by the
    flush code (caught by the n=19 periodic stream in tests).
    Returns packed bytes (LSB-first)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out_bits = []
    width = mcs + 1
    dec_nf = eoi + 1          # the DECODER's next_free mirror
    first = True              # first data code after CLEAR

    def emit(code, w):
        for t in range(w):
            out_bits.append((code >> t) & 1)

    def emit_data(code):
        nonlocal dec_nf, width, first
        emit(code, width)
        if not first and dec_nf < 4096:
            dec_nf += 1
            if dec_nf == (1 << width) and width < 12:
                width += 1
        first = False

    emit(clear, width)
    tab = {}
    enc_next = eoi + 1        # value assignment counter
    seq = ()
    for sym in indices:
        if not 0 <= sym < clear:
            raise ValueError(f"symbol {sym} outside root range")
        cand = seq + (sym,)
        if len(cand) == 1 or cand in tab:
            seq = cand
            continue
        emit_data(seq[0] if len(seq) == 1 else tab[seq])
        if enc_next < 4096:
            tab[cand] = enc_next
            enc_next += 1
        seq = (sym,)
    if seq:
        emit_data(seq[0] if len(seq) == 1 else tab[seq])
    emit(eoi, width)
    return bytes(
        sum(b << t for t, b in enumerate(out_bits[i:i + 8]))
        for i in range(0, len(out_bits), 8)
    )


def _gif_interlace_pos(r: int, h: int) -> int:
    """Stream row position of DISPLAY row ``r`` in a 4-pass
    interlaced GIF (passes start at rows 0/4/2/1 with strides
    8/8/4/2 — GIF89a spec appendix E); closed form over the three
    pass sizes."""
    c1 = (h + 7) // 8
    c2 = (h + 3) // 8
    c3 = (h + 1) // 4
    if r % 8 == 0:
        return r // 8
    if r % 8 == 4:
        return c1 + (r - 4) // 8
    if r % 4 == 2:
        return c1 + c2 + (r - 2) // 4
    return c1 + c2 + c3 + (r - 1) // 2


def _gif_interlace_disp_row(i: int, h: int) -> int:
    """Inverse of ``_gif_interlace_pos``: the display row carried at
    stream row position ``i`` (encoder side)."""
    c1 = (h + 7) // 8
    c2 = (h + 3) // 8
    c3 = (h + 1) // 4
    if i < c1:
        return 8 * i
    if i < c1 + c2:
        return 8 * (i - c1) + 4
    if i < c1 + c2 + c3:
        return 4 * (i - c1 - c2) + 2
    return 2 * (i - c1 - c2 - c3) + 1


def decode_gif(payload: bytes):
    """Python single-payload twin of the Spark GIF decode: returns
    ``(w, h, rgb_pixels)`` (flattened top-down row-major RGB via the
    global color table) or raises exactly where the Spark path nulls
    out — same envelope, same caps (the r10 twin-parity rule)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    has_gct = bool(flags & 0x80)
    n_entries = (2 << (flags & 7)) if has_gct else 0
    if w <= 0 or h <= 0 or w * h > _GIF_MAX_PIXELS:
        raise ValueError("dims outside the decode envelope")
    gct = payload[13:13 + 3 * n_entries]
    if len(gct) != 3 * n_entries:
        raise ValueError("truncated global color table")
    pos = 13 + 3 * n_entries
    for _ in range(_GIF_MAX_BLOCKS):
        if pos >= len(payload):
            raise ValueError("truncated block stream")
        b = payload[pos]
        if b == 0x2C:
            break
        if b == 0x21:
            pos += 2
            for _ in range(_GIF_MAX_SUBBLOCKS):
                sl = payload[pos]
                pos += 1 + sl
                if sl == 0:
                    break
            else:
                raise ValueError("extension sub-blocks beyond cap")
            continue
        raise ValueError(f"unexpected block 0x{b:02X}")
    else:
        raise ValueError(f"no image descriptor in {_GIF_MAX_BLOCKS} blocks")
    left = int.from_bytes(payload[pos + 1:pos + 3], "little")
    top = int.from_bytes(payload[pos + 3:pos + 5], "little")
    iw = int.from_bytes(payload[pos + 5:pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7:pos + 9], "little")
    iflags = payload[pos + 9]
    if (left, top) != (0, 0) or (iw, ih) != (w, h):
        raise ValueError("image does not cover the screen at (0,0)")
    interlaced = bool(iflags & 0x40)
    # r14: a LOCAL color table (descriptor flag bit 7) follows the
    # descriptor and takes precedence over the global one; a GIF
    # with neither table has no colors to map and rejects
    if iflags & 0x80:
        n_entries = 2 << (iflags & 7)
        gct = payload[pos + 10:pos + 10 + 3 * n_entries]
        if len(gct) != 3 * n_entries:
            raise ValueError("truncated local color table")
        pos += 3 * n_entries
    elif not has_gct:
        raise ValueError("no color table (neither global nor local)")
    mcs = payload[pos + 10]
    if not 2 <= mcs <= 8:
        raise ValueError(f"bad LZW minimum code size {mcs}")
    pos += 11
    data = b""
    for _ in range(_GIF_MAX_SUBBLOCKS):
        if pos >= len(payload):
            raise ValueError("truncated sub-block stream")
        sl = payload[pos]
        if sl == 0:
            pos += 1
            break
        data += payload[pos + 1:pos + 1 + sl]
        if len(payload) < pos + 1 + sl:
            raise ValueError("truncated sub-block")
        pos += 1 + sl
    else:
        raise ValueError(f"no terminator in {_GIF_MAX_SUBBLOCKS} sub-blocks")
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("missing trailer")
    if pos + 1 != len(payload):
        raise ValueError("trailing bytes after trailer")
    indices = _lzw_decode_py(data, mcs, w * h)
    if interlaced:
        # GIF 4-pass interlace: display row r sits at stream row
        # _gif_interlace_pos (closed form, pinned against the
        # pass-enumeration reference in tests)
        indices = [
            indices[_gif_interlace_pos(r, h) * w + x]
            for r in range(h)
            for x in range(w)
        ]
    pixels = []
    for idx in indices:
        if idx >= n_entries:
            raise ValueError(f"index {idx} >= {n_entries} table entries")
        pixels += list(gct[3 * idx:3 * idx + 3])
    return w, h, pixels


def _gif_root_block_hex(npix, root_fn):
    """Hex of one mcs-8 ROOT-CODE LZW image data block (one 255-byte
    sub-block + terminator): CLEAR, then ``root_fn(qi)`` for every
    stream position qi, then EOI — all 9-bit codes LSB-first (the
    uncompressed-GIF shape; next_free stays under the 9-bit boundary
    for npix <= 220, enforced by the callers). Shared by the single-
    image and the animated encoders."""
    nbits = (npix + 2) * 9              # CLEAR + npix roots + EOI
    nbytes = F.floor((nbits + 7) / 8).cast("bigint")

    def code_at(ci):
        return (
            F.when(ci == 0, F.lit(256))
            .when(ci == npix + 1, F.lit(257))
            .otherwise(root_fn(ci - 1))
            .cast("bigint")
        )

    def bit_at(j):
        return F.pmod(
            F.floor(
                code_at(F.floor(j / 9).cast("bigint"))
                / _pow2(F.pmod(j, F.lit(9)))
            ).cast("bigint"),
            F.lit(2),
        )

    def byte_at(k):
        e = F.lit(0).cast("bigint")
        for i in range(8):
            j = k * 8 + i
            e = e + F.when(j < nbits, bit_at(j)).otherwise(
                F.lit(0).cast("bigint")
            ) * (1 << i)
        return _byte_hex(e.cast("int"))

    data = F.array_join(
        F.transform(F.sequence(F.lit(0), nbytes - 1), byte_at), ""
    )
    return F.concat(_byte_hex(nbytes.cast("int")), data, F.lit("00"))


def encode_gif(
    media_id, w, h, interlaced: bool = False, lct: bool = False
) -> Column:
    """A spec-compliant GIF89a whose decoded RGB byte k is
    ``pixel_value(media_id, k)`` — REAL GIF: 256-entry global color
    table (byte t = ``pixel_value(media_id, t)``, the PLTE trick:
    with index(q) = q mod 256 the palette indirection is invisible
    to the closed-form oracle), full-screen image descriptor, and an
    LZW stream in the UNCOMPRESSED-GIF shape real tools emit for
    incompressible data: one CLEAR then every pixel as a 9-bit ROOT
    code then EOI — a legal stream any GIF reader inflates (the
    decoder still builds its dictionary while reading it). One hex
    projection + ``unhex``, like the other media encoders. Envelope:
    npix <= 220 keeps next_free under the 9-bit boundary AND the
    packed stream inside one 255-byte sub-block — oversize dims
    raise (caller-error convention, fixture encoders take caller
    literals)."""
    wb = w.cast("bigint")
    hb = h.cast("bigint")
    npix = wb * hb
    header = F.concat(
        F.lit("474946383961"),          # 'GIF89a'
        _le_hex(w, 2),
        _le_hex(h, 2),
        # r14 lct mode: NO global table (the frame carries its own)
        F.lit("00" if lct else "F7"),
        F.lit("0000"),                  # bg index, aspect
    )
    table_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(767)),
            lambda t: _byte_hex(pixel_value(media_id, t)),
        ),
        "",
    )
    gct = F.lit("") if lct else table_hex
    # descriptor flags: bit 7 local table (size 7 -> 256 entries),
    # bit 6 = 4-pass interlace (r14)
    dflags = (0x80 | 0x07 if lct else 0) | (0x40 if interlaced else 0)
    desc = F.concat(
        F.lit("2C00000000"),            # descriptor, left=top=0
        _le_hex(w, 2),
        _le_hex(h, 2),
        F.lit("%02X" % dflags),
        table_hex if lct else F.lit(""),  # the LOCAL table
        F.lit("08"),                    # LZW minimum code size
    )
    def disp_q(sq):
        # display pixel carried at STREAM position sq (interlaced):
        # the expression twin of _gif_interlace_disp_row
        i = F.floor(sq / wb).cast("bigint")
        x = F.pmod(sq, wb)
        c1 = F.floor((hb + 7) / 8).cast("bigint")
        c2 = F.floor((hb + 3) / 8).cast("bigint")
        c3 = F.floor((hb + 1) / 4).cast("bigint")
        drow = (
            F.when(i < c1, 8 * i)
            .when(i < c1 + c2, 8 * (i - c1) + 4)
            .when(i < c1 + c2 + c3, 4 * (i - c1 - c2) + 2)
            .otherwise(2 * (i - c1 - c2 - c3) + 1)
            .cast("bigint")
        )
        return drow * wb + x

    root_fn = (
        (lambda qi: F.pmod(disp_q(qi), F.lit(256)))
        if interlaced
        else (lambda qi: F.pmod(qi, F.lit(256)))
    )
    body = F.concat(
        header, gct, desc,
        _gif_root_block_hex(npix, root_fn),
        F.lit("3B"),                    # trailer
    )
    return F.when(npix <= F.lit(220), F.unhex(body)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("encode_gif: w*h = "),
                npix.cast("string"),
                F.lit(" exceeds the one-sub-block root-code bound (220)"),
            )
        ).cast("binary")
    )


def encode_gif_lzw(media_id, w, h, interlaced: bool = False) -> Column:
    """A GIF89a with a REAL dictionary-using LZW stream: 4-entry
    global color table (byte t = ``pixel_value(media_id, t)``),
    index(q) = q mod 4 — a periodic stream LZW genuinely compresses,
    so the decoder must exercise table codes (and the width growth
    the stream's length dictates). The code stream depends only on
    (w, h), so it is PRECOMPUTED driver-side by the real compressor
    ``_lzw_compress_py`` and emitted as a literal per supported dim
    pair (w in 2..6, h in 2..5 — the synthesis envelope; anything
    else raises). Decoded RGB byte k = ``pixel_value(media_id,
    3*((k//3) mod 4) + k%3)`` — closed form, palette math included."""
    header = F.concat(
        F.lit("474946383961"),
        _le_hex(w, 2),
        _le_hex(h, 2),
        F.lit("F1"),                    # GCT present, 2^(1+1) entries
        F.lit("0000"),
    )
    gct = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda t: _byte_hex(pixel_value(media_id, t)),
        ),
        "",
    )
    desc = F.concat(
        F.lit("2C00000000"),
        _le_hex(w, 2),
        _le_hex(h, 2),
        F.lit("40" if interlaced else "00"),
        F.lit("02"),                    # LZW minimum code size 2
    )
    blocks = None
    for wi in range(2, 7):
        for hi in range(2, 6):
            if interlaced:
                # stream order carries pass-permuted display pixels
                stream_idx = [
                    (_gif_interlace_disp_row(i, hi) * wi + x) % 4
                    for i in range(hi)
                    for x in range(wi)
                ]
            else:
                stream_idx = [q % 4 for q in range(wi * hi)]
            blob = _lzw_compress_py(stream_idx, 2)
            assert len(blob) <= 255
            sub = "%02X" % len(blob) + blob.hex().upper() + "00"
            cond = (w.cast("int") == wi) & (h.cast("int") == hi)
            blocks = (
                F.when(cond, F.lit(sub))
                if blocks is None
                else blocks.when(cond, F.lit(sub))
            )
    data_block = blocks.otherwise(
        F.raise_error(
            F.concat(
                F.lit("encode_gif_lzw: dims "),
                w.cast("string"), F.lit("x"), h.cast("string"),
                F.lit(" outside the precomputed 2..6 x 2..5 envelope"),
            )
        ).cast("string")
    )
    return F.unhex(F.concat(header, gct, desc, data_block, F.lit("3B")))


def _gif_block_walk(p, pos0):
    """Bounded GIF block walk (stage 1): from ``pos0`` (first byte
    after the global color table, 1-based), skip extension blocks
    (0x21 + label + sub-blocks, each skipped by an inner bounded
    fold) until the image descriptor 0x2C — one struct column
    (pos, ok, done) where ``pos`` is the descriptor's 1-based
    offset. A trailer (0x3B) or any other byte before a descriptor
    flips ok; GIFs with more than ``_GIF_MAX_BLOCKS`` leading blocks
    are outside the envelope (documented)."""
    binit = F.struct(
        pos0.alias("pos"),
        F.lit(True).alias("ok"),
        F.lit(False).alias("done"),
    )

    def skip_ext(q0):
        # end position after an extension's sub-blocks (q0 = first
        # length byte); null-safe: returns struct (q, fin)
        einit = F.struct(
            q0.alias("q"), F.lit(False).alias("fin")
        )

        def estep(eacc, _):
            q = eacc["q"]
            sl = _u8(p, q)
            bad = sl.isNull() | (q + sl >= F.length(p) + 1)
            new = F.when(
                bad | (sl == 0),
                F.struct((q + 1).alias("q"), F.lit(True).alias("fin")),
            ).otherwise(
                F.struct(
                    (q + 1 + sl.cast("bigint")).alias("q"),
                    F.lit(False).alias("fin"),
                )
            )
            return F.when(eacc["fin"], eacc).otherwise(new)

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(_GIF_MAX_SUBBLOCKS)), einit, estep
        )

    def bstep(acc, _):
        pos = acc["pos"]
        b = _u8(p, pos)
        fail = F.struct(
            pos.alias("pos"),
            F.lit(False).alias("ok"),
            F.lit(True).alias("done"),
        )
        ext = _let(
            skip_ext(pos + 2),
            lambda e: F.when(
                e["fin"],
                F.struct(
                    e["q"].alias("pos"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                ),
            ).otherwise(fail),
        )
        new = (
            F.when(b.isNull() | (pos > F.length(p)), fail)
            .when(
                b == 0x2C,
                F.struct(
                    pos.alias("pos"),
                    acc["ok"].alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(b == 0x21, ext)
            .otherwise(fail)
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_GIF_MAX_BLOCKS)), binit, bstep
    )


def _gif_subblock_walk(p, dpos):
    """LZW data sub-block table (stage 2, the GIF sibling of
    ``_png_block_walk``): from ``dpos`` (first length byte), one
    struct column (blocks array<(start, cum, len)>, endpos, total,
    ok, done) — ``endpos`` the 0x00 terminator's offset, ``total``
    the concatenated data byte count. Data byte i (1-based across
    sub-blocks) is then read through the table exactly like the
    stored-deflate reader."""
    sinit = F.struct(
        F.slice(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("start"),
                    F.lit(0).cast("bigint").alias("cum"),
                    F.lit(0).cast("bigint").alias("len"),
                )
            ),
            1,
            0,
        ).alias("blocks"),
        dpos.alias("pos"),
        F.lit(0).cast("bigint").alias("total"),
        F.lit(True).alias("ok"),
        F.lit(False).alias("done"),
    )

    def sstep(acc, _):
        pos = acc["pos"]
        sl = _u8(p, pos).cast("bigint")
        bad = sl.isNull() | (pos + sl > F.length(p))
        fail = F.struct(
            acc["blocks"].alias("blocks"),
            pos.alias("pos"),
            acc["total"].alias("total"),
            F.lit(False).alias("ok"),
            F.lit(True).alias("done"),
        )
        new = (
            F.when(bad, fail)
            .when(
                sl == 0,
                F.struct(
                    acc["blocks"].alias("blocks"),
                    pos.alias("pos"),
                    acc["total"].alias("total"),
                    acc["ok"].alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        acc["blocks"],
                        F.array(
                            F.struct(
                                (pos + 1).alias("start"),
                                acc["total"].alias("cum"),
                                sl.alias("len"),
                            )
                        ),
                    ).alias("blocks"),
                    (pos + 1 + sl).alias("pos"),
                    (acc["total"] + sl).alias("total"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                )
            )
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_GIF_MAX_SUBBLOCKS)), sinit, sstep
    )


def _gif_lzw_walk(p, sb, mcs, npix):
    """The LZW symbol walk (stage 3): one struct column
    (bp, out, tab, ps, pl, nf, wd, done, ok) — ``out`` the decoded
    index stream, ``tab`` the dictionary as (ts, tl) WINDOWS INTO
    ``out`` (see the section note: every entry is (prev_start,
    prev_len + 1), contiguous because prev's expansion was the
    immediately preceding append), ``nf`` the decoder's next_free,
    ``wd`` the current code width. One fold step per CODE, budget
    2·npix + 10 (every data code appends ≥ 1 index; CLEARs beyond
    that budget are outside the envelope). All reads are
    clamp/try-guarded — on garbage the row nulls, never throws (the
    eager-hoisting rule)."""
    clear = _pow2w(mcs)
    total_bits = sb["total"] * 8
    blocks = sb["blocks"]

    def dbyte(i):
        blk = F.try_element_at(
            F.filter(
                blocks,
                lambda b: (i > b["cum"]) & (i <= b["cum"] + b["len"]),
            ),
            F.lit(1),
        )
        return _u8(p, blk["start"] + (i - blk["cum"]) - 1)

    def dbit(j):
        byte = dbyte(F.floor(j / 8).cast("bigint") + 1)
        return F.pmod(
            F.floor(byte / _pow2(F.pmod(j, F.lit(8)))).cast("bigint"),
            F.lit(2),
        )

    ginit = F.struct(
        F.lit(0).cast("bigint").alias("bp"),
        F.slice(F.array(F.lit(0)), 1, 0).alias("out"),
        F.slice(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("ts"),
                    F.lit(0).cast("bigint").alias("tl"),
                )
            ),
            1,
            0,
        ).alias("tab"),
        F.lit(0).cast("bigint").alias("ps"),
        F.lit(0).cast("bigint").alias("pl"),
        (clear + 2).alias("nf"),
        (mcs + 1).cast("int").alias("wd"),
        F.lit(False).alias("done"),
        F.lit(True).alias("ok"),
    )

    def gstep(acc, _):
        bp, out, tab = acc["bp"], acc["out"], acc["tab"]
        ps, pl, nf, wd = acc["ps"], acc["pl"], acc["nf"], acc["wd"]
        fail = F.struct(
            bp.alias("bp"), out.alias("out"), tab.alias("tab"),
            ps.alias("ps"), pl.alias("pl"), nf.alias("nf"),
            wd.alias("wd"),
            F.lit(True).alias("done"), F.lit(False).alias("ok"),
        )
        bits_ok = (bp + wd) <= total_bits
        code = F.aggregate(
            F.sequence(F.lit(0), wd.cast("bigint") - 1),
            F.lit(0).cast("bigint"),
            lambda a, t: a + dbit(bp + t) * _pow2w(t),
        )

        def with_code(c):
            bp2 = bp + wd
            cur = F.size(out).cast("bigint")

            def data_step(out2, elen):
                # shared post-append bookkeeping: output bound, the
                # decoder's entry add (only when a previous expansion
                # exists and the table isn't frozen), width bump when
                # next_free reaches 2^wd, then prev := this expansion
                add = (pl > 0) & (nf < 4096)
                nf2 = F.when(add, nf + 1).otherwise(nf)
                wd2 = F.when(
                    add & (nf2 == _pow2w(wd.cast("bigint"))) & (wd < 12),
                    wd + 1,
                ).otherwise(wd)
                tab2 = F.when(
                    add,
                    F.concat(
                        tab,
                        F.array(
                            F.struct(
                                ps.alias("ts"), (pl + 1).alias("tl")
                            )
                        ),
                    ),
                ).otherwise(tab)
                return F.when(
                    F.size(out2).cast("bigint") > npix, fail
                ).otherwise(
                    F.struct(
                        bp2.alias("bp"), out2.alias("out"),
                        tab2.alias("tab"), cur.alias("ps"),
                        elen.alias("pl"), nf2.alias("nf"),
                        wd2.alias("wd"),
                        F.lit(False).alias("done"),
                        acc["ok"].alias("ok"),
                    )
                )

            root = data_step(
                F.concat(out, F.array(c.cast("int"))),
                F.lit(1).cast("bigint"),
            )
            entry = F.try_element_at(
                tab,
                F.greatest(c - clear - 1, F.lit(1).cast("bigint")).cast(
                    "int"
                ),
            )
            table_branch = _let(
                entry,
                lambda e: data_step(
                    F.concat(
                        out,
                        F.slice(
                            out,
                            F.greatest(
                                e["ts"] + 1, F.lit(1).cast("bigint")
                            ).cast("int"),
                            F.greatest(
                                e["tl"], F.lit(0).cast("bigint")
                            ).cast("int"),
                        ),
                    ),
                    e["tl"],
                ),
            )
            kwkwk = data_step(
                F.concat(
                    out,
                    F.slice(
                        out,
                        F.greatest(
                            ps + 1, F.lit(1).cast("bigint")
                        ).cast("int"),
                        F.greatest(pl, F.lit(0).cast("bigint")).cast(
                            "int"
                        ),
                    ),
                    F.array(
                        F.coalesce(
                            F.try_element_at(
                                out,
                                F.greatest(
                                    ps + 1, F.lit(1).cast("bigint")
                                ).cast("int"),
                            ),
                            F.lit(0),
                        )
                    ),
                ),
                pl + 1,
            )
            return (
                F.when(c.isNull() | ~bits_ok, fail)
                .when(
                    c == clear,
                    F.struct(
                        bp2.alias("bp"), out.alias("out"),
                        F.slice(tab, 1, 0).alias("tab"),
                        F.lit(0).cast("bigint").alias("ps"),
                        F.lit(0).cast("bigint").alias("pl"),
                        (clear + 2).alias("nf"),
                        (mcs + 1).cast("int").alias("wd"),
                        F.lit(False).alias("done"),
                        acc["ok"].alias("ok"),
                    ),
                )
                .when(
                    c == clear + 1,  # EOI
                    F.struct(
                        bp2.alias("bp"), out.alias("out"),
                        tab.alias("tab"), ps.alias("ps"),
                        pl.alias("pl"), nf.alias("nf"), wd.alias("wd"),
                        F.lit(True).alias("done"),
                        (
                            acc["ok"]
                            & (F.size(out).cast("bigint") == npix)
                        ).alias("ok"),
                    ),
                )
                .when(c < clear, root)
                .when((c >= clear + 2) & (c < nf), table_branch)
                .when((c == nf) & (pl > 0), kwkwk)
                .otherwise(fail)
            )

        return F.when(acc["done"], acc).otherwise(
            _let(code, with_code)
        )

    return F.aggregate(
        F.sequence(F.lit(1), npix * 2 + 10), ginit, gstep
    )


def _decode_pixels_gif(media: DataFrame, payload_col: str) -> DataFrame:
    """The GIF-only decode plan (same output contract as the other
    decode branches: media_id, img_format, width, height, pixels).
    Three staged walk columns — ``__gbw`` (extension-skipping block
    walk to the image descriptor), ``__gsb`` (LZW data sub-block
    table), ``__glw`` (the LZW symbol walk, guarded so rows that
    fail the cheap envelope checks never run the fold) — then one
    projection mapping every decoded index through the global color
    table with a bounds check (the paletted-PNG rule: out-of-range
    nulls the row, never reads past the table).

    r14 optimization round: plan assembly is split from the
    expression program (the PNG ``_png_plan_exprs`` pattern) so the
    program — a pure function of ``payload_col`` — is memoized
    across builds; analysis, codegen and execution are untouched."""
    df = media
    for sel in _gif_plan_selects_cached(payload_col):
        df = df.select(*sel)
    return df


@lru_cache(maxsize=8)
def _gif_plan_selects_cached(payload_col: str):
    """Memoized select-stage program for ``_decode_pixels_gif`` —
    the Column trees are immutable, data-independent expression
    handles (same argument as ``_png_plan_exprs_cached``), so repeat
    plan builds skip the py4j construction round trips."""
    return tuple(tuple(sel) for sel in _gif_plan_selects(payload_col))


def _gif_plan_selects(payload_col: str):
    """The ``_decode_pixels_gif`` expression program: an ordered
    list of ``select`` argument tuples applied in sequence to the
    media frame (``"*"`` keeps the caller's columns riding along)."""
    selects = []
    p = F.col(payload_col)
    flags = _u8(p, 11)
    has_gct = F.floor(F.coalesce(flags, F.lit(0)) / 128) == 1
    n_ent_g = F.when(
        has_gct,
        _pow2w(
            (F.pmod(F.coalesce(flags, F.lit(0)), F.lit(8)) + 1).cast(
                "bigint"
            )
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    w = _le16(p, 7)
    h = _le16(p, 9)
    npix = w.cast("bigint") * h.cast("bigint")
    sig_ok = F.coalesce(
        F.hex(F.substring(p, 1, 6)).isin("474946383761", "474946383961"),
        F.lit(False),
    )
    sane = (
        sig_ok
        & npix.isNotNull()
        & (w > 0)
        & (h > 0)
        & (npix <= F.lit(_GIF_MAX_PIXELS).cast("bigint"))
        & (F.length(p) >= 13 + 3 * n_ent_g + 3)
    )
    one = F.lit(1).cast("bigint")
    npix_c = F.when(sane, npix).otherwise(one)
    pos0 = F.when(sane, 14 + 3 * n_ent_g).otherwise(one)
    selects.append(("*", _gif_block_walk(p, pos0).alias("__gbw")))
    id_pos = F.col("__gbw")["pos"]
    # r14: a LOCAL color table (descriptor flag bit 7) sits between
    # the descriptor and the mcs byte and takes precedence over the
    # global one; a GIF with NEITHER table has no colors and rejects
    iflags = _u8(p, id_pos + 9)
    has_lct = F.floor(F.coalesce(iflags, F.lit(0)) / 128) == 1
    lct_len = F.when(
        has_lct,
        3
        * _pow2w(
            (F.pmod(F.coalesce(iflags, F.lit(0)), F.lit(8)) + 1).cast(
                "bigint"
            )
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    n_ent = F.when(has_lct, F.floor(lct_len / 3).cast("bigint")).otherwise(
        n_ent_g
    )
    tbl_base = F.when(has_lct, id_pos + 10).otherwise(
        F.lit(14).cast("bigint")
    )
    mcs = _u8(p, id_pos + 10 + lct_len)
    mcs_c = F.when(
        sane & mcs.between(2, 8), mcs.cast("bigint")
    ).otherwise(F.lit(2).cast("bigint"))
    desc_ok = (
        F.col("__gbw")["ok"]
        & F.col("__gbw")["done"]
        & (_u8(p, id_pos) == 0x2C)
        & (_le16(p, id_pos + 1) == 0)       # left
        & (_le16(p, id_pos + 3) == 0)       # top
        & (_le16(p, id_pos + 5) == w)       # image width == screen
        & (_le16(p, id_pos + 7) == h)
        & (has_lct | has_gct)               # some color table exists
        & (F.length(p) >= id_pos + 10 + lct_len)
        & mcs.between(2, 8)
    )
    # r14: 4-pass interlace accepted — a closed-form row permutation
    # applied at the pixel-map stage, no extra walk
    interlaced = (
        F.pmod(
            F.floor(_u8(p, id_pos + 9) / 64).cast("bigint"), F.lit(2)
        )
        == 1
    )
    selects.append((
        "*",
        _gif_subblock_walk(
            p,
            F.when(
                sane & desc_ok, id_pos + 11 + lct_len
            ).otherwise(one),
        ).alias("__gsb"),
    ))
    sb = F.col("__gsb")
    stream_ok = (
        sb["ok"]
        & sb["done"]
        & (sb["total"] > 0)
        & (_u8(p, sb["pos"] + 1) == 0x3B)            # trailer
        & (sb["pos"] + 1 == F.length(p))             # nothing after
    )
    walk_pre = sane & desc_ok & stream_ok
    selects.append((
        "*",
        F.when(
            walk_pre, _gif_lzw_walk(p, sb, mcs_c, npix_c)
        ).alias("__glw"),
    ))
    lw = F.col("__glw")
    out = lw["out"]
    idx_ok = F.coalesce(
        F.forall(out, lambda v: v.cast("bigint") < n_ent),
        F.lit(False),
    )
    ok = (
        walk_pre
        & F.coalesce(lw["ok"] & lw["done"], F.lit(False))
        & (F.size(out).cast("bigint") == npix_c)
        & idx_ok
    )

    wbc = F.when(sane, w.cast("bigint")).otherwise(one)
    hbc = F.when(sane, h.cast("bigint")).otherwise(one)

    def gif_byte(k):
        q = F.floor(k / 3).cast("bigint")
        c = F.pmod(k, F.lit(3))
        # interlace: display pixel q's index sits at the stream
        # position of its row's pass slot — the expression twin of
        # _gif_interlace_pos (closed form over the three pass sizes)
        r = F.floor(q / wbc).cast("bigint")
        x = F.pmod(q, wbc)
        c1 = F.floor((hbc + 7) / 8).cast("bigint")
        c2 = F.floor((hbc + 3) / 8).cast("bigint")
        c3 = F.floor((hbc + 1) / 4).cast("bigint")
        spos = (
            F.when(F.pmod(r, F.lit(8)) == 0, F.floor(r / 8))
            .when(F.pmod(r, F.lit(8)) == 4, c1 + F.floor((r - 4) / 8))
            .when(
                F.pmod(r, F.lit(4)) == 2, c1 + c2 + F.floor((r - 2) / 4)
            )
            .otherwise(c1 + c2 + c3 + F.floor((r - 1) / 2))
            .cast("bigint")
        )
        sq = F.when(interlaced, spos * wbc + x).otherwise(q)
        idx = F.coalesce(
            F.try_element_at(out, (sq + 1).cast("int")), F.lit(0)
        ).cast("bigint")
        return _u8(p, tbl_base + idx * 3 + c)

    pixels = F.transform(
        F.sequence(F.lit(0), npix_c * 3 - 1), gif_byte
    )
    selects.append((
        "media_id",
        F.when(ok, "gif").alias("img_format"),
        F.when(ok, w).cast("int").alias("width"),
        F.when(ok, h).cast("int").alias("height"),
        F.when(ok, pixels).alias("pixels"),
    ))
    return selects


_GIF_ANIM_MAX_BLOCKS = 12  #: frame-walk bound (ext + image per frame)
_GIF_MAX_FRAMES = 5        #: animated-decode frame cap


def decode_gif_anim(payload: bytes):
    """Python twin of the Spark ``decode_gif_frames``: returns
    ``(w, h, n_frames, [frame_rgb_or_None, ...])`` for an ANIMATED
    GIF. STRUCTURAL failures (signature/screen/GCT, truncated or
    over-cap block stream, missing trailer, too many frames, no
    frames) raise — they null every row on the Spark side.
    PER-FRAME failures (descriptor geometry, local table, bad mcs,
    a corrupt LZW stream, an out-of-range index) yield ``None`` for
    THAT frame only — the Spark side nulls that frame's row and
    decodes the rest, and the twin mirrors it exactly."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    has_gct = bool(flags & 0x80)
    n_entries = (2 << (flags & 7)) if has_gct else 0
    if w <= 0 or h <= 0 or w * h > _GIF_MAX_PIXELS:
        raise ValueError("dims outside the decode envelope")
    gct = payload[13:13 + 3 * n_entries]
    if len(gct) != 3 * n_entries:
        raise ValueError("truncated global color table")
    pos = 13 + 3 * n_entries
    raw_frames = []
    done = False
    for _ in range(_GIF_ANIM_MAX_BLOCKS):
        if pos >= len(payload):
            raise ValueError("truncated block stream")
        b = payload[pos]
        if b == 0x3B:
            if pos + 1 != len(payload):
                raise ValueError("trailing bytes after trailer")
            done = True
            break
        if b == 0x21:
            pos += 2
            for _ in range(_GIF_MAX_SUBBLOCKS):
                sl = payload[pos]
                pos += 1 + sl
                if sl == 0:
                    break
            else:
                raise ValueError("extension sub-blocks beyond cap")
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02X}")
        if len(raw_frames) >= _GIF_MAX_FRAMES:
            raise ValueError("frame count beyond cap")
        desc = payload[pos:pos + 10]
        # a local color table shifts the mcs byte and the data; its
        # length is STRUCTURAL (the frame walk must skip it), so a
        # truncated LCT raises rather than nulling one frame
        lct = b""
        if desc[9] & 0x80:
            ln = 2 << (desc[9] & 7)
            lct = payload[pos + 10:pos + 10 + 3 * ln]
            if len(lct) != 3 * ln:
                raise ValueError("truncated local color table")
            pos += 3 * ln
        mcs = payload[pos + 10]
        pos += 11
        data = b""
        for _ in range(_GIF_MAX_SUBBLOCKS):
            sl = payload[pos]
            if sl == 0:
                pos += 1
                break
            data += payload[pos + 1:pos + 1 + sl]
            if len(payload) < pos + 1 + sl:
                raise ValueError("truncated sub-block")
            pos += 1 + sl
        else:
            raise ValueError("data sub-blocks beyond cap")
        raw_frames.append((desc, lct, mcs, data))
    if not done:
        raise ValueError(
            f"no trailer within {_GIF_ANIM_MAX_BLOCKS} blocks"
        )
    if not raw_frames:
        raise ValueError("no image frames before the trailer")
    frames = []
    for desc, lct, mcs, data in raw_frames:
        try:
            left = int.from_bytes(desc[1:3], "little")
            top = int.from_bytes(desc[3:5], "little")
            iw = int.from_bytes(desc[5:7], "little")
            ih = int.from_bytes(desc[7:9], "little")
            iflags = desc[9]
            if (left, top) != (0, 0) or (iw, ih) != (w, h):
                raise ValueError("frame does not cover the screen")
            tbl, n_tbl = (lct, len(lct) // 3) if lct else (gct, n_entries)
            if n_tbl == 0:
                raise ValueError(
                    "no color table (neither global nor local)"
                )
            if not 2 <= mcs <= 8:
                raise ValueError(f"bad LZW minimum code size {mcs}")
            indices = _lzw_decode_py(data, mcs, w * h)
            if iflags & 0x40:
                indices = [
                    indices[_gif_interlace_pos(r, h) * w + x]
                    for r in range(h)
                    for x in range(w)
                ]
            rgb = []
            for idx in indices:
                if idx >= n_tbl:
                    raise ValueError(
                        f"index {idx} >= {n_tbl} table entries"
                    )
                rgb += list(tbl[3 * idx:3 * idx + 3])
            frames.append(rgb)
        except ValueError:
            frames.append(None)
    return w, h, len(frames), frames


def encode_gif_anim(
    media_id, w, h, n_frames, lct: bool = False
) -> Column:
    """An ANIMATED GIF89a: NETSCAPE2.0 looping application extension
    (skipped by the decoder, exercising extension handling in the
    anim block stream), then ``n_frames`` full-screen frames under
    the shared 256-entry color table, each the uncompressed-shape
    root-code stream with index(f, q) = (q + 9f) mod 256 — so the
    decoded RGB byte k of frame f is the closed form
    ``(media_id·7 + k·13 + 95·f) mod 256`` (351 ≡ 95 mod 256).
    Envelope: npix <= 220, 1 <= n_frames <= _GIF_MAX_FRAMES; outside
    raises (fixture-encoder convention)."""
    wb = w.cast("bigint")
    hb = h.cast("bigint")
    nf = n_frames.cast("bigint")
    npix = wb * hb
    header = F.concat(
        F.lit("474946383961"),
        _le_hex(w, 2),
        _le_hex(h, 2),
        F.lit("00" if lct else "F7"),
        F.lit("0000"),
    )
    gct = (
        F.lit("")
        if lct
        else F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(767)),
                lambda t: _byte_hex(pixel_value(media_id, t)),
            ),
            "",
        )
    )
    netscape = F.lit("21FF0B4E45545343415045322E300301000000")

    def desc_hex(f):
        # r14 lct mode: every frame carries its OWN 256-entry table,
        # shifted 17 per frame — decoded RGB byte k of frame f is
        # (media_id*7 + k*13 + 112*f) mod 256 (351+17 = 112 mod 256)
        parts = [
            F.lit("2C00000000"),
            _le_hex(w, 2),
            _le_hex(h, 2),
            F.lit("87" if lct else "00"),
        ]
        if lct:
            parts.append(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(767)),
                        lambda t: _byte_hex(
                            F.pmod(
                                pixel_value(media_id, t) + 17 * f,
                                F.lit(256),
                            )
                        ),
                    ),
                    "",
                )
            )
        parts.append(F.lit("08"))
        return F.concat(*parts)

    def frame_hex(f):
        return F.concat(
            desc_hex(f),
            _gif_root_block_hex(
                npix, lambda qi: F.pmod(qi + 9 * f, F.lit(256))
            ),
        )

    frames = F.array_join(
        F.transform(F.sequence(F.lit(0), nf - 1), frame_hex), ""
    )
    body = F.concat(header, gct, netscape, frames, F.lit("3B"))
    return F.when(
        (npix <= F.lit(220))
        & nf.between(1, F.lit(_GIF_MAX_FRAMES)),
        F.unhex(body),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("encode_gif_anim: w*h = "),
                npix.cast("string"),
                F.lit(" / n_frames = "),
                nf.cast("string"),
                F.lit(" outside the (220, 1..5) envelope"),
            )
        ).cast("binary")
    )


def _gif_skip_subblocks(p, q0):
    """Bounded sub-block skip: struct (q, fin) — ``q`` the first
    byte after the 0x00 terminator reached from ``q0`` (a length
    byte)."""
    einit = F.struct(q0.alias("q"), F.lit(False).alias("fin"))

    def estep(eacc, _):
        q = eacc["q"]
        sl = _u8(p, q)
        bad = sl.isNull() | (q + sl >= F.length(p) + 1)
        new = F.when(
            bad | (sl == 0),
            F.struct((q + 1).alias("q"), F.lit(True).alias("fin")),
        ).otherwise(
            F.struct(
                (q + 1 + sl.cast("bigint")).alias("q"),
                F.lit(False).alias("fin"),
            )
        )
        return F.when(eacc["fin"], eacc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_GIF_MAX_SUBBLOCKS)), einit, estep
    )


def _gif_frame_walk(p, pos0):
    """Animated-GIF frame walk: from ``pos0``, skip extensions, skip
    each image's data (descriptor + mcs + sub-blocks) while
    RECORDING the descriptor offsets, stop at the trailer — one
    struct column (pos, descs array<bigint>, ok, done). The trailer
    must be the payload's last byte; more than ``_GIF_MAX_FRAMES``
    descriptors or ``_GIF_ANIM_MAX_BLOCKS`` blocks flips ok."""
    finit = F.struct(
        pos0.alias("pos"),
        F.slice(F.array(F.lit(0).cast("bigint")), 1, 0).alias("descs"),
        F.lit(True).alias("ok"),
        F.lit(False).alias("done"),
    )

    def fstep(acc, _):
        pos = acc["pos"]
        b = _u8(p, pos)
        fail = F.struct(
            pos.alias("pos"),
            acc["descs"].alias("descs"),
            F.lit(False).alias("ok"),
            F.lit(True).alias("done"),
        )
        ext = _let(
            _gif_skip_subblocks(p, pos + 2),
            lambda e: F.when(
                e["fin"],
                F.struct(
                    e["q"].alias("pos"),
                    acc["descs"].alias("descs"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                ),
            ).otherwise(fail),
        )
        iflags_w = _u8(p, pos + 9)
        lct_skip = F.when(
            F.floor(F.coalesce(iflags_w, F.lit(0)) / 128) == 1,
            3
            * _pow2w(
                (
                    F.pmod(F.coalesce(iflags_w, F.lit(0)), F.lit(8))
                    + 1
                ).cast("bigint")
            ),
        ).otherwise(F.lit(0).cast("bigint"))
        img = _let(
            _gif_skip_subblocks(p, pos + 11 + lct_skip),
            lambda e: F.when(
                e["fin"]
                & (F.size(acc["descs"]) < F.lit(_GIF_MAX_FRAMES)),
                F.struct(
                    e["q"].alias("pos"),
                    F.concat(
                        acc["descs"], F.array(pos)
                    ).alias("descs"),
                    acc["ok"].alias("ok"),
                    F.lit(False).alias("done"),
                ),
            ).otherwise(fail),
        )
        new = (
            F.when(b.isNull() | (pos > F.length(p)), fail)
            .when(
                b == 0x3B,
                F.struct(
                    pos.alias("pos"),
                    acc["descs"].alias("descs"),
                    (acc["ok"] & (pos == F.length(p))).alias("ok"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(b == 0x21, ext)
            .when(b == 0x2C, img)
            .otherwise(fail)
        )
        return F.when(acc["done"], acc).otherwise(new)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_GIF_ANIM_MAX_BLOCKS)), finit, fstep
    )


def decode_gif_frames(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """ANIMATED GIF decode, pure Spark: ONE ROW PER FRAME —
    (media_id, gif_format, width, height, n_frames, frame_idx,
    pixels) — the GIF sibling of ``decode_y4m_frames``. The frame
    walk (``_gif_frame_walk``) records every full-screen image
    descriptor while skipping extensions and image data; a
    ``posexplode_outer`` turns the descriptor list into frame rows
    (invalid payloads keep one null-frame row, so the operator is
    total); each frame row then stages its OWN sub-block table and
    LZW walk at its descriptor's offset — the single-image decode
    machinery reused verbatim, including per-frame interlace and the
    bounds-checked color-table lookup. Envelope: every frame covers
    the screen under the global color table; caps
    ``_GIF_MAX_FRAMES`` / ``_GIF_ANIM_MAX_BLOCKS`` (twin:
    ``decode_gif_anim``).

    r14 optimization round: same program/assembly split + memo as
    ``_decode_pixels_gif`` — the select program is a pure function
    of ``payload_col``."""
    df = media
    for sel in _gif_frames_plan_selects_cached(payload_col):
        df = df.select(*sel)
    return df


@lru_cache(maxsize=8)
def _gif_frames_plan_selects_cached(payload_col: str):
    """Memoized select-stage program for ``decode_gif_frames``."""
    return tuple(
        tuple(sel) for sel in _gif_frames_plan_selects(payload_col)
    )


def _gif_frames_plan_selects(payload_col: str):
    """The ``decode_gif_frames`` expression program (ordered select
    argument tuples; see ``_gif_plan_selects``)."""
    selects = []
    p0 = F.col(payload_col)
    flags0 = _u8(p0, 11)
    n_ent0 = _pow2w(
        (F.pmod(F.coalesce(flags0, F.lit(0)), F.lit(8)) + 1).cast(
            "bigint"
        )
    )
    w0 = _le16(p0, 7)
    h0 = _le16(p0, 9)
    npix0 = w0.cast("bigint") * h0.cast("bigint")
    sig_ok0 = F.coalesce(
        F.hex(F.substring(p0, 1, 6)).isin(
            "474946383761", "474946383961"
        ),
        F.lit(False),
    )
    one = F.lit(1).cast("bigint")
    has_gct0 = F.floor(F.coalesce(flags0, F.lit(0)) / 128) == 1
    n_ent0g = F.when(has_gct0, n_ent0).otherwise(
        F.lit(0).cast("bigint")
    )
    sane0 = (
        sig_ok0
        & npix0.isNotNull()
        & (w0 > 0)
        & (h0 > 0)
        & (npix0 <= F.lit(_GIF_MAX_PIXELS).cast("bigint"))
        & (F.length(p0) >= 13 + 3 * n_ent0g + 3)
    )
    selects.append((
        "media_id",
        p0.alias("__p"),
        _gif_frame_walk(
            p0, F.when(sane0, 14 + 3 * n_ent0g).otherwise(one)
        ).alias("__gfw"),
    ))

    # everything below reads from __p (header expressions are cheap
    # closed-form byte reads, recomputed per stage)
    p = F.col("__p")
    flags = _u8(p, 11)
    n_ent = _pow2w(
        (F.pmod(F.coalesce(flags, F.lit(0)), F.lit(8)) + 1).cast(
            "bigint"
        )
    )
    w = _le16(p, 7)
    h = _le16(p, 9)
    npix = w.cast("bigint") * h.cast("bigint")
    has_gct = F.floor(F.coalesce(flags, F.lit(0)) / 128) == 1
    n_ent_g = F.when(has_gct, n_ent).otherwise(
        F.lit(0).cast("bigint")
    )
    sane = (
        F.coalesce(
            F.hex(F.substring(p, 1, 6)).isin(
                "474946383761", "474946383961"
            ),
            F.lit(False),
        )
        & npix.isNotNull()
        & (w > 0)
        & (h > 0)
        & (npix <= F.lit(_GIF_MAX_PIXELS).cast("bigint"))
    )
    npix_c = F.when(sane, npix).otherwise(one)
    gfw = F.col("__gfw")
    pre_ok = (
        sane
        & F.coalesce(gfw["ok"] & gfw["done"], F.lit(False))
        & (F.size(gfw["descs"]) >= 1)
    )
    selects.append((
        "media_id",
        "__p",
        F.when(pre_ok, F.size(gfw["descs"])).alias("__nf"),
        F.posexplode_outer(F.when(pre_ok, gfw["descs"])).alias(
            "frame_idx", "__dpos"
        ),
    ))
    dpos = F.col("__dpos")
    # per-frame local color table (r14): sits between the descriptor
    # and the mcs byte, takes precedence over the global table
    iflags_f = _u8(p, dpos + 9)
    has_lct = F.floor(F.coalesce(iflags_f, F.lit(0)) / 128) == 1
    lct_len = F.when(
        has_lct,
        3
        * _pow2w(
            (
                F.pmod(F.coalesce(iflags_f, F.lit(0)), F.lit(8)) + 1
            ).cast("bigint")
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    n_ent_f = F.when(
        has_lct, F.floor(lct_len / 3).cast("bigint")
    ).otherwise(n_ent_g)
    tbl_base = F.when(has_lct, dpos + 10).otherwise(
        F.lit(14).cast("bigint")
    )
    selects.append((
        "*",
        _gif_subblock_walk(
            p,
            F.when(
                dpos.isNotNull(), dpos + 11 + lct_len
            ).otherwise(one),
        ).alias("__gsb"),
    ))
    mcs = _u8(p, dpos + 10 + lct_len)
    mcs_c = F.when(
        dpos.isNotNull() & mcs.between(2, 8), mcs.cast("bigint")
    ).otherwise(F.lit(2).cast("bigint"))
    desc_ok = (
        dpos.isNotNull()
        & (_u8(p, dpos) == 0x2C)
        & (_le16(p, dpos + 1) == 0)
        & (_le16(p, dpos + 3) == 0)
        & (_le16(p, dpos + 5) == w)
        & (_le16(p, dpos + 7) == h)
        & (has_lct | has_gct)
        & (F.length(p) >= dpos + 10 + lct_len)
        & mcs.between(2, 8)
    )
    interlaced = (
        F.pmod(
            F.floor(_u8(p, dpos + 9) / 64).cast("bigint"), F.lit(2)
        )
        == 1
    )
    sb = F.col("__gsb")
    stream_ok = sb["ok"] & sb["done"] & (sb["total"] > 0)
    walk_pre = F.coalesce(desc_ok & stream_ok, F.lit(False))
    selects.append((
        "*",
        F.when(
            walk_pre, _gif_lzw_walk(p, sb, mcs_c, npix_c)
        ).alias("__glw"),
    ))
    lw = F.col("__glw")
    out = lw["out"]
    idx_ok = F.coalesce(
        F.forall(out, lambda v: v.cast("bigint") < n_ent_f),
        F.lit(False),
    )
    ok = (
        walk_pre
        & F.coalesce(lw["ok"] & lw["done"], F.lit(False))
        & (F.size(out).cast("bigint") == npix_c)
        & idx_ok
    )
    wbc = F.when(sane, w.cast("bigint")).otherwise(one)
    hbc = F.when(sane, h.cast("bigint")).otherwise(one)

    def gif_byte(k):
        q = F.floor(k / 3).cast("bigint")
        c = F.pmod(k, F.lit(3))
        r = F.floor(q / wbc).cast("bigint")
        x = F.pmod(q, wbc)
        c1 = F.floor((hbc + 7) / 8).cast("bigint")
        c2 = F.floor((hbc + 3) / 8).cast("bigint")
        c3 = F.floor((hbc + 1) / 4).cast("bigint")
        spos = (
            F.when(F.pmod(r, F.lit(8)) == 0, F.floor(r / 8))
            .when(F.pmod(r, F.lit(8)) == 4, c1 + F.floor((r - 4) / 8))
            .when(
                F.pmod(r, F.lit(4)) == 2,
                c1 + c2 + F.floor((r - 2) / 4),
            )
            .otherwise(c1 + c2 + c3 + F.floor((r - 1) / 2))
            .cast("bigint")
        )
        sq = F.when(interlaced, spos * wbc + x).otherwise(q)
        idx = F.coalesce(
            F.try_element_at(out, (sq + 1).cast("int")), F.lit(0)
        ).cast("bigint")
        return _u8(p, tbl_base + idx * 3 + c)

    pixels = F.transform(
        F.sequence(F.lit(0), npix_c * 3 - 1), gif_byte
    )
    selects.append((
        "media_id",
        F.when(ok, "gif").alias("gif_format"),
        F.when(ok, w).cast("int").alias("width"),
        F.when(ok, h).cast("int").alias("height"),
        F.when(ok, F.col("__nf")).cast("int").alias("n_frames"),
        F.when(ok, F.col("frame_idx")).cast("int").alias("frame_idx"),
        F.when(ok, pixels).alias("pixels"),
    ))
    return selects
