"""Multimodal (media-span) plumbing: binary payloads + typed metadata.

The input documents interleave media spans (``kind='media'``,
``media_ref`` an opaque URI) with text spans; linkage ignores them but
a training-data pipeline needs to move, decode, and featurize them.
This module provides the Spark-side plumbing — schemas, partitioning,
batch shapes — plus REAL pure-stdlib decoders for BMP, 8-bit PNG,
baseline JPEG (operators/jpeg.py), GIF (LZW, incl. interlaced),
binary PGM/PPM, PCM WAV, and MPEG audio metadata (frame-header walk:
exact CBR/VBR duration, sample rate, channels, bitrate envelope).
Only formats that genuinely need a codec library this container lacks
(progressive JPEG, MP3 PCM synthesis, video) stay stubbed: ``decode_features`` raises
``NotImplementedError`` for them unless ``fake=True``, which
substitutes a deterministic synthetic decode so the distributed path
is fully testable.

Operators:

* extract_media_refs — explode media spans into a flat
  ``(doc_id, media_idx, media_ref, media_type)`` table (type inferred
  from the URI suffix; unknown -> 'binary').
* fetch_payloads — attach a ``payload: binary`` column.  STUB: real
  deployments read object storage per partition (``mapInPandas`` so
  one connection per batch, never per row); here it deterministically
  fabricates bytes from the ref.
* decode_features — ``mapInPandas`` over payload batches producing
  fixed-shape feature vectors + width/height metadata; the inner
  pixel decode is the stub boundary (swap in PIL/librosa in prod).
* sample_frames — frame-sampling plan for video refs: emits
  ``(doc_id, media_idx, frame_no)`` rows for every Nth frame without
  decoding (pure expressions), the standard pre-shuffle before a
  decode stage so frames of one video spread across executors.
"""

from __future__ import annotations

import hashlib
import io
import struct
import typing
import wave
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """Explode media spans; infer a coarse type from the ref suffix."""
    media = F.filter(F.col("spans"), lambda s: s["kind"] == "media")
    ex = docs.select(
        "doc_id", F.posexplode(media).alias("media_idx", "span")
    ).select("doc_id", "media_idx", F.col("span.media_ref").alias("media_ref"))
    suffix = F.lower(F.substring_index(F.col("media_ref"), ".", -1))
    mapping = F.create_map(
        *[x for k, v in MEDIA_TYPES.items() for x in (F.lit(k), F.lit(v))]
    )
    return ex.withColumn(
        "media_type", F.coalesce(F.try_element_at(mapping, suffix), F.lit("binary"))
    )


def fetch_payloads(refs: DataFrame, fake: bool = True) -> DataFrame:
    """Attach ``payload: binary``.

    ``fake=True`` fabricates deterministic bytes (sha256 stream of the
    ref) so plans are testable without any storage.  ``fake=False``
    performs the REAL fetch for ``file://`` / plain-path refs, batched
    per Arrow batch inside ``mapInPandas`` — the same one-connection-
    per-batch shape an object-store client (s3/gcs SDK) plugs into; on
    a cluster the refs DataFrame is pre-repartitioned by the caller so
    reads spread across executors rather than serializing on one."""
    if fake:

        @F.pandas_udf(T.BinaryType())
        def fake_fetch(ref: pd.Series) -> pd.Series:
            def one(r: str) -> bytes:
                h = hashlib.sha256(r.encode()).digest()
                return (h * 8)[:256]  # 256 deterministic bytes per ref

            # na_action='ignore': a NULL media_ref yields a NULL payload
            # instead of None.encode() crashing the task
            return ref.map(one, na_action="ignore")

        return refs.withColumn("payload", fake_fetch(F.col("media_ref")))

    out_schema = T.StructType(
        refs.schema.fields + [T.StructField("payload", T.BinaryType())]
    )

    def gen(batches: typing.Iterator[pd.DataFrame]) -> typing.Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for r in pdf["media_ref"]:
                if r is None:
                    payloads.append(None)
                    continue
                path = r[7:] if r.startswith("file://") else r
                with open(path, "rb") as fh:
                    payloads.append(fh.read())
            out = pdf.copy()
            out["payload"] = payloads
            yield out

    return refs.mapInPandas(gen, out_schema)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_idx", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _pool(values: np.ndarray, dim: int) -> list[float]:
    """Mean-pool a 1-D float array into ``dim`` equal segments (the
    fixed-shape feature every decoder emits)."""
    if values.size == 0:
        return [0.0] * dim
    idx = (np.arange(values.size) * dim) // values.size
    sums = np.bincount(idx, weights=values, minlength=dim)
    counts = np.maximum(np.bincount(idx, minlength=dim), 1)
    return (sums / counts).astype(np.float32).tolist()


def _decode_bmp(buf: bytes, dim: int) -> dict:
    """Uncompressed BMP (BITMAPINFOHEADER, 8/24/32 bpp) via struct —
    pure stdlib, no codec library."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    width, height = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32) or width <= 0 or height == 0:
        raise NotImplementedError(
            f"unsupported BMP variant (bpp={bpp}, comp={compression})"
        )
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_bytes = ((bpp * width + 31) // 32) * 4
    rows = np.frombuffer(buf, np.uint8, row_bytes * height, offset).reshape(
        height, row_bytes
    )
    if bpp == 8:
        # 8-bpp BMP pixels are PALETTE INDICES, not gray levels: the
        # BGRX color table sits between the info header (biSize bytes
        # from offset 14) and the pixel data; map each index through
        # the palette's channel mean (same grayscale convention as the
        # 24/32-bpp branch) instead of reading indices as intensities
        bi_size = struct.unpack_from("<I", buf, 14)[0]
        clr_used = struct.unpack_from("<I", buf, 46)[0] if bi_size >= 36 else 0
        pal_off = 14 + bi_size
        # some encoders write a short color table with biClrUsed=0; the
        # pixel-data offset bounds the true table size, so never read
        # pixel bytes as palette entries
        n_colors = min(clr_used or 256, max((offset - pal_off) // 4, 0))
        if n_colors <= 0:
            raise ValueError("8-bpp BMP with no color table")
        pal = np.frombuffer(buf, np.uint8, n_colors * 4, pal_off).reshape(
            n_colors, 4
        )
        pal_gray = pal[:, :3].astype(np.float32).mean(axis=1)
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError(
                f"BMP palette index out of range (>= {n_colors} colors)"
            )
        gray = pal_gray[idx]
    else:
        nch = bpp // 8
        px = rows[:, : width * nch].reshape(height, width, nch).astype(np.float32)
        gray = px[..., :3].mean(axis=2)  # stored BGR; mean is channel-symmetric
    if flip:
        gray = gray[::-1]
    return {
        "width": width,
        "height": height,
        "feature": _pool(gray.ravel() / 255.0, dim),
    }


def _decode_pnm(buf: bytes, dim: int) -> dict:
    """Binary PGM (P5) / PPM (P6) — header tokens + raw samples."""
    tokens: list[bytes] = []
    pos = 2  # past magic
    while len(tokens) < 3 and pos < len(buf):
        c = buf[pos : pos + 1]
        if c == b"#":  # comment to end of line
            pos = buf.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(buf) and not buf[end : end + 1].isspace():
                end += 1
            tokens.append(buf[pos:end])
            pos = end
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    nch = 3 if buf[:2] == b"P6" else 1
    # PNM stores multi-byte samples most-significant-byte first
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    px = np.frombuffer(buf, dtype, width * height * nch, pos).astype(np.float32)
    gray = px.reshape(height, width, nch).mean(axis=2)
    return {
        "width": width,
        "height": height,
        "feature": _pool(gray.ravel() / maxval, dim),
    }


def _png_unfilter(
    filters: np.ndarray, rows: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse the per-row PNG filters (spec §9: None/Sub/Up/Average/
    Paeth).  Sub is a per-lane cumulative sum and Up a vectorized add;
    Average/Paeth carry a per-byte left-neighbor dependency, so those
    rows fall back to a scalar scan — fine for the metadata/thumbnail
    payloads this stage handles (full-rate decode is the documented
    codec-library boundary)."""
    height, row_bytes = rows.shape
    out = np.zeros((height, row_bytes), np.int64)
    prev = np.zeros(row_bytes, np.int64)
    for y in range(height):
        f = int(filters[y])
        line = rows[y].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(line[lane::bpp]) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.zeros(row_bytes, np.int64)
            for i in range(row_bytes):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + (a + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(row_bytes, np.int64)
            for i in range(row_bytes):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (line[i] + pr) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def _decode_png(buf: bytes, dim: int) -> dict:
    """PNG via stdlib ``zlib`` only: chunk walk -> IDAT inflate ->
    per-row unfilter; 8-bit gray / gray+alpha / RGB / RGBA / palette,
    non-interlaced (Adam7 and 16-bit depth stay behind the codec
    gate).  Same grayscale convention as the BMP branch: channel mean,
    alpha ignored."""
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    plte: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8)[
                : (len(data) // 3) * 3
            ].reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG (bit_depth={bit_depth}, interlace={interlace})"
        )
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise NotImplementedError(f"unsupported PNG color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    row_bytes = width * nch
    raw = zlib.decompress(bytes(idat))
    if len(raw) < (row_bytes + 1) * height:
        raise ValueError("PNG pixel data truncated")
    scan = np.frombuffer(raw, np.uint8, (row_bytes + 1) * height).reshape(
        height, row_bytes + 1
    )
    recon = _png_unfilter(scan[:, 0], scan[:, 1:], bpp=nch)
    if color_type == 3:
        idx = recon.reshape(height, width)
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        gray = plte.astype(np.float32).mean(axis=1)[idx]
    else:
        px = recon.reshape(height, width, nch).astype(np.float32)
        gray = px[..., 0] if nch <= 2 else px[..., :3].mean(axis=2)
    return {
        "width": width,
        "height": height,
        "feature": _pool(gray.ravel() / 255.0, dim),
    }


def _gif_lzw(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW decode (GIF89a spec appendix F): variable code
    width starting at ``min_code_size + 1``, LSB-first bit packing,
    CLEAR/END control codes, dictionary growth capped at 12 bits
    (deferred-clear streams keep reading 12-bit codes)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < max_pixels:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code gap)")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _decode_gif(buf: bytes, dim: int) -> dict:
    """GIF87a/89a via a pure-stdlib LZW decode: logical screen +
    color-table walk, first image frame only (animation frames after
    the first are ignored — the feature stage wants one raster), both
    sequential and interlaced row order.  Same grayscale convention as
    the other image branches: palette channel mean."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _sw, _sh, packed = struct.unpack_from("<HHB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks to terminator
            pos += 1
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos)
            pos += 9
            ct = gct
            if ipacked & 0x80:  # local color table overrides
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image with no color table")
            min_code_size = buf[pos]
            pos += 1
            data = bytearray()
            while pos < len(buf) and buf[pos] != 0:
                ln = buf[pos]
                data += buf[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            pixels = _gif_lzw(bytes(data), min_code_size, w * h)
            if len(pixels) < w * h:
                raise ValueError("GIF pixel data truncated")
            idx = np.frombuffer(
                bytes(pixels[: w * h]), np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:
                # interlaced: stored rows are the 4 passes in order;
                # scatter them back to their image positions
                order = [
                    r
                    for step, start in ((8, 0), (8, 4), (4, 2), (2, 1))
                    for r in range(start, h, step)
                ]
                deinterlaced = np.empty_like(idx)
                deinterlaced[order] = idx
                idx = deinterlaced
            if int(idx.max(initial=0)) >= ct.shape[0]:
                raise ValueError("GIF color index out of range")
            gray = ct.astype(np.float32).mean(axis=1)[idx]
            return {
                "width": int(w),
                "height": int(h),
                "feature": _pool(gray.ravel() / 255.0, dim),
            }
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _decode_jpeg(buf: bytes, dim: int) -> dict:
    """Baseline JPEG via operators/jpeg.py (pure stdlib + numpy —
    marker parse, Huffman, dequant, IDCT); the gray pipeline only
    needs the luma plane, so chroma blocks are entropy-skipped.
    Progressive/arithmetic/12-bit raise and stay codec-gated."""
    from recordlinker_spark.operators.jpeg import decode_jpeg_gray

    width, height, gray = decode_jpeg_gray(buf)
    return {
        "width": width,
        "height": height,
        "feature": _pool(gray.ravel() / 255.0, dim),
    }


def _decode_wav(buf: bytes, dim: int) -> dict:
    """PCM WAV via the stdlib ``wave`` module: duration / rate /
    channels + a dim-segment RMS-energy envelope feature."""
    with wave.open(io.BytesIO(buf), "rb") as w:
        n, sr, ch, sw = (
            w.getnframes(), w.getframerate(), w.getnchannels(), w.getsampwidth()
        )
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    samples = np.frombuffer(raw, dtype).astype(np.float32)
    if sw == 1:
        samples -= 128.0
    scale = float(2 ** (8 * sw - 1))
    mono = samples.reshape(-1, ch).mean(axis=1) / scale
    # RMS envelope: pool squared amplitude, then sqrt per segment
    energy = _pool(mono * mono, dim)
    return {
        "width": None,
        "height": None,
        "duration": n / sr if sr else 0.0,
        "sample_rate": sr,
        "channels": ch,
        "feature": np.sqrt(np.asarray(energy, dtype=np.float32)).tolist(),
    }


# MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3).
# Bitrates in kbps, indexed by the header's 4-bit bitrate field;
# index 0 is "free format" (unsupported) and 15 is invalid.
_MP3_BR_V1 = {  # MPEG-1, by layer
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_MP3_BR_V2 = {  # MPEG-2 / 2.5, by layer (II and III share a table)
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample rates by the header's 2-bit version field (0=2.5, 2=2, 3=1)
_MP3_RATES = {0: (11025, 12000, 8000), 2: (22050, 24000, 16000),
              3: (44100, 48000, 32000)}


def _mp3_frame(buf: bytes, pos: int) -> tuple[int, int, int, int, int] | None:
    """Parse one MPEG audio frame header at ``pos``.  Returns
    ``(frame_len, samples, rate, channels, kbps)`` or None if the four
    bytes at ``pos`` are not a valid fixed-bitrate frame header."""
    if pos + 4 > len(buf):
        return None
    b1, b2, b3 = buf[pos + 1], buf[pos + 2], buf[pos + 3]
    if buf[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3          # 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 3       # 3=Layer I, 2=II, 1=III, 0=reserved
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits           # 1, 2, or 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                  # free-format / invalid
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    kbps = (_MP3_BR_V1 if version == 3 else _MP3_BR_V2)[layer][br_idx]
    rate = _MP3_RATES[version][sr_idx]
    if layer == 1:
        samples = 384
        flen = (12 * kbps * 1000 // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or version == 3) else 576
        flen = samples // 8 * kbps * 1000 // rate + padding
    return flen, samples, rate, channels, kbps


def _sniff_mp3(buf: bytes) -> bool:
    """True iff ``buf`` starts with a headerless MPEG audio stream.
    One plausible 4-byte header is not enough (~1 in a few thousand
    random 0xFF-prefixed payloads parses): require the first frame to
    either fill the payload exactly or be followed by a second valid
    header — fabricated payloads essentially never chain two."""
    hdr = _mp3_frame(buf, 0)
    if hdr is None or hdr[0] <= 4 or hdr[0] > len(buf):
        return False
    return hdr[0] == len(buf) or _mp3_frame(buf, hdr[0]) is not None


def _decode_mp3(buf: bytes, dim: int) -> dict:
    """MPEG audio (MP3) metadata via a pure-stdlib frame-header walk:
    skip any ID3v2 tag, then step frame to frame summing each frame's
    sample count / sample rate into an exact duration (correct for
    both CBR and VBR streams; a leading Xing/Info/VBRI metadata frame
    carries no audio and is excluded).  The feature is the per-frame
    bitrate envelope pooled to ``dim`` and scaled by the 448 kbps
    format maximum — real stream structure (a VBR encoder's rate
    profile), not decoded PCM; full PCM synthesis stays codec-gated."""
    pos = 0
    if buf[:3] == b"ID3":
        if len(buf) < 10:
            raise ValueError("truncated ID3v2 header")
        pos = 10 + (((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14)
                    | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F))
        if buf[5] & 0x10:
            pos += 10               # ID3v2.4 footer (not counted in size)
    kbps_seq: list[float] = []
    duration = 0.0
    rate = channels = None
    first = True
    while pos + 4 <= len(buf):
        hdr = _mp3_frame(buf, pos)
        if hdr is None:
            break                    # trailing tag / junk ends the walk
        flen, samples, r, ch, kbps = hdr
        if flen <= 4:
            break                    # degenerate header; refuse to loop
        if rate is None:
            rate, channels = r, ch
        frame = buf[pos:pos + flen]
        pos += flen
        if first:
            first = False
            # a LAME/FFmpeg-style Xing/Info/VBRI first frame is
            # encoder metadata, not audio: advance past it but keep it
            # out of the duration and the bitrate envelope
            if (b"Xing" in frame or b"Info" in frame
                    or b"VBRI" in frame):
                continue
        kbps_seq.append(float(kbps))
        duration += samples / r
    if not kbps_seq:
        raise ValueError("no MPEG audio frames found")
    env = _pool(np.asarray(kbps_seq, dtype=np.float32) / 448.0, dim)
    return {
        "width": None,
        "height": None,
        "duration": duration,
        "sample_rate": rate,
        "channels": channels,
        "feature": env,
    }


def _decode_payload(payload: bytes, dim: int) -> dict | None:
    """Dispatch on magic bytes to a real pure-Python decoder; None when
    the format needs a codec library this container lacks."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload, dim)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload, dim)
    if payload[:3] == b"\xff\xd8\xff":
        return _decode_jpeg(payload, dim)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload, dim)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload, dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, dim)
    if payload[:3] == b"ID3" or _sniff_mp3(payload):
        return _decode_mp3(payload, dim)
    return None


def decode_features(
    payloads: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """``mapInPandas`` decode -> fixed-dim feature vector + metadata.

    Real decoders (pure stdlib + numpy, no codec libraries): BMP,
    8-bit non-interlaced PNG, baseline JPEG (luma-plane decode), GIF
    (first frame, incl. interlaced), and
    binary PGM/PPM images -> width/height + a mean-pooled grayscale
    vector; PCM WAV audio -> duration/sample_rate/channels + an RMS
    energy envelope; MPEG audio (MP3) -> exact frame-walk duration/
    rate/channels + a bitrate-envelope feature.  Formats that
    genuinely need a codec library (progressive JPEG / MP3 PCM
    synthesis / video) fall back to a deterministic pseudo-decode of
    the payload bytes when ``fake=True``, else raise
    ``NotImplementedError`` — per-format, not blanket: a BMP/WAV
    payload decodes for real either way."""

    def gen(batches: typing.Iterator[pd.DataFrame]) -> typing.Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in ("width", "height", "duration",
                                "sample_rate", "channels", "feature")
            }
            for payload in pdf["payload"]:
                if payload is None:
                    for c in cols:
                        cols[c].append(None)
                    continue
                payload = bytes(payload)
                try:
                    decoded = _decode_payload(payload, dim)
                except Exception:
                    # fabricated payloads can collide with a decoder's
                    # magic bytes (~3/2^16 per doc) yet never parse;
                    # only a real payload should surface its error
                    if not fake:
                        raise
                    decoded = None
                if decoded is None:
                    if not fake:
                        raise NotImplementedError(
                            "payload format needs a codec library not in "
                            "this container (progressive JPEG / MP3 PCM "
                            "synthesis / video)"
                        )
                    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                    if arr.size >= dim:
                        vec = arr[: (arr.size // dim) * dim].reshape(-1, dim).mean(axis=0)
                    else:  # short payload: zero-pad, no NaNs from empty mean
                        vec = np.pad(arr, (0, dim - arr.size))
                    decoded = {
                        "width": (int(arr[0]) + 1) if arr.size > 0 else 1,
                        "height": (int(arr[1]) + 1) if arr.size > 1 else 1,
                        "feature": (vec / 255.0).tolist(),
                    }
                for k in cols:
                    cols[k].append(decoded.get(k))
            out = pdf[["doc_id", "media_idx", "media_type"]].copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return payloads.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(
    refs: DataFrame, every_n: int = 30, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video refs (no decode): one row per
    sampled frame, ready to repartition before the decode stage."""
    videos = refs.filter(F.col("media_type") == "video")
    # frame count is metadata in prod; stub: deterministic from the ref
    n_frames = (F.abs(F.xxhash64("media_ref")) % 900 + 100).cast("int")
    frames = F.slice(
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)), 1, max_frames
    )
    return videos.select(
        "doc_id", "media_idx", "media_ref", F.explode(frames).alias("frame_no")
    )
