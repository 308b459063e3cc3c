"""Media plumbing + streaming incremental linkage."""

import time

from pyspark.sql import functions as F

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.operators.media import (
    decode_features,
    extract_media_refs,
    fetch_payloads,
    sample_frames,
)
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import docs_to_rows
from recordlinker_spark.streaming.incremental import link_stream

from fixtures_patients import SIX_PATIENTS


def test_media_pipeline(spark):
    docs = [
        (
            f"r{i}",
            p,
            [(1, f"media://img/{i}.png"), (3, f"media://vid/{i}.mp4")],
        )
        for i, p in enumerate(SIX_PATIENTS[:3])
    ]
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    refs = extract_media_refs(df)
    rows = refs.collect()
    assert len(rows) == 6
    assert {r["media_type"] for r in rows} == {"image", "video"}

    feats = decode_features(fetch_payloads(refs), dim=8)
    out = feats.collect()
    assert len(out) == 6
    assert all(len(r["feature"]) == 8 for r in out)
    # deterministic: same ref -> same feature
    again = decode_features(fetch_payloads(refs), dim=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))

    frames = sample_frames(refs, every_n=30, max_frames=4)
    fr = frames.collect()
    assert len(fr) > 0
    assert all(r["frame_no"] % 30 == 0 for r in fr)


def _write_bmp(path, width, height):
    """Minimal 24-bit uncompressed BMP writer (test fixture)."""
    import struct

    row = ((3 * width + 3) // 4) * 4
    data = bytearray()
    for y in range(height):
        for x in range(width):
            data += bytes([(x * 7) % 256, (y * 11) % 256, (x + y) % 256])
        data += b"\x00" * (row - 3 * width)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(data), 2835, 2835, 0, 0)
    path.write_bytes(header + info + data)


def _write_ppm(path, width, height):
    body = bytes((x * y) % 256 for y in range(height) for x in range(width) for _ in range(3))
    path.write_bytes(b"P6\n# fixture\n%d %d\n255\n" % (width, height) + body)


def _write_wav(path, seconds, rate=8000, channels=1):
    import math
    import wave as wv

    n = int(seconds * rate)
    frames = b"".join(
        int(12000 * math.sin(2 * math.pi * 440 * i / rate)).to_bytes(
            2, "little", signed=True
        ) * channels
        for i in range(n)
    )
    with wv.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames)


def test_real_decoders(spark, tmp_path):
    """BMP/PPM/WAV decode end-to-end with fake=False: real file fetch,
    real pure-Python decode, real width/height/duration out."""
    _write_bmp(tmp_path / "a.bmp", 13, 7)
    _write_ppm(tmp_path / "b.ppm", 9, 5)
    _write_wav(tmp_path / "c.wav", 1.5, rate=8000, channels=2)

    refs = spark.createDataFrame(
        [("d1", 0, f"file://{tmp_path}/a.bmp", "image"),
         ("d1", 1, str(tmp_path / "b.ppm"), "image"),
         ("d2", 0, str(tmp_path / "c.wav"), "audio")],
        "doc_id string, media_idx int, media_ref string, media_type string",
    )
    out = {
        (r["doc_id"], r["media_idx"]): r
        for r in decode_features(fetch_payloads(refs, fake=False),
                                 dim=8, fake=False).collect()
    }
    bmp, ppm, wav = out[("d1", 0)], out[("d1", 1)], out[("d2", 0)]
    assert (bmp["width"], bmp["height"]) == (13, 7)
    assert (ppm["width"], ppm["height"]) == (9, 5)
    assert wav["duration"] == 1.5 and wav["sample_rate"] == 8000
    assert wav["channels"] == 2 and wav["width"] is None
    for r in (bmp, ppm, wav):
        assert len(r["feature"]) == 8
        assert all(f is not None and 0.0 <= f <= 1.0 for f in r["feature"])
    # a 440 Hz sine's RMS envelope is ~0.66 of peak amplitude everywhere
    assert all(abs(f - 12000 / 32768 * 0.707) < 0.05 for f in wav["feature"])


def test_fake_decode_survives_magic_collision(spark):
    """A fabricated payload whose first bytes collide with a real
    decoder's magic (b'BM', b'P5'...) must fall back to the
    pseudo-decode under fake=True instead of crashing the task."""
    import pytest

    rows = [
        ("d1", 0, "image", bytearray(b"BM" + bytes(range(64)))),
        ("d2", 0, "image", bytearray(b"P5 garbage not a header")),
        ("d3", 0, "audio", bytearray(b"RIFF\x00\x00\x00\x00WAVEjunk")),
    ]
    payloads = spark.createDataFrame(
        rows, "doc_id string, media_idx int, media_type string, payload binary"
    )
    out = {r["doc_id"]: r for r in decode_features(payloads, dim=4).collect()}
    assert len(out) == 3
    # pseudo-decode contract: width/height = first two payload bytes + 1
    assert out["d1"]["width"] == ord("B") + 1
    assert out["d1"]["height"] == ord("M") + 1
    # fake=False must still surface the corruption
    with pytest.raises(Exception):
        decode_features(payloads, dim=4, fake=False).collect()


def test_pnm_16bit_samples_are_big_endian(spark):
    """PNM stores maxval>255 samples MSB-first; a constant-value 16-bit
    PGM must decode to that constant, not its byte-swapped garbage."""
    w, h, val, maxval = 6, 4, 0x1234, 65535
    body = val.to_bytes(2, "big") * (w * h)
    buf = b"P5\n%d %d\n%d\n" % (w, h, maxval) + body
    payloads = spark.createDataFrame(
        [("d1", 0, "image", bytearray(buf))],
        "doc_id string, media_idx int, media_type string, payload binary",
    )
    (r,) = decode_features(payloads, dim=4, fake=False).collect()
    assert (r["width"], r["height"]) == (w, h)
    expect = val / maxval
    assert all(abs(f - expect) < 1e-4 for f in r["feature"])


def test_incremental_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a committed batch
    must not duplicate decisions or MPI rows, and must not re-link the
    batch against an MPI containing its own records."""
    from recordlinker_spark.streaming.incremental import IncrementalLinker

    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "decisions")
    sink = IncrementalLinker(spark, mpi_dir, dec_dir, dibbs_default())
    batch = spark.createDataFrame(
        docs_to_rows(
            [(f"r{i}", p, []) for i, p in enumerate(SIX_PATIENTS[:3])]
        ),
        DOCUMENTS_SCHEMA,
    )
    sink(batch, 0)
    first_dec = sorted(
        map(tuple, spark.read.parquet(dec_dir).drop("run_id", "batch_id").collect())
    )
    first_mpi = spark.read.parquet(mpi_dir).count()
    # replay the same (batch_df, batch_id) — the guard must skip it
    sink(batch, 0)
    assert sorted(
        map(tuple, spark.read.parquet(dec_dir).drop("run_id", "batch_id").collect())
    ) == first_dec
    assert spark.read.parquet(mpi_dir).count() == first_mpi


def test_streaming_incremental_link(spark, tmp_path):
    """The stream (1 file per micro-batch) reproduces the sequential
    linking outcome of the 6-patient scenario: [no,match,no,match,no,no],
    cluster sizes [1,1,1,3] (reference test_link.py:322-327)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    # one parquet file per record, named so file order = record order
    for i, p in enumerate(SIX_PATIENTS):
        df = spark.createDataFrame(
            docs_to_rows([(f"r{i}", p, [(2, f"m://{i}")])]), DOCUMENTS_SCHEMA
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"batch_{i}"))

    alg = dibbs_default()
    # process files strictly one directory at a time, in order
    for i in range(len(SIX_PATIENTS)):
        q = link_stream(
            spark, str(src / f"batch_{i}"), mpi_dir, dec_dir,
            f"{ckpt}/{i}", alg,
        )
        q.awaitTermination(120)

    decisions = spark.read.parquet(dec_dir)
    rows = {r["record_id"]: r for r in decisions.collect()}
    assert len(rows) == 6
    matches = [rows[f"r{i}"]["final_grade"] == "certain" for i in range(6)]
    assert matches == [False, True, False, True, False, False]
    sizes = sorted(
        r["count"]
        for r in spark.read.parquet(mpi_dir)
        .groupBy("person_id").count().collect()
    )
    assert sizes == [1, 1, 1, 3]


def _encode_png(pixels, color_type, filters, palette=None):
    """Minimal PNG writer (test fixture): 8-bit depth, explicit per-row
    filter types, forward-filtering computed here so the decoder's
    unfilter pass is exercised for real."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.int64)
    if px.ndim == 2:
        px = px[:, :, None]
    height, width, nch = px.shape
    bpp = nch
    flat = px.reshape(height, width * nch)
    raw = bytearray()
    prev = np.zeros(width * nch, np.int64)
    for y, f in zip(range(height), filters):
        line = flat[y]
        if f == 0:
            filt = line
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            filt = (line - left) % 256
        elif f == 2:
            filt = (line - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            filt = (line - (left + prev) // 2) % 256
        elif f == 4:
            filt = np.zeros(width * nch, np.int64)
            for i in range(width * nch):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (line[i] - pr) % 256
        raw += bytes([f]) + bytes(filt.astype(np.uint8))
        prev = line

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(np.asarray(palette, np.uint8).ravel()))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_png_decoder_all_filters_and_color_types(spark, tmp_path):
    """The stdlib PNG decoder must invert every filter type (None/Sub/
    Up/Average/Paeth) and handle gray / RGB / RGBA / gray+alpha /
    palette at 8-bit depth; dim == n_pixels makes the pooled feature
    the exact grayscale image."""
    import numpy as np

    from recordlinker_spark.operators.media import _decode_png

    rng = np.random.RandomState(7)
    h, w = 5, 6

    # gray, all five filters, one per row
    g = rng.randint(0, 256, size=(h, w))
    got = _decode_png(_encode_png(g, 0, [0, 1, 2, 3, 4]), dim=h * w)
    assert (got["width"], got["height"]) == (w, h)
    assert np.allclose(got["feature"], (g.ravel() / 255.0), atol=1e-6)

    # RGB with Paeth/Average-heavy filter mix
    rgb = rng.randint(0, 256, size=(h, w, 3))
    got = _decode_png(_encode_png(rgb, 2, [4, 3, 4, 1, 2]), dim=h * w)
    want = rgb.astype(np.float64).mean(axis=2).ravel() / 255.0
    assert np.allclose(got["feature"], want, atol=1e-5)

    # RGBA: alpha ignored
    rgba = rng.randint(0, 256, size=(h, w, 4))
    got = _decode_png(_encode_png(rgba, 6, [1, 4, 0, 2, 3]), dim=h * w)
    want = rgba[..., :3].astype(np.float64).mean(axis=2).ravel() / 255.0
    assert np.allclose(got["feature"], want, atol=1e-5)

    # gray+alpha: first channel only
    ga = rng.randint(0, 256, size=(h, w, 2))
    got = _decode_png(_encode_png(ga, 4, [2, 1, 4, 3, 0]), dim=h * w)
    assert np.allclose(
        got["feature"], ga[..., 0].ravel() / 255.0, atol=1e-6
    )

    # palette
    pal = rng.randint(0, 256, size=(16, 3))
    idx = rng.randint(0, 16, size=(h, w))
    got = _decode_png(_encode_png(idx, 3, [0, 1, 2, 3, 4], palette=pal), dim=h * w)
    want = pal.astype(np.float64).mean(axis=1)[idx].ravel() / 255.0
    assert np.allclose(got["feature"], want, atol=1e-5)


def test_png_end_to_end_real_fetch(spark, tmp_path):
    """PNG joins BMP/PPM/WAV in the fake=False real-decode path."""
    import numpy as np

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(7, 13, 3))
    (tmp_path / "p.png").write_bytes(_encode_png(img, 2, [0, 4, 1, 2, 3, 4, 1]))
    refs = spark.createDataFrame(
        [("d1", 0, str(tmp_path / "p.png"), "image")],
        "doc_id string, media_idx int, media_ref string, media_type string",
    )
    (row,) = decode_features(
        fetch_payloads(refs, fake=False), dim=8, fake=False
    ).collect()
    assert (row["width"], row["height"]) == (13, 7)
    assert len(row["feature"]) == 8
    assert all(0.0 <= f <= 1.0 for f in row["feature"])


def test_png_unsupported_variants_stay_gated(spark):
    """16-bit and interlaced PNGs must raise under fake=False (codec
    gate), not silently mis-decode."""
    import struct
    import zlib as zl

    import pytest

    from recordlinker_spark.operators.media import _decode_png

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zl.crc32(c) & 0xFFFFFFFF
        )

    for depth, interlace in [(16, 0), (8, 1)]:
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 0, 0, 0, interlace)
        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zl.compress(b"\x00" * 12))
               + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            _decode_png(buf, dim=4)


# ---------------------------------------------------------------- JPEG
# Minimal baseline JPEG ENCODER (test fixture): forward DCT + quantize
# + canonical Huffman with simple fixed-length tables emitted in DHT
# (the decoder reads whatever DHT declares — no Annex K dependency).
# All-ones quant tables make the round-trip near-lossless so decoded
# luma can be compared to the source image within DCT rounding.

_JDC_SYMS = list(range(12))                      # DC categories, len-4 codes
_JAC_SYMS = [0x00, 0xF0] + [                      # EOB, ZRL, then (r,s)
    (r << 4) | s for r in range(16) for s in range(1, 11)
]                                                 # 162 syms, len-8 codes


def _jhuff(symbols, length):
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, {s: (i, length) for i, s in enumerate(symbols)}


class _JBits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _jcat(v):
    return v.bit_length() if v > 0 else (-v).bit_length()


def _jencode_block(bw, coeffs, dc_pred, dc_codes, ac_codes):
    import numpy as np

    from recordlinker_spark.operators.jpeg import ZIGZAG

    zz = coeffs.reshape(64)[ZIGZAG].astype(np.int64)
    diff = int(zz[0]) - dc_pred
    t = _jcat(diff)
    bw.put(*dc_codes[t])
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max([i for i in range(1, 64) if zz[i]], default=0)
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                bw.put(*ac_codes[0x00])  # EOB
                break
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])
            run -= 16
        s = _jcat(v)
        bw.put(*ac_codes[(run << 4) | s])
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def _encode_jpeg(gray, subsample=None, restart_interval=0):
    """gray HxW uint8 -> baseline JFIF bytes.  subsample=None emits a
    single-component (grayscale) JPEG; '444' / '420' emit 3-component
    YCbCr with constant neutral chroma (Cb=Cr=128 -> zero blocks)."""
    import struct as st

    import numpy as np

    from recordlinker_spark.operators.jpeg import _T, ZIGZAG

    gray = np.asarray(gray, dtype=np.float64)
    h, w = gray.shape
    dc_bits, dc_codes = _jhuff(_JDC_SYMS, 4)
    ac_bits, ac_codes = _jhuff(_JAC_SYMS, 8)
    q = np.ones(64)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    if subsample is None:
        comps = [(1, 1, 1)]
    else:
        yh = yv = (2 if subsample == "420" else 1)
        if subsample == "422":
            yh, yv = 2, 1
        comps = [(1, yh, yv), (2, 1, 1), (3, 1, 1)]
    sof = st.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof
    for cls, bits, syms in [(0, dc_bits, _JDC_SYMS), (1, ac_bits, _JAC_SYMS)]:
        body = bytes([cls << 4]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + st.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + st.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    ypad = np.full((mcus_y * vmax * 8, mcus_x * hmax * 8), 128.0)
    ypad[:h, :w] = gray
    zero = np.zeros((8, 8))

    bw = _JBits()
    preds = {cid: 0 for cid, _, _ in comps}
    segs = []
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                segs.append(bytes(bw.out))
                bw = _JBits()
                preds = {cid: 0 for cid, _, _ in comps}
            for cid, ch, cv in comps:
                for by in range(cv):
                    for bx in range(ch):
                        if cid == 1:
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            blk = ypad[y0:y0 + 8, x0:x0 + 8] - 128.0
                        else:
                            blk = zero  # neutral chroma
                        coeffs = np.round((_T @ blk @ _T.T) / q.reshape(8, 8))
                        preds[cid] = _jencode_block(
                            bw, coeffs, preds[cid], dc_codes, ac_codes
                        )
            mcu_count += 1
    bw.flush()
    segs.append(bytes(bw.out))
    for i, seg in enumerate(segs):
        out += seg
        if i < len(segs) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decoder_round_trip():
    """Baseline JPEG: grayscale, 4:4:4 and 4:2:0 YCbCr, and restart
    markers all decode to the source luma within DCT rounding."""
    import numpy as np

    from recordlinker_spark.operators.jpeg import decode_jpeg_gray

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(21, 29)).astype(np.uint8)

    for kwargs in [
        {},                                 # single-component grayscale
        {"subsample": "444"},
        {"subsample": "420"},
        {"subsample": "422"},
        {"restart_interval": 2},
        {"subsample": "420", "restart_interval": 3},
    ]:
        buf = _encode_jpeg(img, **kwargs)
        w, h, gray = decode_jpeg_gray(buf)
        assert (w, h) == (29, 21), kwargs
        assert gray.shape == (21, 29), kwargs
        err = np.abs(gray - img.astype(np.float64)).max()
        assert err <= 4.0, (kwargs, err)  # all-ones quant ~= lossless


def test_jpeg_progressive_stays_gated():
    import struct as st

    import numpy as np
    import pytest

    from recordlinker_spark.operators.jpeg import decode_jpeg_gray

    sof = st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    buf = (b"\xff\xd8" + b"\xff\xc2" + st.pack(">H", 2 + len(sof)) + sof
           + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(buf)


def test_jpeg_end_to_end_real_fetch(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    (tmp_path / "x.jpg").write_bytes(_encode_jpeg(img, subsample="420"))
    refs = spark.createDataFrame(
        [("d1", 0, str(tmp_path / "x.jpg"), "image")],
        "doc_id string, media_idx int, media_ref string, media_type string",
    )
    (row,) = decode_features(
        fetch_payloads(refs, fake=False), dim=8, fake=False
    ).collect()
    assert (row["width"], row["height"]) == (24, 16)
    assert len(row["feature"]) == 8
    want = float(img.mean() / 255.0)
    got = sum(row["feature"]) / 8
    assert abs(got - want) < 0.02


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes; the
    marker walk must skip them, not misread a segment length."""
    import numpy as np

    from recordlinker_spark.operators.jpeg import decode_jpeg_gray

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(9, 11)).astype(np.uint8)
    buf = _encode_jpeg(img)
    # pad fill bytes before the SOF and DHT markers
    buf = buf.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1)
    buf = buf.replace(b"\xff\xc4", b"\xff\xff\xff\xff\xc4", 1)
    w, h, gray = decode_jpeg_gray(buf)
    assert (w, h) == (11, 9)
    assert np.abs(gray - img.astype(np.float64)).max() <= 4.0


# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame-header walk
# ---------------------------------------------------------------------------

def _mp3_cbr(n_frames, *, br_idx=9, sr_idx=0, stereo=True):
    """MPEG-1 Layer III CBR frames: header + zero payload.  br_idx 9 =
    128 kbps; sr_idx 0 = 44100 Hz; frame_len = 144*kbps*1000//rate."""
    kbps = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320)[br_idx]
    rate = (44100, 48000, 32000)[sr_idx]
    flen = 144 * kbps * 1000 // rate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2),
                 0x00 if stereo else 0xC0])
    return (hdr + b"\x00" * (flen - 4)) * n_frames


def test_mp3_cbr_metadata():
    from recordlinker_spark.operators.media import _decode_mp3

    out = _decode_mp3(_mp3_cbr(38), dim=8)
    assert out["sample_rate"] == 44100 and out["channels"] == 2
    assert abs(out["duration"] - 38 * 1152 / 44100) < 1e-9
    assert out["width"] is None and out["height"] is None
    # CBR: the bitrate envelope is flat at 128/448
    assert all(abs(f - 128 / 448) < 1e-6 for f in out["feature"])


def test_mp3_vbr_id3_and_trailing_tag():
    """VBR MPEG-2 mono with an ID3v2 prefix and an ID3v1 trailer:
    duration must sum per-frame samples/rate; the walk must skip the
    leading tag and stop cleanly at the trailing one."""
    from recordlinker_spark.operators.media import _decode_mp3

    frames = b""
    idxs = [5, 9, 14, 9, 5, 2]
    for br_idx in idxs:
        kbps = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                96, 112, 128, 144, 160)[br_idx]
        flen = 72 * kbps * 1000 // 16000
        # sync 111, version 10 (MPEG-2), layer 01 (III), prot 1 -> 0xF3
        hdr = bytes([0xFF, 0xF3, (br_idx << 4) | (2 << 2), 0xC0])
        frames += hdr + b"\x00" * (flen - 4)
    pad = 200
    id3v2 = b"ID3" + b"\x04\x00" + b"\x00" + bytes(
        [(pad >> 21) & 0x7F, (pad >> 14) & 0x7F, (pad >> 7) & 0x7F, pad & 0x7F]
    )
    buf = id3v2 + b"\x00" * pad + frames + b"TAG" + b"\x00" * 125
    out = _decode_mp3(buf, dim=3)
    assert out["sample_rate"] == 16000 and out["channels"] == 1
    assert abs(out["duration"] - len(idxs) * 576 / 16000) < 1e-9
    # envelope follows the VBR profile: middle pooled segment hottest
    assert out["feature"][1] > out["feature"][0] > out["feature"][2]


def test_mp3_end_to_end_real_fetch(spark, tmp_path):
    (tmp_path / "a.mp3").write_bytes(_mp3_cbr(25, br_idx=11, sr_idx=1))
    refs = spark.createDataFrame(
        [("d1", 0, str(tmp_path / "a.mp3"), "audio")],
        "doc_id string, media_idx int, media_ref string, media_type string",
    )
    (row,) = decode_features(
        fetch_payloads(refs, fake=False), dim=4, fake=False
    ).collect()
    assert row["sample_rate"] == 48000 and row["channels"] == 2
    assert abs(row["duration"] - 25 * 1152 / 48000) < 1e-9
    assert len(row["feature"]) == 4


def test_mp3_garbage_raises():
    import pytest

    from recordlinker_spark.operators.media import _decode_mp3

    with pytest.raises(ValueError, match="no MPEG audio frames"):
        _decode_mp3(b"ID3" + b"\x04\x00\x00" + b"\x00\x00\x00\x00", dim=4)


def test_jpeg_fill_bytes_in_entropy_data():
    """T.81 B.1.1.2 also applies inside the scan: fill bytes may
    precede a restart marker or the EOI; _split_segments must treat
    FF FF+ <marker> as fill, not as the scan terminator."""
    import numpy as np

    from recordlinker_spark.operators.jpeg import decode_jpeg_gray

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    buf = _encode_jpeg(img, restart_interval=1)
    base = decode_jpeg_gray(buf)[2]
    # one fill byte before the first RST0 and two before the EOI
    patched = buf.replace(b"\xff\xd0", b"\xff\xff\xd0", 1)
    patched = patched[:-2] + b"\xff\xff" + b"\xff\xd9"
    w, h, gray = decode_jpeg_gray(patched)
    assert (w, h) == (16, 16)
    assert np.array_equal(gray, base)


def test_mp3_id3v24_footer():
    """An ID3v2.4 tag with the footer flag (0x10) is 10 bytes longer
    than header+size; the frame walk must skip the footer too."""
    from recordlinker_spark.operators.media import _decode_mp3

    body = _mp3_cbr(12)
    pad = 30
    tag = b"ID3" + b"\x04\x00" + b"\x10" + bytes(
        [0, 0, (pad >> 7) & 0x7F, pad & 0x7F]
    ) + b"\x00" * pad + b"3DI" + b"\x04\x00" + b"\x10" + bytes(
        [0, 0, (pad >> 7) & 0x7F, pad & 0x7F]
    )
    out = _decode_mp3(tag + body, dim=4)
    assert out["sample_rate"] == 44100
    assert abs(out["duration"] - 12 * 1152 / 44100) < 1e-9


def test_mp3_sniff_rejects_single_plausible_header():
    """A fabricated payload whose first 4 bytes parse as one MPEG
    frame header must not dispatch to the MP3 decoder: the sniff
    requires the first frame to chain to a second valid header (or
    fill the payload exactly)."""
    from recordlinker_spark.operators.media import (
        _decode_payload,
        _sniff_mp3,
    )

    # FF FB 90 00 = valid MPEG-1 L3 128kbps header, then garbage that
    # does not contain a second header at the 417-byte frame boundary
    fake = b"\xff\xfb\x90\x00" + b"\x01" * 600
    assert not _sniff_mp3(fake)
    assert _decode_payload(fake, 4) is None
    # a single frame filling the payload exactly IS accepted
    assert _sniff_mp3(_mp3_cbr(1))
    # and chained frames are accepted
    assert _sniff_mp3(_mp3_cbr(3) + b"junk")


def test_mp3_xing_header_frame_excluded():
    """A LAME/FFmpeg Xing/Info first frame is encoder metadata with no
    audio: it must not contribute to duration or the envelope."""
    from recordlinker_spark.operators.media import _decode_mp3

    frames = _mp3_cbr(10)
    flen = len(frames) // 10
    xing = bytearray(frames[:flen])
    xing[36:40] = b"Xing"  # side-info offset for MPEG-1 stereo
    buf = bytes(xing) + frames
    out = _decode_mp3(buf, dim=4)
    assert abs(out["duration"] - 10 * 1152 / 44100) < 1e-9
    assert all(abs(f - 128 / 448) < 1e-6 for f in out["feature"])


def test_streaming_sink_persists_external_person_id(spark, tmp_path):
    """The streaming MPI insert path must carry a document-level
    external_person_id like the batch CLI paths — the stream must not
    be the one insert mode that writes NULL external ids."""
    from recordlinker_spark.streaming.incremental import IncrementalLinker

    mpi_dir = str(tmp_path / "mpi")
    dec_dir = str(tmp_path / "dec")
    sink = IncrementalLinker(
        spark, mpi_dir, dec_dir, dibbs_default(), run_id="t"
    )
    batch = spark.createDataFrame(
        docs_to_rows([("s0", SIX_PATIENTS[0], [])]), DOCUMENTS_SCHEMA
    ).withColumn("external_person_id", F.lit("EXT-STREAM-1"))
    sink(batch, 0)

    (row,) = spark.read.parquet(mpi_dir).collect()
    assert row["record_id"] == "s0"
    assert row["external_person_id"] == "EXT-STREAM-1"
    assert row["external_person_source"] == "IRIS"

    # a plain docs batch (no column) still inserts with NULLs
    batch2 = spark.createDataFrame(
        docs_to_rows([("s1", SIX_PATIENTS[2], [])]), DOCUMENTS_SCHEMA
    )
    sink(batch2, 1)
    rows = {r["record_id"]: r for r in spark.read.parquet(mpi_dir).collect()}
    assert rows["s1"]["external_person_id"] is None
    assert rows["s1"]["external_person_source"] is None


# ----------------------------------------------------------------- GIF

def _encode_gif(indices, palette, interlace=False):
    """Minimal GIF89a writer (test fixture): no-compression LZW (a
    CLEAR code after every pixel keeps the dictionary empty and the
    code width fixed), optional interlaced row order."""
    import struct as st

    h, w = indices.shape
    mcs = 2
    while (1 << mcs) < len(palette):
        mcs += 1
    clear, end, code_size = 1 << mcs, (1 << mcs) + 1, mcs + 1
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", w, h, 0x80 | (mcs - 1), 0, 0)
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += st.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    rows = list(range(h))
    if interlace:
        rows = [r for step, start in ((8, 0), (8, 4), (4, 2), (2, 1))
                for r in range(start, h, step)]
    bitbuf = nbits = 0
    data = bytearray()

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            data.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    for r in rows:
        for px in indices[r]:
            emit(int(px))
            emit(clear)
    emit(end)
    if nbits:
        data.append(bitbuf & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decoder_round_trip():
    import numpy as np

    from recordlinker_spark.operators.media import _decode_gif

    rng = np.random.RandomState(9)
    palette = [(i * 17 % 256, i * 29 % 256, i * 53 % 256) for i in range(8)]
    idx = rng.randint(0, 8, size=(11, 7)).astype(np.uint8)
    for interlace in (False, True):
        out = _decode_gif(_encode_gif(idx, palette, interlace), dim=4)
        assert (out["width"], out["height"]) == (7, 11)
        gray = np.array([sum(c) / 3 for c in palette], dtype=np.float32)
        want = float(gray[idx].mean() / 255.0)
        got = sum(out["feature"]) / 4
        assert abs(got - want) < 1e-3


def test_gif_real_lzw_dictionary_growth():
    """A genuinely LZW-compressed stream (single CLEAR, growing
    dictionary, code-width increments) decodes correctly: exercises
    the code==len(table) self-reference case and deferred widening."""
    import numpy as np

    from recordlinker_spark.operators.media import _gif_lzw

    idx = np.tile(np.arange(4, dtype=np.uint8), 64)  # 0123 0123 ...
    mcs, clear, end = 2, 4, 5

    # textbook LZW encoder producing the code stream
    table = {bytes([i]): i for i in range(4)}
    next_code = 6
    codes, cur = [], b""
    for px in idx.tolist():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
        else:
            codes.append(table[cur])
            table[nxt] = next_code
            next_code += 1
            cur = bytes([px])
    codes.append(table[cur])
    stream = [clear] + codes + [end]

    # pack bits LSB-first, widening exactly when the DECODER's table
    # (which lags the encoder's by one entry) hits the width limit
    bitbuf = nbits = 0
    data = bytearray()
    code_size, dec_table, prev_seen = mcs + 1, 6, False
    for c in stream:
        bitbuf |= c << nbits
        nbits += code_size
        while nbits >= 8:
            data.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        if c == clear:
            code_size, dec_table, prev_seen = mcs + 1, 6, False
            continue
        if c == end:
            break
        if prev_seen:
            dec_table += 1
            if dec_table == (1 << code_size) and code_size < 12:
                code_size += 1
        prev_seen = True
    if nbits:
        data.append(bitbuf & 0xFF)

    got = _gif_lzw(bytes(data), mcs, len(idx))
    assert bytes(got) == idx.tobytes()


def test_gif_end_to_end_real_fetch(spark, tmp_path):
    import numpy as np

    from recordlinker_spark.operators.media import decode_features, fetch_payloads

    rng = np.random.RandomState(4)
    palette = [(v, v, v) for v in range(0, 256, 16)]
    idx = rng.randint(0, len(palette), size=(6, 9)).astype(np.uint8)
    (tmp_path / "g.gif").write_bytes(_encode_gif(idx, palette))
    refs = spark.createDataFrame(
        [("d1", 0, str(tmp_path / "g.gif"), "image")],
        "doc_id string, media_idx int, media_ref string, media_type string",
    )
    (row,) = decode_features(
        fetch_payloads(refs, fake=False), dim=8, fake=False
    ).collect()
    assert (row["width"], row["height"]) == (9, 6)
    gray = np.array([v for v, _, _ in palette], dtype=np.float32)
    # mean-of-segment-means, not the global mean: 54 px / 8 bins pool
    # unevenly, so compare at the same tolerance as the JPEG twin
    assert abs(sum(row["feature"]) / 8 - gray[idx].mean() / 255.0) < 0.02
