"""Baseline JPEG decoder — pure stdlib + numpy, no codec library.

Implements the ITU-T T.81 baseline sequential process (SOF0, and the
identically-coded extended-sequential SOF1): marker parse, canonical
Huffman decode (F.2.2.3 mincode/maxcode/valptr), dequantization,
orthonormal 8x8 IDCT via two matrix multiplies, restart markers, and
arbitrary per-component sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...).

Scope is the media-feature stage (operators/media.py): the pipeline
needs a GRAYSCALE image, so only the luma (first) component is
dequantized and inverse-transformed — chroma blocks are still
entropy-decoded (the bitstream interleaves them) but their
coefficients are discarded, skipping their IDCTs.  Progressive
(SOF2), arithmetic-coded, hierarchical, and 12-bit frames raise
``NotImplementedError`` and stay behind the codec gate.

Payloads at this stage are thumbnails/metadata-scale; the entropy
decode is per-bit Python and documented as such — full-rate decode is
the library boundary, as for MP3/video.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: index into the 8x8 block for each of the 64 scan positions
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# orthonormal DCT-II basis: spatial = T.T @ coeffs @ T (T.81 A.3.3)
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _T[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        )


class _HuffTable:
    """Canonical Huffman table (T.81 C.2) with the F.2.2.3 decode
    arrays: per code length, the smallest/largest code and the index of
    its first symbol."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffed
    0xFF00 bytes already unstuffed by the caller)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # T.81 F.2.2.5: a truncated segment pads with 1-bits so a
            # final EOB/DC completes; genuinely corrupt streams fail
            # the marker scan instead
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[length]:
                return table.values[
                    table.valptr[length] + code - table.mincode[length]
                ]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t low-order bits to a signed
    coefficient."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _split_segments(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``: unstuff 0xFF00, split at
    restart markers, stop at any other marker.  Returns (segments,
    index of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker; treat all but the last 0xFF as fill so a padded RST
        # or EOI still parses (only FF 00 is stuffed data)
        j = i
        while j + 1 < n and buf[j + 1] == 0xFF:
            j += 1
        if j + 1 >= n:
            i = j
            break
        m = buf[j + 1]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            i = j
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg_gray(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline JPEG to its luma plane.

    :returns: (width, height, float32 grayscale array in 0..255 at the
        luma component's resolution — full resolution whenever Y is the
        max-sampled component, i.e. every standard subsampling).
    """
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (width, height, components)
    i = 2
    n = len(buf)
    while i + 4 <= n:
        if buf[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        if buf[i + 1] == 0xFF:
            # T.81 B.1.1.2: markers may be preceded by any number of
            # 0xFF fill bytes — skip them, they are not a marker code
            i += 1
            continue
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, i + 2)
        data = buf[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                prec, tid = data[p] >> 4, data[p] & 0x0F
                p += 1
                if prec:
                    q = np.frombuffer(data, ">u2", 64, p).astype(np.float64)
                    p += 128
                else:
                    q = np.frombuffer(data, np.uint8, 64, p).astype(np.float64)
                    p += 64
                qtables[tid] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                cls, tid = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = data[p + 17 : p + 17 + nv]
                (huff_ac if cls else huff_dc)[tid] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline-decodable
            precision = data[0]
            if precision != 8:
                raise NotImplementedError(
                    f"unsupported JPEG precision {precision}"
                )
            height, width = struct.unpack_from(">HH", data, 1)
            ncomp = data[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "unsupported JPEG process (progressive/arithmetic/"
                "hierarchical) — only baseline sequential is decoded"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            scan = []
            for s in range(ns):
                cs, tdta = data[1 + 2 * s : 3 + 2 * s]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            segs, _end = _split_segments(buf, i + 2 + seglen)
            return _decode_scan(
                frame, scan, segs, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(frame, scan, segs, qtables, huff_dc, huff_ac,
                 restart_interval) -> tuple[int, int, np.ndarray]:
    width, height, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        order.append(
            {
                "comp": c,
                "dc": huff_dc[td],
                "ac": huff_ac[ta],
                "q": qtables[c["tq"]],
            }
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    luma = order[0]
    lh, lv = luma["comp"]["h"], luma["comp"]["v"]
    plane = np.zeros((mcus_y * lv * 8, mcus_x * lh * 8), np.float32)
    # non-interleaved single-component scan (T.81 A.2.2): MCU = one
    # block and the MCU grid is that component's own block grid.  (In
    # a sequential multi-scan file the FIRST scan is luma at full
    # sampling, which is all the gray pipeline needs.)
    interleaved = len(order) > 1
    if not interleaved:
        lh = lv = 1
        mcus_x = -(-width // 8)
        mcus_y = -(-height // 8)
        plane = np.zeros((mcus_y * 8, mcus_x * 8), np.float32)

    dc_pred = {id(o): 0 for o in order}
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    mcu_count = 0
    total_mcus = mcus_x * mcus_y
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                try:
                    reader = _BitReader(next(seg_iter))
                except StopIteration as exc:
                    raise ValueError(
                        "JPEG restart marker missing mid-scan"
                    ) from exc
                for o in order:
                    dc_pred[id(o)] = 0
            for oi, o in enumerate(order):
                ch = o["comp"]["h"] if interleaved else 1
                cv = o["comp"]["v"] if interleaved else 1
                for by in range(cv):
                    for bx in range(ch):
                        block = _decode_block(
                            reader, o, dc_pred, skip_dequant=oi != 0
                        )
                        if oi == 0:
                            sp = _T.T @ block @ _T + 128.0
                            y0 = (my * lv + by) * 8
                            x0 = (mx * lh + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = sp
            mcu_count += 1
    if mcu_count != total_mcus:
        raise ValueError("JPEG scan ended early")
    # crop the padded plane to the luma component's true dimensions
    cw = -(-width * luma["comp"]["h"] // hmax) if interleaved else width
    chh = -(-height * luma["comp"]["v"] // vmax) if interleaved else height
    return width, height, np.clip(plane[:chh, :cw], 0.0, 255.0)


def _decode_block(
    reader: _BitReader, o: dict, dc_pred: dict, skip_dequant: bool = False
) -> np.ndarray | None:
    """Entropy-decode one 8x8 block and dequantize (T.81 F.2.2).

    With ``skip_dequant`` the bitstream is still fully consumed and
    the DC predictor updated (both mandatory to stay in sync), but the
    dequant multiply + zigzag scatter are skipped and None returned —
    the luma-only pipeline discards chroma coefficients anyway."""
    coeffs = np.zeros(64, np.float64)
    t = reader.decode_symbol(o["dc"])
    diff = _extend(reader.read_bits(t), t) if t else 0
    dc_pred[id(o)] += diff
    coeffs[0] = dc_pred[id(o)]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(o["ac"])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        coeffs[k] = _extend(reader.read_bits(s), s)
        k += 1
    if skip_dequant:
        return None
    block = np.zeros(64, np.float64)
    block[ZIGZAG] = coeffs * o["q"]
    return block.reshape(8, 8)
