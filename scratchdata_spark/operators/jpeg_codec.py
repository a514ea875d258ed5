"""Pure-stdlib+numpy baseline JPEG codec for the multimodal seam.

Round-5 verdict "What's missing #1": PNG/PPM/WAV decode for real in
this container but JPEG — the dominant real-world image format —
remained an env-gated ``NotImplementedError`` seam. This module
closes it the same way png_codec.py closed PNG: written from the
public spec (ITU-T T.81 baseline sequential DCT; JFIF color space),
no imaging library, so the decode path is testable in-sandbox and the
identical seam accepts a PIL/libjpeg drop-in where available.

Scope — the baseline-profile common case:
* decode: SOF0 (baseline sequential), 8-bit, Huffman entropy coding,
  1 or 3 components, chroma sampling factors 1–2 (4:4:4 / 4:2:2 /
  4:2:0; replication upsampling), restart markers. Progressive
  (SOF2), arithmetic coding, and 12-bit raise ValueError — the seam
  surfaces them like any other unsupported payload.
* encode: 4:4:4 (or single-component grayscale), one shared
  quantization table (default all-ones — near-lossless, ±1-level
  DCT rounding — so the codec round-trip test can assert pixels, not
  vibes), fixed canonical Huffman tables the encoder emits in its
  own DHT segment (valid-by-construction 5-bit DC / 9-bit AC codes;
  compression ratio is irrelevant here, spec conformance is not).

Pixels are (width, height, channels, bytes row-major) — the same
tuple contract as png_codec. The 8×8 DCT runs as two numpy 8×8
matrix products per block (the orthonormal DCT-II basis), executor-
side inside Arrow batches; no Python-per-pixel math in the transform.
"""

from __future__ import annotations

import math
import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag index -> (row, col), generated from the diagonal rule rather
# than transcribed (even diagonals run bottom-left -> top-right)
_ZZ: list[tuple[int, int]] = []
for _s in range(15):
    for _r in range(_s, -1, -1) if _s % 2 == 0 else range(0, _s + 1):
        _c = _s - _r
        if _r < 8 and _c < 8:
            _ZZ.append((_r, _c))
assert len(_ZZ) == 64

# orthonormal 8-point DCT-II basis: T[u, x] = 0.5 c(u) cos((2x+1)uπ/16)
_T = np.array(
    [
        [
            0.5
            * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def sniff_jpeg(data: bytes) -> bool:
    return bytes(data[:3]) == JPEG_MAGIC


# --------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:  # pad with 1s per spec
            self.write(1, 1)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00; any other marker
    ends the segment (the MCU loop consumes RSTn itself)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.d):
                raise ValueError("jpeg: truncated entropy data")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else None
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker: behave as truncation-at-marker
                    self.pos -= 1
                    raise ValueError("jpeg: marker inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        self._n = 0


# ------------------------------------------------------- Huffman


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(counts: list[int], symbols: list[int]) -> dict:
    """{symbol: (code, length)} — the encoder-side view."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


# fixed encoder tables: 12 DC categories as 5-bit codes, the 162
# baseline AC symbols as 9-bit codes — canonical, no all-ones code
_DC_SYMS = list(range(12))
_DC_COUNTS = [0, 0, 0, 0, 12] + [0] * 11
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0] * 8 + [len(_AC_SYMS)] + [0] * 7
assert len(_AC_SYMS) == 162


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -------------------------------------------------------- encoder


def _fdct_quant(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    coef = _T @ (block - 128.0) @ _T.T
    return np.rint(coef / qt).astype(np.int32)


def _pad_to(p: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Edge-replicate a plane up to (th, tw)."""
    h, w = p.shape
    pp = np.empty((th, tw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _encode_block(
    bwr: _BitWriter, blk: np.ndarray, qt: np.ndarray,
    pred: int, dc_tab: dict, ac_tab: dict,
) -> int:
    """FDCT+quantize+entropy-code one 8×8 block; returns the new DC
    predictor."""
    q = _fdct_quant(blk, qt)
    zz = [int(q[r, c]) for (r, c) in _ZZ]
    diff = zz[0] - pred
    s = _category(diff)
    code, ln = dc_tab[s]
    bwr.write(code, ln)
    if s:
        bwr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c16, l16 = ac_tab[0xF0]
            bwr.write(c16, l16)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError(
                "encode_jpeg: coefficient overflow — use a larger quant step"
            )
        code, ln = ac_tab[(run << 4) | s]
        bwr.write(code, ln)
        bwr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bwr.write(code, ln)
    return zz[0]


def encode_jpeg(
    w: int,
    h: int,
    ch: int,
    pixels: bytes,
    quant: int | np.ndarray = 1,
    subsample: int = 1,
) -> bytes:
    """Baseline JPEG. ``quant`` is a scalar (uniform table — 1 =
    near-lossless) or a full 8×8 table. ``ch`` 1 (grayscale) or 3
    (RGB, converted to JFIF YCbCr). ``subsample=1`` → 4:4:4;
    ``subsample=2`` → 4:2:0 (chroma box-averaged 2×2 — exercises the
    decoder's multi-block MCU + upsampling path)."""
    if ch not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    if w < 1 or h < 1:
        raise ValueError("encode_jpeg: empty image")
    if subsample not in (1, 2) or (subsample == 2 and ch == 1):
        raise ValueError("encode_jpeg: subsample 1, or 2 with 3 channels")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if img.size != w * h * ch:
        raise ValueError("encode_jpeg: pixel buffer size mismatch")
    img = img.reshape(h, w, ch).astype(np.float64)
    if ch == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]
    qt = np.full((8, 8), float(quant)) if np.isscalar(quant) else np.asarray(
        quant, dtype=np.float64
    )
    # The DQT segment carries integer bytes, so the table used for the
    # DCT division MUST be the same integers — a float table truncated
    # only at serialization time would make decoders dequantize with
    # different steps than the encoder quantized with (silently skewed
    # pixels).  Round up front, then validate the byte range.
    qt = np.rint(qt)
    if qt.shape != (8, 8) or not np.all((qt >= 1) & (qt <= 255)):
        raise ValueError(
            "encode_jpeg: quant table must be 8x8 with values in [1, 255]"
        )

    f = subsample
    # MCU grid sized by the luma (f×f blocks per MCU); chroma one
    # block per MCU at 1/f resolution
    mcux = (w + 8 * f - 1) // (8 * f)
    mcuy = (h + 8 * f - 1) // (8 * f)
    luma = _pad_to(planes[0], mcuy * f * 8, mcux * f * 8)
    chroma = []
    if ch == 3:
        for p in planes[1:]:
            if f > 1:
                pe = _pad_to(p, ((h + f - 1) // f) * f, ((w + f - 1) // f) * f)
                p = pe.reshape(pe.shape[0] // f, f, pe.shape[1] // f, f).mean(
                    axis=(1, 3)
                )
            chroma.append(_pad_to(p, mcuy * 8, mcux * 8))

    dc_tab = _build_encode_table(_DC_COUNTS, _DC_SYMS)
    ac_tab = _build_encode_table(_AC_COUNTS, _AC_SYMS)
    bwr = _BitWriter()
    pred = [0] * ch
    for my in range(mcuy):
        for mx in range(mcux):
            for v in range(f):
                for u in range(f):
                    py, px = (my * f + v) * 8, (mx * f + u) * 8
                    pred[0] = _encode_block(
                        bwr, luma[py : py + 8, px : px + 8], qt,
                        pred[0], dc_tab, ac_tab,
                    )
            for ci, p in enumerate(chroma, start=1):
                pred[ci] = _encode_block(
                    bwr, p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qt,
                    pred[ci], dc_tab, ac_tab,
                )
    bwr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    qzz = bytes(int(qt[r, c]) for (r, c) in _ZZ)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + qzz  # DQT, table 0

    comp = struct.pack(">BBB", 1, f << 4 | f, 0)
    for i in range(1, ch):
        comp += struct.pack(">BBB", i + 1, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * ch, 8, h, w, ch
    ) + comp  # SOF0

    def dht(tc: int, th: int, counts: list[int], syms: list[int]) -> bytes:
        body = bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_COUNTS, _DC_SYMS)
    out += dht(1, 0, _AC_COUNTS, _AC_SYMS)

    scomp = b"".join(struct.pack(">BB", i + 1, 0x00) for i in range(ch))
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ch, ch) + scomp
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------------- decoder


def probe_jpeg(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF header — marker walk
    only, no entropy decode (the metadata stage's cheap path)."""
    data = bytes(data)
    if not sniff_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them (a padded but valid JPEG would
        # otherwise read 0xFF as the marker and a bogus length)
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break  # buffer ended mid-fill-run → "no SOF" ValueError
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if seglen < 2:
            raise ValueError("jpeg: bad segment length")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if marker not in (0xC0, 0xC1):
                raise ValueError(
                    "jpeg: only baseline (SOF0/1) supported"
                )
            if pos + 10 > len(data):
                raise ValueError("jpeg: truncated SOF")
            _prec, hh, ww, nc = struct.unpack(
                ">BHHB", data[pos + 4 : pos + 10]
            )
            return ww, hh, nc
        pos += 2 + seglen
    raise ValueError("jpeg: no SOF marker")


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline sequential decode -> (w, h, ch, row-major bytes);
    3-component output is RGB (JFIF YCbCr inverse)."""
    data = bytes(data)
    if not sniff_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None  # (w, h, [(cid, h, v, tq)])
    while True:
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker stream")
        # T.81 B.1.1.2: skip 0xFF fill bytes before the marker code
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("jpeg: EOI before SOS")
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("jpeg: truncated segment")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                if i + 64 > len(seg):
                    raise ValueError("jpeg: truncated DQT")
                qt = np.empty((8, 8))
                for zi, (r, c) in enumerate(_ZZ):
                    qt[r, c] = seg[i + zi]
                qtabs[tq] = qt
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("jpeg: truncated DHT")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                if i + 17 + n > len(seg):
                    raise ValueError("jpeg: truncated DHT")
                syms = list(seg[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _build_decode_table(counts, syms)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1):  # SOF0/1 (both baseline Huffman)
            if len(seg) < 6:
                raise ValueError("jpeg: truncated SOF")
            prec, hh, ww, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError("jpeg: 1 or 3 components supported")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated SOF")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", seg[6 + 3 * i : 9 + 3 * i]
                )
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (ww, hh, comps)
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError(
                "jpeg: only baseline sequential (SOF0/1) supported"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if not seg or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("jpeg: truncated SOS")
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                scomp.append((cs, td_ta >> 4, td_ta & 0x0F))
            pos = pos + seglen
            return _decode_scan(
                data, pos, frame, scomp, qtabs, htabs, restart
            )
        pos += seglen


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scomp,
    qtabs,
    htabs,
    restart: int,
) -> tuple[int, int, int, bytes]:
    w, h, comps = frame
    nc = len(comps)
    if len(scomp) != nc:
        raise ValueError("jpeg: partial scans unsupported (progressive?)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        raise ValueError("jpeg: sampling factors 1-2 supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane in MCU-padded dims
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8)) for c in comps
    ]
    scan_by_cid = {s[0]: s for s in scomp}
    br = _BitReader(data, pos)
    pred = [0] * nc
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                # byte-align, consume RSTn, reset DC predictors
                br.align_to_marker()
                p = br.pos
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and data[p + 1] != 0x00
                ):
                    p += 1
                # T.81 B.1.1.2: 0xFF fill bytes may pad the marker
                while p + 2 < len(data) and data[p + 1] == 0xFF:
                    p += 1
                if p + 1 >= len(data) or not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    raise ValueError("jpeg: expected restart marker")
                br.pos = p + 2
                pred = [0] * nc
            mcu_i += 1
            for ci, (cid, ch_, cv, tq) in enumerate(comps):
                _, td, ta = scan_by_cid[cid]
                dct_t = htabs.get((0, td))
                act_t = htabs.get((1, ta))
                qt = qtabs.get(tq)
                if dct_t is None or act_t is None or qt is None:
                    raise ValueError("jpeg: missing table")
                for v in range(cv):
                    for u in range(ch_):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _huff_decode(br, dct_t)
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = np.zeros((8, 8))
                        for zi, (rr, cc) in enumerate(_ZZ):
                            coef[rr, cc] = zz[zi]
                        blk = _T.T @ (coef * qt) @ _T + 128.0
                        py = (my * cv + v) * 8
                        px = (mx * ch_ + u) * 8
                        planes[ci][py : py + 8, px : px + 8] = blk
    # upsample to full resolution and crop
    full = []
    for ci, (cid, ch_, cv, tq) in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch_, axis=1)
        full.append(p[:h, :w])
    if nc == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(x), 0, 255).astype(np.uint8) for x in (r, g, b)],
        axis=-1,
    )
    return w, h, 3, rgb.tobytes()
