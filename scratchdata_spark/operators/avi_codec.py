"""Motion-JPEG in an AVI (RIFF) container — the video-container seam
made real with the codecs already in-tree.

The reference engine has no media handling at all (SURVEY.md §2 —
this whole family is beyond-parity); the container format here is the
public RIFF/AVI layout (Microsoft "AVI RIFF File Reference", the
multimedia-programming spec every MJPEG camera emits):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader>)
        LIST('strl' strh(<AVIStreamHeader 'vids'/'MJPG'>)
                    strf(<BITMAPINFOHEADER biCompression='MJPG'>)))
      LIST('movi' { '00dc'(<one baseline JPEG per frame>) })
      [idx1(...)] )

Every chunk is ``<fourcc><u32le size><size bytes>[pad to even]`` —
the walker below is pure chunk arithmetic; all pixel work is
delegated to :mod:`jpeg_codec` (ITU-T T.81), one self-contained
baseline JPEG per ``..dc`` chunk, which is exactly what MJPEG is.

Scale shape: these functions are plain ``bytes -> tuple`` codecs used
inside Arrow ``mapInPandas`` batches (multimodal.py) — per-row work,
no driver involvement, no shuffle.
"""

from __future__ import annotations

import struct

from scratchdata_spark.operators import jpeg_codec


def sniff_avi(data: bytes) -> bool:
    data = bytes(data[:12])
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    [pos, end); LIST chunks yield as ('LIST:<type>', start-after-type,
    size-4) so callers can recurse or skip uniformly."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("avi: truncated chunk")
        if fourcc == b"LIST":
            if size < 4:
                raise ValueError("avi: LIST too small")
            yield (b"LIST:" + data[body : body + 4], body + 4, size - 4)
        else:
            yield (fourcc, body, size)
        pos = body + size + (size & 1)  # chunks are word-aligned


def _find_list(data: bytes, pos: int, end: int, ltype: bytes):
    for fourcc, body, size in _chunks(data, pos, end):
        if fourcc == b"LIST:" + ltype:
            return body, body + size
    return None


def probe_avi(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the ``avih`` main header —
    chunk-walk only, no JPEG decode (the O(header) metadata path).
    Falls back to counting ``..dc`` chunks when dwTotalFrames is 0
    (some writers leave it blank) — still no entropy work."""
    data = bytes(data)
    if not sniff_avi(data):
        raise ValueError("not an AVI")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    hdrl = _find_list(data, 12, end, b"hdrl")
    if hdrl is None:
        raise ValueError("avi: no hdrl list")
    for fourcc, body, size in _chunks(data, hdrl[0], hdrl[1]):
        if fourcc == b"avih":
            if size < 40:
                raise ValueError("avi: truncated avih")
            total, _init, _streams, _buf, w, h = struct.unpack(
                "<IIIIII", data[body + 16 : body + 40]
            )
            if total == 0:
                total = sum(
                    1
                    for fc, _b, _s in _movi_chunks(data, *_movi_span(data, end))
                    if fc[2:4] == b"dc"
                )
            return w, h, total
    raise ValueError("avi: no avih header")


def _movi_span(data: bytes, end: int) -> tuple[int, int]:
    movi = _find_list(data, 12, end, b"movi")
    if movi is None:
        raise ValueError("avi: no movi list")
    return movi


def _movi_chunks(data: bytes, pos: int, end: int):
    """Yield the data chunks of a ``movi`` span, recursing into
    ``LIST('rec ')`` groups — spec-legal interleaved AVIs wrap each
    frame's chunks in a rec list (AVI RIFF reference, "rec" lists),
    and a flat walk would silently skip every frame inside them."""
    for fourcc, body, size in _chunks(data, pos, end):
        if fourcc == b"LIST:rec ":
            yield from _movi_chunks(data, body, body + size)
        else:
            yield (fourcc, body, size)


def decode_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Full MJPEG decode → (w, h, n_frames, [RGB bytes per frame]).

    Each ``..dc`` chunk in ``movi`` is one self-contained baseline
    JPEG (that IS the MJPEG format); grayscale frames are expanded to
    RGB so every frame has the same w*h*3 layout (the contract
    :func:`multimodal.sample_frames` shares with the GIF path)."""
    data = bytes(data)
    if not sniff_avi(data):
        raise ValueError("not an AVI")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    frames: list[bytes] = []
    w = h = None
    for fourcc, body, size in _movi_chunks(data, *_movi_span(data, end)):
        if fourcc[2:4] != b"dc":
            continue  # audio ('wb'), index or padding chunks
        fw, fh, ch, px = jpeg_codec.decode_jpeg(data[body : body + size])
        if w is None:
            w, h = fw, fh
        elif (fw, fh) != (w, h):
            raise ValueError("avi: frame dimensions change mid-stream")
        if ch == 1:
            px = bytes(b for v in px for b in (v, v, v))
        frames.append(px)
    if w is None:
        # header-only AVI: dimensions from avih, zero frames — same
        # contract as a zero-frame GIF (sample_frames emits no rows)
        w, h, _ = probe_avi(data)
    return w, h, len(frames), frames


def encode_avi(
    w: int,
    h: int,
    frames: list[bytes],
    fps: int = 10,
    quant: int = 1,
    subsample: int = 1,
) -> bytes:
    """Minimal spec-correct MJPEG AVI: one 'vids'/'MJPG' stream, one
    ``00dc`` chunk per frame (each a baseline JPEG at ``quant``).
    ``frames`` are RGB buffers of w*h*3 bytes."""
    if w < 1 or h < 1:
        raise ValueError("encode_avi: empty dimensions")
    jpegs = [
        jpeg_codec.encode_jpeg(w, h, 3, f, quant=quant, subsample=subsample)
        for f in frames
    ]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_sz = max((len(j) for j in jpegs), default=0)
    usec = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, max_sz * fps, 0, 0,  # dwFlags 0: no idx1 is written, so
        # AVIF_HASINDEX (0x10) must stay unset or players seek a
        # missing index
        len(jpegs), 0, 1, max_sz, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), max_sz,
            0xFFFFFFFF, 0,
        ) + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
