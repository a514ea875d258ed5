"""WebM / Matroska (EBML) container PROBE — metadata for the other
common video container, with zero entropy work.

The reference engine has no media handling at all (SURVEY.md §2 —
this family is beyond-parity); the layout here is the public
Matroska/EBML specification (RFC 8794 EBML + the Matroska element
registry, which WebM subsets): a file is a tree of elements
``<id VINT><size VINT><payload>`` where the VINT's leading-zero
count encodes its own width:

    EBML (0x1A45DFA3)            DocType 0x4282 = "webm"/"matroska"
    Segment (0x18538067)
      Info (0x1549A966)          TimestampScale 0x2AD7B1 (ns/tick,
                                 default 1e6), Duration 0x4489
                                 (float, ticks)
      Tracks (0x1654AE6B)
        TrackEntry (0xAE)        TrackNumber 0xD7, TrackType 0x83
                                 (1 = video), CodecID 0x86 ("V_VP9")
          Video (0xE0)           PixelWidth 0xB0, PixelHeight 0xBA
      Cluster (0x1F43B675)*      SimpleBlock 0xA3 / BlockGroup 0xA0
                                 > Block 0xA1 — one VINT track
                                 number + flags; laced blocks carry
                                 a frame count byte

``probe_webm`` walks elements only — O(metadata) per file; the VP8/
VP9/AV1 bitstream inside blocks is never read (frame DECODE refuses
at the multimodal seam, exactly like MP4).  Frame count sums the
video track's blocks, honoring the lacing frame-count byte, and
handles the streaming-writer "unknown size" Segment/Cluster VINTs.

``encode_webm_shell`` writes a structurally valid minimal WebM (real
EBML layout, opaque block payloads) so the probe is testable against
real VINT arithmetic in-sandbox; it is explicitly NOT a video
encoder.

Scale shape: plain ``bytes -> tuple`` functions used inside Arrow
``mapInPandas`` batches (multimodal.py) — per-row work, no driver
involvement, no shuffle.
"""

from __future__ import annotations

import struct

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_CLUSTER = 0x1F43B675
_DOCTYPE = 0x4282
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


def sniff_webm(data: bytes) -> bool:
    data = bytes(data[:4])
    return data[:4] == b"\x1a\x45\xdf\xa3"


def _vint(
    data: bytes, pos: int, keep_marker: bool, allow_unknown: bool = True
) -> tuple[int, int]:
    """Parse one VINT at ``pos`` → (value, next_pos).  Element IDs
    keep the length-marker bit (they are compared with it, per RFC
    8794); sizes strip it.  An all-ones SIZE VINT means 'unknown'
    and is returned as -1 — but only when ``allow_unknown``: the
    all-ones reservation applies to element sizes, NOT to plain
    VINTs like block track numbers, where 0xFF is simply the legal
    value 127 (reviewer catch: track 127's frames silently counted
    as 0)."""
    if pos >= len(data):
        raise ValueError("webm: truncated VINT")
    first = data[pos]
    if first == 0:
        raise ValueError("webm: invalid VINT (>8 bytes)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("webm: truncated VINT")
    value = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
    if (
        not keep_marker
        and allow_unknown
        and value == (1 << (7 * length)) - 1
    ):
        return -1, pos + length  # unknown size (streaming writers)
    return value, pos + length


def _elements(data: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) for each element in
    [pos, end); unknown-size elements run to ``end`` (only
    Segment/Cluster may legally do this, and both are last-ish at
    their level)."""
    while pos < end:
        eid, p = _vint(data, pos, keep_marker=True)
        size, body = _vint(data, p, keep_marker=False)
        body_end = end if size == -1 else body + size
        if body_end > end:
            raise ValueError("webm: truncated element")
        yield eid, body, body_end
        pos = body_end


def _uint(data: bytes, body: int, end: int) -> int:
    v = 0
    for i in range(body, end):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, body: int, end: int) -> float:
    n = end - body
    if n == 4:
        return struct.unpack(">f", data[body:end])[0]
    if n == 8:
        return struct.unpack(">d", data[body:end])[0]
    if n == 0:
        return 0.0
    raise ValueError("webm: bad float width")


def _block_frames(data: bytes, body: int, end: int, video_track: int) -> int:
    """Frames contributed by one (Simple)Block: 0 if it belongs to a
    different track; else 1, or the lace count when lacing is on
    (flags bits 0x06; laced blocks carry ``count-1`` in the next
    byte — Matroska block structure)."""
    track, p = _vint(data, body, keep_marker=False, allow_unknown=False)
    if track != video_track:
        return 0
    p += 2  # 16-bit relative timestamp
    if p >= end:
        raise ValueError("webm: truncated block")
    flags = data[p]
    if flags & 0x06:
        if p + 1 >= end:
            raise ValueError("webm: truncated laced block")
        return data[p + 1] + 1
    return 1


def webm_info(data: bytes) -> dict:
    """Full probe: {width, height, n_frames, duration_ms, doctype,
    codec} for the FIRST video track — EBML walk only."""
    data = bytes(data)
    if not sniff_webm(data):
        raise ValueError("not a WebM/Matroska (no EBML magic)")
    info: dict = {"doctype": "matroska"}
    segment = None
    for eid, body, body_end in _elements(data, 0, len(data)):
        if eid == _EBML:
            for hid, hb, he in _elements(data, body, body_end):
                if hid == _DOCTYPE:
                    info["doctype"] = data[hb:he].split(b"\x00")[0].decode(
                        "latin-1"
                    )
        elif eid == _SEGMENT:
            segment = (body, body_end)
            break
    if segment is None:
        raise ValueError("webm: no Segment element")
    scale = 1_000_000  # default TimestampScale: 1 ms ticks
    duration_ticks = 0.0
    video_track = None
    n_frames = 0
    clusters = []
    for eid, body, body_end in _elements(data, *segment):
        if eid == _INFO:
            for iid, ib, ie in _elements(data, body, body_end):
                if iid == _TIMESTAMP_SCALE:
                    scale = _uint(data, ib, ie)
                elif iid == _DURATION:
                    duration_ticks = _float(data, ib, ie)
        elif eid == _TRACKS:
            for tid, tb, te in _elements(data, body, body_end):
                if tid != _TRACK_ENTRY or video_track is not None:
                    continue
                num = ttype = None
                vids = None
                codec = None
                for fid, fb, fe in _elements(data, tb, te):
                    if fid == _TRACK_NUMBER:
                        num = _uint(data, fb, fe)
                    elif fid == _TRACK_TYPE:
                        ttype = _uint(data, fb, fe)
                    elif fid == _CODEC_ID:
                        codec = data[fb:fe].split(b"\x00")[0].decode("latin-1")
                    elif fid == _VIDEO:
                        vids = (fb, fe)
                if ttype == 1 and vids is not None:
                    video_track = num
                    info["codec"] = codec
                    for vid_, vb, ve in _elements(data, *vids):
                        if vid_ == _PIXEL_W:
                            info["width"] = _uint(data, vb, ve)
                        elif vid_ == _PIXEL_H:
                            info["height"] = _uint(data, vb, ve)
        elif eid == _CLUSTER:
            clusters.append((body, body_end))
    if video_track is None:
        raise ValueError("webm: no video track")
    def count_cluster(cb: int, ce: int) -> int:
        # an unknown-size Cluster (streaming writers) runs to the
        # Segment end, so the NEXT cluster parses as its child — an
        # explicit worklist walks the chain; recursing once per
        # chained cluster would hit Python's recursion limit on a
        # long live-muxed capture (advisor catch)
        frames = 0
        work = [(cb, ce)]
        while work:
            b, e = work.pop()
            for eid, body, body_end in _elements(data, b, e):
                if eid == _SIMPLE_BLOCK:
                    frames += _block_frames(data, body, body_end, video_track)
                elif eid == _BLOCK_GROUP:
                    for gid, gb, ge in _elements(data, body, body_end):
                        if gid == _BLOCK:
                            frames += _block_frames(data, gb, ge, video_track)
                elif eid == _CLUSTER:
                    work.append((body, body_end))
        return frames

    for cb, ce in clusters:
        n_frames += count_cluster(cb, ce)
    info.setdefault("width", 0)
    info.setdefault("height", 0)
    info["n_frames"] = n_frames
    info["duration_ms"] = int(duration_ticks * scale / 1_000_000)
    info["timescale_ns"] = scale
    return info


def probe_webm(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) — the decode_image metadata contract
    (same shape as gif/avi/mp4 probes); O(metadata), no entropy work."""
    info = webm_info(data)
    return info["width"], info["height"], info["n_frames"]


def _enc_vint_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _enc_size(n: int) -> bytes:
    """Shortest size VINT for n (marker bit in the first byte)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("webm: size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_webm_shell(
    w: int,
    h: int,
    n_frames: int,
    fps: int = 10,
    codec: str = "V_VP9",
    doctype: str = "webm",
    frame_payloads: list[bytes] | None = None,
) -> bytes:
    """Structurally valid minimal WebM (EBML header + Segment with
    Info/Tracks/one Cluster of SimpleBlocks).  Block payloads are
    opaque bytes — this is a PROBE-PATH test vector generator, not a
    video encoder (VP8/VP9/AV1 entropy coding stays out of sandbox
    scope)."""
    if w < 1 or h < 1:
        raise ValueError("encode_webm_shell: empty dimensions")
    if frame_payloads is None:
        frame_payloads = [
            bytes((i * 41 + j) % 256 for j in range(12))
            for i in range(n_frames)
        ]
    if len(frame_payloads) != n_frames:
        raise ValueError("encode_webm_shell: payload count != n_frames")
    header = _el(
        _EBML,
        _el_uint(0x4286, 1)  # EBMLVersion
        + _el_uint(0x42F7, 1)  # EBMLReadVersion
        + _el_uint(0x42F2, 4)  # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)  # EBMLMaxSizeLength
        + _el(_DOCTYPE, doctype.encode("latin-1"))
        + _el_uint(0x4287, 2)  # DocTypeVersion
        + _el_uint(0x4285, 2),  # DocTypeReadVersion
    )
    dur_ticks = float(n_frames * 1000 // fps)  # 1 ms ticks (default scale)
    info = _el(
        _INFO,
        _el_uint(_TIMESTAMP_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", dur_ticks)),
    )
    video = _el(_VIDEO, _el_uint(_PIXEL_W, w) + _el_uint(_PIXEL_H, h))
    track = _el(
        _TRACK_ENTRY,
        _el_uint(_TRACK_NUMBER, 1)
        + _el_uint(0x73C5, 1)  # TrackUID
        + _el_uint(_TRACK_TYPE, 1)
        + _el(_CODEC_ID, codec.encode("latin-1"))
        + video,
    )
    tracks = _el(_TRACKS, track)
    # block-relative timestamps are SIGNED 16-BIT, so frames are
    # grouped into clusters small enough that (i - start)·delta stays
    # under 32767 (reviewer catch: one big cluster crashed past 327
    # frames at 10 fps); real muxers cluster for the same reason
    delta = max(1, 1000 // max(1, fps))
    per_cluster = max(1, 32767 // delta)
    clusters = b""
    for start in range(0, n_frames, per_cluster):
        blocks = b"".join(
            _el(
                _SIMPLE_BLOCK,
                _enc_size(1)  # track number 1 as VINT (0x81)
                + struct.pack(">h", (i - start) * delta)  # relative ts
                + b"\x80"  # flags: keyframe, no lacing
                + frame_payloads[i],
            )
            for i in range(start, min(start + per_cluster, n_frames))
        )
        clusters += _el(_CLUSTER, _el_uint(0xE7, start * delta) + blocks)
    if n_frames == 0:
        clusters = _el(_CLUSTER, _el_uint(0xE7, 0))
    segment = _el(_SEGMENT, info + tracks + clusters)
    return header + segment
