"""ISO-BMFF (MP4) container PROBE — the most common video container's
metadata path, made real without any pixel work.

The reference engine has no media handling at all (SURVEY.md §2 —
this family is beyond-parity); the layout here is the public ISO/IEC
14496-12 base-media file format: a file is a sequence of boxes
``<u32be size><fourcc>[u64be largesize if size==1]<payload>``, where
``moov`` holds one ``trak`` per stream and the video track's sample
tables describe every frame without touching the codec bitstream:

    ftyp
    moov
      mvhd                      (movie timescale/duration)
      trak
        tkhd                    (16.16 fixed-point width/height)
        mdia
          mdhd                  (media timescale/duration)
          hdlr                  ('vide' marks the video track)
          minf > stbl
            stsd                (sample description: codec fourcc)
            stts                (frame count = sum of entry counts)
            stsz                (or: sample_count field)
    mdat                        (codec bitstream — never read here)

``probe_mp4`` walks boxes only — O(header) per file, no entropy
decode (H.264/VP9 bitstreams still refuse at the frame-decode seam,
exactly like the pre-probe state; see multimodal.sample_frames).

``encode_mp4_shell`` writes a structurally valid minimal MP4 (real
box layout, opaque ``mdat`` payload) so the probe is testable against
real box arithmetic in-sandbox; it is explicitly NOT a video encoder.

Scale shape: plain ``bytes -> tuple`` functions used inside Arrow
``mapInPandas`` batches (multimodal.py) — per-row work, no driver
involvement, no shuffle.
"""

from __future__ import annotations

import struct


def sniff_mp4(data: bytes) -> bool:
    data = bytes(data[:12])
    return len(data) >= 8 and data[4:8] == b"ftyp"


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [pos, end), handling 64-bit largesize and size==0 (to-end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[body : body + 8])
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end  # last box runs to end-of-file
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError("mp4: truncated box")
        yield fourcc, body, box_end
        pos = box_end
        if size == 0:
            break


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, body, box_end in _boxes(data, pos, end):
        if fc == fourcc:
            return body, box_end
    return None


def _full_box(data: bytes, body: int) -> tuple[int, int]:
    """(version, payload_start_after_version_flags)."""
    return data[body], body + 4


def _track_info(data: bytes, tbody: int, tend: int) -> dict | None:
    """Parse one trak box; None unless it is a video ('vide') track."""
    info: dict = {}
    tkhd = _find(data, tbody, tend, b"tkhd")
    if tkhd is not None:
        ver, p = _full_box(data, tkhd[0])
        # v0: ctime/mtime/id/reserved/duration = 5 u32; v1 widens the
        # times and duration to u64
        p += 32 if ver == 1 else 20
        p += 8 + 2 + 2 + 2 + 2 + 36  # reserved, layer, group, vol, pad, matrix
        w, h = struct.unpack(">II", data[p : p + 8])
        info["width"] = w >> 16  # 16.16 fixed point
        info["height"] = h >> 16
    mdia = _find(data, tbody, tend, b"mdia")
    if mdia is None:
        return None
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
        return None
    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    if mdhd is not None:
        ver, p = _full_box(data, mdhd[0])
        if ver == 1:
            p += 16
            timescale, duration = struct.unpack(">IQ", data[p : p + 12])
        else:
            p += 8
            timescale, duration = struct.unpack(">II", data[p : p + 8])
        info["timescale"] = timescale
        info["duration_ms"] = (
            duration * 1000 // timescale if timescale else 0
        )
    minf = _find(data, mdia[0], mdia[1], b"minf")
    stbl = minf and _find(data, minf[0], minf[1], b"stbl")
    if stbl:
        stsd = _find(data, stbl[0], stbl[1], b"stsd")
        if stsd is not None:
            # first sample entry's fourcc = codec (avc1, hev1, vp09…)
            info["codec"] = data[stsd[0] + 12 : stsd[0] + 16].decode(
                "latin-1"
            )
        stsz = _find(data, stbl[0], stbl[1], b"stsz")
        if stsz is not None:
            (info["n_frames"],) = struct.unpack(
                ">I", data[stsz[0] + 8 : stsz[0] + 12]
            )
        elif (stts := _find(data, stbl[0], stbl[1], b"stts")) is not None:
            _, p = _full_box(data, stts[0])
            if stts[1] - p < 4:
                # the entry-count u32 itself must fit in the box, or
                # struct.error escapes the ValueError contract too
                raise ValueError("mp4: truncated stts box")
            (n_entries,) = struct.unpack(">I", data[p : p + 4])
            # the declared entry count must fit inside the stts box:
            # a crafted/truncated count would otherwise read sibling-
            # box bytes as sample counts or hit struct.error instead
            # of this module's ValueError contract (advisor catch)
            if n_entries > (stts[1] - p - 4) // 8:
                raise ValueError("mp4: stts entry count exceeds box")
            info["n_frames"] = sum(
                struct.unpack(">I", data[p + 4 + 8 * i : p + 8 + 8 * i])[0]
                for i in range(n_entries)
            )
    return info


def mp4_info(data: bytes) -> dict:
    """Full probe: {width, height, n_frames, duration_ms, timescale,
    codec} for the FIRST video track — box walk only."""
    data = bytes(data)
    if not sniff_mp4(data):
        raise ValueError("not an MP4 (no ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    for fc, body, box_end in _boxes(data, moov[0], moov[1]):
        if fc != b"trak":
            continue
        info = _track_info(data, body, box_end)
        if info is not None:
            info.setdefault("width", 0)
            info.setdefault("height", 0)
            info.setdefault("n_frames", 0)
            info.setdefault("duration_ms", 0)
            return info
    raise ValueError("mp4: no video track")


def probe_mp4(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) — the decode_image metadata contract
    (same shape as gif/avi probes); O(header), no entropy work."""
    info = mp4_info(data)
    return info["width"], info["height"], info["n_frames"]


def encode_mp4_shell(
    w: int,
    h: int,
    n_frames: int,
    fps: int = 10,
    codec: str = "avc1",
    frame_payloads: list[bytes] | None = None,
) -> bytes:
    """Structurally valid minimal MP4 (ftyp + moov with one video
    trak + mdat).  The mdat holds opaque bytes — this is a PROBE-PATH
    test vector generator, not a video encoder (H.264/VP9 entropy
    coding stays out of sandbox scope)."""
    if w < 1 or h < 1:
        raise ValueError("encode_mp4_shell: empty dimensions")
    if frame_payloads is None:
        frame_payloads = [
            bytes((i * 37 + j) % 256 for j in range(16))
            for i in range(n_frames)
        ]
    if len(frame_payloads) != n_frames:
        raise ValueError("encode_mp4_shell: payload count != n_frames")

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    timescale = 1000
    delta = timescale // fps
    duration = n_frames * delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)  # v0, flags 0
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 7)  # v0, flags: enabled|in-movie|in-preview
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = box(
        b"hdlr",
        struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12
        + b"VideoHandler\x00",
    )
    sample_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count per sample
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 0x0018, -1)
    )
    stsd = box(
        b"stsd",
        struct.pack(">II", 0, 1)
        + box(codec.encode("latin-1"), sample_entry),
    )
    stts = box(
        b"stts",
        struct.pack(">II", 0, 1) + struct.pack(">II", n_frames, delta),
    )
    sizes = b"".join(struct.pack(">I", len(p)) for p in frame_payloads)
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n_frames) + sizes)
    stsc = box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, max(1, n_frames), 1))
    mdat_body = b"".join(frame_payloads)
    stco_placeholder = box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", 0))
    dref = box(b"dref", struct.pack(">II", 0, 1) + box(b"url ", struct.pack(">I", 1)))
    dinf = box(b"dinf", dref)
    vmhd = box(b"vmhd", struct.pack(">I", 1) + struct.pack(">HHHH", 0, 0, 0, 0))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco_placeholder)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    # patch the single chunk offset now that the mdat position is
    # known: stco layout after the fourcc is version/flags(4) +
    # entry_count(4) + offset(4), so the offset sits at fourcc+12
    mdat_pos = len(ftyp) + len(moov) + 8
    stco_off = moov.rfind(b"stco")
    moov = (
        moov[: stco_off + 12]
        + struct.pack(">I", mdat_pos)
        + moov[stco_off + 16 :]
    )
    return ftyp + moov + box(b"mdat", mdat_body)


_UNITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)
