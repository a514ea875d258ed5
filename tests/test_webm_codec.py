"""WebM/Matroska (EBML) container probe (operators/webm_codec.py):
VINT arithmetic, element walking, lacing and unknown-size handling,
truncation refusal, and the metadata path through the multimodal
seam."""

from __future__ import annotations

import struct

import pytest

from scratchdata_spark.operators import webm_codec as W


def test_webm_shell_probe_roundtrip():
    enc = W.encode_webm_shell(640, 360, 7, fps=10)
    assert W.sniff_webm(enc)
    assert W.probe_webm(enc) == (640, 360, 7)
    info = W.webm_info(enc)
    assert info["doctype"] == "webm"
    assert info["codec"] == "V_VP9"
    assert info["duration_ms"] == 700  # 7 frames @ 10 fps
    assert info["timescale_ns"] == 1_000_000


def test_webm_probe_is_elementwalk_only():
    """Probe succeeds with every block payload zeroed — proof it
    never reads the codec bitstream (block headers survive: track
    VINT + timestamp + flags are the first 4 bytes)."""
    payloads = [bytes(16) for _ in range(3)]  # already zero bytes
    enc = W.encode_webm_shell(64, 48, 3, frame_payloads=payloads)
    assert W.probe_webm(enc) == (64, 48, 3)


def _find_element(data: bytes, pos: int, end: int, eid: int):
    """Depth-first search for the first element with id ``eid``;
    returns (body_start, body_end).  Byte-level find() would hit
    incidental 0x83/0xA3 bytes in sizes and payloads."""
    for fid, body, body_end in W._elements(data, pos, end):
        if fid == eid:
            return body, body_end
        if body_end - body >= 2:
            try:
                got = _find_element(data, body, body_end, eid)
            except ValueError:
                continue
            if got is not None:
                return got
    return None


def test_webm_laced_block_frame_count():
    """A laced SimpleBlock carries count-1 in the byte after flags;
    the probe must honor it instead of counting the block as 1."""
    enc = bytearray(W.encode_webm_shell(32, 24, 1))
    body, _ = _find_element(bytes(enc), 0, len(enc), W._SIMPLE_BLOCK)
    # block body = track VINT(1) + ts(2) + flags(1) + payload; flip
    # the flags to EBML lacing (0x06) and set the lace-count byte to
    # 3 (= 4 frames) — the payload byte it overwrites is opaque
    # bitstream the probe never interprets
    flags_at = body + 3
    assert enc[flags_at] == 0x80
    enc[flags_at] = 0x80 | 0x06
    enc[flags_at + 1] = 3
    assert W.probe_webm(bytes(enc)) == (32, 24, 4)


def test_webm_unknown_size_segment_and_cluster():
    """Streaming writers emit all-ones size VINTs for Segment and
    Cluster; the probe treats them as to-end and still counts blocks
    in clusters that parse as 'children' of the unknown-size one."""
    one = W.encode_webm_shell(16, 12, 2, fps=10)
    seg = one.find(b"\x18\x53\x80\x67")
    # Segment size VINT starts right after the 4-byte id; rewrite it
    # as the canonical 8-byte unknown (0x01FFFFFFFFFFFFFF) — the body
    # must stay byte-identical, so splice rather than overwrite
    size, body = W._vint(one, seg + 4, keep_marker=False)
    assert size >= 0
    enc = one[: seg + 4] + b"\x01" + b"\xff" * 7 + one[body:]
    assert W.probe_webm(enc) == (16, 12, 2)
    # two clusters, first with unknown size: second parses as its
    # child; recursion still counts both clusters' blocks
    two = W.encode_webm_shell(16, 12, 3, fps=10)
    c = two.find(b"\x1f\x43\xb6\x75")
    csize, cbody = W._vint(two, c + 4, keep_marker=False)
    cluster_body = two[cbody : cbody + csize]
    second = two[c:]  # the whole known-size cluster, again
    spliced_cluster = (
        two[: c + 4] + b"\x01" + b"\xff" * 7 + cluster_body + second
    )
    # the Segment must ALSO be unknown-size (its literal size no
    # longer matches after the splice) — rewrite it the same way
    seg2 = spliced_cluster.find(b"\x18\x53\x80\x67")
    _, sbody = W._vint(spliced_cluster, seg2 + 4, keep_marker=False)
    enc2 = (
        spliced_cluster[: seg2 + 4]
        + b"\x01" + b"\xff" * 7
        + spliced_cluster[sbody:]
    )
    assert W.probe_webm(enc2) == (16, 12, 6)


def test_webm_bad_inputs_refuse():
    with pytest.raises(ValueError, match="not a WebM"):
        W.probe_webm(b"\x89PNG\r\n\x1a\n")
    enc = W.encode_webm_shell(8, 8, 1)
    with pytest.raises(ValueError, match="truncated"):
        W.probe_webm(enc[: len(enc) - 4])
    with pytest.raises(ValueError, match="empty dimensions"):
        W.encode_webm_shell(0, 8, 1)
    # audio-only file (TrackType != 1): no video track to probe
    tb, te = _find_element(enc, 0, len(enc), W._TRACK_TYPE)
    assert te - tb == 1 and enc[tb] == 1
    bad = enc[:tb] + b"\x02" + enc[te:]  # type 2 = audio
    with pytest.raises(ValueError, match="no video track"):
        W.probe_webm(bad)
    # header-only prefix: EBML magic but no Segment
    ebml_end = W._vint(enc, 4, keep_marker=False)
    header_len = ebml_end[1] + ebml_end[0]
    with pytest.raises(ValueError, match="no Segment"):
        W.probe_webm(enc[:header_len])


def test_webm_matroska_doctype_and_other_codecs():
    enc = W.encode_webm_shell(100, 80, 2, codec="V_MPEG4/ISO/AVC",
                              doctype="matroska")
    info = W.webm_info(enc)
    assert info["doctype"] == "matroska"
    assert info["codec"] == "V_MPEG4/ISO/AVC"
    assert (info["width"], info["height"], info["n_frames"]) == (100, 80, 2)


def test_webm_meta_through_multimodal_seam(spark, monkeypatch):
    """extract_media_meta with the fake disabled: WebM payloads probe
    real dims/frame counts via the EBML walk; frame SAMPLING refuses
    loudly (entropy decode is out of sandbox scope)."""
    from scratchdata_spark.operators.multimodal import (
        extract_media_meta,
        sample_frames,
    )

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    payload = bytearray(W.encode_webm_shell(1280, 720, 24, fps=12))
    df = spark.createDataFrame(
        [(1, "video/webm", payload)],
        "doc_id long, media_type string, payload binary",
    )
    meta = extract_media_meta(df).collect()[0]
    assert (meta.width, meta.height, meta.n_frames) == (1280, 720, 24)
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(df, max_frames=2).collect()


def test_webm_track_127_blocks_counted():
    """Track number 127 is the one-byte all-ones VINT (0xFF) — legal
    for track numbers (the all-ones reservation applies to SIZES
    only); its blocks must count, not silently parse as 'unknown'."""
    enc = W.encode_webm_shell(24, 18, 3)
    out = bytearray(enc)
    # rewrite TrackNumber element value 1 -> 127
    tb, te = _find_element(enc, 0, len(enc), W._TRACK_NUMBER)
    assert te - tb == 1 and out[tb] == 1
    out[tb] = 127
    # rewrite each SimpleBlock's track VINT 0x81 -> 0xFF
    pos = 0
    while True:
        got = _find_element(bytes(out), pos, len(out), W._SIMPLE_BLOCK)
        if got is None:
            break
        body, body_end = got
        assert out[body] == 0x81
        out[body] = 0xFF
        pos = body_end
    assert W.probe_webm(bytes(out)) == (24, 18, 3)


def test_webm_shell_many_frames_multi_cluster():
    """The shell clusters frames so block-relative timestamps stay
    within int16 — 400 frames at 10 fps used to crash struct.pack."""
    enc = W.encode_webm_shell(16, 12, 400, fps=10)
    assert W.probe_webm(enc) == (16, 12, 400)
    assert W.webm_info(enc)["duration_ms"] == 40_000
    # 1 fps: delta 1000 -> at most 32 frames per cluster
    slow = W.encode_webm_shell(16, 12, 40, fps=1)
    assert W.probe_webm(slow) == (16, 12, 40)


def test_webm_long_unknown_size_cluster_chain_no_recursion():
    """A live-muxed capture with thousands of chained unknown-size
    clusters (each swallowing its successors as children) must probe
    without RecursionError — the cluster walk is an explicit worklist,
    not one Python frame per cluster (advisor catch)."""
    one = W.encode_webm_shell(16, 12, 1, fps=10)
    c = one.find(b"\x1f\x43\xb6\x75")
    csize, cbody = W._vint(one, c + 4, keep_marker=False)
    cluster_body = one[cbody : cbody + csize]
    unk = b"\x1f\x43\xb6\x75" + b"\x01" + b"\xff" * 7 + cluster_body
    chained = one[:c] + unk * 2000
    seg = chained.find(b"\x18\x53\x80\x67")
    _, sbody = W._vint(chained, seg + 4, keep_marker=False)
    enc = (
        chained[: seg + 4] + b"\x01" + b"\xff" * 7 + chained[sbody:]
    )
    assert W.probe_webm(enc) == (16, 12, 2000)
