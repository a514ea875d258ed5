"""ISO-BMFF (MP4) container probe (operators/mp4_codec.py): box
walking, sample-table arithmetic, v0/v1 headers, truncation refusal,
and the metadata path through the multimodal seam."""

from __future__ import annotations

import struct

import pytest

from scratchdata_spark.operators import mp4_codec as M


def test_mp4_shell_probe_roundtrip():
    enc = M.encode_mp4_shell(320, 240, 7, fps=10)
    assert M.sniff_mp4(enc)
    assert M.probe_mp4(enc) == (320, 240, 7)
    info = M.mp4_info(enc)
    assert info["codec"] == "avc1"
    assert info["timescale"] == 1000
    assert info["duration_ms"] == 700  # 7 frames @ 10 fps
    # chunk offset patched to the real mdat body position
    stco = enc.find(b"stco")
    (off,) = struct.unpack(">I", enc[stco + 12 : stco + 16])
    assert enc[off - 8 : off - 4][-4:] == b"mdat"[-4:] or enc[off - 4 : off] == b"mdat"


def test_mp4_probe_is_boxwalk_only():
    """Probe succeeds with the entire mdat zeroed — proof it never
    reads the codec bitstream."""
    enc = bytearray(M.encode_mp4_shell(64, 48, 3))
    mdat = bytes(enc).find(b"mdat")
    for i in range(mdat + 4, len(enc)):
        enc[i] = 0
    assert M.probe_mp4(bytes(enc)) == (64, 48, 3)


def test_mp4_frame_count_from_stts_when_stsz_absent():
    """Some writers omit stsz sizes for fixed-size streams; the probe
    falls back to summing stts entry counts."""
    enc = M.encode_mp4_shell(32, 24, 5)
    # excise the stsz box: replace its fourcc so _find misses it
    pos = enc.find(b"stsz")
    enc = enc[:pos] + b"free" + enc[pos + 4 :]
    assert M.probe_mp4(enc) == (32, 24, 5)


def test_mp4_largesize_and_v1_headers():
    """A 64-bit largesize mdat and version-1 tkhd/mdhd parse the same."""
    enc = M.encode_mp4_shell(100, 80, 2)
    # rebuild the mdat as a largesize box (size==1 + u64)
    mdat = enc.find(b"mdat") - 4
    body = enc[mdat + 8 :]
    enc64 = (
        enc[:mdat]
        + struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", 16 + len(body))
        + body
    )
    assert M.probe_mp4(enc64) == (100, 80, 2)
    # hand-build v1 tkhd/mdhd payloads around the same sample tables
    tkhd_pos = enc.find(b"tkhd")
    v0 = enc[tkhd_pos + 4 : tkhd_pos + 4 + 4 + 20]
    v1 = bytes([1]) + v0[1:4] + struct.pack(">QQIIQ", 0, 0, 1, 0, 200)
    grown = len(v1) - (4 + 20)
    new_tkhd = (
        struct.pack(">I", struct.unpack(">I", enc[tkhd_pos - 4 : tkhd_pos])[0] + grown)
        + b"tkhd" + v1 + enc[tkhd_pos + 4 + 24 : tkhd_pos + 4 + 24 + 60]
    )
    # splice: grow every ancestor box size (moov, trak) by `grown`
    out = bytearray(enc)
    out[tkhd_pos - 4 : tkhd_pos + 4 + 84] = new_tkhd
    for fourcc in (b"moov", b"trak"):
        p = bytes(out).find(fourcc)
        (sz,) = struct.unpack(">I", out[p - 4 : p])
        out[p - 4 : p] = struct.pack(">I", sz + grown)
    assert M.probe_mp4(bytes(out)) == (100, 80, 2)


def test_mp4_bad_inputs_refuse():
    with pytest.raises(ValueError, match="not an MP4"):
        M.probe_mp4(b"\x89PNG\r\n\x1a\n")
    enc = M.encode_mp4_shell(8, 8, 1)
    with pytest.raises(ValueError, match="no moov"):
        M.probe_mp4(enc[:28])  # the complete ftyp box, nothing after
    with pytest.raises(ValueError, match="truncated"):
        M.probe_mp4(enc[: enc.find(b"trak") + 30])
    with pytest.raises(ValueError, match="empty dimensions"):
        M.encode_mp4_shell(0, 8, 1)
    # audio-only file (handler != vide): no video track to probe
    bad = enc.replace(b"vide", b"soun")
    with pytest.raises(ValueError, match="no video track"):
        M.probe_mp4(bad)


def test_mp4_meta_through_multimodal_seam(spark, monkeypatch):
    """extract_media_meta with the fake disabled: MP4 payloads probe
    real dims/frame counts via the box walk; frame SAMPLING refuses
    loudly (entropy decode is out of sandbox scope)."""
    from scratchdata_spark.operators.multimodal import (
        extract_media_meta,
        sample_frames,
    )

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    payload = bytearray(M.encode_mp4_shell(640, 360, 24, fps=12))
    df = spark.createDataFrame(
        [(1, "video/mp4", payload)],
        "doc_id long, media_type string, payload binary",
    )
    meta = extract_media_meta(df).collect()[0]
    assert (meta.width, meta.height, meta.n_frames) == (640, 360, 24)
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(df, max_frames=2).collect()


def test_mp4_stts_entry_count_clamped_to_box():
    """A crafted stts entry count larger than its box refuses with
    ValueError instead of reading sibling-box bytes as sample counts
    (or struct.error on truncation) — advisor catch."""
    enc = M.encode_mp4_shell(32, 24, 5)
    pos = enc.find(b"stsz")
    enc = enc[:pos] + b"free" + enc[pos + 4 :]  # force the stts path
    sp = enc.find(b"stts")
    ec = sp + 8  # fourcc(4) + version/flags(4) → entry-count u32
    crafted = enc[:ec] + struct.pack(">I", 1 << 20) + enc[ec + 4 :]
    with pytest.raises(ValueError, match="stts"):
        M.probe_mp4(crafted)
