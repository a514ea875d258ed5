"""FLAC / Ogg container probes (operators/audio_containers.py):
STREAMINFO bit unpacking, Ogg page walking, Opus pre-skip semantics,
truncation refusal, and the metadata path through the multimodal
seam."""

from __future__ import annotations

import struct

import pytest

from scratchdata_spark.operators import audio_containers as A


def test_flac_streaminfo_roundtrip():
    enc = A.encode_flac_shell(2, 44100, 441_000, bits=24)
    assert A.sniff_flac(enc)
    assert A.probe_flac(enc) == (2, 44100, 441_000)
    info = A.flac_info(enc)
    assert info["bits_per_sample"] == 24
    assert info["duration_ms"] == 10_000
    # 36-bit sample-count boundary survives the pack/unpack
    big = A.encode_flac_shell(1, 96000, (1 << 36) - 1)
    assert A.flac_info(big)["n_samples"] == (1 << 36) - 1


def test_flac_skips_leading_blocks_and_refuses_bad():
    """STREAMINFO is spec-first, but the walker tolerates writers
    that front other blocks; missing STREAMINFO and truncations
    refuse loudly."""
    enc = A.encode_flac_shell(1, 8000, 800)
    # prepend a PADDING block (type 1) before the STREAMINFO
    pad = bytes([0x01]) + (4).to_bytes(3, "big") + b"\x00" * 4
    patched = enc[:4] + pad + bytes([enc[4] & 0x7F]) + enc[5:]
    assert A.probe_flac(patched) == (1, 8000, 800)
    with pytest.raises(ValueError, match="not a FLAC"):
        A.probe_flac(b"OggS")
    with pytest.raises(ValueError, match="truncated"):
        A.probe_flac(enc[:20])
    # a lone last-flagged PADDING block: no STREAMINFO anywhere
    lone = b"fLaC" + bytes([0x81]) + (4).to_bytes(3, "big") + b"\x00" * 4
    with pytest.raises(ValueError, match="no STREAMINFO"):
        A.probe_flac(lone)
    with pytest.raises(ValueError, match="bad stream"):
        A.encode_flac_shell(0, 8000, 1)


def test_ogg_opus_pre_skip_and_vorbis():
    enc = A.encode_ogg_shell(2, 48000, 96_000, codec="opus", pre_skip=312)
    assert A.sniff_ogg(enc)
    assert A.probe_ogg(enc) == (2, 48000, 96_000)
    info = A.ogg_info(enc)
    assert info["codec"] == "opus"
    assert info["duration_ms"] == 2000
    v = A.encode_ogg_shell(1, 22050, 44_100, codec="vorbis")
    iv = A.ogg_info(v)
    assert iv["codec"] == "vorbis"
    assert (iv["channels"], iv["sample_rate"], iv["n_samples"]) == (
        1, 22050, 44_100,
    )
    assert iv["duration_ms"] == 2000


def test_ogg_bad_inputs_refuse():
    with pytest.raises(ValueError, match="not an Ogg"):
        A.probe_ogg(b"fLaC")
    enc = A.encode_ogg_shell(2, 48000, 4800)
    with pytest.raises(ValueError, match="truncated|trailing|sync"):
        A.probe_ogg(enc[: len(enc) - 3])
    # unknown first packet: neither OpusHead nor vorbis id
    bad = A._ogg_page(0, 1, 0, b"GARBAGE!", header_type=2)
    with pytest.raises(ValueError, match="unknown codec"):
        A.probe_ogg(bad)
    with pytest.raises(ValueError, match="codec must be"):
        A.encode_ogg_shell(1, 8000, 1, codec="mp3")


def test_ogg_long_packet_lacing():
    """A body over 255 bytes spans multiple lacing values; the page
    walker must honor the segment table arithmetic."""
    ident = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    )
    page0 = A._ogg_page(0, 7, 0, ident, header_type=2)
    page1 = A._ogg_page(48_000, 7, 1, bytes(600), header_type=4)
    assert A.probe_ogg(page0 + page1) == (2, 48000, 48_000)


def test_audio_containers_through_multimodal_seam(spark, monkeypatch):
    """extract_media_meta with the fake disabled: FLAC and Ogg
    payloads probe real (channels, rate, samples) via the WAV
    mapping."""
    from scratchdata_spark.operators.multimodal import extract_media_meta

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    rows = [
        (1, "audio/flac", bytearray(A.encode_flac_shell(2, 44100, 88200))),
        (2, "audio/ogg", bytearray(A.encode_ogg_shell(1, 48000, 9600))),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r.doc_id: r for r in extract_media_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].n_frames) == (2, 44100, 88200)
    assert (out[2].width, out[2].height, out[2].n_frames) == (1, 48000, 9600)


def test_audio_sample_counts_saturate_in_media_meta():
    """FLAC's 36-bit (and Ogg's 64-bit) sample counts exceed
    META_SCHEMA's int32 n_frames; decode_image saturates at INT32_MAX
    instead of letting the Arrow cast silently wrap (>13.5 h
    captures)."""
    from scratchdata_spark.operators.multimodal import decode_image

    big = A.encode_flac_shell(2, 48000, 1 << 33)
    assert decode_image(big, "audio/flac", fake=False) == (
        2, 48000, 2**31 - 1,
    )
    ogg = A.encode_ogg_shell(1, 48000, 1 << 33, codec="opus")
    assert decode_image(ogg, "audio/ogg", fake=False) == (
        1, 48000, 2**31 - 1,
    )
