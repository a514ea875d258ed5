"""FLAC and Ogg (Opus/Vorbis) audio-container PROBES — metadata for
the two common compressed-audio containers, with zero codec work.

The reference engine has no media handling at all (SURVEY.md §2 —
beyond-parity); layouts here are the public specs:

* FLAC (xiph.org format spec): ``fLaC`` magic, then metadata blocks
  ``<1 bit last><7 bits type><24 bits size>``; STREAMINFO (type 0,
  always first) packs min/max blocksize (16+16), min/max framesize
  (24+24), sample rate (20), channels-1 (3), bits-1 (5), total
  samples (36) — everything a quality filter needs, in 34 bytes.
* Ogg (RFC 3533): ``OggS`` pages with a 64-bit granule position;
  the FIRST packet identifies the codec (``OpusHead`` — RFC 7845,
  channel count at byte 9, pre-skip 10..12, output rate fixed
  48 kHz; ``\\x01vorbis`` — channels at byte 11, rate LE32 at
  12..16), and the LAST page's granule position is the total PCM
  sample count (minus pre-skip for Opus).

Both probes return the WAV mapping :func:`multimodal.decode_image`
already uses for audio: (channels, sample_rate, n_pcm_frames) — so
media-meta queries treat every audio container uniformly.  Actual
sample DECODE stays out of scope (FLAC rice coding / Opus CELT need
codec libraries) exactly like the video bitstreams.

Scale shape: plain ``bytes -> tuple`` functions used inside Arrow
``mapInPandas`` batches — per-row work, no driver involvement, no
shuffle.
"""

from __future__ import annotations

import struct


# ------------------------------------------------------------------ FLAC
def sniff_flac(data: bytes) -> bool:
    return bytes(data[:4]) == b"fLaC"


def flac_info(data: bytes) -> dict:
    """STREAMINFO probe: {channels, sample_rate, bits_per_sample,
    n_samples, duration_ms} — header arithmetic only."""
    data = bytes(data)
    if not sniff_flac(data):
        raise ValueError("not a FLAC (no fLaC magic)")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        header = data[pos]
        btype = header & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = pos + 4
        if body + size > len(data):
            raise ValueError("flac: truncated metadata block")
        if btype == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("flac: STREAMINFO too small")
            b = data[body : body + 34]
            # 16+16 blocksize, 24+24 framesize = 10 bytes, then the
            # packed 64 bits: rate(20) ch-1(3) bits-1(5) samples(36)
            packed = int.from_bytes(b[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            n_samples = packed & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("flac: zero sample rate")
            return {
                "channels": channels,
                "sample_rate": rate,
                "bits_per_sample": bits,
                "n_samples": n_samples,
                "duration_ms": n_samples * 1000 // rate,
            }
        if header & 0x80:  # last-block flag, STREAMINFO never seen
            raise ValueError("flac: no STREAMINFO block")
        pos = body + size


def probe_flac(data: bytes) -> tuple[int, int, int]:
    """(channels, sample_rate, n_samples) — decode_image's audio
    mapping (same triple as the WAV path)."""
    info = flac_info(data)
    return info["channels"], info["sample_rate"], info["n_samples"]


def encode_flac_shell(
    channels: int, rate: int, n_samples: int, bits: int = 16
) -> bytes:
    """Structurally valid FLAC header (magic + STREAMINFO marked
    last) with NO audio frames — a probe-path test vector generator,
    not an encoder (rice-coded subframes stay out of scope)."""
    if not (1 <= channels <= 8) or rate <= 0 or rate >= (1 << 20):
        raise ValueError("encode_flac_shell: bad stream parameters")
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | (
        n_samples & ((1 << 36) - 1)
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00" * 6  # min/max framesize unknown
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # MD5 unset
    )
    return b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo


# ------------------------------------------------------------------- Ogg
def sniff_ogg(data: bytes) -> bool:
    return bytes(data[:4]) == b"OggS"


def _ogg_pages(data: bytes):
    """Yield (granule, body_start, body_end) per page — RFC 3533
    header: magic(4) ver(1) type(1) granule(8) serial(4) seq(4)
    crc(4) nsegs(1) segtable(nsegs)."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: lost page sync")
        (granule,) = struct.unpack("<q", data[pos + 6 : pos + 14])
        nsegs = data[pos + 26]
        table = pos + 27
        if table + nsegs > len(data):
            raise ValueError("ogg: truncated segment table")
        body = table + nsegs
        size = sum(data[table : table + nsegs])
        if body + size > len(data):
            raise ValueError("ogg: truncated page body")
        yield granule, body, body + size
        pos = body + size
    if pos != len(data):
        raise ValueError("ogg: trailing garbage after last page")


def ogg_info(data: bytes) -> dict:
    """{codec, channels, sample_rate, n_samples, duration_ms} from
    the first packet (codec id header) + the last page's granule
    position.  Opus granules tick at 48 kHz regardless of the input
    rate and include the pre-skip (RFC 7845 §4.2); Vorbis granules
    are output samples at the stream rate."""
    data = bytes(data)
    if not sniff_ogg(data):
        raise ValueError("not an Ogg (no OggS magic)")
    first = None
    last_granule = 0
    for granule, body, body_end in _ogg_pages(data):
        if first is None:
            first = data[body:body_end]
        if granule > 0:
            last_granule = granule
    if first is None:
        raise ValueError("ogg: no pages")
    if first.startswith(b"OpusHead"):
        if len(first) < 12:
            raise ValueError("ogg: truncated OpusHead")
        channels = first[9]
        (pre_skip,) = struct.unpack("<H", first[10:12])
        n = max(0, last_granule - pre_skip)
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": 48000,  # Opus always decodes at 48 kHz
            "n_samples": n,
            "duration_ms": n * 1000 // 48000,
        }
    if first.startswith(b"\x01vorbis"):
        if len(first) < 16:
            raise ValueError("ogg: truncated vorbis id header")
        channels = first[11]
        (rate,) = struct.unpack("<I", first[12:16])
        if rate == 0:
            raise ValueError("ogg: zero vorbis sample rate")
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "n_samples": last_granule,
            "duration_ms": last_granule * 1000 // rate,
        }
    raise ValueError("ogg: unknown codec id header")


def probe_ogg(data: bytes) -> tuple[int, int, int]:
    """(channels, sample_rate, n_samples) — decode_image's audio
    mapping (same triple as the WAV/FLAC paths)."""
    info = ogg_info(data)
    return info["channels"], info["sample_rate"], info["n_samples"]


def _ogg_page(granule: int, serial: int, seq: int, body: bytes,
              header_type: int = 0) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)  # final short (or zero) lacing value
    head = (
        b"OggS" + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC unset (probe never checks it)
        + bytes([len(segs)]) + bytes(segs)
    )
    return head + body


def encode_ogg_shell(
    channels: int, rate: int, n_samples: int, codec: str = "opus",
    pre_skip: int = 312,
) -> bytes:
    """Structurally valid two-page Ogg stream (codec id header page +
    one data page carrying the final granule position); the data
    packet is opaque bytes — a probe-path test vector generator, not
    an encoder."""
    if channels < 1 or rate <= 0:
        raise ValueError("encode_ogg_shell: bad stream parameters")
    if codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", rate)  # input rate (informational)
            + struct.pack("<h", 0) + bytes([0])
        )
        granule = n_samples + pre_skip  # RFC 7845 §4.2
    elif codec == "vorbis":
        ident = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", rate)
            + struct.pack("<iii", -1, rate * 16, -1) + bytes([0xB8, 1])
        )
        granule = n_samples
    else:
        raise ValueError("encode_ogg_shell: codec must be opus|vorbis")
    page0 = _ogg_page(0, 0x5D0, 0, ident, header_type=2)  # BOS
    page1 = _ogg_page(granule, 0x5D0, 1, bytes(range(32)), header_type=4)
    return page0 + page1
