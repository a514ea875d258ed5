"""Pure-stdlib PNG + PPM codec for the multimodal seam.

The container has no PIL/ffmpeg, but PNG is just zlib + per-row byte
filters (RFC 2083) and PPM (P6) is a header + raw RGB — both decodable
with ``zlib``/``struct`` alone. This gives the multimodal operators a
REAL pixel path end-to-end in this sandbox: decode → box-filter
resize → re-encode, behind the same ``decode_image`` seam a PIL/ffmpeg
codec would plug into (operators/multimodal.py). Scope: 8-bit
greyscale/RGB/RGBA, non-interlaced — the common case; anything else
raises ValueError and the seam surfaces it.

Pixels are (width, height, channels, bytes row-major) — flat bytes,
no numpy dependency in the decode itself (resize uses integer box
sums; test-sized images, executor-side inside an Arrow batch).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def sniff(data: bytes) -> str | None:
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"P6":
        return "ppm"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Decoded size cap: 64M samples (~64 MB of pixel data) — an IHDR
# declaring absurd dimensions must not allocate before any data is
# validated (decompression-bomb shape for attacker-supplied payloads).
MAX_SAMPLES = 1 << 26


def _check_dims(w: int, h: int, ch: int) -> None:
    if w <= 0 or h <= 0 or w * h * ch > MAX_SAMPLES:
        raise ValueError(f"image dimensions out of range ({w}x{h}x{ch})")


def probe(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the HEADER alone — no pixel
    decode. The metadata path must be O(1) per image, not O(w*h)."""
    kind = sniff(data)
    if kind == "png":
        if len(data) < 33 or data[12:16] != b"IHDR":
            raise ValueError("truncated PNG or missing IHDR")
        w, h, depth, color, _c, _f, interlace = struct.unpack(
            ">IIBBBBB", data[16:29]
        )
        if depth != 8 or interlace != 0 or color not in _CHANNELS:
            raise ValueError(
                f"unsupported PNG (depth={depth} color={color}"
                f" interlace={interlace})"
            )
        _check_dims(w, h, _CHANNELS[color])
        return w, h, _CHANNELS[color]
    if kind == "ppm":
        w, h, _pos = _ppm_header(data)
        _check_dims(w, h, 3)
        return w, h, 3
    raise ValueError("unrecognized image format")


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — defilters all 5 row filter
    types; 8-bit, non-interlaced only. Malformed/truncated input
    raises ValueError (never IndexError/struct.error), and the
    decompressed size is bounded by the validated dimensions."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if pos + 8 + length > len(data):
            raise ValueError("truncated PNG chunk")
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            if length < 13:
                raise ValueError("truncated PNG IHDR")
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8 or interlace != 0 or color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color}"
                    f" interlace={interlace})"
                )
            ch = _CHANNELS[color]
            _check_dims(w, h, ch)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    stride = w * ch
    expected = h * (stride + 1)
    try:
        # decompressobj caps the output at the size the validated
        # header implies — a bomb stream cannot expand past it
        raw = zlib.decompressobj().decompress(bytes(idat), expected)
    except zlib.error as err:
        raise ValueError(f"bad PNG data: {err}") from err
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return w, h, ch, bytes(out)


def encode_png(w: int, h: int, ch: int, pixels: bytes) -> bytes:
    """Minimal writer: filter 0 rows, one IDAT, fixed zlib level."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _ppm_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, pixel_offset) of a binary P6 header."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as err:
        raise ValueError("bad PPM header") from err
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return w, h, pos


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Binary P6 PPM: header tokens (magic, w, h, maxval) then raw RGB."""
    w, h, pos = _ppm_header(data)
    _check_dims(w, h, 3)
    pixels = data[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated PPM")
    return w, h, 3, pixels


def encode_ppm(w: int, h: int, ch: int, pixels: bytes) -> bytes:
    if ch != 3:
        raise ValueError("P6 PPM is RGB only")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def decode(data: bytes) -> tuple[int, int, int, bytes]:
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "ppm":
        return decode_ppm(data)
    raise ValueError("unrecognized image format")


# ------------------------------------------------------------- WAV
# PCM WAV rides the same seam for audio payloads: stdlib ``wave``
# parses the RIFF header; frames stay bytes. The multimodal metadata
# stage maps (n_channels, sample_rate, n_frames) into its
# width/height/n_frames columns (documented mapping, multimodal.py).


def sniff_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def wav_info(data: bytes) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) from the WAV header."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            return w.getnchannels(), w.getframerate(), w.getnframes()
    except (wave.Error, EOFError) as err:
        raise ValueError(f"bad WAV: {err}") from err


def encode_wav(
    n_channels: int, sample_rate: int, samples: bytes, sampwidth: int = 2
) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def box_resize(
    w: int, h: int, ch: int, pixels: bytes, tw: int, th: int
) -> bytes:
    """Box-filter (area-average) resample to tw×th: each target pixel
    averages its source box — correct for downscale, nearest-ish for
    upscale. Integer arithmetic only."""
    out = bytearray(tw * th * ch)
    for ty in range(th):
        y0, y1 = ty * h // th, max(ty * h // th + 1, (ty + 1) * h // th)
        for tx in range(tw):
            x0, x1 = tx * w // tw, max(tx * w // tw + 1, (tx + 1) * w // tw)
            n = (y1 - y0) * (x1 - x0)
            for c in range(ch):
                acc = 0
                for sy in range(y0, y1):
                    base = (sy * w) * ch + c
                    for sx in range(x0, x1):
                        acc += pixels[base + sx * ch]
                out[(ty * tw + tx) * ch + c] = acc // n
    return bytes(out)
