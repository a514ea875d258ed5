"""Multimodal columns: image/audio/video as opaque ``binary`` plus
typed metadata, with decode / feature-extraction as Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing is real and tested: binary columns, explicit
output schemas, batch-wise pandas processing, partition-preserving
metadata extraction. The codec seam is ``decode_image``:
``SCRATCHDATA_FAKE_DECODE=1`` (the default here — the synthetic corpus
payloads are text bytes, not images) uses a deterministic fake;
with it disabled, PNG and PPM payloads decode/resize/re-encode FOR
REAL through the pure-stdlib codec (png_codec.py), and other formats
raise NotImplementedError where PIL/ffmpeg would plug in.

At 100 TB: binaries live in their own parquet column (columnar
pruning keeps metadata-only queries from ever touching bytes);
mapInPandas streams Arrow batches so peak memory is one batch of
decoded media per core, and ``maxRecordsPerBatch`` bounds it.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("crc32", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque media payload column from text (the test
    corpus has no real media); schema is exactly what an ingest of
    image bytes would produce: (id, media_type, payload binary)."""
    return df.select(
        F.col(id_col),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for the codec call: dimensions derived
    from payload length only (mirrorable in SQL for the oracle)."""
    n = len(payload)
    return (n * 7 % 640 + 1, n * 13 % 480 + 1, n % 30 + 1)


def _use_fake() -> bool:
    """Resolved on the DRIVER at plan-build time and closed over into
    the mapInPandas functions — executor worker processes are forked
    before a test's env change and would not see it."""
    return os.environ.get("SCRATCHDATA_FAKE_DECODE", "1") == "1"


def decode_image(
    payload: bytes, media_type: str, fake: bool | None = None
) -> tuple[int, int, int]:
    """(width, height, n_frames). With the fake disabled, PNG and PPM
    payloads decode for real through the pure-stdlib codec
    (png_codec.py); other formats still need PIL/ffmpeg and refuse."""
    if fake if fake is not None else _use_fake():
        return _fake_decode(payload, media_type)
    from scratchdata_spark.operators import jpeg_codec, png_codec

    b = bytes(payload)
    if png_codec.sniff(b) is not None:
        # header-only probe: the metadata path must be O(1) per image,
        # not a full O(w*h) pixel decode
        w, h, _ch = png_codec.probe(b)
        return (w, h, 1)
    if jpeg_codec.sniff_jpeg(b):
        # baseline JPEG: marker-walk probe, same O(1) contract
        w, h, _ch = jpeg_codec.probe_jpeg(b)
        return (w, h, 1)
    from scratchdata_spark.operators import avi_codec, gif_codec

    if gif_codec.sniff_gif(b):
        # the multi-frame format: block-walk probe counts frames
        # without LZW work — real n_frames for the frame sampler
        return gif_codec.probe_gif(b)
    if avi_codec.sniff_avi(b):
        # the video CONTAINER: RIFF chunk-walk probe (avih header),
        # no JPEG entropy work — real n_frames for the frame sampler
        return avi_codec.probe_avi(b)
    # audio mapping into the media-meta columns: width=channels,
    # height=sample rate, n_frames=PCM frame count.  Sample counts
    # SATURATE at INT32_MAX: FLAC's field is 36 bits and Ogg granules
    # are 64, but META_SCHEMA's n_frames is int32 — without the clamp
    # a >13.5 h capture would silently WRAP through the Arrow cast
    # (convertToArrowArraySafely is off by default; reviewer catch)
    _sat = 2**31 - 1
    if png_codec.sniff_wav(b):
        ch, rate, frames = png_codec.wav_info(b)
        return (ch, rate, min(frames, _sat))
    from scratchdata_spark.operators import audio_containers

    if audio_containers.sniff_flac(b):
        # compressed-audio containers share the WAV mapping; the
        # STREAMINFO block carries everything, no rice decode
        ch, rate, frames = audio_containers.probe_flac(b)
        return (ch, rate, min(frames, _sat))
    if audio_containers.sniff_ogg(b):
        # Opus/Vorbis: id-header packet + last-page granule position
        ch, rate, frames = audio_containers.probe_ogg(b)
        return (ch, rate, min(frames, _sat))
    from scratchdata_spark.operators import mp4_codec, webm_codec

    if mp4_codec.sniff_mp4(b):
        # ISO-BMFF: box-walk probe (moov/trak sample tables) — real
        # dims/frame-count metadata with zero entropy work; FRAME
        # decode still refuses below (H.264/VP9 need ffmpeg).  The
        # stsz sample_count is a raw uint32 and WebM's PixelWidth/
        # Height are arbitrary-width EBML uints, so the probe values
        # saturate at INT32_MAX like the audio counts above — a
        # crafted header must not wrap through the Arrow cast
        w, h, nf = mp4_codec.probe_mp4(b)
        return (min(w, _sat), min(h, _sat), min(nf, _sat))
    if webm_codec.sniff_webm(b):
        # Matroska/WebM: EBML element-walk probe (Tracks + block
        # counting) — same metadata-only contract as the MP4 path
        w, h, nf = webm_codec.probe_webm(b)
        return (min(w, _sat), min(h, _sat), min(nf, _sat))
    raise NotImplementedError(
        "only PNG/PPM/JPEG/GIF/MJPEG-AVI/WAV decode in this container;"
        " MP4/WebM probe metadata only (H.264/VP9 entropy decode needs"
        " ffmpeg)"
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: (doc_id, media_type, payload)
    → META_SCHEMA rows. One Arrow batch in, one out — the shape any
    real decode/resize/frame-sample stage uses."""

    fake = _use_fake()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [
                decode_image(p, m, fake)
                for p, m in zip(payloads, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in payloads],
                    "crc32": [zlib.crc32(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(run, META_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("byte_len", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize stage: (doc_id, media_type, payload) → fixed-dimension
    payloads. Real pipelines decode → scale → re-encode here; the
    fake keeps the plumbing honest with a deterministic byte-budget
    truncation (``payload[: max(1, w*h//64)]``) so the output size
    law is checkable from SQL. Batch shape, output schema, and
    per-core memory bounds are exactly the real stage's."""
    budget = max(1, target_w * target_h // 64)
    fake = _use_fake()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # real pixels: decode (PNG/PPM/JPEG), box-filter
                # resample, re-encode PNG — pure stdlib+numpy,
                # executor-side per batch
                from scratchdata_spark.operators import jpeg_codec, png_codec

                out = []
                for p in pdf["payload"]:
                    pb = bytes(p)
                    if jpeg_codec.sniff_jpeg(pb):
                        w, h, ch, px = jpeg_codec.decode_jpeg(pb)
                    else:
                        w, h, ch, px = png_codec.decode(pb)
                    small = png_codec.box_resize(
                        w, h, ch, px, target_w, target_h
                    )
                    out.append(png_codec.encode_png(
                        target_w, target_h, ch, small
                    ))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": "image/png",
                        "width": target_w,
                        "height": target_h,
                        "byte_len": [len(p) for p in out],
                        "payload": out,
                    }
                )
                continue
            out = [bytes(p)[:budget] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "byte_len": [len(p) for p in out],
                    "payload": out,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling: one video row fans out to ≤ ``max_frames``
    frame rows at evenly spaced indices (``floor(i * n / max)``) — the
    1→N row expansion every video pipeline needs, done inside the
    Arrow batch so the shuffle sees already-exploded rows. The fake
    "frame" is a deterministic byte slice of the payload; a real
    decoder drops in at the marked call."""

    fake = _use_fake()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "n_frames": [], "payload": []}
            for doc_id, mt, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                b = bytes(p)
                if not fake:
                    # REAL multi-frame paths: animated GIF and MJPEG
                    # AVI decode in-sandbox (gif_codec.py /
                    # avi_codec.py); sampled frames come out as PNGs
                    # (the pipeline's normalized image form, like
                    # resize_images). Other containers still refuse
                    # through decode_image below.
                    from scratchdata_spark.operators import (
                        avi_codec,
                        gif_codec,
                        png_codec,
                    )

                    from scratchdata_spark.operators import (
                        mp4_codec,
                        webm_codec,
                    )

                    if mp4_codec.sniff_mp4(b) or webm_codec.sniff_webm(b):
                        # metadata probes fine (decode_image), but
                        # FRAMES need the H.264/VP9 entropy decode —
                        # refuse loudly rather than slice opaque bytes
                        raise NotImplementedError(
                            "MP4/WebM frame decode needs ffmpeg; only"
                            " the container probe is available"
                            " in-sandbox"
                        )
                    decoder = None
                    if gif_codec.sniff_gif(b):
                        decoder = gif_codec.decode_gif
                    elif avi_codec.sniff_avi(b):
                        decoder = avi_codec.decode_avi
                    if decoder is not None:
                        w, h, n_frames, frames = decoder(b)
                        # a valid zero-frame container (GIF with no
                        # image descriptor, AVI with an empty movi)
                        # yields no rows, like the mp4 path's
                        # n_frames=0
                        take = min(max_frames, n_frames)
                        for i in range(take):
                            idx = i * n_frames // take
                            rows["doc_id"].append(doc_id)
                            rows["frame_idx"].append(idx)
                            rows["n_frames"].append(n_frames)
                            rows["payload"].append(
                                png_codec.encode_png(w, h, 3, frames[idx])
                            )
                        continue
                if mt != "video/mp4":
                    continue
                _, _, n_frames = decode_image(p, mt, fake)  # codec seam
                take = min(max_frames, n_frames)
                for i in range(take):
                    idx = i * n_frames // take
                    step = max(1, len(b) // n_frames)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["n_frames"].append(n_frames)
                    rows["payload"].append(b[idx * step : idx * step + step])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, FRAME_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: payload bytes → fixed-``dim`` float
    vector (what a vision/audio encoder produces). Deterministic fake:
    byte-histogram folded to ``dim`` buckets, L1-normalized — keeps
    the bytes→vector contract (stable across runs, unit-ish scale)
    without a model. Output feeds the similarity operators directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype("float64")
                total = hist.sum() or 1.0
                feats.append((hist / total).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def extract_media_meta_native(df: DataFrame) -> DataFrame:
    """Metadata-only fast path: byte length, crc32, and media type are
    native column expressions (no Python boundary, whole-stage
    codegen). The dimension fields mirror the deterministic fake in
    arithmetic; with a real codec they require the mapInPandas stage
    above — which is exactly the design rule: cross into Python only
    for the decode itself, never for metadata a column expression can
    produce."""
    n = F.length("payload").cast("long")
    return df.select(
        "doc_id",
        "media_type",
        n.alias("byte_len"),
        F.crc32("payload").alias("crc32"),
        (n * 7 % 640 + 1).cast("int").alias("width"),
        (n * 13 % 480 + 1).cast("int").alias("height"),
        (n % 30 + 1).cast("int").alias("n_frames"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
        StructField("dominant_freq_hz", DoubleType()),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Signal-level audio features from PCM WAV payloads — the audio
    analogue of :func:`extract_media_meta`: ``(doc_id, payload)`` →
    one feature row per file, decoded FOR REAL through the stdlib
    ``wave`` module (no external audio libraries; non-WAV or
    unparseable payloads yield NULL features instead of failing the
    batch, the same per-row containment as the image codecs).

    Features, all computed in numpy inside the Arrow batch — one
    vectorized pass + one rFFT per file, no per-sample Python:

    * ``n_channels`` / ``sample_rate`` / ``duration_sec`` — header.
    * ``rms`` — root-mean-square of the [-1, 1]-normalized mono mix
      (loudness; digital silence → 0).
    * ``zero_crossing_rate`` — sign changes per sample of the mono
      mix (noisiness/voicing proxy).
    * ``spectral_centroid_hz`` — magnitude-weighted mean frequency of
      the rFFT (brightness). NULL for silence (no spectrum).
    * ``dominant_freq_hz`` — the strongest non-DC rFFT bin; for a
      pure tone this recovers the tone's frequency to bin precision
      (sample_rate / n_samples).

    These are the columns an audio quality filter keys on before
    training (drop silence, clipping, test tones, ultrasonic junk) —
    map-only, no shuffle, O(n log n) per file in the sample count.
    The reference has no audio analysis surface (beyond-parity; its
    media handling stops at blob storage)."""
    import io
    import wave

    import numpy as np

    from scratchdata_spark.operators import png_codec

    def one(payload) -> tuple:
        null7 = (None, None, None, None, None, None, None)
        if payload is None:
            return null7
        b = bytes(payload)
        if not png_codec.sniff_wav(b):
            return null7
        try:
            with wave.open(io.BytesIO(b), "rb") as w:
                ch, rate = w.getnchannels(), w.getframerate()
                nf, width = w.getnframes(), w.getsampwidth()
                raw = w.readframes(nf)
        except (wave.Error, EOFError):
            return null7
        dur = float(nf) / rate if rate else 0.0
        header_only = (ch, rate, dur, None, None, None, None)
        try:
            if width == 2:
                raw = raw[: len(raw) - (len(raw) % 2)]  # truncated data chunk
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
            elif width == 1:  # 8-bit WAV is unsigned, midpoint 128
                x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            elif width == 4:
                raw = raw[: len(raw) - (len(raw) % 4)]
                x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
            else:  # 24-bit needs byte surgery; punt to NULL features
                return header_only
            if ch > 1:
                x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
            if x.size == 0:
                return header_only
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = (
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if x.size > 1
                else 0.0
            )
            if rate <= 0:  # declared-0 framerate: no frequency axis
                return (ch, rate, dur, rms, zcr, None, None)
            mag = np.abs(np.fft.rfft(x))
            mag[0] = 0.0  # DC carries no pitch information
            total = float(mag.sum())
            if total <= 0.0:
                return (ch, rate, dur, rms, zcr, None, None)
            freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
            centroid = float((freqs * mag).sum() / total)
            dominant = float(freqs[int(np.argmax(mag))])
            return (ch, rate, dur, rms, zcr, centroid, dominant)
        except (ValueError, ZeroDivisionError):
            # per-row containment: one corrupt file in a crawled
            # corpus must never fail the task (docstring contract)
            return header_only

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_channels": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "duration_sec": [r[2] for r in rows],
                    "rms": [r[3] for r in rows],
                    "zero_crossing_rate": [r[4] for r in rows],
                    "spectral_centroid_hz": [r[5] for r in rows],
                    "dominant_freq_hz": [r[6] for r in rows],
                }
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
