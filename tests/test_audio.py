"""Audio feature extraction (multimodal.extract_audio_features):
real stdlib-WAV decode inside the Arrow batch, spectral features
verified against generated pure tones (the frequency is KNOWN, so
dominant_freq/centroid have exact expected values)."""

from __future__ import annotations

import numpy as np
import pytest

from scratchdata_spark.operators.multimodal import extract_audio_features
from scratchdata_spark.operators.png_codec import encode_wav


def _tone_wav(
    freq: float,
    rate: int = 8000,
    seconds: float = 0.5,
    amp: float = 0.8,
    channels: int = 1,
) -> bytes:
    t = np.arange(int(rate * seconds)) / rate
    x = np.round(amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if channels == 2:
        x = np.column_stack([x, x]).ravel()
    return encode_wav(channels, rate, x.tobytes())


def _silence_wav(rate: int = 8000, n: int = 4000) -> bytes:
    return encode_wav(1, rate, bytes(2 * n))


def _feats(spark, payloads):
    df = spark.createDataFrame(
        list(enumerate(payloads)), "doc_id long, payload binary"
    )
    return {r.doc_id: r for r in extract_audio_features(df).collect()}


def test_pure_tone_recovers_frequency(spark):
    rows = _feats(spark, [_tone_wav(440.0), _tone_wav(1760.0)])
    binhz = 8000 / 4000  # rate / n_samples = rFFT bin width
    assert rows[0].dominant_freq_hz == pytest.approx(440.0, abs=binhz)
    assert rows[1].dominant_freq_hz == pytest.approx(1760.0, abs=binhz)
    # a pure tone's centroid IS the tone (spectral leakage smears a
    # little mass across bins — allow a few bins)
    assert rows[0].spectral_centroid_hz == pytest.approx(440.0, abs=10)
    assert rows[1].spectral_centroid_hz == pytest.approx(1760.0, abs=10)
    # sine RMS = amp / sqrt(2)
    assert rows[0].rms == pytest.approx(0.8 / np.sqrt(2), abs=0.01)
    # a 440 Hz tone at 8 kHz crosses zero ~2*440 times/sec = 880/8000
    assert rows[0].zero_crossing_rate == pytest.approx(880 / 8000, rel=0.05)
    assert rows[1].zero_crossing_rate > rows[0].zero_crossing_rate
    assert rows[0].duration_sec == pytest.approx(0.5)
    assert rows[0].sample_rate == 8000 and rows[0].n_channels == 1


def test_stereo_mixes_down(spark):
    rows = _feats(spark, [_tone_wav(440.0, channels=2)])
    assert rows[0].n_channels == 2
    assert rows[0].dominant_freq_hz == pytest.approx(440.0, abs=2)
    assert rows[0].rms == pytest.approx(0.8 / np.sqrt(2), abs=0.01)


def test_silence_and_junk_are_null_not_fatal(spark):
    rows = _feats(
        spark,
        [
            _silence_wav(),
            b"not audio at all",
            None,
            b"RIFF\x00\x00\x00\x00WAVEtruncated-garbage",
        ],
    )
    s = rows[0]
    assert s.rms == 0.0 and s.zero_crossing_rate == 0.0
    assert s.spectral_centroid_hz is None  # no spectrum in silence
    assert s.dominant_freq_hz is None
    assert s.duration_sec == pytest.approx(0.5)
    for bad in (1, 2, 3):
        r = rows[bad]
        assert r.rms is None and r.dominant_freq_hz is None
        assert r.sample_rate is None


def test_corrupt_wavs_contained_not_fatal(spark):
    """Per-row containment for the two crash shapes a crawled corpus
    WILL contain: a truncated data chunk (odd byte count → frombuffer
    would raise) and a header declaring sample_rate=0 (1/rate would
    raise). Neither may fail the task."""
    good = _tone_wav(440.0)
    truncated = good[:-1]
    rate0 = bytearray(good)
    rate0[24:28] = (0).to_bytes(4, "little")  # fmt chunk sample rate
    rows = _feats(spark, [truncated, bytes(rate0)])
    # truncated: one sample lost, features still computed
    assert rows[0].dominant_freq_hz == pytest.approx(440.0, abs=2)
    # rate 0: amplitude features fine, frequency axis undefined
    assert rows[1].rms is not None and rows[1].zero_crossing_rate is not None
    assert rows[1].spectral_centroid_hz is None
    assert rows[1].dominant_freq_hz is None
    assert rows[1].duration_sec == 0.0


def test_eight_bit_wav_decodes(spark):
    t = np.arange(4000) / 8000
    x = (np.sin(2 * np.pi * 440.0 * t) * 100 + 128).astype(np.uint8)
    rows = _feats(spark, [encode_wav(1, 8000, x.tobytes(), sampwidth=1)])
    assert rows[0].dominant_freq_hz == pytest.approx(440.0, abs=2)


def test_audio_features_plan_is_map_only(spark):
    from tests.test_plans import plan

    df = spark.createDataFrame(
        [(1, _tone_wav(440.0))], "doc_id long, payload binary"
    )
    p = plan(extract_audio_features(df))
    assert "Exchange" not in p  # no shuffle: pure map-side Arrow stage
