"""Null-payload regression across every Arrow decode kernel.

On pyarrow >= 16 a null binary scalar's ``as_buffer()`` RETURNS None
(it does not raise AttributeError), so ``memoryview(None)`` /
``bytes(None)`` raise TypeError — a null ``bytes`` cell must still
yield a null/RED row, never kill the Arrow task. One mixed batch
(valid WAV + null + garbage) is pushed through each kernel."""

import numpy as np
import pytest

from json_spark.fixtures.signal import pcm16_wav_bytes


@pytest.fixture(scope="module")
def mixed(spark):
    sig = (0.5 * np.sin(2 * np.pi * 440 * np.arange(800) / 8000)
           ).astype(np.float32)
    wav = pcm16_wav_bytes(sig, 8000)
    return spark.createDataFrame(
        [("ok", "pcm_s16le", 8000, 100, wav),
         ("nul", "pcm_s16le", 8000, 100, None),
         ("bad", "pcm_s16le", 8000, 100, b"RIFFgarbage")],
        "clip_id string, codec string, sr_hz int, dur_ms int, bytes binary"
    ).coalesce(1)


def _by_id(df):
    return {r["clip_id"]: r for r in df.collect()}


def test_audio_features_null(mixed):
    from json_spark.operators.multimodal import audio_features
    rows = _by_id(audio_features(mixed))
    assert rows["ok"]["n_samples"] == 800
    # null/bad route to the deterministic fake, flagged undecoded + RED
    assert rows["nul"]["decoded"] is False
    assert rows["nul"]["verdict"] == "RED"
    assert rows["bad"]["decoded"] is False


def test_dominant_freq_null(mixed):
    from json_spark.operators.multimodal import dominant_freq
    rows = _by_id(dominant_freq(mixed))
    assert abs(rows["ok"]["dominant_hz"] - 440) <= rows["ok"]["bin_hz"]
    assert rows["nul"]["dominant_hz"] is None
    assert rows["bad"]["dominant_hz"] is None


def test_spectral_flatness_null(mixed):
    from json_spark.operators.multimodal import spectral_flatness
    rows = _by_id(spectral_flatness(mixed))
    assert rows["ok"]["flatness"] is not None
    assert rows["nul"]["flatness"] is None
    assert rows["bad"]["flatness"] is None


def test_transcode_null(mixed):
    from json_spark.operators.multimodal import transcode_au, transcode_flac
    for fn in (transcode_flac, transcode_au):
        rows = _by_id(fn(mixed))
        assert rows["ok"]["bytes"] is not None
        assert rows["nul"]["bytes"] is None  # passes through as null
        assert rows["bad"]["bytes"] is None


def test_flac_roundtrip_null(mixed):
    from json_spark.operators.multimodal import flac_roundtrip
    rows = {r["decoded"] for r in flac_roundtrip(mixed).collect()}
    assert rows == {True, False}


def test_segmentation_kernels_null(mixed):
    from json_spark.operators.segmentation import (
        normalize_gain,
        resample_dominant_freq,
    )
    rows = _by_id(resample_dominant_freq(mixed, target_sr=4000))
    assert rows["nul"]["dominant_hz"] is None
    assert rows["bad"]["dominant_hz"] is None
    assert rows["ok"]["dominant_hz"] is not None
    rows = _by_id(normalize_gain(mixed))
    assert rows["ok"] is not None  # kernel survived the mixed batch


def test_frame_sample_and_perceptual_null(mixed):
    from json_spark.operators.multimodal import (
        frame_sample,
        perceptual_fingerprint,
    )
    ids = {r["clip_id"] for r in frame_sample(mixed).collect()}
    assert "ok" in ids  # null/bad rows contribute no frames, no crash
    rows = _by_id(perceptual_fingerprint(mixed))
    assert "ok" in rows
