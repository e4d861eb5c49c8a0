"""Pure-python tests for the WAV/PCM16 codec + SNR math (no Spark)."""

import numpy as np
import pytest

from json_spark.fixtures.signal import (
    clip_seed,
    decode_wav_pcm16,
    pcm16_wav_bytes,
    reference_signal,
    snr_db,
)


def test_clip_seed_stable():
    assert clip_seed("clip-000000000001") == clip_seed("clip-000000000001")
    assert clip_seed("a") != clip_seed("b")


def test_wav_roundtrip_high_snr():
    sig = reference_signal("clip-000000000042", 16000, 100)
    wav = pcm16_wav_bytes(sig, 16000)
    decoded, sr = decode_wav_pcm16(wav)
    assert sr == 16000
    assert decoded.shape == sig.shape
    # quantization-only error: far above the 30 dB gate
    assert snr_db(sig, decoded) > 60


def test_noise_drops_snr_below_gate():
    sig = reference_signal("clip-000000000007", 8000, 120)
    rng = np.random.default_rng(7)
    noisy = sig + rng.uniform(-0.3, 0.3, sig.shape).astype(np.float32)
    wav = pcm16_wav_bytes(noisy, 8000)
    decoded, _ = decode_wav_pcm16(wav)
    assert snr_db(sig, decoded) < 30


def test_malformed_wav_raises():
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"not a wav at all" * 10)
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"")


def test_snr_shape_mismatch_is_neg_inf():
    a = np.ones(10, dtype=np.float32)
    b = np.ones(11, dtype=np.float32)
    assert snr_db(a, b) == float("-inf")
