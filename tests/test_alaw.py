"""G.711 A-law codec (functions/alaw.py): the exact 256-code involution
law, round-trip SNR above the verdict gate at every fixture sample rate,
container hygiene, and the fused kernel's sixth container fall-through.
"""

from __future__ import annotations

import numpy as np
import pytest

from json_spark.fixtures.signal import reference_signal, snr_db
from json_spark.functions.alaw import (
    alaw_compress,
    alaw_expand,
    decode_alaw_wav,
    encode_alaw_wav,
)


def test_involution_all_256_codes():
    """compress(expand(a)) == a for EVERY code — expand returns exact
    segment midpoints, so the code space is a fixed point set."""
    codes = np.arange(256, dtype=np.uint8)
    assert (alaw_compress(alaw_expand(codes)) == codes).all()


def test_segment_zero_is_linear():
    """A-law's defining difference from µ-law: the first segment is
    LINEAR (step 2 in the 13-bit domain -> step 16 at int16 scale)."""
    vals = alaw_expand(alaw_compress(np.arange(0, 256, 16,
                                               dtype=np.int16)))
    diffs = np.diff(vals.astype(np.int32))
    assert (diffs == diffs[0]).all()


def test_roundtrip_snr_above_gate_all_rates():
    worst = 1e9
    for sr in (8000, 16000, 22050, 44100, 48000):
        sig = reference_signal("clip-000000000077", sr, 120)
        ints = np.round(sig.astype(np.float64) * 32767).astype(np.int16)
        dec, sr2 = decode_alaw_wav(encode_alaw_wav(ints, sr))
        assert sr2 == sr and len(dec) == len(ints)
        worst = min(worst, snr_db(sig, dec))
    assert worst >= 33.0  # measured fixture-wide worst is 34.9


def test_corrupt_stays_red_through_alaw():
    sig = reference_signal("clip-000000000123", 16000, 100)
    rng = np.random.default_rng(7)
    noisy = np.clip(sig + rng.uniform(-0.3, 0.3, sig.shape)
                    .astype(np.float32), -1, 1)
    ints = np.round(noisy.astype(np.float64) * 32767).astype(np.int16)
    dec, _ = decode_alaw_wav(encode_alaw_wav(ints, 16000))
    assert snr_db(sig, dec) < 30.0


def test_rejects_foreign_payloads():
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.functions.adpcm import encode_adpcm_wav

    sig = reference_signal("clip-000000000009", 16000, 80)
    ints = np.round(sig.astype(np.float64) * 32767).astype(np.int16)
    with pytest.raises(ValueError):   # PCM16: right magic, wrong tag
        decode_alaw_wav(pcm16_wav_bytes(sig, 16000))
    with pytest.raises(ValueError):   # ADPCM: tag 0x11, not 6
        decode_alaw_wav(encode_adpcm_wav(ints, 16000))
    with pytest.raises(ValueError):
        decode_alaw_wav(b"fLaC" + b"\x00" * 32)


def test_fused_kernel_sixth_container_fall_through(spark):
    """transcode_alaw → snr_check end-to-end: clean clips GREEN through
    the A-law branch, payload halved."""
    from pyspark.sql import functions as F

    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import transcode_alaw
    from json_spark.operators.snr import pcm_scan

    clips = generate_clips(spark, 300, partitions=4)
    alaw = transcode_alaw(clips)
    scan = pcm_scan(alaw, extra_cols=["codec"], emit_header=True)
    rows = scan.collect()
    assert len(rows) == 300
    greens = [r for r in rows if r["verdict"] == "GREEN"]
    assert len(greens) >= 299   # only the i%997 plant goes RED
    assert all(r["snr_db"] >= 30.0 for r in greens)
