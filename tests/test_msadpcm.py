"""Microsoft ADPCM codec (functions/msadpcm.py) — the engine's SECOND
compressed lossy codec (fmt tag 0x02, 2-tap linear prediction from the
published 7-pair tables): sample-exactness of the lockstep-vectorized
decoder against an independent scalar reference, batch==per-clip byte
identity, container round-trips, the SNR gate through 4-bit
quantization, and the fused kernel's seventh container fall-through.
"""

from __future__ import annotations

import numpy as np
import pytest

from json_spark.fixtures.signal import reference_signal, snr_db
from json_spark.functions.msadpcm import (
    ADAPT,
    BLOCK_ALIGN,
    COEFF1,
    COEFF2,
    MIN_DELTA,
    SAMPLES_PER_BLOCK,
    decode_blocks,
    decode_msadpcm_wav,
    encode_blocks,
    encode_msadpcm_wav,
    encode_msadpcm_wav_batch,
)


def _scalar_decode_block(pidx, idelta, s1, s2, codes):
    """Independent straight-line scalar MS-ADPCM decoder (one sample at
    a time, per the public spec's C pseudocode with truncating /256) —
    the golden twin for the vectorized lockstep kernel."""
    c1, c2 = int(COEFF1[pidx]), int(COEFF2[pidx])
    out = [int(s2), int(s1)]
    s1, s2 = int(s1), int(s2)
    delta = max(MIN_DELTA, int(idelta))
    for code in codes:
        num = s1 * c1 + s2 * c2
        pred = abs(num) // 256
        if num < 0:
            pred = -pred
        signed = code - 16 if code >= 8 else code
        sample = max(-32768, min(32767, pred + signed * delta))
        delta = max(MIN_DELTA, (int(ADAPT[code]) * delta) >> 8)
        s2, s1 = s1, sample
        out.append(sample)
    return out


def test_vectorized_decoder_matches_scalar_reference():
    rng = np.random.default_rng(7)
    sig = (np.sin(np.arange(SAMPLES_PER_BLOCK) / 9.0) * 15000
           + rng.normal(0, 300, SAMPLES_PER_BLOCK)).astype(np.int16)
    blocks = sig.reshape(1, SAMPLES_PER_BLOCK)
    pidx, idelta, codes = encode_blocks(blocks)
    vec = decode_blocks(pidx, idelta, blocks[:, 1], blocks[:, 0], codes)
    ref = _scalar_decode_block(int(pidx[0]), int(idelta[0]),
                               int(blocks[0, 1]), int(blocks[0, 0]),
                               [int(c) for c in codes[0]])
    assert vec[0].tolist() == ref


def test_decode_inverts_encode_recurrence():
    """The encoder's running state must equal the decoder's: decoding
    the encoder's own codes reproduces its reconstruction exactly, and
    the reconstruction tracks the input within the final step size."""
    sig = np.round(reference_signal("clip-000000000007", 44100, 50)
                   * 32767).astype(np.int16)
    wav = encode_msadpcm_wav(sig, 44100)
    dec, sr = decode_msadpcm_wav(wav)
    assert sr == 44100 and len(dec) == len(sig)
    assert snr_db(sig.astype(np.float32) / 32767.0, dec) > 30.0


def test_container_roundtrip_length_sr_and_determinism():
    for sr in (44100, 48000):
        for n in (1, 2, 499, 500, 501, 1234):
            sig = (np.sin(np.arange(n) / 5.0) * 9000).astype(np.int16)
            w1 = encode_msadpcm_wav(sig, sr)
            w2 = encode_msadpcm_wav(sig, sr)
            assert w1 == w2                      # bit-deterministic
            dec, sr2 = decode_msadpcm_wav(w1)
            assert sr2 == sr and len(dec) == n   # fact-count truncation
            # size law: 90 header bytes + 256 per 500-sample block
            nb = (n + SAMPLES_PER_BLOCK - 1) // SAMPLES_PER_BLOCK
            assert len(w1) == 90 + BLOCK_ALIGN * nb


def test_batch_encoder_bytes_identical_to_per_clip():
    sigs = [np.round(reference_signal(f"clip-{i:012d}", 44100, 40 + 7 * i)
                     * 32767).astype(np.int16) for i in range(6)]
    batch = encode_msadpcm_wav_batch(sigs, [44100] * 6)
    solo = [encode_msadpcm_wav(s, 44100) for s in sigs]
    assert batch == solo


def test_rejects_foreign_payloads():
    from json_spark.fixtures.signal import pcm16_wav_bytes

    sig = reference_signal("clip-000000000001", 8000, 50)
    pcm = pcm16_wav_bytes(sig, 8000)             # fmt tag 1, not 2
    with pytest.raises(ValueError):
        decode_msadpcm_wav(pcm)
    with pytest.raises(ValueError):
        decode_msadpcm_wav(b"garbage not riff")
    from json_spark.functions.adpcm import encode_adpcm_wav
    ima = encode_adpcm_wav(np.round(sig * 32767).astype(np.int16), 8000)
    with pytest.raises(ValueError):
        decode_msadpcm_wav(ima)                  # fmt tag 0x11, not 2


def test_header_declared_coefficients_are_used():
    """The decoder must read the coefficient pairs FROM the fmt chunk
    (the spec's extensible-predictor design), not assume the canonical
    table: permuting the written pairs while remapping the block
    predictor indices decodes identically."""
    sig = (np.sin(np.arange(800) / 7.0) * 12000).astype(np.int16)
    wav = bytearray(encode_msadpcm_wav(sig, 44100))
    base, _ = decode_msadpcm_wav(bytes(wav))
    # swap coef pairs 0 and 1 in the fmt chunk (offsets 42.. in 0-based:
    # coefs start at 1-based 43 -> 0-based 42), remap predictor bytes
    import struct as st
    p0 = wav[42:46]
    wav[42:46] = wav[46:50]
    wav[46:50] = p0
    data_off = 90
    for b in range(data_off, len(wav), BLOCK_ALIGN):
        if wav[b] == 0:
            wav[b] = 1
        elif wav[b] == 1:
            wav[b] = 0
    got, _ = decode_msadpcm_wav(bytes(wav))
    assert np.array_equal(base, got)


def test_snr_gate_through_msadpcm_clean_vs_corrupt():
    """Worst-case clean SNR at the 44.1/48 kHz partition clears the
    30 dB gate with margin; planted ±0.3 noise stays far below."""
    worst = float("inf")
    for i in range(10):
        cid = f"clip-{i:012d}"
        for sr in (44100, 48000):
            sig = reference_signal(cid, sr, 120)
            ints = np.round(sig * 32767).astype(np.int16)
            dec, _ = decode_msadpcm_wav(encode_msadpcm_wav(ints, sr))
            worst = min(worst, snr_db(
                ints.astype(np.float32) / 32767.0, dec))
    assert worst > 32.0, worst
    rng = np.random.default_rng(3)
    sig = reference_signal("clip-000000000002", 44100, 120)
    noisy = np.clip(sig + rng.uniform(-0.3, 0.3, sig.shape), -1, 1)
    ints = np.round(noisy * 32767).astype(np.int16)
    dec, _ = decode_msadpcm_wav(encode_msadpcm_wav(ints, 44100))
    assert snr_db(sig, dec) < 10.0


def test_fused_kernel_seventh_container_fall_through(spark):
    """pcm_scan must decode MS-ADPCM payloads GREEN through the magic-
    gated ladder (WAV→FLAC→AU→AIFF→IMA→A-law→MS) with no codec hint."""
    from json_spark.operators.multimodal import transcode_msadpcm
    from json_spark.operators.snr import snr_check

    from json_spark.fixtures.gen import generate_clips
    clips = generate_clips(spark, 300, partitions=4) \
        .filter("codec = 'opus'")
    ms = transcode_msadpcm(clips)
    rows = snr_check(ms).collect()
    assert len(rows) > 0
    assert all(r["verdict"] == "GREEN" for r in rows
               if r["snr_db"] is not None)
    assert all(r["snr_db"] is not None for r in rows)


def test_transcode_null_and_foreign_passthrough(spark):
    from json_spark.functions.alaw import encode_alaw_wav
    from json_spark.operators.multimodal import transcode_msadpcm

    alaw = encode_alaw_wav(
        (np.sin(np.arange(400) / 9.0) * 8000).astype(np.int16), 8000)
    df = spark.createDataFrame(
        [("c1", None, 8000, 100, "opus", "t"),
         ("c2", b"garbage", 8000, 100, "opus", "t"),
         ("c3", alaw, 8000, 100, "opus", "t")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string")
    out = {r["clip_id"]: r["bytes"]
           for r in transcode_msadpcm(df).collect()}
    assert out["c1"] is None and out["c2"] is None and out["c3"] is None


def test_msadpcm_header_columns_pure_column(spark):
    """The zero-Python header parse must agree with the writer's layout
    byte-for-byte on every field."""
    from pyspark.sql import functions as F

    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import (msadpcm_header_columns,
                                                 transcode_msadpcm)

    clips = generate_clips(spark, 200, partitions=2) \
        .filter("codec = 'opus'")
    ms = transcode_msadpcm(clips)
    h = msadpcm_header_columns(F.col("bytes"))
    rows = ms.select(
        "sr_hz", F.length("bytes").alias("blen"),
        h["riff_ok"].alias("riff_ok"), h["fmt_tag"].alias("tag"),
        h["hdr_sr_hz"].alias("hsr"), h["block_align"].alias("ba"),
        h["bits"].alias("bits"), h["samples_per_block"].alias("spb"),
        h["n_coef"].alias("nc"), h["fact_samples"].alias("fn"),
        h["data_bytes"].alias("db")).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["riff_ok"] and r["tag"] == 2 and r["hsr"] == r["sr_hz"]
        assert r["ba"] == BLOCK_ALIGN and r["bits"] == 4
        assert r["spb"] == SAMPLES_PER_BLOCK and r["nc"] == 7
        nb = (r["fn"] + SAMPLES_PER_BLOCK - 1) // SAMPLES_PER_BLOCK
        assert r["db"] == nb * BLOCK_ALIGN
        assert r["blen"] == 90 + r["db"]
