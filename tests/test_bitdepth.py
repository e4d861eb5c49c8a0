"""Effective-bit-depth OR-fold (operators/snr.py:pcm_bit_depth).

Pins the or_abs digest against an independent numpy twin and proves the
check flags requantized (8-bit-upscaled-to-16) content while leaving
genuine 16-bit clips at full depth.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_spark.fixtures.gen import CORRUPT_EVERY, _row, generate_clips
from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
from json_spark.operators.snr import pcm_bit_depth

N = 1100  # > CORRUPT_EVERY so the fixture contains a planted-noise RED row


def _eff_bits(or_abs: int) -> int:
    if or_abs == 0:
        return 0
    return 16 - ((or_abs & -or_abs).bit_length() - 1)


def _twin_or(i: int) -> int:
    r = _row(i)
    dur = r["dur_ms"] if r["dur_ms"] is not None else 100
    sig = reference_signal(r["clip_id"], r["sr_hz"], dur)
    v = np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int64)
    return int(np.bitwise_or.reduce(np.abs(v))) if len(v) else 0


@pytest.fixture(scope="module")
def bit_rows(spark):
    clips = generate_clips(spark, N, partitions=4)
    return pcm_bit_depth(clips).collect()


def test_or_fold_matches_twin_exactly(bit_rows):
    by_id = {}
    for row in bit_rows:
        by_id.setdefault(row.clip_id, []).append(row)
    checked = 0
    for i in range(N):
        if i % CORRUPT_EVERY == CORRUPT_EVERY - 1:
            continue
        r = _row(i)
        want = _twin_or(i)
        match = [row for row in by_id[r["clip_id"]]
                 if row.verdict == "GREEN" and row.or_abs == want]
        assert match, f"row {i}: no or_abs match (want {want})"
        checked += 1
    assert checked >= N - 1 - N // CORRUPT_EVERY


def test_corrupt_rows_carry_null_or(bit_rows):
    reds = [row for row in bit_rows if row.verdict == "RED"]
    assert reds and all(row.or_abs is None for row in reds)


def test_requantized_clip_flagged(spark):
    """An 8-bit-quantized waveform re-encoded as 16-bit PCM shows
    eff_bits == 8; the genuine clip from the same generator row shows
    full (or near-full) depth. Quantization error is ~45 dB SNR, so the
    fake still passes the 30 dB gate — only the bit-depth check sees it."""
    r = _row(0)
    dur = r["dur_ms"] if r["dur_ms"] is not None else 100
    sig = reference_signal(r["clip_id"], r["sr_hz"], dur)
    v = np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int64)
    vq = (v // 256) * 256                     # kill the low 8 bits
    fake = pcm16_wav_bytes(vq / 32767.0, r["sr_hz"])
    real = pcm16_wav_bytes(sig, r["sr_hz"])
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(fake), r["sr_hz"], dur, "fake8"),
         (r["clip_id"], bytearray(real), r["sr_hz"], dur, "real16")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, tag string")
    rows = {row.tag: row for row in
            pcm_bit_depth(df, extra_cols=["tag"]).collect()}
    assert rows["fake8"].verdict == "GREEN"   # passes the SNR gate
    assert _eff_bits(rows["fake8"].or_abs) <= 8
    assert _eff_bits(rows["real16"].or_abs) == 16


def test_eff_bits_column_formula_matches_python(spark):
    """The registry's pure-Column ctz formula (bit_count((x & -x) - 1))
    equals the python twin for every or_abs in the fixture."""
    clips = generate_clips(spark, 200, partitions=4)
    prof = (pcm_bit_depth(clips)
            .filter(F.col("verdict") == "GREEN")
            .withColumn("eff", F.when(F.col("or_abs") == 0, F.lit(0))
                        .otherwise(F.lit(16) - F.bit_count(
                            F.col("or_abs").bitwiseAND(-F.col("or_abs"))
                            - F.lit(1))).cast("long")))
    for row in prof.collect():
        assert row.eff == _eff_bits(row.or_abs)


# --- third-moment (polarity) digest ----------------------------------------

def _twin_cube(i: int) -> tuple[int, int]:
    r = _row(i)
    dur = r["dur_ms"] if r["dur_ms"] is not None else 100
    sig = reference_signal(r["clip_id"], r["sr_hz"], dur)
    v = np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int64)
    return int(v.sum()), int((v * v * v).sum())


def test_cube_digest_matches_twin(spark):
    from json_spark.operators.snr import pcm_polarity
    clips = generate_clips(spark, 300, partitions=4)
    rows = {}
    for row in pcm_polarity(clips).collect():
        rows.setdefault(row.clip_id, []).append(row)
    checked = 0
    for i in range(300):
        if i % CORRUPT_EVERY == CORRUPT_EVERY - 1:
            continue
        r = _row(i)
        s1, s3 = _twin_cube(i)
        assert any(row.pcm_sum == s1 and row.pcm_cube_sum == s3
                   for row in rows[r["clip_id"]]
                   if row.verdict == "GREEN"), f"row {i}"
        checked += 1
    assert checked >= 298


def test_polarity_flip_negates_cube_exactly(spark):
    """Inverting the waveform negates Σv and Σv³ EXACTLY while leaving
    |v|-based features untouched — the digest pair polarity detection
    rests on. (The inverted clip fails the fixture's SNR-vs-reference
    gate, so the gate is bypassed with a permissive threshold: polarity
    checking exists precisely for corpora with no reference signal.)"""
    from json_spark.operators.snr import pcm_polarity
    r = _row(0)
    dur = r["dur_ms"] if r["dur_ms"] is not None else 100
    sig = reference_signal(r["clip_id"], r["sr_hz"], dur)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(pcm16_wav_bytes(sig, r["sr_hz"])),
          r["sr_hz"], dur, "orig"),
         (r["clip_id"], bytearray(pcm16_wav_bytes(-sig, r["sr_hz"])),
          r["sr_hz"], dur, "flipped")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, tag string")
    rows = {row.tag: row for row in
            pcm_polarity(df, extra_cols=["tag"],
                         threshold_db=-999.0).collect()}
    o, f = rows["orig"], rows["flipped"]
    assert o.pcm_cube_sum != 0
    assert f.pcm_cube_sum == -o.pcm_cube_sum
    assert f.pcm_sum == -o.pcm_sum
