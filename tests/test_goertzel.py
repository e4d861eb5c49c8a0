"""Goertzel single-bin spectral verification (operators/multimodal.py:
goertzel_profile) on controlled WAV payloads: a clip carrying its
contract tone is dominant, a clip carrying the WRONG tone is diffuse
even though its RMS is identical — the case the loudness check cannot
see — and null payloads yield null sums instead of killing the task."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
from json_spark.operators.multimodal import goertzel_profile, goertzel_share


def _share_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "clip_id string, codec string, bytes binary")
    g = goertzel_profile(df)
    return {r["clip_id"]: r for r in g.select(
        "*", goertzel_share(F.col("n_samples"), F.col("c_sum"),
                            F.col("s_sum"), F.col("sum_sq"))
        .alias("share")).collect()}


def test_contract_tone_dominates_wrong_tone_does_not(spark):
    sr = 16000
    # right: the canonical 3-harmonic signal for THIS clip_id
    right = pcm16_wav_bytes(reference_signal("clip-000000000007", sr, 150),
                            sr)
    # wrong: same loudness envelope but rendered for a DIFFERENT id, so
    # the tone sits at another frequency — same RMS class, wrong content
    wrong = pcm16_wav_bytes(reference_signal("clip-000000000008", sr, 150),
                            sr)
    out = _share_rows(spark, [("clip-000000000007", "pcm_s16le", right),
                              ("clip-000000000007x", "pcm_s16le", None),
                              # stored under id 7's contract, carrying 8's tone
                              ])
    assert out["clip-000000000007"]["share"] > 0.8
    assert out["clip-000000000007x"]["c_sum"] is None  # null payload

    out2 = _share_rows(spark, [("clip-000000000007", "pcm_s16le", wrong)])
    assert out2["clip-000000000007"]["share"] < 0.1


def test_sums_are_exact_integers_vs_numpy(spark):
    import zlib
    sr, dur = 8000, 80
    cid = "clip-000000000042"
    sig = reference_signal(cid, sr, dur)
    wav = pcm16_wav_bytes(sig, sr)
    r = _share_rows(spark, [(cid, "pcm_s16le", wav)])[cid]

    v = np.round((np.frombuffer(wav[44:], dtype="<i2")
                  .astype(np.float32) / 32767.0)
                 .astype(np.float64) * 32767.0).astype(np.int64)
    n = len(v)
    seed = zlib.crc32(cid.encode()) & 0xFFFFFFFF
    f0 = 100 + seed % 997
    t = np.arange(n, dtype=np.float64) / sr
    ang = (2 * np.pi * f0) * t
    assert r["c_sum"] == int(v @ np.round(np.cos(ang) * 32768.0)
                             .astype(np.int64))
    assert r["s_sum"] == int(v @ np.round(np.sin(ang) * 32768.0)
                             .astype(np.int64))
    assert r["sum_sq"] == int((v * v).sum())
    assert r["n_samples"] == n and r["f0"] == f0


def test_undecodable_payload_yields_nulls(spark):
    out = _share_rows(spark, [("x", "mp3", b"\x00\x01garbage")])
    r = out["x"]
    assert r["n_samples"] is None and r["share"] is None
