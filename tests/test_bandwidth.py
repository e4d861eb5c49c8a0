"""Effective-bandwidth profile (operators/snr.py:pcm_bandwidth_profile).

Pins the invariants the audio_bandwidth_check oracle relies on, against
an independent numpy twin, plus the analytic property that makes the
first-difference ratio a bandwidth estimate: for the 3-harmonic fixture
signal the ratio Σ(Δv)²/Σv² is bracketed by 4·sin²(π·f0/sr) and
4·sin²(π·3f0/sr) — the spectrum-weighted mean can't leave the component
range — and the drifted high-sr codec lands in the narrowband band
wholesale (the planted upsample story).
"""

import math

import numpy as np

from json_spark.fixtures.gen import CORRUPT_EVERY, _row, generate_clips
from json_spark.fixtures.signal import reference_signal
from json_spark.operators.snr import pcm_bandwidth_profile

N = 600


def _lattice(i: int) -> np.ndarray:
    r = _row(i)
    dur = r["dur_ms"] if r["dur_ms"] is not None else 100
    sig = reference_signal(r["clip_id"], r["sr_hz"], dur)
    return np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int64)


def test_hfc_exact_vs_scalar_twin(spark):
    clips = generate_clips(spark, N, partitions=4)
    rows = pcm_bandwidth_profile(clips, extra_cols=["codec"]).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.clip_id, []).append(r)
    for i in range(N):
        if i % CORRUPT_EVERY == CORRUPT_EVERY - 1:
            continue
        meta = _row(i)
        v = _lattice(i)
        # scalar loop — independent of the kernel's np.diff formulation
        hfc = sum((int(b) - int(a)) ** 2 for a, b in zip(v[:-1], v[1:]))
        sq = sum(int(a) * int(a) for a in v)
        match = [r for r in by_id[meta["clip_id"]]
                 if r.verdict == "GREEN" and r.n_samples == len(v)
                 and r.hfc == hfc and r.pcm_sq_sum == sq]
        assert match, f"row {i}: hfc/sq mismatch"


def test_ratio_bracketed_by_component_band(spark):
    """Σ(Δv)²/Σv² lies inside [4sin²(πf0/sr)·(1-ε), 4sin²(3πf0/sr)·(1+ε)]
    for every clean clip — the weighted-mean bracket that turns the
    ratio into an effective-bandwidth estimate (3f0 ≤ 3288 < 4000 ≤
    Nyquist for every fixture sr, so no aliasing fold)."""
    clips = generate_clips(spark, N, partitions=4)
    rows = pcm_bandwidth_profile(clips).collect()
    meta = {_row(i)["clip_id"]: _row(i) for i in range(N)
            if i % CORRUPT_EVERY != CORRUPT_EVERY - 1}
    checked = 0
    for r in rows:
        if r.verdict != "GREEN" or r.clip_id not in meta:
            continue
        m = meta[r.clip_id]
        from json_spark.fixtures.signal import clip_seed
        f0 = 100.0 + (clip_seed(r.clip_id) % 997)
        ratio = r.hfc / r.pcm_sq_sum
        lo = 4 * math.sin(math.pi * f0 / m["sr_hz"]) ** 2
        hi = 4 * math.sin(math.pi * 3 * f0 / m["sr_hz"]) ** 2
        assert lo * 0.95 <= ratio <= hi * 1.05, \
            f"{r.clip_id}: ratio {ratio} outside [{lo}, {hi}]"
        checked += 1
    assert checked > N * 0.9


def test_drifted_codec_all_narrowband(spark):
    """The planted story: 'opus' draws sr from {44100, 48000} only while
    f0 ≤ 1096, so every opus clip's effective bandwidth sits below
    Nyquist/16 (fp < 384) — declared-vs-content upsample suspects —
    with analytic worst case fp = 358 at (f0=1096, sr=44100)."""
    clips = generate_clips(spark, N, partitions=4)
    rows = (pcm_bandwidth_profile(clips, extra_cols=["codec"])
            .filter("verdict = 'GREEN'").collect())
    n_opus = 0
    for r in rows:
        fp = r.hfc * 10000 // r.pcm_sq_sum
        if r.codec == "opus":
            assert fp < 384, f"{r.clip_id}: opus fp {fp} not narrowband"
            n_opus += 1
    assert n_opus > 0


def test_registry_verdict_consistency(spark, sf_dir):
    """n_narrowband ≤ n_oversampled ≤ n_clips per codec, opus fully
    narrowband, and the pcm hot codec is the dominant clip count."""
    import __spark_entry__ as e
    out = {r["codec"]: r for r in
           e.queries()["audio_bandwidth_check"](spark, sf_dir).collect()}
    assert set(out) == {"pcm_s16le", "flac", "opus", "mp3"}
    for c, r in out.items():
        assert 0 <= r["n_narrowband"] <= r["n_oversampled"] <= r["n_clips"]
        assert r["nhfc_fp_min"] <= r["nhfc_fp_max"]
    assert out["opus"]["n_narrowband"] == out["opus"]["n_clips"]
    assert out["pcm_s16le"]["n_clips"] == max(r["n_clips"]
                                              for r in out.values())
