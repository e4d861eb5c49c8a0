"""rolling_psi (operators/drift.py) vs a numpy brute-force twin, with a
window that misses buckets entirely — the case the map-explode grid
completion exists for."""

import math

import numpy as np
from pyspark.sql import functions as F

from json_spark.operators.drift import EPS, rolling_psi


def _brute_psi(day_counts: dict[int, np.ndarray]) -> dict[int, float]:
    base = sum(day_counts.values())
    q = base / base.sum()
    out = {}
    for day, n in day_counts.items():
        p = n / n.sum()
        pc, qc = np.maximum(p, EPS), np.maximum(q, EPS)
        out[day] = float(np.sum((pc - qc) * np.log(pc / qc)))
    return out


def test_rolling_psi_matches_bruteforce_with_missing_buckets(spark):
    nbins = 5
    # day 0: uniform; day 1: skewed; day 2: MISSING buckets 3 and 4
    day_counts = {
        0: np.array([10, 10, 10, 10, 10]),
        1: np.array([40, 5, 2, 2, 1]),
        2: np.array([25, 25, 0, 0, 0]),
    }
    rows = [(d, b) for d, counts in day_counts.items()
            for b, n in enumerate(counts) for _ in range(int(n))]
    df = spark.createDataFrame(rows, "day long, bucket int")
    got = {r["w"]: r["psi"] for r in
           rolling_psi(df, bucket=F.col("bucket"),
                       window_col=F.col("day"), nbins=nbins).collect()}
    want = _brute_psi(day_counts)
    assert set(got) == set(want)
    for day in want:
        assert math.isclose(got[day], want[day], rel_tol=1e-9), day
    # the missing-bucket day must pay the baseline mass of buckets 3-4:
    # dropping absent buckets would report a (p-q)ln(p/q) sum over only
    # buckets 0-2, strictly smaller than the complete-grid value
    partial = sum(
        (max(p, EPS) - max(q, EPS)) * math.log(max(p, EPS) / max(q, EPS))
        for p, q in zip(
            (day_counts[2] / day_counts[2].sum())[:3],
            (sum(day_counts.values()) / sum(day_counts.values()).sum())[:3]))
    assert got[2] > partial


def test_rolling_psi_identical_windows_are_stable(spark):
    # every window drawn from the same distribution -> PSI ~ 0
    rows = [(d, b) for d in range(4) for b in range(8) for _ in range(9)]
    df = spark.createDataFrame(rows, "day long, bucket int")
    out = rolling_psi(df, bucket=F.col("bucket"),
                      window_col=F.col("day"), nbins=8).collect()
    assert len(out) == 4
    for r in out:
        assert abs(r["psi"]) < 1e-12


def test_wasserstein_vs_bruteforce_sparse_buckets(spark):
    """wasserstein_distance equals a numpy CDF twin, on share tables
    with buckets MISSING on one or both sides and a gap in the bucket
    ids (bucket 5 absent everywhere) — the gap must carry the CDF
    difference across its full width."""
    from json_spark.operators.drift import wasserstein_distance

    cur_counts = {0: 10, 1: 0, 2: 5, 4: 5, 6: 10}   # no bucket 3, 5
    base_counts = {0: 5, 2: 10, 3: 5, 4: 5, 6: 5}   # no bucket 1, 5
    cur = spark.createDataFrame(
        [(b, n, n / sum(cur_counts.values())) for b, n in cur_counts.items()
         if n > 0], "bucket long, n long, share double")
    base = spark.createDataFrame(
        [(b, n, n / sum(base_counts.values())) for b, n in base_counts.items()
         if n > 0], "bucket long, n long, share double")
    got = wasserstein_distance(cur, base).collect()[0]["w1"]

    # numpy twin over the dense grid 0..6
    p = np.zeros(7); q = np.zeros(7)
    for b, n in cur_counts.items():
        p[b] = n / sum(cur_counts.values())
    for b, n in base_counts.items():
        q[b] = n / sum(base_counts.values())
    want = float(np.abs(np.cumsum(p) - np.cumsum(q))[:-1].sum())
    assert math.isclose(got, want, rel_tol=1e-12), (got, want)

    # identical distributions => exactly zero
    same = wasserstein_distance(cur, cur.select("bucket", "n", "share")
                                ).collect()[0]["w1"]
    assert same == 0.0


def test_quantile_shift_exact_and_verdict_bands(spark):
    from json_spark.operators.drift import exact_quantile_digest, quantile_shift

    # handcrafted multiset: values 1..10 once each => k-th smallest is k
    base = spark.createDataFrame([(v,) for v in range(1, 11)], "x int")
    d = exact_quantile_digest(base, "x").collect()[0]
    # n=10: k25=ceil(2.5)=3, k50=5, k75=ceil(7.5)=8
    assert (d["n"], d["q25"], d["q50"], d["q75"]) == (10, 3, 5, 8)

    # duplicates + a null: null excluded; k75 = ceil(0.75*4) = 3, and the
    # 3rd smallest of {1,1,1,9} is still 1 (ties resolved by cumulative count)
    dup = spark.createDataFrame([(1,), (1,), (1,), (9,), (None,)], "x int")
    d2 = exact_quantile_digest(dup, "x").collect()[0]
    assert (d2["n"], d2["q25"], d2["q50"], d2["q75"]) == (4, 1, 1, 1)

    # shift bands: median moved by exactly 1.0 IQR => RED boundary
    cur = spark.createDataFrame([(v + 5,) for v in range(1, 11)], "x int")
    row = quantile_shift(cur, base, "x").collect()[0]
    assert row["q50_cur"] == 10 and row["q50_base"] == 5
    assert row["iqr_base"] == 5
    assert row["shift"] == 1.0 and row["verdict"] == "RED"
    # identical populations => exact zero, GREEN
    same = quantile_shift(base, base, "x").collect()[0]
    assert same["shift"] == 0.0 and same["verdict"] == "GREEN"
    # downward drift is symmetric (abs on the verdict bands)
    down = quantile_shift(base, cur, "x").collect()[0]
    assert down["shift"] == -1.0 and down["verdict"] == "RED"


def test_quantile_shift_grouped_keys(spark):
    from json_spark.operators.drift import quantile_shift

    rows = [("a", v) for v in range(1, 11)] + [("b", v) for v in (1, 1, 1, 1)]
    base = spark.createDataFrame(rows, "g string, x int")
    cur = spark.createDataFrame(
        [("a", v + 10) for v in range(1, 11)] + [("b", v) for v in (1, 1)],
        "g string, x int")
    out = {r["g"]: r for r in
           quantile_shift(cur, base, "x", keys=["g"]).collect()}
    assert out["a"]["verdict"] == "RED"           # moved 2 IQRs
    assert out["b"]["shift"] == 0.0               # constant column, iqr->1 guard
    assert out["b"]["verdict"] == "GREEN"


def test_quantile_counts_merge_equals_direct(spark):
    from json_spark.operators.drift import (
        exact_quantile_digest,
        merge_quantile_counts,
        quantile_digest_counts,
        quantiles_from_counts,
    )
    a = spark.createDataFrame([(v,) for v in [1, 1, 2, 7, 7, 7]], "x int")
    b = spark.createDataFrame([(v,) for v in [2, 2, 3, 9, None]], "x int")
    merged = merge_quantile_counts(
        quantile_digest_counts(a, "x"), quantile_digest_counts(b, "x"), "x")
    got = quantiles_from_counts(merged, "x").collect()[0]
    want = exact_quantile_digest(a.unionByName(b), "x").collect()[0]
    assert (got["n"], got["q25"], got["q50"], got["q75"]) == \
        (want["n"], want["q25"], want["q50"], want["q75"])
    assert got["n"] == 10                         # null excluded
