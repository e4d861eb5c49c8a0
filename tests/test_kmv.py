"""KMV set-overlap sketch (operators/uniqueness.py:kmv_overlap):
accuracy on known overlaps, exact path below k, and the python twin."""

import hashlib

import numpy as np

from json_spark.operators.uniqueness import kmv_overlap


def _h(x):
    return int(hashlib.md5(str(x).encode()).hexdigest()[:12], 16)


def _run(spark, a, b, k=256):
    da = spark.createDataFrame([(int(x),) for x in a], "x long")
    db = spark.createDataFrame([(int(x),) for x in b], "y long")
    return kmv_overlap(da, "x", db, "y", k=k).collect()[0]


def test_exact_when_below_k(spark):
    a = list(range(100))
    b = list(range(50, 150))
    r = _run(spark, a, b, k=256)
    assert r["exact_a"] == 100 and r["kmv_a"] == 100.0
    assert r["exact_b"] == 100 and r["kmv_b"] == 100.0
    # |A ∩ B| = 50, |A ∪ B| = 150
    assert abs(r["exact_jaccard"] - 50 / 150) < 1e-6
    # below k the union sketch holds every hash: estimate is exact too
    assert abs(r["kmv_jaccard"] - r["exact_jaccard"]) < 1e-6


def test_estimates_within_kmv_error(spark):
    rng = np.random.default_rng(23)
    a = list(set(rng.integers(0, 2**50, 6000).tolist()))
    half = [int(x) for x in a[: len(a) // 2]]
    extra = list(set(rng.integers(2**50, 2**51, 3000).tolist()))
    b = half + extra
    r = _run(spark, a, b, k=256)
    # distinct estimates: relative error ~ 1/sqrt(k-1) ~ 6.3%; 3 sigma
    for side, exact in (("kmv_a", r["exact_a"]), ("kmv_b", r["exact_b"])):
        assert abs(r[side] - exact) / exact < 3 / np.sqrt(255), side
    true_j = r["exact_jaccard"]
    # Jaccard estimator error ~ sqrt(j(1-j)/k); allow 4 sigma
    sd = np.sqrt(true_j * (1 - true_j) / 256)
    assert abs(r["kmv_jaccard"] - true_j) < 4 * sd + 1e-9


def test_sketch_matches_python_twin(spark):
    """The k-min hash set is exact order statistics: the Spark kth value
    equals the python twin's, so the estimate matches to rounding."""
    a = list(range(5000))
    b = list(range(2500, 7500))
    r = _run(spark, a, b, k=128)
    ka = sorted(_h(x) for x in set(a))[:128]
    est_a = 127 * float(1 << 48) / ka[-1]
    assert abs(r["kmv_a"] - round(est_a, 4)) < 1e-6
