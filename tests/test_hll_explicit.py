"""Explicit cross-engine HLL (operators/uniqueness.py:hll_explicit):
estimator accuracy across cardinality regimes, linear-counting branch,
and agreement with a pure-python register twin."""

import hashlib

import numpy as np

from json_spark.operators.uniqueness import hll_explicit


def _twin(keys, p=8):
    m = 1 << p
    regs = [0] * m
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        bucket = h % m
        rest = h // m
        rho = 41 if rest == 0 else 41 - rest.bit_length()
        regs[bucket] = max(regs[bucket], rho)
    z = sum(2.0 ** -r for r in regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / z
    v = regs.count(0)
    if e <= 2.5 * m and v > 0:
        e = m * np.log(m / v)
    return e, m - v


def _run(spark, keys):
    df = spark.createDataFrame([(int(k),) for k in keys], "k long") \
        .repartition(4)
    return hll_explicit(df, "k", p=8).collect()[0]


def test_matches_python_twin_small_and_large(spark):
    for n in (20, 300, 5000):
        keys = list(range(n))
        got = _run(spark, keys)
        e, used = _twin(keys)
        assert got["n_exact"] == n
        assert got["registers_used"] == used
        assert abs(got["hll_estimate"] - round(e, 4)) < 1e-6, n


def test_accuracy_within_hll_error(spark):
    """Standard error ~ 1.04/sqrt(256) ~ 6.5%; assert within 3 sigma."""
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 2**60, 4000)
    keys = list(set(int(k) for k in keys))
    got = _run(spark, keys)
    assert got["rel_error"] < 3 * 1.04 / np.sqrt(256)


def test_linear_counting_branch_small_cardinality(spark):
    """Tiny cardinalities route through linear counting and land very
    close to exact."""
    got = _run(spark, list(range(10)))
    assert got["n_exact"] == 10
    assert abs(got["hll_estimate"] - 10) <= 1  # LC is near-exact here


def test_duplicates_do_not_inflate(spark):
    keys = [i % 50 for i in range(5000)]  # heavy duplication
    got = _run(spark, keys)
    assert got["n_exact"] == 50
    assert got["rel_error"] < 0.2  # estimates distincts, not rows
