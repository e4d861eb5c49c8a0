"""Covariance-spectrum moments (operators/embedding_qa.py:
spectrum_moments): numpy-twin exactness, rank-collapse detection, and
isotropic sanity."""

import numpy as np

from json_spark.operators.embedding_qa import spectrum_moments


def _twin(x):
    cov = np.cov(x, rowvar=False, bias=True)
    lam = np.clip(np.linalg.eigvalsh(np.atleast_2d(cov)), 0, None)
    tot = lam.sum()
    share = lam / tot
    nz = share[share > 0]
    return {
        "m1": lam.sum(), "m2": (lam ** 2).sum(), "m3": (lam ** 3).sum(),
        "top_share": lam.max() / tot,
        "eff_rank": float(np.exp(-(nz * np.log(nz)).sum())),
    }


def _run(spark, x):
    rows = [([float(v) for v in r],) for r in x]
    df = spark.createDataFrame(rows, "embedding array<float>").repartition(3)
    return spectrum_moments(df, "embedding").collect()[0]


def test_matches_numpy_twin(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (300, 8)).astype(np.float32)
    got = _run(spark, x)
    want = _twin(x.astype(np.float64))
    assert got["dim"] == 8 and got["n_vectors"] == 300
    for k in ("m1", "m2", "m3", "top_share", "eff_rank"):
        assert abs(got[k] - want[k]) < 1e-9 * max(1.0, abs(want[k])), k


def test_rank_collapse_detected(spark):
    """A near-rank-1 corpus (one direction + tiny noise): top_share -> 1,
    eff_rank -> 1 — the collapse per-dim variances cannot see when the
    direction is not axis-aligned."""
    rng = np.random.default_rng(5)
    direction = rng.normal(0, 1, 16)
    direction /= np.linalg.norm(direction)
    scale = rng.normal(0, 3, (400, 1))
    x = (scale * direction + rng.normal(0, 0.01, (400, 16))
         ).astype(np.float32)
    got = _run(spark, x)
    assert got["top_share"] > 0.99
    assert got["eff_rank"] < 1.2
    # every per-dim variance is nonzero and similar — the collapse is
    # invisible to dimension_stats but obvious to the spectrum
    assert np.var(x, axis=0).min() > 0.003


def test_isotropic_high_rank(spark):
    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, (600, 8)).astype(np.float32)
    got = _run(spark, x)
    assert got["eff_rank"] > 7.0
    assert got["top_share"] < 0.25


def test_query_one_row(spark, sf_dir):
    from json_spark.plans.registry import QUERIES
    rows = QUERIES["embedding_spectrum"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["dim"] == 64 and r["n_vectors"] == 500
    assert r["m1"] > 0 and r["m2"] > 0
