"""dimension_drift (operators/embedding_qa.py) on controlled snapshots:
a planted per-dimension mean shift is recovered in reference-sigma
units, identical snapshots score zero drift, and the verdict bands
respond to the caller's thresholds."""

import pytest
from pyspark.sql import functions as F

from json_spark.operators.embedding_qa import dimension_drift


def _vecs(spark, rows):
    return spark.createDataFrame([(r,) for r in rows],
                                 "embedding array<double>")


def test_planted_shift_recovered_in_sigma_units(spark):
    # reference: dim0 alternates 0/2 (mean 1, stddev_samp ~1.0257 over
    # 20 rows); dim1 constant 5. candidate: dim0 shifted +2, dim1 equal.
    a = _vecs(spark, [[0.0, 5.0], [2.0, 5.0]] * 10)
    b = _vecs(spark, [[2.0, 5.0], [4.0, 5.0]] * 10)
    out = {r["pos"]: r for r in dimension_drift(a, b, "embedding").collect()}

    d0 = out[0]
    assert (d0["n_a"], d0["n_b"]) == (20, 20)
    assert d0["mean_a"] == 1.0 and d0["mean_b"] == 3.0
    # shift = 2 / stddev_samp(0,2,...) = 2 / 1.025978 = 1.949358
    assert d0["shift_sigmas"] == pytest.approx(2 / 1.025978, abs=1e-4)
    assert d0["verdict"] == "RED"

    d1 = out[1]
    # constant dim: stddev_a = 0 -> try_divide yields NULL; a NULL shift
    # never crosses a band, so an unchanged constant dim stays GREEN
    assert d1["mean_a"] == d1["mean_b"] == 5.0
    assert d1["shift_sigmas"] is None
    assert d1["verdict"] == "GREEN"


def test_identical_snapshots_zero_drift(spark):
    a = _vecs(spark, [[1.0, -2.0], [3.0, 0.5], [2.0, 1.0]])
    out = dimension_drift(a, a, "embedding").collect()
    assert all(r["shift_sigmas"] == 0.0 and r["verdict"] == "GREEN"
               for r in out)


def test_custom_bands(spark):
    a = _vecs(spark, [[0.0], [2.0]] * 10)     # mean 1, sd ~1.026
    b = _vecs(spark, [[1.0], [3.0]] * 10)     # shift 1 -> d ~0.975
    r = dimension_drift(a, b, "embedding").collect()[0]
    assert r["verdict"] == "YELLOW"           # 0.5 <= 0.975 < 1.5
    r = dimension_drift(a, b, "embedding", yellow=0.5, red=0.9).collect()[0]
    assert r["verdict"] == "RED"
    r = dimension_drift(a, b, "embedding", yellow=1.0).collect()[0]
    assert r["verdict"] == "GREEN"
