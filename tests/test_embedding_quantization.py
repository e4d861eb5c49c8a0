"""quantization_check (operators/embedding_qa.py): int8-lattice
membership per dimension — planted quantized dims are flagged, noisy
continuous dims are not, and the threshold/edge behavior is pinned."""

import numpy as np
import pytest

from json_spark.operators.embedding_qa import quantization_check


def _vecs(spark, rows):
    return spark.createDataFrame([(r,) for r in rows],
                                 "embedding array<double>")


def test_planted_quantized_dim_flagged(spark):
    rng = np.random.default_rng(7)
    cont = rng.uniform(-0.9, 0.9, 50)
    rows = [[float(np.floor(c * 127 + 0.5) / 127), float(c) + 1e-4]
            for c in cont]
    out = {r["pos"]: r for r in
           quantization_check(_vecs(spark, rows), "embedding").collect()}
    assert out[0]["verdict"] == "QUANTIZED"
    assert out[0]["lattice_frac"] == 1.0 and out[0]["n_lattice"] == 50
    assert out[1]["verdict"] == "OK"
    assert out[1]["n_lattice"] < 50 * 0.01


def test_float32_roundtrip_still_on_lattice(spark):
    """k/127 stored as float32 then widened back must stay inside the
    1e-6 tolerance — the storage path a real quantized store takes."""
    ks = list(range(-127, 128, 7))
    rows = [[float(np.float32(k / 127.0))] for k in ks]
    out = quantization_check(_vecs(spark, rows), "embedding").collect()[0]
    assert out["verdict"] == "QUANTIZED" and out["n_lattice"] == len(ks)


def test_zero_is_on_lattice_and_threshold(spark):
    # 0.0 = 0/127 sits on the lattice; fraction 0.5 < 0.99 stays OK,
    # and a caller-lowered threshold flips it
    rows = [[0.0], [0.1234567]] * 10
    out = quantization_check(_vecs(spark, rows), "embedding").collect()[0]
    assert out["n_lattice"] == 10 and out["verdict"] == "OK"
    assert out["lattice_frac"] == pytest.approx(0.5)
    out = quantization_check(_vecs(spark, rows), "embedding",
                             frac_threshold=0.5).collect()[0]
    assert out["verdict"] == "QUANTIZED"


def test_custom_levels(spark):
    """levels=15 (int4) lattice: 4-bit quantized values flagged under
    levels=15 but read as continuous under the default 127."""
    ks = list(range(-15, 16))
    rows = [[k / 15.0] for k in ks]
    out15 = quantization_check(_vecs(spark, rows), "embedding",
                               levels=15).collect()[0]
    assert out15["verdict"] == "QUANTIZED"
    out127 = quantization_check(_vecs(spark, rows), "embedding").collect()[0]
    # only k in {-15, 0, 15} (v = -1, 0, 1) land on both lattices
    assert out127["n_lattice"] == 3 and out127["verdict"] == "OK"
