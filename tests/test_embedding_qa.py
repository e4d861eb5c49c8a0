"""Embedding QA (operators/embedding_qa.py) vs numpy twins, with planted
dead dimensions and zero-norm vectors."""

import numpy as np
from pyspark.sql import functions as F


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>")


def test_dimension_stats_flags_dead_dims(spark):
    from json_spark.operators.embedding_qa import dimension_stats
    rng = np.random.default_rng(11)
    mat = rng.normal(0, 1, (200, 6))
    mat[:, 2] = 0.0          # dead: constant zero
    mat[:, 4] = 3.14         # dead: constant non-zero
    got = {r["pos"]: r.asDict()
           for r in dimension_stats(_df(spark, mat), "embedding").collect()}
    assert set(got) == set(range(6))
    for pos in range(6):
        col = mat[:, pos]
        assert got[pos]["n"] == 200
        assert got[pos]["mean"] == round(float(np.mean(col)), 6)
        assert got[pos]["stddev"] == round(float(np.std(col, ddof=1)), 6)
        assert got[pos]["n_zero"] == int(np.sum(col == 0.0))
    assert got[2]["is_dead"] and got[4]["is_dead"]
    assert not any(got[p]["is_dead"] for p in (0, 1, 3, 5))


def test_norm_stats_counts_zero_norm_vectors(spark):
    from json_spark.operators.embedding_qa import norm_stats
    rng = np.random.default_rng(12)
    mat = rng.normal(0, 1, (150, 8))
    mat[7] = 0.0
    mat[93] = 0.0
    row = norm_stats(_df(spark, mat), "embedding").collect()[0]
    norms = np.linalg.norm(mat, axis=1)
    assert row["n_vecs"] == 150
    assert row["n_zero_norm"] == 2
    assert row["min_norm"] == round(float(norms.min()), 6)
    assert row["max_norm"] == round(float(norms.max()), 6)
    assert abs(row["mean_norm"] - float(norms.mean())) < 1e-5


def test_dimension_stats_pos_is_long_and_zero_based(spark):
    from json_spark.operators.embedding_qa import dimension_stats
    out = dimension_stats(_df(spark, np.ones((3, 4))), "embedding")
    assert dict(out.dtypes)["pos"] == "bigint"
    assert {r["pos"] for r in out.collect()} == {0, 1, 2, 3}


def test_isotropy_matches_brute_force(spark):
    import numpy as np

    from json_spark.operators.embedding_qa import isotropy_stats

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    vecs[5] = 0.0  # zero-norm row: must be excluded, not NaN the stat
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    row = isotropy_stats(df, "embedding").collect()[0]

    keep = vecs[np.linalg.norm(vecs, axis=1) > 0].astype(np.float64)
    unit = keep / np.linalg.norm(keep, axis=1, keepdims=True)
    g = unit @ unit.T
    n = len(unit)
    brute = (g.sum() - np.trace(g)) / (n * (n - 1))
    assert row["n_vecs"] == n and row["dim"] == 8
    assert abs(row["mean_pairwise_cos"] - brute) < 1e-6


def test_isotropy_extremes(spark):
    from json_spark.operators.embedding_qa import isotropy_stats

    # identical vectors: every pairwise cosine is exactly 1
    same = spark.createDataFrame([(i, [3.0, 4.0]) for i in range(6)],
                                 "vec_id long, embedding array<float>")
    assert isotropy_stats(same, "embedding").collect()[0][
        "mean_pairwise_cos"] == 1.0
    # antipodal pair: the two ordered pairs average to -1
    anti = spark.createDataFrame([(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
                                 "vec_id long, embedding array<float>")
    assert isotropy_stats(anti, "embedding").collect()[0][
        "mean_pairwise_cos"] == -1.0
