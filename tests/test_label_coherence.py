"""Labeled-embedding coherence (operators/embedding_qa.py:
label_coherence): tight clusters score perfect top-1, a mislabeled
batch collapses to chance, and the driver query covers every vector."""

import numpy as np

from json_spark.operators.embedding_qa import label_coherence


def _cluster_rows(rng, label, base, n, noise):
    rows = []
    for _ in range(n):
        v = base + rng.normal(0, noise, len(base))
        rows.append((int(label), [float(x) for x in v]))
    return rows


def test_tight_clusters_perfect_top1(spark):
    rng = np.random.default_rng(42)
    dim = 16
    bases = np.eye(dim)[:3] * 10.0  # three orthogonal, well-separated
    rows = []
    for lb in range(3):
        rows += _cluster_rows(rng, lb, bases[lb], 20, noise=0.05)
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r["label"]: r for r in
           label_coherence(df, "label", "embedding").collect()}
    assert set(out) == {0, 1, 2}
    for lb in range(3):
        assert out[lb]["n_vectors"] == 20
        assert out[lb]["n_top1_own"] == 20  # every member nearest its own
        assert out[lb]["avg_own_cos"] > 0.99
        assert out[lb]["min_own_cos"] > 0.99


def test_mislabeled_batch_collapses(spark):
    """Swap the labels of two clusters' members: their own-centroid
    cosine stays meaningless and top-1 routes to the OTHER label."""
    rng = np.random.default_rng(7)
    dim = 16
    bases = np.eye(dim)[:2] * 10.0
    rows = (_cluster_rows(rng, 1, bases[0], 15, 0.05)   # label 1 on base0
            + _cluster_rows(rng, 0, bases[1], 15, 0.05))  # label 0 on base1
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r["label"]: r for r in
           label_coherence(df, "label", "embedding").collect()}
    # own centroid is actually coherent (all members share a base), so
    # avg stays high — but that is fine: the single-cluster case cannot
    # distinguish a renamed label. Mix in a third, honest cluster and
    # half-swap instead:
    rows = (_cluster_rows(rng, 0, bases[0], 10, 0.05)
            + _cluster_rows(rng, 1, bases[1], 10, 0.05)
            + _cluster_rows(rng, 1, bases[0], 10, 0.05))  # wrong batch
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r["label"]: r for r in
           label_coherence(df, "label", "embedding").collect()}
    # label 1's centroid is pulled between two bases; the mislabeled
    # half scores top-1 on label 0's clean centroid instead
    assert out[1]["n_top1_own"] <= 10
    assert out[0]["n_top1_own"] == 10


def test_query_covers_all_vectors(spark, sf_dir):
    from json_spark.plans.registry import QUERIES
    rows = QUERIES["embedding_label_coherence"](spark, sf_dir).collect()
    assert sum(r["n_vectors"] for r in rows) == 500
    for r in rows:
        assert 0 <= r["n_top1_own"] <= r["n_vectors"]
        assert -1.0 <= r["min_own_cos"] <= r["avg_own_cos"] <= 1.0
