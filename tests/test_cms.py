"""Count-Min Sketch (operators/cms.py): overestimate guarantee, the
epsilon-bound, merge-by-addition law, and cross-slot determinism."""

import numpy as np
from pyspark.sql import functions as F

from json_spark.operators.cms import cms_build, cms_estimate


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _exact(texts):
    from collections import Counter
    c = Counter()
    for t in texts:
        c.update(t.split(" "))
    return c


def test_estimate_never_underestimates(spark):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(80)]
    grid = cms_build(_docs(spark, texts), "text", depth=3, width=64)
    exact = _exact(texts)
    cand = spark.createDataFrame([(t,) for t in exact], "t string")
    est = {r["t"]: r["cms_n"] for r in
           cms_estimate(grid, cand, "t", depth=3, width=64).collect()}
    n_total = sum(exact.values())
    over = 0
    for t, n in exact.items():
        assert est[t] >= n, t                      # CMS never undercounts
        over = max(over, est[t] - n)
    # epsilon bound: error <= (e/w) * N with high probability
    assert over <= np.e / 64 * n_total * 3  # slack factor for w.h.p.


def test_merge_is_elementwise_addition(spark):
    """CMS is a linear sketch: grid(A ∪ B) == grid(A) + grid(B)
    elementwise — the property that makes per-partition builds merge
    into one exact global grid."""
    texts_a = ["a b c a", "d e f"]
    texts_b = ["a a g", "h b"]
    g_all = {(r["seed"], r["slot"]): r["n"] for r in
             cms_build(_docs(spark, texts_a + texts_b), "text").collect()}
    g_a = {(r["seed"], r["slot"]): r["n"] for r in
           cms_build(_docs(spark, texts_a), "text").collect()}
    g_b = {(r["seed"], r["slot"]): r["n"] for r in
           cms_build(_docs(spark, texts_b), "text").collect()}
    merged = {}
    for g in (g_a, g_b):
        for k, v in g.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == g_all


def test_grid_is_bounded(spark):
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(5000)]  # vocab >> grid
    texts = [" ".join(rng.choice(vocab, 50)) for _ in range(40)]
    grid = cms_build(_docs(spark, texts), "text", depth=3, width=64)
    assert grid.count() <= 3 * 64


def test_query_matches_exact_for_clear_hitters(spark, sf_dir):
    from json_spark.plans.registry import QUERIES
    rows = QUERIES["token_heavy_hitters_cms"](spark, sf_dir).collect()
    assert len(rows) == 15
    for r in rows:
        assert r["cms_n"] >= r["exact_n"]  # overestimate only
