"""Association/conformity operators (operators/association.py) vs
brute-force numpy/Counter twins, including null handling, degenerate
(always-present / constant) inputs, and tie-order pinning."""

import math
from collections import Counter
from itertools import combinations

import numpy as np
from pyspark.sql import functions as F

from json_spark.operators.association import (
    corr_matrix,
    cramers_v,
    key_comissingness,
    key_skew_profile,
    zipf_fit,
)


def test_corr_matrix_vs_numpy_with_nulls(spark):
    rng = np.random.RandomState(7)
    x = rng.uniform(0, 100, 200)
    y = 3.0 * x + rng.normal(0, 5, 200)   # strongly correlated
    z = rng.uniform(-1, 1, 200)           # independent
    rows = []
    for i in range(200):
        rows.append((
            float(x[i]) if i % 13 != 12 else None,   # nulls in x
            float(y[i]),
            float(z[i]) if i % 17 != 16 else None))  # nulls in z
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    for (a, b), r in out.items():
        va = np.array([row[0 if a == "x" else 1 if a == "y" else 2]
                       for row in rows], dtype=object)
        vb = np.array([row[0 if b == "x" else 1 if b == "y" else 2]
                       for row in rows], dtype=object)
        mask = np.array([u is not None and v is not None
                         for u, v in zip(va, vb)])
        ua = va[mask].astype(float)
        ub = vb[mask].astype(float)
        assert r["n_pairs"] == int(mask.sum())
        assert abs(r["corr"] - np.corrcoef(ua, ub)[0, 1]) < 1e-6
        assert abs(r["covar_pop"]
                   - np.cov(ua, ub, bias=True)[0, 1]) < 1e-6
    assert out[("x", "y")]["corr"] > 0.99
    assert abs(out[("x", "z")]["corr"]) < 0.2


def test_corr_matrix_constant_column_null_corr(spark):
    df = spark.createDataFrame(
        [(1.0, float(i)) for i in range(10)], "c double, v double")
    r = corr_matrix(df, ["c", "v"]).collect()[0]
    assert r["corr"] is None          # zero variance -> undefined
    assert r["covar_pop"] == 0.0


def _chi2_bruteforce(pairs):
    n = len(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    obs = Counter(pairs)
    chi2 = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = obs.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    k = min(len(ra), len(cb)) - 1
    return chi2, math.sqrt(chi2 / n / k), (len(ra) - 1) * (len(cb) - 1)


def test_cramers_v_vs_bruteforce(spark):
    # dependent-ish: b follows a with noise; include a zero-observed cell
    pairs = []
    for i in range(300):
        a = ["red", "green", "blue"][i % 3]
        b = {"red": "hot", "green": "mild", "blue": "cold"}[a] \
            if i % 5 != 4 else "mild"
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    chi2, v, dof = _chi2_bruteforce(pairs)
    assert r["n_rows"] == 300
    assert r["dof"] == dof
    assert abs(r["chi2"] - chi2) < 1e-5
    assert abs(r["cramers_v"] - v) < 1e-6
    assert r["cramers_v"] > 0.5      # planted dependence


def test_cramers_v_independent_and_nulls(spark):
    # perfectly independent grid -> chi2 = 0; nulls become a level
    pairs = [(a, b) for a in ("x", "y") for b in ("p", "q", None)] * 20
    df = spark.createDataFrame(pairs, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0
    assert r["dof"] == (2 - 1) * (3 - 1)   # <null> counted as a level


def test_zipf_fit_vs_numpy_polyfit(spark):
    # construct counts following an exact power law cnt = 1000 * r^-1
    docs = []
    words = [f"w{j:03d}" for j in range(40)]
    for j, w in enumerate(words):
        cnt = max(1, int(1000 / (j + 1)))
        docs.extend([w] * cnt)
    # pack into documents of 50 tokens
    texts = [" ".join(docs[i:i + 50]) for i in range(0, len(docs), 50)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    r = zipf_fit(df, "text", top_k=1000).collect()[0]
    cnts = sorted((Counter(docs)[w], w) for w in words)
    cnts = sorted(cnts, key=lambda t: (-t[0], t[1]))
    x = np.log(np.arange(1, len(cnts) + 1, dtype=float))
    y = np.log(np.array([c for c, _ in cnts], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert r["n_ranks"] == len(words)
    assert abs(r["slope"] - slope) < 1e-5
    assert abs(r["intercept"] - intercept) < 1e-5
    assert r["slope"] < -0.9 and r["r2"] > 0.98


def test_zipf_fit_top_k_and_tie_order(spark):
    # 6 tokens, ties on count; top_k=4 keeps (cnt desc, token asc) head
    text = " ".join(["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 3
                    + ["e"] * 2 + ["f"])
    df = spark.createDataFrame([(text,)], "text string")
    r = zipf_fit(df, "text", top_k=4).collect()[0]
    # head = a(5), b(3), c(3), d(3) — ranks 1..4 pinned by tie order
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([5, 3, 3, 3], dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    assert r["n_ranks"] == 4
    assert abs(r["slope"] - slope) < 1e-5


def test_key_skew_profile_vs_counter(spark):
    vals = (["hot"] * 60 + [f"k{i}" for i in range(40)]
            + [None] * 5)  # planted hot key + nulls excluded
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    r = key_skew_profile(df, ["k"]).collect()[0]
    cnt = Counter(v for v in vals if v is not None)
    n = sum(cnt.values())
    ent = -sum((c / n) * math.log2(c / n) for c in cnt.values())
    assert r["key_col"] == "k"
    assert r["n_rows"] == n and r["n_keys"] == len(cnt)
    assert r["max_cnt"] == 60
    assert abs(r["top1_share"] - 60 / n) < 1e-6
    assert abs(r["hot_ratio"] - 60 / (n / len(cnt))) < 1e-6
    assert abs(r["entropy_bits"] - ent) < 1e-6
    assert abs(r["norm_entropy"] - ent / math.log2(len(cnt))) < 1e-6


def test_key_skew_profile_uniform_and_single_key(spark):
    df = spark.createDataFrame(
        [(f"u{i % 16}", "only") for i in range(160)],
        "u string, s string")
    out = {r["key_col"]: r for r in
           key_skew_profile(df, ["u", "s"]).collect()}
    assert out["u"]["hot_ratio"] == 1.0
    assert out["u"]["norm_entropy"] == 1.0
    assert out["s"]["n_keys"] == 1
    assert out["s"]["norm_entropy"] is None   # log2(1) = 0 -> undefined


def test_key_comissingness_vs_bruteforce(spark):
    # universe of 3; 'a' always present; b and c mutually exclusive
    rows = []
    for i in range(120):
        ks = ["a"]
        if i % 2 == 0:
            ks.append("b")
        else:
            ks.append("c")
        rows.append((ks,))
    df = spark.createDataFrame(rows, "keys array<string>")
    out = {(r["key_a"], r["key_b"]): r for r in
           key_comissingness(df, "keys", ["a", "b", "c"]).collect()}
    assert set(out) == set((x, y) for x, y in
                           combinations(["a", "b", "c"], 2))
    bc = out[("b", "c")]
    assert (bc["n_both"], bc["n_a_only"], bc["n_b_only"],
            bc["n_neither"]) == (0, 60, 60, 0)
    assert bc["phi"] == -1.0                 # perfectly exclusive
    ab = out[("a", "b")]
    assert ab["n_neither"] == 0 and ab["n_b_only"] == 0
    assert ab["phi"] is None                 # 'a' constant -> undefined


def test_association_plan_shapes(spark, sf_dir):
    """The 100 TB properties: single partial+final aggregate, no Python
    stage, no global window over unbounded tables."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.explain_audit import get_plan
    from json_spark.plans.registry import QUERIES

    for name in ("corr_profile", "categorical_association",
                 "skew_profile", "key_comissingness"):
        plan = get_plan(QUERIES[name](spark, sf_dir))
        assert "Python" not in plan, name
        assert "HashAggregate" in plan, name
        # no global-window Exchange SinglePartition before an agg over
        # a corpus-sized input (zipf's K-row window is exempt/bounded)
        if name in ("corr_profile", "key_comissingness"):
            assert "Window" not in plan, name
    zp = get_plan(QUERIES["zipf_conformity"](spark, sf_dir))
    assert "TakeOrderedAndProject" in zp     # head is top-K, not a sort
    assert "Python" not in zp


def test_cohen_kappa_vs_closed_form(spark):
    from json_spark.operators.association import cohen_kappa
    # two labelers with partial, structured agreement + a null label
    rows = []
    for i in range(300):
        a = ["x", "y", "z"][i % 3]
        b = a if i % 5 != 0 else ["y", "z", "x"][i % 3]
        if i % 50 == 49:
            a = None
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    la = [x if x is not None else "<null>" for x, _ in rows]
    lb = [x if x is not None else "<null>" for _, x in rows]
    n = len(rows)
    po = sum(1 for u, v in zip(la, lb) if u == v) / n
    ca, cb = Counter(la), Counter(lb)
    pe = sum(ca[k] * cb.get(k, 0) for k in ca) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert r["n_rows"] == n
    assert abs(r["po"] - round(po, 6)) < 1e-9
    assert abs(r["pe"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round(kappa, 6)) < 1e-9
    assert 0.0 < r["kappa"] < 1.0


def test_cohen_kappa_edges(spark):
    from json_spark.operators.association import cohen_kappa
    # perfect agreement -> kappa = 1
    df = spark.createDataFrame(
        [(v, v) for v in ("p", "q", "r") for _ in range(5)],
        "a string, b string")
    assert cohen_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0
    # single shared constant label -> pe = 1, kappa undefined
    one = spark.createDataFrame([("k", "k")] * 8, "a string, b string")
    r = one.transform(lambda d: cohen_kappa(d, "a", "b")).collect()[0]
    assert r["pe"] == 1.0 and r["kappa"] is None
    # disjoint label vocabularies -> po = 0, pe = 0, kappa = 0
    dj = spark.createDataFrame(
        [("u", "v")] * 6 + [("w", "t")] * 6, "a string, b string")
    r = cohen_kappa(dj, "a", "b").collect()[0]
    assert r["po"] == 0.0 and r["pe"] == 0.0 and r["kappa"] == 0.0


def test_set_overlap_vs_python_sets(spark):
    from json_spark.operators.uniqueness import set_overlap
    xa = list(range(0, 120)) + [5, 5, 17]          # dups collapse
    xb = list(range(80, 200)) + [None]             # nulls excluded
    da = spark.createDataFrame([(v,) for v in xa], "k int")
    db = spark.createDataFrame([(v,) for v in xb], "k int")
    r = set_overlap(da, db, "k", label_a="A", label_b="B").collect()[0]
    sa, sb = set(xa), {v for v in xb if v is not None}
    both = sa & sb
    assert (r["n_a"], r["n_b"], r["n_both"]) == (len(sa), len(sb), len(both))
    assert r["n_a_only"] == len(sa - sb)
    assert r["n_b_only"] == len(sb - sa)
    assert abs(r["jaccard"] - round(len(both) / len(sa | sb), 6)) < 1e-9
    assert abs(r["dice"] - round(2 * len(both) / (len(sa) + len(sb)), 6)) < 1e-9
    assert abs(r["containment_a"] - round(len(both) / len(sa), 6)) < 1e-9
    assert abs(r["containment_b"] - round(len(both) / len(sb), 6)) < 1e-9
    # disjoint sets -> all ratios 0, not null
    dd = spark.createDataFrame([(900,), (901,)], "k int")
    r2 = set_overlap(da, dd, "k").collect()[0]
    assert r2["n_both"] == 0 and r2["jaccard"] == 0.0
