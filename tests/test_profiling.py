"""FD + column profiling (operators/profiling.py) vs brute-force
twins, including the null-as-its-own-bucket path."""

import math
from collections import Counter

from pyspark.sql import functions as F  # noqa: F401

from json_spark.operators.profiling import column_profile, fd_profile


def test_column_profile_vs_bruteforce_with_nulls(spark):
    vals = ["a"] * 6 + ["b"] * 3 + ["c"] + [None] * 2
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    row = column_profile(df, ["x"]).collect()[0]
    nn = [v for v in vals if v is not None]
    cnt = Counter(nn)
    shares = [n / len(nn) for n in cnt.values()]
    assert row["col_name"] == "x"
    assert row["n_rows"] == len(vals)
    assert row["n_null"] == 2
    assert row["n_distinct"] == 3
    assert row["top_share"] == round(max(shares), 6)
    assert row["entropy_bits"] == round(
        sum(-p * math.log2(p) for p in shares), 6)


def test_column_profile_constant_and_uniform(spark):
    df = spark.createDataFrame(
        [("k", i % 8) for i in range(64)], "c string, u int")
    rows = {r["col_name"]: r for r in
            column_profile(df, ["c", "u"]).collect()}
    assert rows["c"]["entropy_bits"] == 0.0 and rows["c"]["top_share"] == 1.0
    assert rows["u"]["entropy_bits"] == 3.0  # log2(8), exactly uniform
    assert rows["u"]["n_distinct"] == 8


def test_column_profile_high_cardinality_id_column(spark):
    """An id-like column (all values distinct — the clip_id shape at
    10^12 rows) must profile via plain aggregates: the count table is
    corpus-sized, so a global Window.partitionBy() would collapse the
    whole corpus into one task. Asserts both the values and the plan."""
    n = 1000
    df = spark.range(n).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"))
    prof = column_profile(df, ["clip_id"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "global window over the count table"
    row = prof.collect()[0]
    assert row["n_distinct"] == n and row["n_null"] == 0
    assert row["top_share"] == round(1 / n, 6)
    assert row["entropy_bits"] == round(math.log2(n), 6)


def test_fd_profile_vs_bruteforce(spark):
    rows = [(1, "a", 10), (1, "a", 10), (2, "b", 20), (2, "c", 20),
            (3, "d", 20), (4, "d", 40)]
    df = spark.createDataFrame(rows, "k int, v string, w int")
    got = {(r["lhs"], r["rhs"]): r.asDict() for r in
           fd_profile(df, [("k", "v"), ("k", "w"), ("v", "w")]).collect()}

    def brute(lhs_i, rhs_i):
        groups = {}
        for row in rows:
            groups.setdefault(row[lhs_i], set()).add(row[rhs_i])
        widths = [len(s) for s in groups.values()]
        return {"n_groups": len(groups),
                "n_violating": sum(1 for wd in widths if wd > 1),
                "max_distinct": max(widths),
                "holds": max(widths) <= 1}

    for (lhs, rhs), (li, ri) in {("k", "v"): (0, 1), ("k", "w"): (0, 2),
                                 ("v", "w"): (1, 2)}.items():
        want = brute(li, ri)
        for key, val in want.items():
            assert got[(lhs, rhs)][key] == val, (lhs, rhs, key)
    # k -> v violates only at k=2; k -> w holds; v -> w violates at v=d
    assert got[("k", "v")]["n_violating"] == 1
    assert got[("k", "w")]["holds"]
    assert not got[("v", "w")]["holds"]


def test_key_emergence_statuses(spark):
    """key_emergence on a hand-built 4-day corpus: one key per status,
    a doc with unparseable JSON contributes no keys, and a key present
    on a single mid-span day is WINDOWED with days_present=1."""
    from pyspark.sql import functions as F

    from json_spark.operators.profiling import key_emergence

    rows = [
        # day 0..3; 'base' on every day => STABLE
        (0, '{"base": 1, "old": 1}'),
        (1, '{"base": 1, "old": 1}'),
        (2, '{"base": 1, "new": 1}'),
        (3, '{"base": 1, "new": 1}'),
        (2, '{"base": 1, "exp": 1}'),   # only day 2 => WINDOWED
        (1, 'not json at all'),         # no keys contributed
    ]
    df = spark.createDataFrame(rows, "day long, props string").select(
        F.json_object_keys("props").alias("keys"), "day")
    got = {r.key: r for r in key_emergence(df, "keys", "day").collect()}
    assert set(got) == {"base", "old", "new", "exp"}
    assert got["base"].status == "STABLE" and got["base"].days_present == 4
    assert got["old"].status == "RETIRED" and got["old"].last_seen == 1
    assert got["new"].status == "EMERGENT" and got["new"].first_seen == 2
    assert got["exp"].status == "WINDOWED" and got["exp"].days_present == 1
    assert got["base"].n_docs == 5


def test_benford_conforming_and_digit_extraction(spark):
    """A set weighted exactly by the Benford shares => GREEN with tiny
    MAD; a python twin pins every per-digit count; values are spread
    across positive AND negative decades (plus a sign flip) to exercise
    the when-chain; zero and null contribute no digit."""
    from collections import Counter

    from json_spark.operators.profiling import BENFORD_SHARES, benford_profile

    vals: list[float] = []
    for d in range(1, 10):
        n_d = round(BENFORD_SHARES[d] * 10000)
        # digit d placed in decade (d mod 5) - 2 in [-2..2]; digit 3 negative
        mag = 10.0 ** ((d % 5) - 2)
        v = (d + 0.3) * mag        # (d + 0.3) keeps the first digit = d
        if d == 3:
            v = -v                 # |.| must be taken before the chain
        vals += [v] * n_d
    rows = [(v,) for v in vals] + [(0.0,), (None,)]
    df = spark.createDataFrame(rows, "value double")
    out = {r.digit: r for r in benford_profile(df, "value").collect()}

    twin = Counter()
    for v in vals:
        twin[int(f"{abs(v):.20e}"[0])] += 1
    assert sum(twin.values()) == len(vals)
    for d in range(1, 10):
        assert out[d].n == twin.get(d, 0), (d, out[d].n, twin.get(d, 0))
        assert abs(out[d].expected - round(BENFORD_SHARES[d], 6)) < 1e-12
    assert out[1].verdict == "GREEN" and out[1].mad < 0.001
    assert all(out[d].mad == out[1].mad for d in range(1, 10))


def test_benford_uniform_is_red(spark):
    """A uniform integer column (100..999, flat first digits ~1/9) is
    nonconforming => RED with MAD above the Nigrini band."""
    from json_spark.operators.profiling import benford_profile
    df = spark.range(100, 1000).selectExpr("CAST(id AS DOUBLE) AS value")
    row = benford_profile(df, "value").collect()[0]
    assert row.verdict == "RED" and row.mad > 0.015


def test_first_digit_random_batch_vs_twin(spark):
    """first_digit over 2000 seeded random doubles spanning decades
    -6..12 (log-uniform, both signs, plus decade-boundary values like
    exactly 1.0, 10.0, 0.001) equals the scientific-notation twin for
    every value — the when-chain has no boundary holes."""
    import numpy as np
    from pyspark.sql import functions as F

    from json_spark.operators.profiling import first_digit

    rng = np.random.default_rng(42)
    mags = rng.uniform(-6, 13, size=2000)
    vals = [float(v) for v in
            (10.0 ** mags) * rng.choice([-1.0, 1.0], size=2000)]
    # boundary values pinned to the chain's DOUBLE-LITERAL convention
    # (shared with the DuckDB oracle): a power-of-ten literal opens its
    # own decade even when its nearest double sits a hair below the
    # decimal power (1e-6's double renders 9.99...e-07 — by convention
    # it is digit 1, identically in both engines).
    edges = {1.0: 1, 10.0: 1, 100.0: 1, 0.001: 1, 1e-6: 1, 1e12: 1,
             9.9999999: 9, -1.0: 1, 0.9999999999: 9, 1.0000000001: 1,
             1e13: None, 9.99e-7: None, 0.0: None}   # below min decade
    allv = vals + list(edges)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(allv)],
                               "i long, value double")
    got = {r.i: r.d for r in
           df.select("i", first_digit(F.col("value")).alias("d")).collect()}
    for i, v in enumerate(vals):
        a = abs(v)
        want = int(f"{a:.20e}"[0]) if 1e-6 <= a < 1e13 else None
        assert got[i] == want, (i, v, got[i], want)
    for j, (v, want) in enumerate(edges.items()):
        assert got[len(vals) + j] == want, (v, got[len(vals) + j], want)


def test_wasserstein_properties(spark):
    """W1 is symmetric and zero iff distributions are identical; a
    one-bucket uniform shift of the whole mass scores exactly 1.0 (in
    bucket units) and a two-bucket shift exactly 2.0 — the linearity
    KS (always 1.0 here) cannot see."""
    from json_spark.operators.drift import ks_statistic, wasserstein_distance

    def shares(counts):
        tot = sum(counts.values())
        return spark.createDataFrame(
            [(b, n, n / tot) for b, n in counts.items()],
            "bucket long, n long, share double")

    p = shares({0: 10})
    q1 = shares({1: 10})            # all mass moved +1 bucket
    q2 = shares({2: 10})            # all mass moved +2 buckets
    w_p_q1 = wasserstein_distance(p, q1).collect()[0]["w1"]
    w_q1_p = wasserstein_distance(q1, p).collect()[0]["w1"]
    w_p_q2 = wasserstein_distance(p, q2).collect()[0]["w1"]
    assert w_p_q1 == w_q1_p == 1.0
    assert w_p_q2 == 2.0
    # KS saturates at 1.0 for both shifts — W1 distinguishes them
    assert ks_statistic(p, q1).collect()[0]["ks"] == 1.0
    assert ks_statistic(p, q2).collect()[0]["ks"] == 1.0


class TestFileProfile:
    def test_known_layout(self, spark, tmp_path):
        from json_spark.operators.profiling import file_profile
        # three files with 10 / 20 / 70 rows via range-partitioned write
        import pyspark.sql.functions as F
        df = spark.range(100).withColumn(
            "g", F.when(F.col("id") < 10, "a")
                  .when(F.col("id") < 30, "b").otherwise("c"))
        out = str(tmp_path / "layout")
        df.repartition("g").write.partitionBy("g").parquet(out)
        r = file_profile(spark.read.parquet(out)).collect()[0]
        assert r["n_files"] == 3
        assert r["n_rows"] == 100
        assert r["min_file_rows"] == 10
        assert r["max_file_rows"] == 70
        assert r["skew"] == round(70.0 / (100.0 / 3.0), 6)

    def test_single_file_skew_one(self, spark, tmp_path):
        from json_spark.operators.profiling import file_profile
        out = str(tmp_path / "one")
        spark.range(42).coalesce(1).write.parquet(out)
        r = file_profile(spark.read.parquet(out)).collect()[0]
        assert (r["n_files"], r["n_rows"], r["skew"]) == (1, 42, 1.0)


def test_json_value_type_seven_shapes(spark):
    from json_spark.operators.profiling import json_value_type
    df = spark.createDataFrame(
        [("123",), ('"s7"',), ("true",), ("1.5",), ("null",),
         ("[1,2]",), ('{"a":1}',), ("not json",)], "v string")
    got = [r[0] for r in df.select(json_value_type(F.col("v"))).collect()]
    assert got == ["integer", "string", "boolean", "double", "null",
                   "array", "object", None]


def test_dominant_type_drift_planted(spark):
    from json_spark.operators.profiling import dominant_type_drift
    rows = []
    # key a: early mostly integer, late mostly string (drifts)
    rows += [("a", "early", "integer")] * 9 + [("a", "early", "string")]
    rows += [("a", "late", "string")] * 8 + [("a", "late", "integer")] * 2
    # key b: stable boolean both halves
    rows += [("b", "early", "boolean")] * 5
    rows += [("b", "late", "boolean")] * 6
    df = spark.createDataFrame(rows, "key string, seg string, t string")
    out = {r["key"]: r.asDict() for r in
           dominant_type_drift(df, "key", "t", "seg").collect()}
    assert out["a"]["dominant_early"] == "integer"
    assert out["a"]["dominant_late"] == "string"
    assert out["a"]["drifted"] is True
    assert out["a"]["n_dom_early"] == 9 and out["a"]["n_dom_late"] == 8
    assert out["b"]["drifted"] is False


def test_dominant_type_drift_tie_breaks_lexicographically(spark):
    from json_spark.operators.profiling import dominant_type_drift
    rows = ([("k", "early", "double")] * 3 + [("k", "early", "array")] * 3
            + [("k", "late", "double")] * 2)
    df = spark.createDataFrame(rows, "key string, seg string, t string")
    out = dominant_type_drift(df, "key", "t", "seg").collect()[0]
    assert out["dominant_early"] == "array"  # tie -> lexicographic


def test_unit_mixture_flags_planted_microseconds(spark):
    from json_spark.operators.profiling import unit_mixture_check
    rows = []
    for i in range(500):
        v = 100 + (i * 37) % 100                # ms population: decade 2
        if i % 5 == 0:
            v *= 1000                            # "microseconds" feed
        rows.append((v, 16000 + (i % 3) * 16000))
    df = spark.createDataFrame(rows, "dur long, sr long")
    out = {r["col_name"]: r.asDict() for r in
           unit_mixture_check(df, ["dur", "sr"]).collect()}
    d = out["dur"]
    assert d["mode_decade"] == 2 and d["far_decade"] == 5
    assert abs(d["far_share"] - 0.2) < 0.01
    assert d["verdict"] == "RED"
    s = out["sr"]
    assert s["verdict"] == "GREEN" and s["far_share"] == 0.0


def test_unit_mixture_wide_but_unimodal_green(spark):
    """A wide single population spanning adjacent decades is NOT a unit
    mixture — the gap requirement separates spread from bimodality."""
    from json_spark.operators.profiling import unit_mixture_check
    df = spark.createDataFrame([(50 + i,) for i in range(300)], "v long")
    out = unit_mixture_check(df, ["v"]).collect()[0]
    assert out["verdict"] == "GREEN"


def test_decade_matches_strlen_for_integers(spark):
    from json_spark.operators.profiling import decade
    vals = [1, 9, 10, 99, 100, 5000, 123456, 999999999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r[0] for r in df.select(decade(F.col("v"))).collect()]
    assert got == [len(str(v)) - 1 for v in vals]
