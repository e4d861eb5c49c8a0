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
