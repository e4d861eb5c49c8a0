"""Fuzzy edit-distance-1 matching (operators/fuzzy.py) vs a brute-force
python levenshtein twin — including the distance-2 shared-variant false
candidates the verify stage must reject."""

from pyspark.sql import functions as F

from json_spark.operators.fuzzy import (
    best_fuzzy_match,
    deletion_variants,
    fuzzy_match_ed1,
)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


CANON = ["alpha", "alphb", "beta", "bet", "betaa", "gamma", "ab", "ba"]
REFS = ["alpha",    # exact
        "alpa",     # deletion of canon 'alpha'
        "betaX",    # substitution-at-end of 'betaa', insertion of 'beta'
        "ab",       # exact; 'ba' shares variants but lev=2 -> must reject
        "zzz"]      # no match at all


def test_deletion_variants(spark):
    row = spark.range(1).select(
        deletion_variants(F.lit("abc")).alias("v")).collect()[0]
    assert set(row["v"]) == {"abc", "bc", "ac", "ab"}


def test_fuzzy_match_ed1_vs_bruteforce(spark):
    refs = spark.createDataFrame([(r,) for r in REFS], "ref string")
    canon = spark.createDataFrame([(k,) for k in CANON], "key string")
    got = {(r["ref"], r["key"], r["dist"]) for r in
           fuzzy_match_ed1(refs, canon, "ref", "key").collect()}
    want = {(r, k, _lev(r, k)) for r in REFS for k in CANON
            if _lev(r, k) <= 1}
    assert got == want
    # the transposition pair shares deletion variants but is distance 2:
    # blocking surfaces it, verify must kill it
    assert ("ab", "ba", 1) not in got and not any(
        r == "ab" and k == "ba" for r, k, _ in got)
    assert not any(r == "zzz" for r, _, _ in got)


def test_best_fuzzy_match_rank(spark):
    refs = spark.createDataFrame([(r,) for r in REFS], "ref string")
    canon = spark.createDataFrame([(k,) for k in CANON], "key string")
    got = {r["ref"]: (r["matched_key"], r["dist"]) for r in
           best_fuzzy_match(refs, canon, "ref", "key").collect()}
    assert got["alpha"] == ("alpha", 0)          # exact beats near
    assert got["alpa"] == ("alpha", 1)
    assert got["betaX"] == ("beta", 1)           # lexicographic tiebreak
    assert got["ab"] == ("ab", 0)
    assert "zzz" not in got                      # unmatched refs absent
