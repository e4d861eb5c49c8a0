"""Word-level WER kernel (operators/alignment.py): DP exactness vs a
pure-python twin, backtrace-invariant consistency, null handling, and
the planted-edit contract the transcript_wer oracle relies on."""

import random

import pytest
from pyspark.sql import functions as F

from json_spark.operators.alignment import _align, word_edit_stats


def _twin(a, b):
    """Textbook O(n*m) DP — an independent second implementation."""
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = min(dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                           dp[i - 1][j] + 1, dp[i][j - 1] + 1)
    return dp[n][m]


def test_align_fuzz_vs_twin():
    rng = random.Random(20260821)
    vocab = ["the", "a", "b", "c", "dog", "fox"]
    for _ in range(1500):
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        d, s, dl, ins = _align(a, b)
        assert d == _twin(a, b)
        # backtrace walks one minimal script: op counts sum to the
        # distance and reconcile the two lengths
        assert d == s + dl + ins
        assert len(a) - dl + ins == len(b)


@pytest.mark.parametrize("a,b,want", [
    ([], [], (0, 0, 0, 0)),
    (["x"], [], (1, 0, 1, 0)),
    ([], ["x"], (1, 0, 0, 1)),
    (["a", "b", "c"], ["a", "b", "c"], (0, 0, 0, 0)),
    (["a", "b", "c"], ["a", "X", "c"], (1, 1, 0, 0)),
    (["a", "b", "c"], ["a", "c"], (1, 0, 1, 0)),
    (["a", "c"], ["a", "b", "c"], (1, 0, 0, 1)),
])
def test_align_cases(a, b, want):
    assert _align(a, b) == want


def test_planted_sentinel_edits_exact():
    """The transcript_wer oracle's closed-form claim: k scattered
    out-of-vocab substitutions / k trailing deletions / k sentinel
    appends each cost EXACTLY k, with a pure-op minimal script."""
    ref = ["w%d" % i for i in range(10)]
    for k in (1, 2, 3):
        step = len(ref) // k
        hyp = ["#s%d#" % i if i % step == 0 and i // step < k else w
               for i, w in enumerate(ref)]
        assert _align(ref, hyp) == (k, k, 0, 0)
        assert _align(ref, ref[:-k]) == (k, 0, k, 0)
        assert _align(ref, ref + ["#i%d#" % j for j in range(k)]) \
            == (k, 0, 0, k)


def test_word_edit_stats_passthrough_and_nulls(spark):
    df = spark.createDataFrame(
        [("r1", "g", "a b c", "a b c"),
         ("r2", "g", "a b c", "a X c"),
         ("r3", "h", None, "a b"),
         ("r4", "h", "a b", None),
         ("r5", "h", "", "x y")],
        "id string, grp string, ref string, hyp string")
    out = {r["id"]: r for r in word_edit_stats(
        df, "ref", "hyp", passthrough=["id", "grp"]).collect()}
    assert set(out) == {"r1", "r2", "r3", "r4", "r5"}
    assert out["r1"]["distance"] == 0 and out["r1"]["n_ref"] == 3
    assert out["r2"]["distance"] == 1 and out["r2"]["n_sub"] == 1
    assert out["r3"]["distance"] is None  # null ref -> null stats
    assert out["r4"]["distance"] is None
    # empty string tokenizes to zero words -> pure insertion
    assert out["r5"]["n_ref"] == 0 and out["r5"]["n_ins"] == 2
    assert out["r2"]["grp"] == "g"


def test_transcript_wer_query_runs(spark, sf_dir):
    from json_spark.plans.registry import QUERIES
    rows = {r["mode"]: r for r in
            QUERIES["transcript_wer"](spark, sf_dir).collect()}
    assert set(rows) == {"clean", "sub", "del", "ins"}
    assert rows["clean"]["max_distance"] == 0
    assert rows["sub"]["total_del"] == 0 and rows["sub"]["total_ins"] == 0
    assert rows["del"]["total_sub"] == 0 and rows["del"]["total_ins"] == 0
    assert rows["ins"]["total_sub"] == 0 and rows["ins"]["total_del"] == 0
    for m in ("sub", "del", "ins"):
        assert 0 < rows[m]["avg_wer"] < 1


def test_manifest_wer_query(spark, sf_dir):
    """The audio-domain WER query: mismatched pairs carry distance
    exactly 1 (one appended out-of-vocab token), everything else 0."""
    from json_spark.plans.registry import QUERIES
    rows = QUERIES["transcript_wer_manifest"](spark, sf_dir).collect()
    assert len(rows) == 4  # one per codec
    for r in rows:
        assert r["n_exact"] + r["total_word_edits"] == r["n_pairs"]
        assert r["max_distance"] in (0, 1)


def test_short_doc_clamped_plant_distance_equals_k(spark):
    """r4 verdict directive 5: on <10-word docs the k clamp (k <= n-1)
    must keep the planted-edit invariant distance == k through BOTH the
    plant surgery and the real DP kernel — for every mode, including a
    1-word doc where k clamps to 0."""
    from json_spark.operators.alignment import (plant_word_edits,
                                                word_edit_stats)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["one", "two words", "three little words", "a b c d",
             "one", "x y", "p q r", "m n o t",
             "single"])],
        "doc_id long, text string")
    hyp = plant_word_edits(docs)
    out = {r["doc_id"]: r for r in word_edit_stats(
        hyp, "text", "hyp", passthrough=["doc_id", "mode", "k", "n"])
        .collect()}
    assert len(out) == 9
    for r in out.values():
        assert r["k"] <= max(r["n"] - 1, 0)          # the clamp itself
        assert r["distance"] == r["k"], dict(r.asDict())
        if r["mode"] == "sub":
            assert r["n_sub"] == r["k"] and r["n_del"] == r["n_ins"] == 0
        elif r["mode"] == "del":
            assert r["n_del"] == r["k"] and r["n_sub"] == r["n_ins"] == 0
        elif r["mode"] == "ins":
            assert r["n_ins"] == r["k"] and r["n_sub"] == r["n_del"] == 0
