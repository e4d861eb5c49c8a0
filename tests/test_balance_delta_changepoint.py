"""Unit tests for the round-3 additions: mean-shift change-point
localization (operators/changepoint.py), delta-vs-corpus incremental
dedup (operators/delta.py), and the class-balance audit
(operators/balance.py) — controlled inputs with hand-derivable answers,
including the planted-step recovery the sf fixture (which carries its
own generator drift) cannot pin."""

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from json_spark.operators.balance import class_balance
from json_spark.operators.changepoint import mean_shift_changepoint
from json_spark.operators.delta import incremental_dedup, split_batch

EPOCH0 = datetime(2024, 1, 1)


def _ts_rows(group, day_values):
    """[(group, ts, v)] — one row per (day, value) pair."""
    rows = []
    for day, vals in day_values:
        for v in vals:
            rows.append((group, EPOCH0 + timedelta(days=day), float(v)))
    return rows


def test_changepoint_recovers_planted_step(spark):
    # group "step": 6 days, 4 rows/day; +5.0 from day 3 on -> the best
    # split is day 2 (before: days 0-2 at 10.0, after: days 3-5 at 15.0)
    step = _ts_rows("step", [(d, [10.0] * 4) for d in range(3)]
                    + [(d, [15.0] * 4) for d in range(3, 6)])
    flat = _ts_rows("flat", [(d, [7.0] * 4) for d in range(6)])
    df = spark.createDataFrame(step + flat,
                               "g string, ts timestamp_ntz, v double")
    out = {r["g"]: r for r in
           mean_shift_changepoint(df, ["g"], "ts", "v").collect()}

    s = out["step"]
    base_day = (EPOCH0 - datetime(1970, 1, 1)).days
    assert s["split_day"] == base_day + 2
    assert (s["n_before"], s["n_after"]) == (12, 12)
    assert (s["mean_before"], s["mean_after"]) == (10.0, 15.0)
    # stat = |delta| * sqrt(n1*n2/N) = 5 * sqrt(144/24)
    assert s["shift_stat"] == pytest.approx(5 * math.sqrt(12 * 12 / 24),
                                            abs=1e-6)
    assert s["verdict"] == "RED"

    f = out["flat"]
    # all splits tie at stat 0 -> earliest candidate day wins
    assert f["split_day"] == base_day
    assert f["shift_stat"] == 0.0 and f["verdict"] == "GREEN"


def test_changepoint_single_day_group_has_no_split(spark):
    # one day only -> no candidate with both sides nonempty -> no row
    df = spark.createDataFrame(_ts_rows("one", [(0, [1.0, 2.0])]),
                               "g string, ts timestamp_ntz, v double")
    assert mean_shift_changepoint(df, ["g"], "ts", "v").count() == 0


def test_changepoint_yellow_band(spark):
    # delta=1.0 over 4+4 rows: stat = 1*sqrt(16/8)=1.414 -> GREEN at
    # default bands; with yellow=1.0 it lands YELLOW
    df = spark.createDataFrame(
        _ts_rows("g", [(0, [0.0] * 4), (1, [1.0] * 4)]),
        "g string, ts timestamp_ntz, v double")
    r = mean_shift_changepoint(df, ["g"], "ts", "v").collect()[0]
    assert r["verdict"] == "GREEN"
    r = mean_shift_changepoint(df, ["g"], "ts", "v",
                               yellow=1.0).collect()[0]
    assert r["verdict"] == "YELLOW"


def test_incremental_dedup_counts(spark):
    corpus = spark.createDataFrame(
        [(1, "s", "a b"), (2, "s", "c d")], "id long, src string, text string")
    batch = spark.createDataFrame(
        [(10, "s", "a b"),        # corpus dup
         (11, "s", "x y"), (12, "s", "x y"),  # within-batch dup pair
         (13, "s", "z w")],       # genuinely new
        "id long, src string, text string")
    r = incremental_dedup(batch, corpus, "id", "text", ["src"]).collect()[0]
    assert (r["n_batch"], r["n_dup_corpus"], r["n_dup_within"],
            r["n_kept"]) == (4, 1, 1, 2)


def test_incremental_dedup_empty_batch_group(spark):
    # a group with no corpus hits and no within dups reports zeros
    corpus = spark.createDataFrame([(1, "s", "a b")],
                                   "id long, src string, text string")
    batch = spark.createDataFrame([(9, "t", "q r")],
                                  "id long, src string, text string")
    r = incremental_dedup(batch, corpus, "id", "text", ["src"]).collect()[0]
    assert (r["src"], r["n_dup_corpus"], r["n_dup_within"],
            r["n_kept"]) == ("t", 0, 0, 1)


def test_split_batch_partitions_exactly(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    batch, corpus = split_batch(df, "id", batch_buckets=4)
    nb, nc = batch.count(), corpus.count()
    assert nb + nc == 200 and nb > 0 and nc > 0
    # disjoint and deterministic
    assert batch.join(corpus, "id").count() == 0
    nb2, _ = split_batch(df, "id", batch_buckets=4)
    assert nb2.count() == nb


def test_class_balance_uniform_and_degenerate(spark):
    rows = ([("u", "a")] * 10 + [("u", "b")] * 10 + [("u", "c")] * 10
            + [("one", "only")] * 7
            + [("skew", "big")] * 97 + [("skew", "small")] * 3)
    df = spark.createDataFrame(rows, "g string, label string")
    out = {r["g"]: r for r in class_balance(df, "label", ["g"]).collect()}

    u = out["u"]
    assert u["norm_entropy"] == 1.0 and u["verdict"] == "GREEN"
    assert u["inv_simpson"] == 3.0 and u["imbalance_ratio"] == 1.0

    o = out["one"]
    assert (o["n_classes"], o["entropy_bits"], o["norm_entropy"],
            o["inv_simpson"], o["verdict"]) == (1, 0.0, 0.0, 1.0, "RED")

    s = out["skew"]
    # H(0.97, 0.03) = 0.1944 bits; normalized by log2(2)=1 -> RED
    h = -(0.97 * math.log2(0.97) + 0.03 * math.log2(0.03))
    assert s["entropy_bits"] == pytest.approx(h, abs=1e-6)
    assert s["verdict"] == "RED"
    assert s["imbalance_ratio"] == pytest.approx(97 / 3, abs=1e-6)


def test_class_balance_custom_bands(spark):
    # 80/20 two-class: H = 0.7219 -> YELLOW at defaults (0.85/0.60),
    # GREEN if the caller loosens the yellow band below it
    df = spark.createDataFrame([("g", "a")] * 80 + [("g", "b")] * 20,
                               "g string, label string")
    r = class_balance(df, "label", ["g"]).collect()[0]
    assert r["verdict"] == "YELLOW"
    r = class_balance(df, "label", ["g"],
                      yellow_norm_entropy=0.7).collect()[0]
    assert r["verdict"] == "GREEN"


def test_duration_balance_shares_and_nulls(spark):
    from json_spark.operators.balance import duration_balance
    rows = [("a", 1000), ("a", 2000), ("b", 7000), ("c", None), ("c", 100)]
    df = spark.createDataFrame(rows, "g string, dur_ms long")
    out = {r["g"]: r for r in duration_balance(df, ["g"]).collect()}
    assert out["a"]["total_s"] == 3.0 and out["b"]["total_s"] == 7.0
    assert out["c"]["n_null_dur"] == 1 and out["c"]["total_s"] == 0.1
    tot = 3.0 + 7.0 + 0.1
    assert out["b"]["dur_share"] == round(7.0 / tot, 6)
    assert out["c"]["status"] == "UNDERREPRESENTED"   # ~1% of time
    assert out["b"]["status"] == "OK"
    # clip counts can disagree with time shares - the check's point
    assert out["a"]["n_clips"] == 2 and out["b"]["n_clips"] == 1
