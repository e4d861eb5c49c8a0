"""Cross-partition median/MAD anomaly scan (operators/anomaly.py)."""

import math

import pytest

from json_spark.operators.anomaly import MAD_SIGMA, partition_anomaly


def _rows(df):
    return {(r["partition_id"], r["metric"]): r for r in df.collect()}


def test_outlier_detection_and_robustness(spark):
    # 9 well-behaved shards + 1 corrupted one; median/MAD must flag the
    # bad shard without the bad shard inflating the baseline
    vals = [100, 101, 99, 102, 98, 100, 101, 99, 100, 500]
    parts = spark.createDataFrame(
        [(f"p{i}", float(v)) for i, v in enumerate(vals)],
        "shard string, n_rows double")
    out = _rows(partition_anomaly(parts, "shard", ["n_rows"]))
    assert out[("p9", "n_rows")]["verdict"] == "RED"
    assert all(out[(f"p{i}", "n_rows")]["verdict"] == "GREEN"
               for i in range(9))
    # median of the 10 values is 100, MAD is 1 -> z for p9 = 400/1.4826
    r = out[("p9", "n_rows")]
    assert r["med"] == 100.0 and r["mad"] == 1.0
    assert abs(r["robust_z"] - round(400 / MAD_SIGMA, 6)) < 1e-9


def test_yellow_band_and_python_twin(spark):
    vals = [10.0, 12.0, 11.0, 13.0, 9.0, 11.5, 10.5, 18.0]
    parts = spark.createDataFrame(
        [(f"p{i}", v) for i, v in enumerate(vals)],
        "shard string, m double")
    out = _rows(partition_anomaly(parts, "shard", ["m"],
                                  k_yellow=2.0, k_red=4.0))

    # python twin: interpolated median, then MAD, then the banding
    def med(xs):
        s = sorted(xs)
        n = len(s)
        return (s[n // 2 - 1] + s[n // 2]) / 2 if n % 2 == 0 else s[n // 2]

    m0 = med(vals)
    mad0 = med([abs(v - m0) for v in vals])
    for i, v in enumerate(vals):
        z = (v - m0) / (MAD_SIGMA * mad0)
        want = "RED" if abs(z) > 4 else ("YELLOW" if abs(z) > 2 else "GREEN")
        r = out[(f"p{i}", "m")]
        assert r["verdict"] == want, (i, v, z)
        assert math.isclose(r["robust_z"], round(z, 6), abs_tol=1e-9)


def test_zero_mad_flags_any_deviation(spark):
    parts = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0), ("d", 5.0), ("e", 7.0)],
        "shard string, m double")
    out = _rows(partition_anomaly(parts, "shard", ["m"]))
    assert out[("e", "m")]["verdict"] == "RED"
    assert out[("e", "m")]["robust_z"] is None  # not finite, by contract
    assert all(out[(k, "m")]["verdict"] == "GREEN" for k in "abcd")


def test_multi_metric_independent(spark):
    # one shard is an outlier in ONE metric only
    parts = spark.createDataFrame(
        [("a", 100.0, 1.0), ("b", 101.0, 1.1), ("c", 99.0, 0.9),
         ("d", 100.0, 1.0), ("e", 100.0, 99.0)],
        "shard string, n double, m double")
    out = _rows(partition_anomaly(parts, "shard", ["n", "m"]))
    assert out[("e", "n")]["verdict"] == "GREEN"
    assert out[("e", "m")]["verdict"] == "RED"


def test_robust_line_conformance_flags_only_planted_liars(spark):
    """y = 50 + 3x exactly, with 3 liar rows whose declared x is 3x the
    truth: the median fit recovers slope 3 / intercept 50 and flags
    exactly the liars (an OLS fit would bend toward them)."""
    from json_spark.operators.anomaly import robust_line_conformance
    rows = []
    for i in range(200):
        x_true = 1000 + 17 * i
        y = 50 + 3 * x_true
        x_decl = x_true * 3 if i % 67 == 0 else x_true  # i = 0, 67, 134
        rows.append(("g", x_decl, y))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = robust_line_conformance(df, "x", "y", ["g"],
                                  abs_threshold=500).collect()[0]
    assert out["n_rows"] == 200
    assert out["n_outliers"] == 3
    assert abs(out["slope"] - 3.0) < 0.02
    assert abs(out["intercept"]) < 200  # fixed-point floor keeps it near 50
    assert out["verdict"] == "YELLOW"   # 1.5% > 0.5% default band


def test_robust_line_conformance_clean_group_green(spark):
    from json_spark.operators.anomaly import robust_line_conformance
    rows = [("g", 100 + i, 7 * (100 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = robust_line_conformance(df, "x", "y", ["g"],
                                  abs_threshold=100).collect()[0]
    assert out["n_outliers"] == 0
    assert out["slope"] == 7.0
    assert out["verdict"] == "GREEN"


def test_robust_line_conformance_ignores_null_and_nonpositive_x(spark):
    from json_spark.operators.anomaly import robust_line_conformance
    rows = [("g", 10, 20), ("g", 20, 40), ("g", 0, 99), ("g", None, 1)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = robust_line_conformance(df, "x", "y", ["g"],
                                  abs_threshold=10).collect()[0]
    assert out["n_rows"] == 2


def test_seasonal_volume_anomaly_planted_quiet_monday(spark):
    """A weekday-heavy feed: weekends at 10 rows/day, weekdays at 100.
    Un-adjusted stats would flag every weekend; the seasonal check
    flags ONLY the planted quiet Monday (20 rows where Mondays run
    100)."""
    from pyspark.sql import functions as F

    from json_spark.operators.anomaly import seasonal_volume_anomaly
    rows = []
    # days 0..27: 4 full weeks; day % 7 in (2, 3) = weekend (1970-01-01
    # is a Thursday: residues are weekday labels, not names)
    for day in range(28):
        weekend = day % 7 in (2, 3)
        n = 10 if weekend else 100
        if day == 21:                      # planted quiet "Monday"
            n = 20
        for i in range(n):
            rows.append((day * 86400 + i,))
    df = spark.createDataFrame(rows, "sec long").select(
        F.timestamp_seconds(F.col("sec")).cast("timestamp_ntz").alias("ts"))
    out = {r["day"]: r for r in
           seasonal_volume_anomaly(df, "ts").collect()}
    assert len(out) == 28
    flagged = [d for d, r in out.items() if r["anomalous"]]
    assert flagged == [21]
    assert out[21]["med_dow"] == 100       # its weekday's median
    # weekends judged against weekend medians -> clean
    assert not out[2]["anomalous"] and not out[9]["anomalous"]
