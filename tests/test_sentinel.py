"""Sentinel / placeholder-value detection (operators/sentinel.py)."""

from pyspark.sql import functions as F

from json_spark.operators.sentinel import (
    id_sentinels,
    numeric_sentinels,
    sentinel_scan,
    string_sentinels,
    timestamp_sentinels,
)


def _df(spark):
    rows = [
        # (id_col, amount, label, ts)
        (1, 10.0, "ok", "2024-05-01 00:00:00"),
        (-1, 5.0, "N/A", "1970-01-01 00:00:00"),      # 3 sentinels
        (99999999, 0.0, "", "2024-05-02 00:00:00"),   # 3 sentinels
        (2, -3.5, "null", "1969-12-31 23:00:00"),     # 3 sentinels
        (3, 7.0, "  ", "2024-05-03 00:00:00"),        # trim-empty string
        (0, 1.0, "UNKNOWN", "2024-05-04 00:00:00"),   # id + string
    ]
    return spark.createDataFrame(
        rows, "id_col long, amount double, label string, ts_raw string"
    ).withColumn("ts", F.col("ts_raw").cast("timestamp"))


def test_sentinel_counts_per_column(spark):
    out = sentinel_scan(_df(spark), [
        ("id_col", id_sentinels(F.col("id_col"))),
        ("amount", numeric_sentinels(F.col("amount"))),
        ("label", string_sentinels(F.col("label"))),
        ("ts", timestamp_sentinels(F.col("ts"))),
    ])
    got = {r["col_name"]: r.asDict() for r in out.collect()}
    assert set(got) == {"id_col", "amount", "label", "ts"}
    assert all(r["n_rows"] == 6 for r in got.values())
    assert got["id_col"]["n_sentinel"] == 3     # -1, 99999999, 0
    assert got["amount"]["n_sentinel"] == 2     # 0.0, -3.5
    assert got["label"]["n_sentinel"] == 5      # N/A, '', null, '  ', UNKNOWN
    assert got["ts"]["n_sentinel"] == 2         # epoch, 1969


def test_sentinel_verdict_band(spark):
    df = _df(spark)
    out = sentinel_scan(df, [
        ("id_col", id_sentinels(F.col("id_col"))),
        ("clean", F.lit(False)),
    ])
    got = {r["col_name"]: r["verdict"] for r in out.collect()}
    assert got["id_col"] == "YELLOW"
    assert got["clean"] == "GREEN"


def test_sentinel_scan_is_one_aggregate(spark):
    """All columns' predicates evaluate inside ONE scan: the physical
    plan contains exactly one corpus-side aggregate pair (partial +
    final over a single scan), no union of per-column scans."""
    df = _df(spark)
    out = sentinel_scan(df, [
        ("id_col", id_sentinels(F.col("id_col"))),
        ("amount", numeric_sentinels(F.col("amount"))),
        ("label", string_sentinels(F.col("label"))),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Union" not in plan


def test_sentinel_scan_empty_frame(spark):
    """An empty frame reports one row per column with 0 sentinels
    (rate null) — not null counts."""
    df = spark.createDataFrame([], "id_col long, label string")
    out = {r["col_name"]: r.asDict() for r in sentinel_scan(df, [
        ("id_col", id_sentinels(F.col("id_col"))),
        ("label", string_sentinels(F.col("label"))),
    ]).collect()}
    assert set(out) == {"id_col", "label"}
    assert all(r["n_rows"] == 0 and r["n_sentinel"] == 0
               and r["verdict"] == "GREEN" for r in out.values())
