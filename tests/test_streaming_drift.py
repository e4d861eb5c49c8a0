"""Streaming drift (streaming/validate.py:streaming_window_drift):
per-window PSI against a baked-in baseline, end-to-end through parquet
micro-batches → file sink with checkpoint, values pinned against a
python twin of the PSI formula."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from json_spark.operators.drift import EPS
from json_spark.streaming.validate import streaming_window_drift

SCHEMA = "ts timestamp, value double"
BASELINE = [0.25, 0.25, 0.25, 0.25]   # uniform over [0,100) in 4 buckets

#: minute-0 window mirrors the baseline (one row per bucket);
#: minute-1 window is fully collapsed into bucket 0 (drifted)
BATCH1 = (
    [("2026-01-01 00:00:%02d" % (5 + i), v)
     for i, v in enumerate([10.0, 35.0, 60.0, 85.0])]
    + [("2026-01-01 00:01:%02d" % (5 + i), 5.0) for i in range(4)]
)
#: advances the watermark far enough to finalize both windows
BATCH2 = [("2026-01-01 00:05:00", 50.0)]


def _psi(p_shares):
    out = 0.0
    for p, q in zip(p_shares, BASELINE):
        pc, qc = max(p, EPS), max(q, EPS)
        out += (pc - qc) * math.log(pc / qc)
    return round(out, 6)


def _write(spark, rows, path):
    (spark.createDataFrame(rows, "ts string, value double")
     .select(F.to_timestamp("ts").alias("ts"), "value")
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, src, sink, chk):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_window_drift(
        stream, "value", "ts", BASELINE, lo=0.0, hi=100.0,
        window_duration="1 minute", watermark="2 minutes")
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_streaming_window_drift_psi_values(spark, tmp_path):
    src, sink, chk = (str(tmp_path / d) for d in ("src", "sink", "chk"))
    _write(spark, BATCH1, src)
    _run(spark, src, sink, chk)
    _write(spark, BATCH2, src)
    _run(spark, src, sink, chk)
    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    assert set(rows) >= {"00:00", "00:01"}
    w0, w1 = rows["00:00"], rows["00:01"]
    assert w0["n_rows"] == 4 and w1["n_rows"] == 4
    # window 0 reproduces the baseline exactly -> PSI 0, not drifted
    assert w0["psi"] == _psi([0.25, 0.25, 0.25, 0.25]) == 0.0
    assert not w0["drifted"]
    # window 1 collapsed into bucket 0 -> the python-twin PSI, drifted
    assert w1["psi"] == _psi([1.0, 0.0, 0.0, 0.0])
    assert w1["psi"] > 0.25 and w1["drifted"]


def test_streaming_window_quantile_shift(spark, tmp_path):
    """Windowed exact median shift on a stream: one stateful agg, the
    median read off literal domain-count columns — the window that
    reproduces the baseline is GREEN at shift 0, the window drawn from
    the high end of the ladder grades by |shift| in baseline-IQR units,
    out-of-domain values are excluded (not binned) and counted."""
    from json_spark.streaming.validate import streaming_window_quantile_shift

    DOMAIN = [8000, 16000, 22050, 44100, 48000]
    Q50_BASE, IQR_BASE = 22050, 28100            # fixture baseline digest
    src, sink, chk = (str(tmp_path / d) for d in ("qsrc", "qsink", "qchk"))

    def write(rows):
        spark.createDataFrame(rows, "ts string, sr int").select(
            F.to_timestamp("ts").alias("ts"), "sr"
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("ts timestamp, sr int").parquet(src)
        out = streaming_window_quantile_shift(
            stream, "sr", "ts", DOMAIN, Q50_BASE, IQR_BASE,
            window_duration="1 minute", watermark="2 minutes")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    write([("2026-01-01 00:00:05", 16000), ("2026-01-01 00:00:15", 22050),
           ("2026-01-01 00:00:25", 22050), ("2026-01-01 00:00:35", 44100),
           ("2026-01-01 00:00:45", 11025),            # out-of-domain
           ("2026-01-01 00:01:05", 44100), ("2026-01-01 00:01:15", 48000),
           ("2026-01-01 00:01:25", 48000)])
    run()
    write([("2026-01-01 00:04:00", 22050)])           # advance watermark
    run()
    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    w0, w1 = rows["00:00"], rows["00:01"]
    assert (w0["n_rows"], w0["n_out"]) == (5, 1)
    # k = ceil(4/2) = 2 -> 2nd smallest of {16000,22050,22050,44100}
    assert w0["q50"] == 22050 and w0["shift"] == 0.0
    assert w0["verdict"] == "GREEN"
    # k = ceil(3/2) = 2 -> 2nd smallest of {44100,48000,48000} = 48000
    assert w1["q50"] == 48000
    assert w1["shift"] == round((48000 - Q50_BASE) / IQR_BASE, 6)
    assert w1["verdict"] == "YELLOW"                  # 0.92 IQRs, < red=1.0

    # definition twin: the batch operator agrees on the same rows
    from json_spark.operators.drift import exact_quantile_digest
    batch = spark.createDataFrame(
        [(v,) for v in (16000, 22050, 22050, 44100)], "sr int")
    assert exact_quantile_digest(batch, "sr").collect()[0]["q50"] == 22050
