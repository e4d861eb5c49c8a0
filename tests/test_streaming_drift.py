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
