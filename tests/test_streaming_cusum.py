"""Streaming CUSUM mean-shift detection (streaming/stateful.py:
streaming_cusum): alert-for-alert equality with a pure-python twin
across multiple triggers, shift localization, and per-key isolation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

TARGET, K, H = 10.0, 0.5, 4.0


def _twin(values):
    """Single-pass python CUSUM — the independent reference."""
    sp = sn = 0.0
    alerts = []
    for n, (seq, x) in enumerate(values, start=1):
        sp = max(0.0, sp + (x - TARGET - K))
        sn = max(0.0, sn + (TARGET - x - K))
        if sp > H:
            alerts.append(("UP", seq, n, round(sp, 9)))
            sp = 0.0
        elif sn > H:
            alerts.append(("DOWN", seq, n, round(sn, 9)))
            sn = 0.0
    return alerts


def _series():
    """120 points: in-control noise, UP shift at 40, recovery at 60,
    DOWN shift at 90 — deterministic, noise well inside the slack."""
    rng = np.random.default_rng(17)
    xs = []
    for i in range(120):
        base = TARGET
        if 40 <= i < 60:
            base = TARGET + 2.0   # upward mean shift
        elif 90 <= i < 120:
            base = TARGET - 1.5   # downward shift
        xs.append((i, float(base + rng.uniform(-0.3, 0.3))))
    return xs


def _run_stream(spark, tmp_path, xs, n_triggers=3):
    from json_spark.streaming.stateful import streaming_cusum
    src, sink, chk = (str(tmp_path / d) for d in ("csrc", "csink", "cchk"))
    schema = "codec string, seq long, v double"
    chunks = np.array_split(np.arange(len(xs)), n_triggers)
    for part in chunks:
        rows = [("pcm", int(xs[i][0]), xs[i][1]) for i in part]
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_cusum(stream, "codec", "v", "seq",
                              TARGET, K, H)
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    return spark.read.parquet(sink).orderBy("at_n").collect()


def test_matches_python_twin_across_triggers(spark, tmp_path):
    xs = _series()
    got = _run_stream(spark, tmp_path, xs, n_triggers=3)
    want = _twin(xs)
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["direction"], g["at_seq"], g["at_n"]) == w[:3]
        assert abs(g["statistic"] - w[3]) < 1e-9


def test_shift_localized(spark, tmp_path):
    xs = _series()
    got = _run_stream(spark, tmp_path, xs, n_triggers=2)
    first_up = next(r for r in got if r["direction"] == "UP")
    first_down = next(r for r in got if r["direction"] == "DOWN")
    # detection within a handful of points of the planted shifts,
    # never before them
    assert 40 <= first_up["at_seq"] <= 48
    assert 90 <= first_down["at_seq"] <= 98
    assert all(not (r["direction"] == "UP" and r["at_seq"] < 40)
               for r in got)


def test_keys_isolated(spark, tmp_path):
    """A shifted key alerts; an in-control key sharing the stream never
    does."""
    from json_spark.streaming.stateful import streaming_cusum
    src, sink, chk = (str(tmp_path / d) for d in ("ksrc", "ksink", "kchk"))
    schema = "codec string, seq long, v double"
    rows = ([("good", i, TARGET + 0.1 * (-1) ** i) for i in range(50)]
            + [("bad", i, TARGET + (3.0 if i >= 20 else 0.0))
               for i in range(50)])
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_cusum(stream, "codec", "v", "seq", TARGET, K, H)
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.read.parquet(sink).collect()
    keys = {r["key"] for r in res}
    assert keys == {"bad"}
    assert all(r["at_seq"] >= 20 for r in res)
