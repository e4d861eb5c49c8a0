"""Streaming ingest validation: windowed verdicts with watermark + late data.

Deterministic end-to-end: parquet micro-batches → readStream →
coercion verdicts → tumbling-window rollup → memory sink, driven with
``trigger(availableNow=True)`` so each batch is fully processed before
assertions (no timing races).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_spark.config import default_config
from json_spark.streaming import streaming_windowed_verdicts
from json_spark.streaming.validate import default_stream_rules

CFG = default_config()

SCHEMA = "ts timestamp, codec string, raw_num string, raw_bool string"

#: batch 1: minute-0 window clean+dirty, minute-1 window with a RED row
BATCH1 = [
    ("2026-01-01 00:00:05", "wav", "1.5", "true"),
    ("2026-01-01 00:00:15", "wav", " 2.5 ", "yes"),     # YELLOW (space, list)
    ("2026-01-01 00:00:25", "mp3", "3.5", "false"),
    ("2026-01-01 00:01:10", "wav", "not-a-number", "true"),   # RED
    ("2026-01-01 00:01:20", "mp3", "4.0", "off"),             # YELLOW
]

#: batch 2: minute-2 rows that advance the watermark past minute 0,
#: plus a LATE minute-0 row still inside the 2-minute watermark
BATCH2 = [
    ("2026-01-01 00:02:30", "wav", "5.0", "true"),
    ("2026-01-01 00:00:45", "mp3", "6,000", "no"),      # late but in-watermark
]

#: batch 3: advances event time again — append mode finalizes windows
#: against the watermark committed by the PREVIOUS batch, so this batch
#: is what flushes the minute-0 windows downstream
BATCH3 = [
    ("2026-01-01 00:04:00", "wav", "7.0", "true"),
]


def _write_batch(spark, rows, path):
    raw = spark.createDataFrame(
        rows, "ts string, codec string, raw_num string, raw_bool string")
    raw.select(F.to_timestamp("ts").alias("ts"), "codec", "raw_num",
               "raw_bool").coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src, sink, chk):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_windowed_verdicts(
        stream,
        default_stream_rules(CFG, "raw_num", "raw_bool"),
        event_time_col="ts",
        window_duration="1 minute",
        watermark="2 minutes",
        partition_cols=["codec"],
    )
    # file sink: supports exactly-once restart from the checkpoint — the
    # production shape (memory sink cannot recover across restarts)
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def _read_sink(spark, sink):
    try:
        return spark.read.parquet(sink).collect()
    except Exception:
        return []


def test_streaming_windowed_verdicts(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    sink = str(tmp_path / "sink")
    _write_batch(spark, BATCH1, src)
    _run_stream(spark, src, sink, chk)
    # append mode emits only watermark-finalized windows — none yet
    # (max event time 00:01:20, watermark 2 min → nothing closed)
    assert len(_read_sink(spark, sink)) == 0

    _write_batch(spark, BATCH2, src)
    _run_stream(spark, src, sink, chk)
    # batch 2 RAISES the watermark to 00:00:30 but emission in a batch
    # uses the watermark committed by the batch before it → still nothing
    assert len(_read_sink(spark, sink)) == 0

    _write_batch(spark, BATCH3, src)
    _run_stream(spark, src, sink, chk)
    rows = {(r["window_start"].strftime("%H:%M"), r["codec"]): r
            for r in _read_sink(spark, sink)}
    # batch 3 runs with watermark 00:00:30 → the minute-0 windows close,
    # INCLUDING batch 2's late-but-in-watermark 00:00:45 row
    assert ("00:00", "wav") in rows and ("00:00", "mp3") in rows
    wav0 = rows[("00:00", "wav")]
    assert wav0["n_rows"] == 2
    assert wav0["n_green"] == 1 and wav0["n_yellow"] == 1
    assert wav0["verdict"] == "YELLOW"
    mp30 = rows[("00:00", "mp3")]
    # includes the late-but-in-watermark 00:00:45 row from batch 2
    assert mp30["n_rows"] == 2
    assert mp30["n_yellow"] == 1       # "6,000"/"no" row is YELLOW
    assert mp30["verdict"] == "YELLOW"
    # availableNow's trailing no-data microbatch applies the batch-3
    # watermark (00:02:00), closing the minute-1 windows too
    wav1 = rows[("00:01", "wav")]
    assert wav1["n_rows"] == 1 and wav1["n_red"] == 1
    assert wav1["verdict"] == "RED"          # the not-a-number row
    mp31 = rows[("00:01", "mp3")]
    assert mp31["verdict"] == "YELLOW"       # "4.0"/"off" row
    # windows at/after the watermark stay open
    assert not any(k[0] in ("00:02", "00:04") for k in rows)


def test_streaming_same_rules_as_batch(spark):
    """The identical rule Columns evaluate on a batch frame — Spark's
    batch/streaming unification, no separate rule compilation."""
    df = spark.createDataFrame(
        BATCH1, "ts string, codec string, raw_num string, raw_bool string"
    ).select(F.to_timestamp("ts").alias("ts"), "codec", "raw_num", "raw_bool")
    from json_spark.streaming import streaming_row_verdicts
    out = streaming_row_verdicts(df, default_stream_rules(CFG, "raw_num", "raw_bool"))
    verdicts = [r["row_verdict"] for r in out.orderBy("ts").collect()]
    assert verdicts == ["GREEN", "YELLOW", "GREEN", "RED", "YELLOW"]


def test_streaming_audio_header_verdicts(spark, tmp_path):
    """Binary-column validation on a stream: the pure-Column WAV header
    checks run unchanged as streaming rules — clips validated as they
    land, no Python stage in the streaming plan."""
    import numpy as np
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.operators.multimodal import wav_header_verdicts

    good = pcm16_wav_bytes(np.zeros(800, dtype=np.float32), 8000)
    sr_lie = pcm16_wav_bytes(np.zeros(800, dtype=np.float32), 16000)
    truncated = good[:144]                       # header claims 1600 bytes
    schema = "ts timestamp, codec string, bytes binary, sr_hz int"

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, codec string, bytes binary, sr_hz int"
        ).select(F.to_timestamp("ts").alias("ts"), "codec", "bytes", "sr_hz"
                 ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_windowed_verdicts(
            stream, wav_header_verdicts(), event_time_col="ts",
            window_duration="1 minute", watermark="2 minutes",
            partition_cols=["codec"])
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    src, sink, chk = (str(tmp_path / d) for d in ("asrc", "asink", "achk"))
    write([("2026-01-01 00:00:05", "wav", bytearray(good), 8000),
           ("2026-01-01 00:00:15", "wav", bytearray(sr_lie), 8000),
           ("2026-01-01 00:00:25", "wav", bytearray(truncated), 8000)])
    run()
    write([("2026-01-01 00:02:30", "wav", bytearray(good), 8000)])
    run()
    write([("2026-01-01 00:04:00", "wav", bytearray(good), 8000)])
    run()
    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    w0 = rows["00:00"]
    assert w0["n_rows"] == 3
    assert w0["n_green"] == 1                    # good clip
    assert w0["n_yellow"] == 1                   # sample-rate lie: recoverable
    assert w0["n_red"] == 1                      # truncated payload
    assert w0["verdict"] == "RED"


def test_streaming_metadata_consistency(spark, tmp_path):
    """Cross-field metadata-vs-payload rules on a stream: the same pure
    Column verdicts as the batch metadata_consistency query — a codec
    column that lies about the container and a NULL dur_ms are flagged
    in the micro-batch where the clip lands."""
    import numpy as np
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.operators.multimodal import metadata_consistency_verdicts

    good = pcm16_wav_bytes(np.zeros(800, dtype=np.float32), 8000)  # 100ms
    schema = "ts timestamp, codec string, bytes binary, sr_hz int, dur_ms int"

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, codec string, bytes binary, sr_hz int, dur_ms int"
        ).select(F.to_timestamp("ts").alias("ts"), "codec", "bytes",
                 "sr_hz", "dur_ms").coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_windowed_verdicts(
            stream, metadata_consistency_verdicts(), event_time_col="ts",
            window_duration="1 minute", watermark="2 minutes",
            partition_cols=["codec"])
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    src, sink, chk = (str(tmp_path / d) for d in ("msrc", "msink", "mchk"))
    write([("2026-01-01 00:00:05", "pcm_s16le", bytearray(good), 8000, 100),
           ("2026-01-01 00:00:15", "flac", bytearray(good), 8000, 100),
           ("2026-01-01 00:00:25", "pcm_s16le", bytearray(good), 8000, None)])
    run()
    write([("2026-01-01 00:02:30", "pcm_s16le", bytearray(good), 8000, 100)])
    run()
    write([("2026-01-01 00:04:00", "pcm_s16le", bytearray(good), 8000, 100)])
    run()
    rows = {(r["codec"], r["window_start"].strftime("%H:%M")): r
            for r in spark.read.parquet(sink).collect()}
    pcm0 = rows[("pcm_s16le", "00:00")]
    assert pcm0["n_rows"] == 2
    assert pcm0["n_green"] == 1                  # truthful clip
    assert pcm0["n_yellow"] == 1                 # NULL dur_ms: recoverable
    assert pcm0["verdict"] == "YELLOW"
    flac0 = rows[("flac", "00:00")]
    assert flac0["n_red"] == 1                   # WAV payload declared flac
    assert flac0["verdict"] == "RED"


def test_streaming_repair_at_ingest(spark, tmp_path):
    """repair_metadata is a map-only projection, so it runs on a stream
    unchanged (batch/streaming unification): clips land repaired —
    NULL dur filled from the header, lying codec corrected — in the
    micro-batch that carries them."""
    import numpy as np
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.operators.multimodal import repair_metadata

    good = pcm16_wav_bytes(np.zeros(800, dtype=np.float32), 8000)  # 100ms
    schema = "clip_id string, codec string, bytes binary, sr_hz int, dur_ms int"
    src, sink, chk = (str(tmp_path / d) for d in ("rsrc", "rsink", "rchk"))
    spark.createDataFrame(
        [("a", "pcm_s16le", bytearray(good), 8000, 100),
         ("b", "flac", bytearray(good), 8000, None)],
        schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (repair_metadata(stream)
         .writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = {r["clip_id"]: r for r in spark.read.parquet(sink).collect()}
    assert out["a"]["repaired_fields"] == []
    assert sorted(out["b"]["repaired_fields"]) == ["codec", "dur_ms"]
    assert (out["b"]["codec"], out["b"]["dur_ms"]) == ("pcm_s16le", 100)


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Stateful streaming dedup (applyInPandasWithState): the first
    occurrence of each key is emitted exactly once; duplicates inside one
    trigger AND across triggers (state persisted via the checkpoint) are
    suppressed."""
    from json_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "dsrc")
    sink = str(tmp_path / "dsink")
    chk = str(tmp_path / "dchk")
    schema = "k string, payload string"

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_first_seen(stream, "k", ["payload"])
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["k"], r["payload"])
                for r in spark.read.parquet(sink).collect()}

    # trigger 1: in-batch duplicate of a1 suppressed
    got1 = run([("a", "a1"), ("a", "a1-dup"), ("b", "b1")])
    assert {k for k, _ in got1} == {"a", "b"}
    assert len(got1) == 2

    # trigger 2: cross-trigger duplicates suppressed by persisted state;
    # only the new key c emits
    got2 = run([("a", "a2-dup"), ("c", "c1"), ("c", "c1-dup")])
    assert {k for k, _ in got2} == {"a", "b", "c"}
    assert len(got2) == 3
    assert ("c", "c1") in got2 or ("c", "c1-dup") in got2


# ---------------------------------------------------------------------------
# streaming sessionization (session_window) vs the batch lag/cumsum twin
# ---------------------------------------------------------------------------

SESS_BATCH1 = [
    # user A: one session 00:00 .. 00:14 (gaps 5, 9 min < 10), then an
    # event at EXACTLY +10 min — session_window's boundary is INCLUSIVE
    # (pinned by this test), so it EXTENDS the session to 00:34
    ("2026-01-01 00:00:00", "A", "1.5", "true"),
    ("2026-01-01 00:05:00", "A", " 2.5 ", "yes"),    # YELLOW
    ("2026-01-01 00:14:00", "A", "bad", "true"),     # RED
    ("2026-01-01 00:24:00", "A", "3.0", "false"),
    # user B: one 2-event session
    ("2026-01-01 00:01:00", "B", "4.0", "off"),      # YELLOW
    ("2026-01-01 00:02:00", "B", "5.0", "true"),
]

SESS_BATCH2 = [
    # advances the watermark to 01:00 (30-min horizon), finalizing every
    # minute-0 session above; opens its own session
    ("2026-01-01 01:30:00", "A", "6.0", "true"),
]

SESS_BATCH3 = [
    # advances the watermark to 02:00, flushing the 01:30 session; this
    # row's own session stays open and must NOT be emitted
    ("2026-01-01 02:30:00", "B", "7.0", "true"),
]


def _session_twin(spark, rows, gap_min=10):
    """Independent batch sessionization: lag → flag(diff > gap) →
    running-sum — the registry event_sessions algorithm, not
    session_window (whose inclusive gap boundary this mirrors)."""
    from pyspark.sql import Window

    from json_spark.streaming.validate import streaming_row_verdicts
    raw = spark.createDataFrame(
        rows, "ts string, user_id string, raw_num string, raw_bool string"
    ).select(F.to_timestamp("ts").alias("ts"), "user_id", "raw_num",
             "raw_bool")
    v = streaming_row_verdicts(
        raw, default_stream_rules(CFG, "raw_num", "raw_bool"))
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_min * 60 * 1000000
    us = F.unix_micros("ts")
    new_s = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us),
        1).otherwise(0)
    s = v.withColumn("sess", F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    rank = F.when(F.col("row_verdict") == "RED", 2).when(
        F.col("row_verdict") == "YELLOW", 1).otherwise(0)
    return (s.groupBy("user_id", "sess")
            .agg(F.min("ts").alias("session_start"),
                 (F.max("ts") + F.expr(f"INTERVAL {gap_min} MINUTES")
                  ).alias("session_end"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.sum((rank == 0).cast("long")).alias("n_green"),
                 F.sum((rank == 1).cast("long")).alias("n_yellow"),
                 F.sum((rank == 2).cast("long")).alias("n_red"),
                 F.max(rank).alias("w"))
            .select("user_id", "session_start", "session_end", "n_rows",
                    "n_green", "n_yellow", "n_red",
                    F.when(F.col("w") == 2, "RED")
                    .when(F.col("w") == 1, "YELLOW")
                    .otherwise("GREEN").alias("verdict")))


def test_streaming_session_verdicts(spark, tmp_path):
    """session_window sessionization matches the lag/cumsum batch twin
    on every finalized session, including the exact-gap boundary."""
    from json_spark.streaming.validate import streaming_session_verdicts
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    schema = ("ts timestamp, user_id string, raw_num string, "
              "raw_bool string")

    def write(rows):
        raw = spark.createDataFrame(
            rows,
            "ts string, user_id string, raw_num string, raw_bool string")
        (raw.select(F.to_timestamp("ts").alias("ts"), "user_id",
                    "raw_num", "raw_bool")
         .coalesce(1).write.mode("append").parquet(src))

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_session_verdicts(
            stream, default_stream_rules(CFG, "raw_num", "raw_bool"),
            event_time_col="ts", key_col="user_id",
            gap="10 minutes", watermark="30 minutes")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    for rows in (SESS_BATCH1, SESS_BATCH2, SESS_BATCH3):
        write(rows)
        run()

    got = {tuple(map(str, r)) for r in spark.read.parquet(sink)
           .select("user_id", "session_start", "session_end", "n_rows",
                   "n_green", "n_yellow", "n_red", "verdict").collect()}

    all_rows = SESS_BATCH1 + SESS_BATCH2 + SESS_BATCH3
    twin = _session_twin(spark, all_rows)
    # only sessions the final watermark (02:30 − 30 min = 02:00) closed
    want = {tuple(map(str, r)) for r in twin
            .filter(F.col("session_end") <= F.lit("2026-01-01 02:00:00")
                    .cast("timestamp"))
            .select("user_id", "session_start", "session_end", "n_rows",
                    "n_green", "n_yellow", "n_red", "verdict").collect()}

    assert want, "twin produced no finalized sessions — test bug"
    assert got == want
    # the exact-gap event EXTENDED the session (inclusive boundary)
    assert any(r[0] == "A" and r[3] == "4" and "00:34:00" in r[2]
               for r in got)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark collapses retries inside the
    horizon (across triggers) while a recurrence after the watermark
    passed re-emits — the semantic boundary vs streaming_first_seen."""
    from json_spark.streaming.stateful import (
        streaming_dedup_within_watermark)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    schema = "ts timestamp, k string, payload string"

    def write(rows):
        raw = spark.createDataFrame(rows, "ts string, k string, payload string")
        (raw.select(F.to_timestamp("ts").alias("ts"), "k", "payload")
         .coalesce(1).write.mode("append").parquet(src))

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_dedup_within_watermark(
            stream, ["k"], "ts", watermark="10 minutes")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: first arrival + same-trigger retry
    write([("2026-01-01 00:00:00", "a", "v1"),
           ("2026-01-01 00:00:05", "a", "v1-retry"),
           ("2026-01-01 00:00:10", "b", "w1")])
    run()
    # batch 2: cross-trigger retry still inside the horizon, suppressed;
    # advances the watermark far past key a's state
    write([("2026-01-01 00:01:00", "a", "v1-late-retry"),
           ("2026-01-01 02:00:00", "c", "x1")])
    run()
    # batch 3: key a recurs AFTER its state was evicted -> re-emitted
    write([("2026-01-01 02:30:00", "a", "v2")])
    run()

    rows = spark.read.parquet(sink).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r.payload)
    assert by_key["b"] == ["w1"]
    assert by_key["c"] == ["x1"]
    assert sorted(by_key["a"]) == ["v1", "v2"]  # retries collapsed, recurrence re-emitted


def test_streaming_referential_orphans(spark, tmp_path):
    """Stream-stream left-outer join with watermark: a clip whose
    manifest entry arrives within the horizon never emits as orphan; a
    clip whose entry never arrives emits once the watermark proves no
    match can still come."""
    from json_spark.streaming.referential import (
        streaming_referential_orphans)
    csrc = str(tmp_path / "clips")
    msrc = str(tmp_path / "manifest")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    cschema = "ts timestamp, clip_id string, codec string"
    mschema = "ts timestamp, clip_id string, transcript string"

    def write(path, schema_str, rows):
        raw = spark.createDataFrame(
            rows, schema_str.replace("timestamp", "string"))
        (raw.select(F.to_timestamp("ts").alias("ts"),
                    *[c.split(" ")[0] for c in schema_str.split(", ")][1:])
         .coalesce(1).write.mode("append").parquet(path))

    def run():
        clips = spark.readStream.schema(cschema).parquet(csrc)
        manifest = spark.readStream.schema(mschema).parquet(msrc)
        out = streaming_referential_orphans(
            clips, manifest, key="clip_id", clip_time_col="ts",
            manifest_time_col="ts", max_delay="5 minutes")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: clip A with manifest entry, clip B without
    write(csrc, cschema, [("2026-01-01 00:00:00", "A", "wav"),
                          ("2026-01-01 00:00:30", "B", "wav")])
    write(msrc, mschema, [("2026-01-01 00:01:00", "A", "hello")])
    run()
    # batch 2: B's manifest entry arrives LATE but inside the horizon;
    # clip C arrives with no entry
    write(csrc, cschema, [("2026-01-01 00:02:00", "C", "mp3")])
    write(msrc, mschema, [("2026-01-01 00:04:00", "B", "world")])
    run()
    # batch 3: far-future rows on BOTH sides push the watermark past
    # C's horizon -> C emits as orphan; A and B never do
    write(csrc, cschema, [("2026-01-01 01:00:00", "Z", "wav")])
    write(msrc, mschema, [("2026-01-01 01:00:00", "Z", "zz")])
    run()
    run()  # extra trigger: eviction lands the batch after watermark moves

    got = {r["clip_id"] for r in spark.read.parquet(sink).collect()}
    assert "C" in got
    assert "A" not in got and "B" not in got


def test_streaming_domain_rules(spark, tmp_path):
    """Domain/CHECK constraints are stateless Column verdicts, so the
    SAME compiled rules run unchanged on a stream (batch/streaming
    unification) — windowed rollup counts pinned by hand."""
    from json_spark.operators.domain import DomainRule, rule_verdict

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    schema = "ts timestamp, clip_id string, sr_hz int, dur_ms int"

    rows = [
        ("2026-01-01 00:00:05", "a", 16000, 100),   # GREEN
        ("2026-01-01 00:00:15", "b", 12345, 100),   # RED (sr not in set)
        ("2026-01-01 00:00:25", "c", 16000, None),  # RED (required dur)
        ("2026-01-01 00:01:10", "d", 8000, 100),    # YELLOW (preferred)
    ]
    raw = spark.createDataFrame(
        rows, "ts string, clip_id string, sr_hz int, dur_ms int")
    (raw.select(F.to_timestamp("ts").alias("ts"), "clip_id", "sr_hz",
                "dur_ms").coalesce(1).write.mode("append").parquet(src))
    # far-future row to close both windows
    (raw.limit(1).select(
        F.to_timestamp(F.lit("2026-01-01 01:00:00")).alias("ts"),
        F.lit("z").alias("clip_id"), F.lit(16000).alias("sr_hz"),
        F.lit(100).alias("dur_ms"))
     .write.mode("append").parquet(src))

    rules = {
        "sr_set": rule_verdict(DomainRule(
            "sr_hz", in_set=(8000, 16000, 44100, 48000))),
        "sr_pref": rule_verdict(DomainRule(
            "sr_hz", in_set=(16000, 44100, 48000), severity="YELLOW")),
        "dur_req": rule_verdict(DomainRule("dur_ms", required=True)),
    }
    from json_spark.streaming import streaming_windowed_verdicts
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_windowed_verdicts(stream, rules, "ts",
                                      window_duration="1 minute",
                                      watermark="2 minutes")
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {str(r["window_start"]): r
           for r in spark.read.parquet(sink).collect()}
    w0 = got["2026-01-01 00:00:00"]
    assert (w0["n_rows"], w0["n_green"], w0["n_yellow"], w0["n_red"],
            w0["verdict"]) == (3, 1, 0, 2, "RED")
    w1 = got["2026-01-01 00:01:00"]
    assert (w1["n_rows"], w1["n_yellow"], w1["verdict"]) == (1, 1, "YELLOW")


def test_streaming_content_verdicts(spark, tmp_path):
    """Content-level streaming validation: the fused pcm_scan decode
    kernel (SNR vs reference signal + header integrity, one Arrow pass)
    runs on a stream; per-window rollups finalize in append mode as the
    watermark advances. Event time crosses the Arrow stage as unix
    micros (lossless), so window boundaries are exact."""
    import numpy as np
    from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
    from json_spark.streaming import streaming_content_verdicts

    # clip whose payload IS its reference signal => GREEN
    good = pcm16_wav_bytes(reference_signal("c-good", 8000, 100), 8000)
    # payload is a DIFFERENT clip's signal => decodes fine, SNR fails
    wrong = pcm16_wav_bytes(reference_signal("c-other", 8000, 100), 8000)
    # truncated container => header RED
    trunc = good[:40]
    schema = ("ts timestamp, clip_id string, bytes binary, "
              "dur_ms int, codec string")

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, clip_id string, bytes binary, "
                  "dur_ms int, codec string"
        ).select(F.to_timestamp("ts").alias("ts"), "clip_id", "bytes",
                 "dur_ms", "codec").coalesce(1).write.mode(
            "append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_content_verdicts(
            stream, event_time_col="ts", window_duration="1 minute",
            watermark="2 minutes", group_col="codec")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    src, sink, chk = (str(tmp_path / d) for d in ("csrc", "csink", "cchk"))
    write([("2026-01-01 00:00:05", "c-good", bytearray(good), 100, "wav"),
           ("2026-01-01 00:00:15", "c-good", bytearray(wrong), 100, "wav"),
           ("2026-01-01 00:00:25", "c-good", bytearray(trunc), 100, "wav")])
    run()
    write([("2026-01-01 00:03:30", "c-good", bytearray(good), 100, "wav")])
    run()
    # GREEN by SNR but narrowband at 48 kHz (f0=656 ⇒ occupancy fp≈109
    # < 384): the upsample-suspect YELLOW path of the bandwidth band
    upsam = pcm16_wav_bytes(reference_signal("c-good", 48000, 100), 48000)
    write([("2026-01-01 00:06:00", "c-good", bytearray(upsam), 100, "wav")])
    run()
    # 8-bit-requantized copy: passes the SNR gate (~45 dB) but the
    # OR-fold exposes the missing low bits -> the bit_depth YELLOW path
    vq = (np.round(np.clip(reference_signal("c-good", 8000, 100), -1, 1)
                   * 32767.0).astype(np.int64) // 256) * 256
    fake8 = pcm16_wav_bytes(vq / 32767.0, 8000)
    write([("2026-01-01 00:09:00", "c-good", bytearray(fake8), 100, "wav")])
    run()
    write([("2026-01-01 00:12:00", "c-good", bytearray(good), 100, "wav")])
    run()
    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    w0 = rows["00:00"]
    assert w0["n_rows"] == 3
    assert w0["n_green"] == 1          # payload == reference signal
    assert w0["n_red"] == 2            # wrong-signal SNR fail + truncated
    assert w0["n_hdr_bad"] == 1        # only the truncated container
    assert w0["n_bw_yellow"] == 0      # 8 kHz clips sit above the band
    assert w0["verdict"] == "RED"
    assert w0["min_snr_db"] < 30 <= 60 < w0["mean_snr_db"] * 3
    w3 = rows["00:03"]
    assert (w3["n_rows"], w3["n_green"], w3["verdict"]) == (1, 1, "GREEN")
    w6 = rows["00:06"]
    assert (w6["n_rows"], w6["n_green"], w6["n_bw_yellow"],
            w6["verdict"]) == (1, 1, 1, "YELLOW")
    # polarity third moment rides the same pass: the reference stack is
    # asymmetric, so a window of decodable clips carries a nonzero cube
    assert w3["cube_sum"] != 0 and w3["n_neg_skew"] + w3["n_pos_skew"] == 1
    w9 = rows["00:09"]
    assert (w9["n_rows"], w9["n_green"], w9["n_bits_yellow"],
            w9["verdict"]) == (1, 1, 1, "YELLOW")
    assert w3["n_bits_yellow"] == 0     # genuine 16-bit clip


def test_streaming_content_divergence(spark, tmp_path):
    """Ingest-time duplicate-content integrity (applyInPandasWithState):
    a re-seen key whose content digest differs from the FIRST-seen copy
    alerts CONTENT_DIVERGENT; same content but a changed label alerts
    LABEL_DIVERGENT; identical re-uploads and first occurrences stay
    silent — in-batch and across triggers (state via the checkpoint)."""
    from json_spark.streaming.stateful import streaming_content_divergence

    src = str(tmp_path / "cdsrc")
    sink = str(tmp_path / "cdsink")
    chk = str(tmp_path / "cdchk")
    schema = "k string, h string, lbl string"

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_content_divergence(stream, "k", "h", "lbl")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["key"], r["verdict"], r["first_value"], r["value"],
                 r["occurrence"])
                for r in spark.read.parquet(sink).collect()}

    # trigger 1: first occurrences silent; in-batch content divergence of
    # key b alerts against b's first-seen digest
    got1 = run([("a", "h1", "t1"), ("b", "h2", "t2"), ("b", "h2x", "t2")])
    assert got1 == {("b", "CONTENT_DIVERGENT", "h2", "h2x", 2)}

    # trigger 2: identical re-upload of a stays silent; two label edits
    # of a both alert against the PERSISTED first-seen label; new key c
    # is silent
    got2 = run([("a", "h1", "t1"), ("a", "h1", "t1x"), ("a", "h1", "t1y"),
                ("c", "h9", "t9")])
    new = got2 - got1
    assert {(k, v, fv, val) for k, v, fv, val, _ in new} == {
        ("a", "LABEL_DIVERGENT", "t1", "t1x"),
        ("a", "LABEL_DIVERGENT", "t1", "t1y")}
    # occurrences count ALL sightings of a (1 from trigger 1 + 3 now):
    # the identical re-upload occupies one slot, so the two alerts sit
    # somewhere in occurrences 2..4
    assert {o for *_, o in new} <= {2, 3, 4}
    assert len({o for *_, o in new}) == 2


def test_streaming_encoding_rule(spark, tmp_path):
    """The encoding-health rule (operators/text.py:encoding_verdict) is a
    pure stateless Column, so it validates an append-only transcript
    stream unchanged — per-micro-batch verdicts equal the batch twin's
    on the same rows (batch/streaming unification, zero re-compilation)."""
    import pyspark.sql.functions as F
    from json_spark.operators.text import encoding_verdict
    from json_spark.streaming.validate import streaming_row_verdicts

    repl, bel, zwsp = chr(0xFFFD), chr(0x07), chr(0x200B)
    rows = [("c1", "clean text"),
            ("c2", f"broken {repl} decode"),
            ("c3", f"zero{zwsp}width only"),
            ("c4", f"binary {bel} junk"),
            ("c5", "caf" + chr(0xC3) + chr(0xA9) + " mojibake")]
    src = str(tmp_path / "src"); chk = str(tmp_path / "chk")
    sink = str(tmp_path / "sink")
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    df.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "clip_id string, transcript string").parquet(src)
    rules = {"transcript": encoding_verdict(F.col("transcript"))}
    out = streaming_row_verdicts(stream, rules)
    (out.writeStream.format("parquet")
     .option("path", sink).option("checkpointLocation", chk)
     .trigger(availableNow=True).start().awaitTermination(120))

    got = {r["clip_id"]: r["row_verdict"]
           for r in spark.read.parquet(sink).collect()}
    batch = {r["clip_id"]: r["row_verdict"]
             for r in streaming_row_verdicts(df, rules).collect()}
    assert got == batch == {"c1": "GREEN", "c2": "RED", "c3": "YELLOW",
                            "c4": "RED", "c5": "RED"}


# --- streaming twin of the sentinel/placeholder family ----------------------

SENT_SCHEMA = "ts timestamp, uid long, amount double, label string"

SENT_BATCH1 = [
    ("2026-01-01 00:00:05", 7, 10.0, "ok"),
    ("2026-01-01 00:00:15", -1, 5.0, "fine"),       # id sentinel
    ("2026-01-01 00:00:25", 8, 0.0, "N/A"),         # amount + label sentinels
    ("2026-01-01 00:01:10", 9, 3.0, "good"),        # minute-1 clean
]

SENT_BATCH2 = [("2026-01-01 00:02:30", 10, 1.0, "ok")]
SENT_BATCH3 = [("2026-01-01 00:04:00", 11, 1.0, "ok")]


def _sentinel_rules():
    from json_spark.operators.sentinel import (
        id_sentinels, numeric_sentinels, string_sentinels)
    return {
        "uid": F.when(id_sentinels(F.col("uid")), "YELLOW")
        .otherwise("GREEN"),
        "amount": F.when(numeric_sentinels(F.col("amount")), "YELLOW")
        .otherwise("GREEN"),
        "label": F.when(string_sentinels(F.col("label")), "YELLOW")
        .otherwise("GREEN"),
    }


def _write_sent_batch(spark, rows, path):
    raw = spark.createDataFrame(
        rows, "ts string, uid long, amount double, label string")
    raw.select(F.to_timestamp("ts").alias("ts"), "uid", "amount",
               "label").coalesce(1).write.mode("append").parquet(path)


def test_streaming_sentinel_rules(spark, tmp_path):
    """The batch sentinel predicates (operators/sentinel.py) run
    UNCHANGED as streaming window rules — in-band placeholder values
    are flagged at ingest, per event-time window, instead of after the
    corpus lands."""
    src, chk, sink = (str(tmp_path / d) for d in ("src", "chk", "sink"))

    def run():
        stream = spark.readStream.schema(SENT_SCHEMA).parquet(src)
        out = streaming_windowed_verdicts(
            stream, _sentinel_rules(), event_time_col="ts",
            window_duration="1 minute", watermark="2 minutes")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    for rows in (SENT_BATCH1, SENT_BATCH2, SENT_BATCH3):
        _write_sent_batch(spark, rows, src)
        run()
    got = {r["window_start"].strftime("%H:%M"): r
           for r in spark.read.parquet(sink).collect()}
    m0 = got["00:00"]
    assert m0["n_rows"] == 3
    assert m0["n_yellow"] == 2          # rows 2 and 3 carry sentinels
    assert m0["verdict"] == "YELLOW"
    m1 = got["00:01"]
    assert m1["n_rows"] == 1 and m1["verdict"] == "GREEN"


def test_streaming_sentinel_rules_equal_batch(spark):
    """Batch/streaming unification: the same rule Columns evaluate on a
    plain frame with identical per-row verdicts."""
    from json_spark.streaming.validate import streaming_row_verdicts
    df = spark.createDataFrame(
        [(7, 10.0, "ok"), (-1, 5.0, "fine"), (8, 0.0, "N/A"),
         (99999999, -2.0, "null")],
        "uid long, amount double, label string")
    out = streaming_row_verdicts(df, _sentinel_rules()).collect()
    assert [r["row_verdict"] for r in out] == [
        "GREEN", "YELLOW", "YELLOW", "YELLOW"]
    assert out[3]["uid__verdict"] == "YELLOW"
    assert out[3]["amount__verdict"] == "YELLOW"
    assert out[3]["label__verdict"] == "YELLOW"


def test_streaming_dead_letter_routing(spark, tmp_path):
    """streaming_route: RED rows land in the dead-letter sink with
    payload + per-rule verdicts intact, in the same micro-batch; clean
    and tolerated rows continue to the main table. The streaming twin
    of the batch quarantine sink."""
    from json_spark.streaming.validate import streaming_route
    src = str(tmp_path / "src")
    _write_batch(spark, BATCH1, src)       # 1 RED, 2 YELLOW, 2 GREEN
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    kept, dead = streaming_route(
        stream, default_stream_rules(CFG, "raw_num", "raw_bool"))
    for df, name in ((kept, "kept"), (dead, "dead")):
        q = (df.writeStream.format("parquet")
             .option("path", str(tmp_path / name))
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    dead_rows = spark.read.parquet(str(tmp_path / "dead")).collect()
    kept_rows = spark.read.parquet(str(tmp_path / "kept")).collect()
    assert len(dead_rows) == 1 and len(kept_rows) == 4
    assert dead_rows[0]["raw_num"] == "not-a-number"   # payload intact
    assert dead_rows[0]["raw_num__verdict"] == "RED"   # triage carries WHY
    assert all(r["row_verdict"] != "RED" for r in kept_rows)


def test_streaming_type_profile(spark, tmp_path):
    """A producer that flips a key's value type mid-stream surfaces as
    a new (window, key, type) row in the micro-batch where it starts —
    the ingest-time twin of the batch key_type_drift check."""
    from json_spark.streaming.validate import streaming_type_profile
    src, sink, chk = (str(tmp_path / d) for d in ("tsrc", "tsink", "tchk"))
    schema = "ts timestamp, k string, val string"

    def write(rows):
        spark.createDataFrame(rows, "ts string, k string, val string") \
            .select(F.to_timestamp("ts").alias("ts"), "k", "val") \
            .coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_type_profile(stream, "k", "val")
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # minute 0: price is numeric; minute 1: the producer stringifies it
    write([("2026-01-01 00:00:05", "price", "12"),
           ("2026-01-01 00:00:15", "price", "13"),
           ("2026-01-01 00:01:10", "price", '"14"'),
           ("2026-01-01 00:01:20", "price", "15")])
    run()
    write([("2026-01-01 00:04:00", "price", "16")])
    run()
    write([("2026-01-01 00:07:00", "price", "17")])
    run()
    rows = {(r["window_start"].strftime("%H:%M"), r["jtype"]): r["n"]
            for r in spark.read.parquet(sink).collect()}
    assert rows[("00:00", "integer")] == 2
    assert rows[("00:01", "integer")] == 1
    assert rows[("00:01", "string")] == 1     # the flip, visible at once
    assert ("00:00", "string") not in rows
