"""One streaming rule surface for a WAV+FLAC+AU+AIFF+µ-law ingest: the
four-way magic-dispatched container_header_verdicts dict drops into
streaming_windowed_verdicts unchanged — the session-3 twin of
tests/test_au.py::test_streaming_mixed_three_containers with the fourth
container and the lossy AU payload in the same window."""

import numpy as np
from pyspark.sql import functions as F

from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
from json_spark.functions.aiff import encode_aiff, encode_f80
from json_spark.functions.au import AU_ENCODING_ULAW, encode_au
from json_spark.functions.flac import encode_flac


def _ints(clip_id: str, sr: int, dur_ms: int) -> np.ndarray:
    sig = reference_signal(clip_id, sr, dur_ms)
    return np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int16)


def test_streaming_mixed_four_containers(spark, tmp_path):
    from json_spark.operators.multimodal import container_header_verdicts
    from json_spark.streaming.validate import streaming_windowed_verdicts

    ints = _ints("s4-clip", 8000, 100)
    wav = pcm16_wav_bytes(ints.astype(np.float32) / 32767.0, 8000)
    flac = bytes(encode_flac(ints, 8000))
    au = encode_au(ints, 8000)
    ulaw = encode_au(ints, 8000, encoding=AU_ENCODING_ULAW)
    aiff = encode_aiff(ints, 8000)
    # f80 sample-rate lie: container sound, metadata contradicts -> YELLOW
    aiff_lie = (aiff[:28] + encode_f80(16000) + aiff[38:])
    aiff_trunc = aiff[:-4]
    schema = "ts timestamp, codec string, bytes binary, sr_hz int"
    src, sink, chk = (str(tmp_path / d) for d in ("4src", "4sink", "4chk"))

    rows = [("2026-01-01 00:00:05", "mix", bytearray(wav), 8000),
            ("2026-01-01 00:00:10", "mix", bytearray(flac), 8000),
            ("2026-01-01 00:00:15", "mix", bytearray(au), 8000),
            ("2026-01-01 00:00:20", "mix", bytearray(ulaw), 8000),
            ("2026-01-01 00:00:25", "mix", bytearray(aiff), 8000),
            ("2026-01-01 00:00:30", "mix", bytearray(aiff_lie), 8000),
            ("2026-01-01 00:00:35", "mix", bytearray(aiff_trunc), 8000),
            ("2026-01-01 00:00:40", "mix", bytearray(b"\x00" * 64), 8000)]
    spark.createDataFrame(
        rows, "ts string, codec string, bytes binary, sr_hz int"
    ).select(F.to_timestamp("ts").alias("ts"), "codec", "bytes",
             "sr_hz").coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_windowed_verdicts(
        stream, container_header_verdicts(), event_time_col="ts",
        window_duration="1 minute", watermark="2 minutes",
        partition_cols=["codec"])
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # advance the watermark so the 00:00 window closes
    spark.createDataFrame(
        [("2026-01-01 00:04:00", "mix", bytearray(wav), 8000)],
        "ts string, codec string, bytes binary, sr_hz int"
    ).select(F.to_timestamp("ts").alias("ts"), "codec", "bytes",
             "sr_hz").coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_windowed_verdicts(
        stream, container_header_verdicts(), event_time_col="ts",
        window_duration="1 minute", watermark="2 minutes",
        partition_cols=["codec"])
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["window_start"].strftime("%H:%M"): r
           for r in spark.read.parquet(sink).collect()}
    w0 = got["00:00"]
    assert w0["n_rows"] == 8
    # wav + flac + au-pcm16 + au-ulaw + aiff GREEN; f80 lie YELLOW;
    # truncated aiff + garbage RED
    assert w0["n_green"] == 5
    assert w0["n_yellow"] == 1
    assert w0["n_red"] == 2
