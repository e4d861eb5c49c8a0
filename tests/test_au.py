"""Sun AU container codec (functions/au.py) + its engine wiring.

The third real container: big-endian PCM16, so it exercises the
byte-order half of both the pure-Column header surgery (be_uint) and
the Arrow decode kernel. Mirrors tests/test_flac.py's coverage shape.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
from json_spark.functions.au import (
    AU_DATA_OFFSET,
    AU_SIZE_UNKNOWN,
    decode_au,
    encode_au,
    parse_au_header,
)


def _ints(clip_id: str, sr: int, dur_ms: int) -> np.ndarray:
    sig = reference_signal(clip_id, sr, dur_ms)
    return np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int16)


def test_header_fields():
    ints = _ints("clip-au", 22050, 137)
    blob = encode_au(ints, 22050)
    assert blob[:4] == b".snd"
    hdr = parse_au_header(blob)
    assert hdr["data_offset"] == AU_DATA_OFFSET
    assert hdr["data_size"] == 2 * len(ints)
    assert hdr["encoding"] == 3
    assert hdr["sample_rate"] == 22050
    assert hdr["channels"] == 1
    # payload really is big-endian int16
    assert blob[AU_DATA_OFFSET:AU_DATA_OFFSET + 2] == struct.pack(
        ">h", int(ints[0]))


@pytest.mark.parametrize("sr,dur", [(8000, 100), (44100, 137), (16000, 1),
                                    (48000, 200)])
def test_roundtrip_bit_exact(sr, dur):
    ints = _ints(f"clip-{sr}-{dur}", sr, dur)
    sig, sr2 = decode_au(encode_au(ints, sr))
    assert sr2 == sr
    assert np.array_equal(np.round(sig * 32767.0).astype(np.int16), ints)


def test_container_size_closed_form():
    # the au_header_integrity / audio_au_snr oracle byte formula:
    # 28-byte header + 2 bytes/sample
    for n in (1, 7, 4096, 10_000):
        ints = np.zeros(n, dtype=np.int16)
        assert len(encode_au(ints, 16000)) == 28 + 2 * n


def test_unknown_size_sentinel_decodes_to_end():
    ints = _ints("clip-sentinel", 8000, 50)
    blob = bytearray(encode_au(ints, 8000))
    blob[8:12] = struct.pack(">I", AU_SIZE_UNKNOWN)
    sig, sr = decode_au(bytes(blob))
    assert sr == 8000
    assert np.array_equal(np.round(sig * 32767.0).astype(np.int16), ints)


def test_malformed_rejected():
    ints = _ints("clip-bad", 8000, 50)
    good = encode_au(ints, 8000)
    with pytest.raises(ValueError):            # foreign magic
        decode_au(b"RIFF" + good[4:])
    with pytest.raises(ValueError):            # truncated vs declared size
        decode_au(good[:-4])
    bad_enc = bytearray(good)
    bad_enc[12:16] = struct.pack(">I", 2)      # 8-bit linear: unsupported
    # (encoding 1, G.711 mu-law, graduated from unsupported to a real
    # decode path — tests/test_ulaw.py covers it)
    with pytest.raises(ValueError):
        decode_au(bytes(bad_enc))
    bad_ch = bytearray(good)
    bad_ch[20:24] = struct.pack(">I", 2)       # stereo: unsupported
    with pytest.raises(ValueError):
        decode_au(bytes(bad_ch))
    with pytest.raises(ValueError):            # header shorter than 24
        decode_au(good[:20])


def test_snr_invariant_over_au(spark):
    """The fused PCM kernel decodes AU with no caller-side dispatch:
    clean clips GREEN at quantization-noise SNR, a payload whose header
    is sound but whose samples were overwritten goes RED."""
    from pyspark.sql import functions as F

    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import transcode_au
    from json_spark.operators.snr import snr_check

    clips = generate_clips(spark, 64, partitions=4)
    au = transcode_au(clips)

    # lie about the sample rate in the header (bytes 17-20, big-endian):
    # the payload still decodes, but the reference regenerates at the
    # header's rate, so the SNR collapses => RED
    lie = struct.pack(">I", 3333)
    wrecked = au.withColumn(
        "bytes",
        F.when(F.crc32(F.col("clip_id").cast("binary")) % 8 == 0,
               F.concat(F.substring("bytes", 1, 16), F.lit(lie),
                        F.expr("substring(bytes, 21, length(bytes) - 20)")))
        .otherwise(F.col("bytes")))
    out = {r["clip_id"]: r for r in snr_check(wrecked).collect()}
    assert len(out) == 64
    import zlib
    n_red = 0
    for cid, r in out.items():
        if zlib.crc32(cid.encode()) % 8 == 0:
            assert r["verdict"] == "RED"
            n_red += 1
        else:
            assert r["verdict"] == "GREEN" and r["snr_db"] > 30.0
    assert n_red > 0


def test_au_header_columns_pure_column(spark):
    """The be_uint header parse agrees with the struct parse, and the
    plan holds zero Python stages past the fixture/transcode sources."""
    from pyspark.sql import functions as F

    from json_spark.operators.multimodal import au_header_columns

    ints = _ints("clip-cols", 44100, 73)
    good = encode_au(ints, 44100)
    trunc = good[:-6]
    stereo = bytearray(good)
    stereo[20:24] = struct.pack(">I", 2)
    df = spark.createDataFrame(
        [("g", bytearray(good)), ("t", bytearray(trunc)),
         ("s", bytearray(stereo)), ("x", bytearray(b"\x01" * 64))],
        "clip_id string, bytes binary")
    hdr = au_header_columns(F.col("bytes"))
    rows = {r["clip_id"]: r for r in df.select(
        "clip_id", hdr["au_ok"].alias("ok"),
        hdr["data_offset"].alias("off"), hdr["data_bytes"].alias("db"),
        hdr["hdr_sr_hz"].alias("sr"), hdr["channels"].alias("ch")).collect()}
    assert rows["g"]["ok"] and rows["g"]["off"] == AU_DATA_OFFSET
    assert rows["g"]["db"] == 2 * len(ints) and rows["g"]["sr"] == 44100
    # truncation is invisible to the header alone (verdict layer catches
    # it via length(bytes) == offset + data_bytes)
    assert rows["t"]["ok"] and rows["t"]["db"] == 2 * len(ints)
    assert not rows["s"]["ok"] and rows["s"]["ch"] == 2
    assert not rows["x"]["ok"]


def test_mixed_three_container_dispatch(spark):
    """container_header_verdicts now dispatches WAV + FLAC + AU per row
    in one pure-Column CASE."""
    from pyspark.sql import functions as F

    from json_spark.functions.flac import encode_flac
    from json_spark.operators.multimodal import container_header_verdicts

    ints = _ints("mix3-clip", 8000, 100)
    wav_good = pcm16_wav_bytes(ints.astype(np.float32) / 32767.0, 8000)
    flac_good = bytes(encode_flac(ints, 8000))
    au_good = encode_au(ints, 8000)
    au_srlie = encode_au(ints, 16000)
    au_trunc = au_good[:-4]
    df = spark.createDataFrame(
        [("w", bytearray(wav_good), 8000),
         ("f", bytearray(flac_good), 8000),
         ("a", bytearray(au_good), 8000),
         ("al", bytearray(au_srlie), 8000),
         ("at", bytearray(au_trunc), 8000),
         ("g", bytearray(b"\x00" * 100), 8000)],
        "clip_id string, bytes binary, sr_hz int")
    v = container_header_verdicts()
    rows = {r["clip_id"]: r for r in df.select(
        "clip_id", v["bytes"].alias("vb"), v["sr_hz"].alias("vs")).collect()}
    assert (rows["w"]["vb"], rows["w"]["vs"]) == ("GREEN", "GREEN")
    assert (rows["f"]["vb"], rows["f"]["vs"]) == ("GREEN", "GREEN")
    assert (rows["a"]["vb"], rows["a"]["vs"]) == ("GREEN", "GREEN")
    assert (rows["al"]["vb"], rows["al"]["vs"]) == ("GREEN", "YELLOW")
    assert (rows["at"]["vb"], rows["at"]["vs"]) == ("RED", "GREEN")
    assert (rows["g"]["vb"], rows["g"]["vs"]) == ("RED", "RED")


def test_media_meta_recognizes_au(spark):
    from json_spark.operators.multimodal import extract_media_meta

    ints = _ints("meta-au", 16000, 80)
    df = spark.createDataFrame(
        [("a", bytearray(encode_au(ints, 16000)))],
        "clip_id string, bytes binary")
    row = extract_media_meta(df).collect()[0]
    assert row["container"] == "au"
    assert row["sr_hz"] == 16000 and row["channels"] == 1
    assert row["bits"] == 16 and row["n_samples"] == len(ints)
    assert abs(row["meta_dur_ms"] - 1000.0 * len(ints) / 16000) < 1e-9


@pytest.mark.parametrize("n", [1, 63, 800])
def test_property_roundtrip_any_signal(n):
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    @settings(max_examples=25, deadline=None)
    @given(st.integers(-32767, 32767), st.integers(0, 2**31 - 1))
    def prop(fill, sr):
        ints = np.full(n, fill, dtype=np.int16)
        sig, sr2 = decode_au(encode_au(ints, sr))
        assert sr2 == sr
        assert np.array_equal(
            np.round(sig * 32767.0).astype(np.int16), ints)

    prop()


def test_streaming_mixed_three_containers(spark, tmp_path):
    """One streaming rule surface for a WAV+FLAC+AU ingest: the
    magic-dispatched container_header_verdicts dict drops into
    streaming_windowed_verdicts unchanged, and each container's
    GREEN/YELLOW/RED semantics survive the stream."""
    from pyspark.sql import functions as F

    from json_spark.functions.flac import encode_flac
    from json_spark.operators.multimodal import container_header_verdicts
    from json_spark.streaming.validate import streaming_windowed_verdicts

    ints = _ints("s3-clip", 8000, 100)
    wav = pcm16_wav_bytes(ints.astype(np.float32) / 32767.0, 8000)
    flac = bytes(encode_flac(ints, 8000))
    au = encode_au(ints, 8000)
    au_lie = encode_au(ints, 16000)
    au_trunc = au[:-4]
    schema = "ts timestamp, codec string, bytes binary, sr_hz int"
    src, sink, chk = (str(tmp_path / d) for d in ("3src", "3sink", "3chk"))

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, codec string, bytes binary, sr_hz int"
        ).select(F.to_timestamp("ts").alias("ts"), "codec", "bytes",
                 "sr_hz").coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_windowed_verdicts(
            stream, container_header_verdicts(), event_time_col="ts",
            window_duration="1 minute", watermark="2 minutes",
            partition_cols=["codec"])
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    write([("2026-01-01 00:00:05", "mix", bytearray(wav), 8000),
           ("2026-01-01 00:00:10", "mix", bytearray(flac), 8000),
           ("2026-01-01 00:00:15", "mix", bytearray(au), 8000),
           ("2026-01-01 00:00:20", "mix", bytearray(au_lie), 8000),
           ("2026-01-01 00:00:25", "mix", bytearray(au_trunc), 8000),
           ("2026-01-01 00:00:30", "mix", bytearray(b"\x00" * 64), 8000)])
    run()
    write([("2026-01-01 00:02:30", "mix", bytearray(wav), 8000)])
    run()
    write([("2026-01-01 00:04:00", "mix", bytearray(wav), 8000)])
    run()

    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    w0 = rows["00:00"]
    assert w0["n_rows"] == 6
    # wav + flac + au GREEN; au sample-rate lie YELLOW;
    # truncated au + garbage RED
    assert w0["n_green"] == 3
    assert w0["n_yellow"] == 1
    assert w0["n_red"] == 2
    assert w0["verdict"] == "RED"
