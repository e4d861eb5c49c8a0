"""Real FLAC container codec (functions/flac.py) + its engine wiring.

The VERDICT-r2 stretch: make a second container honest — flac payloads
must decode for real (``decoded=true``), not via the deterministic fake.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
from json_spark.functions.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    parse_flac_streaminfo,
)


def _ints(clip_id: str, sr: int, dur_ms: int) -> np.ndarray:
    sig = reference_signal(clip_id, sr, dur_ms)
    return np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int16)


def test_crc_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 (init 0) published vectors
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_streaminfo_fields():
    ints = _ints("clip-si", 22050, 137)
    blob = encode_flac(ints, 22050, block_size=1024)
    assert blob[:4] == b"fLaC"
    si = parse_flac_streaminfo(blob)
    assert si["sr_hz"] == 22050
    assert si["channels"] == 1 and si["bits"] == 16
    assert si["n_samples"] == len(ints)
    assert si["min_block"] == si["max_block"] == 1024
    assert si["md5"] == hashlib.md5(ints.astype("<i2").tobytes()).digest()


@pytest.mark.parametrize("sr,dur,block", [
    (8000, 100, 4096), (44100, 137, 1024), (16000, 1, 4096),
    (48000, 200, 192),
])
def test_roundtrip_bit_exact(sr, dur, block):
    ints = _ints(f"clip-{sr}-{dur}", sr, dur)
    blob = encode_flac(ints, sr, block_size=block)
    sig, sr2 = decode_flac(blob)
    assert sr2 == sr
    assert np.array_equal(np.round(sig * 32767.0).astype(np.int16), ints)


def test_container_size_closed_form():
    # the audio_flac_roundtrip oracle's byte formula:
    # 42 + 11 * ceil(n/4096) + 2*n for the default block size
    for n in (1, 100, 4096, 4097, 30000):
        ints = np.arange(n, dtype=np.int16)
        blob = encode_flac(ints, 16000)
        assert len(blob) == 42 + 11 * ((n + 4095) // 4096) + 2 * n


def test_every_corruption_detected():
    ints = _ints("clip-corrupt", 8000, 150)
    blob = bytearray(encode_flac(ints, 8000, block_size=512))
    frames_at = parse_flac_streaminfo(bytes(blob))["frames_at"]
    # flip one bit at every frame-region offset: CRC-8 covers headers,
    # CRC-16 covers frames, MD5 covers the reassembled stream
    for off in range(frames_at, len(blob)):
        bad = bytearray(blob)
        bad[off] ^= 0x01
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))


def test_md5_covers_metadata_tamper():
    ints = _ints("clip-md5", 8000, 80)
    blob = bytearray(encode_flac(ints, 8000))
    blob[26] ^= 0xFF  # a byte inside the STREAMINFO MD5 field
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_not_flac_rejected():
    with pytest.raises(ValueError):
        parse_flac_streaminfo(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        decode_flac(pcm16_wav_bytes(reference_signal("x", 8000, 50), 8000))


def test_flac_rows_decode_for_real(spark):
    # golden: a clips frame whose codec='flac' rows carry REAL FLAC bytes
    # → audio_features decodes them (decoded=true) with the right RMS, and
    # extract_media_meta reads the STREAMINFO header without a full decode
    from json_spark.operators.multimodal import audio_features, extract_media_meta

    rows = []
    for i in range(8):
        cid = f"flacclip-{i:03d}"
        sr = [8000, 16000][i % 2]
        ints = _ints(cid, sr, 120)
        rows.append((cid, bytes(encode_flac(ints, sr)), sr, 120, "flac", "t"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")

    feats = {r["clip_id"]: r for r in audio_features(df).collect()}
    assert len(feats) == 8
    for r in feats.values():
        assert r["decoded"] is True  # the real FLAC path, not the fake
        assert 0.376 <= r["rms"] <= 0.385  # generator clean-RMS band

    meta = {r["clip_id"]: r for r in extract_media_meta(df).collect()}
    for i in range(8):
        m = meta[f"flacclip-{i:03d}"]
        sr = [8000, 16000][i % 2]
        assert m["container"] == "flac"
        assert m["sr_hz"] == sr and m["bits"] == 16 and m["channels"] == 1
        assert m["n_samples"] == max(1, sr * 120 // 1000)


def test_flac_roundtrip_stage(spark):
    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import flac_roundtrip

    clips = generate_clips(spark, 64, partitions=4)
    out = flac_roundtrip(clips).collect()
    assert len(out) == 64
    assert all(r["decoded"] and r["bit_exact"] for r in out)
    for r in out:
        n = r["n_samples"]
        assert r["flac_bytes"] == 42 + 11 * ((n + 4095) // 4096) + 2 * n


# ---------------------------------------------------------------------------
# property tests (hypothesis): arbitrary int16 signals, block sizes, rates
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        samples=st.lists(st.integers(min_value=-32768, max_value=32767),
                         min_size=0, max_size=5000),
        block=st.sampled_from([1, 7, 192, 256, 1024, 4096]),
        sr=st.sampled_from([8000, 22050, 44100, 96000]),
    )
    def test_property_roundtrip_any_signal(samples, block, sr):
        ints = np.asarray(samples, dtype=np.int16)
        blob = encode_flac(ints, sr, block_size=block)
        sig, sr2 = decode_flac(blob)
        assert sr2 == sr
        assert np.array_equal(np.round(sig * 32767.0).astype(np.int16), ints)
        si = parse_flac_streaminfo(blob)
        assert si["n_samples"] == len(ints)

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=3000),
        flip=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_property_frame_corruption_detected(n, flip):
        ints = (np.arange(n, dtype=np.int64) * 2654435761 % 65536
                - 32768).astype(np.int16)
        blob = bytearray(encode_flac(ints, 16000, block_size=512))
        frames_at = parse_flac_streaminfo(bytes(blob))["frames_at"]
        off = frames_at + flip % (len(blob) - frames_at)
        blob[off] ^= 1 << (flip % 8)
        with pytest.raises(ValueError):
            decode_flac(bytes(blob))
except ImportError:  # pragma: no cover
    pass


def test_flac_header_columns_pure_column(spark):
    # zero-Python STREAMINFO reads: fields recovered by byte surgery match
    # the encoder, and corrupt/truncated containers are classified RED
    from pyspark.sql import functions as F
    from json_spark.operators.multimodal import (
        flac_header_columns,
        flac_header_verdicts,
    )

    ints = _ints("col-clip", 22050, 90)
    good = bytes(encode_flac(ints, 22050))
    sr_lie = bytes(encode_flac(ints, 44100))     # header says 44100
    truncated = good[: 42 + len(ints)]           # half the verbatim bytes
    not_flac = b"RIFFxxxxWAVE" + b"\x00" * 64
    df = spark.createDataFrame(
        [("good", bytearray(good), 22050),
         ("srlie", bytearray(sr_lie), 22050),
         ("trunc", bytearray(truncated), 22050),
         ("notflac", bytearray(not_flac), 22050)],
        "clip_id string, bytes binary, sr_hz int")

    hdr = flac_header_columns(F.col("bytes"))
    rows = {r["clip_id"]: r for r in df.select(
        "clip_id", hdr["flac_ok"].alias("ok"),
        hdr["hdr_sr_hz"].alias("sr"), hdr["channels"].alias("ch"),
        hdr["bits"].alias("bits"), hdr["n_samples"].alias("n")).collect()}
    assert rows["good"]["ok"] and rows["good"]["sr"] == 22050
    assert rows["good"]["ch"] == 1 and rows["good"]["bits"] == 16
    assert rows["good"]["n"] == len(ints)
    assert rows["srlie"]["sr"] == 44100
    assert rows["trunc"]["ok"]            # header intact; length rule catches it
    assert not rows["notflac"]["ok"]

    v = flac_header_verdicts()
    verd = {r["clip_id"]: r for r in df.select(
        "clip_id", v["bytes"].alias("vb"), v["sr_hz"].alias("vs")).collect()}
    assert (verd["good"]["vb"], verd["good"]["vs"]) == ("GREEN", "GREEN")
    assert (verd["srlie"]["vb"], verd["srlie"]["vs"]) == ("GREEN", "YELLOW")
    assert verd["trunc"]["vb"] == "RED"
    assert (verd["notflac"]["vb"], verd["notflac"]["vs"]) == ("RED", "RED")


def test_streaming_flac_header_verdicts(spark, tmp_path):
    """The FLAC container rules run unchanged as streaming rules — the
    second container shares the WAV twin's streaming surface."""
    from pyspark.sql import functions as F
    from json_spark.operators.multimodal import flac_header_verdicts
    from json_spark.streaming.validate import streaming_windowed_verdicts

    ints = _ints("s-clip", 8000, 100)
    good = bytes(encode_flac(ints, 8000))
    sr_lie = bytes(encode_flac(ints, 16000))
    truncated = good[:60]
    schema = "ts timestamp, codec string, bytes binary, sr_hz int"
    src, sink, chk = (str(tmp_path / d) for d in ("fsrc", "fsink", "fchk"))

    def write(rows):
        spark.createDataFrame(
            rows, "ts string, codec string, bytes binary, sr_hz int"
        ).select(F.to_timestamp("ts").alias("ts"), "codec", "bytes", "sr_hz"
                 ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_windowed_verdicts(
            stream, flac_header_verdicts(), event_time_col="ts",
            window_duration="1 minute", watermark="2 minutes",
            partition_cols=["codec"])
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    write([("2026-01-01 00:00:05", "flac", bytearray(good), 8000),
           ("2026-01-01 00:00:15", "flac", bytearray(sr_lie), 8000),
           ("2026-01-01 00:00:25", "flac", bytearray(truncated), 8000)])
    run()
    # later batches advance the watermark so the 00:00 window finalizes
    write([("2026-01-01 00:02:30", "flac", bytearray(good), 8000)])
    run()
    write([("2026-01-01 00:04:00", "flac", bytearray(good), 8000)])
    run()

    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    w0 = rows["00:00"]
    assert w0["n_rows"] == 3
    assert w0["n_green"] == 1
    assert w0["n_yellow"] == 1     # sample-rate lie: recoverable
    assert w0["n_red"] == 1        # truncated payload
    assert w0["verdict"] == "RED"


def test_snr_invariant_container_agnostic(spark):
    """The suite's SNR>=30dB content invariant runs unchanged over FLAC
    containers: clean clips GREEN (bit-exact transcode => snr inf), a
    corrupted FLAC frame decodes to RED (checksum failure => null snr)."""
    from json_spark.operators.multimodal import transcode_flac
    from json_spark.operators.snr import snr_check
    from json_spark.fixtures.gen import generate_clips

    clips = generate_clips(spark, 64, partitions=4)
    fl = transcode_flac(clips)  # same clip_id/dur_ms contract, FLAC bytes

    def corrupt_some(df):
        from pyspark.sql import functions as F
        # flip one payload byte (a verbatim sample region) on 8 clips
        return df.withColumn(
            "bytes",
            F.when(F.crc32(F.col("clip_id").cast("binary")) % 8 == 0,
                   F.concat(F.substring("bytes", 1, 60),
                            F.lit(b"\xff"),
                            F.expr("substring(bytes, 62, "
                                   "length(bytes) - 61)")))
            .otherwise(F.col("bytes")))

    out = {r["clip_id"]: r for r in
           snr_check(corrupt_some(fl)).collect()}
    assert len(out) == 64
    n_red = 0
    for cid, r in out.items():
        import zlib
        if zlib.crc32(cid.encode()) % 8 == 0:
            assert r["verdict"] == "RED" and r["snr_db"] is None
            n_red += 1
        else:
            # i%997 corruption is noise INSIDE the samples: still decodes;
            # with only 64 rows none are planted-corrupt, so all GREEN
            assert r["verdict"] == "GREEN" and r["snr_db"] > 30.0
    assert n_red > 0


def test_mixed_container_dispatch(spark):
    """One rule surface for a mixed WAV+FLAC table: per-row magic-byte
    dispatch, pure Column (batch here; the same dict drops into
    streaming_windowed_verdicts unchanged)."""
    from pyspark.sql import functions as F
    from json_spark.operators.multimodal import container_header_verdicts

    ints = _ints("mix-clip", 8000, 100)
    wav_good = pcm16_wav_bytes(ints.astype(np.float32) / 32767.0, 8000)
    flac_good = bytes(encode_flac(ints, 8000))
    flac_srlie = bytes(encode_flac(ints, 16000))
    garbage = b"\x00" * 100
    df = spark.createDataFrame(
        [("w", bytearray(wav_good), 8000),
         ("f", bytearray(flac_good), 8000),
         ("fl", bytearray(flac_srlie), 8000),
         ("g", bytearray(garbage), 8000)],
        "clip_id string, bytes binary, sr_hz int")
    v = container_header_verdicts()
    rows = {r["clip_id"]: r for r in df.select(
        "clip_id", v["bytes"].alias("vb"), v["sr_hz"].alias("vs")).collect()}
    assert (rows["w"]["vb"], rows["w"]["vs"]) == ("GREEN", "GREEN")
    assert (rows["f"]["vb"], rows["f"]["vs"]) == ("GREEN", "GREEN")
    assert (rows["fl"]["vb"], rows["fl"]["vs"]) == ("GREEN", "YELLOW")
    assert (rows["g"]["vb"], rows["g"]["vs"]) == ("RED", "RED")
