"""IMA ADPCM codec (functions/adpcm.py) — the engine's first compressed
lossy codec: nibble-exactness of the lockstep-vectorized encoder against
an independent scalar reference, batch==per-clip byte identity, container
round-trips, the SNR gate through 4-bit quantization, and the fused
kernel's fifth container fall-through.
"""

from __future__ import annotations

import numpy as np
import pytest

from json_spark.fixtures.signal import reference_signal, snr_db
from json_spark.functions.adpcm import (
    BLOCK_ALIGN,
    INDEX_TABLE,
    SAMPLES_PER_BLOCK,
    STEP_TABLE,
    decode_adpcm_wav,
    decode_blocks,
    encode_adpcm_wav,
    encode_adpcm_wav_batch,
    encode_blocks,
)


def _scalar_encode_block(samples, index0):
    """Independent straight-line scalar IMA encoder (one sample at a
    time, per the public spec) — the golden twin for the vectorized
    lockstep kernel."""
    pred = int(samples[0])
    index = int(index0)
    codes = []
    for t in range(1, len(samples)):
        diff = int(samples[t]) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        step = int(STEP_TABLE[index])
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        # reconstruct
        mag = code & 7
        dq = (step >> 3) + (step if mag & 4 else 0) \
            + ((step >> 1) if mag & 2 else 0) + ((step >> 2) if mag & 1 else 0)
        pred = pred - dq if code & 8 else pred + dq
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(INDEX_TABLE[code])))
        codes.append(code)
    return codes


def test_vectorized_encoder_matches_scalar_reference():
    rng = np.random.default_rng(3)
    block = (rng.normal(0, 8000, SAMPLES_PER_BLOCK)
             .clip(-32768, 32767).astype(np.int16))
    pred0, index0, codes = encode_blocks(block.reshape(1, -1))
    want = _scalar_encode_block(block, int(index0[0]))
    assert codes[0].tolist() == want
    assert int(pred0[0]) == int(block[0])


def test_decode_inverts_encode_recurrence():
    """decode_blocks on the encoder's codes reproduces the encoder's
    internal predictor sequence exactly (shared integer recurrence)."""
    rng = np.random.default_rng(11)
    blocks = (rng.normal(0, 5000, (7, SAMPLES_PER_BLOCK))
              .clip(-32768, 32767).astype(np.int16))
    pred0, index0, codes = encode_blocks(blocks)
    out = decode_blocks(pred0, index0, codes)
    assert out.shape == blocks.shape
    # lossy, but bounded: worst-case error ~ one adapted step size
    assert np.abs(out.astype(np.int32) - blocks.astype(np.int32)).mean() < 2000


def test_container_roundtrip_length_sr_and_determinism():
    sig = reference_signal("clip-000000000005", 44100, 137)
    ints = np.round(sig.astype(np.float64) * 32767).astype(np.int16)
    wav = encode_adpcm_wav(ints, 44100)
    assert wav == encode_adpcm_wav(ints, 44100)  # bit-deterministic
    dec, sr = decode_adpcm_wav(wav)
    assert sr == 44100 and len(dec) == len(ints)  # fact-chunk truncation
    assert snr_db(sig, dec) > 30.0
    # 4.1:1 vs PCM16 once past header overhead
    assert len(wav) < 0.35 * (44 + 2 * len(ints))


def test_batch_encoder_bytes_identical_to_per_clip():
    clips = [("clip-000000000001", 48000, 150),
             ("clip-000000000042", 44100, 51),
             ("clip-000000000777", 44100, 200)]
    sigs, srs = [], []
    for cid, sr, dur in clips:
        s = reference_signal(cid, sr, dur)
        sigs.append(np.round(s.astype(np.float64) * 32767).astype(np.int16))
        srs.append(sr)
    batch = encode_adpcm_wav_batch(sigs, srs)
    single = [encode_adpcm_wav(s, sr) for s, sr in zip(sigs, srs)]
    assert batch == single


def test_rejects_foreign_payloads():
    from json_spark.fixtures.signal import pcm16_wav_bytes
    sig = reference_signal("clip-000000000009", 16000, 80)
    with pytest.raises(ValueError):
        decode_adpcm_wav(b"fLaC" + b"\x00" * 64)
    with pytest.raises(ValueError):   # PCM16 WAV: right magic, wrong fmt tag
        decode_adpcm_wav(pcm16_wav_bytes(sig, 16000))
    with pytest.raises(ValueError):
        decode_adpcm_wav(b"\x00" * 10)


def test_snr_gate_through_adpcm_clean_vs_corrupt():
    """Clean high-rate clips stay GREEN through 4-bit quantization;
    planted ±0.3 uniform noise stays RED — the verdict classifies
    through the lossy codec exactly as the plant arithmetic predicts."""
    cid = "clip-000000000123"
    sr, dur = 48000, 120
    ref = reference_signal(cid, sr, dur)
    ints = np.round(ref.astype(np.float64) * 32767).astype(np.int16)
    dec, _ = decode_adpcm_wav(encode_adpcm_wav(ints, sr))
    assert snr_db(ref, dec) >= 30.0
    rng = np.random.default_rng(99)
    noisy = np.clip(ref + rng.uniform(-0.3, 0.3, ref.shape)
                    .astype(np.float32), -1, 1)
    nints = np.round(noisy.astype(np.float64) * 32767).astype(np.int16)
    ndec, _ = decode_adpcm_wav(encode_adpcm_wav(nints, sr))
    assert snr_db(ref, ndec) < 30.0


def test_fused_kernel_fifth_container_fall_through(spark):
    """transcode_adpcm → pcm_scan end-to-end on Spark: every clean
    high-rate clip decodes through the ADPCM branch of the fused ladder
    and passes the gate; payloads shrink ~4x."""
    from pyspark.sql import functions as F

    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import transcode_adpcm
    from json_spark.operators.snr import pcm_scan

    clips = generate_clips(spark, 400, partitions=4) \
        .filter(F.col("codec") == "opus")
    n_in = clips.count()
    adpcm = transcode_adpcm(clips)
    scan = pcm_scan(adpcm, extra_cols=["codec"], emit_header=True)
    rows = scan.collect()
    assert len(rows) == n_in > 0
    greens = [r for r in rows if r["verdict"] == "GREEN"]
    # fixture plant: i % 997 == 996 corrupt rows are the only REDs
    assert len(greens) >= len(rows) - 1
    assert all(r["snr_db"] is not None and r["snr_db"] >= 30.0
               for r in greens)
    # compression: ADPCM payload ≈ block_align per 505 samples
    wav_bytes = {r["clip_id"]: r for r in rows}
    assert all(r["payload_len"] < BLOCK_ALIGN * 40 for r in rows)


def test_transcode_null_payload_passthrough(spark):
    """A null/undecodable payload survives the transcode as null bytes
    (the verdict surface downstream decides), not a task failure."""
    from json_spark.operators.multimodal import transcode_adpcm

    df = spark.createDataFrame(
        [("c1", None, 8000, 100, "opus", "t"),
         ("c2", b"garbage", 8000, 100, "opus", "t")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string")
    out = {r["clip_id"]: r["bytes"] for r in transcode_adpcm(df).collect()}
    assert out["c1"] is None and out["c2"] is None


def test_transcode_foreign_wav_passthrough(spark):
    """r4 ADVICE (multimodal.py:_pcm16_wav_ints): a VALID RIFF payload
    whose fmt tag is not PCM16 — e.g. an already-transcoded A-law WAV —
    must pass through the lossy transcodes as null bytes instead of
    being frombuffer'd and re-encoded as garbage."""
    import numpy as np

    from json_spark.functions.alaw import encode_alaw_wav
    from json_spark.operators.multimodal import (transcode_adpcm,
                                                 transcode_alaw)

    sig = (np.sin(np.arange(800) / 10.0) * 12000).astype(np.int16)
    alaw_wav = encode_alaw_wav(sig, 8000)
    assert alaw_wav[:4] == b"RIFF" and len(alaw_wav) > 44
    df = spark.createDataFrame(
        [("c1", alaw_wav, 8000, 100, "opus", "t")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string")
    for tr in (transcode_adpcm, transcode_alaw):
        rows = tr(df).collect()
        assert rows[0]["bytes"] is None, tr.__name__


def test_adpcm_header_columns_pure_column(spark):
    """The zero-Python header parse (multimodal.py:adpcm_header_columns)
    recovers exactly what the writer emitted: fmt tag 0x11, block
    geometry, the fact sample count, and the size law."""
    from pyspark.sql import functions as F

    from json_spark.operators.multimodal import adpcm_header_columns

    sig = reference_signal("clip-000000000021", 48000, 137)
    ints = np.round(sig.astype(np.float64) * 32767).astype(np.int16)
    wav = encode_adpcm_wav(ints, 48000)
    df = spark.createDataFrame([(bytearray(wav),)], "bytes binary")
    h = adpcm_header_columns(F.col("bytes"))
    r = df.select(h["riff_ok"].alias("ok"), h["fmt_tag"].alias("tag"),
                  h["hdr_sr_hz"].alias("sr"),
                  h["block_align"].alias("ba"),
                  h["samples_per_block"].alias("spb"),
                  h["fact_samples"].alias("n"),
                  h["data_bytes"].alias("db"),
                  F.length("bytes").alias("blen")).collect()[0]
    n_blocks = (len(ints) + SAMPLES_PER_BLOCK - 1) // SAMPLES_PER_BLOCK
    assert (r["ok"], r["tag"], r["sr"]) == (True, 0x11, 48000)
    assert (r["ba"], r["spb"]) == (BLOCK_ALIGN, SAMPLES_PER_BLOCK)
    assert r["n"] == len(ints)
    assert r["db"] == n_blocks * BLOCK_ALIGN
    assert r["blen"] == 60 + r["db"]


def test_streaming_content_verdicts_decode_adpcm(spark, tmp_path):
    """The streaming content surface decodes the COMPRESSED codec via
    the same fused kernel: a clean high-rate ADPCM payload is GREEN in
    its window, a wrong-signal ADPCM payload is RED — the fifth
    container needs no streaming-side changes at all."""
    from pyspark.sql import functions as F

    from json_spark.streaming import streaming_content_verdicts

    def adpcm_of(clip_id, sr=48000, dur=100):
        s = reference_signal(clip_id, sr, dur)
        return encode_adpcm_wav(
            np.round(s.astype(np.float64) * 32767).astype(np.int16), sr)

    good = adpcm_of("c-good")
    wrong_sig = adpcm_of("c-other")  # decodes fine, SNR vs c-good fails
    schema = ("ts timestamp, clip_id string, bytes binary, "
              "dur_ms int, codec string")
    src, sink, chk = (str(tmp_path / d) for d in ("asrc", "asink", "achk"))

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

    write([("2026-01-01 00:00:05", "c-good", bytearray(good), 100, "adpcm"),
           ("2026-01-01 00:00:15", "c-good", bytearray(wrong_sig), 100,
            "adpcm")])
    run()
    write([("2026-01-01 00:04:00", "c-good", bytearray(good), 100,
            "adpcm")])
    run()
    rows = {r["window_start"].strftime("%H:%M"): r
            for r in spark.read.parquet(sink).collect()}
    w0 = rows["00:00"]
    assert w0["n_rows"] == 2 and w0["n_green"] == 1 and w0["n_red"] == 1
