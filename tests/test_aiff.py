"""AIFF container codec (functions/aiff.py) + its engine wiring.

The fourth real container: IFF tagged chunks with an 80-bit
extended-float sample rate, so it exercises chunk walking and the
long-arithmetic f80 decode in the pure-Column header path. Mirrors
tests/test_au.py's coverage shape.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from json_spark.fixtures.signal import reference_signal
from json_spark.functions.aiff import (
    AIFF_HEADER_BYTES,
    decode_aiff,
    decode_f80,
    encode_aiff,
    encode_f80,
    parse_aiff_header,
)


def _ints(clip_id: str, sr: int, dur_ms: int) -> np.ndarray:
    sig = reference_signal(clip_id, sr, dur_ms)
    return np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int16)


def test_f80_roundtrip_exhaustive_rates():
    for sr in (1, 2, 3, 8000, 11025, 16000, 22050, 44100, 48000,
               96000, 192000, 2**31 - 1, 2**62):
        assert decode_f80(encode_f80(sr)) == sr
    # the canonical 44100 encoding from the AIFF spec appendix
    assert encode_f80(44100) == bytes.fromhex("400EAC44000000000000")


def test_f80_rejects_non_integer_and_negative():
    with pytest.raises(ValueError):
        decode_f80(bytes.fromhex("C00EAC44000000000000"))  # sign bit
    with pytest.raises(ValueError):
        decode_f80(bytes.fromhex("400EAC44000000000001"))  # fraction
    with pytest.raises(ValueError):
        encode_f80(0)


def test_header_fields():
    ints = _ints("clip-aiff", 22050, 137)
    blob = encode_aiff(ints, 22050)
    assert blob[:4] == b"FORM" and blob[8:12] == b"AIFF"
    hdr = parse_aiff_header(blob)
    assert hdr["channels"] == 1 and hdr["sample_size"] == 16
    assert hdr["n_frames"] == len(ints)
    assert hdr["sample_rate"] == 22050
    assert hdr["ssnd_start"] == AIFF_HEADER_BYTES
    assert hdr["ssnd_bytes"] == 2 * len(ints)
    # payload really is big-endian int16
    assert blob[54:56] == struct.pack(">h", int(ints[0]))


@pytest.mark.parametrize("sr,dur", [(8000, 100), (44100, 137), (16000, 1),
                                    (48000, 200)])
def test_roundtrip_bit_exact(sr, dur):
    ints = _ints(f"clip-{sr}-{dur}", sr, dur)
    sig, sr2 = decode_aiff(encode_aiff(ints, sr))
    assert sr2 == sr
    assert np.array_equal(np.round(sig * 32767.0).astype(np.int16), ints)


def test_container_size_closed_form():
    # the aiff_header_integrity oracle byte formula: 54 + 2 bytes/sample
    for n in (1, 7, 4096, 10_000):
        ints = np.zeros(n, dtype=np.int16)
        assert len(encode_aiff(ints, 16000)) == 54 + 2 * n


def test_foreign_chunk_order_still_decodes():
    """IFF chunks are order-free: a writer that puts SSND before COMM
    must still decode (the Python parser walks; only the pure-Column
    path assumes the canonical layout)."""
    ints = np.array([5, -6, 7], np.int16)
    blob = encode_aiff(ints, 8000)
    comm, ssnd = blob[12:38], blob[38:]
    reord = (b"FORM" + struct.pack(">I", len(blob) - 8) + b"AIFF"
             + ssnd + comm)
    sig, sr = decode_aiff(reord)
    assert sr == 8000
    assert np.array_equal(np.round(sig * 32767.0).astype(np.int16), ints)


def test_malformed_rejected():
    ints = _ints("clip-bad", 8000, 50)
    good = encode_aiff(ints, 8000)
    with pytest.raises(ValueError):
        decode_aiff(good[:-2])          # truncated payload
    with pytest.raises(ValueError):
        parse_aiff_header(b"RIFF" + good[4:])  # wrong magic
    with pytest.raises(ValueError):
        parse_aiff_header(good[:30])    # missing SSND
    stereo = bytearray(good)
    stereo[20:22] = struct.pack(">H", 2)
    with pytest.raises(ValueError):
        decode_aiff(bytes(stereo))      # non-mono


def test_snr_invariant_over_aiff(spark):
    """The fused PCM kernel decodes AIFF as the fourth fall-through: a
    header whose f80 sample rate lies decodes but collapses the SNR."""
    from pyspark.sql import functions as F

    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import transcode_aiff
    from json_spark.operators.snr import snr_check

    clips = generate_clips(spark, 64, partitions=4)
    aiff = transcode_aiff(clips)
    lie = encode_f80(3333)
    wrecked = aiff.withColumn(
        "bytes",
        F.when(F.crc32(F.col("clip_id").cast("binary")) % 8 == 0,
               F.concat(F.substring("bytes", 1, 28), F.lit(lie),
                        F.expr("substring(bytes, 39, length(bytes) - 38)")))
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


def test_aiff_header_columns_pure_column(spark):
    """The be_uint + exact power-of-two division header parse agrees
    with the struct/f80 parse on every real sample rate."""
    from pyspark.sql import functions as F

    from json_spark.operators.multimodal import aiff_header_columns

    rows_in = []
    for sr in (8000, 11025, 16000, 22050, 44100, 48000, 192000):
        ints = _ints(f"clip-{sr}", sr, 73)
        rows_in.append((f"sr{sr}", bytearray(encode_aiff(ints, sr)),
                        sr, len(ints)))
    stereo = bytearray(encode_aiff(_ints("st", 8000, 50), 8000))
    stereo[20:22] = struct.pack(">H", 2)
    rows_in += [("stereo", stereo, 8000, 0),
                ("junk", bytearray(b"\x01" * 64), 0, 0)]
    df = spark.createDataFrame(
        [r[:2] for r in rows_in], "clip_id string, bytes binary")
    hdr = aiff_header_columns(F.col("bytes"))
    got = {r["clip_id"]: r for r in df.select(
        "clip_id", hdr["aiff_ok"].alias("ok"),
        hdr["hdr_sr_hz"].alias("sr"), hdr["n_frames"].alias("nf"),
        hdr["ssnd_bytes"].alias("sb")).collect()}
    for cid, _b, sr, nf in rows_in:
        if cid.startswith("sr"):
            assert got[cid]["ok"] and got[cid]["sr"] == sr
            assert got[cid]["nf"] == nf and got[cid]["sb"] == 2 * nf
    assert not got["stereo"]["ok"]
    assert not got["junk"]["ok"]


def test_mixed_four_container_dispatch(spark):
    """container_header_verdicts dispatches WAV + FLAC + AU + AIFF per
    row in one pure-Column CASE."""
    from pyspark.sql import functions as F

    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.functions.au import encode_au
    from json_spark.functions.flac import encode_flac
    from json_spark.operators.multimodal import container_header_verdicts

    ints = _ints("mix4-clip", 8000, 100)
    aiff_good = encode_aiff(ints, 8000)
    aiff_srlie = encode_aiff(ints, 16000)
    aiff_trunc = aiff_good[:-4]
    df = spark.createDataFrame(
        [("w", bytearray(pcm16_wav_bytes(
            ints.astype(np.float32) / 32767.0, 8000)), 8000),
         ("f", bytearray(bytes(encode_flac(ints, 8000))), 8000),
         ("a", bytearray(encode_au(ints, 8000)), 8000),
         ("i", bytearray(aiff_good), 8000),
         ("il", bytearray(aiff_srlie), 8000),
         ("it", bytearray(aiff_trunc), 8000),
         ("g", bytearray(b"\x00" * 100), 8000)],
        "clip_id string, bytes binary, sr_hz int")
    v = container_header_verdicts()
    rows = {r["clip_id"]: r for r in df.select(
        "clip_id", v["bytes"].alias("vb"), v["sr_hz"].alias("vs")).collect()}
    for cid in ("w", "f", "a", "i"):
        assert (rows[cid]["vb"], rows[cid]["vs"]) == ("GREEN", "GREEN"), cid
    assert (rows["il"]["vb"], rows["il"]["vs"]) == ("GREEN", "YELLOW")
    assert (rows["it"]["vb"], rows["it"]["vs"]) == ("RED", "GREEN")
    assert (rows["g"]["vb"], rows["g"]["vs"]) == ("RED", "RED")


def test_media_meta_recognizes_aiff(spark):
    from json_spark.operators.multimodal import extract_media_meta

    ints = _ints("meta-aiff", 16000, 80)
    df = spark.createDataFrame(
        [("a", bytearray(encode_aiff(ints, 16000)))],
        "clip_id string, bytes binary")
    row = extract_media_meta(df).collect()[0]
    assert row["container"] == "aiff"
    assert row["sr_hz"] == 16000 and row["channels"] == 1
    assert row["bits"] == 16 and row["n_samples"] == len(ints)
    assert abs(row["meta_dur_ms"] - 1000.0 * len(ints) / 16000) < 1e-9


def test_property_roundtrip_any_signal():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    @settings(max_examples=40, deadline=None)
    @given(st.integers(-32767, 32767), st.integers(1, 2**31 - 1),
           st.integers(1, 700))
    def prop(fill, sr, n):
        ints = np.full(n, fill, dtype=np.int16)
        sig, sr2 = decode_aiff(encode_aiff(ints, sr))
        assert sr2 == sr
        assert np.array_equal(
            np.round(sig * 32767.0).astype(np.int16), ints)

    prop()
