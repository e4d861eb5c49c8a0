"""Audio chunking + resampling: byte-exact reassembly, grid arithmetic,
and pitch preservation through the resampler."""

import numpy as np
from pyspark.sql import functions as F

from json_spark.fixtures.gen import generate_clips
from json_spark.fixtures.signal import (
    clip_seed, pcm16_wav_bytes, reference_signal,
)
from json_spark.operators.segmentation import (
    chunk_audio, resample_dominant_freq,
)

CHUNK_MS = 20


def test_chunks_reassemble_byte_exact(spark):
    # n=60 stays below the fixture's first planted duplicate (row 999),
    # so clip_ids are unique and reassembly is 1:1
    clips = generate_clips(spark, 60, partitions=4)
    rows = chunk_audio(clips, chunk_ms=CHUNK_MS).collect()
    originals = {r["clip_id"]: bytes(r["bytes"])
                 for r in clips.select("clip_id", "bytes").collect()}
    by_clip: dict[str, dict] = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], {})[r["chunk_idx"]] = r
    assert set(by_clip) == set(originals)
    for cid, parts in by_clip.items():
        wav = originals[cid]
        data_bytes = int.from_bytes(wav[40:44], "little")
        order = sorted(parts)
        assert order == list(range(len(order))), cid
        joined = b"".join(bytes(parts[i]["chunk"]) for i in order)
        assert joined == wav[44:44 + data_bytes], cid
        # grid arithmetic: every chunk except the tail is exactly
        # bytes_per_chunk long
        bpc = parts[0]["bytes_per_chunk"]
        lens = [parts[i]["chunk_len"] for i in order]
        assert all(ln == bpc for ln in lens[:-1]), cid
        assert 1 <= lens[-1] <= bpc, cid
        assert sum(lens) == data_bytes, cid


def test_chunk_counts_match_closed_form(spark):
    clips = generate_clips(spark, 200, partitions=4)
    got = {r["clip_id"]: r["n"] for r in
           chunk_audio(clips, chunk_ms=CHUNK_MS)
           .groupBy("clip_id").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    meta = clips.select("clip_id", "sr_hz", "dur_ms").collect()
    expect: dict[str, int] = {}
    for r in meta:
        n_in = max(1, r["sr_hz"] * (r["dur_ms"] if r["dur_ms"] is not None
                                    else 100) // 1000)
        bpc = 2 * max(1, r["sr_hz"] * CHUNK_MS // 1000)
        expect[r["clip_id"]] = expect.get(r["clip_id"], 0) + \
            (2 * n_in + bpc - 1) // bpc
    assert got == expect


def test_resample_preserves_pitch_exhaustively(spark):
    # n=1200 covers the planted corrupt rows (every 997th), a duplicate
    # id (row 999) and null durations — the invariant must hold on all
    clips = generate_clips(spark, 1200, partitions=4)
    out = resample_dominant_freq(clips, target_sr=8000)
    f0_pred = (F.lit(100) +
               F.pmod(F.crc32(F.col("clip_id").cast("binary")), F.lit(997)))
    checked = out.select(
        "clip_id", "n_out",
        (F.abs(F.col("dominant_hz") - f0_pred) <= F.col("bin_hz"))
        .alias("match")).collect()
    assert all(r["match"] for r in checked), \
        [r["clip_id"] for r in checked if not r["match"]][:5]
    # length contract is integer floor math
    meta = {r["clip_id"]: r for r in
            clips.select("clip_id", "sr_hz", "dur_ms").collect()}
    for r in checked:
        m = meta[r["clip_id"]]
        n_in = max(1, m["sr_hz"] * (m["dur_ms"] if m["dur_ms"] is not None
                                    else 100) // 1000)
        assert r["n_out"] == n_in * 8000 // m["sr_hz"]


def test_resample_identity_at_target_rate():
    # pure-python sanity: 8 kHz in, 8 kHz out — interp grid is identity
    sig = reference_signal("clip-x", 8000, 100)
    wav = pcm16_wav_bytes(sig, 8000)
    from json_spark.fixtures.signal import decode_wav_pcm16
    dec, sr = decode_wav_pcm16(wav)
    t = np.arange(len(dec), dtype=np.float64) / sr
    y = np.interp(t, t, dec.astype(np.float64))
    assert np.allclose(y, dec.astype(np.float64))
    f0 = 100.0 + (clip_seed("clip-x") % 997)
    spec = np.abs(np.fft.rfft(y))
    k = int(np.argmax(spec[1:])) + 1
    assert abs(k * sr / len(y) - f0) <= sr / len(y)


def test_chunk_content_digest_exact(spark):
    """Every GREEN chunk's digests equal slicing the full numpy render
    at the same grid — the Column-side substring is sample-lossless."""
    from json_spark.fixtures.gen import _row
    from json_spark.operators.segmentation import chunk_content_digest

    n_small = 60
    clips = generate_clips(spark, n_small, partitions=4)
    ch = chunk_audio(clips, chunk_ms=CHUNK_MS, extra_cols=["sr_hz"])
    rows = chunk_content_digest(ch).collect()
    assert rows and all(r.verdict == "GREEN" for r in rows)
    by_key = {(r.clip_id, r.chunk_idx): r for r in rows}
    for i in range(n_small):
        meta = _row(i)
        dur = meta["dur_ms"] if meta["dur_ms"] is not None else 100
        sig = reference_signal(meta["clip_id"], meta["sr_hz"], dur)
        v = np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int64)
        spc = max(1, meta["sr_hz"] * CHUNK_MS // 1000)
        for k in range((len(v) + spc - 1) // spc):
            part = v[k * spc:(k + 1) * spc]
            r = by_key[(meta["clip_id"], k)]
            assert r.n_samples == len(part)
            assert r.pcm_sum == int(part.sum())
            assert r.pcm_abs_sum == int(np.abs(part).sum())
            assert r.pcm_jv_sum == int(
                (np.arange(len(part), dtype=np.int64) * part).sum())


def test_chunk_content_corrupt_red(spark):
    """Chunks of a planted-noise clip fail the per-chunk SNR gate."""
    from json_spark.operators.segmentation import chunk_content_digest

    n = 1000  # includes corrupt row 996
    clips = generate_clips(spark, n, partitions=4)
    ch = chunk_audio(clips, chunk_ms=CHUNK_MS, extra_cols=["sr_hz"])
    rows = (chunk_content_digest(ch)
            .filter(F.col("clip_id") == "clip-000000000996").collect())
    assert rows and all(r.verdict == "RED" for r in rows)
    assert all(r.n_samples is None for r in rows)


def test_normalize_gain_edges(spark):
    """Silent clip passes through unscaled; undecodable payload flags
    decoded=false; normalized peak hits the target exactly."""
    import numpy as np

    from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
    from json_spark.operators.segmentation import normalize_gain

    sig = reference_signal("clip-000000000000", 16000, 100)
    rows = [
        ("clip-000000000000",
         bytearray(pcm16_wav_bytes(sig, 16000)), 16000, 100, "wav", "t"),
        ("silent",
         bytearray(pcm16_wav_bytes(np.zeros(160, dtype=np.float32), 8000)),
         8000, 20, "wav", "t"),
        ("garbage", bytearray(b"notawav"), 8000, 20, "wav", "t"),
    ]
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")
    got = {r["clip_id"]: r for r in
           normalize_gain(clips, target_peak=30000).collect()}
    ok = got["clip-000000000000"]
    assert ok["decoded"] and ok["verdict"] == "GREEN"
    assert ok["out_peak"] == 30000          # max sample maps exactly
    sil = got["silent"]
    assert sil["decoded"] and sil["out_peak"] == 0 and sil["pcm_sum"] == 0
    bad = got["garbage"]
    assert not bad["decoded"] and bad["n_samples"] is None
    assert bad["verdict"] == "RED"


def test_slice_clips_exact_shift(spark):
    """A head-cut derived clip's samples equal the original's shifted by
    drop_chunks*win bit-for-bit (decode -> cut -> re-encode -> decode)."""
    from json_spark.fixtures.signal import decode_wav_pcm16, pcm16_wav_bytes
    from json_spark.operators.segmentation import slice_clips
    sr = 8000
    rng = np.random.default_rng(7)
    sig = (rng.uniform(-0.9, 0.9, 2000)).astype(np.float32)
    wav = pcm16_wav_bytes(sig, sr)
    df = spark.createDataFrame([("a", bytearray(wav))],
                               "clip_id string, bytes binary")
    rows = slice_clips(df, drop_chunks=2, chunk_ms=20).collect()
    assert len(rows) == 1 and rows[0].clip_id == "a-cut"
    cut, sr2 = decode_wav_pcm16(bytes(rows[0].bytes))
    orig, _ = decode_wav_pcm16(wav)
    win = sr * 20 // 1000
    assert sr2 == sr
    assert np.array_equal(
        np.round(cut.astype(np.float64) * 32767),
        np.round(orig.astype(np.float64) * 32767)[2 * win:])


def test_slice_clips_skips_short_and_undecodable(spark):
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.operators.segmentation import slice_clips
    short = pcm16_wav_bytes(np.zeros(100, dtype=np.float32), 8000)
    df = spark.createDataFrame(
        [("short", bytearray(short)), ("junk", bytearray(b"nope")),
         ("nil", None)],
        "clip_id string, bytes binary")
    assert slice_clips(df, drop_chunks=2, chunk_ms=20).collect() == []


def test_pcm_chunk_digests_match_numpy(spark):
    """Ungated per-chunk digests equal a direct numpy computation,
    including the partial final chunk."""
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.operators.segmentation import pcm_chunk_digests
    sr = 8000
    rng = np.random.default_rng(11)
    sig = (rng.uniform(-1, 1, 500)).astype(np.float32)  # 500 = 3*160+20
    wav = pcm16_wav_bytes(sig, sr)
    df = spark.createDataFrame([("a", bytearray(wav))],
                               "clip_id string, bytes binary")
    rows = {r.chunk_idx: r for r in pcm_chunk_digests(df).collect()}
    v = np.round(np.clip(sig, -1, 1).astype(np.float64) * 32767
                 ).astype(np.int64)
    win = sr * 20 // 1000
    assert set(rows) == {0, 1, 2, 3}
    for p in rows:
        c = v[p * win:(p + 1) * win]
        r = rows[p]
        assert (r.n_samples, r.pcm_sum, r.pcm_abs_sum, r.pcm_jv_sum) == (
            len(c), int(c.sum()), int(np.abs(c).sum()),
            int((np.arange(len(c), dtype=np.int64) * c).sum()))


def test_audio_span_end_to_end(spark):
    """Original + head-cut copy share exactly n_chunks-2 aligned chunks;
    an unrelated clip shares nothing."""
    from json_spark.fixtures.signal import pcm16_wav_bytes
    from json_spark.operators.dedup import aligned_span_pairs
    from json_spark.operators.segmentation import (pcm_chunk_digests,
                                                   slice_clips)
    sr = 8000
    rng = np.random.default_rng(3)
    a = (rng.uniform(-0.9, 0.9, 1600)).astype(np.float32)  # 10 chunks
    b = (rng.uniform(-0.9, 0.9, 1600)).astype(np.float32)
    df = spark.createDataFrame(
        [("a", bytearray(pcm16_wav_bytes(a, sr))),
         ("b", bytearray(pcm16_wav_bytes(b, sr)))],
        "clip_id string, bytes binary")
    corpus = df.unionByName(
        slice_clips(df.filter("clip_id = 'a'"), drop_chunks=2)
        .select("clip_id", "bytes"))
    d = pcm_chunk_digests(corpus)
    g = d.select(F.col("clip_id").alias("id"),
                 F.col("chunk_idx").alias("p"),
                 F.concat_ws(":", "n_samples", "pcm_sum", "pcm_abs_sum",
                             "pcm_jv_sum").alias("__g"))
    got = {(r.id_a, r.id_b): (r.n_shared, r.max_span)
           for r in aligned_span_pairs(g, span_extra=0).collect()}
    assert got == {("a", "a-cut"): (8, 8)}
