"""Registry section: multimodal binary columns, container families, temporal/curation pipeline queries.

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    CFG,
    coerce_number,
    load_table,
    register,
)
from .core import (
    _DIRTY_NUMBER_RAW_SQL,
    _dirty_number_raw,
)
from .audio import (
    _CLIPS_CLOSED_FORM_CTE,
    _PCM_SAMPLES_CTE,
    _SNR_N,
)
from .pipeline_text import (
    _docs_with_planted_copies,
)

# ---- multimodal binary columns (rows-only: WAV decode not in SQL) -------

@register("multimodal_meta", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
g AS (
  SELECT sr_hz,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n
  FROM full_)
SELECT 'wav' AS container, sr_hz,
       count(*) AS n,
       CAST(sum(CAST(round(1000.0 * n / sr_hz * 1000) AS BIGINT)) AS BIGINT)
           AS sum_dur_us,
       CAST(sum(n) AS BIGINT) AS sum_samples,
       count(*) AS n_pcm16_mono
FROM g GROUP BY sr_hz
""")
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media metadata from header peeks (operators/multimodal.py:
    extract_media_meta) — container tag, sample rate, channel/bit layout,
    sample count, header-implied duration — WITHOUT a full decode. The
    oracle re-derives every header field from the generator contract
    (CRC-32 SQL fold): per (container, sr) clip counts, total samples,
    pcm16-mono layout count, and the header-implied duration summed as
    per-row-rounded integer microseconds (order-independent, so IEEE
    summation order cannot flip the hash; the division 1000.0*n/sr is
    the identical double on both engines).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import extract_media_meta
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return extract_media_meta(clips).groupBy("container", "sr_hz").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("meta_dur_ms") * 1000).cast("long"))
        .alias("sum_dur_us"),
        F.sum("n_samples").alias("sum_samples"),
        F.sum(((F.col("bits") == 16) & (F.col("channels") == 1))
              .cast("long")).alias("n_pcm16_mono"),
    )


@register("multimodal_audio_features", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
sgn AS (
  SELECT i, clip_id, codec, j, v,
         lag(v) OVER (PARTITION BY i, clip_id ORDER BY j) AS pv
  FROM samples),
per AS (
  SELECT i, clip_id, codec, COUNT(*) AS n, SUM(v) AS s, SUM(v*v) AS ss,
         MAX(abs(v)) AS pk,
         SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
                  THEN 1 ELSE 0 END) AS nzc
  FROM sgn GROUP BY i, clip_id, codec)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_decoded,
       CAST(SUM(n) AS BIGINT) AS n_samples,
       CAST(SUM(s) AS BIGINT) AS sum_dc,
       CAST(SUM(ss) AS BIGINT) AS sum_sq,
       CAST(MAX(pk) AS BIGINT) AS max_peak_i,
       CAST(SUM(nzc) AS BIGINT) AS n_zero_cross,
       round(sqrt(SUM(ss) / SUM(n)) / CAST(32767.0 AS DOUBLE), 6)
         AS pooled_rms,
       round(SUM(nzc) / SUM(n - 1), 6) AS pooled_zcr
FROM per GROUP BY codec
""")
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-content feature report, sample-exact cross-engine: Spark
    decodes the real WAV bytes and digests each clip's recovered int16
    lattice (count, Σv — the DC-offset digest, Σv², max|v|, sign-change
    count); the oracle NEVER
    reads a byte — it re-derives the same integers from the pure-SQL
    trigonometry samples, with zero crossings via a lag window over the
    sample index. Pooled rms/zcr are derived from the exact integer
    aggregates with single correctly-rounded IEEE ops on both engines
    (positive values, so HALF_UP == half-away at round 6). Noise plants
    are excluded by the engine's own reference-SNR verdict on one side
    and the generator contract (i %% 997) on the other; every clean clip
    in this fixture decodes for real, pinning n_decoded == n."""
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import audio_features
    clips = generate_clips(spark, _SNR_N, partitions=8)
    f = audio_features(clips).filter(F.col("verdict") == "GREEN")
    return (f.groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("decoded").cast("long")).alias("n_decoded"),
                 F.sum("n_samples").alias("n_samples"),
                 F.sum("sum_v").alias("sum_dc"),
                 F.sum("sum_sq").alias("sum_sq"),
                 F.max("peak_i").alias("max_peak_i"),
                 F.sum("n_zc").alias("n_zero_cross"),
                 F.sum(F.col("n_samples") - 1).alias("__nm1"))
            .withColumn("pooled_rms",
                        F.round(F.sqrt(F.col("sum_sq") / F.col("n_samples"))
                                / F.lit(32767.0), 6))
            .withColumn("pooled_zcr",
                        F.round(F.col("n_zero_cross") / F.col("__nm1"), 6))
            .drop("__nm1"))


# Closed-form twin of fixtures/gen.py over range(n): every clip's seed,
# codec, sample rate, and duration derived WITHOUT reading a byte —
# zlib.crc32(clip_id) (IEEE CRC-32: init 0xFFFFFFFF, reflected poly
# 0xEDB88320, final xor) computed as a pure SQL byte fold.
@register("audio_header_integrity", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
sized AS (
  SELECT codec, dur_ms,
         2 * greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                         // 1000) AS data_bytes
  FROM full_)
SELECT codec,
       count(*) AS n_clips,
       count(*) AS n_riff_ok,
       count(*) AS n_sr_match,
       count(*) AS n_len_match,
       count(*) FILTER (WHERE dur_ms IS NULL) AS n_null_dur,
       CAST(sum(data_bytes) AS BIGINT) AS sum_payload_bytes
FROM sized GROUP BY codec
""")
def q_audio_header_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-level audio integrity, zero Python: RIFF magic, declared
    sample rate vs metadata, declared PCM length vs sr_hz×dur_ms — parsed
    from the binary column with pure Column expressions (hex/conv byte
    surgery). The oracle never reads a byte: it re-derives every clip's
    codec, sample rate, duration and payload size in closed form from the
    generator contract (CRC-32 computed as a SQL fold), so a match proves
    the Spark-side binary parse extracts exactly what the generator wrote.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import wav_header_integrity
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return wav_header_integrity(clips, ["codec"])


@register("audio_dominant_freq", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       count(*) AS n_clips,
       count(*) AS n_f0_match,
       CAST(sum(100 + seed % 997) AS BIGINT) AS sum_f0_pred
FROM full_ GROUP BY codec
""")
def q_audio_dominant_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-content invariant: the rFFT-dominant frequency of every clip
    must sit within one FFT bin of the pitch its generator contract
    implies (f0 = 100 + crc32(clip_id) % 997 — Spark's native crc32 IS
    zlib.crc32). Validated sample-level in the Arrow stage; the oracle
    asserts full match plus the exact per-codec sum of predicted pitches
    via the same CRC-32 SQL fold, never decoding audio.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import dominant_freq
    clips = generate_clips(spark, _SNR_N, partitions=8)
    f0_pred = (F.lit(100) +
               F.pmod(F.crc32(F.col("clip_id").cast("binary")), F.lit(997)))
    return dominant_freq(clips).select(
        "codec",
        f0_pred.cast("long").alias("f0_pred"),
        (F.abs(F.col("dominant_hz") - f0_pred) <= F.col("bin_hz"))
        .alias("f0_match"),
    ).groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("f0_match").cast("long")).alias("n_f0_match"),
        F.sum("f0_pred").alias("sum_f0_pred"),
    )


@register("audio_rms_check", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec, count(*) AS n_clips,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT)
         AS n_noise_loud,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT)
         AS n_band_ok
FROM full_ GROUP BY codec
""")
def q_audio_rms_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudness-band invariant over decoded PCM: the generator's
    3-harmonic mix has RMS = sqrt(Σ aᵢ²/2) ≈ 0.382 (truncation keeps
    every clean clip in [0.376, 0.385] — verified exhaustively), while
    the planted corruption adds uniform(-0.3, 0.3) noise, pushing RMS to
    ≈ sqrt(0.382² + 0.3²/3) ≈ 0.419. A 0.40 threshold therefore splits
    clean from corrupted with ~8σ margins, and the oracle's closed-form
    row arithmetic (corrupt ⟺ i % 997 = 996, codec via the CRC-32 SQL
    fold) predicts the exact per-codec counts on BOTH sides of the line —
    a content-level check that never decodes a byte in the oracle.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import audio_features
    clips = generate_clips(spark, _SNR_N, partitions=8)
    f = audio_features(clips)
    return f.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum((F.col("rms") > 0.40).cast("long")).alias("n_noise_loud"),
        F.sum(((F.col("rms") >= 0.30) & (F.col("rms") <= 0.40))
              .cast("long")).alias("n_band_ok"))


@register("audio_chunks", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
grid AS (
  SELECT codec,
         2 * greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                         // 1000) AS data_bytes,
         2 * greatest(1, (CAST(sr_hz AS BIGINT) * 20) // 1000) AS bpc
  FROM full_)
SELECT codec,
       CAST(sum((data_bytes + bpc - 1) // bpc) AS BIGINT) AS n_chunks,
       CAST(sum(data_bytes) AS BIGINT) AS sum_chunk_bytes,
       CAST(sum(CASE WHEN data_bytes % bpc <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_short_tails,
       CAST(max((data_bytes + bpc - 1) // bpc) AS BIGINT)
           AS max_chunks_per_clip
FROM grid GROUP BY codec
""")
def q_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-duration audio chunking (operators/segmentation.py:44): the
    chunk grid is integer arithmetic on the container header, each chunk a
    binary substring slice, fan-out a bounded explode(sequence) — map-only,
    payload bytes never shuffle. The oracle re-derives the full grid per
    clip from the generator contract (CRC-32 SQL fold) without reading a
    byte: per-codec chunk count, total chunk bytes, short-tail count and
    max per-clip chunk count must all match exactly — which pins both the
    grid arithmetic and the byte-slicing (a wrong slice changes
    sum_chunk_bytes).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.segmentation import chunk_audio
    clips = generate_clips(spark, _SNR_N, partitions=8)
    ch = chunk_audio(clips, chunk_ms=20)
    return ch.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").alias("sum_chunk_bytes"),
        F.sum((F.col("chunk_len") < F.col("bytes_per_chunk")).cast("long"))
        .alias("n_short_tails"),
        (F.max("chunk_idx") + 1).alias("max_chunks_per_clip"),
    )


@register("audio_resample", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
r AS (
  SELECT codec, sr_hz,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n_in
  FROM full_)
SELECT codec,
       count(*) AS n_clips,
       count(*) AS n_pitch_match,
       CAST(sum((n_in * 8000) // sr_hz) AS BIGINT) AS sum_n_out
FROM r GROUP BY codec
""")
def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-normalizing resample (operators/segmentation.py:88): linear
    interpolation to 8 kHz inside the Arrow stage, then rFFT argmax on the
    RESAMPLED samples. Invariant: resampling preserves every clip's
    generator-implied pitch (f0 = 100 + crc32(clip_id) % 997) within one
    FFT bin — exhaustively, including the noise-corrupted clips
    (n_pitch_match == n_clips in the oracle). The oracle also pins the
    integer-floor output-length contract (n_out = n_in * target_sr // sr)
    per codec in closed form.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.segmentation import resample_dominant_freq
    clips = generate_clips(spark, _SNR_N, partitions=8)
    out = resample_dominant_freq(clips, target_sr=8000)
    f0_pred = (F.lit(100) +
               F.pmod(F.crc32(F.col("clip_id").cast("binary")), F.lit(997)))
    return out.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum((F.abs(F.col("dominant_hz") - f0_pred) <= F.col("bin_hz"))
              .cast("long")).alias("n_pitch_match"),
        F.sum("n_out").alias("sum_n_out"),
    )


@register("audio_flac_roundtrip", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
g AS (
  SELECT codec,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n
  FROM full_)
SELECT codec,
       count(*) AS n_clips,
       count(*) AS n_decoded,
       count(*) AS n_bit_exact,
       CAST(sum(n) AS BIGINT) AS sum_samples,
       CAST(sum(42 + 11 * ((n + 4095) // 4096) + 2 * n) AS BIGINT)
           AS sum_flac_bytes
FROM g GROUP BY codec
""")
def q_audio_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real FLAC as a second container (functions/flac.py — pure-Python
    verbatim-subframe codec, CRC-8/CRC-16/MD5 enforced): transcode every
    clip's PCM to spec-compliant FLAC and decode it back through the
    engine path (operators/multimodal.py:flac_roundtrip). The oracle
    re-derives, per codec, the clip counts, total sample counts, AND the
    exact encoded container sizes in closed form — 42 header bytes plus
    11 bytes/frame plus 2 bytes/sample for the 4096-block verbatim
    layout — so any drift in STREAMINFO, frame headers, or subframe
    packing changes sum_flac_bytes; any CRC/MD5 bug flips
    n_decoded/n_bit_exact (decode enforces all three checksums).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import flac_roundtrip
    clips = generate_clips(spark, _SNR_N, partitions=8)
    rt = flac_roundtrip(clips)
    return rt.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("decoded").cast("long")).alias("n_decoded"),
        F.sum(F.col("bit_exact").cast("long")).alias("n_bit_exact"),
        F.sum("n_samples").alias("sum_samples"),
        F.sum("flac_bytes").alias("sum_flac_bytes"))


@register("flac_header_integrity", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
g AS (
  SELECT codec,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n
  FROM full_)
SELECT codec,
       count(*) AS n_clips,
       count(*) AS n_flac_ok,
       count(*) AS n_sr_match,
       count(*) AS n_nsamples_match,
       count(*) AS n_pcm16_mono,
       CAST(sum(n) AS BIGINT) AS sum_samples
FROM g GROUP BY codec
""")
def q_flac_header_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-Python STREAMINFO integrity over real FLAC containers: clips
    transcode to FLAC in one Arrow stage (multimodal.py:transcode_flac),
    then every header field — magic/shape, sample rate, channel/bit
    layout, total samples — is read by pure Column byte surgery
    (multimodal.py:flac_header_columns; hex+conv shifts, no Python, no
    full decode) and compared against the metadata columns. The oracle
    re-derives the expected fields per codec from the generator contract.
    The WAV twin is `audio_header_integrity`; together the two containers
    share one rule surface (wav_header_verdicts / flac_header_verdicts).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import flac_header_columns, transcode_flac
    clips = generate_clips(spark, _SNR_N, partitions=8)
    fl = transcode_flac(clips)
    hdr = flac_header_columns(F.col("bytes"))
    expected_n = F.greatest(
        F.lit(1).cast("long"),
        F.expr("CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100) DIV 1000"))
    parsed = fl.select(
        "codec",
        hdr["flac_ok"].alias("flac_ok"),
        (hdr["hdr_sr_hz"] == F.col("sr_hz").cast("long")).alias("sr_match"),
        (hdr["n_samples"] == expected_n).alias("ns_match"),
        ((hdr["channels"] == 1) & (hdr["bits"] == 16)).alias("pcm16_mono"),
        hdr["n_samples"].alias("n_samples"))
    return parsed.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("flac_ok").cast("long")).alias("n_flac_ok"),
        F.sum(F.col("sr_match").cast("long")).alias("n_sr_match"),
        F.sum(F.col("ns_match").cast("long")).alias("n_nsamples_match"),
        F.sum(F.col("pcm16_mono").cast("long")).alias("n_pcm16_mono"),
        F.sum("n_samples").alias("sum_samples"))


@register("au_header_integrity", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
g AS (
  SELECT codec,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n
  FROM full_)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(count(*) AS BIGINT) AS n_au_ok,
       CAST(count(*) AS BIGINT) AS n_sr_match,
       CAST(count(*) AS BIGINT) AS n_len_match,
       CAST(sum(2 * n) AS BIGINT) AS sum_payload_bytes
FROM g GROUP BY codec
""")
def q_au_header_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-Python header integrity over the THIRD container, big-endian
    Sun AU: clips transcode to AU in one Arrow stage
    (multimodal.py:transcode_au; functions/au.py is the codec), then
    every header field — magic/PCM16-mono shape, declared sample rate,
    data-offset + data-size vs actual payload length — is read by pure
    Column byte surgery (multimodal.py:au_header_columns: straight
    ``be_uint`` reads, the byte-order mirror of the WAV/le32 parse; no
    Python, no full decode). The oracle re-derives expected fields per
    codec from the generator contract: AU layout is deterministic
    (28-byte header + 2 bytes/sample), so sum_payload_bytes pins the
    encoder's framing exactly.

    Scale shape: two Python stages (fixture render + transcode) feeding
    whole-stage-codegen header checks, then one map-combined aggregate
    whose key cardinality is |codec| — the payload never shuffles.
    Reference parity: one tolerant decode surface across container
    shapes (internal/dirtyjson/decoder.go), realized here as the
    wav/flac/au header-rule triple sharing a verdict vocabulary.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import au_header_columns, transcode_au
    clips = generate_clips(spark, _SNR_N, partitions=8)
    au = transcode_au(clips)
    hdr = au_header_columns(F.col("bytes"))
    parsed = au.select(
        "codec",
        hdr["au_ok"].alias("au_ok"),
        (hdr["hdr_sr_hz"] == F.col("sr_hz").cast("long")).alias("sr_match"),
        (F.length("bytes") == hdr["data_offset"] + hdr["data_bytes"])
        .alias("len_match"),
        hdr["data_bytes"].alias("data_bytes"))
    return parsed.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("au_ok").cast("long")).alias("n_au_ok"),
        F.sum(F.col("sr_match").cast("long")).alias("n_sr_match"),
        F.sum(F.col("len_match").cast("long")).alias("n_len_match"),
        F.sum("data_bytes").alias("sum_payload_bytes"))


@register("audio_au_snr", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict
FROM full_ GROUP BY codec
""")
def q_audio_au_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNR>=30dB invariant run end-to-end over AU containers: clips
    transcode WAV→AU (multimodal.py:transcode_au), then the SAME fused
    PCM kernel (operators/snr.py:pcm_scan — no caller-side dispatch, AU
    is the third magic-gated fall-through after WAV and FLAC) decodes
    the big-endian payload, regenerates the reference signal, and rolls
    per-codec verdicts. The oracle is the identical closed form as
    `snr_partition_verdicts` over WAV: a match proves the transcode
    preserved every sample (planted corruption at i % 997 == 996 stays
    RED, everything else stays GREEN at quantization-noise SNR) and the
    kernel's container dispatch is lossless — byte order, header
    framing, and PCM lattice all round-trip through the third container.

    Scale shape: two map-only Arrow stages (render + transcode) fused in
    one task pipeline, then the map-combined |codec|-key rollup; the AU
    payload never shuffles and never reaches the driver.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import transcode_au
    from ...operators.snr import snr_check, snr_partition_rollup
    clips = generate_clips(spark, _SNR_N, partitions=8)
    au = transcode_au(clips)
    roll = snr_partition_rollup(snr_check(au, extra_cols=["codec"]),
                                ["codec"])
    return roll.select("codec", "n_rows", "n_green", "n_red", "verdict")


@register("audio_content_dedup", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
keyed AS (
  SELECT codec,
         concat_ws('|', sr_hz, coalesce(dur_ms, 100), seed % 997,
                   seed % 31, seed % 17,
                   coalesce(CAST(CASE WHEN i % 997 = 996 THEN seed END
                                 AS VARCHAR), '')) AS key
  FROM full_),
g AS (
  SELECT codec, key,
         count(*) OVER (PARTITION BY key) AS n_h
  FROM keyed)
SELECT codec,
       count(*) AS n_clips,
       CAST(count(*) FILTER (WHERE n_h > 1) AS BIGINT) AS n_dup_clips,
       CAST(count(DISTINCT key) FILTER (WHERE n_h > 1) AS BIGINT)
           AS n_dup_hashes
FROM g GROUP BY codec
""")
def q_audio_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup over the BINARY payload column (the media
    analog of `dedup_exact`): clips grouped by md5 of their bytes; a clip
    is a duplicate when its hash group has >1 member. Catches both the
    planted duplicate clip_ids AND coincidental synth collisions (two
    different ids whose (sr, dur, f0, phases) coincide render the
    byte-identical signal — the oracle derives exactly this equivalence
    class from the generator contract, with corrupted rows keyed by their
    full seed since their noise is seed-unique). Scale shape: the 16-byte
    hash is computed map-side and is the ONLY thing that shuffles — the
    payload bytes never leave their scan partitions, so this runs at
    10^12 rows wherever a count does.
    """
    from ...fixtures.gen import generate_clips
    clips = generate_clips(spark, _SNR_N, partitions=8)
    h = clips.select("codec", F.md5(F.col("bytes")).alias("__h"))
    g = h.groupBy("__h", "codec").agg(F.count(F.lit(1)).alias("n_hc"))
    tot = g.groupBy("__h").agg(F.sum("n_hc").alias("n_h"))
    j = g.join(tot, "__h")
    return j.groupBy("codec").agg(
        F.sum("n_hc").alias("n_clips"),
        F.sum(F.when(F.col("n_h") > 1, F.col("n_hc")).otherwise(F.lit(0)))
        .alias("n_dup_clips"),
        F.sum((F.col("n_h") > 1).cast("long")).alias("n_dup_hashes"))


@register("dup_content_conflicts", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
dup_pairs AS (
  SELECT codec,
         CASE WHEN ((i % 997 = 996) <> ((i - 1) % 997 = 996))
                   OR (((i % 101 = 100) <> ((i - 1) % 101 = 100))
                       AND seed % 151 <> 50)
              THEN 'CONTENT_DIVERGENT'
              WHEN (i % 101 = 100) <> ((i - 1) % 101 = 100)
              THEN 'META_DIVERGENT'
              ELSE 'IDENTICAL' END AS verdict
  FROM full_ WHERE i % 1000 = 999 AND i > 0),
reup AS (
  SELECT codec,
         CASE WHEN i % 500 = 0 THEN 'CONTENT_DIVERGENT'
              WHEN i % 750 = 0 THEN 'LABEL_DIVERGENT'
              ELSE 'IDENTICAL' END AS verdict
  FROM full_ WHERE i % 250 = 0),
allv AS (SELECT * FROM dup_pairs UNION ALL SELECT * FROM reup)
SELECT codec, verdict,
       CAST(count(*) AS BIGINT) AS n_dup_keys,
       CAST(2 * count(*) AS BIGINT) AS n_rows
FROM allv GROUP BY codec, verdict
""")
def q_dup_content_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-key CONTENT integrity (operators/consistency.py:
    dup_content_integrity) — the uniqueness × content cross check no
    single family makes: for every clip_id appearing more than once, do
    the copies carry byte-identical audio, the same transcript, the
    same metadata? Exact dedup only counts the duplication; this
    classifies what it MEANS (benign re-upload vs id collision vs
    two-targets-for-one-input), which decides whether dropping a copy
    is safe. The reference's analogue is its duplicate-key stance at
    decode time (last key wins, decoder.go's map semantics) — at corpus
    scale "last wins" silently discards a divergent payload, so the
    engine surfaces the divergence instead.

    Fixture: the generator's planted duplicate ids (every 1000th row
    reuses the previous id — same seed, so copies agree except where
    the corrupt/null-dur plantings hit exactly one of the pair) UNION a
    derived re-ingest batch: every 250th clip re-appears, every 500th
    with a truncated payload (substring drops the last 2 bytes), every
    750th with an edited transcript — all row-id keyed, so the oracle
    derives every group's verdict closed-form without reading a byte.

    Scale shape: md5(bytes) is computed map-side and is the only
    content that shuffles; per-key distinct counts are collect_set
    sizes bounded by duplicate multiplicity; one key shuffle, then the
    dup-group frame (defect-mass-sized) rolls up per (codec, verdict).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.consistency import dup_content_integrity

    clips = generate_clips(spark, _SNR_N, partitions=8)
    idn = F.substring("clip_id", 6, 12).cast("long")
    reingest = clips.where(idn % 250 == 0).select(
        "clip_id",
        F.when(idn % 500 == 0,
               F.expr("substring(bytes, 1, length(bytes) - 2)"))
        .otherwise(F.col("bytes")).alias("bytes"),
        "sr_hz", "dur_ms", "codec",
        F.when(idn % 750 == 0, F.concat("transcript", F.lit(" v2")))
        .otherwise(F.col("transcript")).alias("transcript"))
    un = clips.unionByName(reingest)
    d = un.select("clip_id", "codec", F.md5("bytes").alias("__content"),
                  "transcript", "dur_ms")
    integ = dup_content_integrity(d, ["clip_id", "codec"], "__content",
                                  label_cols=["transcript"],
                                  meta_cols=["dur_ms"])
    return integ.groupBy("codec", "verdict").agg(
        F.count(F.lit(1)).alias("n_dup_keys"),
        F.sum("n_copies").alias("n_rows"))


@register("ledger_trend", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
idn AS (
  SELECT *, CASE WHEN i % 1000 = 999 AND i > 0 THEN i - 1 ELSE i END AS idn
  FROM full_),
runa AS (
  SELECT codec, CAST(count(*) AS DOUBLE) AS n_rows,
         CAST(count(*) FILTER (WHERE dur_ms IS NULL) AS DOUBLE)
           / count(*) AS null_rate
  FROM idn WHERE idn < 1000 GROUP BY codec),
runb AS (
  SELECT codec, CAST(count(*) AS DOUBLE) AS n_rows,
         CAST(count(*) FILTER (WHERE dur_ms IS NULL) AS DOUBLE)
           / count(*) AS null_rate
  FROM idn GROUP BY codec),
pairs AS (
  SELECT b.codec, m.metric,
         CASE m.metric WHEN 'n_rows' THEN a.n_rows ELSE a.null_rate END
           AS prev,
         CASE m.metric WHEN 'n_rows' THEN b.n_rows ELSE b.null_rate END
           AS cur
  FROM runb b LEFT JOIN runa a ON b.codec = a.codec
  CROSS JOIN (SELECT unnest(['n_rows', 'null_rate']) AS metric) m)
SELECT codec AS partition_id, 'stats' AS check_name, metric, prev, cur,
       CASE WHEN prev IS NOT NULL AND prev <> 0.0
            THEN (cur - prev) / abs(prev) END AS rel_change,
       CASE WHEN prev IS NULL THEN 'NEW'
            WHEN prev = 0.0 THEN CASE WHEN cur = 0.0 THEN 'GREEN'
                                      ELSE 'RED' END
            WHEN abs((cur - prev) / abs(prev)) <= 0.10 THEN 'GREEN'
            WHEN abs((cur - prev) / abs(prev)) <= 0.25 THEN 'YELLOW'
            ELSE 'RED' END AS trend
FROM pairs
""")
def q_ledger_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run metric drift from the checkpoint ledger
    (plans/ledger.py:ledger_trend): two deterministic ledger snapshots —
    run A over the first 1000 row ids, run B over all 2000 — carry
    per-codec (n_rows, null_rate) metrics in metrics_json; the trend
    operator ranks runs by updated_at, joins latest vs previous per
    metric key, and emits GREEN/YELLOW/RED relative-change verdicts. The
    oracle re-derives both snapshots and every rel_change/verdict in
    closed form from the generator contract (count arithmetic and one
    exact IEEE division per metric — no order-dependent float folds).
    """
    from ...fixtures.gen import generate_clips
    from ...plans.ledger import ledger_trend
    clips = generate_clips(spark, _SNR_N, partitions=8)
    idn = F.substring("clip_id", 6, 12).cast("long")

    def snapshot(df, ts: str):
        agg = df.groupBy("codec").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("dur_ms").isNull().cast("long")).alias("__nn"))
        return agg.select(
            F.col("codec").alias("partition_id"),
            F.lit("stats").alias("check_name"),
            F.lit("DONE").alias("status"),
            F.to_json(F.create_map(
                F.lit("n_rows"), F.col("__n").cast("double"),
                F.lit("null_rate"),
                F.col("__nn").cast("double") / F.col("__n")))
            .alias("metrics_json"),
            F.lit("fixture").alias("lineage"),
            F.lit(ts).cast("timestamp").alias("updated_at"))

    ledger = snapshot(clips.filter(idn < 1000), "2026-01-01 00:00:00") \
        .unionByName(snapshot(clips, "2026-01-02 00:00:00"))
    return ledger_trend(ledger)


@register("event_sessions", oracle="""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
l AS (
  SELECT user_id, us, event_id,
    CASE WHEN lag(us) OVER w IS NULL
         OR us - lag(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (
  SELECT user_id, us,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM l),
per_sess AS (
  SELECT user_id, sess_id, count(*) AS n_events,
         (max(us) - min(us)) // 1000000 AS dur_s
  FROM s GROUP BY user_id, sess_id)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(max(dur_s) AS BIGINT) AS max_session_dur_s
FROM per_sess GROUP BY user_id
""")
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (12 h inactivity threshold) via the
    classic lag → flag → running-sum window chain, entirely JVM-side.
    Timestamps are reduced to integer micros against an NTZ epoch literal
    (``timestampdiff`` ≡ DuckDB ``epoch_us``) so every comparison is
    exact integer arithmetic — session-timezone-proof by construction.
    Scale shape: one shuffle on user_id serves both windows and both
    aggregations (same partitioning reused across stages).
    """
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    e = ev.select("user_id", "event_id", us.alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lag_us = F.lag("us").over(w)
    new_s = F.when(
        lag_us.isNull() | (F.col("us") - lag_us > 12 * 3600 * 1000000),
        1).otherwise(0)
    s = e.withColumn("sess_id", F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    per_sess = s.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor((F.max("us") - F.min("us")) / F.lit(1000000)).alias("dur_s"))
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.max("dur_s").alias("max_session_dur_s"))


@register("events_asof_join", oracle="""
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'click'),
e AS (SELECT user_id, epoch_us(ts) AS us, max(event_id) AS error_id
      FROM events WHERE event_type = 'error' GROUP BY user_id, epoch_us(ts))
SELECT c.user_id, c.event_id, e.error_id, c.us - e.us AS gap_us
FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.us >= e.us
""")
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join — each click gains the user's most recent
    error at or before it (operators/temporal.py:asof_join). The Spark
    plan is the union + carry-forward window (one shuffle on user_id,
    no inequality join, no candidate-pair blowup); the oracle is DuckDB's
    native ASOF LEFT JOIN — an entirely independent algorithm, so a match
    pins the <=-at-equal-ts tie semantics too. Timestamps are reduced to
    integer micros (TZ-proof); the right side is pre-deduped per
    (user_id, us) in both engines so the matched row is unambiguous.
    """
    from ...operators.temporal import asof_join, epoch_us
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", epoch_us("ts").alias("us"))
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", epoch_us("ts").alias("us"), "event_id")
              .groupBy("user_id", "us")
              .agg(F.max("event_id").alias("error_id"))
              .withColumn("error_us", F.col("us")))
    j = asof_join(clicks, errors, on=["user_id"], ts="us")
    return j.select("user_id", "event_id", "error_id",
                    (F.col("us") - F.col("error_us")).alias("gap_us"))


@register("events_range_join", oracle="""
WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events WHERE event_type <> 'error'),
e AS (SELECT user_id, event_id AS error_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'error')
SELECT p.event_id, e.error_id, p.us - e.us AS offset_us
FROM p JOIN e ON p.user_id = e.user_id
 AND p.us >= e.us AND p.us < e.us + 600000000
""")
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join — every non-error event falling inside
    the 10 minutes after an error by the same user
    (operators/temporal.py:range_join_bucketed). Spark never sees an
    inequality join: intervals explode into <=2 fixed-width time buckets,
    points map to one, the join is pure equality on (user_id, bucket) and
    exact containment is a filter — each qualifying pair survives exactly
    once by construction. The oracle runs the plain inequality join,
    which only DuckDB can afford (at 10^12 rows that plan is a
    BroadcastNestedLoopJoin and unrunnable).
    """
    from ...operators.temporal import epoch_us, range_join_bucketed
    ev = load_table(spark, sf_dir, "events")
    points = ev.filter(F.col("event_type") != "error").select(
        "user_id", "event_id", epoch_us("ts").alias("us"))
    intervals = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"),
        epoch_us("ts").alias("start_us"),
        (epoch_us("ts") + F.lit(600_000_000)).alias("end_us"))
    j = range_join_bucketed(points, intervals, on=["user_id"],
                            point_us="us", bucket_us=600_000_000)
    return j.select("event_id", "error_id",
                    (F.col("us") - F.col("start_us")).alias("offset_us"))


@register("events_rollup", oracle="""
WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events),
lv AS (
  SELECT CAST(60000000 AS BIGINT) AS level_us,
         (us // 60000000) * 60000000 AS bucket_us, event_type,
         count(*) AS n, sum(value) AS sv
  FROM e GROUP BY 2, 3
  UNION ALL
  SELECT CAST(3600000000 AS BIGINT),
         (us // 3600000000) * 3600000000, event_type, count(*), sum(value)
  FROM e GROUP BY 2, 3
  UNION ALL
  SELECT CAST(86400000000 AS BIGINT),
         (us // 86400000000) * 86400000000, event_type, count(*), sum(value)
  FROM e GROUP BY 2, 3)
SELECT level_us, bucket_us, event_type, n,
       round(sv, 4) AS sum_value
FROM lv
""")
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute/hour/day buckets
    per event_type (operators/temporal.py:time_rollup). Spark shuffles the
    raw rows ONCE (into minute buckets); hour and day re-aggregate the
    minute table — the continuous-aggregate pattern whose coarse levels
    cost ~nothing at 10^12 rows. The oracle aggregates each level directly
    from raw, so a match also proves the hierarchical re-aggregation is
    exact (integer buckets; the float sum is rounded on both sides).
    """
    from ...operators.temporal import epoch_us, time_rollup
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_type", epoch_us("ts").alias("us"), "value")
    r = time_rollup(e, "us", ["event_type"], "value",
                    [60_000_000, 3_600_000_000, 86_400_000_000])
    return r.select("level_us", "bucket_us", "event_type", "n",
                    F.round("sum_value", 4).alias("sum_value"))


@register("dataset_split", oracle="""
WITH d AS (
  SELECT lang,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 1000 AS b,
         len(string_split(text, ' ')) AS tok
  FROM documents)
SELECT CASE WHEN b < 960 THEN 'train' WHEN b < 980 THEN 'val'
            ELSE 'test' END AS split,
       lang, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
FROM d GROUP BY split, lang
""")
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket of doc_id
    (operators/packing.py:assign_split) with a per-(split, lang)
    composition report. Map-only until the tiny summary aggregate; stable
    under corpus growth because the bucket depends on the id, not the row
    position. The oracle recomputes every assignment from the same md5
    arithmetic — bit-identical across engines.
    """
    from ...operators.packing import dataset_split
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("tok"))
    return dataset_split(d, "doc_id", ["lang"], "tok")


@register("doc_pack_batches", oracle="""
WITH d AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS tok,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 4 AS shard
  FROM documents),
c AS (
  SELECT lang, shard, tok,
         coalesce(CAST(sum(tok) OVER (PARTITION BY lang, shard
                                      ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS BIGINT),
                  0) AS before
  FROM d)
SELECT lang, shard, before // 8192 AS batch_id,
       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS batch_tokens
FROM c GROUP BY lang, shard, batch_id
""")
def q_doc_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (operators/packing.py:pack_batches):
    docs in id order within each (lang, hash-shard) are cut into ~8192-
    token batches by the offset rule batch = floor(tokens_before/budget) —
    a prefix-sum window, not a sequential greedy scan, so it parallelizes
    across shards and is exactly expressible in SQL. The shard is the
    cross-engine md5 bucket, so the DuckDB oracle reproduces every batch
    boundary; emits one row per batch.
    """
    from ...operators.packing import pack_batches
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("tok"))
    return pack_batches(d, "doc_id", "tok", ["lang"], budget=8192,
                        n_shards=4)


@register("hash_uniformity", oracle="""
WITH d AS (
  SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 16 AS bucket
  FROM documents),
counts AS (SELECT bucket, count(*) AS n FROM d GROUP BY bucket),
grid AS (SELECT b AS bucket FROM generate_series(0, 15) t(b)),
full_g AS (SELECT g.bucket, coalesce(c.n, 0) AS n
           FROM grid g LEFT JOIN counts c USING (bucket)),
tot AS (SELECT sum(n) AS t FROM full_g),
chi AS (SELECT sum((n - t / 16.0) * (n - t / 16.0) / (t / 16.0)) / 16.0
          AS chi_b
        FROM full_g, tot)
SELECT bucket, CAST(n AS BIGINT) AS n,
       round(n / t, 6) AS share,
       round(n / t - 1.0 / 16.0, 6) AS dev,
       round(chi_b, 6) AS chi2_per_bucket,
       CASE WHEN chi_b > 4.0 THEN 'RED'
            WHEN chi_b > 2.0 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM full_g, tot, chi
""")
def q_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the engine's own split/sampling primitive (operators/
    packing.py:hash_uniformity): are the md5 buckets behind
    dataset_split / stratified_sample / pack_batches actually uniform
    over this id population? Per-bucket counts vs the uniform share
    plus the per-bucket-normalized Pearson chi-square (~1 under
    uniformity) with GREEN/YELLOW/RED bands — a skewed id scheme would
    silently bias every downstream split, and this makes the assumption
    measurable. One map-combinable 16-row aggregate touches the corpus;
    the oracle recomputes every bucket from the same md5 arithmetic —
    bit-identical across engines.
    """
    from ...operators.packing import hash_uniformity
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return hash_uniformity(d, "doc_id", n_buckets=16)


@register("truncation_report", oracle="""
WITH t AS (
  SELECT source, len(string_split(text, ' ')) AS n
  FROM documents),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(count(*) FILTER (WHERE n > 64) AS BIGINT) AS docs_over,
         CAST(sum(greatest(n - 64, 0)) AS BIGINT) AS tokens_lost
  FROM t GROUP BY source)
SELECT source, n_docs, total_tokens, docs_over, tokens_lost,
       total_tokens - tokens_lost AS kept_tokens,
       round(tokens_lost / total_tokens, 6) AS loss_share,
       CASE WHEN tokens_lost / total_tokens > 0.15 THEN 'RED'
            WHEN tokens_lost / total_tokens > 0.05 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM g
""")
def q_truncation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length truncation loss (operators/packing.py:
    truncation_report): per source, the tokens lost if every document
    is cut at a 64-token budget — the report that drives the packing-
    length choice, since a budget that silently drops a big share of
    one source's tokens biases the corpus with no per-document symptom.
    The fixture's length spread puts sources on both sides of the
    YELLOW line, so the verdict is exercised. Pure per-row arithmetic
    into ONE map-combinable |sources|-row aggregate; integers
    everywhere except the single rounded ratio.
    """
    from ...operators.packing import truncation_report
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("tok"))
    return truncation_report(d, "tok", ["source"], budget=64)


@register("column_profile", oracle="""
WITH p AS (
  SELECT 'event_type' AS col_name, n
  FROM (SELECT event_type AS v, count(*) AS n FROM events GROUP BY 1)
  UNION ALL
  SELECT 'user_id', n
  FROM (SELECT user_id AS v, count(*) AS n FROM events GROUP BY 1)
  UNION ALL
  SELECT 'props', n
  FROM (SELECT props AS v, count(*) AS n FROM events GROUP BY 1))
SELECT col_name,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_null,
       count(*) AS n_distinct,
       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_share,
       round(log2(CAST(sum(n) AS DOUBLE))
             - sum(n * log2(CAST(n AS DOUBLE))) / sum(n), 6)
         AS entropy_bits
FROM p GROUP BY col_name
""")
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column value-distribution profile (operators/profiling.py:
    column_profile): cardinality, top-value share (near-constant
    detector), Shannon entropy — the at-a-glance table a validation run
    prints first. One hash aggregate per column reduces the stream to
    value-cardinality size; shares/entropy are ONE further plain
    aggregate (H = log2 N - Σ n·log2 n / N) — map-combinable even when
    the count table is corpus-sized (id-like columns), no global
    window. These columns carry no nulls (so the oracle pins
    n_null = 0); the null-as-its-own-bucket path is pinned in pytest.
    """
    from ...operators.profiling import column_profile
    ev = load_table(spark, sf_dir, "events")
    return column_profile(ev, ["event_type", "user_id", "props"])


@register("fd_profile", oracle="""
SELECT 'event_id' AS lhs, 'ts' AS rhs, count(*) AS n_groups,
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT) AS n_violating,
       CAST(max(d) AS BIGINT) AS max_distinct, max(d) <= 1 AS holds
FROM (SELECT event_id, count(DISTINCT ts) AS d FROM events
      GROUP BY event_id)
UNION ALL
SELECT 'event_id', 'user_id', count(*),
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
       CAST(max(d) AS BIGINT), max(d) <= 1
FROM (SELECT event_id, count(DISTINCT user_id) AS d FROM events
      GROUP BY event_id)
UNION ALL
SELECT 'user_id', 'event_type', count(*),
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
       CAST(max(d) AS BIGINT), max(d) <= 1
FROM (SELECT user_id, count(DISTINCT event_type) AS d FROM events
      GROUP BY user_id)
UNION ALL
SELECT 'event_type', 'user_id', count(*),
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
       CAST(max(d) AS BIGINT), max(d) <= 1
FROM (SELECT event_type, count(DISTINCT user_id) AS d FROM events
      GROUP BY event_type)
""")
def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (operators/profiling.py): does
    column A determine column B? Four candidates over events — the two
    key-like FDs (event_id → ts / user_id) must hold, the two
    attribute-level ones (user_id ↔ event_type) must visibly violate.
    Each candidate is one pass: groupBy(lhs) + countDistinct(rhs) runs as
    Spark's two-phase distinct aggregate (map-side dedup, shuffle carries
    distinct pairs, never raw rows).
    """
    from ...operators.profiling import fd_profile
    ev = load_table(spark, sf_dir, "events")
    return fd_profile(ev, [("event_id", "ts"), ("event_id", "user_id"),
                           ("user_id", "event_type"),
                           ("event_type", "user_id")])


@register("key_emergence", oracle="""
WITH m AS (SELECT max(event_id) AS mx FROM events),
e AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         substr(props, 1, length(props) - 1)
         || (CASE WHEN event_id % 3 = 0
                  THEN ', "session": 1' ELSE '' END)
         || (CASE WHEN event_id * 3 >= 2 * (mx + 1) AND event_id % 2 = 0
                  THEN ', "v2_flag": 1' ELSE '' END)
         || (CASE WHEN event_id * 3 < (mx + 1) AND event_id % 2 = 1
                  THEN ', "legacy_id": 1' ELSE '' END)
         || (CASE WHEN event_id * 3 >= (mx + 1)
                   AND event_id * 3 < 2 * (mx + 1)
                  THEN ', "exp_bucket": 1' ELSE '' END)
         || '}' AS props2
  FROM events, m),
kd AS (
  SELECT k AS key, day, count(*) AS n
  FROM (SELECT day, unnest(json_keys(props2)) AS k FROM e)
  GROUP BY 1, 2),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
per AS (
  SELECT key, min(day) AS first_seen, max(day) AS last_seen,
         CAST(count(*) AS BIGINT) AS days_present,
         CAST(sum(n) AS BIGINT) AS n_docs
  FROM kd GROUP BY key)
SELECT key, first_seen, last_seen, days_present, n_docs,
       CASE WHEN first_seen > lo AND last_seen < hi THEN 'WINDOWED'
            WHEN first_seen > lo THEN 'EMERGENT'
            WHEN last_seen < hi THEN 'RETIRED'
            ELSE 'STABLE' END AS status
FROM per, span
""")
def q_key_emergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution detection over embedded JSON (operators/
    profiling.py:key_emergence): when did each props key first/last
    appear vs the corpus time span — EMERGENT (producer started emitting
    a new field), RETIRED (stopped), WINDOWED (experiment field), STABLE.
    The temporal complement of the reference's per-document key
    tolerance (decoder.go:221-226 skips unknown fields; this asks WHEN
    unknown fields started appearing). The fixture's props all carry one
    key, so both engines derive the identical enriched frame — four keys
    planted by event-id arithmetic against max(event_id), one per status
    (ts is monotone in event_id at every SF, verified) — then each
    engine runs its own detection. Day buckets via epoch-us integer
    division (session-TZ-proof). Scale shape: explode collapses in ONE
    map-combinable (key, day) aggregate; the span is a 1-row broadcast;
    everything downstream is |keys| x |days|.
    """
    from ...operators.profiling import key_emergence
    from ...operators.temporal import epoch_us

    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(F.max("event_id").alias("__mx"))
    eid = F.col("event_id")
    mx = F.col("__mx")
    add = F.concat(
        F.when(eid % 3 == 0, F.lit(', "session": 1')).otherwise(F.lit("")),
        F.when((eid * 3 >= 2 * (mx + 1)) & (eid % 2 == 0),
               F.lit(', "v2_flag": 1')).otherwise(F.lit("")),
        F.when((eid * 3 < (mx + 1)) & (eid % 2 == 1),
               F.lit(', "legacy_id": 1')).otherwise(F.lit("")),
        F.when((eid * 3 >= (mx + 1)) & (eid * 3 < 2 * (mx + 1)),
               F.lit(', "exp_bucket": 1')).otherwise(F.lit("")))
    e = (ev.join(F.broadcast(m))
         .select(
             epoch_us("ts").alias("__us"),
             F.concat(F.expr("substring(props, 1, length(props) - 1)"),
                      add, F.lit("}")).alias("props2"))
         .selectExpr("__us DIV 86400000000 AS day", "props2"))
    keyed = e.select(F.json_object_keys("props2").alias("keys"), "day")
    return key_emergence(keyed, "keys", "day")


# first-digit decade chain shared with operators/profiling.py:first_digit
# — powers of ten are exact doubles, so the chain is engine-identical by
# construction (verified: float(f"1e{k}") == 10.0**k for k in -6..12).
_BENFORD_CASE = " ".join(
    f"WHEN a >= 1e{k} AND a < 1e{k + 1} "
    f"THEN CAST(floor(a / 1e{k}) AS BIGINT)"
    for k in range(-6, 13))
_BENFORD_EXPECTED = " ".join(
    f"WHEN {d} THEN CAST({share!r} AS DOUBLE)" for d, share in (
        (1, 0.3010299956639812), (2, 0.17609125905568124),
        (3, 0.12493873660829992), (4, 0.09691001300805642),
        (5, 0.07918124604762482), (6, 0.06694678963061322),
        (7, 0.05799194697768673), (8, 0.05115252244738129),
        (9, 0.04575749056067514)))


@register("benford_check", oracle=f"""
WITH vals AS (SELECT abs(value) AS a FROM events WHERE value IS NOT NULL),
digits AS (SELECT CASE {_BENFORD_CASE} END AS digit FROM vals),
counts AS (SELECT digit, count(*) AS n FROM digits
           WHERE digit IS NOT NULL GROUP BY digit),
grid AS (SELECT d AS digit, CASE d {_BENFORD_EXPECTED} END AS expected
         FROM generate_series(1, 9) t(d)),
full_g AS (SELECT g.digit, g.expected, coalesce(c.n, 0) AS n
           FROM grid g LEFT JOIN counts c USING (digit)),
tot AS (SELECT sum(n) AS t FROM full_g),
dev AS (SELECT digit, n, expected, n / t AS share,
               abs(n / t - expected) AS adev
        FROM full_g, tot),
m AS (SELECT sum(adev) / 9.0 AS mad FROM dev)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(share, 6) AS share,
       round(expected, 6) AS expected,
       round(adev, 6) AS abs_dev,
       round(mad, 6) AS mad,
       CASE WHEN mad > 0.015 THEN 'RED'
            WHEN mad > 0.012 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM dev, m
""")
def q_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity of events.value (operators/
    profiling.py:benford_profile) — the classic fabricated/truncated/
    unit-mangled numeric-feed detector. First digits come from a pure
    decade when-chain (powers of ten are exact doubles; NO log10 and NO
    double→string rendering, the two places engines disagree), and the
    expected Benford shares are Python-precomputed literals injected
    into BOTH plans, so every double is identical by construction. The
    fixture's near-uniform value column is correctly flagged RED — the
    oracle proves the verdict, not just the counts. One map-combinable
    9-row aggregate touches the corpus; grid completion, MAD, and the
    Nigrini-band verdict are literal-sized arithmetic after it.
    """
    from ...operators.profiling import benford_profile
    ev = load_table(spark, sf_dir, "events")
    return benford_profile(ev, "value")


@register("join_fanout_profile", oracle="""
WITH la AS (SELECT user_id AS k, count(*) AS nl FROM events GROUP BY 1),
ra AS (SELECT user_id AS k, count(*) AS nr FROM events
       WHERE event_type = 'click' GROUP BY 1),
j AS (SELECT coalesce(la.k, ra.k) AS k, nl, nr,
             coalesce(nl, 0) * coalesce(nr, 0) AS fan
      FROM la FULL OUTER JOIN ra ON la.k = ra.k),
s AS (SELECT
        CAST(count(nl) AS BIGINT) AS n_keys_left,
        CAST(count(nr) AS BIGINT) AS n_keys_right,
        CAST(count(*) FILTER (WHERE fan > 0) AS BIGINT) AS n_keys_both,
        CAST(sum(coalesce(nl, 0)) AS BIGINT) AS rows_left,
        CAST(sum(coalesce(nr, 0)) AS BIGINT) AS rows_right,
        CAST(sum(fan) AS BIGINT) AS inner_rows,
        CAST(max(fan) AS BIGINT) AS max_key_fanout
      FROM j),
t AS (SELECT min(k) AS top_key FROM j, s
      WHERE fan = max_key_fanout AND fan > 0)
SELECT n_keys_left, n_keys_right, n_keys_both, rows_left, rows_right,
       inner_rows, max_key_fanout, top_key,
       round(inner_rows / greatest(rows_left, rows_right), 6)
         AS amplification,
       CASE WHEN max_key_fanout > 1000000 THEN 'RED'
            WHEN inner_rows / greatest(rows_left, rows_right) > 10.0
                 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM s, t
""")
def q_join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join explosion guard (operators/referential.py:
    join_fanout_profile): EXACT inner-join output size, worst-key
    fan-out, and amplification for joining all events against click
    events on user_id — computed from the two (key, count) aggregates
    without running the join. The planner-guard validation a 100 TB
    pipeline runs before an expensive join: both sides collapse to
    key-cardinality-sized frames in map-combinable aggregates; the
    top-offender key is the MINIMUM key attaining the max fan-out, so
    ties cannot flap the hash. Fixture amplification lands in the
    YELLOW band, so the verdict logic is exercised, not vacuous.
    """
    from ...operators.referential import join_fanout_profile
    ev = load_table(spark, sf_dir, "events")
    return join_fanout_profile(
        ev, ev.filter(F.col("event_type") == "click"), "user_id")


@register("fuzzy_referential", oracle="""
WITH ids AS (
  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS k, doc_id
  FROM documents),
refs AS (
  SELECT CASE WHEN doc_id % 10 = 0 THEN substr(k, 1, 5) || substr(k, 7)
              ELSE k END AS ref_key
  FROM ids),
cand AS (
  SELECT r.ref_key, i.k, levenshtein(r.ref_key, i.k) AS d
  FROM refs r JOIN ids i ON levenshtein(r.ref_key, i.k) <= 1),
best AS (
  SELECT ref_key, k, d,
         row_number() OVER (PARTITION BY ref_key ORDER BY d, k) AS rn
  FROM cand)
SELECT ref_key, k AS matched_key, CAST(d AS BIGINT) AS dist
FROM best WHERE rn = 1
""")
def q_fuzzy_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant referential integrity (operators/fuzzy.py): every
    10th reference key gets a deterministic single-character deletion on
    BOTH engines, then each ref finds its best canonical key within edit
    distance 1. Spark never evaluates an O(n·m) similarity join: the
    deletion-neighborhood identity (FastSS) turns lev<=1 into an equality
    join on shared variants with an exact levenshtein verify on the
    candidate set only. The oracle runs the naive inequality join —
    affordable only in DuckDB at this SF — so a match also proves the
    blocking loses no pair.
    """
    from ...operators.fuzzy import best_fuzzy_match
    d = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"),
                 F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias("k"),
        "doc_id")
    refs = d.select(
        F.when(F.pmod("doc_id", F.lit(10)) == 0,
               F.concat(F.col("k").substr(1, 5), F.col("k").substr(7, 12)))
        .otherwise(F.col("k")).alias("ref_key"))
    return best_fuzzy_match(refs, d.select("k"), "ref_key", "k")


@register("pii_scan", oracle=r"""
WITH a AS (
  SELECT source,
         text || CASE doc_id % 7
             WHEN 0 THEN ' reach user7@example.com'
             WHEN 1 THEN ' call 555-0142 now'
             WHEN 2 THEN ' host at 192.168.0.42'
             ELSE '' END AS text
  FROM documents),
h AS (
  SELECT source,
    len(regexp_extract_all(text,
        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS e,
    len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS p,
    len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS i
  FROM a)
SELECT source, count(*) AS n_docs,
       CAST(count(*) FILTER (WHERE e + p + i > 0) AS BIGINT)
         AS docs_with_pii,
       CAST(sum(e) AS BIGINT) AS email_hits,
       CAST(sum(p) AS BIGINT) AS phone_hits,
       CAST(sum(i) AS BIGINT) AS ipv4_hits
FROM h GROUP BY source
""")
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-PII surface scan (operators/text_filters.py:pii_scan):
    per-source document counts, documents with any hit, and per-pattern
    totals for email / phone / IPv4 surface forms. The synthetic corpus
    contains no PII, so both engines first append the same deterministic
    PII suffixes (by doc_id residue) — the regexes then have real and
    absent matches to find. Map-only regex counting (RE2-and-Java-safe
    patterns) into a tiny per-source aggregate.
    """
    from ...operators.text_filters import pii_scan
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(F.pmod("doc_id", F.lit(7)) == 0,
               F.lit(" reach user7@example.com"))
        .when(F.pmod("doc_id", F.lit(7)) == 1, F.lit(" call 555-0142 now"))
        .when(F.pmod("doc_id", F.lit(7)) == 2,
              F.lit(" host at 192.168.0.42"))
        .otherwise(F.lit("")))
    return pii_scan(d.select("source", aug.alias("text")),
                    "text", ["source"])


@register("text_repetition", oracle="""
WITH g AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n,
         list_distinct(string_split(text, ' ')) AS dt,
         [t[i] || ' ' || t[i + 1]
          for i in generate_series(1, len(string_split(text, ' ')) - 1)]
           AS bg
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)),
f AS (
  SELECT doc_id, n,
         len(dt) / n AS distinct_ratio,
         list_max([len(list_filter(t, x -> x = d)) for d in dt]) / n
           AS top_token_share,
         CASE WHEN len(bg) > 0
              THEN 1.0 - len(list_distinct(bg)) / len(bg)
              ELSE 0.0 END AS dup_bigram_fraction
  FROM g)
SELECT doc_id, n AS n_tokens,
       round(distinct_ratio, 6) AS distinct_ratio,
       round(top_token_share, 6) AS top_token_share,
       round(dup_bigram_fraction, 6) AS dup_bigram_fraction,
       top_token_share > 0.2 OR distinct_ratio < 0.3 AS flagged
FROM f
""")
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate detection (operators/text_filters.py:
    repetition_report) — the MassiveText-style filters: distinct-token
    ratio, top-token share, duplicate-bigram fraction, and the gate
    verdict. Pure per-row array arithmetic (zip_with bigrams, counted
    filters over the distinct set) — NO shuffle at all, because a
    corpus-wide (doc, token) group-by for a per-doc ratio would be the
    wrong plan at any scale. The flag compares UNROUNDED ratios — exact
    integer-ratio doubles, bit-identical cross-engine.
    """
    from ...operators.text_filters import repetition_report
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_report(d, "doc_id", "text")


@register("text_surprisal", oracle="""
WITH sp AS (
  SELECT source,
         string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM (SELECT source,
               unnest([t[i] || ' ' || t[i + 1]
                       for i in generate_series(1, len(t) - 1)]) AS bg
        FROM (SELECT source, string_split(text, ' ') AS t
              FROM documents))),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM sp GROUP BY w1, w2),
c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
j AS (SELECT sp.source, -log2(c2.n2 / c1.n1) AS s
      FROM sp JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
SELECT source, count(*) AS n_bigrams, round(avg(s), 6) AS avg_surprisal
FROM j GROUP BY source
""")
def q_text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical text quality via corpus-self bigram surprisal
    (operators/text_lm.py): train the maximum-likelihood bigram LM in one
    pass (context totals re-aggregate the vocabulary-sized bigram table,
    never the corpus), then score every bigram occurrence -log2(n2/n1)
    through a broadcast LM join and reduce per source. Probabilities are
    exact rationals (no smoothing; the corpus scores itself, so every
    bigram was seen), so both engines compute identical doubles.
    """
    from ...operators.text_lm import surprisal_scores
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    return surprisal_scores(d, "text", ["source"])


@register("embedding_dim_stats", oracle="""
WITH x AS (
  SELECT unnest(embedding) AS v, unnest(range(len(embedding))) AS pos
  FROM embeddings)
SELECT pos, count(*) AS n,
       round(avg(v::DOUBLE), 6) AS mean,
       round(stddev_samp(v::DOUBLE), 6) AS stddev,
       CAST(count(*) FILTER (WHERE v = 0) AS BIGINT) AS n_zero,
       stddev_samp(v::DOUBLE) < 1e-6 AS is_dead
FROM x GROUP BY pos
""")
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health (operators/embedding_qa.py:
    dimension_stats): mean/stddev/zero-count per position, flagging
    collapsed (dead) dimensions that silently shrink every cosine's
    effective rank. The posexplode multiplies rows ×64, but map-side
    combine collapses each task to ≤64 rows before the shuffle — the
    exchange carries |tasks|×dim rows regardless of corpus size.
    """
    from ...operators.embedding_qa import dimension_stats
    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    return dimension_stats(e, "embedding")


@register("embedding_norms", oracle="""
WITH p AS (
  SELECT CASE WHEN vec_id % 100 = 0 THEN 0.0
              WHEN vec_id % 100 = 1 THEN 2.5
              ELSE 1.0 END AS s, embedding
  FROM embeddings),
n AS (
  SELECT sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          [ (x::DOUBLE * s) * (x::DOUBLE * s) for x in embedding ]),
          (a, b) -> a + b)) AS nrm
  FROM p)
SELECT count(*) AS n_vecs,
       CAST(count(*) FILTER (WHERE nrm = 0) AS BIGINT) AS n_zero_norm,
       round(min(nrm), 6) AS min_norm,
       round(avg(nrm), 6) AS mean_norm,
       round(max(nrm), 6) AS max_norm
FROM n
""")
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm-distribution QA (operators/embedding_qa.py:norm_stats) —
    zero-norm vectors NaN every cosine against them, so this is the gate
    before an embedding column feeds dedup or ANN. The fixture is
    pre-normalized (all norms exactly 1), so both engines first derive
    the same deterministic perturbation — every 100th vector zeroed,
    every (100k+1)th scaled 2.5× — making min/mean/max and the zero
    count all informative. Map-only fold, single-row reduction.
    """
    from ...operators.embedding_qa import norm_stats
    e = load_table(spark, sf_dir, "embeddings")
    s = (F.when(F.pmod("vec_id", F.lit(100)) == 0, F.lit(0.0))
         .when(F.pmod("vec_id", F.lit(100)) == 1, F.lit(2.5))
         .otherwise(F.lit(1.0)))
    scaled = e.select(F.transform(
        "embedding", lambda x: x.cast("double") * s).alias("embedding"))
    return norm_stats(scaled, "embedding")


@register("embedding_isotropy", oracle="""
WITH nv AS (
  SELECT embedding,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
              [ x::DOUBLE * x::DOUBLE for x in embedding ]),
              (a, b) -> a + b)) AS nrm
  FROM embeddings),
u AS (
  SELECT [ x::DOUBLE / nrm for x in embedding ] AS uvec
  FROM nv WHERE nrm > 0),
dims AS (
  SELECT pos, sum(x) AS s
  FROM (SELECT unnest(uvec) AS x,
               generate_subscripts(uvec, 1) AS pos
        FROM u) t
  GROUP BY pos),
folded AS (
  SELECT sum(s * s) AS s2, CAST(count(*) AS BIGINT) AS dim FROM dims),
counts AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM u)
SELECT n_vecs, dim,
       round((s2 - n_vecs) / (n_vecs * (n_vecs - 1)), 6)
         AS mean_pairwise_cos
FROM counts, folded
""")
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-geometry QA (operators/embedding_qa.py:isotropy_stats):
    the EXACT mean pairwise cosine over all n(n−1) ordered pairs of
    unit vectors, computed without materializing a single pair via
    ||Σ x̂||² = n + Σ_{i≠j} x̂_i·x̂_j. Anisotropic ("cone") geometry is
    the failure mode that silently shifts every cosine threshold the
    dedup/ANN families rely on — an encoder change shows up here first.
    The oracle replays the same algebra (per-dimension sums of
    normalized lists, squared-sum fold) in DuckDB.

    Scale shape: ONE scan — normalize map-side, posexplode collapsed by
    map-side combine to ≤ dim rows per task before the single
    per-dimension exchange, then a dim-row fold in which the per-pos
    row count doubles as n_vecs (every surviving vector contributes
    exactly one value per pos), so no second count branch or 1-row join
    exists. The n² pair space never exists anywhere.
    """
    from ...operators.embedding_qa import isotropy_stats
    e = load_table(spark, sf_dir, "embeddings")
    return isotropy_stats(e, "embedding")


@register("incremental_stats_merge", oracle="""
SELECT event_type,
       count(value) AS n_rows,
       CAST(count(*) - count(value) AS BIGINT) AS n_null,
       round(avg(value), 6) AS mean,
       round(stddev_samp(value), 6) AS stddev,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type
""")
def q_incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental validation (operators/incremental.py): events are cut
    into 6 'ingest batches' (pmod of event_id), each batch reduced to a
    constant-size algebraic state (n, Σx, Σx², min, max), and the corpus
    stats are recovered ONLY from the merged states — the pattern that
    lets a ledger-resumed run fold stored per-partition states instead of
    rescanning validated data. The oracle computes the same stats directly
    from raw, so a match proves the merge is exact, not approximately
    right.
    """
    from ...operators.incremental import merge_moments, partial_moments
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.pmod("event_id", F.lit(6)).alias("batch"))
    partials = partial_moments(ev, "value", "batch", ["event_type"])
    return merge_moments(partials, ["event_type"])


@register("uniqueness_incremental")
def q_uniqueness_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users via per-batch HLL sketches merged with
    ``hll_union_agg`` (operators/incremental.py) next to the exact count —
    the incremental twin of `uniqueness_approx`. No SQL oracle (DuckDB
    cannot reproduce a DataSketches estimate); the driver records rows-
    only, and pytest pins the strong property: union-of-batch-sketches
    equals the single-pass sketch exactly, and both sit within the HLL
    error bound of the exact count.
    """
    from ...operators.incremental import (
        merge_distinct_sketches,
        partial_distinct_sketch,
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.pmod("event_id", F.lit(6)).alias("batch"))
    merged = merge_distinct_sketches(
        partial_distinct_sketch(ev, "user_id", "batch"))
    exact = ev.agg(F.countDistinct("user_id").alias("distinct_exact"))
    return merged.crossJoin(exact)


@register("stratified_sample", oracle="""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))
        ::BIGINT % 1000
      < CASE lang WHEN 'en' THEN 200 WHEN 'zh' THEN 800 ELSE 500 END
""")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus rebalancing
    (operators/curation.py:stratified_sample): downsample the head
    language (en keeps 20%), keep more of the tail (zh 80%, rest 50%).
    Map-only — the plan has NO exchange at all; membership is the md5
    bucket of doc_id, so the oracle reproduces the exact sampled row set,
    and a grown corpus never flips an existing row's membership.
    """
    from ...operators.curation import stratified_sample
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(d, "doc_id", "lang",
                             {"en": 200, "zh": 800}, default_per_mille=500)


@register("temperature_sample", oracle="""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
t AS (SELECT sum(n) AS tot FROM c),
w AS (SELECT lang, n, tot, sqrt(n / tot) AS w FROM c, t),
z AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(w ORDER BY lang)),
                         (a, b) -> a + b) AS z
      FROM w),
r AS (SELECT lang, n,
        CAST(floor(least(1.0, ((0.5 * tot) * (w / z)) / n) * 1048576.0)
             AS BIGINT) AS thresh
      FROM w, z),
k AS (SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN r ON d.lang = r.lang
      WHERE ('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
              ::BIGINT % 1048576 < r.thresh
      GROUP BY d.lang)
SELECT r.lang, CAST(r.n AS BIGINT) AS n_before, r.thresh,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN k ON r.lang = k.lang
""")
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling (operators/curation.py:temperature_sample,
    alpha=0.5, kept budget 50%): per-language keep thresholds DERIVED
    from the measured distribution (q ∝ √p — the mT5 multilingual
    balancing rule), membership by deterministic md5 bucket. The oracle
    replays the whole derivation — counts → √-weights → sequentially
    folded normalizer → integer thresholds → kept membership — with
    bit-identical doubles (sqrt/division are IEEE-exact; the fold order
    is pinned lexically on both engines), then counts kept rows per
    language exactly.
    """
    from ...operators.curation import temperature_sample
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept, rates = temperature_sample(d, "doc_id", "lang",
                                     alpha=0.5, keep_frac=0.5)
    report = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("__k"))
    return (rates.join(report, "lang", "left")
            .select("lang",
                    F.col("n_before"),
                    F.col("thresh"),
                    F.coalesce(F.col("__k"), F.lit(0).cast("long"))
                    .alias("n_kept")))


@register("token_heavy_hitters", oracle="""
WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
           FROM documents),
c AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY lang, tok),
r AS (SELECT lang, tok, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, tok) AS rk
      FROM c)
SELECT lang, tok, n, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 5
""")
def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 tokens per language (operators/curation.py:
    heavy_hitters) — the vocabulary-head report every corpus audit wants.
    The explode feeds a partial+final hash aggregate (map-side combine
    shrinks the token stream to vocabulary size), and only that aggregate
    reaches the per-group rank window; ties break on the token so the
    result is total-order deterministic.
    """
    from ...operators.curation import token_heavy_hitters
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    return token_heavy_hitters(d, "text", ["lang"], k=5)


@register("outlier_mad", oracle="""
WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY event_type),
d AS (SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
      FROM events e JOIN m USING (event_type)),
s AS (SELECT event_type, any_value(med) AS med,
             quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY event_type)
SELECT d.event_type, count(*) AS n,
       round(any_value(s.med), 6) AS median_value,
       round(any_value(s.mad), 6) AS mad,
       count(*) FILTER (WHERE d.dev > 3 * 1.4826 * s.mad) AS n_outliers
FROM d JOIN s USING (event_type) GROUP BY d.event_type
""")
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier report via the median/MAD z-score
    (operators/curation.py:robust_outliers) — immune to the outliers it
    hunts, unlike mean/stddev. Exact percentiles here (Spark `percentile`
    and DuckDB `quantile_cont` both linearly interpolate, so median and
    MAD agree to the last bit); at 10^12 rows the same operator runs with
    approx=True, swapping in the mergeable percentile_approx sketch — the
    pytest twin pins approx-vs-exact drift.
    """
    from ...operators.curation import robust_outliers
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return robust_outliers(ev, "value", ["event_type"], z=3.0)


@register("curation_pipeline", oracle="""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
         len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             ['the','a','of','and','is'])) AS s_en,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             ['der','die','das','und','ist'])) AS s_de,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             ['le','les','des','et','est'])) AS s_fr,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             ['el','los','las','y','es'])) AS s_es,
         list_reduce(list_prepend(0::BIGINT,
             [('0x' || substr(md5(t), 1, 8))::BIGINT
              for t in string_split(text, ' ')]),
           (acc, h) -> (acc * 131 + h) % 2147483647) AS fp
  FROM all_docs),
k AS (
  SELECT doc_id, n_tokens, fp FROM f
  WHERE greatest(s_en, s_de, s_fr, s_es) >= 1
    AND least(1.0, n_tokens / 50.0) * 0.5
        + (n_stop::DOUBLE / n_tokens) * 0.3
        + (1.0 - n_punct::DOUBLE / n_chars) * 0.2 >= 0.5),
d AS (
  SELECT fp, min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
         count(*) AS n_copies
  FROM k GROUP BY fp),
s AS (
  SELECT CASE WHEN b < 960 THEN 'train' WHEN b < 980 THEN 'val'
              ELSE 'test' END AS split, n_tokens, n_copies
  FROM (SELECT ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % 1000 AS b,
               n_tokens, n_copies FROM d))
SELECT split, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_dups_removed
FROM s GROUP BY split
""")
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel (operators/curation.py:curate_corpus):
    language-ID gate → quality-score gate (>= 0.5) → exact fingerprint
    dedup keeping the smallest id → deterministic md5 split → per-split
    composition report. Runs over documents ∪ planted exact copies so the
    dedup stage does real work (n_dups_removed > 0). Every stage is
    shared deterministic arithmetic, so the oracle replays the WHOLE
    funnel — filters, dedup survivors, split buckets — bit-for-bit; a
    match certifies the composition, not just each stage in isolation.
    """
    from ...operators.curation import curate_corpus
    return curate_corpus(_docs_with_planted_copies(spark, sf_dir))


@register("violation_samples", oracle=f"""
WITH r AS (
  SELECT event_type, event_id, {_DIRTY_NUMBER_RAW_SQL} AS raw FROM events),
red AS (
  SELECT event_type, event_id, raw FROM r
  WHERE raw IS NOT NULL
    AND NOT regexp_matches(replace(replace(trim(raw), ' ', ''), ',', ''),
                           '^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$')
    AND lower(trim(raw)) NOT IN ('true', 'false')),
ranked AS (
  SELECT event_type, event_id, substring(raw, 1, 50) AS sample_raw,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM red)
SELECT event_type, event_id, sample_raw, rn FROM ranked WHERE rn <= 2
""")
def q_violation_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k example rows per violating partition (SURVEY §2.9 window
    usage): RED rows from the real coercion path, ranked by a
    deterministic key inside each event_type, k=2, raw value truncated to
    50 chars mirroring the reference's limitedStr (helpers.go:8-23). The
    window shuffles only the filtered violation rows — at production
    scale the RED subset is orders of magnitude smaller than the scan.
    """
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    raw = _dirty_number_raw()
    red = ev.select("event_type", "event_id", raw.alias("raw")).where(
        coerce_number(F.col("raw"), CFG).verdict == "RED")
    w = Window.partitionBy("event_type").orderBy("event_id")
    return (red.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2)
            .select("event_type", "event_id",
                    F.substring("raw", 1, 50).alias("sample_raw"),
                    F.col("rn").cast("long").alias("rn")))


@register("transcript_integrity", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
flags AS (
  SELECT codec,
         CASE WHEN i % 1000 = 999 AND i > 0 THEN i - 1 ELSE i END AS base_i
  FROM full_),
marked AS (
  SELECT codec,
         (base_i % 991 = 990) AS is_orphan,
         (base_i % 991 <> 990 AND base_i % 983 = 982) AS is_mismatch
  FROM flags)
SELECT codec,
       count(*) AS n_rows,
       count(*) FILTER (WHERE is_orphan) AS n_orphan,
       count(*) FILTER (WHERE is_mismatch) AS n_mismatch,
       count(*) FILTER (WHERE NOT is_orphan AND NOT is_mismatch) AS n_ok
FROM marked GROUP BY codec
""")
def q_transcript_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential + transcript-equality over the audio fixture: clips
    left-join the manifest (broadcast — the dim side is the small one),
    orphans are manifest misses, mismatches are real string inequality on
    the joined transcripts. The oracle never builds either table: planted
    orphan/mismatch positions are pure row-id arithmetic, and codec comes
    from the CRC-32 fold — so the join results are verified against an
    implementation that cannot share a bug with the join.
    """
    from ...fixtures.gen import generate_clips, generate_manifest
    clips = generate_clips(spark, _SNR_N, partitions=8)
    manifest = generate_manifest(spark, _SNR_N, partitions=4).select(
        "clip_id", F.col("transcript").alias("m_transcript"))
    joined = clips.select("clip_id", "codec", "transcript").join(
        F.broadcast(manifest), "clip_id", "left")
    orphan = F.col("m_transcript").isNull()
    mismatch = ~orphan & (F.col("transcript") != F.col("m_transcript"))
    return joined.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(orphan.cast("long")).alias("n_orphan"),
        F.sum(mismatch.cast("long")).alias("n_mismatch"),
        F.sum((~orphan & ~mismatch).cast("long")).alias("n_ok"),
    )


@register("audio_gain_normalize", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
per AS (
  SELECT i, clip_id, max(abs(v)) AS ma FROM samples GROUP BY i, clip_id),
scaled AS (
  SELECT s.i, s.clip_id, s.codec, s.j,
         CAST(round_even(CAST(s.v AS DOUBLE)
                         * (CAST(30000 AS DOUBLE) / CAST(p.ma AS DOUBLE)),
                         0) AS BIGINT) AS v2
  FROM samples s JOIN per p USING (i, clip_id)),
per_row AS (
  SELECT i, clip_id, codec, COUNT(*) AS n, max(abs(v2)) AS pk,
         SUM(v2) AS s, SUM(abs(v2)) AS sa, SUM(j * v2) AS jv
  FROM scaled GROUP BY i, clip_id, codec)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(SUM(n) AS BIGINT) AS n_samples,
       CAST(max(pk) AS BIGINT) AS max_peak,
       CAST(min(pk) AS BIGINT) AS min_peak,
       CAST(SUM(s) AS BIGINT) AS pcm_sum,
       CAST(SUM(sa) AS BIGINT) AS pcm_abs_sum,
       CAST(SUM(jv) AS BIGINT) AS pcm_jv_sum
FROM per_row GROUP BY codec
""")
def q_audio_gain_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak gain normalization as a sample-exact TRANSFORM contract
    (operators/segmentation.py:normalize_gain): decode → scale every
    sample by 30000/max|v| (one IEEE double divide + multiply,
    round-half-even) → re-encode WAV → re-decode → digest. The oracle
    replays the transform in pure SQL over the analytic per-sample twin
    (round_even on the identical double products), so a hash match
    proves every output sample of every clean clip — across the scale,
    the lattice re-rounding, AND the container write/read round-trip —
    bit-for-bit. Noise-planted rows are excluded by the engine's own
    reference-SNR label on one side and the generator contract on the
    other, so a misclassification also breaks the count match.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.segmentation import normalize_gain
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return (normalize_gain(clips, target_peak=30000)
            .filter(F.col("verdict") == "GREEN")
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum("n_samples").alias("n_samples"),
                 F.max("out_peak").alias("max_peak"),
                 F.min("out_peak").alias("min_peak"),
                 F.sum("pcm_sum").alias("pcm_sum"),
                 F.sum("pcm_abs_sum").alias("pcm_abs_sum"),
                 F.sum("pcm_jv_sum").alias("pcm_jv_sum")))


@register("audio_perceptual_dedup", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
green AS (
  SELECT codec, 100 + seed % 997 AS f0
  FROM full_ WHERE i % 997 <> 996),
cls AS (
  SELECT f0, count(*) AS n_c FROM green GROUP BY f0)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(count(*) FILTER (WHERE n_c > 1) AS BIGINT) AS n_dup_clips,
       CAST(count(DISTINCT f0) FILTER (WHERE n_c > 1) AS BIGINT)
         AS n_dup_classes
FROM green JOIN cls USING (f0) GROUP BY codec
""")
def q_audio_perceptual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (content-level) audio near-dup detection: clips group
    on a gain/phase/dither-invariant fingerprint — the sub-Hz refined
    fundamental estimate from perceptual_fingerprint
    (operators/multimodal.py), the audio analog of SimHash banding.
    Exact dedup (audio_content_dedup) only catches byte-identical
    payloads; this catches re-gained / re-dithered / re-containered
    copies of the same tone. The oracle derives every class from the
    generator contract (f0 = 100 + seed % 997, seed via the CRC-32 SQL
    fold), so a count match proves the Hann+zero-pad+parabolic estimate
    recovers the EXACT integer fundamental for every clean clip in the
    fixture — including same-f0 clips whose phases differ (genuinely
    perceptually identical, correctly grouped). Scale shape: map-only
    fingerprint, then a groupBy on one long per clip; the class table
    (≤997 rows) broadcasts back for attribution; payloads never shuffle.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import perceptual_fingerprint
    clips = generate_clips(spark, _SNR_N, partitions=8)
    fp = perceptual_fingerprint(clips).filter(
        F.col("verdict") == "GREEN").select("codec", "fp")
    # aggregate to the class-sized (codec, fp) table FIRST: payloads are
    # decoded exactly once and the shuffle carries map-combined partials
    # (a fp self-join would re-evaluate the fingerprint stage on the
    # probe side — twice the decode cost at 10^12 clips); class totals
    # are then a window over the tiny table, no second corpus pass
    from pyspark.sql import Window
    per = fp.groupBy("codec", "fp").agg(F.count(F.lit(1)).alias("n_cf"))
    n_c = F.sum("n_cf").over(Window.partitionBy("fp"))
    return (per.withColumn("n_c", n_c)
            .groupBy("codec")
            .agg(F.sum("n_cf").alias("n_clips"),
                 F.sum(F.when(F.col("n_c") > 1, F.col("n_cf"))
                       .otherwise(F.lit(0))).alias("n_dup_clips"),
                 F.count_distinct(
                     F.when(F.col("n_c") > 1, F.col("fp")))
                 .alias("n_dup_classes")))


@register("transcript_rate_check", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE dur_ms IS NOT NULL) AS BIGINT) AS n_ok,
       CAST(count(*) FILTER (WHERE dur_ms IS NULL) AS BIGINT)
         AS n_unratable,
       CAST(0 AS BIGINT) AS n_too_slow,
       CAST(0 AS BIGINT) AS n_too_fast
FROM full_ GROUP BY codec
""")
def q_transcript_rate_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field speech-rate band check (transcript chars per second
    of audio, operators/referential.py:speech_rate_check). The fixture
    contract pins every ratable clip inside the band — transcripts are
    4-11 words of 3-10 chars (15-120 chars) over 50-200 ms (75-2400
    cps, band [10, 5000]) — and null-dur planting (i % 101) makes rows
    UNRATABLE, so the oracle derives every outcome count from row-id
    arithmetic without the PCG transcripts. The band is a sharp detector
    anyway: misreading dur_ms as seconds divides every rate by 1000 and
    flips the whole corpus to TOO_SLOW, breaking n_ok for every codec.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.referential import speech_rate_check
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return speech_rate_check(clips, group_cols=["codec"])


@register("multimodal_frame_sample", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
per AS (
  SELECT s.i, s.clip_id,
         s.j // GREATEST(1, c.sr_hz * 25 // 1000) AS frame_idx,
         COUNT(*) AS fn, SUM(s.v * s.v) AS ss
  FROM samples s JOIN clean c USING (i, clip_id)
  WHERE s.j // GREATEST(1, c.sr_hz * 25 // 1000)
        < GREATEST(1, c.n // GREATEST(1, c.sr_hz * 25 // 1000))
  GROUP BY 1, 2, 3)
SELECT CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(SUM(fn) AS BIGINT) AS n_samples,
       CAST(SUM(ss) AS BIGINT) AS sum_sq,
       round(sqrt(SUM(ss) / SUM(fn)), 6) AS pooled_rms
FROM per GROUP BY frame_idx
""")
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level content energy, sample-exact cross-engine: Spark
    decodes the real WAV bytes and digests each 25 ms frame of the
    recovered int16 lattice (count, sum of squares); the oracle NEVER
    reads a byte — it regroups the same pure-SQL trigonometry samples as
    pcm_content_exact by frame index (j // win, win = sr*25ms). The
    pooled per-frame-index RMS is derived from the exact integer
    aggregates with one correctly-rounded divide + sqrt on both engines
    (positive values, so HALF_UP == half-away at round 6). The oracle
    takes every frame because the fixture's duration contract
    (dur_ms <= 200, default 100) keeps n_frames <= max_frames=8 — the
    evenly-spaced linspace subsample only activates on longer clips.
    Noise-planted clips are excluded by the engine's own reference-SNR
    verdict on one side and the generator contract on the other."""
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import frame_sample
    clips = generate_clips(spark, _SNR_N, partitions=8)
    fs = frame_sample(clips).filter(F.col("verdict") == "GREEN")
    return (fs.groupBy("frame_idx")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.sum("frame_n").alias("n_samples"),
                 F.sum("frame_ss").alias("sum_sq"))
            .withColumn("pooled_rms",
                        F.round(F.sqrt(F.col("sum_sq")
                                       / F.col("n_samples")), 6)))


