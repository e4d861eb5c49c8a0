"""Registry section: §2.7 audio path: SNR invariant + full validation suite over the synthesized clips table, plus the flagship per-partition verdict roll-up.

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    CFG,
    coerce_bool,
    coerce_number,
    load_table,
    register,
    rollup_verdicts,
    row_verdict,
)
from .core import (
    _DIRTY_BOOL_RAW_SQL,
    _DIRTY_NUMBER_RAW_SQL,
    _dirty_bool_raw,
    _dirty_number_raw,
)

# =========================================================================
# §2.7 audio path — SNR invariant + full suite over the synthesized clips
# table (BASELINE.json input_hint schema). Not SQL-expressible (WAV decode)
# ⇒ no oracle: the driver records rows-only checks; pytest holds the
# closed-form golden assertions (tests/test_suite.py).
# =========================================================================

_SNR_N = 2000  # deterministic fixture size for driver-visible audio queries

_CLIPS_CLOSED_FORM_CTE = f"""
ids AS (SELECT i FROM range(0, {_SNR_N}) t(i)),
base AS (
  SELECT i,
         'clip-' || lpad(CAST(CASE WHEN i % 1000 = 999 AND i > 0
                                   THEN i - 1 ELSE i END AS VARCHAR),
                         12, '0') AS clip_id
  FROM ids),
seeded AS (
  SELECT i, clip_id,
    xor(list_reduce(
      list_prepend(4294967295,
        [CAST(ascii(substring(clip_id, j, 1)) AS BIGINT)
         for j in generate_series(1, length(clip_id))]),
      (acc, b) -> list_reduce(
        list_prepend(xor(acc, b), [0, 0, 0, 0, 0, 0, 0, 0]),
        (x, y) -> xor(x >> 1,
                      CASE WHEN x & 1 = 1 THEN 3988292384 ELSE 0 END))),
      4294967295) AS seed
  FROM base),
rows_ AS (
  SELECT i, seed,
    CASE WHEN (seed % 10000) / 10000.0 < 0.70 THEN 'pcm_s16le'
         WHEN (seed % 10000) / 10000.0 < 0.70 + 0.14 THEN 'flac'
         WHEN (seed % 10000) / 10000.0 < 0.70 + 0.14 + 0.10 THEN 'opus'
         ELSE 'mp3' END AS codec
  FROM seeded),
full_ AS (
  SELECT i, seed, codec,
    CASE WHEN codec = 'opus'
         THEN CASE WHEN seed % 2 = 0 THEN 44100 ELSE 48000 END
         ELSE CASE seed % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                   WHEN 2 THEN 22050 WHEN 3 THEN 44100
                   ELSE 48000 END END AS sr_hz,
    CASE WHEN i % 101 = 100 THEN NULL ELSE 50 + seed % 151 END AS dur_ms
  FROM rows_)"""




@register("snr_partition_verdicts", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict
FROM full_ GROUP BY codec
""")
def q_snr_partition_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-codec SNR>=30dB verdict roll-up over the end-to-end decode
    path (Arrow PCM decode → SNR vs regenerated reference → worst-verdict
    rollup, operators/snr.py). The oracle never reads a byte: the planted
    corruption set is generator-determined (row i % 997 == 996 gets
    uniform ±0.3 noise ⇒ SNR ≈ 7 dB; clean clips sit at PCM16
    quantization noise ≈ 90 dB), and each row's codec is re-derived via
    the CRC-32 SQL fold — so a match proves decode+SNR+rollup classify
    exactly the planted rows. min/mean snr_db stay in the suite/pytest
    goldens (real dB values are not SQL-derivable).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import snr_check, snr_partition_rollup
    clips = generate_clips(spark, _SNR_N, partitions=8)
    roll = snr_partition_rollup(snr_check(clips, extra_cols=["codec"]),
                                ["codec"])
    return roll.select("codec", "n_rows", "n_green", "n_red", "verdict")


# Per-sample analytic twin of the decoded PCM stream: every clean clip's
# int16 samples recomputed in pure SQL with the float pipeline pinned to
# numpy's (float64 sin args — bit-identical via shared libm; CAST AS REAL
# = astype(float32); REAL×REAL = NEP-50 float32 multiply; round_even =
# np.round half-even). Validated bit-for-bit over the full fixture.
_PCM_SAMPLES_CTE = f"""{_CLIPS_CLOSED_FORM_CTE},
clean AS (
  SELECT f.i, b.clip_id, f.codec, f.sr_hz,
         GREATEST(1, CAST(floor(f.sr_hz * COALESCE(f.dur_ms, 100) / 1000.0)
                          AS BIGINT)) AS n,
         CAST(100 + f.seed % 997 AS DOUBLE) AS f0,
         (f.seed % 31) * CAST(0.1 AS DOUBLE) AS p2,
         (f.seed % 17) * CAST(0.2 AS DOUBLE) AS p3
  FROM full_ f JOIN base b USING (i)
  WHERE f.i % 997 <> 996),
samples AS (
  SELECT c.i, c.clip_id, c.codec, s.j AS j,
    CAST(round_even(
      CAST(CAST(0.5 AS DOUBLE)
             * sin(2*pi()*f0*(CAST(s.j AS DOUBLE)/sr_hz))
         + CAST(0.2 AS DOUBLE)
             * sin(2*pi()*(CAST(2.0 AS DOUBLE)*f0)
                   *(CAST(s.j AS DOUBLE)/sr_hz) + p2)
         + CAST(0.05 AS DOUBLE)
             * sin(2*pi()*(CAST(3.0 AS DOUBLE)*f0)
                   *(CAST(s.j AS DOUBLE)/sr_hz) + p3)
       AS REAL) * CAST(32767.0 AS REAL), 0) AS BIGINT) AS v
  FROM clean c, LATERAL (SELECT unnest(range(0, c.n)) AS j) s)"""


@register("pcm_content_exact", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
per_row AS (
  SELECT i, clip_id, COUNT(*) AS n, SUM(v) AS s, SUM(abs(v)) AS sa,
         SUM(j*v) AS jv
  FROM samples GROUP BY i, clip_id)
SELECT clip_id, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS n_samples,
       CAST(SUM(s) AS BIGINT) AS pcm_sum,
       CAST(SUM(sa) AS BIGINT) AS pcm_abs_sum,
       CAST(SUM(jv) AS BIGINT) AS pcm_jv_sum
FROM per_row GROUP BY clip_id
""")
def q_pcm_content_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-exact decoded-PCM content check — the north rule's
    "decoded-PCM allclose" invariant (BASELINE.json input_hint) verified
    cross-engine at the individual-sample level. Spark decodes the real
    WAV bytes (operators/snr.py:pcm_digest, Arrow map-only) and emits
    per-clip integer digests of the decoded samples (count, Σv, Σ|v|,
    Σ j·v); the oracle NEVER reads a byte — it recomputes the same
    integers from pure SQL trigonometry: the generator's 3-harmonic
    waveform (fixtures/signal.py:36-47) evaluated per sample with the
    float pipeline pinned to numpy's (float64 sin args bit-identical by
    shared libm; CAST AS REAL = astype(float32); REAL×REAL multiply =
    NEP-50 float32 multiply; round_even = np.round half-even), validated
    bit-for-bit over every clean clip in the fixture. A hash match
    therefore proves container decode is sample-exact end-to-end, far
    stronger than the 30 dB SNR band. Clips failing the SNR gate (the
    planted i%997 noise set — numpy-PCG, deliberately not SQL-derivable)
    are excluded on BOTH sides: Spark by its own decode verdict, the
    oracle by the generator contract, so a misclassification also breaks
    the row-count match. Duplicate-id pairs aggregate into one row per
    clip_id on both sides (n_rows = 2, digests doubled unless the pair's
    null-dur planting makes lengths differ — both engines model that).
    Mirrors the reference's per-case expected-output table
    (internal/dirtytesting/dirtytesting.go) at audio-sample granularity.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_digest
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return (pcm_digest(clips)
            .filter(F.col("verdict") == "GREEN")
            .groupBy("clip_id")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("n_samples").alias("n_samples"),
                 F.sum("pcm_sum").alias("pcm_sum"),
                 F.sum("pcm_abs_sum").alias("pcm_abs_sum"),
                 F.sum("pcm_jv_sum").alias("pcm_jv_sum")))


@register("audio_clipping_silence", oracle=f"""
WITH {_PCM_SAMPLES_CTE}
SELECT codec,
       CAST(count(DISTINCT i) AS BIGINT) AS n_clips,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(count(*) FILTER (WHERE abs(v) <= 164) AS BIGINT) AS n_silence,
       CAST(count(*) FILTER (WHERE abs(v) >= 24000) AS BIGINT) AS n_ceiling
FROM samples GROUP BY codec
""")
def q_audio_clipping_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence / loudness-ceiling curation filter on decoded CONTENT:
    per-codec counts of near-silent samples (|v| ≤ 164 ≈ -46 dBFS) and
    samples grazing the loudness ceiling (|v| ≥ 24000 ≈ 0.73 FS — the
    fixture waveform peaks at 0.75 FS, so clean clips legitimately reach
    it). The training-pipeline use is dropping silent / hard-limited
    audio before it wastes tokens. Exact integer thresholds on the
    recovered int16 lattice (operators/snr.py:pcm_amplitude_profile), so
    the oracle reproduces every count from the analytic per-sample twin
    without reading a byte.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_amplitude_profile
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return (pcm_amplitude_profile(clips, extra_cols=["codec"])
            .filter(F.col("verdict") == "GREEN")
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum("n_samples").alias("n_samples"),
                 F.sum("n_silence").alias("n_silence"),
                 F.sum("n_ceiling").alias("n_ceiling")))


@register("audio_chunk_content", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
chunked AS (
  SELECT s.i, s.clip_id,
         s.j // GREATEST(1, (CAST(c.sr_hz AS BIGINT) * 20) // 1000)
           AS chunk_idx,
         s.j %  GREATEST(1, (CAST(c.sr_hz AS BIGINT) * 20) // 1000)
           AS j_local,
         s.v
  FROM samples s JOIN clean c USING (i))
SELECT clip_id, chunk_idx,
       CAST(count(DISTINCT i) AS BIGINT) AS n_copies,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS pcm_sum,
       CAST(SUM(abs(v)) AS BIGINT) AS pcm_abs_sum,
       CAST(SUM(j_local * v) AS BIGINT) AS pcm_jv_sum
FROM chunked GROUP BY clip_id, chunk_idx
""")
def q_audio_chunk_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level decoded-content integrity: chunking ∘ decode ≡ the
    analytic chunk grid, sample-exact. chunk_audio's pure-Column binary
    substring slices (operators/segmentation.py:44) are digested chunk
    by chunk (chunk_content_digest: frombuffer + per-chunk SNR gate vs
    the position-keyed reference slice), and the oracle reproduces every
    digest by regrouping the per-sample analytic twin on the same
    integer grid (chunk = j // (sr·20ms samples)) — so a hash match
    proves the 45-byte header offset, the bytes_per_chunk stride, AND
    the tail-chunk truncation are all exactly right. Chunks of
    planted-noise clips fail the gate chunk-locally on the Spark side
    and are excluded by the generator contract on the oracle side.
    ~13k result rows at the 2000-clip fixture. Map-only until the final
    integer-row groupBy; payload bytes never shuffle.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.segmentation import chunk_audio, chunk_content_digest
    clips = generate_clips(spark, _SNR_N, partitions=8)
    ch = chunk_audio(clips, chunk_ms=20, extra_cols=["sr_hz"])
    return (chunk_content_digest(ch)
            .filter(F.col("verdict") == "GREEN")
            .groupBy("clip_id", "chunk_idx")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.sum("n_samples").alias("n_samples"),
                 F.sum("pcm_sum").alias("pcm_sum"),
                 F.sum("pcm_abs_sum").alias("pcm_abs_sum"),
                 F.sum("pcm_jv_sum").alias("pcm_jv_sum")))


@register("audio_amplitude_hist", oracle=f"""
WITH {_PCM_SAMPLES_CTE}
SELECT codec, (v + 32768) // 4096 AS bin,
       CAST(count(*) AS BIGINT) AS n_samples
FROM samples GROUP BY codec, bin
""")
def q_audio_amplitude_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-waveform amplitude distribution per codec — the
    content-level drift primitive (a shifted or re-normalized ingest
    batch moves these histograms long before metadata does). 16 bins of
    width 4096 over [-32768, 32768); per-clip histograms come out of the
    Arrow stage as exact int64 counts (numpy bincount) and aggregate
    map-side, so at 10^12 clips the shuffle carries |codec|×16 rows.
    Empty bins are filtered to match the oracle's GROUP BY (which only
    produces observed bins). Same analytic per-sample oracle as
    pcm_content_exact — counts match bit-for-bit.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_amplitude_profile
    clips = generate_clips(spark, _SNR_N, partitions=8)
    prof = pcm_amplitude_profile(clips, extra_cols=["codec"])
    return (prof.filter(F.col("verdict") == "GREEN")
            .select("codec", F.posexplode("hist").alias("bin", "n"))
            .groupBy("codec", F.col("bin").cast("long").alias("bin"))
            .agg(F.sum("n").alias("n_samples"))
            .filter(F.col("n_samples") > 0))


@register("audio_dynamic_range", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
per AS (
  SELECT clip_id, codec,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v*v) AS BIGINT) AS sq,
         CAST(MAX(abs(v)) AS BIGINT) AS peak
  FROM samples GROUP BY clip_id, codec)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(SUM(n) AS BIGINT) AS n_samples,
       CAST(SUM(sq) AS BIGINT) AS pcm_sq_sum,
       CAST(MAX(peak) AS BIGINT) AS peak_max,
       CAST(SUM((peak*peak*n*10000) // sq) AS BIGINT) AS crest2_fp_sum,
       CAST(count(*) FILTER (WHERE (peak*peak*n*10000) // sq >= 31000)
            AS BIGINT) AS n_crest_hi,
       CAST(count(*) FILTER (WHERE (abs(s)*10000) // n >= 400000)
            AS BIGINT) AS n_dc_hi
FROM per GROUP BY codec
""")
def q_audio_dynamic_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-range (crest-factor) + DC-offset validation on decoded
    CONTENT — two classic recording-defect gates a training pipeline
    runs before audio enters a corpus: hard-limited/compressed audio
    collapses toward crest ≈ 1, and a miscalibrated ADC or bad trim
    leaves |mean| ≫ 0. Per codec: clip count, total samples, exact Σv²,
    max peak, the summed per-clip crest² in 1e-4 fixed point
    (peak²·n·10000 DIV Σv² — pure int64, no float division anywhere),
    and counts of clips above a crest²/DC band boundary placed at the
    fixture's median so the boundary comparison itself is exercised.
    All arithmetic stays on the recovered int16 lattice, so the DuckDB
    oracle reproduces every value bit-for-bit from the analytic
    per-sample twin without reading a byte (same pinning as
    pcm_content_exact). Duplicate-id pairs merge per clip_id on both
    sides before banding. RED clips (planted noise) are excluded by the
    SNR verdict on the Spark side and by the generator contract in the
    oracle. Mirrors the reference's per-case expected-output style
    (internal/dirtytesting/dirtytesting.go) in the energy domain.

    Scale shape: one map-only Arrow decode pass (fused pcm_scan kernel,
    ~36 bytes/clip onward), a clip_id hash agg, then a |codec|-row agg —
    at 10^12 clips the only corpus-sized exchange is the clip_id
    partial+final aggregate.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_energy_profile
    clips = generate_clips(spark, _SNR_N, partitions=8)
    per = (pcm_energy_profile(clips, extra_cols=["codec"])
           .filter(F.col("verdict") == "GREEN")
           .groupBy("clip_id", "codec")
           .agg(F.sum("n_samples").alias("n"),
                F.sum("pcm_sum").alias("s"),
                F.sum("pcm_sq_sum").alias("sq"),
                F.max("pcm_peak").alias("peak")))
    crest2 = F.expr("peak * peak * n * 10000 DIV sq")
    dc_fp = F.expr("abs(s) * 10000 DIV n")
    return per.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n").alias("n_samples"),
        F.sum("sq").alias("pcm_sq_sum"),
        F.max("peak").alias("peak_max"),
        F.sum(crest2).alias("crest2_fp_sum"),
        F.sum((crest2 >= 31000).cast("long")).alias("n_crest_hi"),
        F.sum((dc_fp >= 400000).cast("long")).alias("n_dc_hi"))


@register("audio_silence_trim", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
lagged AS (
  SELECT i, codec, j,
         lag(j) OVER (PARTITION BY i ORDER BY j) AS prev_j
  FROM samples WHERE abs(v) > 164),
per_act AS (
  SELECT i, codec,
         MIN(j) AS first_act, MAX(j) AS last_act,
         CAST(count(*) FILTER (WHERE prev_j IS NULL OR j - prev_j > 1)
              AS BIGINT) AS n_runs,
         CAST(MAX(COALESCE(j - prev_j - 1, 0)) AS BIGINT) AS max_gap
  FROM lagged GROUP BY i, codec),
tot AS (SELECT i, codec, CAST(count(*) AS BIGINT) AS n
        FROM samples GROUP BY i, codec),
per AS (
  SELECT t.i, t.codec, t.n,
         COALESCE(a.first_act, t.n) AS lead_sil,
         COALESCE(t.n - 1 - a.last_act, t.n) AS trail_sil,
         COALESCE(a.n_runs, 0) AS n_act_runs,
         GREATEST(COALESCE(a.first_act, t.n),
                  COALESCE(t.n - 1 - a.last_act, t.n),
                  COALESCE(a.max_gap, 0)) AS max_sil_run
  FROM tot t LEFT JOIN per_act a USING (i))
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(SUM(lead_sil) AS BIGINT) AS lead_sil_sum,
       CAST(SUM(trail_sil) AS BIGINT) AS trail_sil_sum,
       CAST(count(*) FILTER (WHERE lead_sil >= 1) AS BIGINT)
         AS n_lead_clips,
       CAST(SUM(n_act_runs) AS BIGINT) AS act_runs_sum,
       CAST(MAX(max_sil_run) AS BIGINT) AS max_sil_run_max
FROM per GROUP BY codec
""")
def q_audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim/VAD silence-structure validation on decoded CONTENT: per
    codec, total leading/trailing silent samples (audio that should have
    been trimmed before ingest), clips with any leading silence, total
    maximal active runs (a coarse speech-activity segment count), and
    the longest silent run anywhere (dead air). Active = |v| > 164 on
    the recovered int16 lattice, so every output is an exact integer;
    the oracle reproduces them with islands-and-gaps SQL (lag over j
    per clip) on the analytic per-sample twin — an independent
    formulation of the kernel's vectorized flatnonzero/diff run scan.
    RED clips (planted noise) are excluded on both sides.

    Scale shape: one map-only Arrow decode pass (fused pcm_scan kernel,
    ~44 bytes/clip onward) then a |codec|-row aggregate — run detection
    never leaves the kernel, no per-sample rows exist on the Spark side
    (the oracle's 10M-row unnest is DuckDB-only).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_silence_runs
    clips = generate_clips(spark, _SNR_N, partitions=8)
    runs = pcm_silence_runs(clips, extra_cols=["codec"])
    return (runs.filter(F.col("verdict") == "GREEN")
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum("lead_sil").alias("lead_sil_sum"),
                 F.sum("trail_sil").alias("trail_sil_sum"),
                 F.sum((F.col("lead_sil") >= 1).cast("long"))
                 .alias("n_lead_clips"),
                 F.sum("n_act_runs").alias("act_runs_sum"),
                 F.max("max_sil_run").alias("max_sil_run_max")))


@register("audio_zcr_check", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
sgn AS (
  SELECT i, codec, v,
         lag(v) OVER (PARTITION BY i ORDER BY j) AS pv
  FROM samples),
per AS (
  SELECT i, codec,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE pv IS NOT NULL AND v * pv < 0)
              AS BIGINT) AS zcr,
         CAST(count(*) FILTER (WHERE v = 0) AS BIGINT) AS n_zero
  FROM sgn GROUP BY i, codec)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(SUM(n) AS BIGINT) AS n_samples,
       CAST(SUM(zcr) AS BIGINT) AS zcr_sum,
       CAST(MAX(zcr) AS BIGINT) AS zcr_max,
       CAST(SUM(n_zero) AS BIGINT) AS n_zero_sum,
       CAST(count(*) FILTER (WHERE n_zero > 0) AS BIGINT) AS n_zero_clips
FROM per GROUP BY codec
""")
def q_audio_zcr_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing-rate validation on decoded CONTENT: per codec, the
    exact count of strict sign changes (v_j · v_{{j+1}} < 0) and exact
    zero samples over every clean clip's recovered int16 lattice — the
    classic speech/music/noise spectral-coarseness feature, and a sharp
    detector for sign-flipped or byte-swapped ingest (which ~doubles
    the crossing rate). Strict crossings deliberately differ from
    multimodal_audio_features' sign-flag definition (a run through
    exact zero counts there, not here) — two independent formulations
    of the same content surface. The oracle reproduces every integer
    from pure SQL trigonometry (lag window over the analytic per-sample
    twin) without reading a byte; RED clips (planted noise) are
    excluded on both sides — by the engine's own reference-SNR verdict
    on one, the generator contract (i %% 997) on the other.

    Scale shape: one map-only Arrow decode pass (fused pcm_scan kernel,
    emit_zcr group, ~36 bytes/clip onward) then a |codec|-row
    map-combinable aggregate — the crossing count never leaves the
    kernel, no per-sample rows exist on the Spark side.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_zcr_profile
    clips = generate_clips(spark, _SNR_N, partitions=8)
    z = pcm_zcr_profile(clips, extra_cols=["codec"])
    return (z.filter(F.col("verdict") == "GREEN")
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum("n_samples").alias("n_samples"),
                 F.sum("zcr").alias("zcr_sum"),
                 F.max("zcr").alias("zcr_max"),
                 F.sum("n_zero").alias("n_zero_sum"),
                 F.sum((F.col("n_zero") > 0).cast("long"))
                 .alias("n_zero_clips")))


@register("audio_bandwidth_check", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
dif AS (
  SELECT i, clip_id, codec, v,
         lag(v) OVER (PARTITION BY i ORDER BY j) AS pv
  FROM samples),
per_row AS (
  SELECT i, clip_id, codec,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(v*v) AS BIGINT) AS sq,
         CAST(COALESCE(SUM((v - pv)*(v - pv))
                       FILTER (WHERE pv IS NOT NULL), 0) AS BIGINT) AS hfc
  FROM dif GROUP BY i, clip_id, codec),
per AS (
  SELECT clip_id, codec, SUM(n) AS n, SUM(sq) AS sq, SUM(hfc) AS hfc
  FROM per_row GROUP BY clip_id, codec),
band AS (
  SELECT codec, n, sq, hfc,
         CASE WHEN sq > 0 THEN (hfc * 10000) // sq END AS nhfc_fp
  FROM per)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(SUM(n) AS BIGINT) AS n_samples,
       CAST(SUM(hfc) AS BIGINT) AS hfc_sum,
       CAST(SUM(sq) AS BIGINT) AS pcm_sq_sum,
       CAST(MIN(nhfc_fp) AS BIGINT) AS nhfc_fp_min,
       CAST(MAX(nhfc_fp) AS BIGINT) AS nhfc_fp_max,
       CAST(count(*) FILTER (WHERE nhfc_fp < 5858) AS BIGINT)
         AS n_oversampled,
       CAST(count(*) FILTER (WHERE nhfc_fp < 384) AS BIGINT)
         AS n_narrowband
FROM band GROUP BY codec
""")
def q_audio_bandwidth_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-bandwidth occupancy validation on decoded CONTENT —
    the upsample/re-encode detector a training pipeline runs before
    audio enters a corpus: content band-limited far below its declared
    Nyquist (telephone speech re-stored at 48 kHz, low-bitrate
    transcodes) wastes storage and lies to any sr-conditioned model.
    Per clip the first-difference energy ratio Σ(Δv)²/Σv² equals the
    spectrum-weighted mean of 4·sin²(π·f/sr) — a one-pass bandwidth
    estimate needing no FFT — and ``·10⁴ DIV`` keeps it in pure int64
    fixed point: f_eff < Nyquist/4 ⇔ fp < 5858 (upsample-suspect),
    f_eff < Nyquist/16 ⇔ fp < 384 (narrowband — the fixture's drifted
    high-sr codec lands here wholesale, the planted story). Per codec:
    clip/sample counts, exact Σ(Δv)² and Σv² pins, the fp min/max, and
    both band counts. Duplicate-id pairs merge per clip_id before
    banding; RED clips (planted noise) are excluded by the engine's
    SNR verdict on one side, the generator contract (i %% 997) on the
    other — the oracle reproduces every integer from a lag window over
    the analytic per-sample twin without reading a byte. Reinterprets
    the reference's declared-vs-actual tolerance checks
    (internal/dirty/decoder.go coercions) in the spectral domain.

    Scale shape: one map-only Arrow decode pass (fused pcm_scan kernel,
    emit_energy+emit_hfc groups, ~28 bytes/clip onward), a clip_id
    partial+final hash agg, then a |codec|-row agg — no per-sample rows
    ever exist on the Spark side and the payload never shuffles.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_bandwidth_profile
    clips = generate_clips(spark, _SNR_N, partitions=8)
    per = (pcm_bandwidth_profile(clips, extra_cols=["codec"])
           .filter(F.col("verdict") == "GREEN")
           .groupBy("clip_id", "codec")
           .agg(F.sum("n_samples").alias("n"),
                F.sum("pcm_sq_sum").alias("sq"),
                F.sum("hfc").alias("hfc")))
    fp = F.expr("CASE WHEN sq > 0 THEN hfc * 10000 DIV sq END")
    return per.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n").alias("n_samples"),
        F.sum("hfc").alias("hfc_sum"),
        F.sum("sq").alias("pcm_sq_sum"),
        F.min(fp).alias("nhfc_fp_min"),
        F.max(fp).alias("nhfc_fp_max"),
        F.sum((fp < 5858).cast("long")).alias("n_oversampled"),
        F.sum((fp < 384).cast("long")).alias("n_narrowband"))


@register("suite_content_verdicts", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
part AS (
  SELECT codec AS partition_id, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red
  FROM full_ GROUP BY 1),
dig AS (
  SELECT codec AS partition_id,
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(v) AS BIGINT) AS pcm_sum,
         CAST(sum(abs(v)) AS BIGINT) AS pcm_abs_sum,
         CAST(sum(j * v) AS BIGINT) AS pcm_jv_sum,
         CAST(count(*) FILTER (WHERE abs(v) <= 164) AS BIGINT) AS n_silence,
         CAST(count(*) FILTER (WHERE abs(v) >= 24000) AS BIGINT) AS n_ceiling
  FROM samples GROUP BY 1),
sil AS (
  SELECT partition_id,
         CAST(count(*) FILTER (WHERE ratio > 0.5) AS BIGINT) AS n_yellow
  FROM (SELECT i, codec AS partition_id,
               (count(*) FILTER (WHERE abs(v) <= 164))
                 / CAST(count(*) AS DOUBLE) AS ratio
        FROM samples GROUP BY 1, 2)
  GROUP BY 1),
bw AS (
  SELECT partition_id,
         CAST(count(*) FILTER (WHERE (hfc * 10000) // sq < 384) AS BIGINT)
           AS n_bw_yellow,
         CAST(sum(hfc) AS BIGINT) AS hfc_sum,
         CAST(sum(sq) AS BIGINT) AS sq_sum
  FROM (SELECT i, codec AS partition_id,
               CAST(SUM(v*v) AS BIGINT) AS sq,
               CAST(COALESCE(SUM((v - pv)*(v - pv))
                             FILTER (WHERE pv IS NOT NULL), 0) AS BIGINT)
                 AS hfc
        FROM (SELECT i, codec, v,
                     lag(v) OVER (PARTITION BY i ORDER BY j) AS pv
              FROM samples)
        GROUP BY 1, 2)
  GROUP BY 1),
bits AS (
  SELECT partition_id,
         CAST(bit_or(or_abs) AS BIGINT) AS p_or,
         CAST(count(*) FILTER (WHERE eff < 9) AS BIGINT)
           AS n_bits_yellow
  FROM (SELECT i, codec AS partition_id, bit_or(abs(v)) AS or_abs,
               CASE WHEN bit_or(abs(v)) = 0 THEN 0
                    ELSE 16 - bit_count(CAST(
                         (bit_or(abs(v)) & (-bit_or(abs(v)))) - 1
                         AS BIGINT)) END AS eff
        FROM samples GROUP BY 1, 2)
  GROUP BY 1),
pol AS (
  SELECT partition_id,
         CAST(sum(s3) AS BIGINT) AS cube_sum,
         CAST(count(*) FILTER (WHERE s3 < 0) AS BIGINT) AS n_neg,
         CAST(count(*) FILTER (WHERE s3 > 0) AS BIGINT) AS n_pos
  FROM (SELECT i, codec AS partition_id, SUM(v*v*v) AS s3
        FROM samples GROUP BY 1, 2)
  GROUP BY 1)
SELECT p.partition_id, 'pcm_content' AS check_name,
       CASE WHEN p.n_red > 0 THEN 'RED' ELSE 'GREEN' END AS verdict,
       p.n_rows, p.n_rows - p.n_red AS n_green,
       CAST(0 AS BIGINT) AS n_yellow, p.n_red,
       '{{"n_samples":' || d.n_samples || ',"pcm_sum":' || d.pcm_sum
         || ',"pcm_abs_sum":' || d.pcm_abs_sum
         || ',"pcm_jv_sum":' || d.pcm_jv_sum || '}}' AS metrics_json
FROM part p JOIN dig d USING (partition_id)
UNION ALL
SELECT p.partition_id, 'silence',
       CASE WHEN p.n_red > 0 THEN 'RED'
            WHEN s.n_yellow > 0 THEN 'YELLOW' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - p.n_red - s.n_yellow, s.n_yellow, p.n_red,
       '{{"n_silence":' || d.n_silence || ',"n_ceiling":' || d.n_ceiling
         || '}}'
FROM part p JOIN dig d USING (partition_id) JOIN sil s USING (partition_id)
UNION ALL
SELECT p.partition_id, 'bandwidth',
       CASE WHEN p.n_red > 0 THEN 'RED'
            WHEN b.n_bw_yellow > 0 THEN 'YELLOW' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - p.n_red - b.n_bw_yellow, b.n_bw_yellow, p.n_red,
       '{{"hfc_sum":' || b.hfc_sum || ',"pcm_sq_sum":' || b.sq_sum
         || '}}'
FROM part p JOIN bw b USING (partition_id)
UNION ALL
SELECT p.partition_id, 'bit_depth',
       CASE WHEN p.n_red > 0 THEN 'RED'
            WHEN t.n_bits_yellow > 0 THEN 'YELLOW' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - p.n_red - t.n_bits_yellow,
       t.n_bits_yellow, p.n_red,
       '{{"or_abs":' || t.p_or || ',"n_low_bits":' || t.n_bits_yellow
         || '}}'
FROM part p JOIN bits t USING (partition_id)
UNION ALL
SELECT p.partition_id, 'polarity',
       CASE WHEN p.n_red > 0 THEN 'RED' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - p.n_red, CAST(0 AS BIGINT), p.n_red,
       '{{"cube_sum":' || o.cube_sum || ',"n_neg_skew":' || o.n_neg
         || ',"n_pos_skew":' || o.n_pos || '}}'
FROM part p JOIN pol o USING (partition_id)
""")
def q_suite_content_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ValidationSuite run with ``content_checks=True``: the
    sample-exact PCM content check, the silence-curation check, the
    effective-bandwidth (upsample-suspect) check, the effective-bit-depth
    (requantization) check, and the polarity (third-moment) profile all
    ride the SAME single scan of ``bytes`` as header + SNR (pcm_scan
    emits all eight column groups from one container decode —
    plans/suite.py:check_media). The
    oracle re-derives all five verdict rows per codec partition
    without reading a byte: verdict/row counts come from the planted
    corruption arithmetic (i % 997), and metrics_json is rebuilt
    integer-for-integer from the analytic per-sample twin (pure-SQL
    trigonometry with the numpy float pipeline pinned), so a hash match
    proves the fused pass aggregates the exact decoded samples into the
    exact JSON the engine emits. The bandwidth family's planted story:
    the drifted 'opus' partition (sr from {{44100, 48000}} only, content
    ≤ 3·1096 Hz) goes YELLOW wholesale. Complements
    suite_partition_verdicts, which pins the other six check families
    of the same suite.
    """
    from ...fixtures.gen import generate_clips
    from ...plans.suite import SuiteConfig, ValidationSuite
    clips = generate_clips(spark, _SNR_N, partitions=8)
    res = ValidationSuite(SuiteConfig(content_checks=True)).run(spark, clips)
    return res.partition_verdicts.filter(
        F.col("check_name").isin("pcm_content", "silence", "bandwidth",
                                 "bit_depth", "polarity")
    ).select(
        "partition_id", "check_name", "verdict", "n_rows",
        "n_green", "n_yellow", "n_red", "metrics_json")


@register("suite_partition_verdicts", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
clips_cf AS (
  SELECT f.i, b.clip_id,
         CASE WHEN f.i % 1000 = 999 AND f.i > 0 THEN f.i - 1 ELSE f.i END
           AS base_i,
         f.codec, f.sr_hz, f.dur_ms, f.i % 997 = 996 AS corrupt
  FROM full_ f JOIN base b USING (i)),
per_part AS (
  SELECT codec AS partition_id, CAST(count(*) AS BIGINT) AS n_rows
  FROM clips_cf GROUP BY 1),
stats_red AS (
  SELECT codec AS partition_id,
         (count(*) FILTER (WHERE sr_hz IS NULL)) / CAST(count(*) AS DOUBLE)
           > 0.05
         OR (count(*) FILTER (WHERE dur_ms IS NULL))
            / CAST(count(*) AS DOUBLE) > 0.05 AS red
  FROM clips_cf GROUP BY 1),
dup_roll AS (
  SELECT partition_id, CAST(sum(dup_count) AS BIGINT) AS n_dup_rows,
         CAST(count(*) AS BIGINT) AS n_dup_keys
  FROM (SELECT codec AS partition_id, clip_id, count(*) AS dup_count
        FROM clips_cf GROUP BY 1, 2 HAVING count(*) > 1)
  GROUP BY 1),
ref_roll AS (
  SELECT codec AS partition_id,
         CAST(count(*) FILTER (WHERE base_i % 991 = 990) AS BIGINT)
           AS n_orphans,
         CAST(count(*) FILTER (WHERE base_i % 983 = 982
                               AND base_i % 991 <> 990) AS BIGINT)
           AS n_mismatch,
         CAST(count(*) FILTER (WHERE corrupt) AS BIGINT) AS n_snr_red
  FROM clips_cf GROUP BY 1),
cur_sr AS (
  SELECT codec, bucket, n / sum(n) OVER (PARTITION BY codec) AS p
  FROM (SELECT codec,
               CAST(least(9, greatest(0, floor(sr_hz / 5000.0))) AS INT)
                 AS bucket,
               CAST(count(*) AS DOUBLE) AS n
        FROM clips_cf WHERE sr_hz IS NOT NULL GROUP BY 1, 2)),
base_sr AS (
  SELECT bucket, n / sum(n) OVER () AS q
  FROM (SELECT CAST(least(9, greatest(0, floor(sr_hz / 5000.0))) AS INT)
                 AS bucket,
               CAST(count(*) AS DOUBLE) AS n
        FROM clips_cf WHERE codec <> 'opus' AND sr_hz IS NOT NULL
        GROUP BY 1)),
cur_dur AS (
  SELECT codec, bucket, n / sum(n) OVER (PARTITION BY codec) AS p
  FROM (SELECT codec,
               CAST(least(9, greatest(0, floor(dur_ms / 100.0))) AS INT)
                 AS bucket,
               CAST(count(*) AS DOUBLE) AS n
        FROM clips_cf WHERE dur_ms IS NOT NULL GROUP BY 1, 2)),
base_dur AS (
  SELECT bucket, n / sum(n) OVER () AS q
  FROM (SELECT CAST(least(9, greatest(0, floor(dur_ms / 100.0))) AS INT)
                 AS bucket,
               CAST(count(*) AS DOUBLE) AS n
        FROM clips_cf WHERE codec <> 'opus' AND dur_ms IS NOT NULL
        GROUP BY 1)),
drift_sr AS (
  SELECT codec,
         sum((greatest(coalesce(p, 0), 1e-6) - greatest(coalesce(q, 0), 1e-6))
             * ln(greatest(coalesce(p, 0), 1e-6)
                  / greatest(coalesce(q, 0), 1e-6))) AS psi,
         max(abs(cp - cq)) AS ks
  FROM (SELECT codec, p, q,
               sum(coalesce(p, 0)) OVER (PARTITION BY codec ORDER BY bucket)
                 AS cp,
               sum(coalesce(q, 0)) OVER (PARTITION BY codec ORDER BY bucket)
                 AS cq
        FROM cur_sr FULL JOIN base_sr USING (bucket))
  GROUP BY codec),
drift_dur AS (
  SELECT codec,
         sum((greatest(coalesce(p, 0), 1e-6) - greatest(coalesce(q, 0), 1e-6))
             * ln(greatest(coalesce(p, 0), 1e-6)
                  / greatest(coalesce(q, 0), 1e-6))) AS psi,
         max(abs(cp - cq)) AS ks
  FROM (SELECT codec, p, q,
               sum(coalesce(p, 0)) OVER (PARTITION BY codec ORDER BY bucket)
                 AS cp,
               sum(coalesce(q, 0)) OVER (PARTITION BY codec ORDER BY bucket)
                 AS cq
        FROM cur_dur FULL JOIN base_dur USING (bucket))
  GROUP BY codec)
SELECT p.partition_id, 'stats' AS check_name,
       CASE WHEN s.red THEN 'RED' ELSE 'GREEN' END AS verdict,
       p.n_rows,
       CAST(CASE WHEN s.red THEN 0 ELSE p.n_rows END AS BIGINT) AS n_green,
       CAST(0 AS BIGINT) AS n_yellow,
       CAST(CASE WHEN s.red THEN p.n_rows ELSE 0 END AS BIGINT) AS n_red
FROM per_part p JOIN stats_red s USING (partition_id)
UNION ALL
SELECT p.partition_id, 'uniqueness',
       CASE WHEN coalesce(d.n_dup_keys, 0) > 0 THEN 'RED' ELSE 'GREEN' END,
       p.n_rows,
       p.n_rows - coalesce(d.n_dup_rows, 0),
       CAST(0 AS BIGINT),
       coalesce(d.n_dup_rows, 0)
FROM per_part p LEFT JOIN dup_roll d USING (partition_id)
UNION ALL
SELECT p.partition_id, 'referential',
       CASE WHEN r.n_orphans > 0 THEN 'RED' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - r.n_orphans, CAST(0 AS BIGINT), r.n_orphans
FROM per_part p JOIN ref_roll r USING (partition_id)
UNION ALL
SELECT p.partition_id, 'transcript',
       CASE WHEN r.n_mismatch > 0 THEN 'RED' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - r.n_mismatch, CAST(0 AS BIGINT), r.n_mismatch
FROM per_part p JOIN ref_roll r USING (partition_id)
UNION ALL
SELECT p.partition_id, 'drift_sr_hz',
       CASE WHEN d.psi > 0.25 OR d.ks > 0.25 THEN 'RED'
            WHEN d.psi > 0.1 OR d.ks > 0.1 THEN 'YELLOW'
            ELSE 'GREEN' END,
       p.n_rows,
       CAST(CASE WHEN NOT (d.psi > 0.1 OR d.ks > 0.1)
                 THEN p.n_rows ELSE 0 END AS BIGINT),
       CAST(CASE WHEN (d.psi > 0.1 OR d.ks > 0.1)
                 AND NOT (d.psi > 0.25 OR d.ks > 0.25)
                 THEN p.n_rows ELSE 0 END AS BIGINT),
       CAST(CASE WHEN d.psi > 0.25 OR d.ks > 0.25
                 THEN p.n_rows ELSE 0 END AS BIGINT)
FROM per_part p JOIN drift_sr d ON p.partition_id = d.codec
UNION ALL
SELECT p.partition_id, 'drift_dur_ms',
       CASE WHEN d.psi > 0.25 OR d.ks > 0.25 THEN 'RED'
            WHEN d.psi > 0.1 OR d.ks > 0.1 THEN 'YELLOW'
            ELSE 'GREEN' END,
       p.n_rows,
       CAST(CASE WHEN NOT (d.psi > 0.1 OR d.ks > 0.1)
                 THEN p.n_rows ELSE 0 END AS BIGINT),
       CAST(CASE WHEN (d.psi > 0.1 OR d.ks > 0.1)
                 AND NOT (d.psi > 0.25 OR d.ks > 0.25)
                 THEN p.n_rows ELSE 0 END AS BIGINT),
       CAST(CASE WHEN d.psi > 0.25 OR d.ks > 0.25
                 THEN p.n_rows ELSE 0 END AS BIGINT)
FROM per_part p JOIN drift_dur d ON p.partition_id = d.codec
UNION ALL
SELECT partition_id, 'header', 'GREEN', n_rows, n_rows,
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM per_part
UNION ALL
SELECT p.partition_id, 'snr',
       CASE WHEN r.n_snr_red > 0 THEN 'RED' ELSE 'GREEN' END,
       p.n_rows, p.n_rows - r.n_snr_red, CAST(0 AS BIGINT), r.n_snr_red
FROM per_part p JOIN ref_roll r USING (partition_id)
""")
def q_suite_partition_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ValidationSuite partition verdicts (8 checks × codec
    partitions: stats, uniqueness, referential, transcript, drift_sr_hz,
    drift_dur_ms, header, snr — plans/suite.py). The oracle re-derives
    the ENTIRE verdict table without reading a byte of audio: every
    planted defect is row-id arithmetic (dups i%1000, corruption i%997,
    orphans i%991, transcript mismatches i%983, null dur i%101), each
    row's codec/sr/dur come from the CRC-32 SQL fold, and the PSI/KS
    drift gates are replicated over the closed-form histograms (the
    drifted 'opus' codec draws sr_hz from {44100, 48000} only).
    metrics_json (real dB/mean values) stays in the suite goldens.
    """
    from ...fixtures.gen import generate_clips, generate_manifest
    from ...plans.suite import SuiteConfig, ValidationSuite, build_baseline_shares
    clips = generate_clips(spark, _SNR_N, partitions=8)
    manifest = generate_manifest(spark, _SNR_N, partitions=4)
    cfg = SuiteConfig()
    baseline = build_baseline_shares(clips.filter(F.col("codec") != "opus"), cfg)
    res = ValidationSuite(cfg).run(spark, clips, manifest, baseline)
    return res.partition_verdicts.select(
        "partition_id", "check_name", "verdict", "n_rows",
        "n_green", "n_yellow", "n_red")


# =========================================================================
# flagship: per-partition verdict roll-up over coerced dirty columns
# (the engine's end-to-end shape: coercion → row verdict → partition verdict)
# =========================================================================

@register("verdict_rollup", oracle=f"""
WITH r AS (
  SELECT event_type,
         {_DIRTY_NUMBER_RAW_SQL} AS raw_num,
         {_DIRTY_BOOL_RAW_SQL} AS raw_bool
  FROM events),
v AS (
  SELECT event_type,
    CASE
      WHEN raw_num IS NOT NULL AND regexp_matches(raw_num, '^\\s*[\\[{{]') THEN 2
      WHEN raw_num IS NOT NULL
           AND regexp_matches(raw_num, '^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$') THEN 0
      WHEN raw_num IS NULL THEN 1
      WHEN regexp_matches(replace(replace(trim(raw_num), ' ', ''), ',', ''),
                          '^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$') THEN 1
      WHEN lower(trim(raw_num)) IN ('true', 'false') THEN 1
      ELSE 2 END AS rank_num,
    CASE WHEN raw_bool IN ('true', 'false') THEN 0 ELSE 1 END AS rank_bool
  FROM r),
w AS (SELECT event_type, greatest(rank_num, rank_bool) AS worst FROM v)
SELECT event_type, 'coercion' AS check_name,
       count(*) AS n_rows,
       count(*) FILTER (WHERE worst = 0) AS n_green,
       count(*) FILTER (WHERE worst = 1) AS n_yellow,
       count(*) FILTER (WHERE worst = 2) AS n_red,
       CASE max(worst) WHEN 2 THEN 'RED' WHEN 1 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM w GROUP BY event_type
""")
def q_verdict_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    num = coerce_number(_dirty_number_raw(), CFG)
    boo = coerce_bool(_dirty_bool_raw(), CFG)
    df = ev.select(
        "event_type",
        row_verdict(num.verdict, boo.verdict).alias("row_verdict"),
    )
    return rollup_verdicts(df, "row_verdict", ["event_type"])


