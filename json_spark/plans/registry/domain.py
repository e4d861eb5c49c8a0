"""Registry section: domain/CHECK constraints + drift localization, incremental dedup, label balance.

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    load_table,
    register,
)
from .audio import (
    _CLIPS_CLOSED_FORM_CTE,
    _PCM_SAMPLES_CTE,
    _SNR_N,
)

# =========================================================================
# Domain / CHECK constraints — declarative value-domain validation
# =========================================================================

@register("domain_constraints", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
j AS (SELECT f.i, f.codec, f.sr_hz, f.dur_ms, b.clip_id
      FROM full_ f JOIN base b USING (i)),
v AS (
  SELECT codec, 'required:dur_ms' AS check_name,
         CASE WHEN dur_ms IS NULL THEN 'RED' ELSE 'GREEN' END AS verdict
  FROM j
  UNION ALL
  SELECT codec, 'range:dur_ms',
         CASE WHEN dur_ms IS NOT NULL AND (dur_ms < 50 OR dur_ms > 180)
              THEN 'RED' ELSE 'GREEN' END
  FROM j
  UNION ALL
  SELECT codec, 'set:codec',
         CASE WHEN codec NOT IN ('pcm_s16le', 'flac', 'opus')
              THEN 'RED' ELSE 'GREEN' END
  FROM j
  UNION ALL
  SELECT codec, 'format:clip_id',
         CASE WHEN NOT regexp_full_match(clip_id, 'clip-[0-9]{{12}}')
              THEN 'RED' ELSE 'GREEN' END
  FROM j
  UNION ALL
  SELECT codec, 'preferred:sr_hz',
         CASE WHEN sr_hz NOT IN (16000, 22050, 44100, 48000)
              THEN 'YELLOW' ELSE 'GREEN' END
  FROM j
  UNION ALL
  SELECT codec, 'cond:opus_sr',
         CASE WHEN codec = 'opus' AND sr_hz NOT IN (44100, 48000)
              THEN 'RED' ELSE 'GREEN' END
  FROM j
  UNION ALL
  SELECT codec, 'cond:pcm_dur',
         CASE WHEN codec = 'pcm_s16le' AND dur_ms IS NOT NULL
                   AND dur_ms > 190
              THEN 'RED' ELSE 'GREEN' END
  FROM j)
SELECT codec, check_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE verdict = 'GREEN') AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE verdict = 'YELLOW') AS BIGINT) AS n_yellow,
       CAST(count(*) FILTER (WHERE verdict = 'RED') AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE verdict = 'RED') > 0 THEN 'RED'
            WHEN count(*) FILTER (WHERE verdict = 'YELLOW') > 0 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM v GROUP BY codec, check_name
""")
def q_domain_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative domain/CHECK constraints (operators/domain.py) over
    the clips fixture: per-(codec, rule) verdict counts from ONE
    map-combinable aggregation pass (all seven rules' counters in the
    same groupBy, stack-unpivoted). The rules exercise every predicate
    kind — required/not-null (planted: dur_ms NULL at i%101==100),
    inclusive range (dur_ms 50..180 vs generated 50..200), set
    membership (codec; mp3 rows violate), anchored regex format
    (clip_id; all pass — proves no false positives), a YELLOW-severity
    preference set (sr_hz; 8000-Hz rows warn), and two implication
    rules (when codec='opus' → sr_hz∈{44100,48000}, all pass by
    generator construction; when codec='pcm_s16le' → dur_ms≤190,
    seed%151>140 rows violate). The
    oracle re-derives every verdict from the generator's closed-form
    metadata contract (seed = CRC-32 SQL fold) without reading a byte.
    Value-domain analogue of the reference's config-declared value
    lists (internal/config/config.go:44-62).
    """
    from ...fixtures.gen import generate_clips
    from ...operators.domain import DomainRule, domain_rollup

    rules = (
        DomainRule("dur_ms", required=True, name="required:dur_ms"),
        DomainRule("dur_ms", min_value=50, max_value=180,
                   name="range:dur_ms"),
        DomainRule("codec", in_set=("pcm_s16le", "flac", "opus"),
                   name="set:codec"),
        DomainRule("clip_id", pattern="clip-[0-9]{12}",
                   name="format:clip_id"),
        DomainRule("sr_hz", in_set=(16000, 22050, 44100, 48000),
                   severity="YELLOW", name="preferred:sr_hz"),
        # implication rules: constraint applies only where the gate holds
        # (codec='opus' rows ALL satisfy this by generator construction —
        # proves exemption yields no false positives on other codecs)
        DomainRule("sr_hz", in_set=(44100, 48000),
                   when_sql="codec = 'opus'", name="cond:opus_sr"),
        DomainRule("dur_ms", max_value=190,
                   when_sql="codec = 'pcm_s16le'", name="cond:pcm_dur"),
    )
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return domain_rollup(clips, rules, ["codec"])


@register("partition_anomaly", oracle="""
WITH p AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS partition_id,
         round(CAST(count(*) AS DOUBLE), 6) AS n_rows,
         round(avg(value), 6) AS mean_value
  FROM events GROUP BY 1),
long AS (
  SELECT partition_id, 'n_rows' AS metric, n_rows AS value FROM p
  UNION ALL
  SELECT partition_id, 'mean_value', mean_value FROM p),
med AS (SELECT metric, median(value) AS med FROM long GROUP BY metric),
dev AS (SELECT l.partition_id, l.metric, l.value, m.med,
               abs(l.value - m.med) AS absdev
        FROM long l JOIN med m USING (metric)),
mad AS (SELECT metric, median(absdev) AS mad FROM dev GROUP BY metric)
SELECT d.partition_id, d.metric, d.value,
       round(d.med, 6) AS med, round(a.mad, 6) AS mad,
       CASE WHEN a.mad > 0
            THEN round((d.value - d.med) / (1.4826 * a.mad), 6)
            END AS robust_z,
       CASE WHEN a.mad = 0 AND d.value <> d.med THEN 'RED'
            WHEN a.mad = 0 THEN 'GREEN'
            WHEN abs((d.value - d.med) / (1.4826 * a.mad)) > 3.0 THEN 'RED'
            WHEN abs((d.value - d.med) / (1.4826 * a.mad)) > 2.0
                 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM dev d JOIN mad a USING (metric)
""")
def q_partition_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-partition anomaly scan (operators/anomaly.py): per-day
    row count + mean(value) over events, each day judged against the
    fleet median in MAD units — the "one bad ingest shard" detector
    that fixed thresholds can't express. The corpus is touched by
    exactly ONE map-combinable aggregation; median/MAD and verdicts run
    on the |days| x 2 long frame with broadcast joins. Day buckets are
    epoch-microsecond integer division (session-TZ-proof, same idiom as
    events_rollup). k=2/3 sigmas here (fixture-sized fleet; operator
    defaults are 3/5): both engines re-derive the full median -> MAD ->
    robust-z -> verdict chain from 6dp-pinned inputs.
    """
    from ...operators.anomaly import partition_anomaly
    from ...operators.temporal import epoch_us

    ev = load_table(spark, sf_dir, "events")
    parts = (
        ev.select(epoch_us("ts").alias("us"), "value")
        .selectExpr("CAST(us DIV 86400000000 AS STRING) AS day", "value")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.avg("value"), 6).alias("mean_value"))
    )
    return partition_anomaly(parts, "day", ["n_rows", "mean_value"],
                             k_yellow=2.0, k_red=3.0)


@register("coverage_gaps", oracle="""
WITH o AS (SELECT event_type, epoch_us(ts) // 86400000000 AS b
           FROM events GROUP BY 1, 2),
span AS (SELECT min(b) AS lo, max(b) AS hi FROM o),
pg AS (SELECT event_type, count(*) AS n_obs FROM o GROUP BY 1)
SELECT event_type,
       CAST(hi - lo + 1 AS BIGINT) AS n_buckets_expected,
       CAST(n_obs AS BIGINT) AS n_buckets_observed,
       CAST(hi - lo + 1 - n_obs AS BIGINT) AS n_gaps,
       round(n_obs / (hi - lo + 1), 6) AS coverage,
       CASE WHEN n_obs >= hi - lo + 1 THEN 'GREEN'
            WHEN n_obs / (hi - lo + 1) >= 0.99 THEN 'YELLOW'
            ELSE 'RED' END AS verdict
FROM pg, span
""")
def q_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-completeness check (operators/temporal.py:coverage_gaps):
    per event_type, how many day buckets in the table's global span have
    NO rows — the "feed went dark" validation a per-row check cannot see
    (no row exists to fail). Corpus collapses to observed (type, day)
    pairs in one map-combinable distinct-agg; everything after is
    metadata-sized. Day buckets via epoch-us integer division
    (session-TZ-proof).
    """
    from ...operators.temporal import coverage_gaps, epoch_us

    ev = load_table(spark, sf_dir, "events")
    days = (ev.select("event_type", epoch_us("ts").alias("us"))
            .selectExpr("event_type", "us DIV 86400000000 AS day"))
    return coverage_gaps(days, ["event_type"], "day")


@register("sequence_inversions", oracle="""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
l AS (SELECT user_id, us,
             lag(us) OVER (PARTITION BY user_id ORDER BY event_id) AS pus
      FROM e)
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
       CAST(count(*) FILTER (WHERE pus IS NOT NULL) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE pus IS NOT NULL AND us < pus)
            AS BIGINT) AS n_inversions,
       round(count(*) FILTER (WHERE pus IS NOT NULL AND us < pus)
             / count(*) FILTER (WHERE pus IS NOT NULL), 6)
         AS inversion_rate
FROM l
""")
def q_sequence_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering-integrity check (operators/temporal.py:
    sequence_inversions): per user_id, adjacent event pairs (in
    event_id order) whose event time goes backward — sequence numbers
    vs clocks disagreement, the out-of-order-ingest detector. ONE
    corpus shuffle (hash on user_id for the per-key lag window), then a
    map-combinable summary; timestamps compared as integer
    microseconds (session-TZ-proof).
    """
    from ...operators.temporal import epoch_us, sequence_inversions

    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", epoch_us("ts").alias("us"))
    return sequence_inversions(e, "user_id", "event_id", "us")


# =========================================================================
# drift localization, incremental dedup, label balance (round-3 additions)
# =========================================================================

@register("drift_changepoint", oracle="""
WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                      count(*) AS n, sum(CAST(value AS DOUBLE)) AS s
               FROM events GROUP BY 1, 2),
cum AS (SELECT event_type, day, n, s,
               sum(n) OVER w AS cn, sum(s) OVER w AS cs,
               sum(n) OVER (PARTITION BY event_type) AS tn,
               sum(s) OVER (PARTITION BY event_type) AS ts_
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
cand AS (SELECT *, abs(cs / cn - (ts_ - cs) / (tn - cn))
                   * sqrt(cn::DOUBLE * (tn - cn)::DOUBLE / tn::DOUBLE)
                   AS stat
         FROM cum WHERE tn - cn > 0),
best AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                      ORDER BY stat DESC, day) AS rk
         FROM cand)
SELECT event_type, CAST(day AS BIGINT) AS split_day,
       CAST(cn AS BIGINT) AS n_before, CAST(tn - cn AS BIGINT) AS n_after,
       round(cs / cn, 6) AS mean_before,
       round((ts_ - cs) / (tn - cn), 6) AS mean_after,
       round(stat, 6) AS shift_stat,
       CASE WHEN stat >= 4.0 THEN 'RED' WHEN stat >= 2.0 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM best WHERE rk = 1
""")
def q_drift_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift change-point localization (operators/changepoint.py:
    mean_shift_changepoint): per event_type, the day boundary that
    maximizes |mean_before - mean_after| * sqrt(n1*n2/N) — WHEN the
    metric drifted, complementing PSI/KS/Wasserstein's "did it drift".
    One map-combinable (event_type, day) aggregate touches the corpus;
    cumsums + argmax run per-group on the 30-day aggregate. The
    statistic uses only IEEE-exact ops (div/mul/sqrt/abs), so the
    argmax day is bit-identical in DuckDB; ties break earlier-day. The
    fixture's generator-planted value drift makes every event_type's
    localization informative (stats 39-135, RED).
    """
    from ...operators.changepoint import mean_shift_changepoint

    ev = load_table(spark, sf_dir, "events")
    return mean_shift_changepoint(ev.select("event_type", "ts", "value"),
                                  ["event_type"], "ts", "value")


@register("dedup_incremental", oracle="""
WITH all_docs AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id % 10 = 0),
fp AS (SELECT doc_id, lang,
         list_reduce(list_prepend(0::BIGINT,
           [('0x' || substr(md5(t), 1, 8))::BIGINT
            for t in string_split(text, ' ')]),
           (acc, h) -> (acc * 131 + h) % 2147483647) AS fp,
         ('0x' || substr(md5('delta:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 5 AS bkt
       FROM all_docs),
batch AS (SELECT * FROM fp WHERE bkt = 0),
corpus_idx AS (SELECT DISTINCT fp FROM fp WHERE bkt != 0),
hits AS (SELECT lang, count(*) AS n_dup FROM batch
         WHERE fp IN (SELECT fp FROM corpus_idx) GROUP BY lang),
fresh AS (SELECT * FROM batch
          WHERE fp NOT IN (SELECT fp FROM corpus_idx)),
within AS (SELECT lang, sum(c - 1) AS n_w
           FROM (SELECT lang, fp, count(*) AS c FROM fresh GROUP BY 1, 2)
           GROUP BY 1),
tot AS (SELECT lang, count(*) AS n_batch FROM batch GROUP BY lang)
SELECT t.lang, t.n_batch,
       CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup_corpus,
       CAST(coalesce(w.n_w, 0) AS BIGINT) AS n_dup_within,
       CAST(t.n_batch - coalesce(h.n_dup, 0) - coalesce(w.n_w, 0) AS BIGINT)
         AS n_kept
FROM tot t LEFT JOIN hits h USING (lang) LEFT JOIN within w USING (lang)
""")
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-vs-corpus incremental dedup (operators/delta.py:
    incremental_dedup) — the daily-ingest shape: nobody re-dedups
    10^12 docs per batch; the corpus collapses to a DISTINCT
    fingerprint index and the new batch semi-joins it (so the join
    shuffles deduped 8-byte keys, never text). Planted exact copies
    (every 10th doc, id+100000 — the dedup_exact planting) guarantee
    cross-bucket hits; batch membership is the md5 bucket of doc_id,
    so the oracle replays every kept/dropped decision bit-for-bit.
    """
    from ...operators.delta import incremental_dedup, split_batch

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    copies = d.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "lang", "text")
    alld = d.unionByName(copies)
    batch, corpus = split_batch(alld, "doc_id", batch_buckets=5)
    return incremental_dedup(batch, corpus, "doc_id", "text", ["lang"])


@register("class_balance", oracle="""
WITH lab AS (
  SELECT CASE WHEN b < 600 THEN 'train' WHEN b < 800 THEN 'val'
         ELSE 'test' END AS split, lang
  FROM (SELECT lang,
          ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
            ::BIGINT % 1000 AS b
        FROM documents)),
c AS (SELECT split, lang, count(*) AS n FROM lab GROUP BY 1, 2),
t AS (SELECT split, sum(n) AS tot, count(*) AS k, max(n) AS mx, min(n) AS mn
      FROM c GROUP BY 1),
per AS (SELECT c.split,
          any_value(t.tot) AS n_rows, any_value(t.k) AS n_classes,
          any_value(t.mx) AS mx, any_value(t.mn) AS mn,
          -sum((c.n::DOUBLE / t.tot::DOUBLE)
               * log2(c.n::DOUBLE / t.tot::DOUBLE)) AS h,
          sum((c.n::DOUBLE / t.tot::DOUBLE)
              * (c.n::DOUBLE / t.tot::DOUBLE)) AS simpson
        FROM c JOIN t USING (split) GROUP BY c.split),
fin AS (SELECT *, CASE WHEN n_classes > 1
                  THEN h / log2(n_classes::DOUBLE) ELSE 0.0 END AS nh
        FROM per)
SELECT split, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_classes AS BIGINT) AS n_classes,
       round(h, 6) AS entropy_bits, round(nh, 6) AS norm_entropy,
       round(1.0 / simpson, 6) AS inv_simpson,
       round(mx::DOUBLE / mn::DOUBLE, 6) AS imbalance_ratio,
       CASE WHEN nh < 0.60 THEN 'RED' WHEN nh < 0.85 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM fin
""")
def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-label balance audit per hash split (operators/
    balance.py:class_balance over packing.assign_split 60/20/20):
    normalized Shannon entropy, inverse-Simpson effective classes,
    max/min imbalance, verdict — the corpus-level defect no per-row
    rule can see, asked per split so "does the split preserve the
    class mix?" is one query. One map-combinable (split, lang)
    aggregate + broadcast-joined totals; shares/entropy are IEEE
    division + same-libm log2, rounded 6dp on both sides.
    """
    from ...operators.balance import class_balance
    from ...operators.packing import assign_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    d = d.withColumn("split", assign_split(F.col("doc_id"), 600, 800))
    return class_balance(d, "lang", ["split"])


@register("audio_goertzel_check", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
corr AS (
  SELECT s.i, s.codec, any_value(c.n) AS n,
         CAST(sum(s.v * CAST(round_even(
             cos(2*pi()*c.f0*(CAST(s.j AS DOUBLE)/c.sr_hz))
             * CAST(32768.0 AS DOUBLE), 0) AS BIGINT)) AS BIGINT) AS cs,
         CAST(sum(s.v * CAST(round_even(
             sin(2*pi()*c.f0*(CAST(s.j AS DOUBLE)/c.sr_hz))
             * CAST(32768.0 AS DOUBLE), 0) AS BIGINT)) AS BIGINT) AS ss_,
         CAST(sum(s.v * s.v) AS BIGINT) AS sq
  FROM samples s JOIN clean c USING (i)
  GROUP BY s.i, s.codec),
shared AS (
  SELECT i, codec, cs, ss_,
         2.0 * (CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                + CAST(ss_ AS DOUBLE) * CAST(ss_ AS DOUBLE))
         / (CAST(n AS DOUBLE) * 32768.0 * 32768.0 * CAST(sq AS DOUBLE))
           AS share
  FROM corr),
cl AS (SELECT codec,
         count(*) FILTER (WHERE share >= 0.78) AS n_dom,
         sum(CASE WHEN share >= 0.78
             THEN ((cs % 1000003) + 1000003) % 1000003 END) AS c_pin,
         sum(CASE WHEN share >= 0.78
             THEN ((ss_ % 1000003) + 1000003) % 1000003 END) AS s_pin
       FROM shared GROUP BY codec),
tot AS (SELECT codec, count(*) AS n_clips FROM full_ GROUP BY codec)
SELECT t.codec, CAST(t.n_clips AS BIGINT) AS n_clips,
       CAST(coalesce(cl.n_dom, 0) AS BIGINT) AS n_f0_dominant,
       CAST(t.n_clips - coalesce(cl.n_dom, 0) AS BIGINT) AS n_diffuse,
       CAST(coalesce(cl.c_pin, 0) AS BIGINT) AS c_pin,
       CAST(coalesce(cl.s_pin, 0) AS BIGINT) AS s_pin
FROM tot t LEFT JOIN cl USING (codec)
""")
def q_audio_goertzel_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin spectral verification (operators/multimodal.py:
    goertzel_profile): correlate decoded PCM against integer-quantized
    cos/sin templates at the contract pitch and test whether that
    frequency DOMINATES the clip's power (share >= 0.78 — clean clips
    measure 0.842-0.866, the planted noise-corrupted rows 0.705-0.709,
    so the threshold splits with ~9% margin on both sides). The
    spectral complement of audio_rms_check: a clip can pass loudness
    while carrying the wrong tone. Correlations are EXACT int64 sums
    (Q15 round-half-even weights), so the oracle refolds identical
    integers from the per-sample SQL twin and additionally pins
    sum-mod-1000003 of every dominant clip's C and S — bit-exactness
    of each correlation, not just the counts. Map-only Arrow stage;
    bytes never shuffle.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import goertzel_profile, goertzel_share

    clips = generate_clips(spark, _SNR_N, partitions=8)
    g = goertzel_profile(clips)
    share = goertzel_share(F.col("n_samples"), F.col("c_sum"),
                           F.col("s_sum"), F.col("sum_sq"))
    dom = (share >= F.lit(0.78))
    pin = lambda c: F.when(dom, F.pmod(F.col(c), F.lit(1000003)))  # noqa: E731
    agg = g.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(dom.cast("long")).alias("n_f0_dominant"),
        F.coalesce(F.sum(pin("c_sum")), F.lit(0).cast("long"))
        .alias("c_pin"),
        F.coalesce(F.sum(pin("s_sum")), F.lit(0).cast("long"))
        .alias("s_pin"))
    return agg.select(
        "codec", "n_clips", "n_f0_dominant",
        (F.col("n_clips") - F.col("n_f0_dominant")).alias("n_diffuse"),
        "c_pin", "s_pin")


@register("embedding_drift", oracle="""
WITH s AS (
  SELECT ('0x' || substr(md5('snap:' || CAST(vec_id AS VARCHAR)), 1, 8))
           ::BIGINT % 2 AS side,
         embedding
  FROM embeddings),
u AS (SELECT side, unnest(embedding) AS v0,
             unnest(range(len(embedding))) AS pos
      FROM s),
x AS (SELECT side, pos,
             CAST(v0 AS DOUBLE)
             + CASE WHEN side = 1 AND pos = 3 THEN 0.25
                    WHEN side = 1 AND pos = 7 THEN -0.12
                    ELSE 0.0 END AS v
      FROM u),
g AS (SELECT pos,
        count(v) FILTER (WHERE side = 0) AS n_a,
        count(v) FILTER (WHERE side = 1) AS n_b,
        avg(v) FILTER (WHERE side = 0) AS ma,
        avg(v) FILTER (WHERE side = 1) AS mb,
        stddev_samp(v) FILTER (WHERE side = 0) AS sa
      FROM x GROUP BY pos)
SELECT pos, n_a, n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round(sa, 6) AS stddev_a,
       round(abs(mb - ma) / sa, 6) AS shift_sigmas,
       CASE WHEN abs(mb - ma) / sa >= 1.5 THEN 'RED'
            WHEN abs(mb - ma) / sa >= 0.5 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM g
""")
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding drift between two snapshots
    (operators/embedding_qa.py:dimension_drift) — the encoder-version
    -change detector: a retrained/re-quantized encoder shifts
    per-dimension means long before norms or dead-dimension checks
    move. Snapshots are the md5 halves of the corpus; the candidate
    side gets a deterministic perturbation (dim 3 +0.25 → RED at 2.1σ,
    dim 7 −0.12 → YELLOW at 0.77σ; natural split noise maxes at 0.26σ,
    safely inside GREEN < 0.5σ) that both engines construct
    identically, then each runs its own detection. ONE scan: union
    with a side tag → posexplode → a single (pos) aggregate with
    per-side conditional stats.
    """
    from ...operators.embedding_qa import dimension_drift
    from ...operators.packing import hash32

    e = load_table(spark, sf_dir, "embeddings")
    side = F.pmod(hash32(F.col("vec_id"), "snap:"), F.lit(2))
    a = e.filter(side == 0).select(
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    b = e.filter(side == 1).select(
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i == 3, F.lit(0.25))
              .when(i == 7, F.lit(-0.12))
              .otherwise(F.lit(0.0)))
        .alias("embedding"))
    return dimension_drift(a, b, "embedding")


@register("embedding_quantization", oracle="""
WITH u AS (
  SELECT unnest(embedding) AS v0,
         unnest(range(len(embedding))) AS pos
  FROM embeddings),
x AS (SELECT pos,
             CASE WHEN pos IN (2, 5)
                  THEN CAST(CAST(floor(CAST(v0 AS DOUBLE) * 127 + 0.5) / 127
                                 AS REAL) AS DOUBLE)
                  ELSE CAST(v0 AS DOUBLE) END AS v
      FROM u),
g AS (SELECT pos, count(*) AS n,
             count(*) FILTER (
               WHERE abs(v * 127 - floor(v * 127 + 0.5)) < 1e-5)
               AS n_lattice
      FROM x GROUP BY pos)
SELECT pos, n, n_lattice,
       round(CAST(n_lattice AS DOUBLE) / n, 6) AS lattice_frac,
       CASE WHEN CAST(n_lattice AS DOUBLE) / n >= 0.99 THEN 'QUANTIZED'
            ELSE 'OK' END AS verdict
FROM g
""")
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantization detection
    (operators/embedding_qa.py:quantization_check) — the silent-int8
    detector: dims 2 and 5 are round-tripped through a symmetric int8
    lattice (floor(v·127+0.5)/127, stored as float32) exactly as a
    quantized store would, both engines constructing the perturbation
    identically, then each runs its own lattice-membership detection
    (|v·127 − nearest int| < 1e-5). Expected: dims 2/5 QUANTIZED at
    frac 1.0, all other dims OK at frac ~0. ONE scan: posexplode → a
    single (pos) partial+final aggregate with a conditional count —
    the exchange carries |tasks| × dim rows at any corpus size.
    Reinterprets the reference's declared-vs-actual tolerance checks
    (internal/dirty/decoder.go) for the vector-payload column.
    """
    from ...operators.embedding_qa import quantization_check

    e = load_table(spark, sf_dir, "embeddings")
    mixed = e.select(
        F.transform(
            "embedding",
            lambda x, i: F.when((i == 2) | (i == 5),
                                (F.floor(x.cast("double") * 127
                                         + F.lit(0.5)) / 127)
                                .cast("float").cast("double"))
            .otherwise(x.cast("double"))).alias("embedding"))
    return quantization_check(mixed, "embedding")


