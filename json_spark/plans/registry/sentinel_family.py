"""Registry section: sentinel / periodicity / type-drift / bit-depth family + late container formats (AIFF/µ-law/A-law/WER).

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    ensure_parallelism,
    load_table,
    psi,
    register,
)
from .audio import (
    _CLIPS_CLOSED_FORM_CTE,
    _PCM_SAMPLES_CTE,
    _SNR_N,
)

# =========================================================================
# sentinel / periodicity / type-drift / bit-depth family
# =========================================================================

@register("sentinel_scan", oracle="""
WITH dirty AS (
  SELECT CASE (o_orderkey % 37) WHEN 0 THEN -1 WHEN 1 THEN 99999999
              ELSE o_custkey END AS custkey_d,
         CASE (o_orderkey % 41) WHEN 0 THEN 0.0 WHEN 1 THEN -999.0
              ELSE o_totalprice END AS price_d,
         CASE (o_orderkey % 43) WHEN 0 THEN '' WHEN 1 THEN 'N/A'
              WHEN 2 THEN 'null' ELSE o_orderpriority END AS prio_d,
         CASE (o_orderkey % 47) WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'
              ELSE o_orderdate END AS date_d
  FROM orders),
agg AS (
  SELECT count(*) AS n_rows,
         count(*) FILTER (WHERE custkey_d IN (-1, 0, 99999999)) AS s_cust,
         count(*) FILTER (WHERE price_d <= 0.0) AS s_price,
         count(*) FILTER (WHERE trim(prio_d) = '' OR upper(prio_d) IN
                ('N/A','NULL','NONE','UNKNOWN','--')) AS s_prio,
         count(*) FILTER (WHERE date_d < TIMESTAMP '1971-01-01') AS s_date
  FROM dirty)
SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_sentinel AS BIGINT) AS n_sentinel,
       round(n_sentinel * 1.0 / n_rows, 6) AS sentinel_rate,
       CASE WHEN n_sentinel * 1.0 / n_rows > 0.01 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM (
  SELECT 'o_custkey' AS col_name, n_rows, s_cust AS n_sentinel FROM agg
  UNION ALL SELECT 'o_totalprice', n_rows, s_price FROM agg
  UNION ALL SELECT 'o_orderpriority', n_rows, s_prio FROM agg
  UNION ALL SELECT 'o_orderdate', n_rows, s_date FROM agg)
""")
def q_sentinel_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel / placeholder-value detection (operators/sentinel.py):
    in-band "missing" conventions — -1/0/all-9s ids, non-positive
    amounts, ''/'N/A'/'null' strings, epoch timestamps — that parse
    cleanly and are invisible to null-rate stats. The semantic
    complement of d3rty's syntactic null coercions (bool_from_null /
    number_from_null, internal/decoder/decoder.go): those normalize the
    SPELLINGS of null, this finds the values producers use INSTEAD of
    null. Dirty rows are derived deterministically from orders
    (o_orderkey residue classes) by both engines; each side then runs
    its own classifier. ONE scan however many columns: every predicate
    is a conditional count inside a single 1-row map-combinable
    aggregate, unpivoted by a literal stack — at 10^12 rows the
    exchange carries one partial row per task.
    """
    from ...operators.sentinel import (
        id_sentinels, numeric_sentinels, sentinel_scan,
        string_sentinels, timestamp_sentinels)
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dirty = o.select(
        F.when(F.pmod(k, 37) == 0, F.lit(-1).cast("long"))
        .when(F.pmod(k, 37) == 1, F.lit(99999999).cast("long"))
        .otherwise(F.col("o_custkey")).alias("custkey_d"),
        F.when(F.pmod(k, 41) == 0, F.lit(0.0))
        .when(F.pmod(k, 41) == 1, F.lit(-999.0))
        .otherwise(F.col("o_totalprice")).alias("price_d"),
        F.when(F.pmod(k, 43) == 0, F.lit(""))
        .when(F.pmod(k, 43) == 1, F.lit("N/A"))
        .when(F.pmod(k, 43) == 2, F.lit("null"))
        .otherwise(F.col("o_orderpriority")).alias("prio_d"),
        F.when(F.pmod(k, 47) == 0,
               F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"))
        .otherwise(F.col("o_orderdate")).alias("date_d"))
    return sentinel_scan(dirty, [
        ("o_custkey", id_sentinels(F.col("custkey_d"))),
        ("o_totalprice", numeric_sentinels(F.col("price_d"))),
        ("o_orderpriority", string_sentinels(F.col("prio_d"))),
        ("o_orderdate", timestamp_sentinels(F.col("date_d"))),
    ])


@register("event_autocorr", oracle="""
WITH c AS (
  SELECT epoch_us(ts) // 60000000 AS m, count(*) AS cnt
  FROM events GROUP BY 1),
bounds AS (SELECT min(m) AS lo, max(m) AS hi FROM c),
grid AS (
  SELECT g.m, COALESCE(c.cnt, 0) AS cnt
  FROM (SELECT unnest(range((SELECT lo FROM bounds),
                            (SELECT hi FROM bounds) + 1)) AS m) g
  LEFT JOIN c USING (m)),
lags AS (SELECT unnest([1, 2, 3]) AS lag),
pairs AS (
  SELECT l.lag, a.cnt AS x, b.cnt AS y
  FROM lags l
  JOIN grid a ON TRUE
  JOIN grid b ON b.m = a.m + l.lag)
SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x*y) AS BIGINT) AS sum_xy,
       round(CAST(count(*)*sum(x*y) - sum(x)*sum(y) AS DOUBLE) /
             (sqrt(CAST(count(*)*sum(x*x) - sum(x)*sum(x) AS DOUBLE)) *
              sqrt(CAST(count(*)*sum(y*y) - sum(y)*sum(y) AS DOUBLE))),
             6) AS autocorr
FROM pairs GROUP BY lag
""")
def q_event_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-rhythm periodicity profile (operators/temporal.py:
    autocorrelation): lag-k Pearson autocorrelation of per-minute event
    counts on the DENSE minute grid (missing minutes count 0 — dropping
    them would bias r toward the busy regime). Sees what coverage_gaps
    (silence) and drift_changepoint (level shifts) can't: batch-period
    spikes and duplicated-window lobes in an otherwise-complete feed.
    Exact integer sums travel with r so the report is auditable; r is
    one closed-form IEEE expression over them (identical cross-engine).
    Corpus collapses in ONE map-combinable bucket-count aggregate; the
    grid (explode(sequence) over a 1-row span) and per-lag self-join
    are |buckets|-sized metadata work. Minute ids via epoch-µs integer
    division (session-TZ-proof, same idiom as coverage_gaps).
    """
    from ...operators.temporal import autocorrelation
    ev = load_table(spark, sf_dir, "events")
    return autocorrelation(ev, "ts", lags=(1, 2, 3), bucket_s=60)


@register("key_type_drift", oracle="""
WITH mx AS (SELECT max(event_id) AS m FROM events),
d AS (
  SELECT 'k' || CAST(event_id % 5 AS VARCHAR) AS key,
         CASE WHEN event_id <= (SELECT m FROM mx) // 2
              THEN 'early' ELSE 'late' END AS half,
         CASE CASE WHEN event_id % 11 = 0 THEN event_id % 7
                   WHEN event_id <= (SELECT m FROM mx) // 2
                        THEN event_id % 5
                   ELSE (event_id % 5 + 2) % 7 END
              WHEN 0 THEN '123' WHEN 1 THEN '"s7"' WHEN 2 THEN 'true'
              WHEN 3 THEN '1.5' WHEN 4 THEN 'null' WHEN 5 THEN '[1,2]'
              ELSE '{"a":1}' END AS val
  FROM events),
typed AS (
  SELECT key, half,
         CASE json_type(val::JSON)
              WHEN 'UBIGINT' THEN 'integer' WHEN 'BIGINT' THEN 'integer'
              WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean'
              WHEN 'DOUBLE' THEN 'double' WHEN 'NULL' THEN 'null'
              WHEN 'ARRAY' THEN 'array' ELSE 'object' END AS jtype
  FROM d),
counts AS (
  SELECT key, half, jtype, count(*) AS cnt
  FROM typed GROUP BY key, half, jtype),
ranked AS (
  SELECT key, half, jtype, cnt,
         row_number() OVER (PARTITION BY key, half
                            ORDER BY cnt DESC, jtype ASC) AS rn
  FROM counts),
dom AS (
  SELECT key,
         max(CASE WHEN half='early' THEN jtype END) AS dominant_early,
         max(CASE WHEN half='late' THEN jtype END) AS dominant_late,
         CAST(max(CASE WHEN half='early' THEN cnt END) AS BIGINT)
             AS n_dom_early,
         CAST(max(CASE WHEN half='late' THEN cnt END) AS BIGINT)
             AS n_dom_late
  FROM ranked WHERE rn = 1 GROUP BY key)
SELECT key, dominant_early, dominant_late, n_dom_early, n_dom_late,
       CAST(dominant_early <> dominant_late AS BOOLEAN) AS drifted
FROM dom
""")
def q_key_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-JSON value-TYPE drift (operators/profiling.py:
    json_value_type + dominant_type_drift): per key, the dominant JSON
    value type in the early half of the id space vs the late half —
    the producer that silently turned ints into strings or scalars into
    objects. Every individual document still parses (d3rty would coerce
    each row without complaint; decoder.go's tolerance is exactly why
    nobody notices); only the cross-time comparison sees the change.
    Completes the schema-evolution pair with key_emergence (keys
    appearing/retiring vs types changing). Dirty JSON values are
    derived deterministically from events (event_id residue classes +
    a planted dominant-type rotation between halves, ~9% noise rows);
    Spark classifies them with its VARIANT engine
    (schema_of_variant(try_parse_json)), the oracle with DuckDB's
    json_type() — two genuinely different JSON parsers and type
    lattices normalized to the same seven names. Corpus collapses in
    ONE map-combinable (key, half, type) aggregate; the rank window
    runs on the |keys|x2x7 count table.
    """
    from ...operators.profiling import dominant_type_drift, json_value_type
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    mx = ev.agg(F.max("event_id").alias("__mx"))
    early = eid <= F.expr("__mx DIV 2")
    ti = (F.when(F.pmod(eid, 11) == 0, F.pmod(eid, 7))
          .when(early, F.pmod(eid, 5))
          .otherwise(F.pmod(F.pmod(eid, 5) + 2, 7)))
    val = (F.when(ti == 0, "123").when(ti == 1, '"s7"')
           .when(ti == 2, "true").when(ti == 3, "1.5")
           .when(ti == 4, "null").when(ti == 5, "[1,2]")
           .otherwise('{"a":1}'))
    d = (ev.join(F.broadcast(mx))
         .select(F.concat(F.lit("k"), F.pmod(eid, 5)).alias("key"),
                 F.when(early, "early").otherwise("late").alias("half"),
                 val.alias("val")))
    typed = d.select("key", "half",
                     json_value_type(F.col("val")).alias("jtype"))
    return dominant_type_drift(typed, "key", "jtype", "half")


@register("audio_bit_depth", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
per_clip AS (
  SELECT i, codec, bit_or(abs(v)) AS or_abs
  FROM samples GROUP BY i, codec),
eff AS (
  SELECT codec, or_abs,
         CASE WHEN or_abs = 0 THEN CAST(0 AS BIGINT)
              ELSE 16 - bit_count(CAST((or_abs & (-or_abs)) - 1 AS BIGINT))
         END AS eff_bits
  FROM per_clip)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(bit_or(or_abs) AS BIGINT) AS codec_or,
       CAST(min(eff_bits) AS BIGINT) AS min_eff_bits,
       CAST(max(eff_bits) AS BIGINT) AS max_eff_bits,
       CAST(count(*) FILTER (WHERE eff_bits <= 8) AS BIGINT) AS n_low_bits
FROM eff GROUP BY codec
""")
def q_audio_bit_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-bit-depth QA on decoded CONTENT (operators/snr.py:
    pcm_bit_depth): per-codec roll-up of the bitwise-OR-of-|v| fold
    over every clean clip's recovered int16 lattice; effective depth =
    16 − ctz(or_abs), ctz in pure integer Column arithmetic via
    bit_count((x & −x) − 1). Flags corpora whose 16-bit storage carries
    8-bit content (upstream requantization) — the audio twin of d3rty's
    declared-type-wider-than-the-information coercions. The OR fold is
    order/chunk-invariant, so the oracle reproduces it bit-for-bit from
    the analytic per-sample SQL twin (bit_or over the replayed samples)
    without reading a byte. One decode pass, map-only Arrow; the
    roll-up ORs map-side into |codec| rows; payload never shuffles.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_bit_depth
    clips = generate_clips(spark, _SNR_N, partitions=8)
    prof = pcm_bit_depth(clips, extra_cols=["codec"])
    eff = (F.when(F.col("or_abs") == 0, F.lit(0))
           .otherwise(F.lit(16) - F.bit_count(
               F.col("or_abs").bitwiseAND(-F.col("or_abs")) - F.lit(1)))
           .cast("long"))
    return (prof.filter(F.col("verdict") == "GREEN")
            .withColumn("eff_bits", eff)
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.expr("bit_or(or_abs)").alias("codec_or"),
                 F.min("eff_bits").alias("min_eff_bits"),
                 F.max("eff_bits").alias("max_eff_bits"),
                 F.sum((F.col("eff_bits") <= 8).cast("long"))
                 .alias("n_low_bits")))


@register("size_model_conformance", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
meta AS (
  SELECT f.i, f.codec,
         CAST(substring(b.clip_id, 6) AS BIGINT) AS rid,
         f.sr_hz, f.dur_ms
  FROM full_ f JOIN base b USING (i)
  WHERE f.dur_ms IS NOT NULL),
obs AS (
  SELECT codec,
         CAST(greatest(1, floor(sr_hz * (dur_ms *
              CASE WHEN rid % 53 = 0 THEN 3 ELSE 1 END) / 1000.0))
              AS BIGINT) AS x,
         44 + 2 * CAST(greatest(1, floor(sr_hz * dur_ms / 1000.0))
                       AS BIGINT) AS y
  FROM meta),
r AS (SELECT codec, (10000 * y) // x AS v, x, y FROM obs),
rcnt AS (SELECT codec, v, count(*) AS c FROM r GROUP BY codec, v),
rcum AS (
  SELECT codec, v, c,
         sum(c) OVER (PARTITION BY codec ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY codec) AS n
  FROM rcnt),
bfit AS (
  SELECT codec, CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                     AS BIGINT) AS bfp
  FROM rcum GROUP BY codec),
e AS (
  SELECT r.codec, 10000 * y - bfp * x AS ev, x, y, bfp
  FROM r JOIN bfit USING (codec)),
ecnt AS (SELECT codec, ev, count(*) AS c FROM e GROUP BY codec, ev),
ecum AS (
  SELECT codec, ev, c,
         sum(c) OVER (PARTITION BY codec ORDER BY ev) AS cum,
         sum(c) OVER (PARTITION BY codec) AS n
  FROM ecnt),
afit AS (
  SELECT codec, CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN ev END)
                     AS BIGINT) AS afp
  FROM ecum GROUP BY codec),
scored AS (
  SELECT e.codec, e.bfp, a.afp,
         CASE WHEN abs(e.ev - a.afp) > 10000 * 1000 THEN 1 ELSE 0 END
             AS is_out
  FROM e JOIN afit a USING (codec))
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(max(bfp) / 10000.0, 4) AS slope,
       round(max(afp) / 10000.0, 2) AS intercept,
       CAST(sum(is_out) AS BIGINT) AS n_outliers,
       round(sum(is_out) * 1.0 / count(*), 6) AS outlier_rate,
       CASE WHEN sum(is_out) * 1.0 / count(*) > 0.005 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM scored GROUP BY codec
""")
def q_size_model_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust size-law conformance (operators/anomaly.py:
    robust_line_conformance): per codec, learn payload_bytes ≈
    a + b·declared_samples with MEDIAN coefficients and flag rows whose
    actual byte length contradicts their declared duration — the
    metadata liar detector for OPAQUE codecs, where
    metadata_consistency's exact header formula does not exist and the
    law must be learned from the fleet. Planted liars (clip-id residue
    % 53 declares 3× the true duration, ~2% of rows) would drag an OLS
    fit toward themselves and flag honest rows (measured: slope 1.51,
    485 false outliers); the median slope/intercept (breakdown 50%)
    leave them outside the line — n_outliers equals the planted-liar
    count exactly, per codec, with a 19× residual margin around the
    1000-byte threshold. The whole fit runs in 1e-4 fixed point
    (exact int64 ratios/residuals, k = ceil(n/2) k-th-smallest medians)
    so the oracle replays every coefficient bit-for-bit; y is the REAL
    payload length Column-side (length(bytes), no decode) while the
    oracle derives it closed-form (44 + 2·samples, the WAV container
    law). Corpus collapses into metadata-domain-bounded value-count
    tables; coefficients broadcast back; no corpus window.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.anomaly import robust_line_conformance
    clips = generate_clips(spark, _SNR_N, partitions=8)
    rid = F.expr("CAST(substring(clip_id, 6) AS BIGINT)")
    mult = F.when(F.pmod(rid, 53) == 0, F.lit(3)).otherwise(F.lit(1))
    x = F.greatest(
        F.lit(1),
        F.floor(F.col("sr_hz") * (F.col("dur_ms") * mult) / F.lit(1000.0))
    ).cast("long")
    d = (clips.filter(F.col("dur_ms").isNotNull())
         .select("codec", x.alias("x_declared"),
                 F.length("bytes").cast("long").alias("y_bytes")))
    return robust_line_conformance(d, "x_declared", "y_bytes", ["codec"],
                                   abs_threshold=1000)


@register("schema_contract", oracle=r"""
WITH contract(ord, decl_name, decl_family, required) AS (
  VALUES (1,'event_id','integer',true),
         (2,'TS','timestamp',true),
         (3,'User-Id','integer',true),
         (4,'event_type','string',true),
         (5,'value','integer',false),
         (6,'Event-Type','boolean',false),
         (7,'ingest_batch','string',true),
         (8,'quality_score','fractional',false)),
actual AS (
  SELECT column_name AS aname,
         CASE WHEN column_type LIKE 'DECIMAL%' THEN 'fractional'
              WHEN column_type IN ('TINYINT','SMALLINT','INTEGER','BIGINT',
                   'HUGEINT','UTINYINT','USMALLINT','UINTEGER','UBIGINT')
                   THEN 'integer'
              WHEN column_type IN ('FLOAT','REAL','DOUBLE') THEN 'fractional'
              WHEN column_type = 'VARCHAR' THEN 'string'
              WHEN column_type = 'BOOLEAN' THEN 'boolean'
              WHEN column_type = 'BLOB' THEN 'binary'
              WHEN column_type = 'DATE' THEN 'date'
              WHEN column_type LIKE 'TIMESTAMP%' THEN 'timestamp'
              ELSE lower(column_type) END AS afam,
         row_number() OVER () AS pos
  FROM (DESCRIBE events)),
norm AS (SELECT *, lower(replace(replace(replace(aname,'-',''),'_',''),' ',''))
                AS anorm FROM actual),
matched AS (
  SELECT c.*,
    (SELECT min(pos) FROM norm a WHERE a.aname = c.decl_name) AS p_exact,
    (SELECT min(pos) FROM norm a
     WHERE lower(a.aname) = lower(c.decl_name)) AS p_ci,
    (SELECT min(pos) FROM norm a WHERE a.anorm =
     lower(replace(replace(replace(c.decl_name,'-',''),'_',''),' ','')))
        AS p_cham
  FROM contract c),
resolved AS (
  SELECT m.*,
    CASE WHEN p_exact IS NOT NULL THEN 'exact'
         WHEN p_ci IS NOT NULL THEN 'case_insensitive'
         WHEN p_cham IS NOT NULL THEN 'chameleon'
         ELSE 'missing' END AS match_kind,
    COALESCE(p_exact, p_ci, p_cham) AS pos
  FROM matched m),
joined AS (
  SELECT r.*, a.aname, a.afam FROM resolved r LEFT JOIN norm a USING (pos)),
verdicts AS (
  SELECT decl_name AS field, aname AS matched_name, match_kind,
         decl_family AS declared_family, afam AS actual_family, required,
         CASE WHEN match_kind = 'missing'
              THEN CASE WHEN required THEN 'RED' ELSE 'YELLOW' END
              ELSE CASE greatest(
                     CASE WHEN match_kind = 'exact' THEN 0 ELSE 1 END,
                     CASE WHEN decl_family = afam THEN 0
                          WHEN decl_family = 'fractional'
                               AND afam = 'integer' THEN 0
                          WHEN decl_family = 'integer'
                               AND afam = 'fractional' THEN 1
                          WHEN decl_family = 'string' THEN 1
                          ELSE 2 END)
                   WHEN 0 THEN 'GREEN' WHEN 1 THEN 'YELLOW'
                   ELSE 'RED' END
         END AS verdict
  FROM joined),
unknowns AS (
  SELECT a.aname AS field, a.aname AS matched_name,
         'unknown' AS match_kind, CAST(NULL AS VARCHAR) AS declared_family,
         a.afam AS actual_family, false AS required, 'YELLOW' AS verdict
  FROM norm a
  WHERE NOT EXISTS (SELECT 1 FROM contract c
     WHERE lower(replace(replace(replace(c.decl_name,'-',''),'_',''),' ',''))
           = a.anorm))
SELECT * FROM verdicts UNION ALL SELECT * FROM unknowns
""")
def q_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract validation with FlexKeys tolerance
    (operators/schema.py): the reference's key-matching ladder (exact →
    case-insensitive → chameleon, decoder.go:242-262) and coercion
    stance applied to the events TABLE schema. Name matched only
    tolerantly → YELLOW; type families compare with the coercion
    direction baked in (fractional-over-integer widens GREEN,
    integer-over-fractional needs rounding YELLOW, string tolerates
    anything YELLOW, else RED); missing required RED / optional YELLOW;
    unclaimed actual columns surface as UNKNOWN rows (the unknown-field
    skip made visible). Both engines introspect the SAME parquet file
    independently (Spark df.schema vs DuckDB DESCRIBE) and normalize
    their OWN type spellings to shared family names — a genuine
    cross-engine schema read, not a constant-table compare. Metadata
    only: validating a 10^12-row table costs what an empty one costs
    (no scan, no job).
    """
    from ...operators.schema import ContractField, schema_contract_report
    ev = load_table(spark, sf_dir, "events")
    contract = [
        ContractField("event_id", "integer", True),
        ContractField("TS", "timestamp", True),
        ContractField("User-Id", "integer", True),
        ContractField("event_type", "string", True),
        ContractField("value", "integer", False),
        ContractField("Event-Type", "boolean", False),
        ContractField("ingest_batch", "string", True),
        ContractField("quality_score", "fractional", False),
    ]
    return schema_contract_report(spark, ev, contract)


@register("audio_polarity", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
per_clip AS (
  SELECT i, codec, SUM(v) AS s1, SUM(v*v*v) AS s3
  FROM samples GROUP BY i, codec)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(SUM(s1) AS BIGINT) AS pcm_sum_total,
       CAST(SUM(s3) AS BIGINT) AS cube_total,
       CAST(count(*) FILTER (WHERE s3 < 0) AS BIGINT) AS n_neg_skew,
       CAST(count(*) FILTER (WHERE s3 > 0) AS BIGINT) AS n_pos_skew,
       CAST(count(*) FILTER (WHERE s3 = 0) AS BIGINT) AS n_sym
FROM per_clip GROUP BY codec
""")
def q_audio_polarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform-asymmetry / polarity profile (operators/snr.py:
    pcm_polarity): per-codec roll-up of the exact third-moment digest
    Σv³ over every clean clip — the inverted-polarity ingest detector
    (a sign flip negates Σv³ exactly; power, peak, RMS, ZCR, and
    magnitude histograms are all blind to it). Speech-like asymmetric
    sources carry a stable skew sign per clip, so a sub-population
    disagreeing with its codec's fleet is flagged before training; the
    fixture's phase-offset harmonic stack gives each clip a
    deterministic sign the oracle re-derives per sample from pure SQL
    trigonometry, bit-for-bit (exact int64, |v|³ ≤ 3.52e13). One
    decode pass, map-only Arrow, per-codec aggregate map-side; the
    payload never shuffles.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.snr import pcm_polarity
    clips = generate_clips(spark, _SNR_N, partitions=8)
    prof = pcm_polarity(clips, extra_cols=["codec"])
    return (prof.filter(F.col("verdict") == "GREEN")
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum("pcm_sum").alias("pcm_sum_total"),
                 F.sum("pcm_cube_sum").alias("cube_total"),
                 F.sum((F.col("pcm_cube_sum") < 0).cast("long"))
                 .alias("n_neg_skew"),
                 F.sum((F.col("pcm_cube_sum") > 0).cast("long"))
                 .alias("n_pos_skew"),
                 F.sum((F.col("pcm_cube_sum") == 0).cast("long"))
                 .alias("n_sym")))


@register("quarantine_rows", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
rows_cf AS (
  SELECT f.i, b.clip_id, f.codec, f.sr_hz, f.dur_ms
  FROM full_ f JOIN base b USING (i)),
bad AS (
  SELECT DISTINCT clip_id FROM rows_cf WHERE i % 997 = 996
  UNION
  SELECT DISTINCT clip_id FROM rows_cf WHERE i % 1000 = 999 AND i > 0)
SELECT r.clip_id, r.codec, CAST(r.sr_hz AS BIGINT) AS sr_hz,
       CAST(r.dur_ms AS BIGINT) AS dur_ms
FROM rows_cf r JOIN bad USING (clip_id)
""")
def q_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine sink (plans/suite.py:quarantine): the FULL rows of
    every clip the suite's violations name — the repair/triage side
    table the truncated violation evidence cannot serve. A base suite
    run violates on planted SNR corruption (i % 997) and duplicate ids
    (i % 1000 reuse), so the oracle derives the exact quarantined row
    set — BOTH copies of each duplicate pair, since the semi-join is by
    key — from the generator arithmetic without reading a byte; a match
    proves the violations → distinct-keys → LEFT SEMI extraction loses
    and invents nothing. The payload never shuffles (defect-sized key
    set broadcasts; bytes stream map-side).
    """
    from ...fixtures.gen import generate_clips
    from ...plans.suite import SuiteConfig, ValidationSuite, quarantine
    clips = generate_clips(spark, _SNR_N, partitions=8)
    res = ValidationSuite(SuiteConfig()).run(spark, clips)
    q = quarantine(clips, res.violations)
    return q.select("clip_id", "codec",
                    F.col("sr_hz").cast("long").alias("sr_hz"),
                    F.col("dur_ms").cast("long").alias("dur_ms"))


@register("data_freshness", oracle="""
WITH a AS (
  SELECT event_type, count(*) AS n_rows, max(ts) AS newest,
         max(epoch_us(ts)) AS mx
  FROM events GROUP BY 1),
l AS (
  SELECT event_type, n_rows, newest,
         (epoch_us(TIMESTAMP '2024-01-31 00:30:00') - mx) // 60000000
           AS lag_minutes
  FROM a)
SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows, newest,
       CAST(lag_minutes AS BIGINT) AS lag_minutes,
       CASE WHEN lag_minutes IS NULL THEN 'RED'
            WHEN lag_minutes >= 1440 THEN 'RED'
            WHEN lag_minutes >= 60 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM l
""")
def q_data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness check (operators/temporal.py:freshness): per
    event_type, the staleness of the newest row against a pinned as-of
    instant — the "feed silently stopped" monitor, the single most
    common production data incident, and the temporal complement of
    coverage_gaps (holes in the past vs a dead tail). The as-of instant
    is an explicit parameter, never the wall clock, so runs are
    reproducible, resumable, and cross-engine checkable; lag arithmetic
    is integer microseconds (session-TZ-proof). ONE map-combinable
    max/count aggregate touches the corpus — the cheapest check in the
    suite at any scale; everything after runs on |groups| rows.
    """
    from ...operators.temporal import freshness
    ev = load_table(spark, sf_dir, "events")
    return freshness(ev, "ts", ["event_type"],
                     as_of="2024-01-31 00:30:00",
                     yellow_minutes=60, red_minutes=1440)


@register("agg_reconciliation", oracle="""
WITH csum AS (
  SELECT l_orderkey AS k,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS c
  FROM lineitem GROUP BY 1),
j AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(18,2)) AS p, c.c
  FROM orders o LEFT JOIN csum c ON c.k = o.o_orderkey),
cls AS (
  SELECT p, c,
         c IS NULL AS childless,
         CASE WHEN abs(p) > 0
              THEN CAST(abs(p - c) / abs(p) AS DOUBLE) END AS rel,
         c IS NOT NULL AND
           COALESCE(CAST(abs(p - c) / abs(p) AS DOUBLE) > 0.05,
                    abs(p - c) > 0) AS mismatched
  FROM j)
SELECT CAST(count(*) AS BIGINT) AS n_parents,
       CAST(count(*) - sum(CASE WHEN childless THEN 1 ELSE 0 END)
            - sum(CASE WHEN mismatched THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matched,
       CAST(sum(CASE WHEN mismatched THEN 1 ELSE 0 END) AS BIGINT)
           AS n_mismatched,
       CAST(sum(CASE WHEN childless THEN 1 ELSE 0 END) AS BIGINT)
           AS n_childless,
       round(sum(CASE WHEN mismatched THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS mismatch_rate,
       max(CASE WHEN NOT childless THEN round(rel, 6) END)
           AS max_rel_delta,
       CASE WHEN sum(CASE WHEN mismatched THEN 1 ELSE 0 END) * 1.0
                 / count(*) > 0.01 THEN 'RED'
            WHEN sum(CASE WHEN mismatched THEN 1 ELSE 0 END) > 0
                 OR sum(CASE WHEN childless THEN 1 ELSE 0 END) > 0
                 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM cls
""")
def q_agg_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table aggregate reconciliation (operators/consistency.py:
    agg_reconciliation): orders' declared o_totalprice vs the DECIMAL-
    exact sum of their line items — the silent double-ingest /
    partial-load failure class referential checks can't see (the keys
    all exist; the NUMBERS disagree). DECIMAL(18,2) sums are exact and
    addition-order-invariant, so boundary rows classify identically in
    both engines (float sums would make near-tolerance keys
    engine-dependent). The synthetic tables deliberately do NOT
    reconcile (independent random totals) — the check's job is to say
    exactly how much: counts per class, mismatch rate, worst relative
    delta, verdict. Child collapses map-side BEFORE the one key
    shuffle; the summary is a 1-row aggregate.
    """
    from ...operators.consistency import agg_reconciliation
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return agg_reconciliation(orders, lineitem, "o_orderkey",
                              "o_totalprice", "l_extendedprice",
                              child_key="l_orderkey")


@register("orphan_value_mass", oracle="""
WITH pk AS (SELECT DISTINCT o_orderkey AS k FROM orders),
j AS (
  SELECT CAST(l.l_extendedprice AS DECIMAL(18,2)) AS v,
         pk.k IS NULL AS orphan
  FROM lineitem l LEFT JOIN pk ON pk.k = l.l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphan_rows,
       round(sum(CASE WHEN orphan THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           AS orphan_row_share,
       CAST(COALESCE(sum(CASE WHEN orphan THEN v END),
                     CAST(0 AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS orphan_value,
       round(CAST(COALESCE(sum(CASE WHEN orphan THEN v END), 0) AS DOUBLE)
             / CAST(sum(v) AS DOUBLE), 6) AS orphan_value_share
FROM j
""")
def q_orphan_value_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity weighted by VALUE (operators/referential.py:
    orphan_value_mass): line items whose order is missing, with the
    money at stake — "3% of rows orphaned" and "0.1% of revenue
    orphaned" are different incidents that key-count orphan reports
    cannot distinguish. DECIMAL(18,2) sums keep both shares exact and
    order-invariant; the parent reduces to distinct keys before the
    single flag join so row and value totals come from one pass.
    """
    from ...operators.referential import orphan_value_mass
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return orphan_value_mass(lineitem, orders, "l_orderkey", "o_orderkey",
                             "l_extendedprice")


@register("duration_balance", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
agg AS (
  SELECT codec, CAST(count(*) AS BIGINT) AS n_clips,
         CAST(count(*) FILTER (WHERE dur_ms IS NULL) AS BIGINT)
             AS n_null_dur,
         CAST(COALESCE(sum(dur_ms), 0) AS BIGINT) AS ms
  FROM full_ GROUP BY codec),
tot AS (SELECT sum(ms) AS t FROM agg)
SELECT codec, n_clips, n_null_dur,
       round(ms / 1000.0, 3) AS total_s,
       round(CAST(ms AS DOUBLE) / t, 6) AS dur_share,
       CASE WHEN CAST(ms AS DOUBLE) / t < 0.05 THEN 'UNDERREPRESENTED'
            ELSE 'OK' END AS status
FROM agg, tot
""")
def q_duration_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus balance in the audio-native unit (operators/balance.py:
    duration_balance): total SECONDS per codec and its duration share —
    training pipelines budget hours of speech, not clip counts, and the
    two disagree whenever duration correlates with the group. Null
    durations are counted but excluded from the time sums (unknown
    length can't inflate a share). The oracle re-derives every
    millisecond from the generator's closed-form metadata (CRC-32 SQL
    fold), no byte read; exact integer sums, one map-combinable
    aggregate + a 1-row broadcast.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.balance import duration_balance
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return duration_balance(clips, ["codec"])


@register("split_divergence", oracle="""
WITH lab AS (
  SELECT CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 1000 < 960 THEN 'train'
              WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 1000 < 980 THEN 'val'
              ELSE 'test' END AS split,
         text
  FROM documents),
tok AS (
  SELECT split, unnest(string_split(text, ' ')) AS term FROM lab
  WHERE split IN ('train', 'val')),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS c FROM tok GROUP BY 1
    ORDER BY c DESC, term ASC LIMIT 100)),
mapped AS (
  SELECT t.split,
         CASE WHEN v.term IS NULL THEN '__OOV' ELSE t.term END AS category
  FROM tok t LEFT JOIN vocab v USING (term)),
h AS (
  SELECT split, category, count(*) AS n,
         count(*) / sum(count(*)) OVER (PARTITION BY split) AS share
  FROM mapped GROUP BY split, category),
j AS (
  SELECT COALESCE(c.category, b.category) AS category,
         COALESCE(c.share, 0.0) AS p, COALESCE(b.share, 0.0) AS q
  FROM (SELECT * FROM h WHERE split = 'val') c
  FULL OUTER JOIN (SELECT * FROM h WHERE split = 'train') b
    USING (category)),
tots AS (
  SELECT CAST(sum(n) FILTER (WHERE split = 'train') AS BIGINT) AS n_train,
         CAST(sum(n) FILTER (WHERE split = 'val') AS BIGINT) AS n_val
  FROM h)
SELECT n_train AS n_train_tokens, n_val AS n_val_tokens,
       round((SELECT sum((greatest(p, 1e-6) - greatest(q, 1e-6))
                         * ln(greatest(p, 1e-6) / greatest(q, 1e-6)))
              FROM j), 6) AS psi,
       CASE WHEN (SELECT sum((greatest(p, 1e-6) - greatest(q, 1e-6))
                             * ln(greatest(p, 1e-6) / greatest(q, 1e-6)))
                  FROM j) > 0.25 THEN 'RED'
            WHEN (SELECT sum((greatest(p, 1e-6) - greatest(q, 1e-6))
                             * ln(greatest(p, 1e-6) / greatest(q, 1e-6)))
                  FROM j) > 0.1 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM tots
""")
def q_split_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val token-distribution divergence (composition of
    operators/packing.py:assign_split + text.py:top_vocab +
    drift.py:psi): contamination checks prove the splits share no
    DOCUMENTS; this proves the val split still LOOKS like training —
    PSI between the two splits' token-share distributions over the
    corpus top-100 vocabulary (+ an __OOV bucket so tail mass is
    measured, never dropped). A hash-bucketed split SHOULD come out
    GREEN; a time- or source-based split that silently shifted topic
    mix shows up here and nowhere else. Scale shape: explode collapses
    map-side into (split, term) counts, the vocabulary is k-bounded
    (TakeOrderedAndProject) and broadcast, PSI runs on ≤2(k+1) share
    rows. Split labels via the md5-bucket rule both engines compute
    bit-identically (packing.py:hash32 twin).
    """
    from pyspark.sql import Window

    from ...operators.drift import psi
    from ...operators.packing import assign_split
    from ...operators.text import tokens, top_vocab
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(assign_split(F.col("doc_id")).alias("split"), "text") \
        .filter(F.col("split").isin("train", "val"))
    vocab = top_vocab(lab, "text", 100).select("term")
    tok = lab.select("split", F.explode(tokens(F.col("text"))).alias("term"))
    mapped = (tok.join(F.broadcast(vocab.withColumn("__hit", F.lit(1))),
                       "term", "left")
              .select("split",
                      F.when(F.col("__hit").isNull(), "__OOV")
                      .otherwise(F.col("term")).alias("category")))
    counts = mapped.groupBy("split", "category").agg(
        F.count(F.lit(1)).alias("n"))
    tot_w = Window.partitionBy("split")
    h = counts.withColumn("share", F.col("n") / F.sum("n").over(tot_w))
    cur = h.filter(F.col("split") == "val").select("category", "share")
    base = h.filter(F.col("split") == "train").select("category", "share")
    d = psi(cur, base, on=["category"])
    tots = counts.agg(
        F.sum(F.when(F.col("split") == "train", F.col("n")))
        .alias("n_train_tokens"),
        F.sum(F.when(F.col("split") == "val", F.col("n")))
        .alias("n_val_tokens"))
    p = F.col("psi")
    return (tots.join(F.broadcast(d))
            .select("n_train_tokens", "n_val_tokens",
                    F.round(p, 6).alias("psi"),
                    F.when(p > 0.25, "RED").when(p > 0.1, "YELLOW")
                    .otherwise("GREEN").alias("verdict")))


@register("unit_mixture", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
meta AS (
  SELECT f.i, CAST(substring(b.clip_id, 6) AS BIGINT) AS rid,
         f.sr_hz, f.dur_ms
  FROM full_ f JOIN base b USING (i)),
vals AS (
  SELECT 'dur_d' AS col_name,
         CASE WHEN rid % 5 = 0 THEN dur_ms * 1000 ELSE dur_ms END AS v
  FROM meta WHERE dur_ms IS NOT NULL
  UNION ALL
  SELECT 'sr_hz', sr_hz FROM meta WHERE dur_ms IS NOT NULL),
-- positive integers: floor(log10(v)) == strlen(v) - 1, exactly
hist AS (
  SELECT col_name, length(CAST(v AS VARCHAR)) - 1 AS d, count(*) AS n
  FROM vals GROUP BY 1, 2),
h AS (
  SELECT col_name, d, n,
         n / sum(n) OVER (PARTITION BY col_name) AS share
  FROM hist),
top AS (
  SELECT col_name,
         CAST(min(CASE WHEN rn = 1 THEN d END) AS BIGINT) AS mode_decade,
         round(min(CASE WHEN rn = 1 THEN share END), 6) AS mode_share
  FROM (SELECT *, row_number() OVER (PARTITION BY col_name
                                     ORDER BY share DESC, d ASC) AS rn
        FROM h)
  GROUP BY col_name),
far AS (
  SELECT h.col_name,
         CAST(min(CASE WHEN rn = 1 THEN d END) AS BIGINT) AS far_decade,
         round(min(CASE WHEN rn = 1 THEN share END), 6) AS far_share
  FROM (SELECT h.*, row_number() OVER (PARTITION BY h.col_name
                                       ORDER BY share DESC, d ASC) AS rn
        FROM h JOIN top USING (col_name)
        WHERE abs(h.d - top.mode_decade) >= 3) h
  GROUP BY 1)
SELECT t.col_name, t.mode_decade, t.mode_share,
       f.far_decade, COALESCE(f.far_share, 0.0) AS far_share,
       CASE WHEN COALESCE(f.far_share, 0.0) >= 0.1 THEN 'RED'
            ELSE 'GREEN' END AS verdict
FROM top t LEFT JOIN far f USING (col_name)
""")
def q_unit_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-units detection (operators/profiling.py:unit_mixture_check):
    a numeric column clustering in TWO decades ≥3 apart is one feed
    reporting microseconds where another reports milliseconds — the
    silent unit bug that poisons every aggregate while each row passes
    range checks alone. Planted: clip-id residue %5 multiplies the
    declared duration by 1000 (~13% of mass lands 3 decades above the
    mode → RED), while sr_hz's clean two-adjacent-decade spread stays
    GREEN — the check distinguishes a wide distribution from a bimodal
    one. Decades via an exact pure when-chain Spark-side; the oracle
    exploits that all values are positive integers (decade =
    strlen−1, no float anywhere). ONE stacked map-combinable
    (col, decade) aggregate; modes run on the ≤|cols|×19-row table.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.profiling import unit_mixture_check
    clips = generate_clips(spark, _SNR_N, partitions=8)
    rid = F.expr("CAST(substring(clip_id, 6) AS BIGINT)")
    d = clips.select(
        F.when(F.pmod(rid, 5) == 0, F.col("dur_ms") * 1000)
        .otherwise(F.col("dur_ms")).alias("dur_d"),
        "sr_hz").filter(F.col("dur_d").isNotNull())
    return unit_mixture_check(d, ["dur_d", "sr_hz"])


@register("vocab_growth", oracle="""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
wb AS (
  SELECT least(9, CAST(floor(doc_id * 10.0 / (m + 1)) AS BIGINT)) AS b,
         text
  FROM documents, mx),
docs_per AS (SELECT b, count(*) AS nd FROM wb GROUP BY 1),
first_b AS (
  SELECT term, min(b) AS fb
  FROM (SELECT b, unnest(string_split(text, ' ')) AS term FROM wb)
  GROUP BY term),
new_per AS (SELECT fb AS b, count(*) AS nv FROM first_b GROUP BY 1),
grid AS (
  SELECT d.b, sum(d2.nd) AS n_docs,
         COALESCE((SELECT sum(n2.nv) FROM new_per n2 WHERE n2.b <= d.b), 0)
             AS vocab
  FROM docs_per d JOIN docs_per d2 ON d2.b <= d.b
  GROUP BY d.b),
pts AS (
  SELECT b, CAST(n_docs AS BIGINT) AS n_docs, CAST(vocab AS BIGINT) AS vocab,
         ln(CAST(n_docs AS DOUBLE)) AS x, ln(CAST(vocab AS DOUBLE)) AS y
  FROM grid),
fit AS (
  SELECT round((count(*) * sum(x*y) - sum(x) * sum(y))
               / (count(*) * sum(x*x) - sum(x) * sum(x)), 6) AS beta
  FROM pts)
SELECT p.b AS bucket, p.n_docs, p.vocab, f.beta AS heaps_beta
FROM pts p, fit f
""")
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (operators/text.py:vocab_growth):
    distinct vocabulary V(N) at ten corpus prefixes and the log-log OLS
    slope β of V ≈ K·N^β — natural corpora keep bringing new words
    (β ≈ 0.4–0.7); template spam and synthetic floods saturate (β → 0),
    a corpus-shape signal no per-document quality score sees.
    Distinct-over-prefix WITHOUT rescans: each term contributes its
    FIRST bucket (one vocabulary-sized map-combinable min), cumsums and
    the OLS fit run on ten rows. Exact integer V(N) both engines; β
    from the same ln/sum arithmetic, 6 dp.
    """
    from ...operators.text import vocab_growth
    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth(docs, "doc_id", "text", n_points=10)


@register("seasonal_volume_anomaly", oracle="""
WITH days AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_rows
  FROM events GROUP BY 1),
d AS (SELECT day, n_rows, day % 7 AS dow FROM days),
medc AS (
  SELECT dow, n_rows AS v, count(*) AS c FROM d GROUP BY 1, 2),
med AS (
  SELECT dow, CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                   AS BIGINT) AS med_dow
  FROM (SELECT dow, v, c,
               sum(c) OVER (PARTITION BY dow ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY dow) AS n
        FROM medc)
  GROUP BY dow),
d2 AS (
  SELECT d.day, d.dow, d.n_rows, m.med_dow,
         abs(d.n_rows - m.med_dow) AS dev
  FROM d JOIN med m USING (dow)),
madc AS (SELECT dow, dev AS v, count(*) AS c FROM d2 GROUP BY 1, 2),
mad AS (
  SELECT dow, CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                   AS BIGINT) AS mad_dow
  FROM (SELECT dow, v, c,
               sum(c) OVER (PARTITION BY dow ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY dow) AS n
        FROM madc)
  GROUP BY dow)
SELECT d2.day, d2.dow, CAST(d2.n_rows AS BIGINT) AS n_rows,
       m.med_dow AS med_dow, a.mad_dow AS mad_dow,
       d2.dev > 3 * a.mad_dow AS anomalous
FROM d2 JOIN med m USING (dow) JOIN mad a USING (dow)
""")
def q_seasonal_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted volume anomaly (operators/anomaly.py:
    seasonal_volume_anomaly): each day's event count judged against the
    median of ITS OWN WEEKDAY in robust MAD units — weekly rhythm stops
    masquerading as incidents and a quiet-day outage stops hiding in
    the weekly average (the un-adjusted daily twin is
    partition_anomaly). Entirely integer arithmetic — counts, exact
    k-th-smallest weekday medians/MADs, the |n−med| > 3·MAD flag — so
    the oracle reproduces every row bit-for-bit. One map-combinable day
    count touches the corpus; weekday windows run on the |days|-row
    table, partitioned by weekday, never global.
    """
    from ...operators.anomaly import seasonal_volume_anomaly
    ev = load_table(spark, sf_dir, "events")
    return seasonal_volume_anomaly(ev, "ts", k=3)


@register("transcript_wer", oracle="""
WITH d AS (
  SELECT doc_id, length(string_split(text, ' ')) AS n FROM documents),
m AS (
  SELECT doc_id, n,
         CASE doc_id % 4 WHEN 0 THEN 'clean' WHEN 1 THEN 'sub'
              WHEN 2 THEN 'del' ELSE 'ins' END AS mode,
         CASE WHEN doc_id % 4 = 0 THEN 0
              ELSE least(1 + (doc_id // 4) % 3, greatest(n - 1, 0)) END AS k
  FROM d)
SELECT mode,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CAST(k AS DOUBLE) / n), 6) AS avg_wer,
       CAST(max(k) AS INTEGER) AS max_distance,
       CAST(sum(CASE WHEN mode = 'sub' THEN k ELSE 0 END) AS BIGINT)
           AS total_sub,
       CAST(sum(CASE WHEN mode = 'del' THEN k ELSE 0 END) AS BIGINT)
           AS total_del,
       CAST(sum(CASE WHEN mode = 'ins' THEN k ELSE 0 END) AS BIGINT)
           AS total_ins
FROM m GROUP BY mode
""")
def q_transcript_wer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level WER with sub/del/ins decomposition
    (operators/alignment.py:word_edit_stats) — the graded form of the
    brief's transcript-EQUALITY invariant (repo:BASELINE.json
    input_hint), splitting the reference's single decode-failure into
    the YELLOW re-punctuation band vs the RED rewrite band, the same
    ladder result.go:4-18 drafts for row decoding.

    Planted-edit proof: each document becomes a hypothesis by
    doc_id%4 — clean copy / k word substitutions at distinct positions
    with OUT-OF-VOCAB sentinels / k trailing-word deletions / k
    sentinel appends (k = 1 + (doc_id div 4)%3). Each sentinel must be
    created by one edit op and never matches, so the TRUE word-level
    Levenshtein distance is provably exactly k and the minimal script
    is pure sub / del / ins respectively — the oracle pins distance,
    WER = k/n, and the full op decomposition in closed form without
    running any DP, while the Spark side measures them with the real
    O(n*m) Arrow DP kernel + backtrace. A hash match proves the kernel
    exact on ~375 planted alignments.

    Scale shape: hypothesis construction is pure Column surgery
    (split/transform/slice, codegen); the DP stage is map-only
    mapInArrow with bounded per-row cost; the rollup is 4 groups of
    map-combinable sums.
    """
    from ...operators.alignment import plant_word_edits, word_edit_stats
    # single-file fixture scans serialize the DP kernel onto one task;
    # round-robin split first (outputs are counts + 6dp-rounded means,
    # partitioning-independent at that precision)
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    # planted-edit surgery (k clamped to n-1 for foreign short-doc
    # fixtures — pinned in tests/test_alignment.py)
    hyp = plant_word_edits(docs)
    stats = word_edit_stats(hyp, "text", "hyp", passthrough=["mode"])
    return stats.groupBy("mode").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # try_divide: a 0-word ref (n_ref=0) yields null WER instead of
        # an ANSI divide-by-zero error under the driver session
        F.round(F.avg(F.try_divide(F.col("distance"), F.col("n_ref"))), 6)
        .alias("avg_wer"),
        F.max("distance").alias("max_distance"),
        F.sum("n_sub").cast("long").alias("total_sub"),
        F.sum("n_del").cast("long").alias("total_del"),
        F.sum("n_ins").cast("long").alias("total_ins"))


@register("audio_spectral_flatness", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec, count(*) AS n_clips,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT)
         AS n_noise_like,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT)
         AS n_tonal
FROM full_ GROUP BY codec
""")
def q_audio_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectrum-SHAPE invariant over decoded PCM
    (operators/multimodal.py:spectral_flatness): Wiener entropy
    (geometric/arithmetic mean of the rFFT power spectrum) is near 0
    for the generator's 3-tone contract and near the white-noise 0.56
    for the planted uniform-noise corruption — exhaustive clean max
    0.016 vs corrupt min 0.095 over 4000 rendered rows, so the 0.04
    log-midpoint line splits with a 6x gap.
    Complements audio_rms_check (loudness band): flatness catches
    an equal-POWER corruption that leaves RMS inside the clean band.
    The oracle predicts the exact per-codec counts on both sides from
    row-id arithmetic (corrupt <=> i%997=996, codec via the CRC-32 SQL
    fold) without decoding a byte.

    Scale shape: map-only Arrow FFT over the source partitioning;
    payload bytes never shuffle; the rollup is a per-codec
    map-combinable sum.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import spectral_flatness
    clips = generate_clips(spark, _SNR_N, partitions=8)
    f = spectral_flatness(clips)
    return f.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum((F.col("flatness") > 0.04).cast("long")).alias("n_noise_like"),
        F.sum((F.col("flatness") <= 0.04).cast("long")).alias("n_tonal"))


@register("text_script_mix", oracle="""
WITH t AS (
  SELECT lang,
         CASE WHEN doc_id % 5 = 4
              THEN translate(text, 'aeopcyx', 'аеорсух')
              ELSE text END AS text
  FROM documents),
f AS (
  SELECT lang,
         length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g'))
             AS cyr,
         len(list_filter(string_split(text, ' '),
             w -> regexp_matches(w, '[Ѐ-ӿ]')
                  AND regexp_matches(w, '[A-Za-z]'))) AS mixed,
         CASE WHEN length(text) > 0
              THEN (length(text)
                    - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')))
                   * 1.0 / length(text)
              ELSE 0.0 END AS share
  FROM t)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN mixed > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS spoofed_docs,
       CAST(sum(mixed) AS BIGINT) AS mixed_tokens,
       CAST(sum(cyr) AS BIGINT) AS cyr_chars,
       round(max(share), 6) AS max_cyr_share
FROM f GROUP BY lang
""")
def q_text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-script / homoglyph spoof detection
    (operators/text_filters.py:script_mix_report): a token like
    "hеllo" with a Cyrillic е renders identically to "hello" but
    hashes, tokenizes and dedups differently — SEO spam and canary
    text carrying confusables silently fragment the vocabulary and
    defeat exact dedup, so a corpus QA pass must count them. Flags
    tokens mixing Latin + Cyrillic codepoints and profiles the
    Cyrillic share per document, rolled up per language.

    Both engines plant the SAME corruption (every 5th doc gets 7
    Latin->Cyrillic homoglyph substitutions via translate()), then
    each measures with its own regex machinery — Java regex vs RE2,
    length-difference counting vs list_filter — so the match checks
    the full detection path, not the planting arithmetic.

    Scale shape: map-only Column regex arithmetic (no explode, no
    Python), then a |langs|-row map-combinable aggregate.
    """
    from ...operators.text_filters import (
        CONFUSABLE_CYRILLIC,
        CONFUSABLE_LATIN,
        script_mix_report,
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    spoofed = docs.select(
        "lang",
        F.when(F.pmod("doc_id", F.lit(5)) == 4,
               F.translate("text", CONFUSABLE_LATIN, CONFUSABLE_CYRILLIC))
        .otherwise(F.col("text")).alias("text"))
    return script_mix_report(spoofed, "text", ["lang"])


@register("embedding_label_coherence", oracle="""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
u AS (
  SELECT vec_id, label,
         unnest(embedding) AS val,
         unnest(range(1, len(embedding) + 1)) AS pos
  FROM e),
cent AS (
  SELECT label AS clabel, pos, avg(CAST(val AS DOUBLE)) AS cval
  FROM u GROUP BY 1, 2),
cnorm AS (SELECT clabel, sqrt(sum(cval * cval)) AS cn FROM cent GROUP BY 1),
vnorm AS (
  SELECT vec_id, sqrt(sum(CAST(val AS DOUBLE) * CAST(val AS DOUBLE)))
             AS vn
  FROM u GROUP BY 1),
dots AS (
  SELECT u.vec_id, u.label, c.clabel,
         sum(CAST(u.val AS DOUBLE) * c.cval) AS dot
  FROM u JOIN cent c ON c.pos = u.pos
  GROUP BY 1, 2, 3),
sims AS (
  SELECT d.vec_id, d.label, d.clabel, d.dot / (v.vn * n.cn) AS cos
  FROM dots d JOIN vnorm v USING (vec_id) JOIN cnorm n USING (clabel)),
best AS (
  SELECT vec_id, label, max_by(clabel, cos) AS best_label
  FROM sims GROUP BY 1, 2),
own AS (SELECT vec_id, label, cos AS own_cos FROM sims
        WHERE clabel = label)
SELECT CAST(o.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN b.best_label = o.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top1_own,
       round(avg(own_cos), 6) AS avg_own_cos,
       round(min(own_cos), 6) AS min_own_cos
FROM own o JOIN best b USING (vec_id) GROUP BY 1
""")
def q_embedding_label_coherence(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Labeled-embedding coherence
    (operators/embedding_qa.py:label_coherence): per label, the own-
    centroid cosine distribution plus top-1 own-label accuracy over all
    centroids — the kNN sanity check that catches a label column joined
    against the wrong embedding batch (coherence collapses to chance)
    before any model trains. Top-1 counts are deterministic because the
    measured best-vs-second margin (≥ 2.8e-5 on the driver tables)
    dwarfs cross-engine summation-order noise (~1e-15); continuous
    outputs rounded to 6 dp.

    The oracle is a full independent reimplementation: DuckDB zipped
    parallel unnests + relational per-(vector, centroid) dot products
    vs Spark's broadcast-centroid higher-order-function folds — no
    shared code path, a genuinely two-implementation check of the whole
    centroid/cosine/argmax pipeline.

    Scale shape: one posexplode partial+final agg (exchange ≤ dim rows
    per label per task), centroids collapse to one broadcast row, every
    per-vector argmax is a map-only array fold, |labels|-key rollup.
    """
    from ...operators.embedding_qa import label_coherence
    emb = load_table(spark, sf_dir, "embeddings")
    return label_coherence(emb, "label", "embedding")


@register("text_unicode_norm", oracle="""
WITH t AS (
  SELECT lang,
         CASE WHEN doc_id % 7 = 3
              THEN replace(text, 'e', 'e' || chr(769))
              ELSE text END AS text
  FROM documents),
f AS (SELECT lang, length(text) - length(nfc_normalize(text)) AS shrink
      FROM t)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN shrink > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_denorm_docs,
       CAST(sum(shrink) AS BIGINT) AS chars_shrunk,
       CAST(max(shrink) AS INTEGER) AS max_doc_shrink
FROM f GROUP BY lang
""")
def q_text_unicode_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization-form divergence
    (operators/unicode_norm.py:nfc_divergence): composed "é" and
    decomposed "e"+U+0301 render identically but hash, tokenize and
    dedup differently — the byte-level sibling of the homoglyph
    problem (text_script_mix). Every 7th document is re-written with
    decomposed accents (e -> e + combining acute) by BOTH engines via
    the same replace(); then Spark detects with CPython's
    unicodedata.normalize while the oracle detects with DuckDB's
    native utf8proc nfc_normalize — two independent implementations
    of Unicode canonical composition checking each other.

    Scale shape: map-only Arrow kernel (two ints per row), |langs|-key
    map-combinable rollup.
    """
    from ...operators.unicode_norm import nfc_divergence
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    planted = docs.select(
        "lang",
        F.when(F.pmod("doc_id", F.lit(7)) == 3,
               # decomposed: 'e' + U+0301 COMBINING ACUTE (not the
               # precomposed U+00E9) — matches the oracle's chr(769)
               F.regexp_replace("text", "e", "e\u0301"))
        .otherwise(F.col("text")).alias("text"))
    return nfc_divergence(planted, "text", ["lang"])


@register("transcript_wer_manifest", oracle=f"""
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
       CAST(count(*) FILTER (WHERE NOT is_orphan) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE NOT is_orphan AND NOT is_mismatch)
            AS BIGINT) AS n_exact,
       CAST(count(*) FILTER (WHERE is_mismatch) AS BIGINT)
           AS total_word_edits,
       CAST(CASE WHEN count(*) FILTER (WHERE is_mismatch) > 0
                 THEN 1 ELSE 0 END AS INTEGER) AS max_distance
FROM marked GROUP BY codec
""")
def q_transcript_wer_manifest(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """WER graded against the manifest — the audio-domain form of the
    brief's transcript-equality invariant: clips broadcast-join their
    manifest transcripts and the word-level DP kernel
    (operators/alignment.py) measures HOW FAR each pair diverges, per
    codec. The planted mismatch appends exactly one out-of-vocab token
    (" MISMATCH", fixtures/gen.py:142), so the true word distance of
    every mismatched pair is provably exactly 1 and the oracle pins
    pair counts, exact matches, total word edits and the max distance
    in closed form from row-id arithmetic (orphans excluded by the
    same 991-contract as transcript_integrity; duplicate rows inherit
    their base row's flags). A match proves join + kernel + contract
    end-to-end on the clip table, not just on documents.

    Scale shape: broadcast manifest join, map-only Arrow DP over the
    joined pairs, |codec|-key map-combinable rollup.
    """
    from ...fixtures.gen import generate_clips, generate_manifest
    from ...operators.alignment import word_edit_stats
    clips = generate_clips(spark, _SNR_N, partitions=8)
    manifest = generate_manifest(spark, _SNR_N, partitions=4).select(
        "clip_id", F.col("transcript").alias("m_transcript"))
    joined = (clips.select("clip_id", "codec", "transcript")
              .join(F.broadcast(manifest), "clip_id", "left")
              .where(F.col("m_transcript").isNotNull()))
    stats = word_edit_stats(joined, "transcript", "m_transcript",
                            passthrough=["codec"])
    return stats.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("distance") == 0).cast("long")).alias("n_exact"),
        F.sum("distance").cast("long").alias("total_word_edits"),
        F.max("distance").alias("max_distance"))


@register("kmv_set_overlap", oracle="""
WITH ha AS (
  SELECT DISTINCT (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                                   1, 12))::BIGINT) AS h
  FROM lineitem),
hb AS (
  SELECT DISTINCT (('0x' || substr(md5(CAST(p_partkey AS VARCHAR)),
                                   1, 12))::BIGINT) AS h
  FROM part),
ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
un AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
       ORDER BY h LIMIT 256),
inter AS (SELECT count(*) AS n_common FROM un
          WHERE h IN (SELECT h FROM ska)
            AND h IN (SELECT h FROM skb)),
unn AS (SELECT count(*) AS n_un FROM un),
ea AS (SELECT count(*) AS exact_a FROM ha),
eb AS (SELECT count(*) AS exact_b FROM hb),
ec AS (SELECT count(*) AS exact_common FROM ha
       WHERE h IN (SELECT h FROM hb)),
sa AS (SELECT count(*) AS n_ha, max(h) AS kth_a FROM ska),
sb AS (SELECT count(*) AS n_hb, max(h) AS kth_b FROM skb)
SELECT 256 AS k,
       CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       round(CASE WHEN n_ha < 256 THEN n_ha
                  ELSE 255 * 281474976710656.0 / kth_a END, 4) AS kmv_a,
       round(CASE WHEN n_hb < 256 THEN n_hb
                  ELSE 255 * 281474976710656.0 / kth_b END, 4) AS kmv_b,
       round(exact_common * 1.0
             / (exact_a + exact_b - exact_common), 6) AS exact_jaccard,
       round(n_common * 1.0 / n_un, 6) AS kmv_jaccard
FROM ea, eb, ec, sa, sb, inter, unn
""")
def q_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-overlap sketch (operators/uniqueness.py:kmv_overlap) —
    the fourth pinned sketch and the only one estimating
    INTERSECTIONS: Jaccard of the lineitem part-key set vs the part
    catalog from two 256-row sketches instead of a 10^12-key distinct
    join. The sketch is the k smallest distinct 48-bit md5 hashes —
    exact integer order statistics, so both engines build the
    IDENTICAL k-sets and the oracle pins sketch and estimates alike
    (an approximate algorithm under an exact cross-check, same stance
    as distinct_hll_explicit). Exact sides are carried for the
    report's error columns.

    Scale shape: per side one distinct agg then a global top-k
    (TakeOrderedAndProject, no full sort); all set arithmetic runs on
    ≤ 3k rows; estimates are 1-row broadcasts.
    """
    from ...operators.uniqueness import kmv_overlap
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey")
    return kmv_overlap(li, "l_partkey", pt, "p_partkey", k=256)


@register("zorder_layout", oracle="""
WITH mm AS (
  SELECT min(l_partkey) AS mna, max(l_partkey) AS mxa,
         min(l_suppkey) AS mnb, max(l_suppkey) AS mxb
  FROM lineitem),
b AS (
  SELECT least(255, CAST(floor((l_partkey - mna) * 256.0
                               / (mxa - mna + 1)) AS BIGINT)) AS ba,
         least(255, CAST(floor((l_suppkey - mnb) * 256.0
                               / (mxb - mnb + 1)) AS BIGINT)) AS bb
  FROM lineitem, mm),
keyed AS (
  SELECT ba, bb, ba * 256 + bb AS lin_key,
         ((ba // 1) % 2) * 2
         + ((bb // 1) % 2) * 1
         + ((ba // 2) % 2) * 8
         + ((bb // 2) % 2) * 4
         + ((ba // 4) % 2) * 32
         + ((bb // 4) % 2) * 16
         + ((ba // 8) % 2) * 128
         + ((bb // 8) % 2) * 64
         + ((ba // 16) % 2) * 512
         + ((bb // 16) % 2) * 256
         + ((ba // 32) % 2) * 2048
         + ((bb // 32) % 2) * 1024
         + ((ba // 64) % 2) * 8192
         + ((bb // 64) % 2) * 4096
         + ((ba // 128) % 2) * 32768
         + ((bb // 128) % 2) * 16384 AS z_key
  FROM b),
stacked AS (
  SELECT 'linear' AS layout, ba, bb,
         CAST(lin_key * 16 // 65536 AS BIGINT) AS file FROM keyed
  UNION ALL
  SELECT 'zorder', ba, bb,
         CAST(z_key * 16 // 65536 AS BIGINT) FROM keyed),
files AS (
  SELECT layout, file, min(ba) AS mina, max(ba) AS maxa,
         min(bb) AS minb, max(bb) AS maxb
  FROM stacked GROUP BY 1, 2),
hits AS (
  SELECT f.layout,
         CASE WHEN f.mina <= p.probe AND p.probe <= f.maxa
              THEN 1 ELSE 0 END AS hit_a,
         CASE WHEN f.minb <= p.probe AND p.probe <= f.maxb
              THEN 1 ELSE 0 END AS hit_b
  FROM files f, (SELECT unnest(range(0, 256)) AS probe) p),
hit_agg AS (
  SELECT layout, sum(hit_a) / 256.0 AS ha, sum(hit_b) / 256.0 AS hb
  FROM hits GROUP BY 1),
area AS (
  SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum((maxa - mina + 1) * (maxb - minb + 1)) AS BIGINT)
             AS sum_bbox_area
  FROM files GROUP BY 1)
SELECT a.layout, a.n_files, a.sum_bbox_area,
       round(h.ha, 6) AS avg_files_hit_a,
       round(h.hb, 6) AS avg_files_hit_b
FROM area a JOIN hit_agg h USING (layout)
""")
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear clustering planner
    (operators/layout.py:layout_compare): the metadata-only
    quantification of the ``OPTIMIZE ZORDER BY`` decision — a linear
    sort on (partkey, suppkey) prunes partkey point-lookups perfectly
    and suppkey ones barely; Morton bit-interleaving shrinks every
    file's 2-D bounding box so BOTH dimensions prune. Emitted per
    layout: file count, total bounding-box area, and the mean number
    of files a point-lookup on each dimension must read (256 probes
    per dimension). Everything is exact integer arithmetic (the
    interleave is 16 div/mod terms, portable to SQL), so the oracle
    replays the full comparison bit-for-bit.

    Scale shape: one 1-row min/max broadcast, two map-only key
    projections, a (layout, file)-keyed partial+final agg (≤ 2N
    groups), and a probes×files broadcast join bounded by N files —
    the corpus never sorts and never shuffles by key (real layout jobs
    pay the range-partition write; this PLANNER costs one scan).
    """
    from ...operators.layout import layout_compare
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    return layout_compare(li, "l_partkey", "l_suppkey")


@register("distinct_hll_explicit", oracle="""
WITH h AS (
  SELECT (('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12))
          ::BIGINT) AS hv
  FROM lineitem),
b AS (SELECT hv % 256 AS bucket, hv // 256 AS rest FROM h),
r AS (SELECT bucket,
             CASE WHEN rest = 0 THEN 41
                  ELSE 41 - length(bin(rest)) END AS rho
      FROM b),
regs AS (SELECT bucket, max(rho) AS mx FROM r GROUP BY 1),
agg AS (SELECT count(*) AS used, sum(pow(2.0, -mx)) AS z_present
        FROM regs),
calc AS (
  SELECT used,
         (0.7213 / (1 + 1.079 / 256)) * 256 * 256
             / (z_present + (256 - used)) AS e_raw,
         256 - used AS v
  FROM agg),
fin AS (
  SELECT used,
         CASE WHEN e_raw <= 2.5 * 256 AND v > 0
              THEN 256 * ln(256.0 / v) ELSE e_raw END AS e
  FROM calc),
ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
       FROM lineitem)
SELECT ex.n_exact, CAST(f.used AS BIGINT) AS registers_used,
       round(f.e, 4) AS hll_estimate,
       round(abs(f.e - ex.n_exact) / ex.n_exact, 6) AS rel_error
FROM fin f, ex
""")
def q_distinct_hll_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross-engine HyperLogLog
    (operators/uniqueness.py:hll_explicit): the white-box twin of the
    built-in HLL++ (`uniqueness_approx`, rows-only because Spark's
    register layout is private). Every step is engine-portable exact
    integer arithmetic — 48-bit md5 hash, mod-2^p bucketing, leading-
    zero rank via the binary-string length (``bin`` prints no leading
    zeros in BOTH engines, verified), max-per-bucket registers, the
    Flajolet harmonic estimator with the linear-counting small-range
    branch — so the DuckDB oracle pins the registers AND the estimate
    of an *approximate* algorithm exactly. Completes the pinned sketch
    trio: KLL (quantiles), CMS (frequencies), HLL (distincts).

    Scale shape: one map-combinable max-per-bucket agg (exchange ≤ 2^p
    rows per task), arithmetic on ≤ 2^p rows; the exact distinct
    (carried for the report's rel_error) is the usual distinct agg.
    """
    from ...operators.uniqueness import hll_explicit
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return hll_explicit(li, "l_orderkey", p=8)


@register("token_heavy_hitters_cms", oracle="""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
exact AS (SELECT t, CAST(count(*) AS BIGINT) AS exact_n
          FROM toks GROUP BY t),
top AS (SELECT * FROM exact ORDER BY exact_n DESC, t LIMIT 15),
hashes AS (
  SELECT t, s,
         (('0x' || substr(md5(CAST(s AS VARCHAR) || t), 1, 8))::BIGINT)
             % 64 AS slot
  FROM toks, (SELECT unnest([0, 1, 2]) AS s)),
grid AS (SELECT s, slot, count(*) AS n FROM hashes GROUP BY 1, 2),
est AS (
  SELECT tp.t, tp.exact_n, min(g.n) AS cms_n
  FROM top tp
  JOIN (SELECT tp2.t, s2.s,
               (('0x' || substr(md5(CAST(s2.s AS VARCHAR) || tp2.t),
                               1, 8))::BIGINT) % 64 AS slot
        FROM top tp2, (SELECT unnest([0, 1, 2]) AS s) s2(s)) th
    ON th.t = tp.t
  JOIN grid g ON g.s = th.s AND g.slot = th.slot
  GROUP BY 1, 2)
SELECT t AS token, exact_n, CAST(cms_n AS BIGINT) AS cms_n FROM est
""")
def q_token_heavy_hitters_cms(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimates vs exact counts
    (operators/cms.py): the third mergeable sketch beside HLL
    (distinct) and KLL (quantiles) — a FIXED d×w counter grid whose
    state never grows with the vocabulary, the shape that survives a
    10^12-token corpus where the exact top-k's vocabulary-sized
    aggregate cannot be assumed cheap. Estimates are min-of-d-counters:
    provably ≥ exact, within εN w.h.p.; the deliberately narrow w=64
    grid forces visible collisions so the overestimates themselves are
    part of the pinned output. The seeded md5-lower-32 slot hash is
    computed identically by both engines, so the oracle pins grid AND
    estimates bit-for-bit; the ε-bound and merge law live in pytest.

    Scale shape: explode → (seed, slot) partial+final count, exchange
    ≤ d×w rows per task; top-k runs on the token-count table; the d×w
    grid broadcasts to the 15 candidates. No Python.
    """
    from ...operators.cms import cms_build, cms_estimate
    from ...operators.text import tokens as _toks
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_toks(F.col("text"))).alias("t"))
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("t")).limit(15)
    grid = cms_build(docs, "text")
    est = cms_estimate(grid, top, "t")
    return est.select(F.col("t").alias("token"), "exact_n", "cms_n")


@register("embedding_spectrum", oracle="""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
u AS (SELECT vec_id, unnest(embedding) AS val,
             unnest(range(0, len(embedding))) AS pos FROM e),
nn AS (SELECT count(*) AS n, max(len(embedding)) AS dim FROM e),
mu AS (SELECT pos, avg(CAST(val AS DOUBLE)) AS m FROM u GROUP BY 1),
sxy AS (
  SELECT a.pos AS i, b.pos AS j,
         sum(CAST(a.val AS DOUBLE) * CAST(b.val AS DOUBLE)) AS s
  FROM u a JOIN u b USING (vec_id)
  GROUP BY 1, 2),
cov AS (
  SELECT s.i, s.j, s.s / (SELECT n FROM nn) - ma.m * mb.m AS v
  FROM sxy s JOIN mu ma ON ma.pos = s.i JOIN mu mb ON mb.pos = s.j),
c2 AS (
  SELECT a.i, b.j, sum(a.v * b.v) AS v
  FROM cov a JOIN cov b ON a.j = b.i GROUP BY 1, 2)
SELECT (SELECT CAST(dim AS INTEGER) FROM nn) AS dim,
       (SELECT CAST(n AS BIGINT) FROM nn) AS n_vectors,
       round((SELECT sum(v) FROM cov WHERE i = j), 9) AS m1,
       round((SELECT sum(v * v) FROM cov), 9) AS m2,
       round((SELECT sum(c2.v * c.v) FROM c2
              JOIN cov c ON c.i = c2.j AND c.j = c2.i), 9) AS m3
""")
def q_embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance-spectrum health
    (operators/embedding_qa.py:spectrum_moments): the power sums
    m_k = Σ λ^k of the population-covariance eigenvalues — the
    anisotropy profile that catches a near-rank-1 embedding collapse
    (every cosine dominated by one direction) while per-dim variances
    still look healthy. The cross-engine trick: Spark computes the
    moments THROUGH an eigensolver (distributed Arrow X^T X partials →
    dim×dim eigh), while the oracle computes the SAME numbers as
    traces of relational matrix powers — trace(C), trace(C²)=ΣC_ij²,
    trace(C³) via a join-aggregate matrix multiply — with no
    eigendecomposition at all. A hash match pins the entire pipeline
    (partial merge, covariance formula, eigh) against an independent
    algorithm; the eigensolver-only outputs (top_share, eff_rank) are
    pytest-pinned to a numpy twin.

    Scale shape: one map-only Arrow stage emits per-batch (count, Σx,
    X^T X) — a BLAS matmul per batch, one flattened row out; the merge
    is a posexplode partial+final sum whose exchange is bounded by
    tasks × dim² scalars; eigh runs once on a 1-row frame. Nothing
    corpus-sized shuffles or reaches the driver.
    """
    from ...operators.embedding_qa import spectrum_moments
    emb = load_table(spark, sf_dir, "embeddings")
    out = spectrum_moments(emb, "embedding")
    return out.select(
        "dim", "n_vectors",
        F.round("m1", 9).alias("m1"),
        F.round("m2", 9).alias("m2"),
        F.round("m3", 9).alias("m3"))


@register("aiff_header_integrity", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
g AS (
  SELECT codec,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n
  FROM full_)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(count(*) AS BIGINT) AS n_aiff_ok,
       CAST(count(*) AS BIGINT) AS n_sr_match,
       CAST(count(*) AS BIGINT) AS n_len_match,
       CAST(sum(2 * n) AS BIGINT) AS sum_payload_bytes
FROM g GROUP BY codec
""")
def q_aiff_header_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-Python header integrity over the FOURTH container, IFF-chunked
    AIFF: clips transcode in one Arrow stage (multimodal.py:
    transcode_aiff; functions/aiff.py is the codec), then every header
    field — FORM/AIFF/COMM/SSND magics and sizes, PCM16-mono shape, and
    the 80-bit IEEE-754 EXTENDED-FLOAT sample rate — is read by pure
    Column byte surgery (multimodal.py:aiff_header_columns). The f80
    rate decode is the novel bit: exponent word + top-32 mantissa bits
    via be_uint, then an exact power-of-two division — no float parse,
    no Python. The oracle re-derives expected fields per codec from the
    generator contract: the canonical layout is deterministic (54-byte
    header + 2 bytes/sample), so sum_payload_bytes pins the encoder's
    framing exactly, and sr_match proves the f80 encode/Column-decode
    pair is the identity on every real sample rate.

    Scale shape: two Python stages (fixture render + transcode) feeding
    whole-stage-codegen header checks, then one map-combined aggregate
    whose key cardinality is |codec| — the payload never shuffles.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import aiff_header_columns, transcode_aiff
    clips = generate_clips(spark, _SNR_N, partitions=8)
    aiff = transcode_aiff(clips)
    hdr = aiff_header_columns(F.col("bytes"))
    parsed = aiff.select(
        "codec",
        hdr["aiff_ok"].alias("aiff_ok"),
        (hdr["hdr_sr_hz"] == F.col("sr_hz").cast("long")).alias("sr_match"),
        ((F.length("bytes") == hdr["form_bytes"])
         & (hdr["ssnd_bytes"] == 2 * hdr["n_frames"])
         & (F.length("bytes") == F.lit(54) + hdr["ssnd_bytes"]))
        .alias("len_match"),
        hdr["ssnd_bytes"].alias("data_bytes"))
    return parsed.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("aiff_ok").cast("long")).alias("n_aiff_ok"),
        F.sum(F.col("sr_match").cast("long")).alias("n_sr_match"),
        F.sum(F.col("len_match").cast("long")).alias("n_len_match"),
        F.sum("data_bytes").alias("sum_payload_bytes"))


@register("audio_aiff_snr", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict
FROM full_ GROUP BY codec
""")
def q_audio_aiff_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNR>=30dB invariant end-to-end over AIFF containers: clips
    transcode WAV→AIFF (multimodal.py:transcode_aiff), then the SAME
    fused PCM kernel (operators/snr.py:pcm_scan — AIFF is the fourth
    magic-gated fall-through after WAV, FLAC and AU) walks the IFF
    chunk list, decodes the 80-bit-float rate and big-endian frames,
    regenerates the reference signal, and rolls per-codec verdicts.
    The oracle is the identical closed form as `snr_partition_verdicts`
    over WAV: a match proves the transcode preserved every sample and
    the chunk walk + f80 decode are lossless through the fourth
    container.

    Scale shape: two map-only Arrow stages (render + transcode) fused
    in one task pipeline, then the map-combined |codec|-key rollup; the
    AIFF payload never shuffles and never reaches the driver.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import transcode_aiff
    from ...operators.snr import snr_check, snr_partition_rollup
    clips = generate_clips(spark, _SNR_N, partitions=8)
    aiff = transcode_aiff(clips)
    roll = snr_partition_rollup(snr_check(aiff, extra_cols=["codec"]),
                                ["codec"])
    return roll.select("codec", "n_rows", "n_green", "n_red", "verdict")


@register("audio_ulaw_snr", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict
FROM full_ GROUP BY codec
""")
def q_audio_ulaw_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNR>=30dB invariant through the engine's first LOSSY codec:
    clips re-encode as 8-bit G.711 µ-law inside the Sun AU container
    (functions/au.py:ulaw_compress/expand, Sun encoding tag 1 — the
    format's original payload), then the fused PCM kernel decodes via
    the compander inverse and rolls per-codec verdicts. Unlike the
    PCM16/FLAC/AU/AIFF paths (bit-exact, ~96 dB), µ-law genuinely
    loses information — measured worst-case 36.0 dB on clean fixture
    clips — so this query pins the TOLERANCE semantics of the verdict
    gate itself: a codec that degrades but stays above threshold keeps
    GREEN (the d3rty YELLOW-recovery stance applied to audio), while
    the planted corruption (best case 7.0 dB) stays RED. The oracle is
    the same closed form as the lossless containers; a match proves the
    compander round-trip never drags a clean clip below the gate and
    never lifts a corrupted one above it.

    Scale shape: two map-only Arrow stages (render + µ-law transcode,
    payload HALVED in flight) + the map-combined |codec|-key rollup.
    """
    from ...fixtures.gen import generate_clips
    from ...functions.au import AU_ENCODING_ULAW
    from ...operators.multimodal import transcode_au
    from ...operators.snr import snr_check, snr_partition_rollup
    clips = generate_clips(spark, _SNR_N, partitions=8)
    ulaw = transcode_au(clips, encoding=AU_ENCODING_ULAW)
    roll = snr_partition_rollup(snr_check(ulaw, extra_cols=["codec"]),
                                ["codec"])
    return roll.select("codec", "n_rows", "n_green", "n_red", "verdict")


@register("audio_alaw_snr", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict
FROM full_ GROUP BY codec
""")
def q_audio_alaw_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNR>=30dB invariant through G.711 A-LAW — µ-law's companding
    sibling (functions/alaw.py, WAV fmt tag 6; exact 256-code
    involution pinned in pytest) and the engine's sixth container
    format. A-law's curve differs from µ-law's (linear first segment vs
    biased log), so clearing the gate through BOTH curves pins the
    verdict's tolerance semantics against two independent standard
    quantization shapes: measured worst-case 36.5 dB clean (vs µ-law's
    36.0) across every fixture sample rate, planted corruption ~7 dB.
    Same closed-form oracle as the other containers — a match proves
    the compander round-trip never drags a clean clip below the gate
    nor lifts a corrupted one above it, at every codec partition.

    Scale shape: two map-only Arrow stages (render + A-law transcode,
    payload HALVED in flight) + the map-combined |codec|-key rollup.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import transcode_alaw
    from ...operators.snr import snr_check, snr_partition_rollup
    clips = generate_clips(spark, _SNR_N, partitions=8)
    alaw = transcode_alaw(clips)
    roll = snr_partition_rollup(snr_check(alaw, extra_cols=["codec"]),
                                ["codec"])
    return roll.select("codec", "n_rows", "n_green", "n_red", "verdict")


@register("audio_adpcm_snr", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
sized AS (
  SELECT i, codec,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n_samples
  FROM full_ WHERE codec = 'opus')
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict,
       CAST(sum(60 + 256 * ((n_samples + 504) // 505)) AS BIGINT)
         AS sum_adpcm_bytes
FROM sized GROUP BY codec
""")
def q_audio_adpcm_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNR>=30dB invariant through the engine's first COMPRESSED
    lossy codec: IMA ADPCM in the WAV container at 4.1:1
    (functions/adpcm.py — from-scratch block codec, lockstep-vectorized
    so the per-sample recurrence costs one 504-step numpy loop per
    Arrow BATCH, not per clip; r3 verdict directive 4). The transcode
    targets the drifted high-rate partition (codec 'opus', sr 44.1/48
    kHz) where 4-bit adaptive quantization of the band-limited fixture
    tones measures a worst-case 32.6 dB clean — above the gate — while
    the planted ±0.3-noise corruption stays ~7 dB: the closed-form
    plant arithmetic (i %% 997) classifies through a codec that keeps
    only a quarter of the bits. ``sum_adpcm_bytes`` additionally pins
    the container layout byte-for-byte: 60 header bytes + 256 per
    505-sample block, re-derived by the oracle from the generator
    contract without reading a payload.

    Scale shape: two map-only Arrow stages (render + one lockstep batch
    encode, payload QUARTERED in flight) + a one-key rollup.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import transcode_adpcm
    from ...operators.snr import pcm_scan
    clips = generate_clips(spark, _SNR_N, partitions=8) \
        .filter(F.col("codec") == "opus")
    adpcm = transcode_adpcm(clips)
    scan = pcm_scan(adpcm, extra_cols=["codec"], emit_header=True)
    return (scan.groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((F.col("verdict") == "GREEN").cast("long"))
                 .alias("n_green"),
                 F.sum((F.col("verdict") != "GREEN").cast("long"))
                 .alias("n_red"),
                 F.when(F.sum((F.col("verdict") != "GREEN").cast("long"))
                        > 0, "RED").otherwise("GREEN").alias("verdict"),
                 F.sum("payload_len").alias("sum_adpcm_bytes")))

@register("audio_msadpcm_snr", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
sized AS (
  SELECT i, codec,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n_samples
  FROM full_ WHERE codec = 'opus')
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE i % 997 <> 996) AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE i % 997 = 996) AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE i % 997 = 996) > 0
            THEN 'RED' ELSE 'GREEN' END AS verdict,
       CAST(sum(90 + 256 * ((n_samples + 499) // 500)) AS BIGINT)
         AS sum_msadpcm_bytes
FROM sized GROUP BY codec
""")
def q_audio_msadpcm_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNR>=30dB invariant through the engine's SECOND compressed
    lossy codec: Microsoft ADPCM in the WAV container (fmt tag 0x02;
    functions/msadpcm.py — from-scratch lockstep block codec using the
    published 7-pair predictor + adaptation tables). vs IMA ADPCM the
    quantization shape is genuinely different (2-tap linear prediction
    with per-block predictor selection + multiplicative delta
    adaptation vs a step-table staircase), so clearing the gate through
    BOTH ADPCM families pins the verdict's tolerance semantics against
    two independent compressed codecs — the same two-curve argument
    the µ-law/A-law pair makes for companders. The transcode targets
    the 44.1/48 kHz 'opus' partition (sample-rate floor documented in
    functions/msadpcm.py): worst-case 42.3 dB clean — ~10 dB of margin,
    vs IMA's 32.6 — while planted ±0.3-noise corruption stays ~7 dB.
    ``sum_msadpcm_bytes`` pins the container layout byte-for-byte:
    90 header bytes + 256 per 500-sample block, re-derived by the
    oracle from the generator contract without reading a payload.

    Scale shape: two map-only Arrow stages (render + ONE lockstep batch
    encode — every block of every clip in a single (B, 500) matrix,
    one 498-step vector loop per Arrow batch) + a one-key rollup; the
    payload never shuffles.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import transcode_msadpcm
    from ...operators.snr import pcm_scan
    clips = generate_clips(spark, _SNR_N, partitions=8) \
        .filter(F.col("codec") == "opus")
    ms = transcode_msadpcm(clips)
    scan = pcm_scan(ms, extra_cols=["codec"], emit_header=True)
    return (scan.groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((F.col("verdict") == "GREEN").cast("long"))
                 .alias("n_green"),
                 F.sum((F.col("verdict") != "GREEN").cast("long"))
                 .alias("n_red"),
                 F.when(F.sum((F.col("verdict") != "GREEN").cast("long"))
                        > 0, "RED").otherwise("GREEN").alias("verdict"),
                 F.sum("payload_len").alias("sum_msadpcm_bytes")))


@register("msadpcm_header_integrity", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
sized AS (
  SELECT i, codec, sr_hz,
         greatest(1, (CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100))
                     // 1000) AS n_samples
  FROM full_ WHERE codec = 'opus')
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(count(*) AS BIGINT) AS n_riff_ok,
       CAST(count(*) AS BIGINT) AS n_tag_ok,
       CAST(count(*) AS BIGINT) AS n_block_ok,
       CAST(count(*) AS BIGINT) AS n_fact_match,
       CAST(count(*) AS BIGINT) AS n_size_law,
       CAST(sum(n_samples) AS BIGINT) AS sum_fact_samples
FROM sized GROUP BY codec
""")
def q_msadpcm_header_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-level integrity for the SECOND compressed codec, zero
    Python after the transcode: RIFF/fact/data magics, fmt tag 0x02,
    the fixed 256-byte block align, 500 samples/block and 7 published
    coefficient pairs, the fact chunk's sample count against
    sr_hz x dur_ms metadata, and the container SIZE LAW (total = 90 +
    256 x ceil(n/500)) — all parsed from the binary column with
    hex/conv byte surgery (operators/multimodal.py:
    msadpcm_header_columns). The oracle re-derives every count and the
    fact-sample sum in closed form from the generator contract without
    reading a payload; a match proves the writer's layout and the
    pure-Column parse agree byte-for-byte.

    Scale shape: map-only transcode + a pure-Column projection + one
    |codec|-key map-combinable rollup; payload bytes never shuffle.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import (msadpcm_header_columns,
                                         transcode_msadpcm)
    clips = generate_clips(spark, _SNR_N, partitions=8) \
        .filter(F.col("codec") == "opus")
    ms = transcode_msadpcm(clips)
    h = msadpcm_header_columns(F.col("bytes"))
    expected_n = F.greatest(
        F.lit(1),
        (F.col("sr_hz").cast("long")
         * F.coalesce(F.col("dur_ms"), F.lit(100)) / 1000)
        .cast("long"))
    blocks = F.ceil(F.col("fact_samples") / 500).cast("long")
    return (ms.select(
        "codec", "sr_hz", "dur_ms", F.length("bytes").alias("blen"),
        h["riff_ok"].alias("riff_ok"), h["fmt_tag"].alias("fmt_tag"),
        h["block_align"].alias("block_align"),
        h["samples_per_block"].alias("spb"),
        h["n_coef"].alias("n_coef"),
        h["fact_samples"].alias("fact_samples"))
        .groupBy("codec")
        .agg(F.count(F.lit(1)).alias("n_clips"),
             F.sum(F.col("riff_ok").cast("long")).alias("n_riff_ok"),
             F.sum((F.col("fmt_tag") == 2).cast("long")).alias("n_tag_ok"),
             F.sum(((F.col("block_align") == 256) & (F.col("spb") == 500)
                    & (F.col("n_coef") == 7))
                   .cast("long")).alias("n_block_ok"),
             F.sum((F.col("fact_samples") == expected_n).cast("long"))
             .alias("n_fact_match"),
             F.sum((F.col("blen") == 90 + 256 * blocks).cast("long"))
             .alias("n_size_law"),
             F.sum("fact_samples").alias("sum_fact_samples")))
