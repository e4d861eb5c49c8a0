"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL.

Every operator from SURVEY.md §2 that is SQL-expressible gets a pair here:
``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE_SQL[name]`` — the
same computation in ANSI SQL that DuckDB runs over the identical parquet
tables. The oracle is an *independent second implementation* of the rule
semantics, so a match is a real correctness statement, not a tautology.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing). Floating outputs are rounded on both
sides so IEEE summation-order differences can't flip the hash.

Dirty inputs are constructed deterministically from the driver's tables
(e.g. ``pmod(event_id, 6)`` selects a corruption pattern) — both engines
derive byte-identical raw strings, then each applies its own implementation
of the tolerance semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import default_config
from ..functions.coercion import (
    coerce_bool,
    coerce_number,
    coerce_timestamp,
)
from ..functions.keys import chameleon_key
from ..operators.drift import histogram, ks_statistic, psi
from ..operators.referential import orphans, referential_summary
from ..operators.stats import column_stats
from ..operators.uniqueness import exact_duplicates, uniqueness_summary
from ..operators.verdicts import rollup_verdicts, row_verdict
from ..sources.tables import load_table

CFG = default_config()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


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
SELECT sum(cnt) AS n_rows,
       count(*) AS n_keys,
       count(*) FILTER (WHERE cnt > 1) AS n_dup_keys,
       coalesce(sum(cnt) FILTER (WHERE cnt > 1), 0) AS n_dup_rows
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
      WHEN 3 THEN to_timestamp(CAST(raw AS BIGINT))::TIMESTAMP
      ELSE NULL END AS coerced
  FROM r)
SELECT fmt_id, verdict, count(*) AS n,
       count(*) FILTER (WHERE coerced = truth_d::TIMESTAMP)
         AS n_roundtrip_exact
FROM c GROUP BY fmt_id, verdict
""")
def q_coercion_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
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


# =========================================================================
# §2.7 audio path — SNR invariant + full suite over the synthesized clips
# table (BASELINE.json input_hint schema). Not SQL-expressible (WAV decode)
# ⇒ no oracle: the driver records rows-only checks; pytest holds the
# closed-form golden assertions (tests/test_suite.py).
# =========================================================================

_SNR_N = 2000  # deterministic fixture size for driver-visible audio queries


@register("snr_partition_verdicts")
def q_snr_partition_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures.gen import generate_clips
    from ..operators.snr import snr_check, snr_partition_rollup
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return snr_partition_rollup(snr_check(clips, extra_cols=["codec"]),
                                ["codec"])


@register("suite_partition_verdicts")
def q_suite_partition_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures.gen import generate_clips, generate_manifest
    from ..plans.suite import SuiteConfig, ValidationSuite, build_baseline_shares
    clips = generate_clips(spark, _SNR_N, partitions=8)
    manifest = generate_manifest(spark, _SNR_N, partitions=4)
    cfg = SuiteConfig()
    baseline = build_baseline_shares(clips.filter(F.col("codec") != "opus"), cfg)
    res = ValidationSuite(cfg).run(spark, clips, manifest, baseline)
    return res.partition_verdicts


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
