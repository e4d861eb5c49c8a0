"""Registry section: §3.1 embedded-JSON flagship decode, HLL/large-manifest referential, checkpoint ledger, KLL quantile sketch paths.

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    CFG,
    column_stats,
    load_table,
    register,
)

# =========================================================================
# §3.1 flagship decode pipeline on an embedded-JSON column: clean-first
# typed pass, dirty stringly+coercion fallback, columnar merge
# (functions/embedded.py). The DuckDB oracle distinguishes strict vs
# stringified values via json_type(), i.e. a fully independent
# re-implementation of the clean/dirty split.
# =========================================================================

from ...functions.embedded import EmbeddedField, decode_embedded_df  # noqa: E402


def _embedded_raw():
    """Deterministic embedded doc per event: strict / stringified /
    messy-recoverable / null variants keyed on event_id."""
    m = F.pmod("event_id", F.lit(4))
    q = F.pmod("event_id", F.lit(100)).cast("string")
    b = F.when(F.pmod("event_id", F.lit(2)) == 0, "true").otherwise("false")
    s = F.pmod("event_id", F.lit(10)).cast("string")
    return (
        F.when(m == 0, F.concat(
            F.lit('{"qty":'), q, F.lit(',"active":'), b,
            F.lit(',"score":'), s, F.lit('.5}')))
        .when(m == 1, F.concat(
            F.lit('{"qty":"'), q, F.lit('","active":"yes","score":" '),
            s, F.lit('.5 "}')))
        .when(m == 2, F.concat(
            F.lit('{"qty":"'), q, F.lit(',000","active":"off","score":"bad"}')))
        .otherwise(F.lit('{"qty":null,"active":null,"score":null}'))
    )


_EMBEDDED_RAW_SQL = """
  CASE (event_id % 4)
    WHEN 0 THEN '{"qty":' || (event_id % 100) || ',"active":'
                || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END
                || ',"score":' || (event_id % 10) || '.5}'
    WHEN 1 THEN '{"qty":"' || (event_id % 100)
                || '","active":"yes","score":" ' || (event_id % 10) || '.5 "}'
    WHEN 2 THEN '{"qty":"' || (event_id % 100)
                || ',000","active":"off","score":"bad"}'
    ELSE '{"qty":null,"active":null,"score":null}' END
"""


@register("embedded_decode", oracle=f"""
WITH r AS (SELECT {_EMBEDDED_RAW_SQL} AS raw FROM events),
c AS (
  SELECT
    -- qty: strict iff the JSON token is an integer; tolerant path strips
    -- spaces/commas then floor-parses; null → 0 (Number.FromNull)
    CASE
      WHEN json_type(raw, '$.qty') IN ('BIGINT', 'UBIGINT') THEN 'GREEN'
      WHEN json_type(raw, '$.qty') = 'NULL' THEN 'YELLOW'
      WHEN json_type(raw, '$.qty') = 'VARCHAR'
           AND regexp_matches(replace(replace(trim(
                 json_extract_string(raw, '$.qty')), ' ', ''), ',', ''),
               '^[+-]?(\\d+\\.?\\d*|\\.\\d+)$') THEN 'YELLOW'
      ELSE 'RED' END AS v_qty,
    CASE
      WHEN json_type(raw, '$.qty') IN ('BIGINT', 'UBIGINT')
        THEN json_extract(raw, '$.qty')::VARCHAR::BIGINT
      WHEN json_type(raw, '$.qty') = 'NULL' THEN 0
      WHEN json_type(raw, '$.qty') = 'VARCHAR'
           AND regexp_matches(replace(replace(trim(
                 json_extract_string(raw, '$.qty')), ' ', ''), ',', ''),
               '^[+-]?(\\d+\\.?\\d*|\\.\\d+)$')
        THEN CAST(floor(CAST(replace(replace(trim(
               json_extract_string(raw, '$.qty')), ' ', ''), ',', '')
               AS DOUBLE)) AS BIGINT)
      END AS c_qty,
    -- active: strict iff JSON bool; custom true/false lists; null → false
    CASE
      WHEN json_type(raw, '$.active') = 'BOOLEAN' THEN 'GREEN'
      WHEN json_type(raw, '$.active') = 'NULL' THEN 'YELLOW'
      WHEN lower(trim(json_extract_string(raw, '$.active')))
           IN ('true', 'yes', 'on', 'false', 'no', 'off', '') THEN 'YELLOW'
      ELSE 'YELLOW' END AS v_active,            -- FallbackValue=false
    CASE
      WHEN json_type(raw, '$.active') = 'BOOLEAN'
        THEN json_extract(raw, '$.active')::VARCHAR::BOOLEAN
      WHEN json_type(raw, '$.active') = 'NULL' THEN FALSE
      WHEN lower(trim(json_extract_string(raw, '$.active')))
           IN ('true', 'yes', 'on') THEN TRUE
      ELSE FALSE END AS c_active,
    -- score: strict iff JSON number; spacing tolerated; null → 0.0
    CASE
      WHEN json_type(raw, '$.score') IN ('DOUBLE', 'BIGINT', 'UBIGINT')
        THEN 'GREEN'
      WHEN json_type(raw, '$.score') = 'NULL' THEN 'YELLOW'
      WHEN json_type(raw, '$.score') = 'VARCHAR'
           AND regexp_matches(replace(replace(trim(
                 json_extract_string(raw, '$.score')), ' ', ''), ',', ''),
               '^[+-]?(\\d+\\.?\\d*|\\.\\d+)$') THEN 'YELLOW'
      ELSE 'RED' END AS v_score,
    CASE
      WHEN json_type(raw, '$.score') IN ('DOUBLE', 'BIGINT', 'UBIGINT')
        THEN json_extract(raw, '$.score')::VARCHAR::DOUBLE
      WHEN json_type(raw, '$.score') = 'NULL' THEN 0.0
      WHEN json_type(raw, '$.score') = 'VARCHAR'
           AND regexp_matches(replace(replace(trim(
                 json_extract_string(raw, '$.score')), ' ', ''), ',', ''),
               '^[+-]?(\\d+\\.?\\d*|\\.\\d+)$')
        THEN CAST(replace(replace(trim(json_extract_string(raw, '$.score')),
                  ' ', ''), ',', '') AS DOUBLE)
      END AS c_score
  FROM r)
SELECT v_qty, v_active, v_score, count(*) AS n,
       CAST(sum(c_qty) AS BIGINT) AS sum_qty,
       CAST(sum(CASE WHEN c_active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       round(sum(c_score), 6) AS sum_score
FROM c GROUP BY v_qty, v_active, v_score
""")
def q_embedded_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fields = [
        EmbeddedField("qty", "integer"),
        EmbeddedField("active", "bool"),
        EmbeddedField("score", "number"),
    ]
    ev, res = decode_embedded_df(
        ev, _embedded_raw(), "qty bigint, active boolean, score double",
        fields, CFG)
    return ev.select(
        res["qty"].verdict.alias("v_qty"),
        res["active"].verdict.alias("v_active"),
        res["score"].verdict.alias("v_score"),
        res["qty"].coerced.alias("c_qty"),
        res["active"].coerced.alias("c_active"),
        res["score"].coerced.alias("c_score"),
    ).groupBy("v_qty", "v_active", "v_score").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_qty").alias("sum_qty"),
        F.sum(F.col("c_active").cast("long")).alias("n_active"),
        F.round(F.sum("c_score"), 6).alias("sum_score"),
    )


# =========================================================================
# §2.4/§2.5 remaining physical strategies: HLL++ approximate uniqueness
# (sketch ⇒ rows-only + relative-error pytest) and the large-manifest
# referential path (merge join + runtime bloom filter — same oracle as
# the broadcast path, different physical plan).
# =========================================================================

from ...operators.referential import orphans_large_dim  # noqa: E402
from ...operators.uniqueness import approx_uniqueness  # noqa: E402


@register("uniqueness_approx")
def q_uniqueness_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL++ sketch estimate — approximate by design, so no value oracle;
    # tests/test_pipeline.py bounds the relative error vs the exact count
    li = load_table(spark, sf_dir, "lineitem")
    return approx_uniqueness(li, "l_orderkey", rsd=0.01,
                             partition_cols=["l_returnflag"])


@register("referential_orphans_large", oracle="""
SELECT o.o_custkey, count(*) AS n_orphan_rows
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 7 <> 3)
GROUP BY o.o_custkey
""")
def q_referential_orphans_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    # identical semantics to referential_orphans, but through the
    # too-big-to-broadcast plan: repartition-on-key + merge-hint anti-join
    # with Catalyst's runtime bloom filter pruning the fact scan
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey"))
    manifest = (
        load_table(spark, sf_dir, "customer")
        .filter(F.pmod("c_custkey", F.lit(7)) != 3)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orphans_large_dim(orders, manifest, "o_custkey").groupBy(
        "o_custkey").agg(F.count(F.lit(1)).alias("n_orphan_rows"))


# =========================================================================
# §2.7 checkpoint ledger — resume demo visible to the driver: run the
# audio suite with a ledger twice; the second pass must find every
# partition DONE and process nothing. Not SQL-expressible (stateful
# across runs) ⇒ rows-only; the golden path is tests/test_suite.py::
# test_ledger_resume.
# =========================================================================

@register("ledger_resume")
def q_ledger_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ...fixtures.gen import generate_clips, generate_manifest
    from ...plans.suite import SuiteConfig, ValidationSuite

    clips = generate_clips(spark, 400, partitions=4)
    manifest = generate_manifest(spark, 400, partitions=2)
    cfg = SuiteConfig()
    with tempfile.TemporaryDirectory(prefix="json_spark_ledger_") as tmp:
        ledger_path = f"{tmp}/ledger"
        suite = ValidationSuite(cfg)
        r1 = suite.run(spark, clips, manifest, ledger_path=ledger_path,
                       input_path=tmp)
        n1 = r1.partition_verdicts.count()
        r1.unpersist()
        r2 = suite.run(spark, clips, manifest, ledger_path=ledger_path,
                       input_path=tmp)
        n2 = r2.partition_verdicts.count()  # 0: everything already DONE
        r2.unpersist()
        return spark.createDataFrame(
            [(n1, n2, n2 == 0)],
            "first_run_partition_checks long, resumed_run_pending long, "
            "resume_skipped_all boolean")


# =========================================================================
# §2.4 quantile sketch path — percentile_approx (mergeable KLL-style
# sketch) is the production plan; approximate by design ⇒ rows-only,
# with a pytest error bound vs the exact percentiles (the exact variant
# is oracle-checked as stats_quantiles).
# =========================================================================

@register("stats_quantiles_sketch")
def q_stats_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stats = column_stats(li, ["l_extendedprice"], ["l_returnflag"],
                         quantiles=(0.25, 0.5, 0.75), accuracy=10_000,
                         approx=True)
    return stats.select(
        "l_returnflag",
        F.col("l_extendedprice__quantiles").getItem(0).alias("p25"),
        F.col("l_extendedprice__quantiles").getItem(1).alias("p50"),
        F.col("l_extendedprice__quantiles").getItem(2).alias("p75"),
    )


@register("stats_quantiles_kll")
def q_stats_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles via the engine's OWN KLL sketch (functions/kll.py —
    the Karnin–Lang–Liberty structure the north star names; Spark
    ships GK approx_percentile and DataSketches HLL but no KLL): one
    O(k·log(n/k))-byte sketch per scan partition, deterministic
    compaction offsets (seed = partition id, the generator-vs-checker
    trick), then a single bounded merge task folds |partitions| states
    into corpus quantiles. rows-only by nature (probabilistic sketch);
    pytest pins rank error < 2% across six distributions, the merge
    law under arbitrary batching, bit-identical rebuilds, and the
    serialization round-trip; the Spark path is asserted against a
    local same-seed fold exactly.

    Scale shape: raw values NEVER shuffle — only the KB-sized states
    do; the merge is one task over |partitions| rows, the same
    bounded-fold shape as the PQ codebook and suite-resume paths.
    """
    from ...operators.stats import kll_quantiles
    li = load_table(spark, sf_dir, "lineitem")
    return kll_quantiles(li, "l_extendedprice",
                         [0.25, 0.5, 0.75], k=200).select(
        "p", F.round("value", 6).alias("value"), "n")


@register("config_schema", oracle="""
SELECT * FROM (VALUES
  ('Bool.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Bool.FallbackValue', 'FallbackValue', 'checkbox', 'false'),
  ('Bool.FromStrings.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Bool.FromStrings.CustomListForTrue', 'CustomListForTrue', 'text',
   '["true", "yes", "on"]'),
  ('Bool.FromStrings.CustomListForFalse', 'CustomListForFalse', 'text',
   '["false", "no", "off", ""]'),
  ('Bool.FromStrings.CaseInsensitive', 'CaseInsensitive', 'checkbox', 'true'),
  ('Bool.FromStrings.RespectFromNumbersLogic', 'RespectFromNumbersLogic',
   'checkbox', 'true'),
  ('Bool.FromNumbers.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Bool.FromNumbers.CustomParseFunc', 'CustomParseFunc', 'select', 'binary'),
  ('Bool.FromNull.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Bool.FromNull.Inverse', 'Inverse', 'checkbox', 'false'),
  ('Number.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Number.FromStrings.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Number.FromStrings.SpacingAllowed', 'SpacingAllowed', 'checkbox', 'true'),
  ('Number.FromStrings.ExponentNotationAllowed', 'ExponentNotationAllowed',
   'checkbox', 'true'),
  ('Number.FromStrings.CommasAllowed', 'CommasAllowed', 'checkbox', 'true'),
  ('Number.FromStrings.RoundingAlgorithm', 'RoundingAlgorithm', 'select',
   'floor'),
  ('Number.FromBools.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Number.FromNull.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Date.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Date.Timezone.Default', 'Default', 'text', 'UTC'),
  ('Date.Timezone.Fields', 'Fields', 'text', '["timezone", "tz"]'),
  ('Date.Timezone.ForceConvertingInto', 'ForceConvertingInto', 'checkbox',
   'false'),
  ('Date.FromNumbers.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Date.FromNumbers.UnixTimestamp', 'UnixTimestamp', 'checkbox', 'true'),
  ('Date.FromNumbers.UnixMilliTimestamp', 'UnixMilliTimestamp', 'checkbox',
   'true'),
  ('Date.FromStrings.Allowed', 'Allowed', 'checkbox', 'true'),
  ('Date.FromStrings.Aliases', 'Aliases', 'checkbox', 'true'),
  ('Date.FromStrings.RespectFromNumbersLogic', 'RespectFromNumbersLogic',
   'checkbox', 'true'),
  ('Date.FromStrings.Layouts.Time', 'Time', 'text',
   '["3:04PM", "15:04", "15:04:05"]'),
  ('Date.FromStrings.Layouts.Date', 'Date', 'text',
   '["2006-01-02", "2006/01/02", "02 Jan 06", "02-Jan-06", "Mon, 02 Jan 06", "Mon, 02-Jan-06", "Monday, 02 Jan 06", "Monday, 02-Jan-06", "02 Jan 2006", "02-Jan-2006", "Mon, 02 Jan 2006", "Mon, 02-Jan-2006", "Monday, 02 Jan 2006", "Monday, 02-Jan-2006"]'),
  ('Date.FromStrings.Layouts.DateTime', 'DateTime', 'text',
   '["2006-01-02T15:04:05", "2006-01-02T15:04:05Z07:00", "2006-01-02T15:04:05.999999999Z07:00"]'),
  ('Date.FromNull.Disabled', 'Disabled', 'checkbox', 'false'),
  ('FlexKeys.Disabled', 'Disabled', 'checkbox', 'true'),
  ('FlexKeys.CaseInsensitive', 'CaseInsensitive', 'checkbox', 'false'),
  ('FlexKeys.ChameleonCase', 'ChameleonCase', 'checkbox', 'false'),
  ('Array.Disabled', 'Disabled', 'checkbox', 'false'),
  ('Array.AutoWrapSingleValues', 'AutoWrapSingleValues', 'checkbox', 'false'),
  ('Array.StringifiedContainers', 'StringifiedContainers', 'checkbox',
   'false')
) AS t(name, label, ftype, value)
""")
def q_config_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config introspection / schema generation (reference formgen:
    internal/formgen/introspect.go:19-137, cmd/config-schema/main.go:12-26;
    engine: config/introspect.py). Flattens the introspected FormModel of
    the default config into (name, label, ftype, value) rows. The oracle
    is a HAND-TRANSCRIBED golden of the reference's default.toml surface
    (the one query class where nothing is derivable by a second engine —
    pure config metadata), so any drift in the walk order, key naming,
    type mapping, select values, or Go-layout rendering fails the hash.
    Pure driver-side metadata: the DataFrame is config-sized by nature.
    """
    from ...config.introspect import introspect

    def walk(sec, out):
        for f in sec.fields:
            out.append((f.name, f.label, f.type, f.value))
        for s in sec.subsections:
            walk(s, out)

    rows: list[tuple[str, str, str, str]] = []
    for sec in introspect().sections:
        walk(sec, rows)
    return spark.createDataFrame(
        rows, "name string, label string, ftype string, value string")


