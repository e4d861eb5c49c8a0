"""Registry section: §2.2 remaining coercions (integer/string/array/object/time-of-day) + §2.3 case detection + ADPCM container queries.

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    CFG,
    ensure_parallelism,
    load_table,
    register,
)
from .audio import (
    _CLIPS_CLOSED_FORM_CTE,
    _SNR_N,
)

# =========================================================================
# §2.2 remaining coercion operators: integer / string / array / object /
# time-of-day, plus §2.3 case detection. Raw inputs constructed
# deterministically from driver tables; oracles re-derive the tolerance
# semantics independently in SQL.
# =========================================================================

from ...config.rules import ArrayRules, RuleConfig  # noqa: E402
from ...functions.coercion import (  # noqa: E402
    coerce_array,
    coerce_integer,
    coerce_object,
    coerce_smart_scalar,
    coerce_string,
    coerce_time_of_day,
)
from ...functions.keys import (  # noqa: E402
    detect_case,
    join_words,
    split_words,
    unknown_key_count,
)

CFG_WRAP = RuleConfig(array_rules=ArrayRules(auto_wrap_single_values=True))


def _dirty_int_raw():
    m = F.pmod("o_orderkey", F.lit(8))
    k = F.col("o_orderkey").cast("string")
    return (
        F.when(m == 0, k)
        .when(m == 1, F.concat(k, F.lit(".7")))       # floor → o_orderkey
        .when(m == 2, F.concat(F.lit(" "), k, F.lit(" ")))
        .when(m == 3, F.lit("1,234"))
        .when(m == 4, F.lit("true"))
        .when(m == 5, F.lit(None).cast("string"))
        .when(m == 6, F.concat(k, F.lit(".0")))
        .otherwise(F.lit("x"))
    )


@register("coercion_integer", oracle=r"""
WITH r AS (
  SELECT CASE (o_orderkey % 8)
    WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
    WHEN 1 THEN o_orderkey || '.7'
    WHEN 2 THEN ' ' || o_orderkey || ' '
    WHEN 3 THEN '1,234'
    WHEN 4 THEN 'true'
    WHEN 5 THEN NULL
    WHEN 6 THEN o_orderkey || '.0'
    ELSE 'x' END AS raw
  FROM orders),
c AS (
  SELECT raw,
    CASE
      WHEN raw IS NULL THEN 'YELLOW'                       -- Number.FromNull
      WHEN regexp_matches(raw, '^-?\d+$') THEN 'GREEN'     -- strict ParseInt
      WHEN regexp_matches(replace(replace(trim(raw), ' ', ''), ',', ''),
                          '^[+-]?(\d+\.?\d*|\.\d+)$') THEN 'YELLOW'
      WHEN lower(trim(raw)) IN ('true', 'false') THEN 'YELLOW'
      ELSE 'RED' END AS verdict,
    CASE
      WHEN raw IS NULL THEN 0
      WHEN regexp_matches(raw, '^-?\d+$') THEN CAST(raw AS BIGINT)
      WHEN regexp_matches(replace(replace(trim(raw), ' ', ''), ',', ''),
                          '^[+-]?(\d+\.?\d*|\.\d+)$')
        THEN CAST(floor(CAST(replace(replace(trim(raw), ' ', ''), ',', '')
                             AS DOUBLE)) AS BIGINT)        -- RoundingAlgorithm=floor
      WHEN lower(trim(raw)) = 'true' THEN 1
      WHEN lower(trim(raw)) = 'false' THEN 0
      ELSE NULL END AS coerced
  FROM r)
SELECT verdict, count(*) AS n, CAST(sum(coerced) AS BIGINT) AS sum_coerced
FROM c GROUP BY verdict
""")
def q_coercion_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    res = coerce_integer(_dirty_int_raw(), CFG)
    return od.select(res.coerced.alias("coerced"),
                     res.verdict.alias("verdict")).groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("coerced").alias("sum_coerced"))


@register("coercion_string", oracle="""
WITH r AS (
  SELECT event_type,
         CASE (event_id % 3)
           WHEN 0 THEN event_type
           WHEN 1 THEN '  ' || event_type || ' '
           ELSE NULL END AS raw
  FROM events),
c AS (
  SELECT CASE
           WHEN raw IS NULL THEN 'RED'          -- no String.FromNull rule
           WHEN raw = trim(raw) THEN 'GREEN'
           ELSE 'YELLOW' END AS verdict,        -- surrounding-space recovery
         CASE WHEN raw IS NULL THEN NULL ELSE trim(raw) END AS coerced
  FROM r)
SELECT verdict, count(*) AS n, count(DISTINCT coerced) AS n_values,
       CAST(sum(length(coerced)) AS BIGINT) AS sum_len
FROM c GROUP BY verdict
""")
def q_coercion_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.pmod("event_id", F.lit(3))
    raw = (
        F.when(m == 0, F.col("event_type"))
        .when(m == 1, F.concat(F.lit("  "), F.col("event_type"), F.lit(" ")))
        .otherwise(F.lit(None).cast("string"))
    )
    res = coerce_string(raw, CFG)
    return ev.select(res.coerced.alias("coerced"),
                     res.verdict.alias("verdict")).groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("coerced").alias("n_values"),
        F.sum(F.length("coerced")).alias("sum_len"))


@register("coercion_array", oracle="""
WITH r AS (
  SELECT CASE (event_id % 6)
    WHEN 0 THEN '["a","b","c"]'
    WHEN 1 THEN '["x"]'
    WHEN 2 THEN '42'
    WHEN 3 THEN NULL
    WHEN 4 THEN '{"k":1}'
    ELSE '["a",' END AS raw
  FROM events),
c AS (
  SELECT CASE
      WHEN raw IS NULL THEN 'GREEN'                        -- null allowed
      WHEN json_valid(raw) AND json_type(try_cast(raw AS JSON)) = 'ARRAY' THEN 'GREEN'
      WHEN NOT regexp_matches(raw, '^\\s*[\\[{]') THEN 'YELLOW'  -- AutoWrap
      ELSE 'RED' END AS verdict,
    CASE
      WHEN raw IS NULL THEN NULL
      WHEN json_valid(raw) AND json_type(try_cast(raw AS JSON)) = 'ARRAY'
        THEN json_array_length(try_cast(raw AS JSON))
      WHEN NOT regexp_matches(raw, '^\\s*[\\[{]') THEN 1   -- wrapped scalar
      ELSE NULL END AS n_elems
  FROM r),
-- fixed-length target (decoder.go:302-341): len < 2 -> RED (not enough
-- elements), len > 2 -> extras dropped (YELLOW), exactly 2 -> unchanged
f AS (
  SELECT verdict, n_elems,
    CASE WHEN n_elems IS NULL THEN verdict
         WHEN n_elems < 2 THEN 'RED'
         WHEN n_elems > 2 THEN 'YELLOW'
         ELSE verdict END AS verdict_f2,
    CASE WHEN n_elems >= 2 THEN 2 END AS n_f2
  FROM c)
SELECT verdict, CAST(n_elems AS BIGINT) AS n_elems,
       verdict_f2, CAST(n_f2 AS BIGINT) AS n_f2, count(*) AS n
FROM f GROUP BY verdict, n_elems, verdict_f2, n_f2
""")
def q_coercion_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.pmod("event_id", F.lit(6))
    raw = (
        F.when(m == 0, F.lit('["a","b","c"]'))
        .when(m == 1, F.lit('["x"]'))
        .when(m == 2, F.lit("42"))
        .when(m == 3, F.lit(None).cast("string"))
        .when(m == 4, F.lit('{"k":1}'))
        .otherwise(F.lit('["a",'))
    )
    res = coerce_array(raw, CFG_WRAP)
    res2 = coerce_array(raw, CFG_WRAP, fixed_len=2)
    return ev.select(F.size(res.coerced).alias("sz"),
                     res.verdict.alias("verdict"),
                     F.size(res2.coerced).alias("sz2"),
                     res2.verdict.alias("verdict_f2")).select(
        F.when(F.col("sz") >= 0, F.col("sz")).cast("long")
         .alias("n_elems"),  # -1 → null
        "verdict",
        "verdict_f2",
        F.when(F.col("sz2") >= 0, F.col("sz2")).cast("long").alias("n_f2"),
    ).groupBy("verdict", "n_elems", "verdict_f2", "n_f2").agg(
        F.count(F.lit(1)).alias("n"))


@register("coercion_object", oracle="""
WITH r AS (
  SELECT CASE (event_id % 5)
    WHEN 0 THEN '{"a":"x","b":"y"}'
    WHEN 1 THEN '{"k":"v"}'
    WHEN 2 THEN NULL
    WHEN 3 THEN '["a"]'
    ELSE 'xyz' END AS raw
  FROM events),
c AS (
  SELECT CASE
      WHEN raw IS NULL THEN 'GREEN'
      WHEN json_valid(raw) AND json_type(try_cast(raw AS JSON)) = 'OBJECT' THEN 'GREEN'
      ELSE 'RED' END AS verdict,
    CASE WHEN raw IS NOT NULL AND json_valid(raw)
              AND json_type(try_cast(raw AS JSON)) = 'OBJECT'
         THEN len(json_keys(try_cast(raw AS JSON))) END AS n_keys
  FROM r)
SELECT verdict, CAST(n_keys AS BIGINT) AS n_keys, count(*) AS n
FROM c GROUP BY verdict, n_keys
""")
def q_coercion_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.pmod("event_id", F.lit(5))
    raw = (
        F.when(m == 0, F.lit('{"a":"x","b":"y"}'))
        .when(m == 1, F.lit('{"k":"v"}'))
        .when(m == 2, F.lit(None).cast("string"))
        .when(m == 3, F.lit('["a"]'))
        .otherwise(F.lit("xyz"))
    )
    res = coerce_object(raw, CFG)
    return ev.select(F.size(F.map_keys(res.coerced)).alias("sz"),
                     res.verdict.alias("verdict")).select(
        F.when(F.col("sz") >= 0, F.col("sz")).cast("long").alias("n_keys"),
        "verdict",
    ).groupBy("verdict", "n_keys").agg(F.count(F.lit(1)).alias("n"))


@register("adpcm_header_integrity", oracle=f"""
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
def q_adpcm_header_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-level integrity for the COMPRESSED codec, zero Python
    after the transcode: RIFF/fact/data magics, fmt tag 0x11, the fixed
    256-byte block align and 505 samples/block, the fact chunk's sample
    count against sr_hz x dur_ms metadata, and the container SIZE LAW
    (total = 60 + 256 x ceil(n/505)) — all parsed from the binary column
    with hex/conv byte surgery (operators/multimodal.py:
    adpcm_header_columns). The oracle re-derives every count and the
    fact-sample sum in closed form from the generator contract without
    reading a payload; a match proves the writer's layout and the
    pure-Column parse agree byte-for-byte. In production the payloads
    arrive already-ADPCM and this check runs with NO Python stage at
    all; here the fixture's WAV rows pass through the lockstep
    transcode first.

    Scale shape: map-only transcode + a pure-Column projection + one
    |codec|-key map-combinable rollup; payload bytes never shuffle.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import adpcm_header_columns, transcode_adpcm
    clips = generate_clips(spark, _SNR_N, partitions=8) \
        .filter(F.col("codec") == "opus")
    adpcm = transcode_adpcm(clips)
    h = adpcm_header_columns(F.col("bytes"))
    expected_n = F.greatest(
        F.lit(1),
        (F.col("sr_hz").cast("long")
         * F.coalesce(F.col("dur_ms"), F.lit(100)) / 1000)
        .cast("long"))
    blocks = F.ceil(F.col("fact_samples") / 505).cast("long")
    return (adpcm.select(
        "codec", "sr_hz", "dur_ms", F.length("bytes").alias("blen"),
        h["riff_ok"].alias("riff_ok"), h["fmt_tag"].alias("fmt_tag"),
        h["block_align"].alias("block_align"),
        h["samples_per_block"].alias("spb"),
        h["fact_samples"].alias("fact_samples"))
        .groupBy("codec")
        .agg(F.count(F.lit(1)).alias("n_clips"),
             F.sum(F.col("riff_ok").cast("long")).alias("n_riff_ok"),
             F.sum((F.col("fmt_tag") == 17).cast("long")).alias("n_tag_ok"),
             F.sum(((F.col("block_align") == 256) & (F.col("spb") == 505))
                   .cast("long")).alias("n_block_ok"),
             F.sum((F.col("fact_samples") == expected_n).cast("long"))
             .alias("n_fact_match"),
             F.sum((F.col("blen") == 60 + 256 * blocks).cast("long"))
             .alias("n_size_law"),
             F.sum("fact_samples").alias("sum_fact_samples")))


@register("coercion_smart_scalar", oracle="""
WITH m AS (SELECT event_id % 8 AS m8 FROM events),
g AS (SELECT m8, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY m8)
SELECT * FROM (
  SELECT 'bool' AS stype, 'GREEN' AS verdict, n,
         CAST(NULL AS BIGINT) AS long_digest,
         CAST(NULL AS BIGINT) AS dbl_digest,
         n AS n_true, CAST(NULL AS BIGINT) AS str_chars
  FROM g WHERE m8 = 0
  UNION ALL
  SELECT 'integer', 'GREEN', n, n * (((-42 % 1000003) + 1000003) % 1000003),
         NULL, NULL, NULL FROM g WHERE m8 = 1
  UNION ALL
  SELECT 'number', 'GREEN', n, NULL, n * 350, NULL, NULL
  FROM g WHERE m8 = 2
  UNION ALL
  SELECT 'string', 'GREEN', n, NULL, NULL, NULL, n * 11
  FROM g WHERE m8 = 3
  UNION ALL
  SELECT 'bool', 'YELLOW', n, NULL, NULL, n, NULL FROM g WHERE m8 = 4
  UNION ALL
  SELECT 'integer', 'YELLOW', n, n * (1234567 % 1000003), NULL, NULL, NULL
  FROM g WHERE m8 = 5
  UNION ALL
  SELECT 'string', 'YELLOW', n, NULL, NULL, NULL, n * 10
  FROM g WHERE m8 = 6
  UNION ALL
  SELECT NULL, 'RED', n, NULL, NULL, NULL, NULL FROM g WHERE m8 = 7
) t(stype, verdict, n, long_digest, dbl_digest, n_true, str_chars)
""")
def q_coercion_smart_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SmartScalar (reference dirtytypes.go:73, issue 4 — the
    second-to-last declared-only reference behavior, implemented per the
    rounding/auto-wrap/zone precedent; functions/coercion.py:
    coerce_smart_scalar): each event row derives one scalar spelling —
    strict JSON bool/integer/number/quoted-string (GREEN), the config's
    CI bool token list / comma-and-space-grouped integers / bare text
    (YELLOW), or a container (RED, scalars-only stance of
    dirtytypes.go:171-173) — and the typed-union inference is pinned by
    per-(stype, verdict) counts plus exact value digests: mod-prime sum
    of the long slot, integer sum of the rounded double slot, true-count
    of the bool slot, character count of the string slot. Pure Column
    expressions; the rollup is one map-combinable aggregate."""
    ev = load_table(spark, sf_dir, "events")
    m = F.pmod("event_id", F.lit(8))
    raw = (
        F.when(m == 0, F.lit("true"))
        .when(m == 1, F.lit("-42"))
        .when(m == 2, F.lit("3.5e2"))
        .when(m == 3, F.lit('"hello world"'))
        .when(m == 4, F.lit("YES"))
        .when(m == 5, F.lit("1,234 567"))
        .when(m == 6, F.lit("plain text"))
        .otherwise(F.lit("[1, 2]")))
    s = coerce_smart_scalar(raw, CFG)
    return (ev.select(s["stype"].alias("stype"),
                      s["verdict"].alias("verdict"),
                      s["bool_v"].alias("b"), s["long_v"].alias("l"),
                      s["double_v"].alias("d"), s["str_v"].alias("t"))
            .groupBy("stype", "verdict")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.pmod(F.col("l"), F.lit(1000003)))
                 .alias("long_digest"),
                 F.sum(F.round(F.col("d")).cast("long")).alias("dbl_digest"),
                 F.sum(F.col("b").cast("long")).alias("n_true"),
                 F.sum(F.length("t")).cast("long").alias("str_chars")))


@register("coercion_stringified", oracle="""
WITH m AS (SELECT event_id % 6 AS m6 FROM events),
g AS (SELECT m6, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY m6)
SELECT * FROM (
  SELECT 'array' AS mode, 'GREEN' AS verdict, n,
         3 * n AS sum_size FROM g WHERE m6 = 0
  UNION ALL
  SELECT 'array', 'YELLOW', CAST(sum(n) AS BIGINT),
         CAST(2 * sum(n) AS BIGINT)
  FROM g WHERE m6 IN (1, 2)
  UNION ALL
  SELECT 'array', 'RED', n, CAST(NULL AS BIGINT) FROM g WHERE m6 = 5
  UNION ALL
  SELECT 'object', 'GREEN', n, 2 * n FROM g WHERE m6 = 3
  UNION ALL
  SELECT 'object', 'YELLOW', n, 1 * n FROM g WHERE m6 = 4
) t(mode, verdict, n, sum_size)
""")
def q_coercion_stringified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringifiedContainers (reference dirtytypes.go:74, issue 5 — the
    LAST declared-only reference behavior; functions/coercion.py:
    unwrap_stringified): containers arriving as JSON-ESCAPED STRINGS —
    single- and double-stringified arrays, a stringified object — are
    peeled (two levels max) before coercion and capped at YELLOW, while
    natively-spelled containers stay GREEN and non-JSON text stays RED.
    Element/key counts of the unwrapped values pin that the inner JSON
    really parsed (a fake unwrap would null the size). Pure Column
    expressions; one map-combinable rollup."""
    import dataclasses as _dc
    import json as _json
    b0 = '["a","b","c"]'
    b1 = _json.dumps('["a","b"]')          # stringified array
    b2 = _json.dumps(b1)                   # double-stringified
    b3 = '{"k":"v","j":"w"}'
    b4 = _json.dumps('{"k":"v"}')          # stringified object
    cfg = _dc.replace(CFG, array_rules=_dc.replace(
        CFG.array_rules, stringified_containers=True))
    # The spelling space is SIX distinct tokens, so the coercion runs
    # on a 6-row dimension and the corpus broadcast-joins the verdicts
    # by branch key. This is not just the scale-correct shape for a
    # bounded token space — it is a plan-size necessity: inlining the
    # 6-branch literal CASE into every from_json/rlike site of the
    # two-level unwrap tree produced a 330 KB plan that cost ~20s of
    # driver-side analysis+codegen per build (measured at sf0.1), vs
    # milliseconds with the coercion anchored on a plain column.
    dim = spark.createDataFrame(
        [(0, b0), (1, b1), (2, b2), (3, b3), (4, b4), (5, "not json")],
        "m6 bigint, raw string")
    arr = coerce_array(F.col("raw"), cfg)
    obj = coerce_object(F.col("raw"), cfg)
    is_obj = F.col("m6").isin(3, 4)
    dim2 = dim.select(
        "m6",
        F.when(is_obj, F.lit("object")).otherwise(F.lit("array"))
        .alias("mode"),
        F.when(is_obj, obj.verdict).otherwise(arr.verdict).alias("verdict"),
        F.when(is_obj, F.size(F.map_keys(obj.coerced)))
        .otherwise(F.size(arr.coerced)).alias("sz"))
    ev = load_table(spark, sf_dir, "events")
    return (ev.select(F.pmod("event_id", F.lit(6)).alias("m6"))
            .join(F.broadcast(dim2), "m6")
            .select("mode", "verdict",
                    F.when(F.col("sz") >= 0, F.col("sz")).alias("sz"))
            .groupBy("mode", "verdict")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("sz").cast("long").alias("sum_size")))


# NB: time-of-day truth is derived arithmetically from o_orderkey in BOTH
# engines; only offset-LESS layouts are used so parse→hour() round-trips
# are session-timezone-invariant (unix/null branches are TZ-dependent by
# construction and covered by pytest under the fixed UTC session instead).

@register("coercion_time", oracle="""
WITH t AS (
  SELECT (o_orderkey % 5) AS m,
         (o_orderkey % 24) AS hh, (o_orderkey % 60) AS mi,
         ((o_orderkey * 7) % 60) AS ss
  FROM orders),
c AS (
  SELECT m,
    CASE m WHEN 4 THEN 'RED' ELSE 'YELLOW' END AS verdict,
    CASE m
      WHEN 0 THEN hh * 3600 + mi * 60 + ss          -- 'HH:mm:ss'
      WHEN 1 THEN hh * 3600 + mi * 60               -- 'HH:mm'
      WHEN 2 THEN hh * 3600 + mi * 60 + ss          -- offset-less RFC3339-ish
      WHEN 3 THEN (12 + (hh % 12)) * 3600 + mi * 60 -- 'h:mma' PM
      ELSE NULL END AS secs
  FROM t)
SELECT m, verdict, count(*) AS n, CAST(sum(secs) AS BIGINT) AS sum_secs
FROM c GROUP BY m, verdict
""")
def q_coercion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    m = F.pmod("o_orderkey", F.lit(5))
    hh = F.pmod("o_orderkey", F.lit(24))
    mi = F.pmod("o_orderkey", F.lit(60))
    ss = F.pmod(F.col("o_orderkey") * 7, F.lit(60))
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    raw = (
        F.when(m == 0, F.concat_ws(":", two(hh), two(mi), two(ss)))
        .when(m == 1, F.concat_ws(":", two(hh), two(mi)))
        .when(m == 2, F.concat(F.lit("1970-01-01T"),
                               F.concat_ws(":", two(hh), two(mi), two(ss))))
        .when(m == 3, F.concat(F.pmod(hh, F.lit(12)).cast("string"), F.lit(":"),
                               two(mi), F.lit("PM")))
        .otherwise(F.lit("not-a-time"))
    )
    # 'h:mma' is 12-hour: hour token must be 1-12, so 0 PM → 12 PM
    raw = F.when(
        (m == 3) & (F.pmod(hh, F.lit(12)) == 0),
        F.concat(F.lit("12:"), two(mi), F.lit("PM")),
    ).otherwise(raw)
    res = coerce_time_of_day(raw, CFG)
    return od.select(m.alias("m"), res.coerced.alias("secs"),
                     res.verdict.alias("verdict")).groupBy("m", "verdict").agg(
        F.count(F.lit(1)).alias("n"), F.sum("secs").alias("sum_secs"))


@register("case_detection", oracle="""
WITH k AS (
  SELECT CASE (event_id % 8)
    WHEN 0 THEN 'user_name'  WHEN 1 THEN 'userName'
    WHEN 2 THEN 'UserName'   WHEN 3 THEN 'user-name'
    WHEN 4 THEN 'User-Name'  WHEN 5 THEN 'User_Name'
    WHEN 6 THEN 'user Name2' ELSE 'XML$Parser' END AS key
  FROM events),
d AS (
  SELECT CASE
    WHEN regexp_matches(key, '^[a-z0-9]+(_[a-z0-9]+)*$') THEN 'snake'
    WHEN regexp_matches(key, '^[a-z][a-z0-9]*([A-Z][a-z0-9]*)*$') THEN 'camel'
    WHEN regexp_matches(key, '^([A-Z][a-z0-9]*)+$') THEN 'pascal'
    WHEN regexp_matches(key, '^[a-z0-9]+(-[a-z0-9]+)*$') THEN 'kebab'
    WHEN regexp_matches(key, '^[A-Z][a-z0-9]*(-[A-Z][a-z0-9]*)*$') THEN 'header'
    WHEN regexp_matches(key, '^[A-Z][a-z0-9]*(_[A-Z][a-z0-9]*)*$') THEN 'title_snake'
    WHEN regexp_matches(key, '^[A-Za-z0-9]+([-_ ][A-Za-z0-9]+)+$') THEN 'hybrid'
    ELSE 'unknown' END AS convention
  FROM k)
SELECT convention, count(*) AS n FROM d GROUP BY convention
""")
def q_case_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    m = F.pmod("event_id", F.lit(8))
    key = (
        F.when(m == 0, F.lit("user_name")).when(m == 1, F.lit("userName"))
        .when(m == 2, F.lit("UserName")).when(m == 3, F.lit("user-name"))
        .when(m == 4, F.lit("User-Name")).when(m == 5, F.lit("User_Name"))
        .when(m == 6, F.lit("user Name2")).otherwise(F.lit("XML$Parser"))
    )
    return ev.select(detect_case(key).alias("convention")).groupBy(
        "convention").agg(F.count(F.lit(1)).alias("n"))


@register("key_style_stats", oracle="""
WITH k AS (
  SELECT CASE (event_id % 8)
    WHEN 0 THEN 'user_name'  WHEN 1 THEN 'userName'
    WHEN 2 THEN 'UserName'   WHEN 3 THEN 'user-name'
    WHEN 4 THEN 'User-Name'  WHEN 5 THEN 'User_Name'
    WHEN 6 THEN 'user Name2' ELSE 'XML$Parser' END AS key
  FROM events),
-- expected values hand-derived from the reference's TransformTo/SplitWords
-- (cases/cases.go:279-342), independent of the Spark implementation
t AS (
  SELECT
    CASE key
      WHEN 'user_name' THEN 'snake'  WHEN 'userName' THEN 'camel'
      WHEN 'UserName' THEN 'pascal'  WHEN 'user-name' THEN 'kebab'
      WHEN 'User-Name' THEN 'header' WHEN 'User_Name' THEN 'title_snake'
      WHEN 'user Name2' THEN 'hybrid' ELSE 'unknown' END AS convention,
    CASE key WHEN 'user Name2' THEN 'user_name2'
             WHEN 'XML$Parser' THEN 'xml$parser'
             ELSE 'user_name' END AS snake,
    CASE key WHEN 'user Name2' THEN 'userName2'
             WHEN 'XML$Parser' THEN 'xml$parser'
             ELSE 'userName' END AS camel,
    CASE key WHEN 'user Name2' THEN 'UserName2'
             WHEN 'XML$Parser' THEN 'Xml$parser'
             ELSE 'UserName' END AS pascal,
    CASE key WHEN 'user Name2' THEN 'User-Name2'
             WHEN 'XML$Parser' THEN 'Xml$parser'
             ELSE 'User-Name' END AS header
  FROM k)
SELECT convention, snake, camel, pascal, header, count(*) AS n
FROM t GROUP BY convention, snake, camel, pascal, header
""")
def q_key_style_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-style reporting: detected convention + TransformTo renderings
    (cases/cases.go:279-342) over the same synthetic key stream as
    case_detection."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    m = F.pmod("event_id", F.lit(8))
    key = (
        F.when(m == 0, F.lit("user_name")).when(m == 1, F.lit("userName"))
        .when(m == 2, F.lit("UserName")).when(m == 3, F.lit("user-name"))
        .when(m == 4, F.lit("User-Name")).when(m == 5, F.lit("User_Name"))
        .when(m == 6, F.lit("user Name2")).otherwise(F.lit("XML$Parser"))
    )
    # split once into a bound column; join per convention (see
    # transform_to's CSE note)
    return ev.select(
        detect_case(key).alias("convention"),
        split_words(key).alias("__w"),
    ).select(
        "convention",
        join_words(F.col("__w"), "snake").alias("snake"),
        join_words(F.col("__w"), "camel").alias("camel"),
        join_words(F.col("__w"), "pascal").alias("pascal"),
        join_words(F.col("__w"), "header").alias("header"),
    ).groupBy("convention", "snake", "camel", "pascal", "header").agg(
        F.count(F.lit(1)).alias("n"))


@register("unknown_keys", oracle="""
WITH r AS (
  SELECT CASE (event_id % 4)
    WHEN 0 THEN '{"qty":1,"active":true}'
    WHEN 1 THEN '{"QTY":2,"Active":false,"Debug-Flag":1}'
    WHEN 2 THEN '{"qty":3,"score":1.5,"legacy_id":7,"Extra Key":0}'
    ELSE 'not json' END AS raw
  FROM events),
c AS (
  SELECT CASE WHEN json_valid(raw) AND json_type(try_cast(raw AS JSON)) = 'OBJECT' THEN
    CAST(len(list_filter(json_keys(try_cast(raw AS JSON)),
      k -> lower(replace(replace(replace(k, '-', ''), '_', ''), ' ', ''))
           NOT IN ('qty', 'active', 'score'))) AS BIGINT)
  END AS n_unknown FROM r)
SELECT n_unknown, count(*) AS n_docs FROM c GROUP BY n_unknown
""")
def q_unknown_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extra-column stat: the reference silently skips unmatched fields
    (internal/dirtyjson/decoder.go:221-226); this surfaces a per-document
    unknown-key count under chameleon matching (NULL = unparseable doc)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.pmod("event_id", F.lit(4))
    raw = (
        F.when(m == 0, F.lit('{"qty":1,"active":true}'))
        .when(m == 1, F.lit('{"QTY":2,"Active":false,"Debug-Flag":1}'))
        .when(m == 2, F.lit('{"qty":3,"score":1.5,"legacy_id":7,"Extra Key":0}'))
        .otherwise(F.lit("not json"))
    )
    return ev.select(
        unknown_key_count(raw, ["qty", "active", "score"])
        .cast("long").alias("n_unknown")
    ).groupBy("n_unknown").agg(F.count(F.lit(1)).alias("n_docs"))


