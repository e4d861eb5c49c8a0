"""Registry section: cross-column association, distribution conformity, cross-snapshot consistency.

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
    _SNR_N,
)

# =========================================================================
# Cross-column association & distribution conformity (operators/
# association.py) — the validation tier's cross-column complement of
# the per-column profile: do columns relate the way the contract says.
# =========================================================================

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORR_ORACLE = "SELECT * FROM (\n" + "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       CAST(count(*) FILTER (WHERE {a} IS NOT NULL AND {b} IS NOT NULL)
            AS BIGINT) AS n_pairs,
       round(sum({a} * {b}) / count(*)
             - (sum({a}) / count(*)) * (sum({b}) / count(*)), 6)
         AS covar_pop,
       round((count(*) * sum({a} * {b}) - sum({a}) * sum({b}))
             / sqrt((count(*) * sum({a} * {a}) - sum({a}) * sum({a}))
                    * (count(*) * sum({b} * {b}) - sum({b}) * sum({b}))),
             6) AS corr
FROM lineitem"""
    for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
) + "\n)"


@register("corr_profile", oracle=_CORR_ORACLE)
def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + covariance over the lineitem
    numeric columns (operators/association.py:corr_matrix) — the
    cross-column complement of column_profile. The reference validates
    each field in isolation (decoder.go walks one field at a time);
    a validation engine at corpus scale also needs "these two columns
    should (not) move together" checks, e.g. dur_ms vs byte-length on
    the clip table. ONE aggregate pass: all C(4,2)=6 pairs' moments
    (n, Σx, Σy, Σx², Σy², Σxy with pairwise-null deletion) are
    map-combinable sums in a single partial+final agg — the exchange
    carries one row per task; the pair fan-out happens on the 1-row
    result. The oracle recomputes the identical closed forms in DuckDB
    from its own independent sums.
    """
    from ...operators.association import corr_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(li, _CORR_COLS)


@register("categorical_association", oracle="""
WITH cont AS (
  SELECT coalesce(CAST(o_orderstatus AS VARCHAR), '<null>') AS a,
         coalesce(CAST(o_orderpriority AS VARCHAR), '<null>') AS b,
         count(*) AS c
  FROM orders GROUP BY 1, 2),
rm AS (SELECT a, sum(c) AS ra FROM cont GROUP BY a),
cm AS (SELECT b, sum(c) AS cb FROM cont GROUP BY b),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
               count(DISTINCT a) AS r, count(DISTINCT b) AS cc
        FROM cont),
grid AS (
  SELECT rm.a, cm.b, rm.ra, cm.cb, coalesce(cont.c, 0) AS obs
  FROM rm CROSS JOIN cm
  LEFT JOIN cont ON cont.a = rm.a AND cont.b = cm.b)
SELECT 'o_orderstatus' AS col_a, 'o_orderpriority' AS col_b,
       CAST(n AS BIGINT) AS n_rows,
       CAST((r - 1) * (cc - 1) AS BIGINT) AS dof,
       round(sum((obs - ra * cb / n) * (obs - ra * cb / n)
                 / (ra * cb / n)), 6) AS chi2,
       round(sqrt(sum((obs - ra * cb / n) * (obs - ra * cb / n)
                      / (ra * cb / n)) / n / least(r - 1, cc - 1)), 6)
         AS cramers_v
FROM grid, tot GROUP BY n, r, cc
""")
def q_categorical_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared / Cramér's V association between two categorical
    columns (operators/association.py:cramers_v) — order status ×
    priority. Validation use on the clip table: codec × verdict (is
    one codec failing disproportionately?). The corpus collapses in
    the first groupBy(a, b); marginals, the zero-filled r×c grid, chi²
    and V all run on the contingency table, bounded by categorical
    cardinality. The oracle builds the same grid independently in SQL.
    """
    from ...operators.association import cramers_v

    o = load_table(spark, sf_dir, "orders")
    return cramers_v(o, "o_orderstatus", "o_orderpriority")


@register("zipf_conformity", oracle="""
WITH toks AS (
  SELECT t.tok FROM documents,
       unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''),
counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
head AS (SELECT tok, cnt FROM counts
         ORDER BY cnt DESC, tok ASC LIMIT 1000),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC)
                 AS DOUBLE)) AS x,
         ln(CAST(cnt AS DOUBLE)) AS y
  FROM head),
m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(y * y) AS syy, sum(x * y) AS sxy
      FROM ranked)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
""")
def q_zipf_conformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law conformity of the token frequency head
    (operators/association.py:zipf_fit): OLS slope of ln(count) vs
    ln(rank) over the top-1000 tokens. Natural corpora fit slope ≈ −1;
    template spam / synthetic filler / tokenizer breakage bend the
    head — a corpus-level health check alongside benford_check (digits)
    and text_quality (per-doc). Scale shape: token counts collapse in
    one map-combinable agg; the head is TakeOrderedAndProject (per-
    partition top-K + K-row reduce, never a full sort); ranking + OLS
    moments run on ≤1000 rows. Tie order pinned (cnt DESC, tok ASC) on
    both engines.
    """
    from ...operators.association import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, "text", top_k=1000)


@register("skew_profile", oracle="""
SELECT * FROM (
SELECT 'l_partkey' AS key_col, CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys, CAST(max(cnt) AS BIGINT)
         AS max_cnt,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top1_share,
       round(max(cnt) / (CAST(sum(cnt) AS DOUBLE) / count(*)), 6)
         AS hot_ratio,
       round(log2(CAST(sum(cnt) AS DOUBLE))
             - sum(cnt * log2(CAST(cnt AS DOUBLE)))
               / CAST(sum(cnt) AS DOUBLE), 6) AS entropy_bits,
       round((log2(CAST(sum(cnt) AS DOUBLE))
              - sum(cnt * log2(CAST(cnt AS DOUBLE)))
                / CAST(sum(cnt) AS DOUBLE))
             / log2(CAST(count(*) AS DOUBLE)), 6) AS norm_entropy
FROM (SELECT l_partkey, count(*) AS cnt FROM lineitem
      WHERE l_partkey IS NOT NULL GROUP BY l_partkey)
UNION ALL
SELECT 'l_suppkey', CAST(sum(cnt) AS BIGINT), CAST(count(*) AS BIGINT),
       CAST(max(cnt) AS BIGINT),
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6),
       round(max(cnt) / (CAST(sum(cnt) AS DOUBLE) / count(*)), 6),
       round(log2(CAST(sum(cnt) AS DOUBLE))
             - sum(cnt * log2(CAST(cnt AS DOUBLE)))
               / CAST(sum(cnt) AS DOUBLE), 6),
       round((log2(CAST(sum(cnt) AS DOUBLE))
              - sum(cnt * log2(CAST(cnt AS DOUBLE)))
                / CAST(sum(cnt) AS DOUBLE))
             / log2(CAST(count(*) AS DOUBLE)), 6)
FROM (SELECT l_suppkey, count(*) AS cnt FROM lineitem
      WHERE l_suppkey IS NOT NULL GROUP BY l_suppkey)
UNION ALL
SELECT 'l_returnflag', CAST(sum(cnt) AS BIGINT), CAST(count(*) AS BIGINT),
       CAST(max(cnt) AS BIGINT),
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6),
       round(max(cnt) / (CAST(sum(cnt) AS DOUBLE) / count(*)), 6),
       round(log2(CAST(sum(cnt) AS DOUBLE))
             - sum(cnt * log2(CAST(cnt AS DOUBLE)))
               / CAST(sum(cnt) AS DOUBLE), 6),
       round((log2(CAST(sum(cnt) AS DOUBLE))
              - sum(cnt * log2(CAST(cnt AS DOUBLE)))
                / CAST(sum(cnt) AS DOUBLE))
             / log2(CAST(count(*) AS DOUBLE)), 6)
FROM (SELECT l_returnflag, count(*) AS cnt FROM lineitem
      WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag)
)
""")
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight shuffle-key skew diagnosis
    (operators/association.py:key_skew_profile): per candidate join/agg
    key, top-1 share, hot ratio max_cnt/(n/k), and key-histogram
    entropy. This is the check that decides salting / AQE skew-join
    BEFORE the expensive shuffle runs (the engine's own referential and
    dedup joins are consumers). Per key: one map-combinable count agg
    (corpus → cardinality rows) + ONE plain aggregate over the count
    table — entropy via log2(N) − (Σ n·log2 n)/N, no global window
    (the column_profile lesson, VERDICT r2 #2).
    """
    from ...operators.association import key_skew_profile

    li = load_table(spark, sf_dir, "lineitem")
    return key_skew_profile(li, ["l_partkey", "l_suppkey",
                                 "l_returnflag"])


_COMISS_KEYS = ["k", "session", "v2_flag", "legacy_id", "exp_bucket"]

_COMISS_ORACLE = """
WITH m AS (SELECT max(event_id) AS mx FROM events),
e AS (
  SELECT substr(props, 1, length(props) - 1)
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
ind AS (SELECT json_keys(props2) AS ks FROM e)
SELECT * FROM (
""" + "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS key_a, '{b}' AS key_b,
       CAST(sum(ia * ib) AS BIGINT) AS n_both,
       CAST(sum(ia * (1 - ib)) AS BIGINT) AS n_a_only,
       CAST(sum((1 - ia) * ib) AS BIGINT) AS n_b_only,
       CAST(sum((1 - ia) * (1 - ib)) AS BIGINT) AS n_neither,
       round(CASE WHEN sqrt(CAST(sum(ia * ib) + sum(ia * (1 - ib))
                                 AS DOUBLE)
                            * (sum((1 - ia) * ib)
                               + sum((1 - ia) * (1 - ib)))
                            * (sum(ia * ib) + sum((1 - ia) * ib))
                            * (sum(ia * (1 - ib))
                               + sum((1 - ia) * (1 - ib)))) > 0
             THEN (CAST(sum(ia * ib) AS DOUBLE)
                     * sum((1 - ia) * (1 - ib))
                   - CAST(sum(ia * (1 - ib)) AS DOUBLE)
                     * sum((1 - ia) * ib))
                  / sqrt(CAST(sum(ia * ib) + sum(ia * (1 - ib))
                              AS DOUBLE)
                         * (sum((1 - ia) * ib)
                            + sum((1 - ia) * (1 - ib)))
                         * (sum(ia * ib) + sum((1 - ia) * ib))
                         * (sum(ia * (1 - ib))
                            + sum((1 - ia) * (1 - ib))))
             ELSE NULL END, 6) AS phi
FROM (SELECT CAST(list_contains(ks, '{a}') AS INT) AS ia,
             CAST(list_contains(ks, '{b}') AS INT) AS ib
      FROM ind)"""
    for i, a in enumerate(_COMISS_KEYS) for b in _COMISS_KEYS[i + 1:]
) + "\n)"


@register("key_comissingness", oracle=_COMISS_ORACLE)
def q_key_comissingness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise presence/absence association of embedded-JSON keys
    (operators/association.py:key_comissingness): for every key pair in
    the declared universe, the 2×2 presence table + phi coefficient —
    which optional fields travel together, which are mutually exclusive
    (v2_flag vs legacy_id is planted as a perfect −phi pair by the
    same event-id arithmetic key_emergence uses; both engines enrich
    identically, then each computes its own association). Lifts the
    reference's per-document unknown/missing-key tolerance
    (decoder.go:221-226) to corpus-level structure. ONE map-combinable
    aggregate over indicator products; output C(5,2)=10 rows.
    """
    from ...operators.association import key_comissingness
    from ...operators.temporal import epoch_us  # noqa: F401

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
    keyed = (ev.join(F.broadcast(m))
             .select(F.json_object_keys(
                 F.concat(F.expr("substring(props, 1, length(props) - 1)"),
                          add, F.lit("}"))).alias("keys")))
    return key_comissingness(keyed, "keys", _COMISS_KEYS)


# =========================================================================
# Cross-snapshot / cross-provider consistency (operators/consistency.py)
# — between-version and between-provider checks no per-row rule can see.
# =========================================================================

@register("snapshot_diff", oracle="""
WITH old_ AS (
  SELECT o_orderkey,
         md5(concat_ws(chr(31),
             coalesce(CAST(o_orderstatus AS VARCHAR), '<null>'),
             coalesce(CAST(o_orderpriority AS VARCHAR), '<null>'))) AS fp
  FROM orders WHERE o_orderkey % 11 <> 3),
new_ AS (
  SELECT o_orderkey,
         md5(concat_ws(chr(31),
             coalesce(CAST(o_orderstatus AS VARCHAR), '<null>'),
             coalesce(CAST(CASE WHEN o_orderkey % 13 = 2
                                THEN '9-PLANTED'
                                ELSE o_orderpriority END
                           AS VARCHAR), '<null>'))) AS fp
  FROM orders WHERE o_orderkey % 11 <> 7),
j AS (SELECT old_.fp AS fo, new_.fp AS fn
      FROM old_ FULL JOIN new_ USING (o_orderkey))
SELECT CASE WHEN fo IS NULL THEN 'added'
            WHEN fn IS NULL THEN 'removed'
            WHEN fo <> fn THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_keys
FROM j GROUP BY 1
""")
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff (operators/consistency.py:snapshot_diff):
    two snapshots are derived deterministically from orders — "old"
    drops keys ≡3 (mod 11) (they are *added* later), "new" drops keys
    ≡7 (mod 11) (*removed*) and rewrites o_orderpriority for keys ≡2
    (mod 13) (*changed*). Each engine builds both snapshots with the
    same arithmetic, then runs its own diff: Spark full-outer-joins
    (key, md5 fingerprint) projections — payload columns never shuffle —
    while DuckDB's FULL JOIN recomputes the statuses independently.
    Fingerprint columns are string-typed only (double formatting is not
    cross-engine-stable; a real deployment fingerprints binary/decimal
    columns directly, same shape).
    """
    from ...operators.consistency import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    old = o.where(key % 11 != 3).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority")
    new = o.where(key % 11 != 7).select(
        "o_orderkey", "o_orderstatus",
        F.when(key % 13 == 2, F.lit("9-PLANTED"))
        .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"))
    return snapshot_diff(old, new, ["o_orderkey"],
                         ["o_orderstatus", "o_orderpriority"])


_AFD_CANDIDATES = [("o_orderkey", "o_orderstatus"),
                   ("o_custkey", "o_orderpriority"),
                   ("o_orderpriority", "o_orderstatus")]

_AFD_ORACLE = "SELECT * FROM (\n" + "\nUNION ALL\n".join(
    f"""SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(n - keep) AS BIGINT) AS n_violating_rows,
       round(CAST(sum(keep) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
         AS g3_confidence
FROM (SELECT l, sum(c) AS n, max(c) AS keep, count(*) AS n_rhs
      FROM (SELECT coalesce(CAST({lhs} AS VARCHAR), '<null>') AS l,
                   coalesce(CAST({rhs} AS VARCHAR), '<null>') AS r,
                   count(*) AS c
            FROM orders GROUP BY 1, 2)
      GROUP BY l)"""
    for lhs, rhs in _AFD_CANDIDATES) + "\n)"


@register("approx_fd", oracle=_AFD_ORACLE)
def q_approx_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional dependencies with the g3 confidence
    measure (operators/consistency.py:approx_fd): per candidate
    lhs → rhs, the fraction of rows surviving the minimal repair
    (keep each lhs group's majority rhs). o_orderkey → o_orderstatus is
    a key so g3 = 1.0 exactly; the two non-key candidates quantify
    partial dependence. Complements fd_profile's binary verdicts with
    the violating row mass a repair would delete. Corpus collapses in
    groupBy(lhs, rhs); the oracle recomputes the same two-level
    reduction in SQL from the raw table.
    """
    from ...operators.consistency import approx_fd

    o = load_table(spark, sf_dir, "orders")
    return approx_fd(o, _AFD_CANDIDATES)


@register("transcript_conflicts", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
flags AS (
  SELECT codec,
         CASE WHEN i % 1000 = 999 AND i > 0 THEN i - 1 ELSE i END
           AS base_i
  FROM full_),
k AS (SELECT codec, base_i, count(*) AS n_clip_rows
      FROM flags GROUP BY codec, base_i),
conf AS (
  SELECT codec, base_i, n_clip_rows + 1 AS n_rows
  FROM k WHERE base_i % 991 <> 990 AND base_i % 983 = 982)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_conflict_keys,
       CAST(sum(n_rows) AS BIGINT) AS n_conflict_rows
FROM conf GROUP BY codec
""")
def q_transcript_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same input, contradictory target
    (operators/consistency.py:label_conflicts): clip transcripts and
    manifest transcripts are unioned on clip_id; a clip_id carrying >1
    distinct transcript is a label conflict — exactly the planted
    manifest mismatches (fixtures/gen.py: every 983rd non-orphan row
    appends " MISMATCH"). The codec attribution rides along as max()
    so the manifest rows (no codec) don't fracture the key group. The
    oracle derives the conflicting key set and its row mass purely from
    row-id arithmetic + the CRC-32 codec fold — it never builds either
    table or compares a transcript string.
    """
    from ...fixtures.gen import generate_clips, generate_manifest
    from ...operators.consistency import conflict_summary, label_conflicts

    clips = generate_clips(spark, _SNR_N, partitions=8).select(
        "clip_id", "codec", "transcript")
    man = generate_manifest(spark, _SNR_N, partitions=4).select(
        "clip_id", F.lit(None).cast("string").alias("codec"),
        "transcript")
    un = clips.unionByName(man)
    conf = label_conflicts(un, "clip_id", "transcript",
                           attr_cols=["codec"])
    return conflict_summary(conf, ["codec"])


