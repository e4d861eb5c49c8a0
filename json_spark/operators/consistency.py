"""Cross-snapshot / cross-provider consistency operators.

The reference validates one document at a time (decoder.go walks a
single value tree); a corpus-scale validation engine also has to answer
*between-version* and *between-provider* questions that no per-row rule
can see:

- ``snapshot_diff``   — keyed fingerprint diff of two table versions:
  which rows were added / removed / changed between snapshot A and
  snapshot B. The workhorse of dataset versioning audits ("what did
  yesterday's ingest actually change?").
- ``label_conflicts`` — same key, contradictory label: rows from
  multiple providers (clips table vs transcript manifest, two
  annotation passes, model A vs model B) unioned on a key, flagged
  where one key carries >1 distinct label value. The training-data
  failure this catches — "same input, different target" — silently
  caps model accuracy and is invisible to every per-row check.
- ``approx_fd``       — the g3 confidence of a functional dependency
  lhs → rhs: the fraction of rows that survive deleting the minimum
  row set that makes the FD exact (per lhs group, keep the majority
  rhs). Complements profiling.fd_profile (binary holds/violating per
  group) with the standard approximate-FD measure, so "clip_id
  determines sr_hz in 99.97% of rows — here is the violating mass"
  becomes a single verdict row.

Scale shapes (100 TB):
- snapshot_diff projects each side to (key, 16-byte fingerprint)
  MAP-SIDE before the join — the payload columns never shuffle; the
  full-outer join shuffles both sides once on the key (or is free with
  co-bucketed snapshot storage, the recommended layout for repeated
  diffs); the diff then collapses to 4 status rows in a
  map-combinable count.
- label_conflicts is one groupBy(key) whose aggregates are all
  map-combinable (count / countDistinct / min / max); attribution
  columns ride along as max() so providers that don't carry them
  (e.g. the manifest has no codec) don't split the group.
- approx_fd collapses the corpus in groupBy(lhs, rhs) — the shuffle
  carries deduplicated pairs, not rows — then reduces the pair table
  per lhs and finally to one verdict row; no windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: list[str]) -> Column:
    """Cross-engine 128-bit row fingerprint: md5 of the unit-separator
    join of the columns' string forms, nulls as a sentinel (concat_ws
    would silently drop them, making (NULL, 'x') collide with ('x',)).
    Identical in DuckDB: ``md5(concat_ws(chr(31), coalesce(c::VARCHAR,
    '<null>'), ...))`` — so oracles reproduce every fingerprint.
    """
    return F.md5(F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                  for c in cols]))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Keyed diff of two snapshots → one row per status.

    Output: (status ∈ added|removed|changed|unchanged, n_keys). ``added``
    = key only in ``new``, ``removed`` = only in ``old``, ``changed`` =
    present in both with differing fingerprints over ``compare_cols``.
    Assumes ``key_cols`` are unique per snapshot (validate with
    uniqueness.exact_duplicates first — a dup key makes "the" row of a
    key ill-defined in any diff).

    Only (key, fingerprint) ever shuffles; at 10^12 rows the join is a
    single sort-merge exchange per side, and AQE's skew split handles a
    pathological hot key.
    """
    fp = row_fingerprint(compare_cols)
    o = old.select(*key_cols, fp.alias("__fp_old"))
    n = new.select(*key_cols, fp.alias("__fp_new"))
    j = o.join(n, key_cols, "full_outer")
    status = (F.when(F.col("__fp_old").isNull(), F.lit("added"))
              .when(F.col("__fp_new").isNull(), F.lit("removed"))
              .when(F.col("__fp_old") != F.col("__fp_new"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return (j.select(status.alias("status"))
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_keys")))


def label_conflicts(df: DataFrame, key_col: str, label_col: str,
                    attr_cols: list[str] | None = None) -> DataFrame:
    """Keys carrying more than one distinct label, with evidence.

    Input is typically a union of (key, label) pairs from several
    providers. Output: one row per conflicting key — n_rows, n_labels,
    the lexical min/max label as evidence (bounded regardless of label
    cardinality — no collect_set of an unbounded transcript column) —
    plus each ``attr_cols`` attributed via max() so providers that
    don't carry the attribute (null) don't fracture the key group.
    """
    lbl = F.col(label_col)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(lbl).alias("n_labels"),
        F.min(lbl).alias("label_lo"),
        F.max(lbl).alias("label_hi"),
    ] + [F.max(F.col(a)).alias(a) for a in (attr_cols or [])]
    per_key = df.groupBy(key_col).agg(*aggs)
    return per_key.where(F.col("n_labels") > 1)


def conflict_summary(conflicts: DataFrame,
                     group_cols: list[str]) -> DataFrame:
    """Roll conflicting keys up to (group, n_conflict_keys,
    n_conflict_rows) — the partition-verdict form of label_conflicts."""
    return (conflicts.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n_conflict_keys"),
                 F.sum("n_rows").alias("n_conflict_rows")))


def approx_fd(df: DataFrame,
              candidates: list[tuple[str, str]],
              decimals: int = 6) -> DataFrame:
    """g3 confidence per candidate FD lhs → rhs.

    For each lhs group the majority rhs count is the mass that survives
    the minimal repair; confidence = Σ majority / Σ rows (1.0 ⇔ the FD
    holds exactly). Output per candidate: n_rows, n_groups,
    n_violating_groups, n_violating_rows (the repair size), and
    g3_confidence. Null lhs/rhs participate as ordinary values — a null
    rhs conflicting with a non-null one IS a dependency violation.

    Two map-combinable stages per candidate: groupBy(lhs, rhs) collapses
    the corpus to distinct pairs; groupBy(lhs) reduces pairs to per-group
    (total, majority); one final 1-row aggregate. No windows.
    """
    outs = []
    for lhs, rhs in candidates:
        pairs = (df.select(
            F.coalesce(F.col(lhs).cast("string"), F.lit("<null>"))
            .alias("__l"),
            F.coalesce(F.col(rhs).cast("string"), F.lit("<null>"))
            .alias("__r"))
            .groupBy("__l", "__r").agg(F.count(F.lit(1)).alias("__c")))
        per_lhs = pairs.groupBy("__l").agg(
            F.sum("__c").alias("__n"),
            F.max("__c").alias("__keep"),
            F.count(F.lit(1)).alias("__n_rhs"))
        outs.append(per_lhs.agg(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.sum("__n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("__n_rhs") > 1).cast("long"))
            .alias("n_violating_groups"),
            F.sum(F.col("__n") - F.col("__keep"))
            .alias("n_violating_rows"),
            F.round(F.sum("__keep").cast("double")
                    / F.sum("__n").cast("double"), decimals)
            .alias("g3_confidence")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
