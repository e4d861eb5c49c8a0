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
- ``dup_content_integrity`` — when a KEY appears more than once, do
  the copies actually agree? Per duplicate group, distinct-content /
  distinct-label / distinct-metadata counts and a precedence verdict
  (CONTENT_DIVERGENT > LABEL_DIVERGENT > META_DIVERGENT > IDENTICAL).
  The uniqueness × content cross check: exact dedup says clip_id is
  duplicated; THIS says whether that duplication is a benign re-upload
  (safe to drop either copy) or an id collision carrying two different
  payloads (dropping one silently loses data; keeping both poisons
  training with two targets for one id).
- ``approx_fd``       — the g3 confidence of a functional dependency
  lhs → rhs: the fraction of rows that survive deleting the minimum
  row set that makes the FD exact (per lhs group, keep the majority
  rhs). Complements profiling.fd_profile (binary holds/violating per
  group) with the standard approximate-FD measure, so "clip_id
  determines sr_hz in 99.97% of rows — here is the violating mass"
  becomes a single verdict row.
- ``dup_label_distance`` — the MAGNITUDE of a label disagreement:
  Levenshtein edit distance between the extreme (lexicographic
  min/max) distinct labels of a duplicate-key group. label_conflicts
  says two transcripts disagree; this says whether the disagreement
  is a one-character re-punctuation (keep either copy) or a full
  rewrite (two targets for one input — route to review). The triage
  signal every dedup-resolution pass needs before it picks a winner.

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
- dup_content_integrity digests content map-side (the caller passes a
  digest column, e.g. md5 of the payload — binary bytes never
  shuffle); per-key distinct counts are collect_set sizes whose
  cardinality is bounded by the duplicate multiplicity of that key
  (map-side partial collect_set), so the single key shuffle carries a
  few dozen bytes per row at any corpus size.
- dup_label_distance is one groupBy(key) of map-combinable aggregates
  (count / countDistinct / min / max — never collect_set, so a hot key
  costs O(1) state per partial); the edit distance runs post-agg on
  exactly two bounded strings per surviving key, and only keys with
  >1 distinct label survive the filter — defect-mass-sized output.
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


def dup_content_integrity(df: DataFrame, key_cols: list[str],
                          content_col: str,
                          label_cols: list[str] | None = None,
                          meta_cols: list[str] | None = None) -> DataFrame:
    """Content agreement within duplicate-key groups.

    Exact dedup (uniqueness.py) says a key is duplicated;
    label_conflicts says whether a LABEL disagrees across providers.
    This operator closes the remaining gap — whether the duplicated
    rows' CONTENT agrees — which decides what the duplication *means*:

    - IDENTICAL          : benign re-upload; drop either copy.
    - META_DIVERGENT     : same content + label, metadata disagrees
                           (e.g. one copy lost its dur_ms) — recoverable.
    - LABEL_DIVERGENT    : same content, different label — two targets
                           for one input; poisons training silently.
    - CONTENT_DIVERGENT  : different payload under one id — an id
                           collision; dropping "the duplicate" loses a
                           distinct row. Highest severity, so it wins
                           the precedence chain.

    ``content_col`` is a digest the CALLER computes map-side (md5 of the
    payload bytes, a PCM digest, a row fingerprint) so the binary column
    never shuffles — only digests and the key do. Per-key distinct
    counts are ``collect_set`` sizes: the set cardinality is bounded by
    the key's duplicate multiplicity (tiny by definition — a key
    duplicated 10^6 times is a different defect, caught by
    uniqueness_summary long before this runs), and partial collect_set
    merges map-side. Nulls count as their own value via a sentinel
    (losing a value IS a divergence; collect_set alone would drop it).

    One key shuffle; output = one row per duplicate key.
    """

    def _sent(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit("<null>"))

    def _ndistinct(cols: list[str]) -> Column:
        if not cols:
            return F.max(F.lit(1))
        sizes = [F.size(F.collect_set(_sent(c))) for c in cols]
        return F.greatest(*sizes) if len(sizes) > 1 else sizes[0]

    g = (df.groupBy(*[F.col(k) for k in key_cols])
         .agg(F.count(F.lit(1)).alias("n_copies"),
              F.size(F.collect_set(_sent(content_col))).alias("n_content"),
              _ndistinct(list(label_cols or [])).alias("n_label"),
              _ndistinct(list(meta_cols or [])).alias("n_meta"))
         .where(F.col("n_copies") > 1))
    verdict = (F.when(F.col("n_content") > 1, F.lit("CONTENT_DIVERGENT"))
               .when(F.col("n_label") > 1, F.lit("LABEL_DIVERGENT"))
               .when(F.col("n_meta") > 1, F.lit("META_DIVERGENT"))
               .otherwise(F.lit("IDENTICAL")))
    return g.withColumn("verdict", verdict)


def dup_label_distance(df: DataFrame, key_cols: list[str],
                       label_col: str) -> DataFrame:
    """Edit-distance magnitude of label disagreement within duplicate-key
    groups: for every key whose copies carry >1 distinct non-null label,
    the Levenshtein distance between the lexicographic min and max label
    (for n_labels == 2 that IS the conflicting pair; for more it is the
    extreme representative span). dup_content_integrity says copies
    DISAGREE; this says by HOW MUCH — distance 1–2 is a typo fix or
    re-punctuation where either copy trains fine, distance ≈ len is a
    rewrite that poisons training with two targets for one input.

    Null labels are excluded (a null-vs-value divergence is a PRESENCE
    defect, dup_content_integrity's verdict — there is no edit distance
    to a missing string).

    Output per surviving key: n_copies, n_labels, edit_distance,
    rel_distance (distance / longer label length, rounded to 6).

    Scale shape: one key shuffle of map-combinable aggregates (count /
    countDistinct / min / max — O(1) partial state even for a hot key,
    never a collect_set); levenshtein runs post-agg on exactly two
    bounded strings per key, and the n_labels > 1 filter shrinks the
    output to defect mass before anything downstream sees it.
    """
    g = (df.groupBy(*[F.col(k) for k in key_cols])
         .agg(F.count(F.lit(1)).alias("n_copies"),
              F.countDistinct(F.col(label_col)).alias("n_labels"),
              F.min(F.col(label_col)).alias("__lo"),
              F.max(F.col(label_col)).alias("__hi"))
         .where(F.col("n_labels") > 1))
    return (g.withColumn("edit_distance", F.levenshtein("__lo", "__hi"))
            .withColumn("rel_distance",
                        F.round(F.col("edit_distance") /
                                F.greatest(F.length("__lo"),
                                           F.length("__hi")), 6))
            .drop("__lo", "__hi"))


def agg_reconciliation(parent: DataFrame, child: DataFrame,
                       parent_key: str, parent_val: str,
                       child_val: str, child_key: str | None = None,
                       rel_tolerance: float = 0.05) -> DataFrame:
    """Cross-table AGGREGATE reconciliation: does the parent's declared
    total equal the sum of its children — order headers vs their line
    items, a manifest's claimed byte counts vs the landed shards, a
    daily rollup vs its raw feed. Referential checks see missing KEYS;
    this sees present keys whose NUMBERS disagree — the silent
    double-ingest / partial-load / currency-mangled failure class no
    row-level rule can catch.

    Per parent key: MATCHED (|parent − Σchild| / |parent| within
    ``rel_tolerance``), MISMATCHED, or CHILDLESS (no child rows at all
    — reported separately because "zero lines" and "wrong total" are
    different incidents). Values are summed as DECIMAL(18,2) — exact
    and ADDITION-ORDER-INVARIANT, so an independent engine classifies
    every boundary row identically (float sums would make near-tolerance
    keys engine-dependent). Output is ONE summary row: key counts per
    class, rates, the worst relative delta, and a verdict (RED when
    mismatches exceed 1%, YELLOW when any mismatch or childless parent
    exists).

    Scale shape: the child collapses in a map-combinable per-key sum
    BEFORE the join, so the (unavoidable, correct) key shuffle carries
    one row per key per side — never raw child rows; the summary is a
    second map-combinable 1-row aggregate. No windows, no broadcast of
    a corpus-sized side (AQE may still broadcast a small parent).
    """
    ck = child_key or parent_key
    csum = (child.groupBy(F.col(ck).alias("__k"))
            .agg(F.sum(F.col(child_val).cast("decimal(18,2)"))
                 .alias("__c")))
    p = parent.select(F.col(parent_key).alias("__k"),
                      F.col(parent_val).cast("decimal(18,2)").alias("__p"))
    j = p.join(csum, "__k", "left")
    childless = F.col("__c").isNull()
    delta = F.abs(F.col("__p") - F.col("__c"))
    # a zero-valued parent has no defined relative delta (and ANSI
    # decimal division would raise): it matches iff the child sum is
    # exactly zero too, and stays out of max_rel_delta
    rel = F.when(F.abs(F.col("__p")) > 0,
                 (delta / F.abs(F.col("__p"))).cast("double"))
    mismatched = ~childless & F.coalesce(rel > rel_tolerance,
                                         delta > 0)
    agg = j.agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.sum(childless.cast("long")).alias("n_childless"),
        F.sum(mismatched.cast("long")).alias("n_mismatched"),
        F.max(F.when(~childless, F.round(rel, 6))).alias("max_rel_delta"))
    matched = (F.col("n_parents") - F.col("n_childless")
               - F.col("n_mismatched"))
    mis_rate = F.col("n_mismatched") / F.col("n_parents")
    return agg.select(
        "n_parents",
        matched.alias("n_matched"),
        "n_mismatched", "n_childless",
        F.round(mis_rate, 6).alias("mismatch_rate"),
        "max_rel_delta",
        F.when(mis_rate > 0.01, "RED")
        .when((F.col("n_mismatched") > 0) | (F.col("n_childless") > 0),
              "YELLOW")
        .otherwise("GREEN").alias("verdict"))
