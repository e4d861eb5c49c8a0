"""Fuzzy key matching: edit-distance-1 joins via deletion-neighborhood
blocking (the FastSS trick) — referential integrity that survives typos.

An orphan foreign key is often a mangled real key, not a missing row.
Finding its correction with a naive similarity join is O(n·m)
levenshtein — a BroadcastNestedLoopJoin, unrunnable at 10^12 keys. The
deletion-neighborhood identity makes it an EQUALITY join instead:

    lev(s, t) <= 1  ⟹  variants(s) ∩ variants(t) ≠ ∅

where variants(x) = {x} ∪ {x minus one character}. (Substitution at i:
both sides delete i; insertion/deletion: the shorter string is itself a
variant of the longer.) The converse does not hold (shared variants can
come from distance-2 pairs, e.g. transpositions), so candidates get an
exact ``levenshtein`` verify — O(candidates), not O(n·m).

Scale shape: each key explodes into len+1 variants (bounded fan-out),
one shuffle equality join on the variant, pair-distinct, verify filter.
Never a cross join, never a Python stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deletion_variants(c: Column) -> Column:
    """{s} ∪ {s with character i removed} — the edit-distance-1 blocking
    neighborhood, size len+1."""
    n = F.length(c)
    deletions = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, n)))
    return F.array_union(F.array(c), deletions)


def _cap_variant_bucket(df: DataFrame, max_bucket: int) -> DataFrame:
    """Drop variants whose bucket exceeds ``max_bucket`` rows on this
    side. Real corpora have hot variants (zero-padded sequential keys
    share long prefixes, so single-deletion variants collide); a bucket
    of size B on both sides costs B² candidate pairs in the equality
    join. The count window partitions on ``__v`` — the join's own key —
    so the exchange it introduces is the one the join needs anyway."""
    w = Window.partitionBy("__v")
    return (df.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n"))


def fuzzy_match_ed1(refs: DataFrame, canon: DataFrame,
                    ref_col: str, key_col: str,
                    max_bucket: int = 10_000) -> DataFrame:
    """All (ref, key) pairs with levenshtein distance <= 1, via the
    deletion-neighborhood equality join + exact verify. Emits
    (ref_col, key_col, dist).

    ``max_bucket`` caps pathological variant buckets before the
    self-expanding join (mirroring dedup.minhash_lsh_pairs): a dropped
    bucket is a recall (never precision) trade, and at the default cap
    only degenerate near-constant key populations are affected — every
    legitimate typo neighborhood is orders of magnitude smaller."""
    lv = refs.select(ref_col, F.explode(
        deletion_variants(F.col(ref_col))).alias("__v"))
    rv = canon.select(key_col, F.explode(
        deletion_variants(F.col(key_col))).alias("__v"))
    if max_bucket is not None:
        lv = _cap_variant_bucket(lv, max_bucket)
        rv = _cap_variant_bucket(rv, max_bucket)
    pairs = lv.join(rv, "__v").select(ref_col, key_col).distinct()
    return (pairs
            .withColumn("dist",
                        F.levenshtein(F.col(ref_col), F.col(key_col))
                        .cast("long"))
            .filter(F.col("dist") <= 1))


def best_fuzzy_match(refs: DataFrame, canon: DataFrame,
                     ref_col: str, key_col: str,
                     max_bucket: int = 10_000) -> DataFrame:
    """One row per ref: its best (lowest-distance, then lexicographically
    smallest) canonical key within edit distance 1 — the typo-correction
    view of a referential check. Refs with no near key are absent (join
    them back anti-style for the orphan report)."""
    m = fuzzy_match_ed1(refs, canon, ref_col, key_col, max_bucket)
    w = Window.partitionBy(ref_col).orderBy("dist", key_col)
    return (m.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(ref_col, F.col(key_col).alias("matched_key"), "dist"))
