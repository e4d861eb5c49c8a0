"""Functional-dependency profiling: does column A determine column B?

The schema-inference side of validation (Metanome-style FD checking,
scoped to candidate pairs): for each declared candidate ``lhs → rhs``
report how many lhs groups exist, how many violate (|distinct rhs| > 1),
and the worst violation width. A clean key column shows up as
0 violations with rhs = anything; a "should-be-determined" attribute
that drifts (same clip_id, two sample rates) shows up immediately.

Scale shape: ONE pass per candidate — groupBy(lhs) with
``countDistinct(rhs)`` runs as Spark's two-phase distinct aggregate
(partial distinct map-side, so the shuffle carries (lhs, rhs) pairs
deduplicated per task, never raw rows). Candidates are unioned into one
result frame; each is an independent branch of the same scan when the
source caches, or independent pruned scans otherwise — either way no
candidate pays for another's columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_profile(df: DataFrame,
               candidates: list[tuple[str, str]]) -> DataFrame:
    """One row per candidate FD: (lhs, rhs, n_groups, n_violating,
    max_distinct, holds)."""
    outs = []
    for lhs, rhs in candidates:
        g = (df.select(lhs, rhs)
             .groupBy(lhs)
             .agg(F.countDistinct(rhs).alias("__d")))
        outs.append(g.agg(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("__d") > 1).cast("long")).alias("n_violating"),
            F.max("__d").alias("max_distinct"),
            (F.max("__d") <= 1).alias("holds")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
