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


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column value-distribution profile: (col_name, n_rows, n_null,
    n_distinct, top_share, entropy_bits) — the at-a-glance table a
    validation run prints before anything else. ``top_share`` is the most
    frequent value's fraction (a 0.99 means the column is near-constant);
    ``entropy_bits`` is Shannon entropy of the value distribution
    (0 for constants, log2(n_distinct) for uniform).

    One pass per column: groupBy(value) hash aggregate (map-side
    combine), then the entropy/top-share reduce over the value-count
    table, which is cardinality-sized. NULL is profiled as its own
    value for the counts but excluded from entropy/top_share.
    """
    from pyspark.sql import Window

    outs = []
    for c in cols:
        vc = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__n"))
        # the share denominator is itself an aggregate of the count table;
        # a global window over the CARDINALITY-sized frame (not the raw
        # rows) keeps everything one job without nesting aggregates
        w = Window.partitionBy()
        nn = F.when(F.col("__v").isNotNull(), F.col("__n")).otherwise(
            F.lit(0))
        shared = vc.withColumn("__nn_tot", F.sum(nn).over(w))
        p = F.col("__n") / F.col("__nn_tot")
        ent_term = F.when(F.col("__v").isNotNull(),
                          -p * F.log2(p)).otherwise(F.lit(0.0))
        outs.append(shared.agg(
            F.lit(c).alias("col_name"),
            F.sum("__n").alias("n_rows"),
            F.sum(F.when(F.col("__v").isNull(), F.col("__n"))
                  .otherwise(F.lit(0))).alias("n_null"),
            F.count(F.when(F.col("__v").isNotNull(), F.lit(1)))
            .alias("n_distinct"),
            F.round(F.max(F.when(F.col("__v").isNotNull(), p)), 6)
            .alias("top_share"),
            F.round(F.sum(ent_term), 6).alias("entropy_bits")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


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
