"""Uniqueness checks: HLL++ approximate + exact hash group-by.

North-rule ops (BASELINE.json:6): uniqueness of ``clip_id`` via
- ``approx_uniqueness``: HyperLogLog++ (`approx_count_distinct`) — one agg
  pass, constant memory, mergeable across 1000 executors; the cheap gate.
- ``exact_duplicates`` / ``uniqueness_summary``: exact, one shuffle.

Why a single ``groupBy(key).count()`` is already skew-proof HERE: Spark's
hash aggregate does map-side partial aggregation, so a pathologically hot
key emits ONE partial row per map task — the reducer that owns the key
receives at most ``numPartitions`` rows for it, never the raw row stream.
Manual two-phase salting (group on (salt, key), then re-group on key)
pays a second shuffle for nothing when the aggregate is map-combinable
like count/sum. Salting earns its keep only for aggregates without
partial merge (collect_list, exact percentile buffers) or for JOINS on a
hot key — those sit in operators/referential.py and session.py's AQE
skew-join config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_uniqueness(df: DataFrame, key: str, rsd: float = 0.01,
                      partition_cols: list[str] | None = None) -> DataFrame:
    """HLL++ distinct estimate vs row count per partition group."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    ]
    out = df.groupBy(*partition_cols).agg(*aggs) if partition_cols else df.agg(*aggs)
    return out.withColumn(
        "approx_dup_rate",
        F.greatest(F.lit(0.0), (F.col("n_rows") - F.col("approx_distinct"))
                   / F.col("n_rows")),
    )


def exact_duplicates(df: DataFrame, key: str) -> DataFrame:
    """Exact duplicate keys (count > 1): one partial+final hash aggregate.

    Map-side combine bounds each task's output to one row per distinct
    key it saw, so the single shuffle carries partial counts, not rows —
    the plan a 10^12-row clip_id audit wants.
    """
    return (
        df.select(F.col(key))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_summary(df: DataFrame, key: str) -> DataFrame:
    """One-row exact summary: n_rows, n_keys, n_dup_keys, n_dup_rows."""
    counts = (
        df.select(F.col(key))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("n_dup_rows"),
    )
