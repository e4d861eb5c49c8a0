"""Uniqueness checks: HLL++ approximate + exact two-phase salted group-by.

North-rule ops (BASELINE.json:6): uniqueness of ``clip_id`` via
- ``approx_uniqueness``: HyperLogLog++ (`approx_count_distinct`) — one agg
  pass, constant memory, mergeable across 1000 executors; the cheap gate.
- ``exact_duplicates`` / ``uniqueness_summary``: exact, skew-proof.

Why two-phase salting: a naive ``groupBy(key).count()`` shuffles every row
to the reducer that owns its key. When one key is pathologically hot (the
reference fixture plants a 70% codec; real clip_id dups cluster too), one
reducer gets the world. Phase 1 groups on ``(salt, key)`` where
``salt = pmod(hash(key, seed), S)`` — wait, salting the KEY ITSELF only
helps when the same key appears many times; we salt on a row-hash so each
hot key's rows spread over S reducers and each emits a partial count;
phase 2 re-groups the ≤S partial rows per key. For mostly-unique keys AQE
just coalesces the tiny phase-2 shuffle.
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


def exact_duplicates(df: DataFrame, key: str, salt_buckets: int = 64) -> DataFrame:
    """Exact duplicate keys: two-phase salted aggregation.

    Phase 1: ``groupBy(salt, key).count()`` — the salt is derived from a
    row-unique expression so a hot key fans out over ``salt_buckets``
    reducers (map-side combine shrinks each partial to one row per
    (salt, key) per task). Phase 2: ``groupBy(key).sum(partial)`` over at
    most ``salt_buckets`` rows per key. Returns keys with count > 1.
    """
    salted = df.select(
        F.col(key),
        (F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))).alias("__salt"),
    )
    phase1 = salted.groupBy("__salt", key).agg(F.count(F.lit(1)).alias("__partial"))
    phase2 = (
        phase1.groupBy(key)
        .agg(F.sum("__partial").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
    return phase2


def uniqueness_summary(df: DataFrame, key: str, salt_buckets: int = 64) -> DataFrame:
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
