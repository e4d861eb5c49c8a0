"""Per-partition column statistics — one hash-aggregate pass.

The reference aggregates nothing (one JSON document at a time,
internal/dirtyjson/decoder.go:33-35); these are the north-rule stats
(null-rate, min/max/mean/stddev, quantile sketch) computed the Spark way:
a single ``groupBy(partition_cols).agg(...)`` so Catalyst plans ONE
partial+final hash aggregation — map-side combine means the shuffle carries
only one row per (partition, group), not the data. Scan cost: only the
requested columns are read (column pruning reaches the parquet/Iceberg scan).

At 100 TB: the output is |partitions| rows — tiny; the only shuffle is the
group-by on the partition columns, which is exactly the table's physical
partitioning, so with Iceberg's partition-aligned scan there is effectively
no data movement beyond the combine tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stat_exprs(
    col: str,
    quantiles: tuple[float, ...],
    accuracy: int,
    approx: bool,
) -> list[Column]:
    c = F.col(col)
    exprs = [
        F.count(F.when(c.isNull(), 1)).alias(f"{col}__null_count"),
        F.min(c).alias(f"{col}__min"),
        F.max(c).alias(f"{col}__max"),
        F.avg(c).alias(f"{col}__mean"),
        F.stddev(c).alias(f"{col}__stddev"),
    ]
    if quantiles:
        q = list(quantiles)
        if approx:
            # KLL-style sketch: Spark's approx_percentile is a mergeable
            # quantile sketch — constant memory per group, exact enough for
            # drift gating; the exact variant exists for oracle tests.
            exprs.append(
                F.percentile_approx(c, q, accuracy).alias(f"{col}__quantiles")
            )
        else:
            exprs.append(F.percentile(c, F.lit(q)).alias(f"{col}__quantiles"))
    return exprs


def column_stats(
    df: DataFrame,
    numeric_cols: list[str],
    partition_cols: list[str],
    quantiles: tuple[float, ...] = (0.01, 0.25, 0.5, 0.75, 0.99),
    accuracy: int = 10_000,
    approx: bool = True,
) -> DataFrame:
    """Per-partition stats for each numeric column, one agg pass.

    Output: one row per partition group with ``n_rows`` plus
    ``{col}__{null_count,min,max,mean,stddev,quantiles}`` per column.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for col in numeric_cols:
        aggs.extend(_stat_exprs(col, quantiles, accuracy, approx))
    if partition_cols:
        return df.groupBy(*partition_cols).agg(*aggs)
    return df.agg(*aggs)


def null_rates(df: DataFrame, cols: list[str], partition_cols: list[str]) -> DataFrame:
    """Null-rate per column per partition (separate cheap pass when only
    null-rates are wanted — reads no value bytes thanks to count pushdown)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        (F.count(F.when(F.col(c).isNull(), 1)) / F.count(F.lit(1))).alias(f"{c}__null_rate")
        for c in cols
    ]
    if partition_cols:
        return df.groupBy(*partition_cols).agg(*aggs)
    return df.agg(*aggs)
