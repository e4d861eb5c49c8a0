"""Cross-partition anomaly detection: robust median/MAD outlier scan.

The suite's per-partition checks judge each partition against FIXED
thresholds; this operator judges partitions against EACH OTHER — the
"one bad ingest shard" detector: a partition whose row count or metric
mean sits far from the fleet's median (in MAD units) is flagged even
when every fixed threshold passes. Median/MAD rather than mean/stddev
so a single corrupted partition cannot drag the baseline toward itself
(breakdown point 50% vs 0%).

Scale shape: the ONLY corpus-sized step is the caller's per-partition
aggregation (map-combinable groupBy). Everything here runs on the
|partitions| x |metrics| long frame — metadata-sized at any corpus
scale (10^12 rows / 10^4 partitions → 10^4-row input) — with broadcast
joins of the per-metric median/MAD (|metrics| rows). No global window,
no corpus re-scan.

Cross-engine determinism: metric values are rounded to 6 dp BEFORE the
median/MAD fold so Spark and an oracle engine derive the robust stats
from bit-identical inputs; Spark's exact ``percentile(x, 0.5)`` and
DuckDB's ``median`` both linearly interpolate (mean of the two middle
values for even n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: scale factor making MAD a consistent sigma estimator for normal data
MAD_SIGMA = 1.4826


def partition_anomaly(parts: DataFrame, partition_col: str,
                      metric_cols: list[str],
                      k_yellow: float = 3.0,
                      k_red: float = 5.0) -> DataFrame:
    """Robust outlier verdicts over a per-partition stats frame.

    ``parts``: one row per partition with numeric ``metric_cols``
    (already aggregated — the corpus never reaches this function).
    Output: one row per (partition, metric) with the metric value, the
    fleet median, MAD, robust z-score ``(x - med) / (1.4826 * MAD)``
    and a GREEN/YELLOW/RED verdict at ``k_yellow``/``k_red`` sigmas.
    A zero-MAD metric (over half the fleet identical) flags ANY
    deviation from the median as RED (z is null — not finite).
    """
    stack_args = ", ".join(
        f"'{m}', round(cast({m} as double), 6)" for m in metric_cols)
    long = parts.selectExpr(
        f"cast({partition_col} as string) AS partition_id",
        f"stack({len(metric_cols)}, {stack_args}) AS (metric, value)",
    )
    med = long.groupBy("metric").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = (long.join(F.broadcast(med), "metric")
           .withColumn("absdev", F.abs(F.col("value") - F.col("med"))))
    mad = dev.groupBy("metric").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad"))
    scored = dev.join(F.broadcast(mad), "metric")
    z = (F.col("value") - F.col("med")) / (F.lit(MAD_SIGMA) * F.col("mad"))
    return scored.select(
        "partition_id", "metric", "value",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        F.when(F.col("mad") > 0, F.round(z, 6)).alias("robust_z"),
        F.when((F.col("mad") == 0) & (F.col("value") != F.col("med")),
               "RED")
        .when(F.col("mad") == 0, "GREEN")
        .when(F.abs(z) > k_red, "RED")
        .when(F.abs(z) > k_yellow, "YELLOW")
        .otherwise("GREEN")
        .alias("verdict"),
    )
