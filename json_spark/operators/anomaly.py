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


def robust_line_conformance(df: DataFrame, x_col: str, y_col: str,
                            group_cols: list[str],
                            abs_threshold: int = 1000,
                            yellow_rate: float = 0.005) -> DataFrame:
    """Robust linear-model conformance: per group, learn the line
    y ≈ a + b·x with MEDIAN-based coefficients and flag rows whose
    residual exceeds ``abs_threshold`` — the "does this column obey the
    size law the rest of the group obeys" check (payload bytes vs
    declared samples, token counts vs char counts). Ordinary least
    squares is useless here: the liars the check exists to find drag
    the fit toward themselves (breakdown point 0%); the median slope
    b = med(y/x) and median intercept a = med(y − b·x) ignore up to
    50% contamination, so the planted liars land OUTSIDE the line
    instead of bending it.

    Everything runs in 1e-4 fixed point (the crest-factor idiom,
    operators/snr.py): ratio_fp = 10000·y DIV x, residual
    e = 10000·y − b_fp·x, both exact int64, and both medians are the
    exact k-th smallest (k = ceil(n/2), drift.py:quantiles_from_counts)
    — no float enters until the final report, so an independent SQL
    twin reproduces every coefficient and count bit-for-bit.

    Scale shape: the corpus collapses into (group, ratio_fp) /
    (group, e) value-count tables whose cardinality is bounded by the
    metadata domain (distinct (x, y) pairs), the quantile windows run
    on those tables, and the |groups|-row coefficient frames broadcast
    back — three metadata-only map passes, no corpus window, no
    corpus-sized shuffle beyond the map-combinable aggregates.

    Output per group: n_rows, slope (b_fp/10⁴), intercept (a_fp/10⁴),
    n_outliers, outlier_rate, verdict (YELLOW above ``yellow_rate``).
    """
    from .drift import quantile_digest_counts, quantiles_from_counts
    g = list(group_cols)
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    base = (df.filter(x.isNotNull() & y.isNotNull() & (x > 0))
            .select(*g, x.alias("__x"), y.alias("__y")))
    ratio = base.withColumn(
        "__r", F.expr("(10000 * __y) DIV __x"))
    b = (quantiles_from_counts(
        quantile_digest_counts(ratio, "__r", g), "__r", g)
        .select(*g, F.col("q50").alias("__bfp")))
    with_b = base.join(F.broadcast(b), g)
    resid0 = with_b.withColumn(
        "__e", F.lit(10000) * F.col("__y") - F.col("__bfp") * F.col("__x"))
    a = (quantiles_from_counts(
        quantile_digest_counts(resid0, "__e", g), "__e", g)
        .select(*g, F.col("q50").alias("__afp")))
    scored = resid0.join(F.broadcast(a), g).withColumn(
        "__out",
        (F.abs(F.col("__e") - F.col("__afp"))
         > F.lit(10000) * F.lit(int(abs_threshold))).cast("long"))
    rate = F.col("n_outliers") / F.col("n_rows")
    return (scored.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("__bfp").alias("__b"),
        F.max("__afp").alias("__a"),
        F.sum("__out").alias("n_outliers"))
        .select(*g, "n_rows",
                F.round(F.col("__b") / 1e4, 4).alias("slope"),
                F.round(F.col("__a") / 1e4, 2).alias("intercept"),
                "n_outliers",
                F.round(rate, 6).alias("outlier_rate"),
                F.when(rate > yellow_rate, "YELLOW")
                .otherwise("GREEN").alias("verdict")))


def seasonal_volume_anomaly(df: DataFrame, ts_col: str,
                            k: int = 3) -> DataFrame:
    """Seasonally-adjusted volume anomaly: judge each DAY's row count
    against the median of ITS OWN WEEKDAY — "this Monday is unlike
    Mondays" — so weekly rhythm (weekend troughs, Monday spikes) stops
    masquerading as incidents and a quiet-day outage stops hiding
    inside the weekly average. The un-adjusted twin (partition_anomaly
    on daily counts) flags every weekend of a weekday-heavy feed.

    Entirely INTEGER arithmetic: day counts, per-weekday median and MAD
    as exact k-th smallest (k = ceil(n/2)) over each weekday's count
    set, and the flag |n − med| > k·MAD — no float anywhere, so an
    independent SQL twin reproduces every row bit-for-bit. Weekday from
    epoch-days % 7 (TZ-proof; 1970-01-01 was a Thursday, the label is
    the residue, not a locale name). Zero-MAD weekdays (perfectly
    regular) flag ANY deviation.

    Scale shape: the corpus collapses in ONE map-combinable (day)
    count; weekday medians/MADs run on the |days|-row table with
    windows partitioned by weekday (never global). Emits one row per
    day: n_rows, weekday, med_dow, mad_dow, anomalous.
    """
    from .drift import quantile_digest_counts, quantiles_from_counts
    days = (df.select(F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"{ts_col}) DIV 86400000000").alias("day"))
        .groupBy("day").agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("dow", F.pmod(F.col("day"), F.lit(7))))
    med = (quantiles_from_counts(
        quantile_digest_counts(days, "n_rows", ["dow"]), "n_rows", ["dow"])
        .select("dow", F.col("q50").alias("med_dow")))
    d2 = days.join(F.broadcast(med), "dow").withColumn(
        "__dev", F.abs(F.col("n_rows") - F.col("med_dow")))
    mad = (quantiles_from_counts(
        quantile_digest_counts(d2, "__dev", ["dow"]), "__dev", ["dow"])
        .select("dow", F.col("q50").alias("mad_dow")))
    return (d2.join(F.broadcast(mad), "dow")
            .select("day", "dow", "n_rows", "med_dow", "mad_dow",
                    (F.col("__dev") > F.lit(int(k)) * F.col("mad_dow"))
                    .alias("anomalous")))
