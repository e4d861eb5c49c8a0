"""Change-point detection: WHEN did the feed drift, not just that it did.

The drift triad (PSI / KS / Wasserstein, operators/drift.py) answers "do
these two samples come from the same distribution?"; a production monitor
also needs the localization question — "the metric moved: on which ingest
day?" — so the bad deploy / upstream schema change can be found in the
release log. The classic offline answer is the single mean-shift
change-point: the split point that maximizes the standardized two-sample
mean difference

    stat(d) = |mean(<=d) - mean(>d)| * sqrt(n1 * n2 / N)

(the CUSUM / likelihood-ratio statistic for a mean change with known
variance, up to the constant sigma; see Page 1954 / Hinkley 1970 — public
textbook material).

Scale shape: the corpus is touched by exactly ONE map-combinable
aggregate to (group, day, n, sum) — days x groups rows. Every cumulative
sum, split statistic, and the argmax window then run on that metadata-
sized frame, partitioned by group (never a keyless global window). At
10^12 rows this is the same "aggregate first, analyze the aggregate"
discipline as drift_rolling / partition_anomaly.

Cross-engine determinism: the statistic uses only IEEE-exact operations
(add / subtract / multiply / divide / sqrt / abs are all correctly
rounded by both engines' doubles), so the argmax day is bit-identical in
the DuckDB oracle; ties break on the earlier day. Day buckets are
epoch-microseconds DIV 86_400_000_000 on a TIMESTAMP_NTZ column —
session-timezone-proof (same idiom as operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .temporal import epoch_us

US_PER_DAY = 86_400_000_000


def daily_mean_states(df: DataFrame, group_cols: list[str], ts_col: str,
                      value_col: str) -> DataFrame:
    """The one corpus-sized pass: (group, day) -> (n, sum_v)."""
    day = (epoch_us(ts_col) / F.lit(US_PER_DAY)).cast("long")
    return (df
            .select(*group_cols, day.alias("day"),
                    F.col(value_col).cast("double").alias("__v"))
            .groupBy(*group_cols, "day")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("__v").alias("sum_v")))


def mean_shift_changepoint(df: DataFrame, group_cols: list[str],
                           ts_col: str, value_col: str,
                           yellow: float = 2.0,
                           red: float = 4.0) -> DataFrame:
    """Per group, the day boundary that maximizes the standardized
    mean-shift statistic, with the before/after means and a verdict.

    ``stat`` is in units of sigma * sqrt(1) for unit-variance data; the
    default bands (YELLOW at 2, RED at 4) read it as a z-like score —
    callers monitoring a metric with known scale pass their own bands.
    Only split points with at least one day on each side are candidates
    (the degenerate all-on-one-side split has no "after" mean).

    Output: group_cols..., split_day, n_before, n_after, mean_before,
    mean_after, shift_stat, verdict — one row per group.
    """
    daily = daily_mean_states(df, group_cols, ts_col, value_col)

    wcum = (Window.partitionBy(*group_cols).orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = (Window.partitionBy(*group_cols)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    cum = (daily
           .withColumn("cn", F.sum("n").over(wcum))
           .withColumn("cs", F.sum("sum_v").over(wcum))
           .withColumn("tn", F.sum("n").over(wall))
           .withColumn("ts_", F.sum("sum_v").over(wall)))

    n1, s1 = F.col("cn"), F.col("cs")
    n2 = F.col("tn") - n1
    s2 = F.col("ts_") - s1
    stat = (F.abs(s1 / n1 - s2 / n2)
            * F.sqrt(n1.cast("double") * n2.cast("double")
                     / F.col("tn").cast("double")))
    cand = (cum.filter(n2 > 0)
            .withColumn("__stat", stat))

    wbest = Window.partitionBy(*group_cols).orderBy(
        F.desc("__stat"), F.asc("day"))
    best = (cand.withColumn("__rk", F.row_number().over(wbest))
            .filter(F.col("__rk") == 1))

    v = (F.when(F.col("__stat") >= red, "RED")
         .when(F.col("__stat") >= yellow, "YELLOW")
         .otherwise("GREEN"))
    return best.select(
        *group_cols,
        F.col("day").alias("split_day"),
        F.col("cn").alias("n_before"),
        (F.col("tn") - F.col("cn")).alias("n_after"),
        F.round(s1 / n1, 6).alias("mean_before"),
        F.round(s2 / n2, 6).alias("mean_after"),
        F.round(F.col("__stat"), 6).alias("shift_stat"),
        v.alias("verdict"))
