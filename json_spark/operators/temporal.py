"""Temporal joins and rollups the reference engine family lacks natively:
as-of join, range (interval) join, hypertable-style multi-resolution rollup.

All three are built from equality shuffles + windows only — no inequality
join ever reaches the physical plan (Spark would fall back to
BroadcastNestedLoopJoin, which is O(n·m) and unrunnable at 10^12 rows).
Timestamps enter as INTEGER microseconds (callers reduce timestamp columns
via ``timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)``), so
every comparison is exact integer arithmetic and session-timezone-proof.

Scale shapes:
- as-of join     : ONE exchange on the key; union + running ``last(...,
                   ignorenulls)`` window — the carry-forward trick. Never
                   materializes candidate pairs.
- range join     : intervals explode into fixed-width time buckets
                   (bounded fan-out = interval_len/bucket + 1), points map
                   to one bucket, equality join on (key, bucket), exact
                   containment filter. Each qualifying pair appears exactly
                   once (a point lives in exactly one bucket), so no
                   dedup pass is needed.
- time rollup    : raw rows shuffle ONCE into the finest granularity;
                   coarser levels re-aggregate the (tiny) finer aggregate —
                   the continuous-aggregate pattern, where the 1-minute
                   table is ~10^6x smaller than raw at clip scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts: str = "us", tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join: each left row gains the latest right row with
    ``right.ts <= left.ts`` for the same key columns ``on``.

    Implementation is the union + carry-forward window, not a join: tag
    sides, union, sort by (ts, side) inside each key — right rows sort
    BEFORE left rows at equal ts, giving <= semantics — and carry the last
    non-null right payload down with ``last(ignorenulls=True)``. Left rows
    then filter back out with the carried payload attached. One shuffle on
    the key, zero candidate-pair blowup, no inequality join.

    ``tiebreak`` (a right-side column) orders right rows that share the
    same (key, ts) so the carried row is deterministic; pre-deduplicating
    the right side makes it unnecessary.

    Right payload columns (everything except ``on`` + ``ts`` +
    ``tiebreak``) come back under their own names — alias them on the way
    in. They are NULL when no right row precedes the left row.
    """
    lcols = [c for c in left.columns if c not in on and c != ts]
    rcols = [c for c in right.columns
             if c not in on and c != ts and c != tiebreak]
    rv = F.struct(*[F.col(c) for c in rcols])
    rv_type = right.select(rv.alias("__rv")).schema["__rv"].dataType
    tie_type = right.schema[tiebreak].dataType if tiebreak else "int"
    l_tagged = left.select(
        *on, F.col(ts).alias("__ts"), F.lit(1).alias("__is_l"),
        F.lit(None).cast(tie_type).alias("__tie"),
        *lcols,
        F.lit(None).cast(rv_type).alias("__rv"))
    r_tagged = right.select(
        *on, F.col(ts).alias("__ts"), F.lit(0).alias("__is_l"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast(tie_type))
        .alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        rv.alias("__rv"))
    w = (Window.partitionBy(*on)
         .orderBy("__ts", "__is_l", F.col("__tie").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l_tagged.unionByName(r_tagged)
    carried = u.withColumn("__rvc", F.last("__rv", ignorenulls=True).over(w))
    return (carried.filter(F.col("__is_l") == 1)
            .select(*on, F.col("__ts").alias(ts), *lcols,
                    *[F.col(f"__rvc.{c}").alias(c) for c in rcols]))


def range_join_bucketed(points: DataFrame, intervals: DataFrame,
                        on: list[str], point_us: str = "us",
                        start_us: str = "start_us", end_us: str = "end_us",
                        bucket_us: int = 600_000_000) -> DataFrame:
    """Interval containment join (``start_us <= point < end_us``, same
    key) as an EQUALITY join: intervals explode into the time buckets they
    overlap, points map into their single bucket, join on (key, bucket),
    then filter exact containment.

    Fan-out per interval is ``(end-start)/bucket_us + 1`` — pick
    ``bucket_us`` near the typical interval length so it stays ~2. Because
    a point belongs to exactly one bucket and an interval emits each of
    its buckets once, a qualifying (point, interval) pair survives exactly
    once: no dedup, no cartesian, no BroadcastNestedLoopJoin.
    """
    b = F.lit(int(bucket_us))
    p = points.withColumn("__b", F.floor(F.col(point_us) / b).cast("long"))
    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(F.floor(F.col(start_us) / b).cast("long"),
                             F.floor((F.col(end_us) - 1) / b).cast("long"))))
    return (p.join(iv, [*on, "__b"])
            .filter((F.col(point_us) >= F.col(start_us))
                    & (F.col(point_us) < F.col(end_us)))
            .drop("__b"))


def time_rollup(df: DataFrame, ts_us: str, group_cols: list[str],
                value_col: str, levels_us: list[int]) -> DataFrame:
    """Hypertable-style multi-resolution rollup: (count, sum) per time
    bucket at every granularity in ``levels_us`` (ascending; each level
    must divide the next so coarse buckets re-aggregate exactly from fine
    ones).

    Raw rows are shuffled ONCE — into the finest buckets; every coarser
    level aggregates the previous level's output, which is orders of
    magnitude smaller than the input. Emits
    (level_us, bucket_us, *group_cols, n, sum_value).
    """
    for fine, coarse in zip(levels_us, levels_us[1:]):
        if coarse % fine:
            raise ValueError(f"level {coarse} not a multiple of {fine}")
    finest = levels_us[0]
    cur = (df.groupBy(
        (F.floor(F.col(ts_us) / F.lit(finest)).cast("long") * finest)
        .alias("bucket_us"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(value_col).alias("sum_value")))
    out = cur.withColumn("level_us", F.lit(finest).cast("long"))
    for lv in levels_us[1:]:
        cur = (cur.groupBy(
            (F.floor(F.col("bucket_us") / F.lit(lv)).cast("long") * lv)
            .alias("bucket_us"), *group_cols)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value").alias("sum_value")))
        out = out.unionByName(
            cur.withColumn("level_us", F.lit(lv).cast("long")))
    return out.select("level_us", "bucket_us", *group_cols, "n", "sum_value")


def epoch_us(ts_col: str) -> Column:
    """Session-TZ-proof integer microseconds for a TIMESTAMP_NTZ column
    (== DuckDB ``epoch_us(ts)``)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"{ts_col})")


def coverage_gaps(df: DataFrame, group_cols: list[str], bucket_col: str,
                  yellow_ratio: float = 0.99) -> DataFrame:
    """Temporal-completeness check: per group, how many expected time
    buckets (the table's global min..max bucket span) have NO rows.

    The classic "did a feed go dark for a day?" validation — a missing
    (group, bucket) cell is invisible to every per-row check because no
    row exists to fail. ``bucket_col`` is an integer bucket id (e.g.
    epoch-days from :func:`epoch_us` DIV 86400000000).

    Scale shape: the corpus collapses to observed (group, bucket) pairs
    in one map-combinable distinct-agg; the expected grid is
    |groups| x |buckets| built by exploding ``sequence`` over the
    global span (metadata-sized), anti-joined against observed with the
    observed side's per-group counts broadcast back. No corpus re-scan,
    no window.
    """
    observed = (df.groupBy(*group_cols,
                           F.col(bucket_col).cast("long").alias("__b"))
                .agg(F.count(F.lit(1)).alias("__n")))
    span = observed.agg(F.min("__b").alias("__lo"),
                        F.max("__b").alias("__hi"))
    per_group = observed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets_observed"))
    grid = (per_group.crossJoin(F.broadcast(span))
            .withColumn("n_buckets_expected",
                        (F.col("__hi") - F.col("__lo") + 1)))
    cover = grid.select(
        *group_cols, "n_buckets_expected", "n_buckets_observed",
        (F.col("n_buckets_expected") - F.col("n_buckets_observed"))
        .alias("n_gaps"),
        F.round(F.col("n_buckets_observed")
                / F.col("n_buckets_expected"), 6).alias("coverage"),
    )
    return cover.withColumn(
        "verdict",
        F.when(F.col("coverage") >= 1.0, "GREEN")
        .when(F.col("coverage") >= F.lit(yellow_ratio), "YELLOW")
        .otherwise("RED"))


def sequence_inversions(df: DataFrame, key_col: str, order_col: str,
                        ts_col: str) -> DataFrame:
    """Ordering-integrity check: per key, count adjacent pairs (in
    ``order_col`` order) whose ``ts_col`` goes BACKWARD — sequence
    numbers and event times disagree, the classic clock-skew /
    out-of-order-ingest detector.

    One corpus shuffle (hash on the key for the per-key window); each
    key's rows sort locally, so skew is bounded by the hottest key.
    Output: one corpus-level summary row (n_keys, n_pairs,
    n_inversions, inversion_rate) — per-key detail stays distributed.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    prev_ts = F.lag(ts_col).over(w)
    flagged = df.select(
        key_col,
        F.when(prev_ts.isNotNull(), 1).otherwise(0).alias("__pair"),
        F.when(prev_ts.isNotNull()
               & (F.col(ts_col) < prev_ts), 1).otherwise(0).alias("__inv"),
    )
    return flagged.agg(
        F.countDistinct(key_col).alias("n_keys"),
        F.sum("__pair").alias("n_pairs"),
        F.sum("__inv").alias("n_inversions"),
        F.round(F.sum("__inv") / F.sum("__pair"), 6)
        .alias("inversion_rate"),
    )


def autocorrelation(df: DataFrame, ts_col: str,
                    lags: tuple[int, ...] = (1, 2, 3),
                    bucket_s: int = 60) -> DataFrame:
    """Lag-k autocorrelation of per-bucket event counts — the
    periodicity/seasonality profile of an ingest feed. A healthy
    continuous feed decorrelates smoothly; a batch-loaded feed shows
    spikes at the batch period, and a duplicated-window incident shows
    as an anomalous positive lobe. Complements coverage_gaps (which
    sees silence) by seeing *rhythm*.

    Counts are taken on the DENSE bucket grid over the table's span
    (missing buckets count 0 — dropping them would bias r toward the
    busy regime), buckets are session-TZ-proof integer ids
    (:func:`epoch_us` DIV bucket). Per lag k the output row carries the
    exact integer sums (n_pairs, Σx, Σy, Σxy) plus Pearson r computed
    from those sums in one closed-form expression — integer-exact
    inputs, so an independent SQL twin reproduces r to the rounded
    digit with no summation-order sensitivity.

    Scale shape: the corpus collapses in ONE map-combinable bucket
    count aggregate; the dense grid (explode(sequence) over the 1-row
    span) and the per-lag self-join are |buckets|-sized metadata work,
    never corpus-sized. No windows, no corpus re-scan.
    """
    us = bucket_s * 1_000_000
    obs = (df.select(F.floor(epoch_us(ts_col) / F.lit(us)).cast("long")
                     .alias("__m"))
           .groupBy("__m").agg(F.count(F.lit(1)).alias("__c")))
    span = obs.agg(F.min("__m").alias("__lo"), F.max("__m").alias("__hi"))
    grid = (span.select(F.explode(
        F.sequence(F.col("__lo"), F.col("__hi"))).alias("__m"))
        .join(obs, "__m", "left")
        .select("__m", F.coalesce("__c", F.lit(0)).alias("__c")))
    lagdf = (grid.sparkSession.range(1)
             .select(F.explode(F.array(
                 *[F.lit(int(k)) for k in lags])).alias("lag")))
    a = grid.select(F.col("__m").alias("__ma"), F.col("__c").alias("__x"))
    b = grid.select(F.col("__m").alias("__mb"), F.col("__c").alias("__y"))
    pairs = (a.join(F.broadcast(lagdf))
             .join(b, F.col("__mb") == F.col("__ma") + F.col("lag")))
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("__x").alias("sum_x"),
        F.sum("__y").alias("sum_y"),
        F.sum(F.col("__x") * F.col("__y")).alias("sum_xy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"))
    n, sx, sy = F.col("n_pairs"), F.col("sum_x"), F.col("sum_y")
    num = n * F.col("sum_xy") - sx * sy
    den = (F.sqrt((n * F.col("__sxx") - sx * sx).cast("double"))
           * F.sqrt((n * F.col("__syy") - sy * sy).cast("double")))
    # a constant count series has zero variance on one side — r is
    # undefined there, reported as null rather than a NaN from 0/0
    r = F.when(den != 0.0, F.round(num.cast("double") / den, 6))
    return agg.select("lag", "n_pairs", "sum_x", "sum_y", "sum_xy",
                      r.alias("autocorr"))


def freshness(df: DataFrame, ts_col: str, group_cols: list[str],
              as_of: str, yellow_minutes: int = 60,
              red_minutes: int = 24 * 60) -> DataFrame:
    """Data-freshness check: per group, how stale is the newest row
    relative to ``as_of`` (the run's pinned reference instant — passed
    in, never read from the wall clock, so runs are reproducible and
    resumable). The ops-monitor complement of coverage_gaps: gaps see
    holes in the PAST, freshness sees a feed that silently stopped —
    the most common production data incident there is.

    Emits per group: n_rows, newest (the max event time), lag_minutes
    (integer, floor), and a GREEN/YELLOW/RED verdict against the two
    staleness bands. Lag arithmetic is integer microseconds
    (:func:`epoch_us`, session-TZ-proof), so an independent SQL twin
    reproduces every value exactly.

    Scale shape: ONE map-combinable max/count aggregate touches the
    corpus; everything after runs on the |groups|-row result. At 10^12
    rows this is the cheapest check in the suite.
    """
    as_of_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"TIMESTAMP_NTZ '{as_of}')")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(ts_col).alias("newest"),
        F.max(epoch_us(ts_col)).alias("__mx_us"))
    lag_min = F.floor((as_of_us - F.col("__mx_us")) / F.lit(60_000_000)) \
        .cast("long")
    return agg.select(
        *group_cols, "n_rows", "newest",
        lag_min.alias("lag_minutes"),
        # a group whose every timestamp is null has no newest row at
        # all — that feed is certainly not fresh (RED, not a silent
        # GREEN from a null comparison)
        F.when(lag_min.isNull(), "RED")
        .when(lag_min >= red_minutes, "RED")
        .when(lag_min >= yellow_minutes, "YELLOW")
        .otherwise("GREEN").alias("verdict"))
