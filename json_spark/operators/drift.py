"""Distribution-drift checks: histograms → PSI and two-sample KS.

North-rule ops (BASELINE.json:6): drift of sr_hz / dur_ms / codec
distributions per partition vs a baseline-stats table.

Scale shape: one aggregation reduces the raw table to
|partitions| x |buckets| rows (tiny), then PSI/KS are pure Column
arithmetic on the joined histogram tables — no second pass over the data,
no Python. This is the only sane layout at 100 TB: the expensive thing
(the scan) happens exactly once and everything downstream is O(buckets).

- PSI: sum over buckets of (p - q) * ln(p / q), with epsilon-clamped
  shares so empty buckets don't blow up.
- KS statistic: max over buckets of |ECDF_p - ECDF_q| computed with a
  running-sum window over the bucket axis (well-defined for binned data;
  exact KS on raw samples is not computable without a full sort, and the
  binned statistic converges to it as buckets grow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6


def _with_share(counts: DataFrame, keys: list[str]) -> DataFrame:
    """share = n / Σn within each key group (global when no keys).

    The count table is bucket-sized (|keys|×nbins rows) so ANY plan is
    cheap — but the keyless ``Window.partitionBy()`` spelling compiles
    to a single-partition WindowExec (Spark warns loudly), while a
    1-row broadcast-total join keeps the plan exchange-clean and the
    explain audit free of degenerate window nodes at every scale.
    """
    if keys:
        w = Window.partitionBy(*keys)
        return counts.withColumn("share", F.col("n") / F.sum("n").over(w))
    total = counts.agg(F.sum("n").alias("__total"))
    return (counts.join(F.broadcast(total))
            .withColumn("share", F.col("n") / F.col("__total"))
            .drop("__total"))


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram: bucket index + count (+ share within group).

    Fixed (lo, hi) comes from the baseline-stats table so baseline and
    current bucket edges are identical — a drift check against shifting
    edges is meaningless. Out-of-range values clamp to the edge buckets.
    """
    width = (hi - lo) / nbins
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(width))),
    ).cast("int").alias("bucket")
    keys = list(group_cols or [])
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, bucket)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _with_share(counts, keys)


def categorical_histogram(df: DataFrame, col: str,
                          group_cols: list[str] | None = None) -> DataFrame:
    """Category share table (for codec drift)."""
    keys = list(group_cols or [])
    counts = df.groupBy(*keys, F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return _with_share(counts, keys)


def psi(current: DataFrame, baseline: DataFrame,
        on: list[str], group_cols: list[str] | None = None) -> DataFrame:
    """Population Stability Index between two share tables.

    ``on``: the bucket/category key columns. Full outer join so buckets
    present on one side only still contribute (epsilon-clamped).
    Conventional gates: <0.1 stable, 0.1-0.25 moderate, >0.25 drifted.
    """
    keys = list(group_cols or [])
    cur = current.select(*keys, *on, F.col("share").alias("p"))
    base = baseline.select(*on, F.col("share").alias("q"))
    # No broadcast hint: Spark cannot build-side a full outer join (the
    # hint is ignored with a WARN); both sides are bucket-sized aggregates
    # so the shuffle is over dozens of rows regardless of input scale.
    j = cur.join(base, on, "full_outer").fillna({"p": 0.0, "q": 0.0})
    p = F.greatest(F.col("p"), F.lit(EPS))
    q = F.greatest(F.col("q"), F.lit(EPS))
    term = (p - q) * F.log(p / q)
    if keys:
        return j.groupBy(*keys).agg(F.sum(term).alias("psi"))
    return j.agg(F.sum(term).alias("psi"))


def rolling_psi(df: DataFrame, bucket: "F.Column", window_col: "F.Column",
                nbins: int) -> DataFrame:
    """PSI of every time window against the all-data baseline, from ONE
    scan of the input.

    The naive layout (histogram per window, re-aggregate a baseline,
    cross-join the day grid, join shares back) references the histogram
    three times — three full scans at 10^12 rows unless you cache. This
    version never re-references the scan lineage: one (window, bucket)
    aggregate, then a per-window bucket→count map (``map_from_entries``)
    exploded over the FULL 0..nbins-1 grid, so windows that miss a bucket
    get an explicit zero row (their baseline mass must still count toward
    drift — dropping absent buckets understates PSI exactly where drift
    is worst). Per-window shares, baseline shares, and the final PSI are
    windows + an aggregate over the |windows|×|nbins| grid — hundreds of
    rows, regardless of input size.
    """
    h = (df.select(window_col.alias("w"), bucket.alias("bucket"))
         .groupBy("w", "bucket").agg(F.count(F.lit(1)).alias("n")))
    grid = (h.groupBy("w")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("bucket", "n"))).alias("m"))
            .withColumn("bucket",
                        F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))))
            .select("w", "bucket",
                    F.coalesce(F.element_at("m", F.col("bucket")),
                               F.lit(0)).alias("n")))
    wday = Window.partitionBy("w")
    wbucket = Window.partitionBy("bucket")
    # corpus total as a 1-row broadcast join (not a global window — see
    # _with_share): the grid is |windows|×nbins rows either way, but this
    # keeps the plan free of single-partition WindowExec nodes
    total = grid.agg(F.sum("n").alias("__total"))
    sh = grid.join(F.broadcast(total)).select(
        "w",
        (F.col("n") / F.sum("n").over(wday)).alias("p"),
        (F.sum("n").over(wbucket) / F.col("__total")).alias("q"))
    p = F.greatest(F.col("p"), F.lit(EPS))
    q = F.greatest(F.col("q"), F.lit(EPS))
    return sh.groupBy("w").agg(
        F.sum((p - q) * F.log(p / q)).alias("psi"))


def ks_statistic(current: DataFrame, baseline: DataFrame,
                 bucket_col: str = "bucket",
                 group_cols: list[str] | None = None) -> DataFrame:
    """Binned two-sample KS statistic: max |ECDF_p − ECDF_q| over buckets."""
    keys = list(group_cols or [])
    cur = current.select(*keys, bucket_col, F.col("share").alias("p"))
    base = baseline.select(bucket_col, F.col("share").alias("q"))
    # full outer join cannot broadcast (see psi()); both sides bucket-sized
    j = cur.join(base, [bucket_col], "full_outer").fillna(
        {"p": 0.0, "q": 0.0}
    )
    w = (
        Window.partitionBy(*keys).orderBy(bucket_col)
        if keys else Window.partitionBy().orderBy(bucket_col)
    ).rowsBetween(Window.unboundedPreceding, 0)
    ecdf_diff = F.abs(F.sum("p").over(w) - F.sum("q").over(w))
    diffs = j.select(*keys, ecdf_diff.alias("d"))
    if keys:
        return diffs.groupBy(*keys).agg(F.max("d").alias("ks"))
    return diffs.agg(F.max("d").alias("ks"))


def wasserstein_distance(current: DataFrame, baseline: DataFrame,
                         bucket_col: str = "bucket",
                         group_cols: list[str] | None = None) -> DataFrame:
    """Binned 1-D Wasserstein-1 (earth-mover) distance between two
    histogram share tables: W1 = Σ_b |CDF_p(b) − CDF_q(b)| × gap(b),
    where gap(b) is the distance to the next observed bucket (so sparse
    bucket ids are handled exactly — the CDF difference persists across
    the gap). Result is in bucket-width units; multiply by the physical
    bucket width for the metric in data units.

    Completes the drift triad: PSI is share-ratio-sensitive, KS sees
    only the worst single crossing, W1 measures how FAR the mass moved
    — a distribution that shifted two buckets scores twice one that
    shifted one, which both KS and PSI can miss.

    Same scale shape as :func:`ks_statistic`: the inputs are already
    bucket-sized aggregates, so the ordered window + final sum run on
    |groups| × |buckets| rows regardless of corpus size. The last
    observed bucket has no successor and contributes 0 (both CDFs are 1
    there, so its difference is 0 anyway).
    """
    keys = list(group_cols or [])
    cur = current.select(*keys, bucket_col, F.col("share").alias("p"))
    base = baseline.select(bucket_col, F.col("share").alias("q"))
    # full outer join cannot broadcast (see psi()); both sides bucket-sized
    j = cur.join(base, [bucket_col], "full_outer").fillna(
        {"p": 0.0, "q": 0.0}
    )
    order = (
        Window.partitionBy(*keys).orderBy(bucket_col)
        if keys else Window.partitionBy().orderBy(bucket_col)
    )
    w = order.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.lead(bucket_col).over(order) - F.col(bucket_col)
    contrib = (F.abs(F.sum("p").over(w) - F.sum("q").over(w))
               * gap.cast("double"))
    diffs = j.select(*keys, contrib.alias("d")).filter(F.col("d").isNotNull())
    if keys:
        return diffs.groupBy(*keys).agg(F.sum("d").alias("w1"))
    return diffs.agg(F.sum("d").alias("w1"))


def exact_quantile_digest(df: DataFrame, value_col: str,
                          keys: list[str] | None = None,
                          tag: str = "") -> DataFrame:
    """Exact (q25, q50, q75, n) of a discrete/low-cardinality column via
    its value-count table — the scale path for columns like sr_hz /
    dur_ms / bitrates whose distinct-value count is bounded: the corpus
    collapses in ONE map-combinable groupBy(value) and every later step
    (cumulative window, k-th-smallest selection) runs on the
    cardinality-sized count table. The quantile definition is the exact
    k-th smallest with k = ceil(p·n) — pure integer arithmetic, so an
    independent SQL engine reproduces every output bit-for-bit (no
    interpolation, no float rank). NULLs are excluded (they carry no
    position in the order).
    """
    return quantiles_from_counts(
        quantile_digest_counts(df, value_col, keys), value_col, keys, tag)


def quantile_digest_counts(df: DataFrame, value_col: str,
                           keys: list[str] | None = None) -> DataFrame:
    """The mergeable state behind :func:`exact_quantile_digest`: the
    (keys, value, __c) count table. Counts merge by ADDITION, so two
    batches' digests combine exactly (merge_quantile_counts) without
    rescanning either — the same algebraic-state contract as
    operators/incremental.py, extended to exact quantiles."""
    keys = list(keys or [])
    return (df.filter(F.col(value_col).isNotNull())
            .groupBy(*keys, value_col)
            .agg(F.count(F.lit(1)).alias("__c")))


def merge_quantile_counts(a: DataFrame, b: DataFrame, value_col: str,
                          keys: list[str] | None = None) -> DataFrame:
    """Merge two quantile count-table states: union + re-sum. Exact —
    no sketch error — because the state is the full (bounded) value
    histogram; the merged table feeds quantiles_from_counts unchanged."""
    keys = list(keys or [])
    return (a.unionByName(b)
            .groupBy(*keys, value_col)
            .agg(F.sum("__c").alias("__c")))


def quantiles_from_counts(c: DataFrame, value_col: str,
                          keys: list[str] | None = None,
                          tag: str = "") -> DataFrame:
    """Exact k-th-smallest quantiles (k = ceil(p·n)) from a (keys,
    value, __c) count table — all windows run on the cardinality-sized
    state, never the corpus."""
    keys = list(keys or [])
    sfx = f"_{tag}" if tag else ""
    w_ord = (Window.partitionBy(*keys).orderBy(value_col)
             if keys else Window.partitionBy().orderBy(value_col)
             ).rowsBetween(Window.unboundedPreceding, 0)
    if keys:
        n = F.sum("__c").over(Window.partitionBy(*keys))
        c = c.withColumn("__n", n)
    else:
        total = c.agg(F.sum("__c").alias("__n"))
        c = c.join(F.broadcast(total))
    cum = F.sum("__c").over(w_ord)
    v = F.col(value_col).cast("long")
    # k = ceil(p*n) in exact integer form: ceil(n/4), ceil(n/2), ceil(3n/4)
    k25 = F.floor((F.col("__n") + 3) / 4)
    k50 = F.floor((F.col("__n") + 1) / 2)
    k75 = F.floor((3 * F.col("__n") + 3) / 4)
    picked = c.select(*keys, "__n", cum.alias("__cum"), v.alias("__v"),
                      k25.alias("__k25"), k50.alias("__k50"),
                      k75.alias("__k75"))
    return picked.groupBy(*keys).agg(
        F.max("__n").alias(f"n{sfx}"),
        F.min(F.when(F.col("__cum") >= F.col("__k25"), F.col("__v")))
        .alias(f"q25{sfx}"),
        F.min(F.when(F.col("__cum") >= F.col("__k50"), F.col("__v")))
        .alias(f"q50{sfx}"),
        F.min(F.when(F.col("__cum") >= F.col("__k75"), F.col("__v")))
        .alias(f"q75{sfx}"),
    )


def quantile_shift(current: DataFrame, baseline: DataFrame,
                   value_col: str, keys: list[str] | None = None,
                   yellow: float = 0.5, red: float = 1.0) -> DataFrame:
    """Robust quantile-shift drift: how many baseline IQRs did the
    median move? shift = (med_cur − med_base) / max(IQR_base, 1).

    Complements the drift quartet (PSI: share ratios; KS: worst ECDF
    crossing; W1: mass distance; changepoint: when) with a unit-scaled
    LOCATION statistic — a distribution that drifted upward by half its
    own spread scores 0.5 regardless of the column's units, and the
    median/IQR backbone ignores outlier tails entirely (breakdown 25%).
    Both sides reduce to cardinality-sized count tables (see
    exact_quantile_digest), so the comparison costs two map-combinable
    aggregations no matter the corpus size; every quantile is an exact
    integer k-th smallest, so the oracle replays the arithmetic
    bit-for-bit.
    """
    keys = list(keys or [])
    cur = exact_quantile_digest(current, value_col, keys, "cur")
    base = exact_quantile_digest(baseline, value_col, keys, "base")
    j = (cur.join(base, keys) if keys else cur.crossJoin(base))
    iqr = F.greatest(F.col("q75_base") - F.col("q25_base"), F.lit(1))
    shift = F.round((F.col("q50_cur") - F.col("q50_base")) / iqr, 6)
    return j.select(
        *keys, "n_cur", "n_base",
        "q50_cur", "q50_base",
        (F.col("q75_base") - F.col("q25_base")).alias("iqr_base"),
        shift.alias("shift"),
        F.when(F.abs(shift) >= red, "RED")
        .when(F.abs(shift) >= yellow, "YELLOW")
        .otherwise("GREEN").alias("verdict"),
    )
