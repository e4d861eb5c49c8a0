"""Incremental validation: per-ingest-batch partial states that MERGE
into corpus-level results without rescanning old data.

This is the scale companion to the checkpoint ledger (plans/ledger.py):
at 10^12 rows you never recompute corpus stats from raw after each
ingest — each batch contributes a constant-size algebraic state
(counts/sums/min/max + an HLL sketch), and the corpus view is a fold
over states. Both halves here are exact-or-bounded:

- moment stats merge EXACTLY (count/sum/sumsq are associative — Chan's
  parallel formula recovers mean/variance bit-stably at these scales;
  the driver oracle checks merged == direct-from-raw);
- distinct counts merge via Apache DataSketches HLL
  (``hll_sketch_agg`` / ``hll_union_agg``): the union of per-batch
  sketches is byte-identical to the single-pass sketch, so
  incrementality costs ZERO extra error — pinned in pytest.

Scale shape: one partial+final hash aggregate per batch (map-side
combine), then the merge aggregates |batches| × |groups| tiny state
rows. The state columns are exactly what the ledger's ``metrics_json``
carries per partition, so a resumed run folds stored states instead of
rescanning validated partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_moments(df: DataFrame, value_col: str, batch_col: str,
                    group_cols: list[str]) -> DataFrame:
    """Per-(batch, group) algebraic state for moment statistics:
    (n, n_null, s1=Σx, s2=Σx², min, max). Everything here is an
    associative reduction — the only kind of state that merges exactly.
    """
    v = F.col(value_col)
    return df.groupBy(batch_col, *group_cols).agg(
        F.count(v).alias("n"),
        F.sum(v.isNull().cast("long")).alias("n_null"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"))


def merge_moments(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold per-batch states into per-group corpus stats. Emits
    (group..., n_rows, n_null, mean, stddev, min_value, max_value) with
    stddev recovered from the merged sums:
    ``var = (Σx² - (Σx)²/n) / (n-1)`` — algebraically identical to
    stddev_samp over the raw rows.
    """
    n = F.sum("n")
    s1 = F.sum("s1")
    s2 = F.sum("s2")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return partials.groupBy(*group_cols).agg(
        n.alias("n_rows"),
        F.sum("n_null").alias("n_null"),
        F.round(s1 / n, 6).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("stddev"),
        F.round(F.min("mn"), 6).alias("min_value"),
        F.round(F.max("mx"), 6).alias("max_value"))


def partial_distinct_sketch(df: DataFrame, id_col: str, batch_col: str,
                            lg_k: int = 12) -> DataFrame:
    """Per-batch HLL sketch of ``id_col`` — the constant-size (~2^lg_k
    bytes) distinct-count state a ledger row can carry."""
    return df.groupBy(batch_col).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"))


def merge_distinct_sketches(partials: DataFrame) -> DataFrame:
    """Union the per-batch sketches into one corpus estimate. DataSketches
    HLL union is exact over sketch state: merging per-batch sketches gives
    the SAME estimate as one pass over all rows (asserted in pytest), so
    batch-at-a-time ingestion costs no accuracy.
    """
    return partials.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"))).alias("distinct_estimate"))


def partial_histogram(df: DataFrame, col: str, lo: float, hi: float,
                      nbins: int, batch_col: str) -> DataFrame:
    """Per-ingest-batch histogram state: (batch, bucket, n) with the
    SAME fixed bucket edges as operators/drift.py:histogram (clamped
    edge buckets), so states from any number of batches merge into
    exactly the histogram a single pass over the union would build —
    counts are associative, the one kind of state that merges exactly.
    Constant size per batch: ≤ nbins rows however many rows the batch
    carries."""
    width = (hi - lo) / nbins
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0),
                   F.floor((F.col(col) - F.lit(lo)) / F.lit(width))),
    ).cast("int").alias("bucket")
    return (df.filter(F.col(col).isNotNull())
            .groupBy(batch_col, bucket)
            .agg(F.count(F.lit(1)).alias("n")))


def merge_histogram_states(partials: DataFrame) -> DataFrame:
    """Fold per-batch histogram states into the corpus share table
    (bucket, n, share) — the drop-in `current` side for
    operators/drift.py:psi / ks_statistic. The merge is a sum over
    |batches| × nbins tiny rows; PSI over the merged states is EXACTLY
    the PSI a full rescan would produce (pinned by the driver oracle
    of `drift_incremental`), so incremental drift costs zero error —
    the drift twin of the moments/HLL/quantile merge laws above."""
    from .drift import _with_share

    counts = partials.groupBy("bucket").agg(F.sum("n").alias("n"))
    return _with_share(counts, [])
