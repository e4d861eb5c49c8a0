"""Incremental (delta-vs-corpus) dedup: the daily-ingest shape.

At 10^12 documents nobody re-deduplicates the whole corpus per ingest
batch; the production loop is (1) keep a fingerprint INDEX of the
accepted corpus, (2) for each new batch, semi-join the batch's
fingerprints against the index and drop the hits, (3) append the
survivors' fingerprints to the index. This module is that loop's step 2
as a first-class operator, next to the whole-corpus dedup family
(operators/dedup.py, operators/uniqueness.py) the way the reference
pairs one-shot decoding with resumable re-validation (checkpoint ledger,
plans/ledger.py).

Scale shape: both sides collapse to DISTINCT fingerprints before any
join — the corpus index is |unique docs| rows of one long each, the
batch side |batch| rows — so the join shuffles deduped 8-byte keys,
never text. At 10^12 corpus rows the index would be a bucketed table
maintained across runs (and a ``bloom_filter_agg`` pre-filter on it cuts
the batch-side shuffle to near-misses only); here the index build is
fused into the same job.

Cross-engine determinism: batch membership is the md5 bucket of the doc
id (operators/packing.py:hash32 — identical integer arithmetic in
DuckDB), and the fingerprint is the rolling polynomial token hash
(operators/text.py:fingerprint) both engines fold sequentially, so the
oracle reproduces every kept/dropped decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import hash32
from .text import fingerprint


def split_batch(df: DataFrame, id_col: str, batch_buckets: int = 5,
                salt: str = "delta:") -> tuple[DataFrame, DataFrame]:
    """Deterministically carve a 1/``batch_buckets`` ingest batch out of
    the table by md5 bucket of the id (bucket 0 = the new batch, the
    rest = the already-accepted corpus). Stands in for "today's ingest"
    at test scale; production passes two real tables instead."""
    bucket = F.pmod(hash32(F.col(id_col), salt), F.lit(batch_buckets))
    return df.filter(bucket == 0), df.filter(bucket != 0)


def incremental_dedup(batch: DataFrame, corpus: DataFrame, id_col: str,
                      text_col: str,
                      group_cols: list[str]) -> DataFrame:
    """Per-group report of the new batch against the corpus fingerprint
    index: how many batch docs are exact-content duplicates of an
    already-accepted doc (dropped) vs new (kept), plus the batch's own
    internal duplicate mass (docs sharing a fingerprint WITHIN the batch
    beyond the first — they'd collapse on append).

    Output: group_cols..., n_batch, n_dup_corpus, n_dup_within,
    n_kept — where n_kept = n_batch - n_dup_corpus - n_dup_within.
    """
    fp_idx = (corpus
              .select(fingerprint(F.col(text_col)).alias("fp"))
              .distinct())

    b = batch.select(*group_cols, F.col(id_col).alias("__id"),
                     fingerprint(F.col(text_col)).alias("fp"))

    # corpus hits: plain left-semi on the deduped index
    hits = b.join(fp_idx, "fp", "left_semi")

    # within-batch duplicate mass among the NON-corpus-hit remainder:
    # docs beyond the first per fingerprint (first = min id, the
    # deterministic keeper)
    fresh = b.join(fp_idx, "fp", "left_anti")
    within = (fresh.groupBy(*group_cols, "fp")
              .agg(F.count(F.lit(1)).alias("__n"))
              .groupBy(*group_cols)
              .agg(F.sum(F.col("__n") - 1).alias("n_dup_within")))

    tot = batch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_batch"))
    ndup = hits.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_dup_corpus"))

    out = (tot
           .join(ndup, group_cols, "left")
           .join(within, group_cols, "left")
           .select(*group_cols,
                   "n_batch",
                   F.coalesce("n_dup_corpus",
                              F.lit(0).cast("long")).alias("n_dup_corpus"),
                   F.coalesce("n_dup_within",
                              F.lit(0).cast("long")).alias("n_dup_within")))
    return out.withColumn(
        "n_kept",
        F.col("n_batch") - F.col("n_dup_corpus") - F.col("n_dup_within"))
