"""Training-label balance audit: is the corpus (and each hash split)
class-balanced enough to train on?

A skewed label distribution is one of the few data defects no per-row
rule can see — every row is individually fine; the corpus is broken. The
standard summary numbers are Shannon entropy of the class shares
(normalized by log2(k) so 1.0 = uniform), the inverse Simpson index
1 / sum(p^2) ("effective number of classes" — 10 classes at inverse
Simpson 2.1 means the corpus effectively trains on two), and the
max/min class-count ratio. Computed per group so the canonical question
— "does the train/val/test hash split preserve the class mix?" — is one
call with ``group_cols=["split"]``.

Scale shape: ONE map-combinable aggregate collapses the corpus to
(group, label) counts; shares, entropy, and the indices are plain
aggregates over that |groups| x |labels| frame (no global window — the
per-group total comes from a second tiny aggregate joined back, the
same shape operators/profiling.py:column_profile uses after its r2
scale fix).

Cross-engine determinism: counts are exact integers; shares and the
indices use IEEE-exact division plus libm log2 (same-libm on this host,
the precedent text_tfidf/ln established), and every double is rounded
to 6dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def class_balance(df: DataFrame, label_col: str,
                  group_cols: list[str],
                  yellow_norm_entropy: float = 0.85,
                  red_norm_entropy: float = 0.60) -> DataFrame:
    """Per-group label-balance summary.

    Output: group_cols..., n_rows, n_classes, entropy_bits,
    norm_entropy, inv_simpson, imbalance_ratio, verdict. A single-class
    group has zero entropy and norm_entropy 0 (log2(1) = 0 would divide
    by zero; one class IS maximal imbalance) — RED by construction.
    """
    counts = (df.groupBy(*group_cols, label_col)
              .agg(F.count(F.lit(1)).alias("n")))
    totals = counts.groupBy(*group_cols).agg(
        F.sum("n").alias("__tot"),
        F.count(F.lit(1)).alias("__k"),
        F.max("n").alias("__kmax"),
        F.min("n").alias("__kmin"))

    p = F.col("n").cast("double") / F.col("__tot").cast("double")
    per = (counts.join(F.broadcast(totals), group_cols)
           .groupBy(*group_cols)
           .agg(F.first("__tot").alias("n_rows"),
                F.first("__k").alias("n_classes"),
                F.first("__kmax").alias("__max"),
                F.first("__kmin").alias("__min"),
                (-F.sum(p * F.log2(p))).alias("__h"),
                F.sum(p * p).alias("__simpson")))

    k = F.col("n_classes").cast("double")
    norm_h = F.when(F.col("n_classes") > 1,
                    F.col("__h") / F.log2(k)).otherwise(F.lit(0.0))
    v = (F.when(norm_h < red_norm_entropy, "RED")
         .when(norm_h < yellow_norm_entropy, "YELLOW")
         .otherwise("GREEN"))
    return per.select(
        *group_cols,
        "n_rows",
        "n_classes",
        F.round(F.col("__h"), 6).alias("entropy_bits"),
        F.round(norm_h, 6).alias("norm_entropy"),
        F.round(F.lit(1.0) / F.col("__simpson"), 6).alias("inv_simpson"),
        F.round(F.col("__max").cast("double")
                / F.col("__min").cast("double"), 6).alias("imbalance_ratio"),
        v.alias("verdict"))


def duration_balance(clips: DataFrame, group_cols: list[str],
                     dur_col: str = "dur_ms",
                     low_share: float = 0.05) -> DataFrame:
    """Corpus balance in the AUDIO-NATIVE unit: total seconds per group
    and its share of the corpus — training pipelines budget hours of
    speech, not clip counts, and the two disagree whenever duration
    correlates with the group (long-form podcasts vs short commands).
    A group whose duration share falls below ``low_share`` flags
    UNDERREPRESENTED even when its clip count looks healthy.

    Null durations are excluded from the time sums but counted
    (n_null_dur) — unknown-length audio cannot silently inflate or
    deflate a share. Exact integer millisecond sums; one map-combinable
    aggregate + a 1-row broadcast for the shares.
    """
    agg = clips.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.when(F.col(dur_col).isNull(), 1).otherwise(0))
        .alias("n_null_dur"),
        F.coalesce(F.sum(dur_col), F.lit(0)).cast("long").alias("__ms"))
    tot = agg.agg(F.sum("__ms").alias("__tot"))
    share = F.col("__ms") / F.col("__tot")
    return (agg.join(F.broadcast(tot))
            .select(*group_cols, "n_clips", "n_null_dur",
                    F.round(F.col("__ms") / 1000.0, 3).alias("total_s"),
                    F.round(share, 6).alias("dur_share"),
                    F.when(share < low_share, "UNDERREPRESENTED")
                    .otherwise("OK").alias("status")))
