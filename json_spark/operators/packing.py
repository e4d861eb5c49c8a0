"""Training-data set operations: deterministic splits and sequence packing.

Both are driven by the cross-engine 32-bit md5 hash (Spark
``conv(substring(md5(s),1,8),16,10)`` == DuckDB
``('0x'||substr(md5(s),1,8))::BIGINT``), so the DuckDB oracles reproduce
every assignment bit-for-bit — no RNG anywhere, which is also the property
a production pipeline needs: re-running the split on a grown corpus never
reshuffles previously-assigned rows (hash of the id, not row position).

Scale shapes:
- dataset_split : pure map-side column arithmetic — no shuffle at all
                  until the (tiny) per-split summary aggregate.
- pack_batches  : the window runs per (strata..., shard) where shard is a
                  hash bucket of the id — at 10^12 docs you raise
                  ``n_shards`` so each window partition stays
                  executor-sized; packing is inherently per-shard (a
                  global greedy pack would serialize the corpus through
                  one task) and per-shard packing loses at most one
                  underfull batch per shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash32(col: Column, salt: str = "") -> Column:
    """Cross-engine deterministic 32-bit hash of a column's string form."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16, 10).cast("long")


def assign_split(id_col: Column, train_per_mille: int = 960,
                 val_per_mille: int = 980, salt: str = "split:") -> Column:
    """train/val/test label from a hash bucket of the id: stable under
    corpus growth, no coordination, map-only."""
    bucket = F.pmod(hash32(id_col, salt), F.lit(1000))
    return (F.when(bucket < train_per_mille, "train")
            .when(bucket < val_per_mille, "val")
            .otherwise("test"))


def dataset_split(df: DataFrame, id_col: str, strata: list[str],
                  token_col: str) -> DataFrame:
    """Per-(split, strata) composition report: row counts and token mass,
    so a user sees at a glance whether the hash split is stratified the
    way the corpus is."""
    return (df.withColumn("split", assign_split(F.col(id_col)))
            .groupBy("split", *strata)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_col).alias("sum_tokens")))


def pack_batches(df: DataFrame, id_col: str, token_col: str,
                 strata: list[str], budget: int,
                 n_shards: int = 4) -> DataFrame:
    """Token-budget sequence packing: within each (strata..., shard) the
    docs are laid out in id order and cut into batches of ~``budget``
    tokens — doc d goes to batch ``floor(tokens_before_d / budget)``, the
    offset-based rule, so batch boundaries are a pure prefix-sum (one
    window, exactly expressible in SQL) rather than a sequential greedy
    scan. A batch may overflow by at most one document.

    Emits one row per batch: (strata..., shard, batch_id, n_docs,
    batch_tokens).
    """
    shard = F.pmod(hash32(F.col(id_col), "shard:"), F.lit(n_shards))
    w = (Window.partitionBy(*strata, "shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = (df.withColumn("shard", shard)
              .withColumn("__before",
                          F.coalesce(F.sum(token_col).over(w), F.lit(0)))
              .withColumn("batch_id",
                          F.floor(F.col("__before") / F.lit(budget))
                          .cast("long")))
    return (packed.groupBy(*strata, "shard", "batch_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_col).alias("batch_tokens")))


def truncation_report(df: DataFrame, token_col: str, group_cols: list[str],
                      budget: int, yellow_share: float = 0.05,
                      red_share: float = 0.15) -> DataFrame:
    """Context-length truncation loss: if every document is cut at
    ``budget`` tokens, how much text is lost per group? The report a
    pipeline runs BEFORE choosing a packing length — a budget that
    silently drops 20% of the tokens of one source biases the corpus
    in a way no per-document check flags.

    Emits per group: n_docs, total_tokens, docs_over (documents longer
    than the budget), tokens_lost (Σ max(n − budget, 0)), kept_tokens,
    loss_share, and a GREEN/YELLOW/RED verdict on the loss share. All
    integers except the single rounded ratio, so a DuckDB oracle
    reproduces every value.

    Scale shape: pure per-row arithmetic into ONE map-combinable hash
    aggregate — the only exchange is |groups|-sized.
    """
    n = F.col(token_col)
    lost = F.greatest(n - F.lit(budget), F.lit(0))
    agg = (df.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(n).alias("total_tokens"),
                F.sum((n > budget).cast("long")).alias("docs_over"),
                F.sum(lost).alias("tokens_lost")))
    share = F.col("tokens_lost") / F.col("total_tokens")
    return agg.select(
        *group_cols, "n_docs", "total_tokens", "docs_over", "tokens_lost",
        (F.col("total_tokens") - F.col("tokens_lost")).alias("kept_tokens"),
        F.round(share, 6).alias("loss_share"),
        F.when(share > red_share, "RED")
        .when(share > yellow_share, "YELLOW")
        .otherwise("GREEN").alias("verdict"))


def hash_uniformity(df: DataFrame, id_col: str, n_buckets: int = 16,
                    salt: str = "shard:",
                    chi2_yellow: float = 2.0,
                    chi2_red: float = 4.0) -> DataFrame:
    """Audit of the engine's own splitting/sampling primitive: are the
    md5 buckets that drive ``dataset_split`` / ``stratified_sample`` /
    ``pack_batches`` actually uniform over THIS id population? A skewed
    id scheme (e.g. ids sharing a long common prefix fed to a weaker
    hash) silently biases every downstream split — this check makes the
    assumption measurable instead of assumed.

    Emits one row per bucket: n, share, dev from the uniform share —
    plus the global Pearson chi-square statistic normalized per bucket
    (chi2 / n_buckets; ~1 expected under uniformity, E[chi2] = B−1)
    and its verdict repeated on each row. Zero-count buckets are
    grid-completed so emptiness raises the statistic instead of
    shrinking the table.

    Scale shape: one map-combinable ``n_buckets``-row hash aggregate
    touches the corpus; the grid join, chi-square, and verdict are
    literal-sized arithmetic after it.
    """
    spark = df.sparkSession
    b = F.pmod(hash32(F.col(id_col), salt), F.lit(n_buckets))
    counts = (df.select(b.alias("bucket"))
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
    grid = spark.range(0, n_buckets).select(F.col("id").alias("bucket"))
    full = (grid.join(counts, "bucket", "left")
            .select("bucket", F.coalesce("n", F.lit(0)).alias("n")))
    tot = full.agg(F.sum("n").alias("__tot"))
    withtot = full.join(F.broadcast(tot))
    exp = F.col("__tot") / F.lit(float(n_buckets))
    dev2 = (F.col("n") - exp) * (F.col("n") - exp) / exp
    chi = (withtot.select(dev2.alias("__d"))
           .agg((F.sum("__d") / F.lit(float(n_buckets))).alias("__chi_b")))
    return (withtot.join(F.broadcast(chi))
            .select("bucket", "n",
                    F.round(F.col("n") / F.col("__tot"), 6).alias("share"),
                    F.round(F.col("n") / F.col("__tot")
                            - 1.0 / n_buckets, 6).alias("dev"),
                    F.round("__chi_b", 6).alias("chi2_per_bucket"),
                    F.when(F.col("__chi_b") > chi2_red, "RED")
                    .when(F.col("__chi_b") > chi2_yellow, "YELLOW")
                    .otherwise("GREEN").alias("verdict")))


def packing_efficiency(df: DataFrame, id_col: str, token_col: str,
                       strata: list[str], budget: int,
                       n_shards: int = 4) -> DataFrame:
    """Context-window utilization report over :func:`pack_batches`: per
    strata, how well does the packed layout use the token budget? Emits
    n_batches, n_docs, packed_tokens, mean_fill (batch tokens / budget),
    n_underfull / n_overflow batches, and waste_share — the fraction of
    the reserved n_batches × budget token capacity left unused. The
    report a pipeline reads before committing a sequence length: a
    budget that leaves 30% of every batch empty wastes a third of every
    training step, and one that overflows constantly truncates.

    Under the offset rule every batch except a shard's last spans at
    least ``budget`` tokens (an overflowing doc is counted into the
    batch its offset starts in), so waste concentrates in the per-shard
    tail — raising ``n_shards`` for parallelism trades a little more
    tail waste, and THIS report is where that trade becomes visible.

    Scale shape: inherits pack_batches' per-(strata, shard) window (no
    global ordering anywhere), then collapses the batch table — already
    ~corpus_tokens/budget rows, not corpus rows — into a |strata|-sized
    aggregate. The two ratios are single rounded divisions of exact
    integers, so a SQL twin replays them bit-identically.
    """
    if int(budget) < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    batches = pack_batches(df, id_col, token_col, strata, budget,
                           n_shards=n_shards)
    cap = F.lit(int(budget))
    agg = (batches.groupBy(*strata)
           .agg(F.count(F.lit(1)).alias("n_batches"),
                F.sum("n_docs").alias("n_docs"),
                F.sum("batch_tokens").alias("packed_tokens"),
                F.sum((F.col("batch_tokens") < cap).cast("long"))
                .alias("n_underfull"),
                F.sum((F.col("batch_tokens") > cap).cast("long"))
                .alias("n_overflow"),
                F.sum(F.greatest(cap - F.col("batch_tokens"), F.lit(0)))
                .alias("wasted_tokens")))
    return agg.select(
        *strata, "n_batches", "n_docs", "packed_tokens",
        "n_underfull", "n_overflow", "wasted_tokens",
        F.round(F.col("packed_tokens").cast("double")
                / (F.col("n_batches") * cap).cast("double"), 6)
        .alias("mean_fill"),
        F.round(F.col("wasted_tokens").cast("double")
                / (F.col("n_batches") * cap).cast("double"), 6)
        .alias("waste_share"))
