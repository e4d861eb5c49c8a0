"""Uniqueness checks: HLL++ approximate + exact hash group-by.

North-rule ops (BASELINE.json:6): uniqueness of ``clip_id`` via
- ``approx_uniqueness``: HyperLogLog++ (`approx_count_distinct`) — one agg
  pass, constant memory, mergeable across 1000 executors; the cheap gate.
- ``exact_duplicates`` / ``uniqueness_summary``: exact, one shuffle.
- ``set_overlap``: cross-table key-set overlap (Jaccard / Dice /
  containment) in one union + key-only shuffle — coverage as a ratio.

Why a single ``groupBy(key).count()`` is already skew-proof HERE: Spark's
hash aggregate does map-side partial aggregation, so a pathologically hot
key emits ONE partial row per map task — the reducer that owns the key
receives at most ``numPartitions`` rows for it, never the raw row stream.
Manual two-phase salting (group on (salt, key), then re-group on key)
pays a second shuffle for nothing when the aggregate is map-combinable
like count/sum. Salting earns its keep only for aggregates without
partial merge (collect_list, exact percentile buffers) or for JOINS on a
hot key — those sit in operators/referential.py and session.py's AQE
skew-join config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_uniqueness(df: DataFrame, key: str, rsd: float = 0.01,
                      partition_cols: list[str] | None = None) -> DataFrame:
    """HLL++ distinct estimate vs row count per partition group."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    ]
    out = df.groupBy(*partition_cols).agg(*aggs) if partition_cols else df.agg(*aggs)
    return out.withColumn(
        "approx_dup_rate",
        F.greatest(F.lit(0.0), (F.col("n_rows") - F.col("approx_distinct"))
                   / F.col("n_rows")),
    )


def exact_duplicates(df: DataFrame, key: str) -> DataFrame:
    """Exact duplicate keys (count > 1): one partial+final hash aggregate.

    Map-side combine bounds each task's output to one row per distinct
    key it saw, so the single shuffle carries partial counts, not rows —
    the plan a 10^12-row clip_id audit wants.
    """
    return (
        df.select(F.col(key))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_summary(df: DataFrame, key: str) -> DataFrame:
    """One-row exact summary: n_rows, n_keys, n_dup_keys, n_dup_rows."""
    counts = (
        df.select(F.col(key))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("n_dup_rows"),
    )


def set_overlap(df_a: DataFrame, df_b: DataFrame, key_a: str,
                key_b: str | None = None,
                label_a: str = "a", label_b: str = "b",
                decimals: int = 6) -> DataFrame:
    """Key-set overlap between two tables: Jaccard, Dice, containment.

    The between-tables complement of :func:`uniqueness_summary` — how
    much of table A's key universe does table B cover (and vice
    versa)? The validation uses: clip_id vs the transcript manifest
    (referential coverage as a *ratio*, not just an orphan list),
    train-vs-test id leakage, and snapshot-to-snapshot key churn.

    Shape: each side collapses to its distinct key projection inside
    ONE union + groupBy(key) with max() indicators — map-side combine
    bounds every task's output to one row per distinct key it saw, so
    the single shuffle carries key-only rows; the metrics are a final
    1-row aggregate. No join, no second shuffle; at 10^12 keys this is
    the same plan shape as exact uniqueness. Null keys are excluded
    (they never corefer).

    Metrics are exact integer masses plus single IEEE divisions
    (jaccard = n_both/(n_a+n_b−n_both), dice = 2·n_both/(n_a+n_b),
    containment = n_both/n_side) — bit-reproducible in a SQL replay.
    """
    key_b = key_b or key_a
    a = (df_a.where(F.col(key_a).isNotNull())
         .select(F.col(key_a).cast("string").alias("__k"),
                 F.lit(1).alias("__ia"), F.lit(0).alias("__ib")))
    b = (df_b.where(F.col(key_b).isNotNull())
         .select(F.col(key_b).cast("string").alias("__k"),
                 F.lit(0).alias("__ia"), F.lit(1).alias("__ib")))
    keys = (a.unionByName(b).groupBy("__k")
            .agg(F.max("__ia").alias("__ia"), F.max("__ib").alias("__ib")))
    m = keys.agg(
        F.sum("__ia").alias("n_a"),
        F.sum("__ib").alias("n_b"),
        F.sum(F.col("__ia") * F.col("__ib")).alias("n_both"))
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n_both = F.col("n_both").cast("double")
    union_n = n_a + n_b - n_both
    return m.select(
        F.lit(label_a).alias("set_a"), F.lit(label_b).alias("set_b"),
        "n_a", "n_b", "n_both",
        (F.col("n_a") - F.col("n_both")).alias("n_a_only"),
        (F.col("n_b") - F.col("n_both")).alias("n_b_only"),
        F.round(F.when(union_n > 0, n_both / union_n), decimals)
        .alias("jaccard"),
        F.round(F.when(n_a + n_b > 0, (F.lit(2.0) * n_both) / (n_a + n_b)),
                decimals).alias("dice"),
        F.round(F.when(n_a > 0, n_both / n_a), decimals)
        .alias("containment_a"),
        F.round(F.when(n_b > 0, n_both / n_b), decimals)
        .alias("containment_b"))


def hll_explicit(df: DataFrame, key: str, p: int = 8) -> DataFrame:
    """Explicit HyperLogLog with CROSS-ENGINE-IDENTICAL registers — the
    white-box twin of ``approx_uniqueness``'s built-in HLL++ (whose
    register layout is Spark-private and therefore only rows-only
    checkable). Every step here is engine-portable integer arithmetic:
    48-bit md5 hash, bucket = h mod 2^p, rho = leading-zero rank of the
    remaining 40 bits computed EXACTLY via the length of the binary
    string (``bin`` prints no leading zeros in both Spark and DuckDB),
    register = max rho per bucket, and the Flajolet harmonic estimator
    with the standard small-range linear-counting branch. DuckDB
    replays the identical pipeline, so the ORACLE pins registers AND
    estimate — an approximate algorithm under an exact cross-check
    (same stance as the KLL sketch's deterministic states).

    Returns one row: (n_exact, registers_used, hll_estimate,
    rel_error). Scale shape: one map-side-combinable max-per-bucket agg
    (exchange <= 2^p rows per task), then arithmetic on <= 2^p rows;
    the exact count (for the report) is the usual distinct agg — drop
    it at true scale and keep the sketch side only.
    """
    m = 1 << p
    rest_bits = 48 - p
    h = F.conv(F.substring(F.md5(F.col(key).cast("string").cast("binary")),
                           1, 12), 16, 10).cast("long")
    rest = (h / m).cast("long")
    rho = F.when(rest == 0, F.lit(rest_bits + 1)) \
        .otherwise(F.lit(rest_bits + 1) - F.length(F.bin(rest)))
    regs = (df.select(F.pmod(h, F.lit(m)).alias("bucket"),
                      rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("mx")))
    agg = regs.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("z_present"))
    alpha = 0.7213 / (1 + 1.079 / m)
    z = F.col("z_present") + (m - F.col("used"))
    v = m - F.col("used")
    e_raw = F.lit(alpha * m * m) / z
    e = F.when((e_raw <= 2.5 * m) & (v > 0),
               m * F.log(m / v.cast("double"))).otherwise(e_raw)
    est = agg.select(F.col("used").alias("registers_used"), e.alias("e"))
    exact = df.agg(F.countDistinct(key).alias("n_exact"))
    return (exact.join(F.broadcast(est))
            .select("n_exact", "registers_used",
                    F.round("e", 4).alias("hll_estimate"),
                    F.round(F.abs(F.col("e") - F.col("n_exact"))
                            / F.col("n_exact"), 6).alias("rel_error")))


def kmv_overlap(a: DataFrame, a_key: str, b: DataFrame, b_key: str,
                k: int = 256) -> DataFrame:
    """KMV (k-minimum-values) set sketch for cross-table overlap — the
    fourth pinned sketch (after KLL quantiles, CMS frequencies, HLL
    distincts), and the only one that estimates INTERSECTIONS: at
    10^12 keys per side, exact Jaccard pays a two-table distinct join,
    while two k-row sketches answer it from bounded state
    (Beyer et al., SIGMOD'07).

    Per side, the sketch is the k smallest DISTINCT 48-bit md5 hashes
    (exact integers — both engines produce the identical k-set, so the
    oracle pins the sketch AND the estimates). Estimators:
    - distinct(S) ~ (k-1) * 2^48 / h_(k) when the sketch is full,
      else the exact distinct-hash count;
    - Jaccard ~ |K ∩ A_sk ∩ B_sk| / k where K is the k-min sketch of
      the UNION — plain set arithmetic on the two k-sets.

    Returns one row: exact + estimated distincts per side, exact +
    estimated Jaccard (exact side computed for the report; drop it at
    true scale). Scale shape: per side one distinct-agg then a global
    top-k (TakeOrderedAndProject — no full sort); everything after
    runs on <= 3k rows.
    """
    m_space = float(1 << 48)

    def hashed(df: DataFrame, key: str) -> DataFrame:
        h = F.conv(F.substring(
            F.md5(F.col(key).cast("string").cast("binary")), 1, 12),
            16, 10).cast("long")
        return df.select(h.alias("h")).distinct()

    ha, hb = hashed(a, a_key), hashed(b, b_key)
    sk_a = ha.orderBy("h").limit(k).select(F.col("h").alias("ha"))
    sk_b = hb.orderBy("h").limit(k).select(F.col("h").alias("hb"))

    def est(sk: DataFrame, col: str) -> DataFrame:
        return sk.agg(
            F.count(F.lit(1)).alias(f"n_{col}"),
            F.max(col).alias(f"kth_{col}"))

    # union sketch: k smallest of the merged k-sets
    un = (sk_a.select(F.col("ha").alias("h"))
          .unionByName(sk_b.select(F.col("hb").alias("h")))
          .distinct().orderBy("h").limit(k))
    inter = (un.join(sk_a, un["h"] == sk_a["ha"], "left_semi")
             .join(sk_b, F.col("h") == sk_b["hb"], "left_semi")
             .agg(F.count(F.lit(1)).alias("n_common")))
    un_n = un.agg(F.count(F.lit(1)).alias("n_un"))

    exact = (ha.select(F.col("h").alias("ka"))
             .join(hb.select(F.col("h").alias("kb")),
                   F.col("ka") == F.col("kb"), "full")
             .agg(F.count("ka").alias("exact_a"),
                  F.count("kb").alias("exact_b"),
                  F.sum(((F.col("ka").isNotNull())
                         & (F.col("kb").isNotNull())).cast("long"))
                  .alias("exact_common")))

    def dist_est(n: Column, kth: Column) -> Column:
        return F.when(n < k, n.cast("double")) \
            .otherwise((k - 1) * F.lit(m_space) / kth)

    row = (exact.join(F.broadcast(est(sk_a, "ha")))
           .join(F.broadcast(est(sk_b, "hb")))
           .join(F.broadcast(inter)).join(F.broadcast(un_n)))
    jac_est = F.col("n_common") / F.col("n_un")
    return row.select(
        F.lit(k).alias("k"),
        "exact_a", "exact_b",
        F.round(dist_est(F.col("n_ha"), F.col("kth_ha")), 4)
        .alias("kmv_a"),
        F.round(dist_est(F.col("n_hb"), F.col("kth_hb")), 4)
        .alias("kmv_b"),
        F.round(F.col("exact_common")
                / (F.col("exact_a") + F.col("exact_b")
                   - F.col("exact_common")), 6).alias("exact_jaccard"),
        F.round(jac_est, 6).alias("kmv_jaccard"))
