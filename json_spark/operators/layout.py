"""Data-layout planning: Z-order (Morton) clustering vs linear sort.

At 100 TB the scan cost of a selective query is decided before it runs —
by how the writer CLUSTERED the files. A linear sort on (a, b) gives
perfect parquet min/max pruning on ``a`` and near-none on ``b``; Morton
bit-interleaving spends the ordering budget on BOTH dimensions, shrinking
every file's bounding box (the idea behind Delta/Iceberg
``OPTIMIZE ZORDER BY``). This module quantifies that trade on the
engine's own tables with pure integer arithmetic:

- each dimension is range-bucketed to 8 bits (min/max from one 1-row
  aggregate, broadcast — no window);
- the linear key is ``b1*256 + b2``; the Z key interleaves the bits
  (16 arithmetic terms, codegen-friendly div/mod — identical in SQL);
- files are FIXED-WIDTH key ranges (``key * N div keyspace``), the
  metadata-only stand-in for repartitionByRange file boundaries — no
  global sort or window anywhere in the plan;
- per file and layout: the (span_a+1)*(span_b+1) bounding-box area, and
  for probe point-lookups on each dimension, how many files' min/max
  interval must be read.

Everything is exact integers until the final averaged ratios, so the
DuckDB oracle reproduces the whole comparison bit-for-bit.

Scale shape: two map-only projections + one (layout, file)-keyed
partial+final aggregate (≤ 2N groups) + a probes×files broadcast join
bounded by N files; the corpus never sorts and never shuffles by key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_FILES = 16
BITS = 8


def _bucket(c: Column, mn: Column, mx: Column) -> Column:
    """Range-bucket a numeric column to [0, 2^BITS)."""
    width = (mx - mn + 1).cast("double")
    return F.least(
        F.lit((1 << BITS) - 1),
        F.floor((c - mn) * (1 << BITS) / width).cast("long"))


def morton_key(b1: Column, b2: Column) -> Column:
    """Bit-interleave two BITS-wide buckets: b1 takes odd bit positions,
    b2 even — plain div/mod/multiply terms, no UDF, portable to SQL."""
    key = F.lit(0).cast("long")
    for i in range(BITS):
        bit1 = F.floor(b1 / (1 << i)).cast("long") % 2
        bit2 = F.floor(b2 / (1 << i)).cast("long") % 2
        key = key + bit1 * (1 << (2 * i + 1)) + bit2 * (1 << (2 * i))
    return key


def layout_compare(df: DataFrame, col_a: str, col_b: str,
                   n_files: int = N_FILES) -> DataFrame:
    """Compare linear vs Z-order clustering of ``df`` on two numeric
    columns: per layout, the total per-file bounding-box area and the
    mean number of files a point-lookup on each dimension must read
    (probes at every bucket value). Returns 2 rows:
    (layout, n_files, sum_bbox_area, avg_files_hit_a, avg_files_hit_b).
    """
    mm = df.agg(F.min(col_a).alias("mna"), F.max(col_a).alias("mxa"),
                F.min(col_b).alias("mnb"), F.max(col_b).alias("mxb"))
    b = (df.join(F.broadcast(mm))
         .select(_bucket(F.col(col_a), F.col("mna"), F.col("mxa"))
                 .alias("ba"),
                 _bucket(F.col(col_b), F.col("mnb"), F.col("mxb"))
                 .alias("bb")))
    keyspace = 1 << (2 * BITS)
    keyed = b.select(
        "ba", "bb",
        (F.col("ba") * (1 << BITS) + F.col("bb")).alias("lin_key"),
        morton_key(F.col("ba"), F.col("bb")).alias("z_key"))
    stacked = (keyed.select(
        F.lit("linear").alias("layout"), "ba", "bb",
        F.floor(F.col("lin_key") * n_files / keyspace).cast("long")
        .alias("file"))
        .unionByName(keyed.select(
            F.lit("zorder").alias("layout"), "ba", "bb",
            F.floor(F.col("z_key") * n_files / keyspace).cast("long")
            .alias("file"))))
    files = stacked.groupBy("layout", "file").agg(
        F.min("ba").alias("mina"), F.max("ba").alias("maxa"),
        F.min("bb").alias("minb"), F.max("bb").alias("maxb"))
    # probes: every bucket value 0..2^BITS-1 on each dimension
    probe_df = files.sparkSession.range(1 << BITS).select(
        F.col("id").alias("probe"))
    hits = (files.join(F.broadcast(probe_df))
            .select("layout", "file", "probe",
                    ((F.col("mina") <= F.col("probe"))
                     & (F.col("probe") <= F.col("maxa")))
                    .cast("long").alias("hit_a"),
                    ((F.col("minb") <= F.col("probe"))
                     & (F.col("probe") <= F.col("maxb")))
                    .cast("long").alias("hit_b")))
    per_layout_hits = hits.groupBy("layout").agg(
        (F.sum("hit_a") / (1 << BITS)).alias("avg_files_hit_a"),
        (F.sum("hit_b") / (1 << BITS)).alias("avg_files_hit_b"))
    per_layout_area = files.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum((F.col("maxa") - F.col("mina") + 1)
              * (F.col("maxb") - F.col("minb") + 1)).alias("sum_bbox_area"))
    # both sides are |layouts| = 2 rows, but they are AGGREGATES whose
    # size Catalyst can't estimate — without the hint the planner falls
    # back to SortMergeJoin (two sorts + an exchange) once the input
    # outgrows the auto-broadcast stats, exactly the degeneration the
    # stress plan-audit exists to catch
    return (per_layout_area.join(F.broadcast(per_layout_hits), "layout")
            .select("layout", "n_files", "sum_bbox_area",
                    F.round("avg_files_hit_a", 6).alias("avg_files_hit_a"),
                    F.round("avg_files_hit_b", 6).alias("avg_files_hit_b")))
