"""Checkpoint ledger: per-partition lineage + resume (FIXTURES.md §5).

North-rule requirement: runs are resumable from a per-partition checkpoint
carrying lineage + metrics. On Iceberg this is a ``MERGE INTO`` on
(partition_id, check_name); the sandbox fallback is an append-only parquet
directory where the LATEST row per key wins (window dedup on read) —
idempotent without transactional guarantees because re-appending the same
(partition_id, check_name, status) is harmless.

Resume = anti-join of the partition worklist against DONE ledger rows:
the engine re-processes only missing/failed partitions. The ledger is
tiny (|partitions| x |checks| rows), so the anti-join side is always
broadcast.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "partition_id string, check_name string, status string, "
    "metrics_json string, lineage string, updated_at timestamp"
)


def ledger_read(spark: SparkSession, path: str) -> DataFrame:
    """Latest row per (partition_id, check_name); empty frame if no ledger."""
    try:
        raw = spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], LEDGER_SCHEMA)
    w = Window.partitionBy("partition_id", "check_name").orderBy(
        F.col("updated_at").desc())
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ledger_append(spark: SparkSession, path: str, rows: list[dict],
                  lineage: str) -> None:
    """Append status rows (driver-side list — one per partition/check)."""
    now = F.current_timestamp()
    df = spark.createDataFrame(
        [
            (
                r["partition_id"],
                r["check_name"],
                r.get("status", "DONE"),
                json.dumps(r.get("metrics", {}), sort_keys=True),
                lineage,
            )
            for r in rows
        ],
        "partition_id string, check_name string, status string, "
        "metrics_json string, lineage string",
    ).withColumn("updated_at", now)
    df.write.mode("append").parquet(path)


def ledger_append_frame(verdicts: DataFrame, path: str,
                        lineage: str, status: str = "DONE") -> None:
    """Executor-side ledger append (r3 verdict watch item #3): project
    the suite's verdict frame straight into ledger rows and write it —
    the rows never materialize on the driver, so a 10^6-partition ×
    10-check run appends 10^7 rows as an ordinary distributed write
    instead of a driver collect. Metrics carry the same
    {n_red, n_rows, verdict} summary the driver-side path wrote (keys
    in sorted order; ``ledger_trend`` reads them as map<string,double>
    and ignores the non-numeric verdict either way)."""
    (verdicts.select(
        F.col("partition_id").cast("string").alias("partition_id"),
        F.col("check_name").cast("string").alias("check_name"),
        F.lit(status).alias("status"),
        F.to_json(F.struct(
            F.col("n_red").cast("long").alias("n_red"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("verdict").alias("verdict"))).alias("metrics_json"),
        F.lit(lineage).alias("lineage"),
        F.current_timestamp().alias("updated_at"))
     .write.mode("append").parquet(path))


def pending_partitions(all_partitions: DataFrame, ledger: DataFrame,
                       check_name: str) -> DataFrame:
    """Partitions not yet DONE for this check (broadcast anti-join)."""
    done = ledger.filter(
        (F.col("check_name") == check_name) & (F.col("status") == "DONE")
    ).select("partition_id")
    return all_partitions.join(F.broadcast(done), "partition_id", "left_anti")


def make_lineage(input_path: str, code_version: str) -> str:
    """Input fingerprint + code version (Iceberg snapshot-id equivalent:
    in the parquet fallback, mtime+size of the input directory)."""
    try:
        entries = sorted(
            (e.name, e.stat().st_size, int(e.stat().st_mtime))
            for e in os.scandir(input_path)
        )
        fingerprint = hash(tuple(entries)) & 0xFFFFFFFF
    except OSError:
        fingerprint = 0
    return json.dumps(
        {"input": input_path, "fingerprint": fingerprint, "code": code_version},
        sort_keys=True,
    )


def ledger_trend(ledger: DataFrame, warn: float = 0.10,
                 alert: float = 0.25) -> DataFrame:
    """Cross-run metric drift from the append-only ledger — the payoff of
    carrying metrics in the checkpoint rows (north rule: "per-partition
    lineage + stats metrics"): for every (partition, check, metric),
    compare the LATEST run's value against the PREVIOUS run's and emit a
    GREEN/YELLOW/RED trend verdict, so a partition whose null-rate or row
    count silently jumped between ingests is flagged without rescanning
    any data.

    Rules (relative change r = (cur − prev) / |prev|):
    - no previous run         → NEW (nothing to compare)
    - prev = 0                → GREEN iff cur = 0, else RED
    - |r| ≤ warn              → GREEN
    - |r| ≤ alert             → YELLOW
    - else                    → RED

    Scale shape: the ledger is |partitions| × |checks| × |runs| rows —
    metadata-sized by construction — so the rank window and the
    metric-key join are trivial at any corpus size; nothing here touches
    the data itself.
    """
    w = Window.partitionBy("partition_id", "check_name").orderBy(
        F.col("updated_at").desc())
    ranked = (ledger.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= 2))
    m = ranked.select(
        "partition_id", "check_name", "__rn",
        F.explode(F.from_json("metrics_json", "map<string,double>"))
        .alias("metric", "value"))
    cur = (m.filter(F.col("__rn") == 1)
           .select("partition_id", "check_name", "metric",
                   F.col("value").alias("cur")))
    prev = (m.filter(F.col("__rn") == 2)
            .select("partition_id", "check_name", "metric",
                    F.col("value").alias("prev")))
    j = cur.join(prev, ["partition_id", "check_name", "metric"], "left")
    rel = (F.col("cur") - F.col("prev")) / F.abs(F.col("prev"))
    verdict = (
        F.when(F.col("prev").isNull(), "NEW")
        .when(F.col("prev") == 0.0,
              F.when(F.col("cur") == 0.0, "GREEN").otherwise("RED"))
        .when(F.abs(rel) <= F.lit(warn), "GREEN")
        .when(F.abs(rel) <= F.lit(alert), "YELLOW")
        .otherwise("RED"))
    return j.select(
        "partition_id", "check_name", "metric", "prev", "cur",
        F.when(F.col("prev").isNotNull() & (F.col("prev") != 0.0), rel)
        .alias("rel_change"),
        verdict.alias("trend"))
