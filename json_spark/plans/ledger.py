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
