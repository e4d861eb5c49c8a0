"""SparkSession factory tuned for the validation engine.

Every knob here is a scale decision:

- AQE on (coalesce + skew-join) — runtime re-planning is how a 1000-executor
  job survives skewed codec keys without hand-tuning every stage.
- Arrow on — the SNR stage moves binary audio through pandas UDFs; Arrow
  batching is the difference between 10x and 1000x slower than JVM.
- shuffle.partitions sized to cores locally; on a real cluster this is set
  per-job (or left to AQE's coalescing with a high initial value).
- ANSI semantics: the engine never relies on silent-null casts — all coercion
  expressions use try_* forms so they behave identically whether the session
  is ANSI (Spark 4 default) or not. We do NOT flip ansi.enabled here because
  the driver's verify may hand us an arbitrary session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "json_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession; on a cluster, spark-submit supplies master."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
