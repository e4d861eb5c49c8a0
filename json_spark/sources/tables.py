"""Table loading: Iceberg when available, parquet fallback.

Production target is an Iceberg catalog (per-partition pruning, snapshot
lineage for the checkpoint ledger); the sandbox image has no Iceberg jars,
so the path-based parquet fallback is what tests exercise. The API keeps
the two behind one call so the engine code never branches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table: Iceberg identifier (``db.table``) if a catalog is
    configured and the identifier exists, else ``{sf_dir}/{name}.parquet``."""
    catalog = spark.conf.get("spark.sql.catalog.spark_catalog", None)
    if catalog and "iceberg" in str(catalog).lower():  # pragma: no cover
        try:
            return spark.read.table(name)
        except Exception:
            pass
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TPCH_TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
