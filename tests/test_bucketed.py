"""Bucketed-table co-located joins: the storage-level answer to the
north rule's "partitioning / shuffle handled explicitly" at 10^12 rows —
two tables bucketed by the same key join with zero Exchange operators
(and, bucket-sorted, zero Sorts), so the repeated clips-vs-manifest
referential join never re-shuffles the corpus."""

import pytest
from pyspark.sql import functions as F

from json_spark.sources.tables import write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS btest LOCATION '{tmp_path}'")
    left = spark.range(2000).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        (F.col("id") % 7).alias("codec_id"))
    right = spark.range(0, 2000, 2).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        F.lit("t").alias("transcript"))
    write_bucketed(left, "btest.clips_b", "clip_id", 8)
    write_bucketed(right, "btest.manifest_b", "clip_id", 8)
    yield "btest.clips_b", "btest.manifest_b"
    spark.sql("DROP DATABASE btest CASCADE")


def test_bucketed_join_no_exchange_no_sort(spark, bucketed_pair):
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # since SPARK-28595 the scan only REPORTS bucket sort order behind
    # this flag (planning must list files to prove one-file-per-bucket,
    # which write_bucketed guarantees); without it the join is still
    # Exchange-free but re-sorts each bucket
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
                   "true")
    try:
        j = spark.table(lt).join(spark.table(rt), "clip_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan       # co-located by bucket spec
        assert "+- Sort [" not in plan      # co-ordered within buckets
        # and the join is actually correct
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucketed_agg_no_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    # a groupBy on the bucket key also rides the existing distribution
    g = spark.table(lt).groupBy("clip_id").agg(F.count(F.lit(1)).alias("n"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert g.count() == 2000


def test_unbucketed_join_does_shuffle(spark, tmp_path):
    """Control: the same join WITHOUT bucketing must exchange both sides
    — proving the zero-Exchange plan above comes from the bucket spec,
    not from some session-wide setting."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = str(tmp_path / "a"); b = str(tmp_path / "b")
        spark.range(500).select(F.col("id").alias("k")).write.parquet(a)
        spark.range(500).select(F.col("id").alias("k")).write.parquet(b)
        j = spark.read.parquet(a).join(spark.read.parquet(b), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
