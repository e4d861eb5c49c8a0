"""Partition pruning evidence on the hive-partitioned clips layout.

The north rule's table is Iceberg-partitioned; the sandbox twin is
hive-style parquet partitioning by codec (fixtures/gen.py:write_fixtures).
These tests pin that (a) a static codec predicate reaches the file index
as PartitionFilters — Catalyst's free partition pruning — and (b) the
suite's resume path (plans/suite.py:prune_to_pending) produces exactly
that shape when few partitions are pending, so a 99%-done resume skips
the finished partitions' FILES, not just their rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_spark.fixtures.gen import write_fixtures
from json_spark.plans.suite import prune_to_pending


@pytest.fixture(scope="module")
def part_clips(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("partclips"))
    write_fixtures(spark, d, 400, partitions=4)
    return spark.read.parquet(f"{d}/clips")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _partition_filters(plan: str) -> list[str]:
    return [ln.strip() for ln in plan.splitlines()
            if "PartitionFilters" in ln]


def test_static_codec_filter_prunes_files(part_clips):
    plan = _executed_plan(part_clips.filter(F.col("codec") == "flac"))
    pf = _partition_filters(plan)
    assert pf and "codec" in pf[0] and "flac" in pf[0]
    # the predicate must NOT appear as a post-scan row filter instead
    assert "PushedFilters: []" in pf[0] or "PushedFilters" in plan


def test_resume_literal_path_prunes_files(part_clips, spark):
    """Few pending partitions → literal IN-predicate → PartitionFilters
    carries the codec list, finished partitions' files are never read."""
    pending = spark.createDataFrame([("flac",), ("opus",)],
                                    "partition_id string")
    work, n = prune_to_pending(part_clips, pending, "codec")
    assert n == 2
    pf = _partition_filters(_executed_plan(work.groupBy("codec").count()))
    assert pf, "scan lost its PartitionFilters"
    assert "flac" in pf[0] and "opus" in pf[0]
    got = {r.codec for r in work.select("codec").distinct().collect()}
    assert got == {"flac", "opus"}


def test_resume_empty_pending_short_circuits(part_clips, spark):
    pending = spark.createDataFrame([], "partition_id string")
    work, n = prune_to_pending(part_clips, pending, "codec")
    assert n == 0 and work.count() == 0


def test_resume_fallback_semi_join_beyond_ceiling(part_clips, spark):
    """Past the literal ceiling the semi-join path keeps ids
    executor-side and stays row-correct (no PartitionFilters claim)."""
    pending = spark.createDataFrame([("flac",), ("opus",)],
                                    "partition_id string")
    work, n = prune_to_pending(part_clips, pending, "codec",
                               max_literal=1)
    assert n == 2  # "at least max_literal+1" marker
    got = {r.codec for r in work.select("codec").distinct().collect()}
    assert got == {"flac", "opus"}
