"""Compaction planning (operators/profiling.py:compaction_plan).

The report must equal a brute-force replay of the greedy largest-first
cumsum packing, and must be invariant to tie order among equal-sized
files (the property the SQL oracle relies on).
"""

from __future__ import annotations

import pytest

from json_spark.operators.profiling import compaction_plan


def _brute_force(counts: dict[str, list[int]], target: int) -> dict:
    out = {}
    for part, ns in counts.items():
        bins: dict[int, list[int]] = {}
        cum = 0
        for n in sorted(ns, reverse=True):
            b = cum // target
            bins.setdefault(b, []).append(n)
            cum += n
        out[part] = {
            "n_files_before": len(ns),
            "n_rows": sum(ns),
            "n_files_after": len(bins),
            "n_merge_tasks": sum(1 for fs in bins.values() if len(fs) > 1),
            "max_bin_rows": max(sum(fs) for fs in bins.values()),
        }
    return out


@pytest.mark.parametrize("target", [5, 17, 1000])
def test_plan_matches_brute_force(spark, target):
    layout = {
        "en": [12, 12, 3, 3, 3, 1],   # ties exercise order-invariance
        "de": [40],                   # one big file: nothing to merge
        "fr": [1, 1, 1, 1, 1, 1, 1],  # all tiny
    }
    rows = [(part, f"{part}-f{i}")
            for part, ns in layout.items()
            for i, n in enumerate(ns)
            for _ in range(n)]
    df = spark.createDataFrame(rows, "part string, file string")
    got = {r["part"]: r for r in
           compaction_plan(df, target_rows=target,
                           partition_cols=["part"],
                           path_col="file").collect()}
    want = _brute_force(layout, target)
    assert set(got) == set(want)
    for part, w in want.items():
        g = got[part]
        for k, v in w.items():
            assert g[k] == v, (part, k, g[k], v)


def test_single_giant_file_is_noop(spark):
    df = spark.createDataFrame([("p", "f0")] * 100,
                               "part string, file string")
    r = compaction_plan(df, target_rows=10, partition_cols=["part"],
                        path_col="file").collect()[0]
    assert r["n_files_before"] == r["n_files_after"] == 1
    assert r["n_merge_tasks"] == 0 and r["max_bin_rows"] == 100


def test_window_is_partitioned_never_global(spark):
    # the VERDICT-r2 profiling lesson: no single-partition Exchange on a
    # high-cardinality partition key
    rows = [(f"p{i % 64}", f"f{i}") for i in range(512)]
    df = spark.createDataFrame(rows, "part string, file string")
    plan = compaction_plan(df, target_rows=3, partition_cols=["part"],
                           path_col="file")
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in phys
    assert plan.count() == 64
