"""KLL quantile sketch (functions/kll.py): error bounds, merge law,
determinism, serialization — and the Spark integration twin
(operators/stats.py:kll_quantiles) matching the local fold exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_spark.functions.kll import KLL


def _rank_err(sk: KLL, data: np.ndarray, ps) -> float:
    """Worst distance from p to the TRUE RANK INTERVAL of the returned
    value — with ties a value occupies [lo, hi] of the rank axis, and
    any p inside that interval is exact."""
    srt = np.sort(data)
    worst = 0.0
    for p in ps:
        est = sk.quantile(p)
        lo = np.searchsorted(srt, est, side="left") / len(srt)
        hi = np.searchsorted(srt, est, side="right") / len(srt)
        worst = max(worst, 0.0 if lo <= p <= hi else min(abs(p - lo),
                                                         abs(p - hi)))
    return worst


PS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal",
                                  "sorted", "reversed", "constant"])
def test_rank_error_bound(dist):
    rng = np.random.default_rng(42)
    n = 200_000
    data = {
        "uniform": lambda: rng.uniform(0, 1, n),
        "normal": lambda: rng.normal(0, 1, n),
        "lognormal": lambda: rng.lognormal(0, 2, n),
        "sorted": lambda: np.arange(n, dtype=float),
        "reversed": lambda: np.arange(n, dtype=float)[::-1],
        "constant": lambda: np.full(n, 3.14),
    }[dist]()
    sk = KLL(k=200, seed=7)
    for chunk in np.array_split(data, 37):  # streaming insert
        sk.update(chunk)
    assert sk.n == n
    # k=200 => epsilon well under 1%; assert a conservative 2%
    assert _rank_err(sk, data, PS) < 0.02, dist


def test_deterministic_rebuild():
    rng = np.random.default_rng(1)
    data = rng.normal(size=50_000)
    a = KLL(k=128, seed=99).update(data)
    b = KLL(k=128, seed=99).update(data)
    assert a.quantiles(PS) == b.quantiles(PS)
    assert a.to_bytes() == b.to_bytes()


def test_merge_law_error_bound():
    """Merging per-batch sketches answers within the same bound as the
    single-pass sketch, for any batching."""
    rng = np.random.default_rng(5)
    data = rng.lognormal(0, 1, 120_000)
    for n_parts in (2, 7, 32):
        parts = np.array_split(data, n_parts)
        merged = KLL(k=200, seed=0)
        for i, part in enumerate(parts):
            merged.merge(KLL(k=200, seed=1000 + i).update(part))
        assert merged.n == len(data)
        assert _rank_err(merged, data, PS) < 0.02, n_parts
    with pytest.raises(ValueError):
        KLL(k=64).merge(KLL(k=128))


def test_space_bound():
    sk = KLL(k=200, seed=3)
    rng = np.random.default_rng(3)
    for _ in range(50):
        sk.update(rng.uniform(0, 1, 20_000))
    stored = sum(len(b) for b in sk.levels)
    assert sk.n == 1_000_000
    # O(k log(n/k)): generous cap well under the raw stream
    assert stored <= 2 * sk._capacity() and stored < 3000


def test_nan_and_empty():
    sk = KLL(k=64)
    assert np.isnan(sk.quantile(0.5))
    sk.update([np.nan, np.nan])
    assert sk.n == 0 and np.isnan(sk.quantile(0.5))
    sk.update([1.0, np.nan, 2.0])
    assert sk.n == 2 and sk.quantile(1.0) == 2.0


def test_serialization_roundtrip():
    rng = np.random.default_rng(11)
    sk = KLL(k=96, seed=5).update(rng.normal(size=30_000))
    rt = KLL.from_bytes(sk.to_bytes())
    assert rt.n == sk.n and rt.k == sk.k
    assert rt.quantiles(PS) == sk.quantiles(PS)
    # a restored sketch keeps ingesting identically
    more = rng.uniform(-5, 5, 10_000)
    assert (sk.update(more).to_bytes() == rt.update(more).to_bytes())


def test_rank_query():
    data = np.arange(100_000, dtype=float)
    sk = KLL(k=200, seed=2).update(data)
    for x, want in ((0.0, 0.0), (50_000.0, 0.5), (99_999.0, 1.0)):
        assert abs(sk.rank(x) - want) < 0.02


def test_spark_kll_matches_local_fold_and_exact(spark, sf_dir):
    """The Spark path (per-partition mapInArrow states + one bounded
    merge) must equal a LOCAL fold with the same seeds exactly, and sit
    within the rank bound of the exact quantiles."""
    from json_spark.operators.stats import (
        kll_merge_quantiles,
        kll_partition_states,
        kll_quantiles,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    probs = [0.25, 0.5, 0.75]
    got = {r["p"]: r for r in
           kll_quantiles(li, "l_extendedprice", probs, k=200).collect()}

    # local twin: same per-partition streams, same seeds, and the same
    # ADAPTIVE fold rule as kll_merge_quantiles — a single byte-order
    # fold at or below the shard threshold, else the two-level tree
    # (crc32-content shard -> byte-order fold per shard -> byte-order
    # fold over shard states)
    import zlib

    def tree_fold(blobs, shards=64):
        if len(blobs) <= shards:          # the adaptive single-level path
            acc = KLL(k=200, seed=0)
            for blob in sorted(blobs):
                acc.merge(KLL.from_bytes(blob))
            return acc
        by_shard = {}
        for blob in blobs:
            by_shard.setdefault(zlib.crc32(blob) % shards, []).append(blob)
        shard_states = []
        for s, group in by_shard.items():
            a = KLL(k=200, seed=0)
            for blob in sorted(group):
                a.merge(KLL.from_bytes(blob))
            shard_states.append(a.to_bytes())
        acc = KLL(k=200, seed=0)
        for blob in sorted(shard_states):
            acc.merge(KLL.from_bytes(blob))
        return acc

    vals = li.select(F.spark_partition_id().alias("pid"),
                     F.col("l_extendedprice").cast("double").alias("v"))
    by_pid = {}
    for r in vals.collect():
        by_pid.setdefault(r["pid"], []).append(r["v"])
    local_states = sorted(
        KLL(k=200, seed=pid).update(np.array(by_pid[pid])).to_bytes()
        for pid in by_pid)
    acc = tree_fold(local_states)
    for p in probs:
        assert got[p]["value"] == acc.quantile(p), p
        assert got[p]["n"] == acc.n

    # and the states themselves match the local sketches byte-for-byte
    states = sorted(
        bytes(r["state"]) for r in
        kll_partition_states(li, "l_extendedprice", k=200).collect())
    local = sorted(
        KLL(k=200, seed=pid).update(np.array(by_pid[pid])).to_bytes()
        for pid in by_pid)
    assert states == local

    # exact-quantile sanity: within the k=200 rank bound
    data = np.array([v for vs in by_pid.values() for v in vs
                     if v is not None])
    assert _rank_err(acc, data[~np.isnan(data)], probs) < 0.02

    # merge via the dedicated helper agrees with the e2e path
    merged = {r["p"]: r["value"] for r in kll_merge_quantiles(
        kll_partition_states(li, "l_extendedprice", k=200),
        probs, k=200).collect()}
    assert merged == {p: got[p]["value"] for p in probs}


def test_tree_merge_bounded_and_rebuild_deterministic(spark, sf_dir):
    """The two-level fold's root task sees <= ``shards`` states (the
    r3 perf-weak fix: last-task cost O(P/shards) + O(shards), never
    O(P)), and the whole pipeline is bit-identical on rebuild —
    including with a shard count far below the partition count, which
    forces real multi-state shard folds."""
    from json_spark.operators.stats import (
        kll_merge_quantiles,
        kll_partition_states,
    )

    # force a multi-partition scan so the fold really merges many states
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
    states = kll_partition_states(li, "l_extendedprice", k=200)
    n_states = states.count()

    # level-1 output is bounded by the shard count
    sharded = states.withColumn(
        "__shard", F.pmod(F.crc32("state"), F.lit(4)))
    assert sharded.select("__shard").distinct().count() <= 4

    probs = [0.1, 0.5, 0.9]
    a = kll_merge_quantiles(states, probs, k=200, shards=4).collect()
    b = kll_merge_quantiles(
        kll_partition_states(li, "l_extendedprice", k=200),
        probs, k=200, shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert n_states >= 2  # the fixture really exercises a multi-state fold
