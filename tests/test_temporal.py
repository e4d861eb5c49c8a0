"""Temporal joins / rollup (operators/temporal.py) and packing
(operators/packing.py) vs brute-force twins on adversarial small inputs:
equal-timestamp ties, empty right sides, multi-bucket intervals, and
batch-boundary arithmetic."""

import pytest
from pyspark.sql import functions as F

from json_spark.operators.packing import (
    assign_split, hash32, pack_batches,
)
from json_spark.operators.temporal import (
    asof_join, range_join_bucketed, time_rollup,
)


def _brute_asof(left_rows, right_rows):
    # latest right with right.us <= left.us per key; ties on us -> max tie
    out = {}
    for k, lus, lid in left_rows:
        cand = [(rus, tie, rv) for rk, rus, tie, rv in right_rows
                if rk == k and rus <= lus]
        out[lid] = max(cand)[2] if cand else None
    return out


def test_asof_join_matches_bruteforce_with_ties(spark):
    left = [(1, 10, "a"), (1, 5, "b"), (1, 3, "c"), (2, 7, "d"), (3, 1, "e")]
    # key 1 has TWO right rows at us=5 (tiebreak picks tie=9);
    # key 3 has no right rows at all
    right = [(1, 4, 1, 100), (1, 5, 2, 200), (1, 5, 9, 250), (1, 10, 3, 300),
             (2, 8, 4, 400)]
    ldf = spark.createDataFrame(left, "k int, us long, lid string")
    rdf = spark.createDataFrame(right, "k int, us long, tie int, rv int")
    got = {r["lid"]: r["rv"] for r in
           asof_join(ldf, rdf, on=["k"], ts="us", tiebreak="tie").collect()}
    assert got == _brute_asof(left, right)
    # us=10 left matches us=10 right (<= semantics); us=5 tie -> 250
    assert got["a"] == 300 and got["b"] == 250
    assert got["e"] is None


def test_asof_join_carries_multiple_payload_columns(spark):
    ldf = spark.createDataFrame([(1, 10, "x")], "k int, us long, lid string")
    rdf = spark.createDataFrame([(1, 4, 7, "p")],
                                "k int, us long, rv int, tag string")
    row = asof_join(ldf, rdf, on=["k"], ts="us").collect()[0]
    assert (row["rv"], row["tag"], row["lid"]) == (7, "p", "x")


def test_range_join_bucketed_vs_bruteforce(spark):
    # intervals of varying length, some spanning several buckets, some
    # empty; points at exact boundaries (start inclusive, end exclusive)
    points = [(1, i, f"p{i}") for i in range(0, 100, 7)]
    intervals = [(1, 0, 7, "i0"),      # [0,7) catches p0
                 (1, 7, 8, "i1"),      # [7,8) catches p7 (start inclusive)
                 (1, 10, 50, "i2"),    # multi-bucket
                 (1, 49, 49, "i3"),    # empty interval
                 (2, 0, 100, "i4")]    # wrong key: catches nothing
    pdf = spark.createDataFrame(points, "k int, us long, pid string")
    idf = spark.createDataFrame(intervals,
                                "k int, start_us long, end_us long, iid string")
    got = {(r["pid"], r["iid"]) for r in
           range_join_bucketed(pdf, idf, on=["k"], point_us="us",
                               bucket_us=16).collect()}
    want = {(f"p{p}", iid) for k, p, _ in [(k, us, None) for k, us, _ in points]
            for ik, s, e, iid in intervals if ik == k and s <= p < e}
    assert got == want
    assert ("p7", "i1") in got and ("p0", "i0") in got
    assert not any(i == "i3" or i == "i4" for _, i in got)


def test_range_join_pairs_unique(spark):
    # a (point, interval) pair must appear exactly once even when the
    # interval spans many buckets
    pdf = spark.createDataFrame([(1, 500, "p")], "k int, us long, pid string")
    idf = spark.createDataFrame([(1, 0, 1000, "i")],
                                "k int, start_us long, end_us long, iid string")
    rows = range_join_bucketed(pdf, idf, on=["k"], point_us="us",
                               bucket_us=16).collect()
    assert len(rows) == 1


def test_time_rollup_levels_equal_direct_aggregation(spark):
    df = spark.createDataFrame(
        [(i % 3, i * 37, float(i)) for i in range(200)],
        "g int, us long, v double")
    out = time_rollup(df, "us", ["g"], "v", [100, 1000, 10000])
    for lv in (100, 1000, 10000):
        got = {(r["bucket_us"], r["g"]): (r["n"], round(r["sum_value"], 6))
               for r in out.filter(F.col("level_us") == lv).collect()}
        want = {(r["b"], r["g"]): (r["n"], round(r["s"], 6)) for r in
                df.groupBy((F.floor(F.col("us") / lv).cast("long") * lv)
                           .alias("b"), "g")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
                .collect()}
        assert got == want


def test_time_rollup_rejects_non_nesting_levels(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "g int, us long, v double")
    with pytest.raises(ValueError):
        time_rollup(df, "us", ["g"], "v", [100, 250])


def test_pack_batches_boundaries_and_conservation(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i * 53) % 400) for i in range(500)],
        "doc_id long, tok int").withColumn("lang", F.lit("en"))
    batches = pack_batches(df, "doc_id", "tok", ["lang"], budget=1000,
                           n_shards=4).collect()
    # conservation: every token lands in exactly one batch
    assert sum(b["batch_tokens"] for b in batches) == \
        df.agg(F.sum("tok")).collect()[0][0]
    by_shard = {}
    for b in batches:
        by_shard.setdefault(b["shard"], []).append(b)
    for shard, bs in by_shard.items():
        bs.sort(key=lambda b: b["batch_id"])
        # batch ids are the offset rule: contiguous from 0
        assert [b["batch_id"] for b in bs] == list(range(len(bs)))
        # every batch except the last crosses the budget line, and
        # overflows it by less than its final doc (offset rule bound)
        for b in bs[:-1]:
            assert b["batch_tokens"] >= 1000 - 499  # budget - max doc + 1
            assert b["batch_tokens"] < 1000 + 499


def test_assign_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    counts = dict(df.select(assign_split(F.col("id")).alias("s"))
                  .groupBy("s").count().collect())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 0.9 * 2000
    # same id -> same split, independent of row order or partitioning
    again = dict(df.repartition(7).select(
        F.col("id"), assign_split(F.col("id")).alias("s")).collect())
    once = dict(df.select(
        F.col("id"), assign_split(F.col("id")).alias("s")).collect())
    assert again == once


def test_hash32_matches_duckdb(spark):
    import duckdb
    ids = [f"x{i}" for i in range(50)]
    got = {r["v"]: r["h"] for r in spark.createDataFrame(
        [(s,) for s in ids], "v string")
        .select("v", hash32(F.col("v"), "salt:").alias("h")).collect()}
    duck = dict(duckdb.execute(
        "SELECT v, ('0x' || substr(md5('salt:' || v), 1, 8))::BIGINT "
        "FROM (SELECT unnest(?) AS v)", [ids]).fetchall())
    assert got == duck


def test_coverage_gaps_planted(spark):
    from json_spark.operators.temporal import coverage_gaps
    # type A covers days 10..19 fully; type B misses days 13 and 17;
    # type C appears only on day 12 (edge types still judged on the
    # GLOBAL span 10..19)
    rows = ([("A", d) for d in range(10, 20)]
            + [("B", d) for d in range(10, 20) if d not in (13, 17)]
            + [("C", 12)])
    df = spark.createDataFrame(rows, "t string, day long")
    got = {r["t"]: r for r in
           coverage_gaps(df, ["t"], "day", yellow_ratio=0.75).collect()}
    assert (got["A"]["n_gaps"], got["A"]["verdict"]) == (0, "GREEN")
    assert (got["B"]["n_buckets_expected"], got["B"]["n_buckets_observed"],
            got["B"]["n_gaps"]) == (10, 8, 2)
    assert got["B"]["coverage"] == 0.8 and got["B"]["verdict"] == "YELLOW"
    assert (got["C"]["n_gaps"], got["C"]["verdict"]) == (9, "RED")


def test_sequence_inversions_planted(spark):
    from json_spark.operators.temporal import sequence_inversions
    rows = [
        # u1: ordered by seq, ts strictly forward -> 0 inversions, 2 pairs
        (1, 1, 100), (1, 2, 200), (1, 3, 300),
        # u2: one backward step (seq 2 has earlier ts than seq 1)
        (2, 1, 500), (2, 2, 400), (2, 3, 600),
        # u3: single row -> no pairs
        (3, 1, 50),
        # u4: equal timestamps are NOT inversions (strict <)
        (4, 1, 70), (4, 2, 70),
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, us long")
    r = sequence_inversions(df, "user_id", "seq", "us").collect()[0]
    assert (r["n_keys"], r["n_pairs"], r["n_inversions"]) == (4, 5, 1)
    assert r["inversion_rate"] == 0.2


def test_truncation_report_boundaries(spark):
    """truncation_report vs hand counts: a doc exactly AT the budget
    loses nothing (strict >), loss verdicts hit all three bands, and
    kept + lost always reconstructs the total."""
    from json_spark.operators.packing import truncation_report

    rows = (
        [("green", 10)] * 5 + [("green", 64)]            # nothing over
        + [("yellow", 60)] * 9 + [("yellow", 100)]       # 36/576 lost ~6.3%
        + [("red", 64)] + [("red", 200)]                 # 136/264 ~51%
    )
    df = spark.createDataFrame(rows, "src string, tok int")
    got = {r.src: r for r in
           truncation_report(df, "tok", ["src"], budget=64).collect()}
    g = got["green"]
    assert (g.docs_over, g.tokens_lost, g.verdict) == (0, 0, "GREEN")
    y = got["yellow"]
    assert (y.docs_over, y.tokens_lost, y.verdict) == (1, 36, "YELLOW")
    r = got["red"]
    assert (r.docs_over, r.tokens_lost, r.verdict) == (1, 136, "RED")
    for row in got.values():
        assert row.kept_tokens + row.tokens_lost == row.total_tokens


def test_hash_uniformity_detects_skew(spark):
    """hash_uniformity: md5 buckets of sequential ids are ~uniform
    (GREEN, chi2/B near 1); a deliberately skewed bucket assignment —
    simulated by feeding CONSTANT ids so everything lands in one
    bucket — is RED with the zero-count buckets grid-completed."""
    from pyspark.sql import functions as F

    from json_spark.operators.packing import hash_uniformity

    ids = spark.range(20_000).select(F.col("id").alias("doc_id"))
    rows = hash_uniformity(ids, "doc_id", n_buckets=16).collect()
    assert len(rows) == 16 and sum(r.n for r in rows) == 20_000
    assert all(r.verdict == "GREEN" for r in rows)
    assert rows[0].chi2_per_bucket < 2.0

    const = spark.range(1000).select(F.lit("same-id").alias("doc_id"))
    red = hash_uniformity(const, "doc_id", n_buckets=16).collect()
    assert len(red) == 16                       # grid-completed
    assert sum(1 for r in red if r.n == 0) == 15
    assert all(r.verdict == "RED" for r in red)
    # chi2/B for all mass in one bucket = (16-1)*n/16 /16 * ... >> 4
    assert red[0].chi2_per_bucket > 4.0


def test_autocorrelation_periodic_signal(spark):
    """A strictly period-2 count sequence (buckets alternate 10/0
    events) has autocorr ~ +1 at lag 2 and ~ -1 at lag 1."""
    from json_spark.operators.temporal import autocorrelation
    rows = []
    for m in range(0, 40):
        n = 10 if m % 2 == 0 else 0
        for i in range(n):
            rows.append((m * 60 + i,))  # i < 60 keeps events in minute m
    df = spark.createDataFrame(rows, "sec long").select(
        F.timestamp_seconds(F.col("sec")).cast("timestamp_ntz").alias("ts"))
    out = {r["lag"]: r for r in
           autocorrelation(df, "ts", lags=(1, 2)).collect()}
    assert out[2]["autocorr"] == 1.0
    assert out[1]["autocorr"] == -1.0
    # span is OBSERVED min..max: minute 39 has no events, so the grid
    # is 0..38 = 39 buckets -> 38 / 37 pairs
    assert out[1]["n_pairs"] == 38
    assert out[2]["n_pairs"] == 37


def test_autocorrelation_dense_grid_counts_missing_buckets(spark):
    """Buckets with no events participate as zeros: two events 10
    minutes apart give an 11-bucket grid, not a 2-bucket one."""
    from json_spark.operators.temporal import autocorrelation
    df = spark.createDataFrame([(0,), (600,)], "sec long").select(
        F.timestamp_seconds(F.col("sec")).cast("timestamp_ntz").alias("ts"))
    out = autocorrelation(df, "ts", lags=(1,)).collect()
    assert out[0]["n_pairs"] == 10
    assert out[0]["sum_x"] == 1  # bucket 0 contributes x=1 once


def test_freshness_bands_and_exact_lag(spark):
    from json_spark.operators.temporal import freshness
    rows = [("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 10:00:00"),
            ("b", "2024-01-01 09:30:00"), ("c", "2023-12-30 00:00:00")]
    df = spark.createDataFrame(rows, "g string, raw string").select(
        "g", F.col("raw").cast("timestamp_ntz").alias("ts"))
    out = {r["g"]: r for r in
           freshness(df, "ts", ["g"], as_of="2024-01-01 10:30:00",
                     yellow_minutes=45, red_minutes=1440).collect()}
    assert out["a"]["lag_minutes"] == 30 and out["a"]["verdict"] == "GREEN"
    assert out["b"]["lag_minutes"] == 60 and out["b"]["verdict"] == "YELLOW"
    assert out["c"]["lag_minutes"] == 3510 and out["c"]["verdict"] == "RED"
    assert out["a"]["n_rows"] == 2


def test_autocorrelation_constant_series_null_r(spark):
    """A constant count series has zero variance: r is undefined and
    reported null, never a 0/0 NaN."""
    from json_spark.operators.temporal import autocorrelation
    rows = [(m * 60,) for m in range(10)]     # exactly 1 event/minute
    df = spark.createDataFrame(rows, "sec long").select(
        F.timestamp_seconds(F.col("sec")).cast("timestamp_ntz").alias("ts"))
    out = autocorrelation(df, "ts", lags=(1,)).collect()[0]
    assert out["autocorr"] is None
    assert out["n_pairs"] == 9


def test_freshness_all_null_ts_is_red(spark):
    from json_spark.operators.temporal import freshness
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "2024-01-01 10:00:00")],
        "g string, raw string").select(
        "g", F.col("raw").cast("timestamp_ntz").alias("ts"))
    out = {r["g"]: r for r in
           freshness(df, "ts", ["g"], as_of="2024-01-01 10:30:00").collect()}
    assert out["a"]["verdict"] == "RED" and out["a"]["newest"] is None
    assert out["b"]["verdict"] == "GREEN"
