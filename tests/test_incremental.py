"""Incremental merge operators (operators/incremental.py): merged
per-batch states must equal direct single-pass computation — exactly for
moments, sketch-identical for HLL distinct counts — and be invariant to
how the data was batched."""

from pyspark.sql import functions as F

from json_spark.operators.incremental import (
    merge_distinct_sketches,
    merge_moments,
    partial_distinct_sketch,
    partial_moments,
)


def _events(spark, n=4000):
    return spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.when(F.col("id") % 37 == 0, None)
        .otherwise((F.col("id") * 7919 % 1000) / 10.0).alias("v"),
        F.col("id").alias("rid"))


def _merged(df, n_batches):
    p = partial_moments(
        df.withColumn("batch", F.pmod("rid", F.lit(n_batches))),
        "v", "batch", ["g"])
    return {r["g"]: r.asDict() for r in merge_moments(p, ["g"]).collect()}


def test_merged_moments_equal_direct(spark):
    df = _events(spark)
    direct = {r["g"]: r.asDict() for r in df.groupBy("g").agg(
        F.count("v").alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev_samp("v"), 6).alias("stddev"),
        F.round(F.min("v"), 6).alias("min_value"),
        F.round(F.max("v"), 6).alias("max_value")).collect()}
    got = _merged(df, 6)
    assert got == direct


def test_merged_moments_invariant_to_batching(spark):
    df = _events(spark)
    assert _merged(df, 2) == _merged(df, 13)


def test_sketch_union_equals_single_pass_and_bounds_exact(spark):
    df = _events(spark)
    merged = merge_distinct_sketches(
        partial_distinct_sketch(df.withColumn("batch",
                                              F.pmod("rid", F.lit(6))),
                                "rid", "batch")).collect()[0]
    single = df.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("rid", F.lit(12))).alias("est")).collect()[0]["est"]
    exact = df.select("rid").distinct().count()
    # incrementality costs zero accuracy: union == single-pass estimate
    assert merged["distinct_estimate"] == single
    assert merged["n_batches"] == 6
    assert merged["n_rows"] == df.count()
    # and the HLL estimate itself is within the lg_k=12 error bound
    assert abs(merged["distinct_estimate"] - exact) / exact < 0.05


def test_merged_histogram_psi_equals_direct(spark):
    """Drift merge law: PSI over the fold of per-batch histogram states
    equals PSI over a single-pass histogram, for ANY batching."""
    from json_spark.operators.drift import histogram, psi
    from json_spark.operators.incremental import (
        merge_histogram_states,
        partial_histogram,
    )

    df = _events(spark)
    base = histogram(df.filter(F.col("rid") % 2 == 1), "v", 0.0, 100.0, 10)
    cur = df.filter(F.col("rid") % 2 == 0)
    direct = psi(histogram(cur, "v", 0.0, 100.0, 10), base,
                 on=["bucket"]).collect()[0]["psi"]
    for nb in (1, 4, 17):
        states = partial_histogram(
            cur.withColumn("batch", F.pmod("rid", F.lit(nb))),
            "v", 0.0, 100.0, 10, "batch")
        merged = merge_histogram_states(states)
        got = psi(merged, base, on=["bucket"]).collect()[0]["psi"]
        assert got == direct, (nb, got, direct)
        # state volume is bounded by batches x bins, not rows
        assert states.count() <= nb * 10
