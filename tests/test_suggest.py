"""Constraint suggestion (operators/suggest.py).

Two pinned properties: (1) the rendered suggestions match a brute-force
profile of the input; (2) the CLOSURE property — every executable
suggested rule passes on the data it was derived from (domain_rollup
over the same frame is all-GREEN).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from json_spark.operators.domain import domain_rollup
from json_spark.operators.suggest import (
    constraint_suggestions,
    suggest_domain_rules,
)

ROWS = [
    (1, "alpha", "en", 7.5),
    (2, "beta", "en", 1.0),
    (3, "gamma\nline2", "de", 3.25),
    (4, None, "de", None),
    (5, "epsilon", "fr", 2.0),
]
SCHEMA = "id long, body string, lang string, score double"


def _suggest_map(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = constraint_suggestions(df, ["id", "body", "lang", "score"],
                                 categorical_max=3)
    return {(r["column"], r["rule_type"]): r["rule"] for r in got.collect()}


def test_rendered_suggestions(spark):
    m = _suggest_map(spark)
    assert m[("id", "not_null")] == "id IS NOT NULL"
    assert m[("id", "unique")] == "id is unique"
    assert m[("id", "range")] == "id BETWEEN 1 AND 5"
    # 1 null of 5 -> rate 0.2 * 1.25 = 0.25 exactly
    assert m[("body", "null_rate_max")] == "0.2500"
    assert m[("body", "unique")] == "body is unique"
    assert m[("body", "max_length")] == "length(body) <= 11"
    assert m[("lang", "in_set")] == "lang IN ('de', 'en', 'fr')"
    assert m[("score", "range")] == "score BETWEEN 1 AND 7.5"
    assert ("lang", "unique") not in m          # 3 distinct of 5
    assert ("id", "in_set") not in m            # 5 > categorical_max
    assert ("body", "not_null") not in m        # has a null


def test_closure_suggested_rules_pass_on_source(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rules = suggest_domain_rules(df, ["id", "body", "lang", "score"],
                                 categorical_max=3)
    assert rules  # not_null/range/in_set/max_length all represented
    kinds = {r.name.split(":")[1] for r in rules}
    assert {"not_null", "range", "in_set", "max_length"} <= kinds
    # body has a null so no not_null rule for it; nulls PASS pattern
    # rules under SQL CHECK semantics, so the rollup must be all-green
    rolled = domain_rollup(df.withColumn("part", F.lit("p0")), rules,
                           ["part"]).collect()
    for r in rolled:
        assert r["n_red"] == 0 and r["n_yellow"] == 0, r


def test_closure_on_real_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules = suggest_domain_rules(
        docs, ["doc_id", "text", "lang", "source", "n_chars"])
    rolled = domain_rollup(docs.withColumn("part", F.col("lang")), rules,
                           ["part"]).collect()
    assert rolled
    for r in rolled:
        assert r["n_red"] == 0 and r["n_yellow"] == 0, r


def test_violation_after_drift(spark):
    """A suggested rule must actually FIRE on out-of-profile data."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    rules = suggest_domain_rules(df, ["lang"], categorical_max=3)
    drifted = spark.createDataFrame([(9, "zeta", "xx", 0.5)], SCHEMA)
    rolled = domain_rollup(drifted.withColumn("part", F.lit("p")), rules,
                           ["part"]).collect()
    fired = {r["check_name"]: r for r in rolled}
    assert fired["suggested:in_set:lang"]["n_red"] == 1


def test_empty_and_allnull_columns(spark):
    df = spark.createDataFrame([(None,), (None,)], "x int")
    m = {(r["column"], r["rule_type"]): r["rule"]
         for r in constraint_suggestions(df, ["x"]).collect()}
    # all-null: only the null-rate suggestion (1.0 capped), no range/set
    assert m == {("x", "null_rate_max"): "1.0000"}
    empty = spark.createDataFrame([], "x int")
    assert constraint_suggestions(empty, ["x"]).collect() == [
        # zero rows: vacuously not-null; nothing else is derivable
    ] or [r["rule_type"] for r in
          constraint_suggestions(empty, ["x"]).collect()] == ["not_null"]
