"""Property-based round-trip: dirtify ∘ coerce == identity.

Port of the reference's strongest correctness statement
(internal/dirtytesting/dirtytesting_test.go:56-92 — 1000 randomized
dirtification round-trips must decode back to the clean value). The
dirtifier mirrors internal/dirtytesting/dirtyfier.go semantics
(bool→string/number 151-258, number→string 261-312, spacing/commas
within what the config forgives) re-implemented fresh in Python; the
engine must recover the clean value and assign YELLOW (or GREEN when
the corruption happens to be the identity).

Vectorized: all N cases are one DataFrame, one coercion projection,
one collect — the Spark-native shape of a 1000-iteration Go loop.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_spark.config import default_config
from json_spark.functions.coercion import (
    coerce_bool,
    coerce_integer,
    coerce_number,
)

CFG = default_config()
N = 1200
SEED = 20260817


def _dirty_number_cases(rng: np.random.Generator):
    """(raw_string, expected_double) pairs, recoverable by default rules."""
    cases = []
    for _ in range(N):
        v = float(np.round(rng.uniform(-1e6, 1e6), 3))
        style = rng.integers(0, 4)
        if style == 0:          # plain stringified
            raw = repr(v)
        elif style == 1:        # surrounding spaces (SpacingAllowed)
            raw = f"  {v!r} "
        elif style == 2:        # thousands commas (CommasAllowed)
            raw = f"{v:,.3f}"
        else:                   # exponent notation
            raw = f"{v:e}"
            v = float(raw)      # formatting may round — truth follows raw
        cases.append((raw, v))
    return cases

def _dirty_int_cases(rng: np.random.Generator):
    cases = []
    for _ in range(N):
        v = int(rng.integers(-10**9, 10**9))
        style = rng.integers(0, 3)
        if style == 0:
            raw = str(v)
        elif style == 1:
            raw = f" {v} "
        else:                   # float-string with .0 → floor recovers v
            raw = f"{v}.0"
        cases.append((raw, v))
    return cases


def _dirty_bool_cases(rng: np.random.Generator):
    true_forms = ["true", "TRUE", "True", "yes", "YES", "on", "On", "1"]
    false_forms = ["false", "FALSE", "False", "no", "NO", "off", "OFF", "0", ""]
    cases = []
    for _ in range(N):
        v = bool(rng.integers(0, 2))
        forms = true_forms if v else false_forms
        raw = forms[int(rng.integers(0, len(forms)))]
        cases.append((raw, v))
    return cases


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(SEED)


def test_number_roundtrip_property(spark, rng):
    cases = _dirty_number_cases(rng)
    df = spark.createDataFrame(cases, "raw string, expected double")
    res = coerce_number(F.col("raw"), CFG)
    bad = df.select(
        "raw", "expected", res.coerced.alias("got"), res.verdict.alias("verdict")
    ).filter(
        (F.col("got").isNull())
        | (F.abs(F.col("got") - F.col("expected")) > 1e-9)
        | (F.col("verdict") == "RED")
    ).collect()
    assert not bad, f"{len(bad)} of {N} failed, e.g. {bad[:3]}"


def test_integer_roundtrip_property(spark, rng):
    cases = _dirty_int_cases(rng)
    df = spark.createDataFrame(cases, "raw string, expected long")
    res = coerce_integer(F.col("raw"), CFG)
    bad = df.select(
        "raw", "expected", res.coerced.alias("got"), res.verdict.alias("verdict")
    ).filter(
        (F.col("got").isNull()) | (F.col("got") != F.col("expected"))
        | (F.col("verdict") == "RED")
    ).collect()
    assert not bad, f"{len(bad)} of {N} failed, e.g. {bad[:3]}"


def test_bool_roundtrip_property(spark, rng):
    cases = _dirty_bool_cases(rng)
    df = spark.createDataFrame(cases, "raw string, expected boolean")
    res = coerce_bool(F.col("raw"), CFG)
    bad = df.select(
        "raw", "expected", res.coerced.alias("got"), res.verdict.alias("verdict")
    ).filter(
        (F.col("got").isNull()) | (F.col("got") != F.col("expected"))
        | (F.col("verdict") == "RED")
    ).collect()
    assert not bad, f"{len(bad)} of {N} failed, e.g. {bad[:3]}"


def test_red_cases_stay_red(spark):
    """Unrecoverable garbage must be RED with null coercion — never a
    silent wrong value (result.go:4-18 'lossy' semantics)."""
    garbage = [("12x3",), ("--5",), ("[1,2]",), ("{'a':1}",), ("nan.5",)]
    df = spark.createDataFrame(garbage, "raw string")
    for fn in (coerce_number, coerce_integer):
        res = fn(F.col("raw"), CFG)
        rows = df.select(res.coerced.alias("c"), res.verdict.alias("v")).collect()
        assert all(r["v"] == "RED" and r["c"] is None for r in rows), fn.__name__
