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


# --------------------------------------------------------------------------
# RandomConfig harness (dirtytesting.go:14-77): random rule sets × cases
# whose expected outcome is derived from the rule semantics, so flag
# interactions (spacing_allowed=False × inner spaces, rounding algorithms,
# custom bool lists, fallback vs RED, FromNull inverse) are exercised.
# --------------------------------------------------------------------------

import math

from json_spark.config.random import random_config

N_CONFIGS = 48


def _num_cases(cfg, rng):
    """(raw, expected_double) — expected None means RED."""
    nr = cfg.number_rules
    fs = nr.from_strings
    str_path = not nr.disabled and not fs.disabled
    v = float(np.round(rng.uniform(-99999, 99999), 3))
    big = float(rng.integers(1000, 999999))
    cases = [
        (repr(v), v),                                   # strict token: always
        (f" {v!r} ", v if str_path else None),          # outer trim
        # inner space grouping: forgiven ONLY by spacing_allowed
        ("1 234.5", 1234.5 if str_path and fs.spacing_allowed else None),
        # thousands commas: forgiven ONLY by commas_allowed
        (f"{big:,.1f}", big if str_path and fs.commas_allowed else None),
        ("true", 1.0 if not nr.disabled and not nr.from_bools_disabled
         else None),
        ("false", 0.0 if not nr.disabled and not nr.from_bools_disabled
         else None),
        (None, 0.0 if not nr.disabled and not nr.from_null_disabled
         else None),
        ("x9z", None),                                  # garbage stays RED
    ]
    return cases


def _int_cases(cfg, rng):
    nr = cfg.number_rules
    fs = nr.from_strings
    str_path = not nr.disabled and not fs.disabled
    v = int(rng.integers(-99999, 99999))

    def rounded(x):
        if not str_path:
            return None
        if fs.rounding_algorithm == "floor":
            return math.floor(x)
        if fs.rounding_algorithm == "round":  # Go math.Round: half away from 0
            return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
        return int(x) if x == int(x) else None          # "none"

    frac = abs(v) + 0.7
    cases = [
        (str(v), v),                                    # strict int token
        (f" {v} ", v if str_path else None),
        (f"{abs(v)}.0", rounded(float(abs(v)))),        # zero-decimal float
        (f"{frac}", rounded(frac)),                     # rounding algorithms
        (f"-{frac}", rounded(-frac)),
        ("1 234", 1234 if str_path and fs.spacing_allowed else None),
        ("7,000", 7000 if str_path and fs.commas_allowed else None),
    ]
    return cases


def _bool_cases(cfg, rng):
    br = cfg.bool_rules
    fs = br.from_strings
    str_path = not br.disabled and not fs.disabled
    fallback = br.fallback_value if (str_path and
                                     br.fallback_value is not None) else None

    def from_num(tok):
        """_bool_from_number_expr semantics (bool-from-num.go:17-45)."""
        x = float(tok)
        alg = br.from_numbers.parse_func
        if alg == "positive_negative":
            return x > 0
        if alg == "sign_of_one":
            return True if x == 1 else (False if x == -1 else None)
        return True if x == 1 else (False if x == 0 else None)

    num_path = (str_path and fs.respect_from_numbers_logic
                and not br.from_numbers.disabled)
    cases = [
        ("true", True), ("false", False),               # raw tokens: always
        ("zzz", fallback),                              # unmatched -> fallback
        (None, (bool(br.from_null.inverse)
                if not br.disabled and not br.from_null.disabled else None)),
    ]
    if str_path:
        # a custom-list token (skip ''/true/false which strict also covers)
        for tok, val in [(t, True) for t in fs.true_list] + [
                (f, False) for f in fs.false_list]:
            if tok in ("", "true", "false"):
                continue
            raw = tok.upper() if fs.case_insensitive else tok
            exp = val
            if not fs.case_insensitive and raw != tok:
                exp = fallback
            # numeric list tokens ('1'/'0') are list-matched before numbers
            cases.append((raw, exp))
            break
    # numeric tokens NOT in any dictionary: pure numbers-logic probes
    for tok in ("7", "-1", "2"):
        if num_path:
            got = from_num(tok)
            cases.append((tok, got if got is not None else fallback))
        elif str_path:
            cases.append((tok, fallback))
        elif not br.disabled and not fs.disabled:
            pass
        elif not br.disabled and fs.disabled and not br.from_numbers.disabled:
            got = from_num(tok)
            cases.append((tok, got))                     # no fallback here
        else:
            cases.append((tok, None))
    return cases


def test_random_config_roundtrips(spark):
    """≥1000 randomized (config, case) round-trips: for every seeded random
    rule set, each case's expected value is derived from the reference's
    rule semantics — a forgiven corruption must recover exactly (never
    RED), an unforgiven one must be RED with null coercion."""
    total = 0
    failures = []
    for seed in range(N_CONFIGS):
        cfg = random_config(seed)
        rng = np.random.default_rng(1000 + seed)
        rows, expects = [], []
        for kind, cases in (("num", _num_cases(cfg, rng)),
                            ("int", _int_cases(cfg, rng)),
                            ("bool", _bool_cases(cfg, rng))):
            for raw, exp in cases:
                rows.append((len(rows), kind, raw))
                expects.append(exp)
        df = spark.createDataFrame(rows, "i long, kind string, raw string")
        rn = coerce_number(F.col("raw"), cfg)
        ri = coerce_integer(F.col("raw"), cfg)
        rb = coerce_bool(F.col("raw"), cfg)
        got = {r["i"]: r for r in df.select(
            "i", "kind", "raw",
            rn.coerced.alias("num"), rn.verdict.alias("num_v"),
            ri.coerced.alias("int"), ri.verdict.alias("int_v"),
            rb.coerced.alias("bool"), rb.verdict.alias("bool_v"),
        ).collect()}
        for (i, kind, raw), exp in zip(rows, expects):
            r = got[i]
            val, verdict = r[kind if kind != "int" else "int"], r[f"{kind}_v"]
            total += 1
            if exp is None:
                ok = val is None and verdict == "RED"
            elif kind == "num":
                ok = (val is not None and abs(val - exp) < 1e-9
                      and verdict != "RED")
            else:
                ok = val == exp and verdict != "RED"
            if not ok:
                failures.append((seed, kind, raw, exp, val, verdict))
    assert total >= 1000, total
    assert not failures, f"{len(failures)}/{total} failed: {failures[:8]}"


# ---------------------------------------------------------------------------
# substring-span dedup vs a brute-force longest-common-substring twin
# ---------------------------------------------------------------------------

def _lcs_tokens(a: list[str], b: list[str]) -> int:
    """O(|a||b|) token-level longest common substring (DP)."""
    best = 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _shared_ngrams(a: list[str], b: list[str], n: int) -> int:
    ga = {" ".join(a[i:i + n]) for i in range(len(a) - n + 1)}
    gb = {" ".join(b[i:i + n]) for i in range(len(b) - n + 1)}
    return len(ga & gb)


def test_substring_spans_match_bruteforce_lcs(spark):
    """Property (seeded): on random small-vocab docs,
    substring_span_pairs reports EXACTLY the pairs whose token-level LCS
    >= n, with max_span_tokens == LCS and n_shared == |shared n-gram
    set| — against an O(len^2) dynamic-programming twin that shares no
    code with the operator."""
    from json_spark.operators.dedup import substring_span_pairs
    rng = np.random.default_rng(0xD3D)
    n = 5
    vocab = [f"t{i}" for i in range(6)]
    docs = []
    for i in range(14):
        toks = list(rng.choice(vocab, size=int(rng.integers(12, 30))))
        # plant long verbatim runs in some pairs so LCS >= n is common
        if i % 3 == 2:
            src = docs[i - 1][1]
            run_len = int(rng.integers(n, min(10, len(src)) + 1))
            start = int(rng.integers(0, len(src) - run_len + 1))
            pos = int(rng.integers(0, len(toks) + 1))
            toks = toks[:pos] + src[start:start + run_len] + toks[pos:]
        docs.append((i, toks))
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.n_shared, r.max_span_tokens)
           for r in substring_span_pairs(
               df, "doc_id", "text", n=n,
               max_gram_occurrences=10_000).collect()}
    want = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1:]:
            if len(ta) < n or len(tb) < n:
                continue
            lcs = _lcs_tokens(ta, tb)
            if lcs >= n:
                want[(ia, ib)] = (_shared_ngrams(ta, tb, n), lcs)
    assert got == want
    assert want, "no qualifying pairs generated — weak test seed"
