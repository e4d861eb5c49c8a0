"""Table-driven coercion tests mirroring the reference's unit tests
(internal/dirtyjson/bool-from-num_test.go, dirtytypes_test.go,
helpers_test.go). Each case: raw string token → (expected coerced value,
expected verdict) under the default config (default.toml) or strict config.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from json_spark.config import default_config, strict_config
from json_spark.functions import (
    coerce_array,
    coerce_bool,
    coerce_date,
    coerce_integer,
    coerce_number,
    coerce_object,
    coerce_string,
    coerce_time_of_day,
    coerce_timestamp,
)

CFG = default_config()
STRICT = strict_config()


def run_cases(spark, fn, cases, cfg=CFG):
    """cases: list of (raw, expected_coerced, expected_verdict)."""
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, raw string"
    )
    res = fn(F.col("raw"), cfg)
    rows = (
        df.select("i", "raw", *res.with_prefix("x")).orderBy("i").collect()
    )
    for row, (raw, want_val, want_verdict) in zip(rows, cases):
        assert row["x__verdict"] == want_verdict, (
            f"raw={raw!r}: verdict {row['x__verdict']} != {want_verdict}"
        )
        got = row["x__coerced"]
        if isinstance(want_val, float) and got is not None:
            assert got == pytest.approx(want_val), f"raw={raw!r}"
        else:
            assert got == want_val, f"raw={raw!r}: {got!r} != {want_val!r}"


# ---------------------------------------------------------------- numbers

def test_number_default(spark):
    run_cases(spark, coerce_number, [
        ("123", 123.0, "GREEN"),           # JSON number token → strict
        ("9.5", 9.5, "GREEN"),
        ("-2e3", -2000.0, "GREEN"),        # exponent is valid JSON
        ("1 000 000", 1000000.0, "YELLOW"),  # SpacingAllowed (dirtytypes.go:123-125)
        ("1,000,000", 1000000.0, "YELLOW"),  # CommasAllowed (126-129)
        (" 42 ", 42.0, "YELLOW"),          # trimmed
        ("true", 1.0, "YELLOW"),           # FromBools (157-169)
        ("false", 0.0, "YELLOW"),
        (None, 0.0, "YELLOW"),             # FromNull (150-155)
        ("abc", None, "RED"),
        ("[1,2]", None, "RED"),            # containers rejected (171-173)
        ('{"a":1}', None, "RED"),
    ])


def test_number_strict_config(spark):
    run_cases(spark, coerce_number, [
        ("123", 123.0, "GREEN"),
        ("1,000", None, "RED"),
        ("true", None, "RED"),
        (None, None, "RED"),
    ], cfg=STRICT)


def test_integer_rounding_floor_default(spark):
    # default.toml RoundingAlgorithm = "floor"
    run_cases(spark, coerce_integer, [
        ("4", 4, "GREEN"),
        ("-7", -7, "GREEN"),
        ("4.9", 4, "YELLOW"),     # floor
        ("-4.1", -5, "YELLOW"),   # math.Floor semantics
        ("1,024", 1024, "YELLOW"),
        ("true", 1, "YELLOW"),
        (None, 0, "YELLOW"),
        ("abc", None, "RED"),
    ])


def test_integer_rounding_none_and_round(spark):
    import dataclasses
    none_cfg = dataclasses.replace(
        CFG, number_rules=dataclasses.replace(
            CFG.number_rules,
            from_strings=dataclasses.replace(
                CFG.number_rules.from_strings, rounding_algorithm="none")))
    run_cases(spark, coerce_integer, [
        ("4.0", 4, "YELLOW"),   # zero decimal part passes under "none"
        ("4.5", None, "RED"),   # non-zero decimal is rejected
    ], cfg=none_cfg)
    round_cfg = dataclasses.replace(
        CFG, number_rules=dataclasses.replace(
            CFG.number_rules,
            from_strings=dataclasses.replace(
                CFG.number_rules.from_strings, rounding_algorithm="round")))
    run_cases(spark, coerce_integer, [
        ("4.5", 5, "YELLOW"),    # math.Round = half away from zero
        ("-4.5", -5, "YELLOW"),
        ("4.4", 4, "YELLOW"),
    ], cfg=round_cfg)


# ---------------------------------------------------------------- booleans

def test_bool_default(spark):
    run_cases(spark, coerce_bool, [
        ("true", True, "GREEN"),
        ("false", False, "GREEN"),
        ("yes", True, "YELLOW"),        # CustomListForTrue
        ("on", True, "YELLOW"),
        ("ON", True, "YELLOW"),         # CaseInsensitive
        ("True", True, "YELLOW"),
        ("no", False, "YELLOW"),
        ("off", False, "YELLOW"),
        ("", False, "YELLOW"),          # empty string in false list (340-346)
        ("1", True, "YELLOW"),          # RespectFromNumbersLogic + binary
        ("0", False, "YELLOW"),
        ("2", False, "YELLOW"),         # binary alg → None → FallbackValue=false
        (None, False, "YELLOW"),        # FromNull, Inverse=false
        ("[true]", None, "RED"),        # container
    ])


def test_bool_parse_funcs(spark):
    import dataclasses
    def with_alg(alg):
        return dataclasses.replace(
            CFG, bool_rules=dataclasses.replace(
                CFG.bool_rules,
                fallback_value=None,  # expose the alg result (no fallback mask)
                from_numbers=dataclasses.replace(
                    CFG.bool_rules.from_numbers, parse_func=alg)))
    # bool-from-num.go:28-34
    run_cases(spark, coerce_bool, [
        ("5", True, "YELLOW"), ("-3", False, "YELLOW"), ("0", False, "YELLOW"),
    ], cfg=with_alg("positive_negative"))
    # bool-from-num.go:36-45
    run_cases(spark, coerce_bool, [
        ("1", True, "YELLOW"), ("-1", False, "YELLOW"), ("2", None, "RED"),
    ], cfg=with_alg("sign_of_one"))


def test_bool_null_inverse(spark):
    import dataclasses
    inv = dataclasses.replace(
        CFG, bool_rules=dataclasses.replace(
            CFG.bool_rules,
            from_null=dataclasses.replace(CFG.bool_rules.from_null, inverse=True)))
    run_cases(spark, coerce_bool, [(None, True, "YELLOW")], cfg=inv)


# ---------------------------------------------------------------- strings

def test_string(spark):
    run_cases(spark, coerce_string, [
        ("hello", "hello", "GREEN"),
        ("  padded  ", "padded", "YELLOW"),   # helpers.go:29-41 trim
        (None, None, "RED"),
    ])


# ---------------------------------------------------------------- dates

def test_timestamp_layouts(spark):
    ts = datetime.datetime
    run_cases(spark, coerce_timestamp, [
        ("2023-01-02T15:04:05Z", ts(2023, 1, 2, 15, 4, 5), "GREEN"),   # RFC3339
        ("2023-01-02T15:04:05+02:00", ts(2023, 1, 2, 13, 4, 5), "GREEN"),
        ("2023-01-02T15:04:05", ts(2023, 1, 2, 15, 4, 5), "YELLOW"),   # DateTime layout
        ("2023-01-02", ts(2023, 1, 2), "YELLOW"),
        ("2023/01/02", ts(2023, 1, 2), "YELLOW"),
        ("02 Jan 2023", ts(2023, 1, 2), "YELLOW"),
        ("02-Jan-2023", ts(2023, 1, 2), "YELLOW"),
        ("Mon, 02 Jan 2023", ts(2023, 1, 2), "YELLOW"),    # weekday stripped
        ("Monday, 02-Jan-2023", ts(2023, 1, 2), "YELLOW"),
        ("1672671845", ts(2023, 1, 2, 15, 4, 5), "YELLOW"),     # unix seconds
        ("1672671845000", ts(2023, 1, 2, 15, 4, 5), "YELLOW"),  # unix millis
        (None, ts(1970, 1, 1), "YELLOW"),                  # null → zero time
        ("not-a-date", None, "RED"),
        ("true", None, "RED"),                             # bools rejected
        ("[1]", None, "RED"),
    ])


def test_date_truncates_to_day(spark):
    run_cases(spark, coerce_date, [
        ("2023-01-02T15:04:05Z", datetime.date(2023, 1, 2), "GREEN"),
        ("02 Jan 2023", datetime.date(2023, 1, 2), "YELLOW"),
    ])


def test_time_of_day(spark):
    run_cases(spark, coerce_time_of_day, [
        ("15:04", 15 * 3600 + 4 * 60, "YELLOW"),
        ("15:04:05", 15 * 3600 + 4 * 60 + 5, "YELLOW"),
        ("3:04PM", 15 * 3600 + 4 * 60, "YELLOW"),
        ("2023-01-02T15:04:05Z", 15 * 3600 + 4 * 60 + 5, "GREEN"),
    ])


def test_date_aliases(spark):
    df = spark.createDataFrame([("today",), ("yesterday",), ("tomorrow",)], "raw string")
    res = coerce_timestamp(F.col("raw"), CFG)
    rows = df.select("raw", *res.with_prefix("x")).collect()
    byraw = {r["raw"]: r for r in rows}
    today = datetime.date.today()
    assert byraw["today"]["x__verdict"] == "YELLOW"
    # session TZ is UTC; allow ±1 day around the driver's local date
    assert abs((byraw["today"]["x__coerced"].date() - today).days) <= 1
    assert (byraw["tomorrow"]["x__coerced"] - byraw["today"]["x__coerced"]).days == 1
    assert (byraw["today"]["x__coerced"] - byraw["yesterday"]["x__coerced"]).days == 1


# ---------------------------------------------------------------- containers

def test_array(spark):
    run_cases(spark, coerce_array, [
        ('[1, 2]', ["1", "2"], "GREEN"),
        ('["a","b"]', ["a", "b"], "GREEN"),
        (None, None, "GREEN"),          # null allowed (dirtytypes.go:457-482)
        ("5", None, "RED"),             # scalar: RED without AutoWrap
        ('{"a":1}', None, "RED"),
    ])


def test_array_autowrap(spark):
    import dataclasses
    wrap = dataclasses.replace(
        CFG, array_rules=dataclasses.replace(
            CFG.array_rules, auto_wrap_single_values=True))
    run_cases(spark, coerce_array, [
        ("5", ["5"], "YELLOW"),         # config.go:141-146 AutoWrapSingleValues
        ('[1]', ["1"], "GREEN"),
    ], cfg=wrap)


def test_object(spark):
    run_cases(spark, coerce_object, [
        ('{"k": "v"}', {"k": "v"}, "GREEN"),
        ('{"k": 1}', {"k": "1"}, "GREEN"),
        (None, None, "GREEN"),
        ("[1]", None, "RED"),
        ("notjson", None, "RED"),
    ])


def test_array_fixed_len(spark):
    """Fixed-length array target (decoder.go:302-341): extra elements are
    skipped via slice-to-N (324-330, YELLOW here — a validator reports
    the tolerance), too few is an error (316-318)."""
    run_cases(spark, lambda c, cfg: coerce_array(c, cfg, fixed_len=2), [
        ('["a","b"]', ["a", "b"], "GREEN"),        # exact fit
        ('["a","b","c"]', ["a", "b"], "YELLOW"),   # extras dropped
        ('["a"]', None, "RED"),                    # not enough elements
        (None, None, "GREEN"),                     # null still allowed
        ('{"a":1}', None, "RED"),                  # not an array
    ])


def test_object_numeric_keys(spark):
    """Non-string map keys (decoder.go:374-385): each JSON key string is
    re-parsed as the key type; any failure errors the whole object."""
    run_cases(spark, lambda c, cfg: coerce_object(c, cfg, key_type="bigint"), [
        ('{"1": "a", "2": "b"}', {1: "a", 2: "b"}, "GREEN"),
        ('{"10": 5}', {10: "5"}, "GREEN"),
        ('{"x": "a"}', None, "RED"),               # non-numeric key
        ('{"1": "a", "x": "b"}', None, "RED"),     # one bad key errors all
        (None, None, "GREEN"),
        ("[1]", None, "RED"),
    ])


# ------------------------------------------------- Date.Timezone siblings

def test_timestamp_zoned_sibling_fields(spark):
    """Date.Timezone.Fields (config.go:112-117): offset-less timestamps
    parse as wall-clock in the first non-null sibling zone field
    ('timezone' outranks 'tz', config.go:190-194 default order), falling
    back to Timezone.Default; explicit-offset RFC3339 stays strict.
    Output is the instant's UTC wall clock (TIMESTAMP_NTZ)."""
    import dataclasses
    from json_spark.functions import coerce_timestamp_zoned

    rows = [
        # (raw, tz, timezone, want_utc, want_verdict)
        ("2024-06-15T10:00:00", "Asia/Kolkata", None,
         datetime.datetime(2024, 6, 15, 4, 30), "YELLOW"),
        ("2024-06-15T10:00:00", None, None,            # default UTC
         datetime.datetime(2024, 6, 15, 10, 0), "YELLOW"),
        ("2024-06-15T10:00:00", "Asia/Kolkata", "Europe/Berlin",  # CEST +2
         datetime.datetime(2024, 6, 15, 8, 0), "YELLOW"),
        ("2024-01-15T10:00:00", "America/New_York", None,  # EST -5
         datetime.datetime(2024, 1, 15, 15, 0), "YELLOW"),
        ("2024-06-15T10:00:00+05:30", "America/New_York", None,  # strict
         datetime.datetime(2024, 6, 15, 4, 30), "GREEN"),
        ("2024-06-15T10:00:00Z", None, None,
         datetime.datetime(2024, 6, 15, 10, 0), "GREEN"),
        ("15 Jun 2024", "America/New_York", None,      # EDT -4 midnight
         datetime.datetime(2024, 6, 15, 4, 0), "YELLOW"),
        ("1718445600", "Asia/Kolkata", None,           # unix = instant
         datetime.datetime(2024, 6, 15, 10, 0), "YELLOW"),
        ("not a date", None, None, None, "RED"),
        ("true", "UTC", None, None, "RED"),            # bool rejected
    ]
    df = spark.createDataFrame(
        [(i, r[0], r[1], r[2]) for i, r in enumerate(rows)],
        "i long, raw string, tz string, timezone string")
    res = coerce_timestamp_zoned(
        F.col("raw"), CFG, {"tz": F.col("tz"), "timezone": F.col("timezone")})
    got = df.select("i", *res.with_prefix("x")).orderBy("i").collect()
    for row, (raw, _, _, want, verdict) in zip(got, rows):
        assert row["x__verdict"] == verdict, raw
        assert row["x__coerced"] == want, raw


def test_timestamp_zoned_force_converting_into(spark):
    """ForceConvertingInto=True converts every parsed instant INTO the
    effective zone: output = wall-clock there (TIMESTAMP_NTZ)."""
    import dataclasses
    from json_spark.functions import coerce_timestamp_zoned

    cfg = dataclasses.replace(
        CFG, date_rules=dataclasses.replace(
            CFG.date_rules, force_converting_into=True))
    rows = [
        # +05:30 instant 04:30 UTC → New York (EDT -4) 00:30 wall
        ("2024-06-15T10:00:00+05:30", "America/New_York",
         datetime.datetime(2024, 6, 15, 0, 30), "GREEN"),
        # naive in zone round-trips to itself under force
        ("2024-06-15T10:00:00", "Asia/Kolkata",
         datetime.datetime(2024, 6, 15, 10, 0), "YELLOW"),
        # unix instant 10:00 UTC → Kolkata 15:30
        ("1718445600", "Asia/Kolkata",
         datetime.datetime(2024, 6, 15, 15, 30), "YELLOW"),
    ]
    df = spark.createDataFrame(
        [(i, r[0], r[1]) for i, r in enumerate(rows)],
        "i long, raw string, tz string")
    res = coerce_timestamp_zoned(F.col("raw"), cfg, {"tz": F.col("tz")})
    got = df.select("i", *res.with_prefix("x")).orderBy("i").collect()
    for row, (raw, _, want, verdict) in zip(got, rows):
        assert row["x__verdict"] == verdict, raw
        assert row["x__coerced"] == want, raw


def test_timezone_config_loads_from_toml(tmp_path):
    """[Date.Timezone] Fields / ForceConvertingInto round-trip through
    the TOML loader (reference default.toml [Date.Timezone] keys)."""
    from json_spark.config import load_config
    p = tmp_path / "cfg.toml"
    p.write_text(
        '[Date]\n[Date.Timezone]\nDefault = "Asia/Tokyo"\n'
        'Fields = ["zone_id"]\nForceConvertingInto = true\n')
    cfg = load_config(str(p))
    assert cfg.date_rules.timezone_default == "Asia/Tokyo"
    assert cfg.date_rules.timezone_fields == ("zone_id",)
    assert cfg.date_rules.force_converting_into is True
    # defaults mirror config.go:190-194
    d = default_config().date_rules
    assert d.timezone_fields == ("timezone", "tz")
    assert d.force_converting_into is False


# ---------------------------------------------------------------- issue 4/5


def test_smart_scalar_ladder(spark):
    """SmartScalar (dirtytypes.go:73, issue 4): strict spellings GREEN,
    dirty spellings YELLOW with the right inferred type, containers RED
    — exactly one value slot populated per row."""
    from json_spark.config import default_config
    from json_spark.functions.coercion import coerce_smart_scalar

    rows = [("true",), ("-42",), ("3.5e2",), ('"hi there"',), ("YES",),
            ("Off",), ("1,234 567",), ("12.5 0",), ("plain text",),
            ("[1]",), ('{"a":1}',), (None,)]
    df = spark.createDataFrame(rows, "raw string")
    s = coerce_smart_scalar(F.col("raw"), default_config())
    got = {r["raw"]: r for r in df.select(
        "raw", s["stype"].alias("stype"), s["verdict"].alias("verdict"),
        s["bool_v"].alias("b"), s["long_v"].alias("l"),
        s["double_v"].alias("d"), s["str_v"].alias("t")).collect()}
    assert (got["true"]["stype"], got["true"]["verdict"],
            got["true"]["b"]) == ("bool", "GREEN", True)
    assert (got["-42"]["stype"], got["-42"]["verdict"],
            got["-42"]["l"]) == ("integer", "GREEN", -42)
    assert (got["3.5e2"]["stype"], got["3.5e2"]["verdict"],
            got["3.5e2"]["d"]) == ("number", "GREEN", 350.0)
    assert (got['"hi there"']["stype"], got['"hi there"']["verdict"],
            got['"hi there"']["t"]) == ("string", "GREEN", "hi there")
    assert (got["YES"]["stype"], got["YES"]["verdict"],
            got["YES"]["b"]) == ("bool", "YELLOW", True)
    assert (got["Off"]["stype"], got["Off"]["verdict"],
            got["Off"]["b"]) == ("bool", "YELLOW", False)
    assert (got["1,234 567"]["stype"], got["1,234 567"]["l"]) == \
        ("integer", 1234567)
    assert (got["12.5 0"]["stype"], got["12.5 0"]["d"]) == ("number", 12.50)
    assert (got["plain text"]["stype"], got["plain text"]["verdict"],
            got["plain text"]["t"]) == ("string", "YELLOW", "plain text")
    for tok in ("[1]", '{"a":1}'):
        assert got[tok]["verdict"] == "RED" and got[tok]["stype"] is None
    assert got[None]["stype"] == "null" and got[None]["verdict"] == "GREEN"
    # exactly one slot per classified row
    for tok, r in got.items():
        slots = [r["b"], r["l"], r["d"], r["t"]]
        n_set = sum(v is not None for v in slots)
        assert n_set == (0 if r["stype"] in (None, "null") else 1), tok


def test_smart_scalar_multi_token_quoted_is_dirty(spark):
    """r4 ADVICE (coercion.py:_json_string_value): a multi-token spelling
    like '"x","y"' matches the greedy ^".*"$ probe but must NOT be
    classified as a strict GREEN string with the tail silently dropped —
    the one-element parse gate sends it to the dirty tier with the RAW
    text preserved."""
    from json_spark.config import default_config
    from json_spark.functions.coercion import coerce_smart_scalar

    rows = [('"x","y"',), ('"a", "b", "c"',), ('"lone"',)]
    df = spark.createDataFrame(rows, "raw string")
    s = coerce_smart_scalar(F.col("raw"), default_config())
    got = {r["raw"]: r for r in df.select(
        "raw", s["stype"].alias("stype"), s["verdict"].alias("verdict"),
        s["str_v"].alias("t")).collect()}
    for tok in ('"x","y"', '"a", "b", "c"'):
        assert got[tok]["stype"] == "string"
        assert got[tok]["verdict"] == "YELLOW"
        assert got[tok]["t"] == tok          # raw text, nothing discarded
    assert (got['"lone"']["verdict"], got['"lone"']["t"]) == \
        ("GREEN", "lone")                    # strict path unchanged


def test_stringified_containers_unwrap(spark):
    """StringifiedContainers (dirtytypes.go:74, issue 5): single- and
    double-stringified containers parse at YELLOW; native containers
    stay GREEN; plain quoted strings keep their old semantics; with the
    toggle OFF nothing unwraps."""
    import dataclasses
    import json

    from json_spark.config import default_config
    from json_spark.functions.coercion import coerce_array, coerce_object

    base = default_config()
    on = dataclasses.replace(base, array_rules=dataclasses.replace(
        base.array_rules, stringified_containers=True))

    b_arr = json.dumps('["a","b"]')
    b_arr2 = json.dumps(b_arr)
    b_obj = json.dumps('{"k":"v"}')
    df = spark.createDataFrame(
        [('["x"]',), (b_arr,), (b_arr2,), (b_obj,), ('"zed"',)],
        "raw string")

    res = coerce_array(F.col("raw"), on)
    rows = {r["raw"]: r for r in df.select(
        "raw", res.coerced.alias("v"), res.verdict.alias("verdict"),
        res.strict.alias("s")).collect()}
    assert rows['["x"]']["verdict"] == "GREEN" and rows['["x"]']["v"] == ["x"]
    assert rows[b_arr]["verdict"] == "YELLOW" and rows[b_arr]["v"] == ["a", "b"]
    assert rows[b_arr]["s"] is None          # tolerance => strict fails
    assert rows[b_arr2]["verdict"] == "YELLOW" and rows[b_arr2]["v"] == ["a", "b"]

    ores = coerce_object(F.col("raw"), on)
    orows = {r["raw"]: r for r in df.select(
        "raw", ores.coerced.alias("v"),
        ores.verdict.alias("verdict")).collect()}
    assert orows[b_obj]["verdict"] == "YELLOW" and orows[b_obj]["v"] == {"k": "v"}

    # toggle off: stringified spellings are NOT containers -> RED
    off_res = coerce_array(F.col("raw"), base)
    off = {r["raw"]: r["verdict"] for r in df.select(
        "raw", off_res.verdict.alias("verdict")).collect()}
    assert off[b_arr] == "RED" and off[b_arr2] == "RED"


def test_per_context_config_scope(spark):
    """Per-context configs (reference dirtytypes.go:85, issue 6 — the
    final declared-only TODO): inside scoped_config the coercions
    resolve the ambient config; an explicit cfg= still outranks it;
    scopes nest and unwind."""
    from json_spark.config import (current_config, default_config,
                                   scoped_config, strict_config)
    from json_spark.functions.coercion import coerce_number

    df = spark.createDataFrame([("1,234",)], "raw string")

    def verdict(cfg=None):
        res = coerce_number(F.col("raw"), cfg)
        return df.select(res.verdict.alias("v")).collect()[0]["v"]

    assert verdict() == "YELLOW"                    # ambient default
    with scoped_config(strict_config()):
        assert current_config() == strict_config()
        assert verdict() == "RED"                   # ambient strict
        assert verdict(default_config()) == "YELLOW"  # explicit outranks
        with scoped_config(default_config()):
            assert verdict() == "YELLOW"            # innermost wins
        assert verdict() == "RED"
    assert verdict() == "YELLOW"                    # unwound
