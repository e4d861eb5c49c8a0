"""Schema-contract validation with FlexKeys tolerance (operators/schema.py)."""

from json_spark.operators.schema import (
    ContractField,
    schema_contract_report,
    spark_type_family,
    validate_schema,
)


def _by_field(rows):
    return {r["field"]: r for r in rows}


def test_match_ladder_precedence():
    actual = [("Value", "integer"), ("value", "integer"),
              ("va_lue", "integer")]
    # exact present -> exact wins even though ci/chameleon also match
    out = _by_field(validate_schema(
        actual, [ContractField("value", "integer")]))
    assert out["value"]["match_kind"] == "exact"
    assert out["value"]["verdict"] == "GREEN"
    # no exact -> case-insensitive beats chameleon
    out = _by_field(validate_schema(
        [("VALUE", "integer"), ("va-lue", "integer")],
        [ContractField("value", "integer")]))
    assert out["value"]["match_kind"] == "case_insensitive"
    assert out["value"]["matched_name"] == "VALUE"
    assert out["value"]["verdict"] == "YELLOW"
    # chameleon only
    out = _by_field(validate_schema(
        [("va_lue", "integer")], [ContractField("value", "integer")]))
    assert out["value"]["match_kind"] == "chameleon"
    assert out["value"]["verdict"] == "YELLOW"


def test_type_family_lattice():
    cases = [
        ("integer", "integer", "GREEN"),
        ("fractional", "integer", "GREEN"),   # widening, lossless
        ("integer", "fractional", "YELLOW"),  # rounding needed
        ("string", "integer", "YELLOW"),      # stringly-typed tolerated
        ("boolean", "string", "RED"),
        ("timestamp", "integer", "RED"),
    ]
    for decl, act, want in cases:
        out = validate_schema([("c", act)], [ContractField("c", decl)])
        assert out[0]["verdict"] == want, (decl, act)


def test_missing_and_unknown():
    out = validate_schema(
        [("present", "string"), ("extra_col", "integer")],
        [ContractField("present", "string", True),
         ContractField("gone_req", "string", True),
         ContractField("gone_opt", "string", False)])
    by = _by_field(out)
    assert by["gone_req"]["verdict"] == "RED"
    assert by["gone_opt"]["verdict"] == "YELLOW"
    assert by["extra_col"]["match_kind"] == "unknown"
    assert by["extra_col"]["verdict"] == "YELLOW"
    # 'present' claimed -> not also an unknown row
    assert len(out) == 4


def test_worst_of_name_and_type_verdicts():
    # chameleon name (YELLOW) + RED type -> RED
    out = validate_schema([("event_type", "string")],
                          [ContractField("Event-Type", "boolean", False)])
    assert out[0]["verdict"] == "RED"
    # chameleon name + GREEN type -> YELLOW
    out = validate_schema([("event_type", "string")],
                          [ContractField("Event-Type", "string", False)])
    assert out[0]["verdict"] == "YELLOW"


def test_spark_type_family_spellings():
    assert spark_type_family("bigint") == "integer"
    assert spark_type_family("int") == "integer"
    assert spark_type_family("double") == "fractional"
    assert spark_type_family("decimal(10,2)") == "fractional"
    assert spark_type_family("timestamp_ntz") == "timestamp"
    assert spark_type_family("varchar(8)") == "string"
    assert spark_type_family("binary") == "binary"


def test_report_frame_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.5)], "Clip_ID long, codec string, score double")
    rep = schema_contract_report(spark, df, [
        ContractField("clip-id", "integer", True),
        ContractField("codec", "string", True),
        ContractField("score", "integer", False),
    ])
    by = {r["field"]: r.asDict() for r in rep.collect()}
    assert by["clip-id"]["match_kind"] == "chameleon"
    assert by["clip-id"]["matched_name"] == "Clip_ID"
    assert by["codec"]["verdict"] == "GREEN"
    assert by["score"]["verdict"] == "YELLOW"   # integer over fractional
    assert len(by) == 3                          # no unknowns


# --- suite pre-flight integration ------------------------------------------

def _clips_contract():
    return (
        ContractField("clip_id", "string", True),
        ContractField("Sr-Hz", "integer", True),       # chameleon
        ContractField("dur_ms", "integer", True),
        ContractField("codec", "string", True),
        ContractField("bytes", "binary", True),
        ContractField("transcript", "string", False),
    )


def test_suite_schema_preflight_rows(spark):
    from json_spark.fixtures.gen import generate_clips
    from json_spark.plans.suite import SuiteConfig, ValidationSuite
    clips = generate_clips(spark, 120, partitions=2)
    cfg = SuiteConfig(schema_contract=_clips_contract())
    res = ValidationSuite(cfg).run(spark, clips)
    schema_rows = (res.partition_verdicts
                   .filter("check_name = 'schema'").collect())
    assert len(schema_rows) == 1
    row = schema_rows[0]
    assert row["partition_id"] == "__table__"
    assert row["verdict"] == "YELLOW"          # the chameleon Sr-Hz match
    assert row["n_rows"] == 6 and row["n_red"] == 0
    viol = (res.violations.filter("check_name = 'schema'").collect())
    assert [v["reason"] for v in viol] == ["chameleon:Sr-Hz"]
    res.unpersist()


def test_suite_schema_fail_fast(spark):
    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.schema import SchemaContractError
    from json_spark.plans.suite import SuiteConfig, ValidationSuite
    import pytest
    clips = generate_clips(spark, 50, partitions=2)
    contract = _clips_contract() + (
        ContractField("speaker_id", "string", True),)
    cfg = SuiteConfig(schema_contract=contract)
    with pytest.raises(SchemaContractError, match="speaker_id"):
        ValidationSuite(cfg).run(spark, clips)
    # fail-fast off: the missing column reports as a RED row instead
    cfg = SuiteConfig(schema_contract=contract, schema_fail_fast=False)
    res = ValidationSuite(cfg).run(spark, clips)
    row = (res.partition_verdicts
           .filter("check_name = 'schema'").collect())[0]
    assert row["verdict"] == "RED" and row["n_red"] == 1
    assert any(v["reason"] == "missing:speaker_id"
               for v in res.violations.collect())
    res.unpersist()


def test_contract_from_toml(tmp_path):
    from json_spark.operators.schema import contract_from_toml
    p = tmp_path / "contract.toml"
    p.write_text(
        '[[field]]\nname = "clip_id"\nfamily = "string"\n\n'
        '[[field]]\nname = "dur_ms"\nfamily = "integer"\n'
        'required = false\n')
    c = contract_from_toml(str(p))
    assert c == [ContractField("clip_id", "string", True),
                 ContractField("dur_ms", "integer", False)]
