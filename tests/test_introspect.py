"""Config introspection / schema generation (reference formgen package:
internal/formgen/introspect.go, metadata.go, toml_parser.go,
cmd/config-schema/main.go). Pure Python — no SparkSession needed."""

from __future__ import annotations

import dataclasses
import json
import tomllib

from json_spark.config.introspect import (
    DEFAULT_TOML,
    FIELD_CHECKBOX,
    FIELD_SELECT,
    FIELD_TEXT,
    config_schema_json,
    introspect,
    model_to_config_dict,
    parse_toml_comments,
)
from json_spark.config.loader import config_from_dict
from json_spark.config.rules import (
    BoolFromNumbers,
    BoolRules,
    DateRules,
    FlexKeys,
    NumberFromStrings,
    NumberRules,
    default_config,
)


def _all_fields(model):
    out = []

    def walk(sec):
        out.extend(sec.fields)
        for s in sec.subsections:
            walk(s)

    for sec in model.sections:
        walk(sec)
    return out


def test_embedded_default_toml_is_the_default_config():
    # the embedded TOML (reference default.toml transcription) must load
    # to exactly default_config() — pins the text against dataclass drift
    assert config_from_dict(tomllib.loads(DEFAULT_TOML)) == default_config()


def test_model_shape_matches_reference_sections():
    model = introspect()
    titles = [s.title for s in model.sections]
    assert titles == ["Bool", "Number", "Date", "FlexKeys", "Array"]
    by_title = {s.title: s for s in model.sections}
    # introspect.go:63-72 — Disabled is the first field of each section
    assert by_title["Bool"].fields[0].name == "Bool.Disabled"
    assert by_title["Bool"].fields[0].type == FIELD_CHECKBOX
    assert [s.title for s in by_title["Bool"].subsections] == [
        "FromStrings", "FromNumbers", "FromNull"]
    date_subs = {s.title: s for s in by_title["Date"].subsections}
    assert set(date_subs) == {"Timezone", "FromNumbers", "FromStrings",
                              "FromNull"}
    # Layouts nests under FromStrings (default.toml [Date.FromStrings.Layouts])
    assert [s.title for s in date_subs["FromStrings"].subsections] == [
        "Layouts"]


def test_field_types_values_and_options():
    fields = {f.name: f for f in _all_fields(introspect())}
    f = fields["Bool.FromNumbers.CustomParseFunc"]
    assert f.type == FIELD_SELECT and f.value == "binary"
    assert [o.value for o in f.options] == [
        "binary", "positive_negative", "sign_of_one"]
    f = fields["Number.FromStrings.RoundingAlgorithm"]
    assert f.type == FIELD_SELECT and f.value == "floor"
    assert [o.value for o in f.options] == ["none", "floor", "round"]
    assert fields["Date.Timezone.Default"].type == FIELD_TEXT
    assert fields["Date.Timezone.Default"].value == "UTC"
    assert json.loads(fields["Date.Timezone.Fields"].value) == [
        "timezone", "tz"]
    assert fields["FlexKeys.Disabled"].value == "true"  # disabled by default
    # layouts render in the reference's Go syntax, not Spark patterns
    dt = json.loads(fields["Date.FromStrings.Layouts.DateTime"].value)
    assert dt[0] == "2006-01-02T15:04:05"
    assert "2006-01-02T15:04:05Z07:00" in dt
    assert len(json.loads(fields["Date.FromStrings.Layouts.Date"].value)) == 14


def test_descriptions_come_from_toml_comments():
    comments = parse_toml_comments(DEFAULT_TOML)
    assert "case-insensitive" in comments["Bool.FromStrings.CaseInsensitive"]
    fields = {f.name: f for f in _all_fields(introspect())}
    assert "camelCase" in fields["FlexKeys.ChameleonCase"].description
    assert fields["Bool.FromNumbers.CustomParseFunc"].description


def test_schema_json_cli_shape():
    doc = json.loads(config_schema_json())
    assert isinstance(doc["sections"], list) and len(doc["sections"]) == 5
    bool_sec = doc["sections"][0]
    assert bool_sec["title"] == "Bool"
    assert bool_sec["fields"][0] == {
        "name": "Bool.Disabled", "label": "Disabled",
        "type": "checkbox", "value": "false"}


def test_round_trip_default_and_mutated():
    # introspect ∘ model_to_config_dict ∘ config_from_dict == identity
    for cfg in (
        default_config(),
        dataclasses.replace(
            default_config(),
            bool_rules=dataclasses.replace(
                BoolRules(), from_numbers=BoolFromNumbers(
                    parse_func="sign_of_one")),
            number_rules=dataclasses.replace(
                NumberRules(), from_strings=NumberFromStrings(
                    rounding_algorithm="round", commas_allowed=False)),
            date_rules=dataclasses.replace(
                DateRules(), timezone_default="Asia/Kolkata",
                force_converting_into=True,
                timezone_fields=("zone",)),
            flex_keys=FlexKeys(disabled=False, case_insensitive=True,
                               chameleon_case=True),
        ),
    ):
        rebuilt = config_from_dict(model_to_config_dict(introspect(cfg)))
        assert rebuilt == cfg


def test_config_schema_cli_mode():
    # python -m json_spark --config-schema (reference cmd/config-schema)
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "json_spark", "--config-schema"],
        capture_output=True, text=True, timeout=120, check=True)
    doc = json.loads(out.stdout)
    assert [s["title"] for s in doc["sections"]] == [
        "Bool", "Number", "Date", "FlexKeys", "Array"]
