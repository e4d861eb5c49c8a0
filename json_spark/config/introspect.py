"""Config introspection → form-model JSON schema.

PySpark-native counterpart of the reference's ``formgen`` package — the
last reference package with no engine counterpart:

- ``Introspect`` walking the config tree: internal/formgen/introspect.go:19-137
- FormModel/FormSection/FormField/Option types: internal/formgen/metadata.go:1-42
- TOML-comment descriptions: internal/formgen/toml_parser.go (comments above
  each key in the embedded default.toml become field help text)
- the ``config-schema`` CLI printing the model as JSON:
  cmd/config-schema/main.go:12-26

Differences from the reference (documented, deliberate):

- the walk is table-driven over the frozen dataclasses of
  :mod:`json_spark.config.rules` rather than ``reflect`` — Python
  dataclasses carry no struct tags, so the reference TOML key names come
  from the same keymaps the loader uses (single source of truth).
- list values render as JSON arrays (the reference's ``fmt.Sprint`` prints
  Go's ``[a b c]``), which makes the model round-trippable:
  :func:`model_to_config_dict` reverses :func:`introspect` exactly.
- date layouts are shown in the reference's Go layout syntax (the engine
  stores the Spark translation; the schema is a user-facing surface).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any

from .rules import (
    GO_TO_SPARK_LAYOUTS,
    RuleConfig,
)

# --------------------------------------------------------------------------
# The embedded default config, reference key-space, comments included.
# Mirror of internal/config/default.toml (the reference embeds it via
# go:embed, config.go:156-162); tests pin config_from_dict(DEFAULT_TOML)
# == default_config() so this text can never drift from the dataclasses.
# --------------------------------------------------------------------------
DEFAULT_TOML = """\
# Default configuration for dirty validation (reference default.toml).

[Bool]
# FallbackValue is the bool result when unmarshalling fell into an unhappy path.
FallbackValue = false

[Bool.FromStrings]
# CustomListForTrue specifies a list of string values that are considered true.
CustomListForTrue = ["true", "yes", "on"]
# CustomListForFalse specifies a list of string values that are considered false.
CustomListForFalse = ["false", "no", "off", ""]
# CaseInsensitive treats the true/false lists as case-insensitive.
CaseInsensitive = true
# RespectFromNumbersLogic parses stringified numbers via the FromNumbers config.
RespectFromNumbersLogic = true

[Bool.FromNumbers]
# CustomParseFunc specifies how to parse numbers to bool.
# Available values: "binary", "positive_negative", "sign_of_one"
CustomParseFunc = "binary"

[Bool.FromNull]
# Inverse means nulls decode to true rather than the default false.
Inverse = false

[Number]

[Number.FromStrings]
# SpacingAllowed trims spacing in stringified numbers ("1 000 000").
SpacingAllowed = true
# ExponentNotationAllowed accepts exponent notation ("1e6").
ExponentNotationAllowed = true
# CommasAllowed accepts comma separators ("1,000,000").
CommasAllowed = true
# RoundingAlgorithm specifies how integers parse from floats.
# Available values: "none", "floor", "round"
RoundingAlgorithm = "floor"

[Number.FromBools]

[Number.FromNull]

[Date]

[Date.Timezone]
# Default is the zone applied when no sibling field carries one.
Default = "UTC"
# Fields names sibling record fields that may carry a per-row IANA zone.
Fields = ["timezone", "tz"]
# ForceConvertingInto converts every parsed timestamp INTO the effective zone.
ForceConvertingInto = false

[Date.FromNumbers]
Disabled = false
# UnixTimestamp decodes numbers as second Unix timestamps.
UnixTimestamp = true
# UnixMilliTimestamp decodes numbers as millisecond Unix timestamps.
UnixMilliTimestamp = true

[Date.FromStrings]
# Allowed permits dates decoded from strings.
Allowed = true
# Aliases enables "today" / "yesterday" / "tomorrow" tokens.
Aliases = true
# RespectFromNumbersLogic parses stringified numbers via the FromNumbers config.
RespectFromNumbersLogic = true

[Date.FromStrings.Layouts]
# Time specifies the time-only layouts.
Time = ["3:04PM", "15:04", "15:04:05"]
# Date specifies the date-only layouts.
Date = [
    "2006-01-02",
    "2006/01/02",
    "02 Jan 06",
    "02-Jan-06",
    "Mon, 02 Jan 06",
    "Mon, 02-Jan-06",
    "Monday, 02 Jan 06",
    "Monday, 02-Jan-06",
    "02 Jan 2006",
    "02-Jan-2006",
    "Mon, 02 Jan 2006",
    "Mon, 02-Jan-2006",
    "Monday, 02 Jan 2006",
    "Monday, 02-Jan-2006",
]
# DateTime specifies the generic datetime layouts.
DateTime = [
    "2006-01-02T15:04:05",
    "2006-01-02T15:04:05Z07:00",
    "2006-01-02T15:04:05.999999999Z07:00",
]

[Date.FromNull]
Disabled = false

[FlexKeys]
# FlexKeys is the configuration for JSON key flexibility.
Disabled = true
# CaseInsensitive allows keys to match case-insensitively.
CaseInsensitive = false
# ChameleonCase treats camelCase/snake_case/kebab-case/PascalCase keys the same.
ChameleonCase = false
"""


def parse_toml_comments(text: str) -> dict[str, str]:
    """Comment block immediately above each ``Key =`` line →
    ``{"Section.Key": description}`` (toml_parser.go's contract)."""
    out: dict[str, str] = {}
    section = ""
    pending: list[str] = []
    for line in text.splitlines():
        s = line.strip()
        if not s:
            pending = []
        elif s.startswith("#"):
            pending.append(s.lstrip("#").strip())
        elif s.startswith("["):
            section = s.strip("[]")
            pending = []
        elif "=" in s:
            key = s.split("=", 1)[0].strip()
            if pending:
                out[f"{section}.{key}"] = " ".join(p for p in pending if p)
            pending = []
        # multi-line array continuation lines carry no key: ignored
    return out


# --------------------------------------------------------------------------
# FormModel types (metadata.go:1-42)
# --------------------------------------------------------------------------
FIELD_TEXT = "text"
FIELD_NUMBER = "number"
FIELD_CHECKBOX = "checkbox"
FIELD_SELECT = "select"


@dataclass(frozen=True)
class Option:
    value: str
    label: str

    def to_dict(self) -> dict[str, str]:
        return {"value": self.value, "label": self.label}


@dataclass(frozen=True)
class FormField:
    name: str           # dotted path, e.g. "Bool.FromStrings.CustomListForTrue"
    label: str          # last path segment
    type: str           # text | number | checkbox | select
    value: str          # stringified current value
    description: str = ""
    options: tuple[Option, ...] = ()

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"name": self.name, "label": self.label,
                             "type": self.type, "value": self.value}
        if self.description:
            d["description"] = self.description
        if self.options:
            d["options"] = [o.to_dict() for o in self.options]
        return d


@dataclass(frozen=True)
class FormSection:
    title: str
    fields: tuple[FormField, ...] = ()
    subsections: tuple["FormSection", ...] = ()

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"title": self.title,
                             "fields": [f.to_dict() for f in self.fields]}
        if self.subsections:
            d["subsections"] = [s.to_dict() for s in self.subsections]
        return d


@dataclass(frozen=True)
class FormModel:
    sections: tuple[FormSection, ...] = ()

    def to_dict(self) -> dict[str, Any]:
        return {"sections": [s.to_dict() for s in self.sections]}


# --------------------------------------------------------------------------
# The config tree, reference key-space. Each leaf: (RefKey, attr path,
# kind). Kinds: checkbox/text/select/list/go_layout_list. attr path is
# relative to the RuleConfig root.
# --------------------------------------------------------------------------
_SELECT_OPTIONS: dict[str, tuple[str, ...]] = {
    # bool-from-num.go algorithms (ListAvailableBoolFromNumberAlgs)
    "Bool.FromNumbers.CustomParseFunc":
        ("binary", "positive_negative", "sign_of_one"),
    # dirtytypes.go RoundingAlgorithm values
    "Number.FromStrings.RoundingAlgorithm": ("none", "floor", "round"),
}

_SPARK_TO_GO = {v: k for k, v in GO_TO_SPARK_LAYOUTS.items()}

# (section title, [(ref key, attr path, kind)], [subsections...])
_TREE: list[tuple] = [
    ("Bool", [
        ("Disabled", "bool_rules.disabled", "checkbox"),
        ("FallbackValue", "bool_rules.fallback_value", "checkbox"),
    ], [
        ("FromStrings", [
            ("Disabled", "bool_rules.from_strings.disabled", "checkbox"),
            ("CustomListForTrue", "bool_rules.from_strings.true_list", "list"),
            ("CustomListForFalse", "bool_rules.from_strings.false_list", "list"),
            ("CaseInsensitive",
             "bool_rules.from_strings.case_insensitive", "checkbox"),
            ("RespectFromNumbersLogic",
             "bool_rules.from_strings.respect_from_numbers_logic", "checkbox"),
        ]),
        ("FromNumbers", [
            ("Disabled", "bool_rules.from_numbers.disabled", "checkbox"),
            ("CustomParseFunc", "bool_rules.from_numbers.parse_func", "select"),
        ]),
        ("FromNull", [
            ("Disabled", "bool_rules.from_null.disabled", "checkbox"),
            ("Inverse", "bool_rules.from_null.inverse", "checkbox"),
        ]),
    ]),
    ("Number", [
        ("Disabled", "number_rules.disabled", "checkbox"),
    ], [
        ("FromStrings", [
            ("Disabled", "number_rules.from_strings.disabled", "checkbox"),
            ("SpacingAllowed",
             "number_rules.from_strings.spacing_allowed", "checkbox"),
            ("ExponentNotationAllowed",
             "number_rules.from_strings.exponent_notation_allowed", "checkbox"),
            ("CommasAllowed",
             "number_rules.from_strings.commas_allowed", "checkbox"),
            ("RoundingAlgorithm",
             "number_rules.from_strings.rounding_algorithm", "select"),
        ]),
        ("FromBools", [
            ("Disabled", "number_rules.from_bools_disabled", "checkbox"),
        ]),
        ("FromNull", [
            ("Disabled", "number_rules.from_null_disabled", "checkbox"),
        ]),
    ]),
    ("Date", [
        ("Disabled", "date_rules.disabled", "checkbox"),
    ], [
        ("Timezone", [
            ("Default", "date_rules.timezone_default", "text"),
            ("Fields", "date_rules.timezone_fields", "list"),
            ("ForceConvertingInto",
             "date_rules.force_converting_into", "checkbox"),
        ]),
        ("FromNumbers", [
            ("Disabled", "date_rules.from_numbers.disabled", "checkbox"),
            ("UnixTimestamp",
             "date_rules.from_numbers.unix_timestamp", "checkbox"),
            ("UnixMilliTimestamp",
             "date_rules.from_numbers.unix_milli_timestamp", "checkbox"),
        ]),
        ("FromStrings", [
            ("Allowed", "date_rules.from_strings.allowed", "checkbox"),
            ("Aliases", "date_rules.from_strings.aliases", "checkbox"),
            ("RespectFromNumbersLogic",
             "date_rules.from_strings.respect_from_numbers_logic", "checkbox"),
        ], [
            ("Layouts", [
                ("Time", "date_rules.from_strings.time_layouts",
                 "go_layout_list"),
                ("Date", "date_rules.from_strings.date_layouts",
                 "go_layout_list"),
                ("DateTime", "date_rules.from_strings.datetime_layouts",
                 "go_layout_list"),
            ]),
        ]),
        ("FromNull", [
            ("Disabled", "date_rules.from_null_disabled", "checkbox"),
        ]),
    ]),
    ("FlexKeys", [
        ("Disabled", "flex_keys.disabled", "checkbox"),
        ("CaseInsensitive", "flex_keys.case_insensitive", "checkbox"),
        ("ChameleonCase", "flex_keys.chameleon_case", "checkbox"),
    ], []),
    ("Array", [
        ("Disabled", "array_rules.disabled", "checkbox"),
        ("AutoWrapSingleValues",
         "array_rules.auto_wrap_single_values", "checkbox"),
        ("StringifiedContainers",
         "array_rules.stringified_containers", "checkbox"),
    ], []),
]


def _get(cfg: RuleConfig, path: str) -> Any:
    v: Any = cfg
    for part in path.split("."):
        v = getattr(v, part)
    return v


def _stringify(value: Any, kind: str) -> str:
    if kind == "checkbox":
        return "true" if bool(value) else "false"
    if kind == "list":
        return json.dumps(list(value))
    if kind == "go_layout_list":
        return json.dumps([_SPARK_TO_GO.get(x, x) for x in value])
    return str(value)


def _make_field(prefix: str, key: str, path: str, kind: str,
                cfg: RuleConfig, comments: dict[str, str]) -> FormField:
    name = f"{prefix}.{key}" if prefix else key
    value = _stringify(_get(cfg, path), kind)
    ftype = {"checkbox": FIELD_CHECKBOX, "select": FIELD_SELECT,
             "list": FIELD_TEXT, "go_layout_list": FIELD_TEXT,
             "text": FIELD_TEXT}[kind]
    opts = tuple(Option(o, o) for o in _SELECT_OPTIONS.get(name, ()))
    return FormField(name=name, label=key, type=ftype, value=value,
                     description=comments.get(name, ""), options=opts)


def _make_section(title: str, prefix: str, leaves: list, subs: list,
                  cfg: RuleConfig, comments: dict[str, str]) -> FormSection:
    fields = tuple(_make_field(prefix, k, p, kind, cfg, comments)
                   for (k, p, kind) in leaves)
    subsections = []
    for sub in subs:
        s_title, s_leaves = sub[0], sub[1]
        s_subs = sub[2] if len(sub) > 2 else []
        subsections.append(_make_section(
            s_title, f"{prefix}.{s_title}", s_leaves, s_subs, cfg, comments))
    return FormSection(title=title, fields=fields,
                       subsections=tuple(subsections))


def introspect(cfg: RuleConfig | None = None) -> FormModel:
    """Walk ``cfg`` (default config when None) into a :class:`FormModel`
    (introspect.go:19-137's contract: sections, Disabled first, leaf
    fields, then nested subsections, descriptions from TOML comments)."""
    if cfg is None:
        cfg = RuleConfig()
    comments = parse_toml_comments(DEFAULT_TOML)
    sections = tuple(
        _make_section(title, title, leaves, subs, cfg, comments)
        for (title, leaves, subs) in _TREE)
    return FormModel(sections=sections)


def config_schema_json(cfg: RuleConfig | None = None, indent: int = 2) -> str:
    """The ``config-schema`` CLI (cmd/config-schema/main.go:12-26): the
    introspected model of the (default) config as indented JSON."""
    return json.dumps(introspect(cfg).to_dict(), indent=indent)


# --------------------------------------------------------------------------
# Round-trip: FormModel → loader dict. introspect() ∘ model_to_config_dict
# ∘ config_from_dict == identity on RuleConfig (pinned in tests) — the
# schema is a faithful, editable projection, not a dead rendering.
# --------------------------------------------------------------------------
def _parse_value(f: FormField) -> Any:
    if f.type == FIELD_CHECKBOX:
        return f.value == "true"
    if f.value.startswith("["):
        return json.loads(f.value)
    return f.value


def model_to_config_dict(model: FormModel) -> dict[str, Any]:
    """Flatten a FormModel back into the nested reference-key dict that
    :func:`json_spark.config.loader.config_from_dict` consumes."""
    root: dict[str, Any] = {}

    def put(path: str, value: Any) -> None:
        parts = path.split(".")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = value

    def walk(sec: FormSection) -> None:
        for f in sec.fields:
            put(f.name, _parse_value(f))
        for s in sec.subsections:
            walk(s)

    for sec in model.sections:
        walk(sec)
    return root
