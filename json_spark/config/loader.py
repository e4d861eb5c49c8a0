"""TOML/dict → RuleConfig loader.

Mirrors the reference's config pipeline (internal/config/config.go:156-253):
TOML sections with the same names; an *absent* section disables that rule
group (util.go:42-89 nil-section semantics). Unknown keys are rejected early
rather than silently ignored.
"""

from __future__ import annotations

import dataclasses
from typing import Any

try:
    import tomllib  # py311+
except ImportError:  # pragma: no cover
    tomllib = None

from .rules import (
    ArrayRules,
    BoolFromNull,
    BoolFromNumbers,
    BoolFromStrings,
    BoolRules,
    DateFromNumbers,
    DateFromStrings,
    DateRules,
    FlexKeys,
    NumberFromStrings,
    NumberRules,
    RuleConfig,
    GO_TO_SPARK_LAYOUTS,
)

# TOML key -> dataclass field, per section (reference key names preserved).
_KEYMAPS: dict[type, dict[str, str]] = {
    BoolFromStrings: {
        "Disabled": "disabled",
        "CustomListForTrue": "true_list",
        "CustomListForFalse": "false_list",
        "CaseInsensitive": "case_insensitive",
        "RespectFromNumbersLogic": "respect_from_numbers_logic",
    },
    BoolFromNumbers: {"Disabled": "disabled", "CustomParseFunc": "parse_func"},
    BoolFromNull: {"Disabled": "disabled", "Inverse": "inverse"},
    NumberFromStrings: {
        "Disabled": "disabled",
        "SpacingAllowed": "spacing_allowed",
        "ExponentNotationAllowed": "exponent_notation_allowed",
        "CommasAllowed": "commas_allowed",
        "RoundingAlgorithm": "rounding_algorithm",
    },
    DateFromNumbers: {
        "Disabled": "disabled",
        "UnixTimestamp": "unix_timestamp",
        "UnixMilliTimestamp": "unix_milli_timestamp",
    },
    FlexKeys: {
        "Disabled": "disabled",
        "CaseInsensitive": "case_insensitive",
        "ChameleonCase": "chameleon_case",
    },
    ArrayRules: {
        "Disabled": "disabled",
        "AutoWrapSingleValues": "auto_wrap_single_values",
        "StringifiedContainers": "stringified_containers",
    },
}


def _build(cls: type, section: dict[str, Any] | None):
    """Absent section ⇒ disabled instance (nil-section semantics)."""
    if section is None:
        return cls(disabled=True)
    kwargs = {}
    keymap = _KEYMAPS[cls]
    for k, v in section.items():
        if k not in keymap:
            raise ValueError(f"unknown config key {k!r} for {cls.__name__}")
        if isinstance(v, list):
            v = tuple(v)
        kwargs[keymap[k]] = v
    return cls(**kwargs)


def _translate_layouts(layouts: list[str]) -> tuple[str, ...]:
    """Go reference layouts → Spark patterns (unknown = already Spark)."""
    return tuple(GO_TO_SPARK_LAYOUTS.get(x, x) for x in layouts)


def config_from_dict(data: dict[str, Any]) -> RuleConfig:
    b = data.get("Bool")
    bool_rules = (
        BoolRules(disabled=True, from_strings=BoolFromStrings(disabled=True),
                  from_numbers=BoolFromNumbers(disabled=True),
                  from_null=BoolFromNull(disabled=True))
        if b is None
        else BoolRules(
            disabled=bool(b.get("Disabled", False)),
            fallback_value=b.get("FallbackValue", False),
            from_strings=_build(BoolFromStrings, b.get("FromStrings")),
            from_numbers=_build(BoolFromNumbers, b.get("FromNumbers")),
            from_null=_build(BoolFromNull, b.get("FromNull")),
        )
    )

    n = data.get("Number")
    number_rules = (
        NumberRules(disabled=True, from_strings=NumberFromStrings(disabled=True),
                    from_bools_disabled=True, from_null_disabled=True)
        if n is None
        else NumberRules(
            disabled=bool(n.get("Disabled", False)),
            from_strings=_build(NumberFromStrings, n.get("FromStrings")),
            from_bools_disabled=n.get("FromBools") is None
            or bool(n["FromBools"].get("Disabled", False)),
            from_null_disabled=n.get("FromNull") is None
            or bool(n["FromNull"].get("Disabled", False)),
        )
    )

    d = data.get("Date")
    if d is None:
        date_rules = DateRules(
            disabled=True,
            from_numbers=DateFromNumbers(disabled=True),
            from_strings=DateFromStrings(allowed=False, aliases=False,
                                         respect_from_numbers_logic=False),
            from_null_disabled=True,
        )
    else:
        fs = d.get("FromStrings") or {}
        layouts = fs.get("Layouts") or {}
        dfs_kwargs: dict[str, Any] = {
            "allowed": bool(fs.get("Allowed", True)),
            "aliases": bool(fs.get("Aliases", True)),
            "respect_from_numbers_logic": bool(fs.get("RespectFromNumbersLogic", True)),
        }
        if "DateTime" in layouts:
            dfs_kwargs["datetime_layouts"] = _translate_layouts(layouts["DateTime"])
        if "Date" in layouts:
            dfs_kwargs["date_layouts"] = _translate_layouts(layouts["Date"])
        if "Time" in layouts:
            dfs_kwargs["time_layouts"] = _translate_layouts(layouts["Time"])
        tz = d.get("Timezone") or {}
        date_rules = DateRules(
            disabled=bool(d.get("Disabled", False)),
            timezone_default=tz.get("Default", "UTC"),
            timezone_fields=tuple(tz.get("Fields", ("timezone", "tz"))),
            force_converting_into=bool(tz.get("ForceConvertingInto", False)),
            from_numbers=_build(DateFromNumbers, d.get("FromNumbers")),
            from_strings=DateFromStrings(**dfs_kwargs),
            from_null_disabled=d.get("FromNull") is None
            or bool(d["FromNull"].get("Disabled", False)),
        )

    flex = _build(FlexKeys, data.get("FlexKeys")) if data.get("FlexKeys") else FlexKeys()
    arr = _build(ArrayRules, data.get("Array")) if data.get("Array") else ArrayRules()
    return RuleConfig(
        bool_rules=bool_rules,
        number_rules=number_rules,
        date_rules=date_rules,
        flex_keys=flex,
        array_rules=arr,
    )


def load_config(path: str) -> RuleConfig:
    if tomllib is None:  # pragma: no cover
        raise RuntimeError("tomllib unavailable; pass a dict to config_from_dict")
    with open(path, "rb") as f:
        return config_from_dict(tomllib.load(f))


def as_dict(cfg: RuleConfig) -> dict[str, Any]:
    return dataclasses.asdict(cfg)
