"""Rule-set model: frozen dataclasses mirroring the reference config tree.

Section names, flags and defaults reproduce the reference's
``internal/config/config.go:32-153`` and ``internal/config/default.toml``
so its tolerance semantics are reproducible declaratively. Differences:

- configs are per-run immutable values (the reference mutates a global
  singleton under a RWMutex, internal/config/global.go:10-35 — an
  anti-pattern on a distributed engine; executors get the config via
  task-closure capture instead).
- a ``nil`` TOML section in the reference auto-disables the rule
  (internal/config/util.go:42-89); here ``disabled=True`` on the section.
- ``RoundingAlgorithm`` (config declared but unimplemented in the reference,
  TODO at internal/dirtyjson/dirtytypes.go:227-230) IS implemented here.
- ``Array.AutoWrapSingleValues`` (declared, internal/config/config.go:141-146,
  never read by the decoder) IS implemented here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BoolFromStrings:
    """internal/config/config.go:44-62; defaults default.toml [Bool.FromStrings]."""

    disabled: bool = False
    true_list: tuple[str, ...] = ("true", "yes", "on")
    false_list: tuple[str, ...] = ("false", "no", "off", "")
    case_insensitive: bool = True
    respect_from_numbers_logic: bool = True


@dataclass(frozen=True)
class BoolFromNumbers:
    """config.go:64-68; algorithms in internal/dirtyjson/bool-from-num.go."""

    disabled: bool = False
    parse_func: str = "binary"  # binary | positive_negative | sign_of_one


@dataclass(frozen=True)
class BoolFromNull:
    """config.go:70-74."""

    disabled: bool = False
    inverse: bool = False


@dataclass(frozen=True)
class BoolRules:
    """config.go:38-42 [Bool]."""

    disabled: bool = False
    fallback_value: bool | None = False
    from_strings: BoolFromStrings = field(default_factory=BoolFromStrings)
    from_numbers: BoolFromNumbers = field(default_factory=BoolFromNumbers)
    from_null: BoolFromNull = field(default_factory=BoolFromNull)


@dataclass(frozen=True)
class NumberFromStrings:
    """config.go:82-98 [Number.FromStrings]."""

    disabled: bool = False
    spacing_allowed: bool = True
    exponent_notation_allowed: bool = True
    commas_allowed: bool = True
    rounding_algorithm: str = "floor"  # none | floor | round


@dataclass(frozen=True)
class NumberRules:
    """config.go:76-80 [Number]."""

    disabled: bool = False
    from_strings: NumberFromStrings = field(default_factory=NumberFromStrings)
    from_bools_disabled: bool = False
    from_null_disabled: bool = False


# Go reference layouts (default.toml [Date.FromStrings.Layouts]) translated to
# Spark/JDK DateTimeFormatter patterns. Go "Mon" -> "EEE", "Monday" -> "EEEE",
# "Jan" -> "MMM", "06" -> "yy", "2006" -> "yyyy", "Z07:00" -> "XXX".
GO_TO_SPARK_LAYOUTS: dict[str, str] = {
    # DateTime layouts (3)
    "2006-01-02T15:04:05": "yyyy-MM-dd'T'HH:mm:ss",
    "2006-01-02T15:04:05Z07:00": "yyyy-MM-dd'T'HH:mm:ssXXX",
    "2006-01-02T15:04:05.999999999Z07:00": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",
    # Date layouts (14)
    "2006-01-02": "yyyy-MM-dd",
    "2006/01/02": "yyyy/MM/dd",
    "02 Jan 06": "dd MMM yy",
    "02-Jan-06": "dd-MMM-yy",
    "Mon, 02 Jan 06": "EEE, dd MMM yy",
    "Mon, 02-Jan-06": "EEE, dd-MMM-yy",
    "Monday, 02 Jan 06": "EEEE, dd MMM yy",
    "Monday, 02-Jan-06": "EEEE, dd-MMM-yy",
    "02 Jan 2006": "dd MMM yyyy",
    "02-Jan-2006": "dd-MMM-yyyy",
    "Mon, 02 Jan 2006": "EEE, dd MMM yyyy",
    "Mon, 02-Jan-2006": "EEE, dd-MMM-yyyy",
    "Monday, 02 Jan 2006": "EEEE, dd MMM yyyy",
    "Monday, 02-Jan-2006": "EEEE, dd-MMM-yyyy",
    # Time layouts (3)
    "3:04PM": "h:mma",
    "15:04": "HH:mm",
    "15:04:05": "HH:mm:ss",
}

DEFAULT_DATETIME_LAYOUTS = (
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",
)
DEFAULT_DATE_LAYOUTS = (
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "dd MMM yy",
    "dd-MMM-yy",
    "EEE, dd MMM yy",
    "EEE, dd-MMM-yy",
    "EEEE, dd MMM yy",
    "EEEE, dd-MMM-yy",
    "dd MMM yyyy",
    "dd-MMM-yyyy",
    "EEE, dd MMM yyyy",
    "EEE, dd-MMM-yyyy",
    "EEEE, dd MMM yyyy",
    "EEEE, dd-MMM-yyyy",
)
DEFAULT_TIME_LAYOUTS = ("h:mma", "HH:mm", "HH:mm:ss")


@dataclass(frozen=True)
class DateFromNumbers:
    """default.toml [Date.FromNumbers]."""

    disabled: bool = False
    unix_timestamp: bool = True
    unix_milli_timestamp: bool = True


@dataclass(frozen=True)
class DateFromStrings:
    """default.toml [Date.FromStrings] (+Layouts), Spark-pattern layouts."""

    allowed: bool = True
    aliases: bool = True  # "today" / "yesterday" / "tomorrow"
    respect_from_numbers_logic: bool = True
    datetime_layouts: tuple[str, ...] = DEFAULT_DATETIME_LAYOUTS
    date_layouts: tuple[str, ...] = DEFAULT_DATE_LAYOUTS
    time_layouts: tuple[str, ...] = DEFAULT_TIME_LAYOUTS


@dataclass(frozen=True)
class DateRules:
    """default.toml [Date]; timezone default UTC (config.go:190-192).

    ``timezone_fields`` / ``force_converting_into`` mirror the reference's
    Date.Timezone.Fields and ForceConvertingInto (config.go:112-117,
    defaults at config.go:190-194, default.toml Fields=["timezone","tz"]).
    The reference declares but never consumes them; here (following the
    repo's precedent for declared-only rules) they mean:
    - Fields: sibling record fields that may carry a per-row IANA zone —
      the first non-null one wins, else ``timezone_default``; offset-LESS
      timestamps are interpreted as wall-clock in that zone;
    - ForceConvertingInto: when true, every parsed timestamp is
      CONVERTED INTO the effective zone (output = wall-clock there);
      when false the output is the instant's UTC wall-clock.
    """

    disabled: bool = False
    timezone_default: str = "UTC"
    timezone_fields: tuple[str, ...] = ("timezone", "tz")
    force_converting_into: bool = False
    from_numbers: DateFromNumbers = field(default_factory=DateFromNumbers)
    from_strings: DateFromStrings = field(default_factory=DateFromStrings)
    from_null_disabled: bool = False


@dataclass(frozen=True)
class FlexKeys:
    """default.toml [FlexKeys] — disabled by default, like the reference."""

    disabled: bool = True
    case_insensitive: bool = False
    chameleon_case: bool = False


@dataclass(frozen=True)
class ArrayRules:
    """config.go:141-146 — AutoWrapSingleValues declared-only in reference;
    StringifiedContainers implements the reference's declared-only TODO
    (dirtytypes.go:74, issue 5): containers arriving as JSON-escaped
    strings are unwrapped (up to two levels) before coercion, at YELLOW."""

    disabled: bool = False
    auto_wrap_single_values: bool = False
    stringified_containers: bool = False


@dataclass(frozen=True)
class RuleConfig:
    """The full rule tree (mirror of internal/config/config.go:32-41)."""

    bool_rules: BoolRules = field(default_factory=BoolRules)
    number_rules: NumberRules = field(default_factory=NumberRules)
    date_rules: DateRules = field(default_factory=DateRules)
    flex_keys: FlexKeys = field(default_factory=FlexKeys)
    array_rules: ArrayRules = field(default_factory=ArrayRules)


def default_config() -> RuleConfig:
    """Mirror of the reference's embedded default.toml."""
    return RuleConfig()


def strict_config() -> RuleConfig:
    """All tolerances off — every dirty value is RED (reference: empty config;
    nil sections auto-disable, internal/config/util.go:42-89)."""
    return RuleConfig(
        bool_rules=BoolRules(
            disabled=True,
            from_strings=BoolFromStrings(disabled=True),
            from_numbers=BoolFromNumbers(disabled=True),
            from_null=BoolFromNull(disabled=True),
        ),
        number_rules=NumberRules(
            disabled=True,
            from_strings=NumberFromStrings(disabled=True),
            from_bools_disabled=True,
            from_null_disabled=True,
        ),
        date_rules=DateRules(
            disabled=True,
            from_numbers=DateFromNumbers(disabled=True),
            from_strings=DateFromStrings(allowed=False, aliases=False,
                                         respect_from_numbers_logic=False),
            from_null_disabled=True,
        ),
        flex_keys=FlexKeys(disabled=True),
        array_rules=ArrayRules(disabled=True),
    )
