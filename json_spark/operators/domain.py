"""Declarative domain / CHECK constraints over clip columns.

The reference's coercion rules (internal/dirtyjson/dirtytypes.go) decide
whether a value can be *shaped* into the target type; the rules here
decide whether an already-typed value lies in its declared *domain* —
set membership, inclusive numeric range, regex format, required-ness.
That is the other half of a "schema + constraint validation engine"
(north rule), and the analogue of SQL ``CHECK`` constraints / the
reference's config-declared value lists (e.g. ``CustomListForTrue``,
internal/config/config.go:44-62, which is a domain over bool spellings).

Null semantics follow SQL CHECK: a NULL value *passes* every domain
predicate except ``required`` (the dedicated not-null rule), so nullness
and domain violations are reported by separate rules instead of one rule
double-counting.

Scale shape: verdicts are pure Column expressions (whole-stage codegen);
the rollup is ONE map-combinable groupBy on the partition key computing
all rules' counters in the same pass, then ``F.stack`` widens the single
row per partition into one row per rule — shuffle volume is
|partitions| x O(rules) counters no matter how many rules are declared.
Violations are a zero-exchange filter per rule over the same scan.
"""

from __future__ import annotations

from dataclasses import dataclass

try:
    import tomllib  # py311+
except ImportError:  # pragma: no cover
    tomllib = None

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DomainRule:
    """One declarative constraint on one column.

    Any combination of ``in_set`` / ``not_in`` / ``min_value`` /
    ``max_value`` / ``pattern`` may be set; they AND together.
    ``not_in`` is the banned-values list — the declarative home of a
    sentinel/placeholder lexicon (-1 ids, 'N/A' strings): in-band
    "missing" conventions become a versionable config line instead of
    code (operators/sentinel.py holds the reusable predicates). ``required`` makes NULL a
    violation (otherwise NULL passes). ``severity`` is the verdict a
    violating row receives: "RED" (hard constraint) or "YELLOW"
    (preference / soft constraint). ``when_sql`` makes the rule an
    implication: a SQL boolean expression over the row — rows where it
    is false or NULL are exempt (GREEN), mirroring
    ``CHECK (NOT cond OR constraint)``.
    """

    column: str
    in_set: tuple = None
    not_in: tuple = None
    min_value: float | None = None
    max_value: float | None = None
    pattern: str | None = None  # anchored full-match
    required: bool = False
    severity: str = "RED"
    when_sql: str | None = None  # implication gate
    name: str | None = None

    @property
    def check_name(self) -> str:
        return self.name or f"domain:{self.column}"

    def reason(self) -> str:
        parts = []
        if self.when_sql is not None:
            parts.append(f"when({self.when_sql})")
        if self.required:
            parts.append("required")
        if self.in_set is not None:
            parts.append(f"in_set({len(self.in_set)})")
        if self.not_in is not None:
            parts.append(f"not_in({len(self.not_in)})")
        if self.min_value is not None or self.max_value is not None:
            parts.append(f"range[{self.min_value},{self.max_value}]")
        if self.pattern is not None:
            parts.append(f"format({self.pattern})")
        return "violates " + "+".join(parts)


#: TOML key -> DomainRule field (unknown keys rejected early, matching
#: the rule-config loader's philosophy, config/loader.py:1-6)
_TOML_KEYS = {
    "column": "column", "in_set": "in_set", "not_in": "not_in",
    "min": "min_value",
    "max": "max_value", "pattern": "pattern", "required": "required",
    "severity": "severity", "when": "when_sql", "name": "name",
}


def domain_rules_from_toml(text: str) -> tuple[DomainRule, ...]:
    """Parse declarative rules from TOML ``[[rule]]`` tables:

        [[rule]]
        column = "sr_hz"
        in_set = [8000, 16000, 44100, 48000]
        severity = "YELLOW"

        [[rule]]
        column = "dur_ms"
        max = 190
        when = "codec = 'pcm_s16le'"

    This puts the engine's value-domain constraints on the same footing
    as the reference's TOML-declared tolerance rules (default.toml):
    the whole validation contract is data, not code.
    """
    data = tomllib.loads(text)
    unknown_top = set(data) - {"rule"}
    if unknown_top:
        raise ValueError(f"unknown top-level keys: {sorted(unknown_top)}")
    rules = []
    for i, tbl in enumerate(data.get("rule", [])):
        unknown = set(tbl) - set(_TOML_KEYS)
        if unknown:
            raise ValueError(f"rule #{i}: unknown keys {sorted(unknown)}")
        if "column" not in tbl:
            raise ValueError(f"rule #{i}: 'column' is required")
        kwargs = {_TOML_KEYS[k]: v for k, v in tbl.items()}
        if "in_set" in kwargs:
            kwargs["in_set"] = tuple(kwargs["in_set"])
        if "not_in" in kwargs:
            kwargs["not_in"] = tuple(kwargs["not_in"])
        if kwargs.get("severity", "RED") not in ("RED", "YELLOW"):
            raise ValueError(f"rule #{i}: severity must be RED or YELLOW")
        rules.append(DomainRule(**kwargs))
    return tuple(rules)


def rule_verdict(rule: DomainRule) -> Column:
    """Compile a rule to a GREEN/YELLOW/RED verdict Column."""
    c = F.col(rule.column)
    ok = F.lit(True)
    if rule.in_set is not None:
        ok = ok & c.isin(*rule.in_set)
    if rule.not_in is not None:
        ok = ok & ~c.isin(*rule.not_in)
    if rule.min_value is not None:
        ok = ok & (c >= F.lit(rule.min_value))
    if rule.max_value is not None:
        ok = ok & (c <= F.lit(rule.max_value))
    if rule.pattern is not None:
        ok = ok & c.cast("string").rlike(f"^(?:{rule.pattern})$")
    verdict = (
        F.when(c.isNull(),
               F.lit(rule.severity) if rule.required else F.lit("GREEN"))
        .when(ok, F.lit("GREEN"))
        .otherwise(F.lit(rule.severity))
    )
    if rule.when_sql is not None:
        # implication: inapplicable rows (gate false OR NULL) are exempt
        applicable = F.coalesce(F.expr(rule.when_sql), F.lit(False))
        verdict = F.when(~applicable, F.lit("GREEN")).otherwise(verdict)
    return verdict


def domain_rollup(df: DataFrame, rules: tuple,
                  partition_cols: list[str]) -> DataFrame:
    """Per-partition, per-rule verdict counts + rolled-up verdict.

    One aggregation pass computes every rule's counters (map-side
    combine), then ``stack`` unpivots to (partition, rule) rows.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, rule in enumerate(rules):
        v = rule_verdict(rule)
        aggs.append(F.sum((v == "GREEN").cast("long")).alias(f"__g{i}"))
        aggs.append(F.sum((v == "YELLOW").cast("long")).alias(f"__y{i}"))
        aggs.append(F.sum((v == "RED").cast("long")).alias(f"__r{i}"))
    rolled = df.groupBy(*partition_cols).agg(*aggs)

    stack_args = ", ".join(
        f"'{rule.check_name}', __g{i}, __y{i}, __r{i}"
        for i, rule in enumerate(rules)
    )
    stacked = rolled.selectExpr(
        *partition_cols, "n_rows",
        f"stack({len(rules)}, {stack_args}) AS "
        "(check_name, n_green, n_yellow, n_red)",
    )
    return stacked.select(
        *partition_cols, "check_name", "n_rows",
        "n_green", "n_yellow", "n_red",
        F.when(F.col("n_red") > 0, "RED")
        .when(F.col("n_yellow") > 0, "YELLOW")
        .otherwise("GREEN")
        .alias("verdict"),
    )


def domain_violations(df: DataFrame, rules: tuple, key_col: str,
                      partition_col: str) -> DataFrame:
    """Non-GREEN rows per rule → violation table (suite shape).

    Offending value truncated to 50 chars, mirroring the reference's
    ``limitedStr(s, 50)`` (internal/dirtyjson/helpers.go:8-23).
    """
    frames = []
    for rule in rules:
        v = rule_verdict(rule)
        frames.append(
            df.filter(v != "GREEN").select(
                F.col(key_col).alias("clip_id"),
                F.col(partition_col).cast("string").alias("partition_id"),
                F.lit(rule.check_name).alias("check_name"),
                F.lit(rule.reason()).alias("reason"),
                F.substring(
                    F.coalesce(F.col(rule.column).cast("string"),
                               F.lit("<null>")),
                    1, 50,
                ).alias("offending_value_trunc50"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _toml_value(v) -> str:
    """Render one TOML value: strings as basic strings (backslash and
    quote escaped), bools lowercase, ints/floats as-is, tuples inline."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    return repr(v)


def domain_rules_to_toml(rules: tuple) -> str:
    """The inverse of :func:`domain_rules_from_toml`: render DomainRule
    objects back to ``[[rule]]`` TOML — the serialization half of the
    suggestion→config loop (a profiled table's suggested rules become a
    reviewable, versionable config the next run consumes via
    ``--domain-rules``, the same data-not-code contract as the
    reference's default.toml). Round-trip equality is pinned in pytest:
    ``domain_rules_from_toml(domain_rules_to_toml(rules)) == rules``.
    """
    field_to_key = {v: k for k, v in _TOML_KEYS.items()}
    blocks = []
    for r in rules:
        lines = ["[[rule]]"]
        for field in ("column", "in_set", "not_in", "min_value",
                      "max_value", "pattern", "required", "severity",
                      "when_sql", "name"):
            v = getattr(r, field)
            if v is None:
                continue
            if field == "required" and v is False:
                continue
            if field == "severity" and v == "RED":
                continue  # the loader's default
            lines.append(f"{field_to_key[field]} = {_toml_value(v)}")
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + ("\n" if blocks else "")
