"""Schema-contract validation with FlexKeys tolerance — the reference's
key-matching ladder (exact → case-insensitive → chameleon,
internal/decoder/decoder.go:242-262) and coercion stance applied to a
TABLE schema instead of a JSON document.

A contract declares (name, family, required) per expected column; the
actual schema is matched with the same tolerance d3rty gives JSON keys:
an exact name is GREEN, a name that only matches case-insensitively or
after chameleon normalization (functions/keys.py:normalize_name) is
YELLOW — present, but the producer spells it differently. Types compare
at FAMILY level with the coercion lattice's direction baked in:
equal family GREEN; declared fractional over actual integer GREEN
(widening is lossless); declared integer over actual fractional YELLOW
(needs rounding — the RoundingAlgorithm case); declared string over
anything YELLOW (stringly-typed tolerated); anything else RED. Missing
columns are RED when required, YELLOW when optional; actual columns no
contract entry claims surface as UNKNOWN rows (decoder.go:221-226's
unknown-field skip, made visible instead of silent).

Scale shape: schema metadata is O(columns) and lives on the driver by
nature — no scan, no job; the report materializes via a literal
createDataFrame. Validating a 10^12-row table costs exactly as much as
validating an empty one.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..functions.keys import normalize_name

#: Spark type-name → family. Width does not matter inside a family:
#: the contract speaks families, mirroring d3rty's "any JSON number"
#: stance (dirtytypes.go) rather than physical widths.
_SPARK_FAMILY = {
    "byte": "integer", "short": "integer", "int": "integer",
    "integer": "integer", "bigint": "integer", "long": "integer",
    "float": "fractional", "double": "fractional",
    "string": "string", "varchar": "string", "char": "string",
    "boolean": "boolean", "binary": "binary", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
}


def spark_type_family(simple: str) -> str:
    base = simple.split("(")[0].lower()
    if base.startswith("decimal"):
        return "fractional"
    return _SPARK_FAMILY.get(base, base)


@dataclass(frozen=True)
class ContractField:
    name: str
    family: str          # integer | fractional | string | boolean | ...
    required: bool = True


def _type_verdict(declared: str, actual: str) -> str:
    if declared == actual:
        return "GREEN"
    if declared == "fractional" and actual == "integer":
        return "GREEN"           # widening, lossless
    if declared == "integer" and actual == "fractional":
        return "YELLOW"          # rounding needed (RoundingAlgorithm)
    if declared == "string":
        return "YELLOW"          # stringly-typed tolerated
    return "RED"


def validate_schema(actual_fields: list[tuple[str, str]],
                    contract: list[ContractField]) -> list[dict]:
    """Pure-python core (driver-side, like the reference's reflective
    struct walk). ``actual_fields``: (name, family) pairs in schema
    order. Returns one dict per contract entry + one per unknown actual
    column. Ties in the tolerant ladder break on schema order."""
    rows = []
    claimed_norms = {normalize_name(c.name) for c in contract}
    for c in contract:
        exact = [a for a in actual_fields if a[0] == c.name]
        ci = [a for a in actual_fields if a[0].lower() == c.name.lower()]
        cham = [a for a in actual_fields
                if normalize_name(a[0]) == normalize_name(c.name)]
        if exact:
            a, kind, name_v = exact[0], "exact", "GREEN"
        elif ci:
            a, kind, name_v = ci[0], "case_insensitive", "YELLOW"
        elif cham:
            a, kind, name_v = cham[0], "chameleon", "YELLOW"
        else:
            rows.append({
                "field": c.name, "matched_name": None, "match_kind":
                "missing", "declared_family": c.family,
                "actual_family": None, "required": c.required,
                "verdict": "RED" if c.required else "YELLOW"})
            continue
        tv = _type_verdict(c.family, a[1])
        worst = {"GREEN": 0, "YELLOW": 1, "RED": 2}
        verdict = max((name_v, tv), key=lambda v: worst[v])
        rows.append({
            "field": c.name, "matched_name": a[0], "match_kind": kind,
            "declared_family": c.family, "actual_family": a[1],
            "required": c.required, "verdict": verdict})
    for a in actual_fields:
        if normalize_name(a[0]) not in claimed_norms:
            rows.append({
                "field": a[0], "matched_name": a[0], "match_kind":
                "unknown", "declared_family": None,
                "actual_family": a[1], "required": False,
                "verdict": "YELLOW"})
    return rows


def schema_contract_report(spark: SparkSession, df: DataFrame,
                           contract: list[ContractField]) -> DataFrame:
    """Materialize :func:`validate_schema` over ``df``'s schema as a
    report frame (one row per contract entry / unknown column)."""
    actual = [(f.name, spark_type_family(f.dataType.simpleString()))
              for f in df.schema.fields]
    rows = validate_schema(actual, contract)
    return spark.createDataFrame(
        [(r["field"], r["matched_name"], r["match_kind"],
          r["declared_family"], r["actual_family"], r["required"],
          r["verdict"]) for r in rows],
        "field string, matched_name string, match_kind string, "
        "declared_family string, actual_family string, required boolean, "
        "verdict string")


class SchemaContractError(ValueError):
    """A required contract column is missing from the actual schema —
    raised BEFORE any scan so a broken producer fails in milliseconds,
    not after reading 100 TB."""


def contract_from_toml(path: str) -> list[ContractField]:
    """Load a contract from ``[[field]]`` TOML tables (name, family,
    required) — the contract is data, like the reference's default.toml
    and the suite's ``--domain-rules``."""
    import tomllib
    with open(path, "rb") as f:
        doc = tomllib.load(f)
    out = []
    for t in doc.get("field", []):
        out.append(ContractField(
            name=str(t["name"]), family=str(t["family"]),
            required=bool(t.get("required", True))))
    if not out:
        raise ValueError(f"no [[field]] tables in {path}")
    return out
