"""Constraint suggestion: profile a table once, emit the declarative
rules it already satisfies — the onboarding path of a validation engine
(a user pointing the engine at an unvalidated 100 TB table gets a
starter rule set instead of a blank page; the same feature AWS Deequ
ships as ConstraintSuggestionRunner, re-expressed Spark-DataFrame-first).

Reference parity: the d3rty reference ships its tolerance rules as a
declarative config (internal/config/config.go + default.toml) that users
hand-write; suggestion closes the loop by DERIVING a config from data.
The emitted rule strings are ANSI-SQL predicates, so they feed straight
into the engine's declarative domain/CHECK family (operators/domain.py).

Two passes, both bounded:
1. one map-combinable aggregate over the data computes, per candidate
   column: row count, null count, exact distinct count, min/max (cast
   to string), max length — a single 1-row result whatever the table
   size;
2. ONLY for columns whose measured cardinality is at or below
   ``categorical_max``, a second pass enumerates the member values
   (groupBy on a provably tiny key set — the first pass is what makes
   this safe; enumerating before measuring is how collect_set OOMs on
   an id column at 10^12 rows).

Suggested rule kinds:
- ``not_null``      null_count == 0        → ``col IS NOT NULL``
- ``null_rate_max`` 0 < rate               → observed rate × 1.25
  headroom, rounded up to 4 decimals (new data may drift a little
  without tripping the gate — Deequ's retainCompletenessRule shape)
- ``unique``        distinct == non-null n → uniqueness constraint
- ``range``         numeric col            → ``col BETWEEN min AND max``
- ``in_set``        cardinality ≤ max      → sorted member list
- ``max_length``    string col             → ``length(col) <= max``

The output is deterministic (sorted member lists, fixed rounding), so a
SQL twin re-derives every suggestion from the same table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUGGESTION_SCHEMA = "column string, rule_type string, rule string"

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def _fmt_num(v) -> str:
    """Render a numeric bound the way both engines print it: integers
    without a trailing .0, floats via repr (shortest round-trip)."""
    if v is None:
        return "NULL"
    f = float(v)
    if f == int(f) and abs(f) < 2**53:
        return str(int(f))
    return repr(f)


def _suggest(df: DataFrame, cols: list[str],
             categorical_max: int) -> list[tuple[str, str, str, object]]:
    """Shared core: (column, rule_type, rendered rule, DomainRule|None)
    per suggestion. The DomainRule (operators/domain.py) is the
    EXECUTABLE form — suggestions whose semantics are table-level
    (unique) or advisory (null_rate_max) carry None."""
    from .domain import DomainRule

    dtypes = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(c).cast("string").alias(f"{c}__mn"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__mx"))
        if isinstance(fields[c], T.StringType):
            aggs.append(F.max(F.length(c)).alias(f"{c}__ml"))
    prof = df.agg(*aggs).collect()[0]  # ONE row, |cols|-bounded

    out: list[tuple[str, str, str, object]] = []
    n = prof["__n"]
    for c in cols:
        nulls, nd = prof[f"{c}__nn"], prof[f"{c}__nd"]
        if nulls == 0:
            out.append((c, "not_null", f"{c} IS NOT NULL",
                        DomainRule(column=c, required=True,
                                   name=f"suggested:not_null:{c}")))
        elif n:
            rate = math.ceil(nulls / n * 1.25 * 10_000) / 10_000
            out.append((c, "null_rate_max", f"{min(rate, 1.0):.4f}", None))
        if n and nd == n - nulls and nd > 0:
            out.append((c, "unique", f"{c} is unique", None))
        if isinstance(fields[c], _NUMERIC) and nd > 0:
            lo = _fmt_num(prof[f"{c}__mn"])
            hi = _fmt_num(prof[f"{c}__mx"])
            out.append((c, "range", f"{c} BETWEEN {lo} AND {hi}",
                        DomainRule(column=c, min_value=float(lo),
                                   max_value=float(hi),
                                   name=f"suggested:range:{c}")))
        if isinstance(fields[c], T.StringType) and nd > 0:
            ml = prof[f"{c}__ml"]
            out.append((c, "max_length", f"length({c}) <= {ml}",
                        # (?s) so '.' spans newlines: pure length cap
                        DomainRule(column=c, pattern=f"(?s).{{0,{ml}}}",
                                   name=f"suggested:max_length:{c}")))
        if 0 < nd <= categorical_max:
            # pass 2: enumeration is safe — cardinality measured first
            vals = [r[0] for r in
                    df.select(c).where(F.col(c).isNotNull())
                    .distinct().collect()]
            rendered = sorted(
                f"'{v}'" if dtypes[c] == "string" else _fmt_num(v)
                for v in vals)
            out.append((c, "in_set", f"{c} IN ({', '.join(rendered)})",
                        DomainRule(column=c, in_set=tuple(sorted(vals)),
                                   name=f"suggested:in_set:{c}")))
    return sorted(out, key=lambda t: (t[0], t[1]))


def constraint_suggestions(df: DataFrame, cols: list[str],
                           categorical_max: int = 10) -> DataFrame:
    """Suggest declarative constraints for ``cols`` of ``df`` (see
    module docstring for the rule kinds and the two-pass shape).

    Driver-side state is bounded by |cols| (one aggregate row) plus
    ``categorical_max`` values per qualifying column — never by table
    size. Returns a DataFrame with SUGGESTION_SCHEMA, one row per
    suggested rule, ordered (column, rule_type) for stable compares.
    """
    rows = [(c, k, r) for c, k, r, _ in _suggest(df, cols, categorical_max)]
    return df.sparkSession.createDataFrame(rows, SUGGESTION_SCHEMA)


def suggest_domain_rules(df: DataFrame, cols: list[str],
                         categorical_max: int = 10) -> tuple:
    """The executable half: profile ``df`` and return the suggestions
    directly as :class:`~json_spark.operators.domain.DomainRule` objects,
    ready for domain_rollup / domain_violations / the streaming rule
    surface. By construction every returned rule PASSES on the profiled
    data (bounds and member sets are observed, the length cap is the
    observed max) — the closure property the pytest suite pins."""
    return tuple(r for _, _, _, r in _suggest(df, cols, categorical_max)
                 if r is not None)
