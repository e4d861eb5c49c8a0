"""FlexKeys: key matching/normalization as Column expressions.

Mirrors the reference's key tolerance layer:
- case-insensitive matching (decoder.go:255-257)
- "chameleon" matching — camelCase / snake_case / kebab-case / PascalCase /
  Header-Case / Title_Snake / hybrid all unify by lowercasing and dropping
  separators (helpers.go:45-67, decoder.go:259-261)
- the 7 case-convention detectors of cases/cases.go:12-20,37-275 as rlike
  predicates (used for the key-style column stat)

Driver-side schema alignment uses the same normalization in Python
(:func:`normalize_name`); executor-side (embedded-JSON map columns) uses
``F.transform_keys``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def chameleon_key(c: Column) -> Column:
    """lowercase + drop ``_ - `` separators (helpers.go:45-67)."""
    return F.regexp_replace(F.lower(c), "[-_ ]", "")


def case_insensitive_key(c: Column) -> Column:
    return F.lower(c)


def normalize_name(name: str, chameleon: bool = True) -> str:
    """Driver-side twin of :func:`chameleon_key` for schema alignment."""
    low = name.lower()
    if chameleon:
        return low.replace("-", "").replace("_", "").replace(" ", "")
    return low


def normalize_keys_map(m: Column, chameleon: bool = True) -> Column:
    """Normalize the keys of a map<string,*> column (embedded JSON objects)."""
    if chameleon:
        return F.transform_keys(m, lambda k, _v: chameleon_key(k))
    return F.transform_keys(m, lambda k, _v: F.lower(k))


#: regex per convention (cases/cases.go detectors 37-193). A word is
#: [a-z0-9]+ / [A-Z][a-z0-9]* etc.; single-word strings match several
#: conventions, like in the reference.
_CASE_RES: dict[str, str] = {
    "snake": r"^[a-z0-9]+(_[a-z0-9]+)*$",
    "camel": r"^[a-z][a-z0-9]*([A-Z][a-z0-9]*)*$",
    "pascal": r"^([A-Z][a-z0-9]*)+$",
    "kebab": r"^[a-z0-9]+(-[a-z0-9]+)*$",
    "header": r"^[A-Z][a-z0-9]*(-[A-Z][a-z0-9]*)*$",
    "title_snake": r"^[A-Z][a-z0-9]*(_[A-Z][a-z0-9]*)*$",
    # hybrid: mixes separators/cases but still word-ish
    "hybrid": r"^[A-Za-z0-9]+([-_ ][A-Za-z0-9]+)+$",
}


def detect_case(c: Column) -> Column:
    """First matching convention name (detector order mirrors cases.go:196-215),
    'unknown' when none match."""
    expr = F.lit("unknown")
    for name in reversed(["snake", "camel", "pascal", "kebab", "header", "title_snake", "hybrid"]):
        expr = F.when(c.rlike(_CASE_RES[name]), F.lit(name)).otherwise(expr)
    return expr


def is_case(c: Column, convention: str) -> Column:
    """``cases.Is(s, target)`` (cases/cases.go:196-215) as a predicate."""
    if convention not in _CASE_RES:
        raise ValueError(f"unknown case convention: {convention}")
    return c.rlike(_CASE_RES[convention])


# ---------------------------------------------------------------------------
# Word splitting and case transforms (cases/cases.go:279-342, 361-375)
# ---------------------------------------------------------------------------

#: separator runes (cases.go:306 separatorRunes; \x00 appears only in the
#: hybrid-case internals and never in real JSON keys)
_SEP_SPLIT_RE = "[-_ \\x00]"


def _camel_split(p: Column) -> Column:
    """splitCamelCase (cases.go:361-375): boundary before an uppercase
    letter preceded by a lowercase letter or digit."""
    return F.split(
        F.regexp_replace(p, "(?<=[a-z0-9])(?=[A-Z])", "\u0001"), "\u0001")


def _has_mixed_case(p: Column) -> Column:
    """hasMixedCase (cases.go:344-358): at least one upper AND one lower."""
    return p.rlike("[A-Z]") & p.rlike("[a-z]")


def split_words(c: Column) -> Column:
    """``cases.SplitWords`` (cases.go:308-341) as a Column expression.

    Separator-delimited parts are camel-split only when they mix cases;
    a separator-free string is always camel-split; strings with no
    valuable symbols (only separators / empty) yield an empty array.
    ASCII case classes, like the detectors above (JSON keys in this
    engine's domain are ASCII identifiers).
    """
    parts = F.filter(F.split(c, _SEP_SPLIT_RE), lambda p: p != F.lit(""))
    by_sep = F.flatten(F.transform(
        parts,
        lambda p: F.when(_has_mixed_case(p), _camel_split(p))
        .otherwise(F.array(p)),
    ))
    words = F.when(c.rlike(_SEP_SPLIT_RE), by_sep).otherwise(_camel_split(c))
    # hasValuableSymbols (cases.go:24-32)
    return F.when(c.rlike("[^-_ ]"), words).otherwise(
        F.array().cast("array<string>"))


def _capitalize(w: Column) -> Column:
    """capitalizeWords element (cases.go:387-397): Upper(first)+lower(rest)."""
    return F.concat(F.upper(F.substring(w, 1, 1)),
                    F.lower(F.substring(w, 2, 0x7FFFFFFF)))


#: transform target -> words joiner (cases.go:279-303)
_TRANSFORMS = ("snake", "camel", "pascal", "kebab", "header", "title_snake")


def transform_to(c: Column, target: str) -> Column:
    """``cases.TransformTo`` (cases.go:279-303) as a Column expression.

    Determined conventions only — 'hybrid' raises, like the reference's
    panic (TransformToHybrid is RNG-driven dirtifier machinery, not a
    deterministic engine transform).

    Rendering several conventions of the same key? Materialize
    :func:`split_words` in its own projection and call :func:`join_words`
    per target — HOF chains defeat Catalyst's subexpression elimination,
    so N transform_to calls re-split N times (measured 3x on the
    key_style_stats query).
    """
    return join_words(split_words(c), target)


def join_words(words: Column, target: str) -> Column:
    """TransformTo's join step over an already-split words array."""
    if target not in _TRANSFORMS:
        raise ValueError(
            f"transform_to supports {_TRANSFORMS}, got {target!r}")
    lower_words = F.transform(words, lambda w: F.lower(w))
    cap_words = F.transform(words, lambda w: _capitalize(w))
    if target == "snake":
        return F.array_join(lower_words, "_")
    if target == "kebab":
        return F.array_join(lower_words, "-")
    if target == "header":
        return F.array_join(cap_words, "-")
    if target == "title_snake":
        return F.array_join(cap_words, "_")
    if target == "pascal":
        return F.array_join(cap_words, "")
    # camel: lower(words[0]) + joinCapitalized(words[1:]); "" when no words
    rest = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    return F.when(F.size(words) == 0, F.lit("")).otherwise(
        F.concat(F.lower(F.element_at(words, 1)),
                 F.array_join(F.transform(rest, lambda w: _capitalize(w)), ""))
    )


def unknown_key_count(raw: Column, expected: list[str],
                      chameleon: bool = True) -> Column:
    """Per-document count of JSON keys that match NO expected field.

    The reference silently skips unmatched fields
    (internal/dirtyjson/decoder.go:221-226); a validator must surface
    them, so this is the promised extra-column stat (SURVEY §2.3).
    Matching uses the same normalization as field lookup (chameleon or
    case-insensitive). NULL for unparseable documents.
    """
    norm = sorted({normalize_name(k, chameleon) for k in expected})
    keys = F.map_keys(F.from_json(raw, "map<string,string>"))
    normalize = chameleon_key if chameleon else case_insensitive_key
    unknown = F.size(F.filter(keys, lambda k: ~normalize(k).isin(norm)))
    return F.when(keys.isNotNull(), unknown)


# ---------------------------------------------------------------------------
# Embedded-JSON key normalization (the executor-side FlexKeys path)
# ---------------------------------------------------------------------------

_OBJ_RE = r"^\s*\{"
_ARR_RE = r"^\s*\["


def _quote_scalar(v: Column) -> Column:
    """Re-quote a raw scalar string as a JSON string literal with correct
    escaping: to_json(array(v)) = '["<escaped>"]' minus the brackets."""
    arr = F.to_json(F.array(v))
    return F.substring(arr, 2, F.length(arr) - 2)


def normalize_embedded_keys(c: Column, depth: int = 3) -> Column:
    """Chameleon-normalize every object key inside an embedded-JSON string.

    The reference applies FlexKeys only in the DIRTY pass (the reflective
    decode, decoder.go:141, key matching 242-262) — and its own chameleon
    end-to-end golden is skipped (tests/sample1_test.go:93-145). This is
    the working Spark equivalent: parse each object level as
    ``map<string,string>`` (Spark stringifies nested values, preserving
    their raw JSON text), normalize the keys, recurse into object values
    and array elements up to ``depth``, and rebuild the JSON text.

    Scalars come back re-quoted (the map parse erases the quoted/bare
    distinction), so a normalized document routes through the stringly +
    coercion pass wholesale — recoverable fields land YELLOW, which is
    exactly the reference's semantics for key-flexed documents.

    Failure contract (a validator must never silently drop a field): a
    string value that merely LOOKS like a container ('{'/'['-prefixed but
    unparseable) falls back to its re-quoted scalar form, and a document
    that fails the top-level parse passes through unchanged — never null.
    """
    return F.coalesce(_normalize_object(c, depth), c)


def _container_or_scalar(v: Column, obj_depth: int, arr_depth: int) -> Column:
    """Normalize v as object/array if it parses as one; else re-quote it.

    The coalesce fallbacks are what stop a '{'-prefixed unparseable scalar
    from nulling the whole entry (which concat_ws would then silently drop)
    and a '['-prefixed one from being re-emitted unquoted. Depths are split
    because object elements inside an array recurse at the array's own
    depth (an array level is not an object level), while arrays always
    strictly decrement to bound plan-build recursion.
    """
    expr = F.when(F.lit(False), F.lit(None).cast("string"))
    if obj_depth > 0:
        expr = expr.when(
            v.rlike(_OBJ_RE),
            F.coalesce(_normalize_object(v, obj_depth), _quote_scalar(v)))
    if arr_depth > 0:
        expr = expr.when(
            v.rlike(_ARR_RE),
            F.coalesce(_normalize_array(v, arr_depth), _quote_scalar(v)))
    return expr.otherwise(_quote_scalar(v))


def _normalize_object(c: Column, depth: int) -> Column:
    """Internal object normalizer: NULL when c does not parse as an object
    (callers coalesce to their own fallback)."""
    if depth <= 0:
        return F.lit(None).cast("string")

    m = F.from_json(c, "map<string,string>")
    entries = F.transform(
        F.map_entries(m),
        lambda e: F.concat(
            _quote_scalar(chameleon_key(e.getField("key"))),
            F.lit(":"),
            F.when(e.getField("value").isNull(), F.lit("null"))
            .otherwise(_container_or_scalar(
                e.getField("value"), depth - 1, depth - 1)),
        ),
    )
    rebuilt = F.concat(F.lit("{"), F.concat_ws(",", entries), F.lit("}"))
    return F.when(m.isNotNull(), rebuilt)


def _normalize_array(c: Column, depth: int) -> Column:
    """Internal array normalizer: NULL when c does not parse as an array
    (callers coalesce to their own fallback)."""
    if depth <= 0:
        return F.lit(None).cast("string")
    arr = F.from_json(c, "array<string>")
    elems = F.transform(
        arr,
        lambda v: F.when(v.isNull(), F.lit("null"))
        .otherwise(_container_or_scalar(v, depth, depth - 1)),
    )
    rebuilt = F.concat(F.lit("["), F.concat_ws(",", elems), F.lit("]"))
    return F.when(arr.isNotNull(), rebuilt)
