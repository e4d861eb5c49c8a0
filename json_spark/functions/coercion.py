"""Coercion predicate library — the reference's tolerance rules as Columns.

Each ``coerce_*`` takes a raw STRING column (one JSON-ish scalar token per
row; SQL NULL models JSON null) plus a RuleConfig and returns a
:class:`CoercionResult` of three pure Column expressions:

- ``strict``  — value under strict JSON decoding (null when strict fails),
- ``coerced`` — best-effort value (strict, else the tolerant path),
- ``verdict`` — 'GREEN' | 'YELLOW' | 'RED', mirroring the reference's result
  color model (internal/dirtyjson/result.go:4-18): GREEN = strict pass,
  YELLOW = recovered via a tolerance rule, RED = unrecoverable.

Everything is built-in ``pyspark.sql.functions`` — no Python row UDFs — so
Catalyst constant-folds the rule flags (they are driver-side literals) and
whole-stage codegen applies. All casts are try_* forms: identical behavior
under ANSI (Spark 4 default) and legacy modes.

Reference semantics reproduced (file:line into /root/reference):
- number from string: strip spaces/commas then parse (dirtytypes.go:111-144)
- number from bool/null (dirtytypes.go:150-169); containers rejected (171-173)
- integer: base-10 strict; RoundingAlgorithm none/floor/round — declared in
  config (enums.go:96-108) but TODO in the reference (dirtytypes.go:227-230);
  implemented here
- bool from strings/numbers/null (dirtytypes.go:299-454, bool-from-num.go)
- string strict + surrounding-space trim (dirtytypes.go:284-296, helpers.go:29-41)
- date/datetime/time multi-layout + unix s/ms + aliases (dirtytypes.go:513-657)
- array/object strict + AutoWrapSingleValues (dirtytypes.go:457-510,
  config.go:141-146)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config.rules import RuleConfig

# verdict literals must be built lazily (F.lit needs an active session in
# classic PySpark), hence functions not module constants
def GREEN() -> Column:
    return F.lit("GREEN")


def YELLOW() -> Column:
    return F.lit("YELLOW")


def RED() -> Column:
    return F.lit("RED")

#: a JSON number literal (strict path accepts exponents — that's valid JSON)
_JSON_NUMBER_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"
_JSON_INT_RE = r"^-?\d+$"
#: container openers are rejected by scalar coercions (dirtytypes.go:171-173)
_CONTAINER_RE = r"^\s*[\[{]"


@dataclass(frozen=True)
class CoercionResult:
    strict: Column
    coerced: Column
    verdict: Column

    def with_prefix(self, name: str) -> list[Column]:
        """Aliased triple ``{name}__strict / __coerced / __verdict``."""
        return [
            self.strict.alias(f"{name}__strict"),
            self.coerced.alias(f"{name}__coerced"),
            self.verdict.alias(f"{name}__verdict"),
        ]


def verdict_rank(verdict: Column) -> Column:
    """GREEN→0, YELLOW→1, RED→2 for max()-rollup to partition verdicts."""
    return (
        F.when(verdict == "GREEN", F.lit(0))
        .when(verdict == "YELLOW", F.lit(1))
        .otherwise(F.lit(2))
    )


def _result(strict: Column, tolerant: Column, red_forced: Column | None = None) -> CoercionResult:
    """Assemble the GREEN/YELLOW/RED triple from strict + tolerant values."""
    verdict = (
        F.when(strict.isNotNull(), GREEN())
        .when(tolerant.isNotNull(), YELLOW())
        .otherwise(RED())
    )
    if red_forced is not None:
        verdict = F.when(red_forced, RED()).otherwise(verdict)
        tolerant = F.when(red_forced, F.lit(None)).otherwise(tolerant)
    return CoercionResult(
        strict=strict,
        coerced=F.coalesce(strict, tolerant),
        verdict=verdict,
    )




def _ambient_cfg(fn):
    """Resolve ``cfg=None`` to the thread-scoped ambient config
    (config/context.py) — the engine's getConfig(ctx): an explicit cfg
    always outranks the scope, mirroring the reference's precedence."""
    import functools

    @functools.wraps(fn)
    def wrap(c, cfg=None, *args, **kwargs):
        if cfg is None:
            from ..config.context import current_config
            cfg = current_config()
        return fn(c, cfg, *args, **kwargs)

    return wrap


# --------------------------------------------------------------------------
# numbers
# --------------------------------------------------------------------------

def _cleaned_numeric_string(c: Column, cfg: RuleConfig) -> Column:
    """Space/comma stripping in the reference's order (dirtytypes.go:123-129)."""
    fs = cfg.number_rules.from_strings
    out = F.trim(c)
    if fs.spacing_allowed:
        out = F.regexp_replace(out, " ", "")
    if fs.commas_allowed:
        out = F.regexp_replace(out, ",", "")
    return out


@_ambient_cfg
def coerce_number(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    """Target DoubleType. Strict = JSON number token; tolerances per config."""
    nr = cfg.number_rules
    strict = F.when(c.rlike(_JSON_NUMBER_RE), c).otherwise(F.lit(None)).try_cast("double")

    tolerant = F.lit(None).cast("double")
    if not nr.disabled:
        if not nr.from_strings.disabled:
            cleaned = _cleaned_numeric_string(c, cfg)
            if not nr.from_strings.exponent_notation_allowed:
                cleaned = F.when(cleaned.rlike("[eE]"), F.lit(None)).otherwise(cleaned)
            # reject Inf/NaN-ish tokens Spark's cast accepts but JSON doesn't
            cleaned = F.when(cleaned.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), cleaned)
            tolerant = cleaned.try_cast("double")
        if not nr.from_bools_disabled:
            low = F.lower(F.trim(c))
            tolerant = F.coalesce(
                tolerant,
                F.when(low == "true", F.lit(1.0)).when(low == "false", F.lit(0.0)),
            )
        if not nr.from_null_disabled:
            tolerant = F.when(c.isNull(), F.lit(0.0)).otherwise(tolerant)
    return _result(strict, tolerant, red_forced=c.rlike(_CONTAINER_RE))


@_ambient_cfg
def coerce_integer(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    """Target LongType. Strict = JSON integer token (ParseInt base 10,
    dirtytypes.go:233,275); float strings go through RoundingAlgorithm."""
    nr = cfg.number_rules
    strict = F.when(c.rlike(_JSON_INT_RE), c).otherwise(F.lit(None)).try_cast("long")

    tolerant = F.lit(None).cast("long")
    if not nr.disabled:
        if not nr.from_strings.disabled:
            cleaned = _cleaned_numeric_string(c, cfg)
            if not nr.from_strings.exponent_notation_allowed:
                cleaned = F.when(cleaned.rlike("[eE]"), F.lit(None)).otherwise(cleaned)
            as_int = F.when(cleaned.rlike(_JSON_INT_RE), cleaned).try_cast("long")
            as_dbl = F.when(
                cleaned.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), cleaned
            ).try_cast("double")
            alg = nr.from_strings.rounding_algorithm
            if alg == "floor":
                from_float = F.floor(as_dbl).try_cast("long")
            elif alg == "round":
                # Go math.Round = half away from zero == Spark round(double)
                from_float = F.round(as_dbl).try_cast("long")
            else:  # "none": only zero-decimal floats pass
                from_float = F.when(as_dbl == F.floor(as_dbl), F.floor(as_dbl)).try_cast("long")
            tolerant = F.coalesce(as_int, from_float)
        if not nr.from_bools_disabled:
            low = F.lower(F.trim(c))
            tolerant = F.coalesce(
                tolerant,
                F.when(low == "true", F.lit(1).cast("long"))
                .when(low == "false", F.lit(0).cast("long")),
            )
        if not nr.from_null_disabled:
            tolerant = F.when(c.isNull(), F.lit(0).cast("long")).otherwise(tolerant)
    return _result(strict, tolerant, red_forced=c.rlike(_CONTAINER_RE))


# --------------------------------------------------------------------------
# booleans
# --------------------------------------------------------------------------

def _bool_from_number_expr(n: Column, parse_func: str) -> Column:
    """internal/dirtyjson/bool-from-num.go:17-45."""
    if parse_func == "positive_negative":
        return F.when(n.isNotNull(), n > 0)
    if parse_func == "sign_of_one":
        return F.when(n == 1, F.lit(True)).when(n == -1, F.lit(False))
    # "binary" (default)
    return F.when(n == 1, F.lit(True)).when(n == 0, F.lit(False))


@_ambient_cfg
def coerce_bool(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    """Target BooleanType. Order mirrors dirtytypes.go:338-418:
    custom lists → numbers logic (if RespectFromNumbersLogic) → fallback."""
    br = cfg.bool_rules
    low_strict = F.trim(c)
    strict = F.when(low_strict == "true", F.lit(True)).when(
        low_strict == "false", F.lit(False)
    )

    tolerant = F.lit(None).cast("boolean")
    fallback_applies = F.lit(False)
    if not br.disabled:
        if not br.from_strings.disabled:
            fs = br.from_strings
            probe = F.trim(c)
            if fs.case_insensitive:
                probe = F.lower(probe)
                true_list = [s.lower() for s in fs.true_list]
                false_list = [s.lower() for s in fs.false_list]
            else:
                true_list = list(fs.true_list)
                false_list = list(fs.false_list)
            tolerant = F.when(probe.isin(true_list), F.lit(True)).when(
                probe.isin(false_list), F.lit(False)
            )
            if fs.respect_from_numbers_logic and not br.from_numbers.disabled:
                as_num = F.trim(c).try_cast("double")
                tolerant = F.coalesce(
                    tolerant, _bool_from_number_expr(as_num, br.from_numbers.parse_func)
                )
            # fallback value for non-null strings that matched nothing
            # (dirtytypes.go:395); FallbackValue null ⇒ stays RED
            if br.fallback_value is not None:
                fallback_applies = c.isNotNull() & ~c.rlike(_CONTAINER_RE)
        elif not br.from_numbers.disabled:
            as_num = F.trim(c).try_cast("double")
            tolerant = _bool_from_number_expr(as_num, br.from_numbers.parse_func)
        if not br.from_null.disabled:
            tolerant = F.when(
                c.isNull(), F.lit(bool(br.from_null.inverse))
            ).otherwise(tolerant)

    if br.fallback_value is not None and not br.disabled and not br.from_strings.disabled:
        tolerant = F.coalesce(
            tolerant, F.when(fallback_applies, F.lit(bool(br.fallback_value)))
        )
    return _result(strict, tolerant, red_forced=c.rlike(_CONTAINER_RE))


# --------------------------------------------------------------------------
# strings
# --------------------------------------------------------------------------

@_ambient_cfg
def coerce_string(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    """Strict accepts any string; surrounding whitespace is recoverable
    (trimmed) per helpers.go:29-41. Null is RED (no String.FromNull rule)."""
    trimmed = F.trim(c)
    strict = F.when(c == trimmed, c)
    tolerant = F.when(c.isNotNull(), trimmed)
    return _result(strict, tolerant)


# --------------------------------------------------------------------------
# dates / timestamps / time-of-day
# --------------------------------------------------------------------------

#: weekday-name prefix ("Mon, " / "Monday, ") — Spark can't PARSE 'EEE'
#: patterns (formatting-only), so we strip the prefix and parse the rest.
_WEEKDAY_PREFIX_RE = r"^(Mon|Tue(s)?|Wed(nes)?|Thu(rs)?|Fri|Sat(ur)?|Sun)(day)?, "


def _layouts_without_weekday(layouts: tuple[str, ...]) -> list[str]:
    seen, out = set(), []
    for p in layouts:
        p = p.replace("EEEE, ", "").replace("EEE, ", "")
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def _timestamp_tolerant(c: Column, cfg: RuleConfig) -> Column:
    dr = cfg.date_rules
    branches: list[Column] = []
    if dr.from_strings.allowed:
        stripped = F.regexp_replace(F.trim(c), _WEEKDAY_PREFIX_RE, "")
        layouts = _layouts_without_weekday(
            dr.from_strings.datetime_layouts + dr.from_strings.date_layouts
        )
        branches += [F.try_to_timestamp(stripped, F.lit(p)) for p in layouts]
        if dr.from_strings.aliases:
            low = F.lower(F.trim(c))
            branches.append(
                F.when(low == "now", F.date_trunc("second", F.current_timestamp()))
                .when(low == "today", F.to_timestamp(F.current_date()))
                .when(low == "yesterday", F.to_timestamp(F.date_add(F.current_date(), -1)))
                .when(low == "tomorrow", F.to_timestamp(F.date_add(F.current_date(), 1)))
            )
    if not dr.from_numbers.disabled and dr.from_strings.respect_from_numbers_logic:
        digits = F.trim(c)
        # s-vs-ms disambiguation by digit count (default.toml:114-116 caveat):
        # 12-14 digits ⇒ millis, 1-11 ⇒ seconds
        if dr.from_numbers.unix_milli_timestamp:
            branches.append(
                F.when(digits.rlike(r"^\d{12,14}$"),
                       F.timestamp_millis(digits.try_cast("long")))
            )
        if dr.from_numbers.unix_timestamp:
            branches.append(
                F.when(digits.rlike(r"^\d{1,11}$"),
                       F.timestamp_seconds(digits.try_cast("long")))
            )
    if not dr.from_null_disabled:
        # null → zero time (dirtytypes.go:628-632)
        branches.append(F.when(c.isNull(), F.timestamp_seconds(F.lit(0))))
    if not branches:
        return F.lit(None).cast("timestamp")
    return F.coalesce(*branches)


def _timestamp_strict(c: Column) -> Column:
    """Strict = RFC3339 (Go's clean time.Time decode, dirtytypes.go:513-521)."""
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX")),
    )


def _date_red_forced(c: Column) -> Column:
    """Bools and containers are rejected for dates (dirtytypes.go:633-636)."""
    return c.rlike(_CONTAINER_RE) | F.lower(F.trim(c)).isin("true", "false")


@_ambient_cfg
def coerce_timestamp(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    if cfg.date_rules.disabled:
        return _result(_timestamp_strict(c), F.lit(None).cast("timestamp"),
                       red_forced=_date_red_forced(c))
    return _result(_timestamp_strict(c), _timestamp_tolerant(c, cfg),
                   red_forced=_date_red_forced(c))


def effective_timezone(cfg: RuleConfig,
                       siblings: dict[str, Column]) -> Column:
    """The per-row IANA zone for date parsing: the first non-null sibling
    field named in Date.Timezone.Fields (reference config.go:112-117,
    defaults config.go:190-194), else Date.Timezone.Default."""
    dr = cfg.date_rules
    cands = [siblings[f] for f in dr.timezone_fields if f in siblings]
    default = F.lit(dr.timezone_default)
    return F.coalesce(*cands, default) if cands else default


def _wall_ntz(parsed: Column) -> Column:
    """Session-TZ-invariant wall clock of a naive parse: try_to_timestamp
    interprets the naive string in the session zone; date_format renders
    the instant back in the same session zone — the composition returns
    the wall clock AS WRITTEN under any session timezone (for wall times
    that exist in the session zone; mid-day fixtures always do)."""
    return F.to_timestamp_ntz(
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss"))


@_ambient_cfg
def coerce_timestamp_zoned(c: Column, cfg: RuleConfig | None = None,
                           siblings: dict[str, Column] | None = None
                           ) -> CoercionResult:
    """Timestamp coercion with the reference's Date.Timezone semantics
    (config.go:112-117 — declared-only there; implemented here, like
    RoundingAlgorithm and AutoWrapSingleValues before it):

    - offset-less layouts are interpreted as wall-clock in the row's
      effective zone (first non-null sibling in Fields, else Default);
    - RFC3339 inputs with an explicit offset are strict (GREEN) — the
      offset is applied by pure arithmetic, no zone database;
    - unix second/milli numbers are instants already;
    - ForceConvertingInto=True converts every result INTO the effective
      zone (output = TIMESTAMP_NTZ wall-clock there); False outputs the
      instant's UTC wall-clock. NTZ output keeps the whole pipeline
      session-timezone-invariant.

    Alias tokens ("now"/"today"/...) are session-clock-relative and stay
    in :func:`coerce_timestamp`; fractional seconds truncate to the
    second (a validator cares about instants, not nanos).
    """
    dr = cfg.date_rules
    tz = effective_timezone(cfg, siblings or {})
    s = F.regexp_replace(F.trim(c), r"\.\d+", "")  # drop fractions
    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    # strict: explicit-offset RFC3339 → offset arithmetic on the wall
    off = F.regexp_extract(s, r"([+-]\d{2}:\d{2}|Z)$", 1)
    wall19 = F.to_timestamp_ntz(
        F.when(s.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}([+-]\d{2}:\d{2}|Z)$"),
               F.regexp_replace(F.substring(s, 1, 19), "T", " ")))
    to_utc_min = F.when(off == "Z", F.lit(0)).otherwise(
        F.when(off.startswith("-"), F.lit(1)).otherwise(F.lit(-1))
        * (F.substring(off, 2, 2).try_cast("int") * 60
           + F.substring(off, 5, 2).try_cast("int")))
    strict_utc = F.when(
        (off != "") & wall19.isNotNull(),
        F.timestamp_add("MINUTE", to_utc_min, wall19))

    # tolerant: offset-less layouts, wall-clock in the effective zone
    branches: list[Column] = []
    if not dr.disabled and dr.from_strings.allowed:
        stripped = F.regexp_replace(F.trim(c), _WEEKDAY_PREFIX_RE, "")
        layouts = [p for p in _layouts_without_weekday(
            dr.from_strings.datetime_layouts + dr.from_strings.date_layouts)
            if "X" not in p]  # offset layouts belong to the strict path
        for p in layouts:
            wall = _wall_ntz(F.try_to_timestamp(stripped, F.lit(p)))
            branches.append(F.convert_timezone(tz, F.lit("UTC"), wall))
    if (not dr.disabled and not dr.from_numbers.disabled
            and dr.from_strings.respect_from_numbers_logic):
        digits = F.trim(c)
        if dr.from_numbers.unix_milli_timestamp:
            branches.append(F.when(
                digits.rlike(r"^\d{12,14}$"),
                F.timestamp_add("MILLISECOND", digits.try_cast("long"),
                                epoch_ntz)))
        if dr.from_numbers.unix_timestamp:
            branches.append(F.when(
                digits.rlike(r"^\d{1,11}$"),
                F.timestamp_add("SECOND", digits.try_cast("long"),
                                epoch_ntz)))
    if not dr.disabled and not dr.from_null_disabled:
        branches.append(F.when(c.isNull(), epoch_ntz))
    tolerant_utc = (F.coalesce(*branches) if branches
                    else F.lit(None).cast("timestamp_ntz"))

    def _out(utc: Column) -> Column:
        if dr.force_converting_into:
            return F.convert_timezone(F.lit("UTC"), tz, utc)
        return utc

    return _result(_out(strict_utc), _out(tolerant_utc),
                   red_forced=_date_red_forced(c))


@_ambient_cfg
def coerce_date(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    """Date truncates to day (dirtytypes.go:534-539)."""
    ts = coerce_timestamp(c, cfg)
    return CoercionResult(
        strict=ts.strict.try_cast("date"),
        coerced=ts.coerced.try_cast("date"),
        verdict=ts.verdict,
    )


@_ambient_cfg
def coerce_time_of_day(c: Column, cfg: RuleConfig | None = None) -> CoercionResult:
    """Time drops the date (dirtytypes.go:553-557); no native Spark TimeType,
    so the value is seconds-of-day (long)."""
    dr = cfg.date_rules
    time_branches = [
        F.try_to_timestamp(F.trim(c), F.lit(p)) for p in dr.from_strings.time_layouts
    ] if (not dr.disabled and dr.from_strings.allowed) else []
    ts = coerce_timestamp(c, cfg)
    tolerant_ts = F.coalesce(*time_branches, ts.coerced) if time_branches else ts.coerced

    def _secs(col: Column) -> Column:
        return (
            F.hour(col) * 3600 + F.minute(col) * 60 + F.second(col)
        ).try_cast("long")

    verdict = (
        F.when(ts.strict.isNotNull(), GREEN())
        .when(tolerant_ts.isNotNull(), YELLOW())
        .otherwise(RED())
    )
    verdict = F.when(_date_red_forced(c), RED()).otherwise(verdict)
    return CoercionResult(
        strict=_secs(ts.strict),
        coerced=F.when(~_date_red_forced(c), _secs(tolerant_ts)),
        verdict=verdict,
    )


# --------------------------------------------------------------------------
# arrays / objects (embedded JSON in string columns)
# --------------------------------------------------------------------------

#: EXACTLY one JSON string token, escape-aware: the greedy ``^".*"$``
#: probe accepts multi-token spellings like ``"x","y"`` (r4 ADVICE),
#: but an inner unescaped quote cannot occur in a single token, so the
#: anchored (non-quote-non-backslash | backslash-anything)* body admits
#: one and only one token while keeping ``"a\",\"b"`` legal.
_JSON_STRING_TOKEN_RE = r'^"(?:[^"\\]|\\.)*"$'


def _json_string_value(t: Column) -> Column:
    """Parse a JSON STRING token (``"..."`` with escapes) to its value.
    Spark's from_json only accepts container schemas, so the token is
    wrapped in a one-element array; a malformed token nulls out. The
    single-token requirement (a multi-token spelling must fall to the
    dirty/RED tier, not silently truncate to its first token — r4
    ADVICE) is enforced by the escape-aware anchored regex, which costs
    one rlike instead of a second from_json evaluation for a
    parse-count probe (the probe version measured +0.9 s on
    coercion_stringified at sf0.1)."""
    arr = F.from_json(F.concat(F.lit("["), t, F.lit("]")),
                      "array<string>")
    return F.when(t.rlike(_JSON_STRING_TOKEN_RE), arr[0])


def unwrap_stringified(c: Column) -> tuple[Column, Column]:
    """StringifiedContainers (reference dirtytypes.go:74, issue 5 —
    declared-only TODO, implemented here like the rounding/auto-wrap/zone
    precedents): a container that arrives as a JSON-ESCAPED STRING —
    ``"[1,2]"`` or ``"{\\"a\\":1}"`` — is unwrapped to the inner JSON
    text before coercion. Two levels are peeled (double-stringified
    payloads are the common relay-through-two-services artifact); deeper
    nesting stays a string and falls out as RED at the container
    coercion. Returns (unwrapped token, was_unwrapped flag) — callers
    cap the verdict at YELLOW whenever the flag is set, because the
    spelling needed tolerance even if the inner JSON is pristine."""
    def peel(col: Column) -> Column:
        # unwrap ONE level of JSON string quoting (no container check:
        # a double-stringified payload peels to another STRING token)
        t = F.trim(col)
        inner = _json_string_value(t)
        return F.when(t.rlike(r'^"') & inner.isNotNull(), inner)

    def is_container(col: Column) -> Column:
        return F.trim(col).rlike(r"^[\[{]")

    once = peel(c)
    twice = peel(once)
    # deepest peel that lands on a container wins; a peel chain that
    # never reaches a container leaves the token untouched (plain
    # quoted strings keep their original coercion semantics)
    unwrapped = (
        F.when(twice.isNotNull() & is_container(twice), twice)
        .when(once.isNotNull() & is_container(once), once))
    return F.coalesce(unwrapped, c), unwrapped.isNotNull()


@_ambient_cfg
def coerce_smart_scalar(c: Column, cfg: RuleConfig | None = None) -> dict[str, Column]:
    """SmartScalar (reference dirtytypes.go:73, issue 4 — declared-only
    TODO): a decode target that accepts ANY scalar spelling and infers
    the best type, as a typed union of Columns.

    Ladder (first match wins):
    - strict JSON spellings → GREEN: null / ``true|false`` / integer
      token / number token / quoted string;
    - dirty spellings → YELLOW: the config's bool token lists
      (case-insensitivity and custom lists respected), then
      space/comma-cleaned integers and numbers, then any bare
      non-container text as a string;
    - containers → RED (scalars only — dirtytypes.go:171-173's stance).

    Returns {stype, bool_v, long_v, double_v, str_v, verdict}: exactly
    one value slot is non-null per row (none for null/RED). All pure
    Column expressions — codegen-friendly, no Python.
    """
    t = F.trim(c)
    is_container = t.rlike(r"^[\[{]")
    quoted_inner = F.when(t.rlike(r'^".*"$'), _json_string_value(t))

    # dirty-bool via the config's TOKEN LISTS only — deliberately NOT
    # coerce_bool, whose FallbackValue rule coerces ANY string to a
    # bool and would absorb the whole dirty tier into 'bool'
    fs = cfg.bool_rules.from_strings
    if cfg.bool_rules.disabled or fs.disabled:
        bool_dirty = F.lit(None).cast("boolean")
    else:
        probe = F.lower(t) if fs.case_insensitive else t
        true_list = [s.lower() if fs.case_insensitive else s
                     for s in fs.true_list]
        false_list = [s.lower() if fs.case_insensitive else s
                      for s in fs.false_list]
        bool_dirty = (F.when(probe.isin(true_list), F.lit(True))
                      .when(probe.isin(false_list), F.lit(False)))
    cleaned = _cleaned_numeric_string(c, cfg)

    stype = (
        F.when(c.isNull(), F.lit("null"))
        .when(is_container, F.lit(None).cast("string"))
        .when(t.isin("true", "false"), F.lit("bool"))
        .when(t.rlike(_JSON_INT_RE), F.lit("integer"))
        .when(t.rlike(_JSON_NUMBER_RE), F.lit("number"))
        .when(quoted_inner.isNotNull(), F.lit("string"))
        # ---- dirty tier ----
        .when(bool_dirty.isNotNull(), F.lit("bool"))
        .when(cleaned.rlike(_JSON_INT_RE), F.lit("integer"))
        .when(cleaned.rlike(_JSON_NUMBER_RE), F.lit("number"))
        .otherwise(F.lit("string")))
    strict = (
        c.isNull() | t.isin("true", "false") | t.rlike(_JSON_NUMBER_RE)
        | quoted_inner.isNotNull())
    verdict = (
        F.when(is_container, RED())
        .when(strict, GREEN())
        .otherwise(YELLOW()))
    bool_v = F.when(stype == "bool",
                    F.when(t.isin("true", "false"), t == "true")
                    .otherwise(bool_dirty))
    long_v = F.when(stype == "integer",
                    F.coalesce(
                        F.when(t.rlike(_JSON_INT_RE), t),
                        cleaned).try_cast("long"))
    double_v = F.when(stype == "number",
                      F.coalesce(
                          F.when(t.rlike(_JSON_NUMBER_RE), t),
                          cleaned).try_cast("double"))
    str_v = F.when(stype == "string", F.coalesce(quoted_inner, t))
    return {"stype": stype, "bool_v": bool_v, "long_v": long_v,
            "double_v": double_v, "str_v": str_v, "verdict": verdict}


@_ambient_cfg
def coerce_array(c: Column, cfg: RuleConfig | None = None,
                 element_type: str = "string",
                 fixed_len: int | None = None) -> CoercionResult:
    """Strict: JSON array or null (dirtytypes.go:457-482). AutoWrapSingleValues
    (config-declared only in the reference, config.go:141-146) wraps scalars.

    ``fixed_len`` mirrors the reference's fixed-length Go-array target
    (decoder.go:302-341): too few elements is an error (RED); extra
    elements are dropped — the reference skips them silently, a validator
    reports the tolerance, so a truncated array is YELLOW.

    With ``array_rules.stringified_containers`` on, a JSON-escaped
    container string is unwrapped first (issue 5; see
    :func:`unwrap_stringified`) and the row caps at YELLOW.
    """
    was_stringified = F.lit(False)
    if not cfg.array_rules.disabled and cfg.array_rules.stringified_containers:
        c, was_stringified = unwrap_stringified(c)
    parsed = F.from_json(c, f"array<{element_type}>")
    is_array_token = c.rlike(r"^\s*\[")
    strict_ok = c.isNull() | (is_array_token & parsed.isNotNull())
    strict = F.when(strict_ok, parsed)

    tolerant = F.lit(None).cast(f"array<{element_type}>")
    if not cfg.array_rules.disabled and cfg.array_rules.auto_wrap_single_values:
        scalar = ~c.rlike(r"^\s*[\[{]") & c.isNotNull()
        tolerant = F.when(scalar, F.array(c.try_cast(element_type)))

    verdict = (
        F.when(strict_ok, GREEN())
        .when(tolerant.isNotNull(), YELLOW())
        .otherwise(RED())
    )
    coerced = F.coalesce(strict, tolerant)

    if fixed_len is not None:
        # not enough elements -> error (decoder.go:316-318); extras
        # skipped via slice-to-N (decoder.go:324-330)
        too_short = coerced.isNotNull() & (F.size(coerced) < fixed_len)
        truncated = coerced.isNotNull() & (F.size(coerced) > fixed_len)
        coerced = F.when(~too_short, F.slice(coerced, 1, fixed_len))
        strict = F.when(strict.isNotNull() & ~too_short & ~truncated, strict)
        verdict = (
            F.when(too_short, RED())
            .when(truncated, YELLOW())
            .otherwise(verdict)
        )
    # a stringified spelling needed tolerance even if the inner JSON is
    # pristine: strict fails, verdict caps at YELLOW
    strict = F.when(~was_stringified, strict)
    verdict = F.when(was_stringified & (verdict == "GREEN"),
                     YELLOW()).otherwise(verdict)
    return CoercionResult(strict=strict, coerced=coerced, verdict=verdict)


@_ambient_cfg
def coerce_object(c: Column, cfg: RuleConfig | None = None,
                  key_type: str = "string") -> CoercionResult:
    """Strict: JSON object or null (dirtytypes.go:485-510) → map<string,string>.

    ``key_type`` mirrors decoder.go:374-385: for non-string map key types
    the reference re-parses each JSON key string as the target type and
    errors when any key fails — here any non-castable key makes the whole
    object RED, castable keys yield map<key_type,string>.

    ``array_rules.stringified_containers`` (the containers-family toggle)
    applies here too: a JSON-escaped object string unwraps to the inner
    JSON at YELLOW (issue 5).
    """
    was_stringified = F.lit(False)
    if not cfg.array_rules.disabled and cfg.array_rules.stringified_containers:
        c, was_stringified = unwrap_stringified(c)
    parsed = F.from_json(c, "map<string,string>")
    is_obj_token = c.rlike(r"^\s*\{")
    strict_ok = c.isNull() | (is_obj_token & parsed.isNotNull())
    strict = F.when(strict_ok & ~was_stringified, parsed)
    coerced = F.when(strict_ok, parsed)
    verdict = (F.when(strict_ok & ~was_stringified, GREEN())
               .when(strict_ok, YELLOW()).otherwise(RED()))
    if key_type == "string":
        return CoercionResult(strict=strict, coerced=coerced, verdict=verdict)

    keys_ok = F.size(F.filter(
        F.map_keys(coerced),
        lambda k: k.try_cast(key_type).isNull())) == 0
    typed = F.when(
        coerced.isNotNull() & keys_ok,
        F.transform_keys(coerced, lambda k, _v: k.cast(key_type)))
    bad_keys = coerced.isNotNull() & ~keys_ok
    return CoercionResult(
        strict=F.when(strict.isNotNull(), typed),
        coerced=typed,
        verdict=F.when(bad_keys, RED()).otherwise(verdict),
    )
