"""Sentinel / placeholder-value detection — the "looks present, means
absent" family of data-quality defects.

Producers that cannot emit NULL (CSV exporters, typed queues, legacy
ETL) encode missingness as in-band magic values: ``-1`` or ``99999999``
in id columns, ``0.0`` or negative prices, ``''``/``'N/A'``/``'null'``
strings, and the unix epoch in timestamp columns. d3rty's decoder
normalizes the *syntactic* shapes of null (``bool_from_null``,
``number_from_null`` — internal/decoder/decoder.go's null-coercion
rules); this operator is the *semantic* complement: values that parse
cleanly but carry the producer's "no value" convention. Null-rate
stats (operators/stats.py) are blind to every one of them.

Scale shape: ONE scan however many columns are checked — each sentinel
spec becomes a conditional-count expression inside a single
map-combinable aggregate (no scan-per-column union), and the per-column
report rows are unpivoted from that 1-row aggregate with a literal
``stack``. At 10^12 rows the exchange carries one partial-agg row per
task, nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rate above which a column's sentinel share turns the verdict YELLOW
SENTINEL_YELLOW_RATE = 0.01


def id_sentinels(c: Column) -> Column:
    """In-band missing-id conventions: -1, 0, and all-9s filler."""
    return c.isin(-1, 0, 99999999)


def numeric_sentinels(c: Column) -> Column:
    """Non-positive values standing in for "unknown amount"."""
    return c <= 0.0


def string_sentinels(c: Column) -> Column:
    """Empty-after-trim and the placeholder token lexicon."""
    return (F.trim(c) == "") | F.upper(c).isin(
        "N/A", "NULL", "NONE", "UNKNOWN", "--")


def timestamp_sentinels(c: Column) -> Column:
    """Epoch-adjacent timestamps (the 1970 tell of a zero-initialized
    integer field serialized as a date)."""
    return c < F.lit("1971-01-01").cast("timestamp")


def sentinel_scan(df: DataFrame,
                  specs: list[tuple[str, Column]],
                  yellow_rate: float = SENTINEL_YELLOW_RATE) -> DataFrame:
    """One row per checked column: (col_name, n_rows, n_sentinel,
    sentinel_rate, verdict) — GREEN, or YELLOW once the sentinel share
    exceeds ``yellow_rate``.

    ``specs`` pairs a report name with the sentinel predicate over the
    source frame. All predicates evaluate inside ONE single-row
    aggregate (one scan, map-side combine); the report is a literal
    unpivot of that row.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(specs):
        # coalesce(0): an EMPTY frame reports 0 sentinels per column
        # (one report row each, rate null), not null counts
        aggs.append(F.coalesce(F.sum(pred.cast("long")),
                               F.lit(0)).alias(f"__s{i}"))
    one = df.agg(*aggs)
    stack = ", ".join(f"'{name}', __s{i}" for i, (name, _) in enumerate(specs))
    # guard the empty frame: ANSI sessions raise on 0/0 integer
    # division, and a rate over nothing is undefined anyway
    rate = F.when(F.col("n_rows") > 0,
                  F.col("n_sentinel") / F.col("n_rows"))
    return (one.select(
        F.expr(f"stack({len(specs)}, {stack}) AS (col_name, n_sentinel)"),
        F.col("__n").alias("n_rows"))
        .select("col_name", "n_rows", "n_sentinel",
                F.round(rate, 6).alias("sentinel_rate"),
                F.when(rate > yellow_rate, "YELLOW")
                .otherwise("GREEN").alias("verdict")))
