"""Verdict roll-up + violation emission.

Lifts the reference's per-decode Green/Yellow/Red result color
(internal/dirtyjson/result.go:4-18 — drafted there, wired here) to
partition-level data quality: a partition is RED if any row is RED,
YELLOW if any is YELLOW, else GREEN — i.e. a ``max`` over verdict ranks,
which aggregates map-side (one combine row per task per partition key)
and shuffles almost nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.coercion import verdict_rank


def row_verdict(*verdict_cols: Column) -> Column:
    """Worst verdict across several per-column verdicts (max rank)."""
    ranked = [verdict_rank(v) for v in verdict_cols]
    worst = ranked[0]
    for r in ranked[1:]:
        worst = F.greatest(worst, r)
    return (
        F.when(worst == 2, F.lit("RED"))
        .when(worst == 1, F.lit("YELLOW"))
        .otherwise(F.lit("GREEN"))
    )


def rollup_verdicts(
    df: DataFrame,
    verdict_col: str,
    partition_cols: list[str],
    check_name: str = "coercion",
) -> DataFrame:
    """Per-partition verdict counts + rolled-up partition verdict."""
    v = F.col(verdict_col)
    out = df.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((v == "GREEN").cast("long")).alias("n_green"),
        F.sum((v == "YELLOW").cast("long")).alias("n_yellow"),
        F.sum((v == "RED").cast("long")).alias("n_red"),
        F.max(verdict_rank(v)).alias("__worst"),
    )
    return out.select(
        *partition_cols,
        F.lit(check_name).alias("check_name"),
        "n_rows", "n_green", "n_yellow", "n_red",
        F.when(F.col("__worst") == 2, "RED")
        .when(F.col("__worst") == 1, "YELLOW")
        .otherwise("GREEN")
        .alias("verdict"),
    )


def violations(
    df: DataFrame,
    key_col: str,
    partition_cols: list[str],
    checks: dict[str, tuple[str, str]],
) -> DataFrame:
    """RED rows per check → violation table.

    ``checks``: check_name → (verdict_col, offending_value_col). The
    offending value is truncated to 50 chars, mirroring the reference's
    ``limitedStr(s, 50)`` error formatting (internal/dirtyjson/helpers.go:8-23).
    """
    frames = []
    for check, (vcol, valcol) in checks.items():
        frames.append(
            df.filter(F.col(vcol) == "RED").select(
                F.col(key_col),
                *[F.col(p) for p in partition_cols],
                F.lit(check).alias("check_name"),
                F.substring(F.col(valcol).cast("string"), 1, 50).alias(
                    "offending_value_trunc50"
                ),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
