"""Streaming referential integrity: stream-stream outer join orphans.

The batch check (operators/referential.py:orphans) answers "which clips
have no manifest entry" over a complete snapshot. On a continuous
ingest the question becomes temporal: a clip's manifest row may simply
not have ARRIVED yet, so "orphan" must mean "no matching manifest entry
within the allowed arrival delay". That is exactly Spark's watermarked
stream-stream LEFT OUTER join: matched pairs emit as they join;
unmatched clip rows are held in the state store and emitted with a null
manifest side only once the watermark proves no match can still arrive
— no false orphans from in-flight manifest rows, no unbounded wait.

Scale shape: both sides shuffle once on ``clip_id`` (the join key);
state is bounded by the watermark horizon — O(rows arriving within
``max_delay``) per side, independent of total stream length. The
event-time range condition is REQUIRED by Spark to bound outer-join
state; without it the left side would be retained forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_referential_orphans(
    clips: DataFrame,
    manifest: DataFrame,
    key: str = "clip_id",
    clip_time_col: str = "ts",
    manifest_time_col: str = "ts",
    max_delay: str = "10 minutes",
) -> DataFrame:
    """Clip rows whose manifest entry never arrived within ``max_delay``.

    Both inputs are streaming DataFrames. A clip at event time t matches
    a manifest row with the same ``key`` at event time in
    [t - max_delay, t + max_delay]; clips still unmatched when the
    watermark passes t + max_delay emit as orphans. Output columns: the
    clip side's columns (manifest side is dropped — it is all-null on
    orphan rows by construction).
    """
    c = clips.withWatermark(clip_time_col, max_delay)
    m = (
        manifest.select(
            F.col(key).alias("__m_key"),
            F.col(manifest_time_col).alias("__m_ts"),
        )
        .withWatermark("__m_ts", max_delay)
    )
    delay = F.expr(f"INTERVAL {max_delay}")
    cond = (
        (F.col(key) == F.col("__m_key"))
        & (F.col("__m_ts") >= F.col(clip_time_col) - delay)
        & (F.col("__m_ts") <= F.col(clip_time_col) + delay)
    )
    joined = c.join(m, cond, "leftOuter")
    return joined.filter(F.col("__m_key").isNull()).select(*clips.columns)
