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


def dangling_dim_rows(dim: DataFrame, facts: DataFrame, key: str) -> DataFrame:
    """The REVERSE referential direction: dim (manifest) rows whose key
    matches no fact (clip) — a manifest claiming a clip that never
    landed, i.e. upload loss, the failure orphan checks can't see
    (orphans prove every clip is CLAIMED; this proves every claim is
    BACKED). Fixture-planted: duplicate-id rows reuse the previous id,
    so their own id never reaches the clips table while the manifest
    still lists it.

    Scale shape: at 10^12 facts the fact side can never broadcast — the
    anti-join shuffles both sides on the key once (keys only from the
    fact side, a single narrow column through the exchange) and AQE is
    free to broadcast whichever side turns out small at runtime; no
    hint forces the big side driver-side.
    """
    f = facts.select(key).distinct()
    return dim.join(f, key, "left_anti")


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


def speech_rate_check(clips: DataFrame,
                      min_cps: float = 10.0,
                      max_cps: float = 5000.0,
                      transcript_col: str = "transcript",
                      dur_col: str = "dur_ms",
                      group_cols: list[str] | None = None) -> DataFrame:
    """Cross-field transcript-vs-audio consistency: characters of
    transcript per second of audio must land in a plausible band.

    A transcript paired with the wrong clip (or a duration recorded in
    the wrong unit — the classic ms-vs-s ingest bug) moves the rate by
    orders of magnitude, so even a generous band is a sharp detector:
    misreading dur_ms as seconds divides every rate by 1000 and flips
    the whole corpus to TOO_SLOW. Rows with null duration or null
    transcript are UNRATABLE (YELLOW in suite terms) rather than
    silently passed.

    Pure Column arithmetic (length / dur), map-only into a group-sized
    aggregate — no Python, no shuffle beyond the final groupBy. At
    10^12 rows the output is |group| rows.
    """
    keys = list(group_cols or [])
    rate = (F.length(F.col(transcript_col))
            / (F.col(dur_col).cast("double") / 1000.0))
    status = (
        F.when(F.col(dur_col).isNull()
               | F.col(transcript_col).isNull(), "UNRATABLE")
        .when(rate < F.lit(min_cps), "TOO_SLOW")
        .when(rate > F.lit(max_cps), "TOO_FAST")
        .otherwise("OK"))
    return (clips
            .select(*keys, status.alias("status"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((F.col("status") == "OK").cast("long")).alias("n_ok"),
                 F.sum((F.col("status") == "UNRATABLE").cast("long"))
                 .alias("n_unratable"),
                 F.sum((F.col("status") == "TOO_SLOW").cast("long"))
                 .alias("n_too_slow"),
                 F.sum((F.col("status") == "TOO_FAST").cast("long"))
                 .alias("n_too_fast")))


def join_fanout_profile(left: DataFrame, right: DataFrame, key: str,
                        max_fanout: int = 1_000_000,
                        amp_yellow: float = 10.0) -> DataFrame:
    """Pre-join explosion guard: compute EXACTLY what an inner equality
    join on ``key`` would produce — output rows Σ n_l(k)·n_r(k), the
    worst single key's fan-out, and the amplification factor — WITHOUT
    running the join. The validation a 100 TB pipeline runs before an
    expensive join: a duplicate-ridden key on both sides turns a join
    into a cross-join-shaped blowup that no post-hoc check survives.

    Scale shape: each side collapses to (key, count) in one
    map-combinable aggregate; the profile join runs on the two
    key-cardinality-sized frames, never on raw rows, and everything
    after is a single-row reduction (plus a 1-row broadcast back for
    the deterministic top-key lookup: the MINIMUM key attaining the max
    fan-out, so ties cannot flap the output).

    Verdict: RED when the worst key's fan-out exceeds ``max_fanout``
    (one hot key melts one task — skew no AQE split fully saves),
    YELLOW when total amplification inner_rows / max(rows_l, rows_r)
    exceeds ``amp_yellow``, else GREEN.
    """
    la = left.select(F.col(key).alias("__k")).groupBy("__k").agg(
        F.count(F.lit(1)).alias("__nl"))
    ra = right.select(F.col(key).alias("__k")).groupBy("__k").agg(
        F.count(F.lit(1)).alias("__nr"))
    j = la.join(ra, "__k", "full_outer")
    fan = (F.coalesce(F.col("__nl"), F.lit(0))
           * F.coalesce(F.col("__nr"), F.lit(0)))
    prof = j.select("__k", "__nl", "__nr", fan.alias("__fan"))
    summary = prof.agg(
        F.sum(F.col("__nl").isNotNull().cast("long")).alias("n_keys_left"),
        F.sum(F.col("__nr").isNotNull().cast("long")).alias("n_keys_right"),
        F.sum((F.col("__fan") > 0).cast("long")).alias("n_keys_both"),
        F.sum(F.coalesce("__nl", F.lit(0))).alias("rows_left"),
        F.sum(F.coalesce("__nr", F.lit(0))).alias("rows_right"),
        F.sum("__fan").alias("inner_rows"),
        F.max("__fan").alias("max_key_fanout"))
    top = (prof.join(F.broadcast(summary.select("max_key_fanout")))
           .filter((F.col("__fan") == F.col("max_key_fanout"))
                   & (F.col("__fan") > 0))
           .agg(F.min("__k").alias("top_key")))
    amp = (F.col("inner_rows")
           / F.greatest(F.col("rows_left"), F.col("rows_right")))
    return (summary.join(F.broadcast(top))
            .select("n_keys_left", "n_keys_right", "n_keys_both",
                    "rows_left", "rows_right", "inner_rows",
                    "max_key_fanout", "top_key",
                    F.round(amp, 6).alias("amplification"),
                    F.when(F.col("max_key_fanout") > max_fanout, "RED")
                    .when(amp > amp_yellow, "YELLOW")
                    .otherwise("GREEN").alias("verdict")))


def orphan_value_mass(child: DataFrame, parent: DataFrame,
                      child_key: str, parent_key: str,
                      value_col: str) -> DataFrame:
    """Referential integrity with the VALUE at stake: child rows whose
    parent is missing, weighted by a value column — "3% of line items
    are orphaned" and "0.1% of revenue is orphaned" are very different
    incidents, and key-count orphan reports cannot tell them apart.

    One summary row: orphan row count/share and orphan value/share.
    Values sum as DECIMAL(18,2) (exact, order-invariant) so the shares
    are engine-reproducible. Scale shape: the parent side reduces to
    distinct keys before a LEFT ANTI-style flag join (left join + null
    test so BOTH totals come from the same single pass); one key
    shuffle, map-combinable sums.
    """
    pk = parent.select(F.col(parent_key).alias("__k")).distinct() \
        .withColumn("__hit", F.lit(1))
    j = (child.select(F.col(child_key).alias("__k"),
                      F.col(value_col).cast("decimal(18,2)").alias("__v"))
         .join(pk, "__k", "left"))
    orphan = F.col("__hit").isNull()
    agg = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(orphan.cast("long")).alias("n_orphan_rows"),
        F.sum("__v").alias("__tot"),
        F.sum(F.when(orphan, F.col("__v"))).alias("__orph"))
    return agg.select(
        "n_rows", "n_orphan_rows",
        F.round(F.col("n_orphan_rows") / F.col("n_rows"), 6)
        .alias("orphan_row_share"),
        F.coalesce(F.col("__orph"), F.lit(0).cast("decimal(18,2)"))
        .alias("orphan_value"),
        F.round(F.coalesce(F.col("__orph"), F.lit(0).cast("decimal(18,2)"))
                .cast("double") / F.col("__tot").cast("double"), 6)
        .alias("orphan_value_share"))
