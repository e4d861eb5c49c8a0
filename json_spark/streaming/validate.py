"""Structured Streaming wrapper: validate an append-only ingest stream.

The reference is strictly batch (one ``[]byte`` in, one struct out —
dirty.go:15-19), and the engine's primary resumability story is the
checkpoint ledger (plans/ledger.py) over batch re-runs. This module
covers the remaining ingest shape: data arriving CONTINUOUSLY, where
verdicts should be emitted per event-time window without waiting for a
batch boundary.

Because every coercion predicate is a pure stateless Column expression
(functions/coercion.py), the SAME compiled rules run unchanged on a
streaming DataFrame — no re-implementation, exactly Spark's
batch/streaming unification. The only streaming-specific pieces are the
watermark (bounded state for late data) and the tumbling-window rollup
(the streaming twin of the per-partition verdict rollup).

Scale notes: the windowed aggregation is a standard partial+final
streaming state store agg keyed on (window, partition_col); state size
is O(windows x partitions), independent of row volume. Use
``trigger(availableNow=True)`` for catch-up runs and checkpointLocation
for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config.rules import RuleConfig
from ..functions.coercion import verdict_rank


def streaming_row_verdicts(
    stream: DataFrame,
    rules: dict[str, "Column"],
) -> DataFrame:
    """Attach per-row verdicts to a streaming DataFrame.

    ``rules`` maps output column name → verdict Column (built from the
    §2.2 coercion predicates over the stream's columns). The worst rank
    across rules becomes ``row_verdict``.
    """
    out = stream
    worst = F.lit(0)
    for name, verdict_col in rules.items():
        out = out.withColumn(f"{name}__verdict", verdict_col)
        worst = F.greatest(worst, verdict_rank(F.col(f"{name}__verdict")))
    return out.withColumn(
        "row_verdict",
        F.when(worst == 2, "RED").when(worst == 1, "YELLOW").otherwise("GREEN"),
    )


def streaming_windowed_verdicts(
    stream: DataFrame,
    rules: dict[str, Column],
    event_time_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Windowed GREEN/YELLOW/RED rollup over an append-only stream.

    Late rows within ``watermark`` still land in their event-time window;
    later ones are dropped (bounded state — the streaming analogue of the
    ledger's partition granularity). Output mode: append (finalized
    windows only) or update (early results).
    """
    parts = list(partition_cols or [])
    with_verdicts = streaming_row_verdicts(
        stream.withWatermark(event_time_col, watermark), rules)
    rank = verdict_rank(F.col("row_verdict"))
    return (
        with_verdicts
        .groupBy(F.window(event_time_col, window_duration), *parts)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((rank == 0).cast("long")).alias("n_green"),
            F.sum((rank == 1).cast("long")).alias("n_yellow"),
            F.sum((rank == 2).cast("long")).alias("n_red"),
            F.max(rank).alias("__worst"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *parts,
            "n_rows", "n_green", "n_yellow", "n_red",
            F.when(F.col("__worst") == 2, "RED")
            .when(F.col("__worst") == 1, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
        )
    )


def streaming_window_drift(
    stream: DataFrame,
    value_col: str,
    event_time_col: str,
    baseline_shares: list[float],
    lo: float,
    hi: float,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    alert_threshold: float = 0.25,
) -> DataFrame:
    """Per-event-time-window PSI of a streaming value column against a
    PRECOMPUTED baseline histogram — continuous drift monitoring.

    Streaming-specific design: append mode allows ONE stateful
    aggregation, so the per-window histogram AND the PSI reduce in a
    single ``groupBy(window)`` — bucket counts become ``nbins``
    conditional-sum columns and the PSI is a closed-form expression over
    them, with the baseline shares baked in as literals. That is also the
    production-correct dataflow: the baseline is a small static artifact
    (built batch-side by operators/drift.py:histogram), not something to
    re-join per micro-batch. State is O(windows), independent of volume.

    Emits (window_start, window_end, n_rows, psi, drifted) per finalized
    window; the conventional >0.25 PSI gate marks ``drifted``.
    """
    from ..operators.drift import EPS

    nbins = len(baseline_shares)
    width = (hi - lo) / nbins
    v = F.col(value_col)
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width))),
    ).cast("int")

    agged = (
        stream.withWatermark(event_time_col, watermark)
        .filter(v.isNotNull())
        .withColumn("__b", bucket)
        .groupBy(F.window(event_time_col, window_duration))
        .agg(F.count(F.lit(1)).alias("n_rows"),
             *[F.sum((F.col("__b") == b).cast("long")).alias(f"__n{b}")
               for b in range(nbins)]))

    psi = F.lit(0.0)
    for b, q_share in enumerate(baseline_shares):
        p = F.greatest(F.col(f"__n{b}") / F.col("n_rows"), F.lit(EPS))
        q = F.greatest(F.lit(float(q_share)), F.lit(EPS))
        psi = psi + (p - q) * F.log(p / q)

    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_rows",
        F.round(psi, 6).alias("psi"),
        (psi > alert_threshold).alias("drifted"))


def streaming_window_quantile_shift(
    stream: DataFrame,
    value_col: str,
    event_time_col: str,
    domain: list[int],
    q50_base: float,
    iqr_base: float,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    yellow: float = 0.5,
    red: float = 1.0,
) -> DataFrame:
    """Per-event-time-window EXACT median shift of a discrete column
    against a precomputed baseline digest — the streaming twin of the
    batch quantile-shift drift (operators/drift.py:quantile_shift).

    Streaming-specific design, same discipline as
    :func:`streaming_window_drift`: append mode allows ONE stateful
    aggregation, so the per-window value histogram reduces as one
    conditional-sum column per domain value, and the exact median
    (k-th smallest, k = ceil(n/2) — the identical integer definition
    the batch operator and its DuckDB oracle share) is a closed-form
    cumulative CASE chain over those literal columns. This requires the
    column's value DOMAIN to be enumerable (sample-rate ladders, bitrate
    ladders, codec-implied rates — exactly the columns a validation
    suite watches); values outside the domain are counted in ``n_out``
    and excluded from the order statistic rather than silently binned.
    The baseline (median, IQR) is a small static artifact built
    batch-side by exact_quantile_digest, baked in as literals — nothing
    is joined per micro-batch, state is O(windows).

    Emits (window_start, window_end, n_rows, n_out, q50, shift,
    verdict) per finalized window; |shift| ≥ yellow/red in baseline-IQR
    units grades the window.
    """
    dom = sorted(int(d) for d in domain)
    v = F.col(value_col)
    agged = (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_duration))
        .agg(F.count(F.lit(1)).alias("n_all"),
             F.sum((~v.isin(dom)).cast("long")).alias("n_out"),
             *[F.sum((v == d).cast("long")).alias(f"__c{i}")
               for i, d in enumerate(dom)]))
    n = F.col("n_all") - F.col("n_out")
    k = F.floor((n + 1) / 2)
    med = F.lit(None).cast("long")
    cum = F.lit(0)
    # cumulative CASE chain, first domain value whose running count
    # reaches k — evaluated left to right so the FIRST hit wins
    expr = None
    for i, d in enumerate(dom):
        cum = cum + F.col(f"__c{i}")
        branch = (cum >= k) & (n > 0)
        expr = F.when(branch, F.lit(d)) if expr is None \
            else expr.when(branch, F.lit(d))
    med = expr.otherwise(F.lit(None).cast("long"))
    shift = F.round((med - F.lit(float(q50_base)))
                    / F.lit(max(float(iqr_base), 1.0)), 6)
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col("n_all").alias("n_rows"),
        "n_out",
        med.alias("q50"),
        shift.alias("shift"),
        F.when(med.isNull(), "YELLOW")
        .when(F.abs(shift) >= red, "RED")
        .when(F.abs(shift) >= yellow, "YELLOW")
        .otherwise("GREEN").alias("verdict"))


def streaming_session_verdicts(
    stream: DataFrame,
    rules: dict[str, Column],
    event_time_col: str,
    key_col: str,
    gap: str = "12 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Gap-based sessionization of an append-only stream with a
    per-session verdict rollup — the streaming twin of the batch
    ``event_sessions`` query, expressed with Spark's native
    ``session_window`` (merging-interval state) instead of the batch
    lag → flag → running-sum chain.

    Semantics: events of one ``key_col`` belong to the same session iff
    consecutive gaps are at most ``gap`` — session_window merges an
    event landing exactly on the previous session's end (inclusive
    boundary, pinned by the e2e test). A session closes — and its single
    finalized row is emitted in append mode — once the watermark passes
    its end, so state is O(open sessions), bounded by the watermark
    horizon, independent of stream volume.

    Emits per (key, session): session_start, session_end, n_rows,
    n_green / n_yellow / n_red, worst-verdict ``verdict``.
    """
    with_verdicts = streaming_row_verdicts(
        stream.withWatermark(event_time_col, watermark), rules)
    rank = verdict_rank(F.col("row_verdict"))
    return (
        with_verdicts
        .groupBy(F.session_window(F.col(event_time_col), gap), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((rank == 0).cast("long")).alias("n_green"),
            F.sum((rank == 1).cast("long")).alias("n_yellow"),
            F.sum((rank == 2).cast("long")).alias("n_red"),
            F.max(rank).alias("__worst"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_rows", "n_green", "n_yellow", "n_red",
            F.when(F.col("__worst") == 2, "RED")
            .when(F.col("__worst") == 1, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
        )
    )


def streaming_content_verdicts(
    stream: DataFrame,
    event_time_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    group_col: str = "codec",
    threshold_db: float | None = None,
    bandwidth_fp_yellow: int = 384,
    min_eff_bits_yellow: int = 9,
) -> DataFrame:
    """CONTENT-level validation of a streaming clips ingest: the fused
    batch decode kernel (operators/snr.py:pcm_scan — SNR vs the
    reference signal + container-header integrity in ONE Arrow pass)
    runs unchanged on a streaming DataFrame, then verdicts roll up per
    event-time window. This extends the header-only streaming rules
    (wav_header_verdicts, pure Column) to the decoded-PCM invariant:
    clips are SNR-validated as they land, not at the next batch run.

    Event-time plumbing: pcm_scan passes extra columns through as
    strings, so the timestamp crosses the Arrow stage as unix
    MICROSECONDS rendered to digits and is rebuilt with
    ``timestamp_micros`` — a lossless integer round-trip that cannot
    shift under a non-UTC session timezone (a formatted-string round
    trip can). The watermark is applied to the rebuilt column, after
    the map stage.

    Emits per (window, group): n_rows, n_green / n_red (reference-SNR
    verdict), n_hdr_bad (container broken/truncated), n_bw_yellow
    (effective-bandwidth occupancy below ``bandwidth_fp_yellow`` —
    upsample suspects off the same scan's energy+hfc scalars, the
    streaming twin of the batch suite's bandwidth family),
    n_bits_yellow (effective bit depth below ``min_eff_bits_yellow`` —
    requantized-content suspects off the OR-fold scalar, the streaming
    twin of the batch bit_depth family), cube_sum with n_neg/pos_skew
    (the polarity third-moment profile), min/mean
    snr_db over decodable clips, and the worst-of RED/YELLOW/GREEN
    window verdict. State is the standard streaming agg keyed on
    (window, group) — O(windows x groups), independent of stream
    volume; the map stage holds no state at all, so the payload column
    never enters the state store.
    """
    from ..operators.snr import SNR_THRESHOLD_DB, pcm_scan
    thr = SNR_THRESHOLD_DB if threshold_db is None else threshold_db
    pre = stream.withColumn(
        "__evus", F.unix_micros(F.col(event_time_col)).cast("string"))
    scanned = pcm_scan(pre, thr, extra_cols=[group_col, "__evus"],
                       emit_header=True, emit_energy=True, emit_hfc=True,
                       emit_bits=True, emit_cube=True)
    with_ts = scanned.withColumn(
        event_time_col,
        F.timestamp_micros(F.col("__evus").cast("long")))
    red = F.col("verdict") == "RED"
    hdr_bad = ~F.coalesce(F.col("riff_ok"), F.lit(False))
    nhfc_fp = F.expr(
        "CASE WHEN pcm_sq_sum > 0 THEN hfc * 10000 DIV pcm_sq_sum END")
    bw_bad = F.coalesce(nhfc_fp < bandwidth_fp_yellow, F.lit(False))
    eff_bits = F.when(F.col("or_abs") == 0, F.lit(0)).otherwise(
        F.lit(16) - F.bit_count(
            F.col("or_abs").bitwiseAND(-F.col("or_abs")) - F.lit(1)))
    bits_bad = F.coalesce(eff_bits < min_eff_bits_yellow, F.lit(False))
    return (
        with_ts.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window_duration),
                 group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~red).cast("long")).alias("n_green"),
            F.sum(red.cast("long")).alias("n_red"),
            F.sum(hdr_bad.cast("long")).alias("n_hdr_bad"),
            F.sum(bw_bad.cast("long")).alias("n_bw_yellow"),
            F.sum(bits_bad.cast("long")).alias("n_bits_yellow"),
            F.sum("pcm_cube_sum").alias("cube_sum"),
            F.sum((F.col("pcm_cube_sum") < 0).cast("long"))
            .alias("n_neg_skew"),
            F.sum((F.col("pcm_cube_sum") > 0).cast("long"))
            .alias("n_pos_skew"),
            F.min("snr_db").alias("min_snr_db"),
            F.avg("snr_db").alias("mean_snr_db"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(group_col),
            "n_rows", "n_green", "n_red", "n_hdr_bad", "n_bw_yellow",
            "n_bits_yellow", "cube_sum", "n_neg_skew", "n_pos_skew",
            "min_snr_db", "mean_snr_db",
            F.when((F.col("n_red") > 0) | (F.col("n_hdr_bad") > 0), "RED")
            .when((F.col("n_bw_yellow") > 0)
                  | (F.col("n_bits_yellow") > 0), "YELLOW")
            .otherwise("GREEN").alias("verdict"),
        )
    )


def default_stream_rules(cfg: RuleConfig, number_col: str,
                         bool_col: str) -> dict[str, Column]:
    """Convenience rule set for the test/demo stream shape."""
    from ..functions.coercion import coerce_bool, coerce_number
    return {
        number_col: coerce_number(F.col(number_col), cfg).verdict,
        bool_col: coerce_bool(F.col(bool_col), cfg).verdict,
    }


def streaming_route(stream: DataFrame,
                    rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Quarantine at INGEST: split a stream into (kept, dead_letter) by
    per-row verdict — RED rows divert to the dead-letter sink in the
    very micro-batch that carries them, payload intact, while GREEN and
    tolerated-YELLOW rows continue to the main table. The streaming
    twin of the batch quarantine sink (plans/suite.py:quarantine),
    pushed to the earliest possible point: a bad clip never lands in
    the corpus at all, so no later scan pays for it.

    Both halves are stateless filters over the SAME row-verdict
    projection (streaming_row_verdicts) — no watermark, no state store,
    no shuffle; each sink attaches its own writeStream/checkpoint and
    Spark plans the map per sink. Every rule's per-column verdict rides
    along in the dead-letter rows, so triage knows WHY without
    re-deriving anything.
    """
    v = streaming_row_verdicts(stream, rules)
    return (v.filter(F.col("row_verdict") != "RED"),
            v.filter(F.col("row_verdict") == "RED"))


def streaming_type_profile(
    stream: DataFrame,
    key_col: str,
    val_col: str,
    event_time_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Embedded-JSON value-TYPE monitoring at INGEST: per event-time
    window and key, the count of each observed JSON value type — the
    streaming twin of the batch key_type_drift check (operators/
    profiling.py:json_value_type). The batch check compares corpus
    halves after the fact; this surfaces a producer's type change in
    the micro-batch where it starts (ints arriving as strings land as
    a new (window, key, 'string') row immediately), so the silent
    coercion-tolerance burn is visible the moment it begins.

    The VARIANT classifier is a stateless JVM Column, so it runs
    unchanged on the stream; state is the standard windowed agg keyed
    on (window, key, type) — O(windows × keys × 7), independent of
    stream volume.
    """
    typed = stream.select(
        F.col(event_time_col),
        F.col(key_col).alias("key"),
        json_value_type_col(F.col(val_col)).alias("jtype"))
    return (
        typed.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window_duration),
                 "key", "jtype")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "key", "jtype", "n"))


def json_value_type_col(val_col: Column) -> Column:
    """Re-export of operators/profiling.py:json_value_type (lazy import
    keeps the streaming module's import surface minimal)."""
    from ..operators.profiling import json_value_type
    return json_value_type(val_col)
