"""Custom stateful streaming operators via ``applyInPandasWithState``.

The windowed rollups in streaming/validate.py are built-in streaming
aggregations; this module covers the operator Spark does NOT ship:
**streaming first-seen dedup** — emit each content key's first
occurrence across micro-batches, suppress every later duplicate. The
batch twin is operators/uniqueness.exact_duplicates; here arrival order
matters and the "seen" set must persist across triggers, which is
exactly the GroupState surface.

Scale shape: state is keyed by the content hash (one boolean-ish state
row per distinct key, grouped state store partitioned like any
streaming agg); each micro-batch group receives only that key's new
rows, so per-invoke pandas frames are tiny. A state TTL
(``ProcessingTimeTimeout``) bounds the store for unbounded key spaces —
expired keys may re-emit, the standard windowed-dedup trade.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _first_seen(key, pdf_iter: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit rows of this key only if the key has never been seen.

    State = (n_seen,) — once set, every later batch's rows for the key
    are suppressed (and counted into the state for observability).
    On TTL expiry the state is REMOVED (not re-armed) so the store stays
    bounded for unbounded key spaces; an expired key that recurs
    re-emits — the documented windowed-dedup trade.
    """
    if state.hasTimedOut:
        # timeout invoke: empty iterator, evict and emit nothing
        state.remove()
        return
    n_before = state.get[0] if state.exists else 0
    emitted = []
    n_new = 0
    for pdf in pdf_iter:
        n_new += len(pdf)
        if n_before == 0 and not emitted and len(pdf) > 0:
            # first-ever row of this key: emit exactly one
            emitted.append(pdf.iloc[:1])
    state.update((n_before + n_new,))
    if state.getCurrentProcessingTimeMs() >= 0:  # timeout clock available
        state.setTimeoutDuration(24 * 3600 * 1000)
    if emitted:
        yield pd.concat(emitted)


def streaming_first_seen(stream: DataFrame, key_col: str,
                         payload_cols: list[str]) -> DataFrame:
    """First occurrence per key across the whole stream (stateful dedup).

    Returns a streaming DataFrame with one row per distinct ``key_col``
    value — its first-arriving payload. Later duplicates (same trigger or
    any later one) are suppressed by the persisted GroupState.
    """
    cols = [key_col, *payload_cols]
    out_schema = ", ".join(f"{c} string" for c in cols)
    projected = stream.select(
        *[F.col(c).cast("string").alias(c) for c in cols])
    return (
        projected.groupBy(key_col)
        .applyInPandasWithState(
            _first_seen,
            outputStructType=out_schema,
            stateStructType="n_seen long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_dedup_within_watermark(stream: DataFrame, key_cols: list[str],
                                     event_time_col: str,
                                     watermark: str = "1 day") -> DataFrame:
    """Built-in event-time streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps the first row per key among
    rows whose event times fall within the watermark horizon of each
    other, and EVICTS key state once the watermark passes — the
    production default when "duplicate" means a replay/retry arriving
    within a bounded delay, not an all-time re-occurrence.

    Contrast with :func:`streaming_first_seen` (custom GroupState):
    that one suppresses duplicates across the WHOLE stream lifetime
    (until the processing-time TTL), which is the semantics for
    content-hash dedup of an append-only corpus; this one bounds state
    by EVENT time, which is the semantics for ingest-retry collapsing.
    Both emit first-arrival rows; they differ in what happens after the
    horizon. State size: O(keys inside the watermark window).
    """
    return (stream.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def _content_divergence(key, pdf_iter: Iterable[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    """Alert when a re-seen key's content/label differs from first-seen.

    State = (first_content, first_label, n_seen). The FIRST-ever row of
    a key sets the reference; every later row (same trigger or any
    later one) compares against it and emits an alert row only on
    divergence — identical re-uploads stay silent (they are dedup's
    business, not an integrity defect). Content wins the precedence
    chain, mirroring the batch twin
    (operators/consistency.py:dup_content_integrity).
    On TTL expiry the state is REMOVED so the store stays bounded; a
    key recurring after expiry re-references — the windowed trade every
    TTL'd dedup state makes.
    """
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        fc, fl, n = state.get
    else:
        fc, fl, n = None, None, 0
    alerts = []
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        if n == 0:
            fc = str(pdf["__content"].iloc[0])
            fl = str(pdf["__label"].iloc[0])
            later = pdf.iloc[1:]
            base = n + 1
        else:
            later = pdf
            base = n
        if len(later):
            cont_div = later["__content"].astype(str) != fc
            lab_div = (~cont_div) & (later["__label"].astype(str) != fl)
            occ = pd.Series(range(base + 1, base + 1 + len(later)),
                            index=later.index)
            div = later[cont_div | lab_div]
            if len(div):
                alerts.append(pd.DataFrame({
                    "key": key[0],
                    "verdict": cont_div[div.index].map(
                        {True: "CONTENT_DIVERGENT",
                         False: "LABEL_DIVERGENT"}),
                    "first_value": cont_div[div.index].map(
                        {True: fc, False: fl}),
                    "value": div["__content"].astype(str).where(
                        cont_div[div.index], div["__label"].astype(str)),
                    "occurrence": occ[div.index].astype("int64"),
                }))
        n += len(pdf)
    state.update((fc, fl, n))
    state.setTimeoutDuration(24 * 3600 * 1000)
    if alerts:
        yield pd.concat(alerts)


def streaming_content_divergence(stream: DataFrame, key_col: str,
                                 content_col: str,
                                 label_col: str) -> DataFrame:
    """Ingest-time duplicate-content integrity: the streaming twin of
    operators/consistency.py:dup_content_integrity. Batch answers "do
    the copies we ALREADY stored agree?"; this answers it at the door —
    a re-upload whose payload digest (or label) differs from the
    first-seen copy raises an alert row in the same micro-batch it
    arrives, before the divergent copy contaminates the corpus.

    The caller passes digest-sized columns (md5 of the payload bytes,
    a transcript hash) — the state row per key holds two digests and a
    count, so the store is O(distinct keys) × ~100 bytes, TTL-bounded.
    Nulls become a sentinel so a copy that LOST its payload still
    diverges (losing a value is a defect, not a wildcard).
    """
    projected = stream.select(
        F.col(key_col).cast("string").alias("__k"),
        F.coalesce(F.col(content_col).cast("string"), F.lit("<null>"))
        .alias("__content"),
        F.coalesce(F.col(label_col).cast("string"), F.lit("<null>"))
        .alias("__label"))
    return (
        projected.groupBy("__k")
        .applyInPandasWithState(
            _content_divergence,
            outputStructType=("key string, verdict string, "
                              "first_value string, value string, "
                              "occurrence long"),
            stateStructType=("first_content string, first_label string, "
                             "n_seen long"),
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def _make_cusum(target: float, k: float, h: float):
    """Closure-parameterized CUSUM kernel (target mean, slack k,
    decision threshold h) for :func:`streaming_cusum`."""

    def _cusum(key, pdf_iter: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sp, sn, n, na = state.get
        else:
            sp, sn, n, na = 0.0, 0.0, 0, 0
        alerts = []
        # A large group's micro-batch can span multiple pandas chunks;
        # sorting each chunk independently would interleave rows out of
        # __seq order. Concatenate the whole micro-batch for this group
        # and sort ONCE so replay is deterministic regardless of chunking.
        chunks = [p for p in pdf_iter if len(p) > 0]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   .sort_values("__seq"))
            for x, seq in zip(pdf["__v"].astype(float),
                              pdf["__seq"].astype("int64")):
                n += 1
                sp = max(0.0, sp + (x - target - k))
                sn = max(0.0, sn + (target - x - k))
                if sp > h:
                    na += 1
                    alerts.append((key[0], "UP", int(seq), n, sp))
                    sp = 0.0
                elif sn > h:
                    na += 1
                    alerts.append((key[0], "DOWN", int(seq), n, sn))
                    sn = 0.0
        state.update((sp, sn, n, na))
        state.setTimeoutDuration(24 * 3600 * 1000)
        if alerts:
            yield pd.DataFrame(
                alerts, columns=["key", "direction", "at_seq",
                                 "at_n", "statistic"])

    return _cusum


def streaming_cusum(stream: DataFrame, key_col: str, value_col: str,
                    seq_col: str, target: float, k: float,
                    h: float) -> DataFrame:
    """Streaming CUSUM mean-shift detection per key — the ONLINE sibling
    of the batch changepoint scan (operators/changepoint.py /
    `drift_changepoint`): the batch twin finds WHERE a completed series
    shifted; this one raises the alarm WHILE the series is still
    arriving, with O(1) state per key.

    Classic two-sided tabular CUSUM: S+ accumulates excess above
    ``target + k``, S- accumulates deficit below ``target - k``; an
    alert row (key, direction, at_seq, at_n, statistic) is emitted when
    either side crosses ``h``, and that side restarts — the standard
    renewal scheme, so repeated shifts keep alerting. ``k`` is the
    slack (usually half the shift magnitude worth catching); larger
    ``h`` trades detection delay for false-alarm rate.

    Rows are ordered by ``seq_col`` WITHIN each micro-batch (pandas
    sort, cheap per-group) and across batches by arrival, so replaying
    the same triggers reproduces the exact alert sequence — the pytest
    twin replays the concatenated series through a pure-python CUSUM
    and matches alert-for-alert.

    Scale shape: state is 4 scalars per key (vs the windowed-histogram
    state of streaming_window_drift); per-invoke pandas frames hold
    only the key's new rows. TTL evicts idle keys; a key recurring
    after eviction restarts its CUSUM from zero — the documented trade.
    """
    projected = stream.select(
        F.col(key_col).cast("string").alias("__k"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(seq_col).cast("long").alias("__seq"))
    return (
        projected.groupBy("__k")
        .applyInPandasWithState(
            _make_cusum(target, k, h),
            outputStructType=("key string, direction string, "
                              "at_seq long, at_n long, statistic double"),
            stateStructType="sp double, sn double, n long, n_alerts long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
