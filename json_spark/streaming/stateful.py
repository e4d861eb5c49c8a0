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
