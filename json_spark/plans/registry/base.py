"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL.

Every operator from SURVEY.md §2 that is SQL-expressible gets a pair here:
``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE_SQL[name]`` — the
same computation in ANSI SQL that DuckDB runs over the identical parquet
tables. The oracle is an *independent second implementation* of the rule
semantics, so a match is a real correctness statement, not a tautology.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing). Floating outputs are rounded on both
sides so IEEE summation-order differences can't flip the hash.

Dirty inputs are constructed deterministically from the driver's tables
(e.g. ``pmod(event_id, 6)`` selects a corruption pattern) — both engines
derive byte-identical raw strings, then each applies its own implementation
of the tolerance semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...config import default_config
from ...functions.coercion import (
    coerce_bool,
    coerce_number,
    coerce_timestamp,
)
from ...functions.keys import chameleon_key
from ...operators.drift import (
    categorical_histogram,
    histogram,
    ks_statistic,
    psi,
)
from ...operators.referential import orphans, referential_summary
from ...operators.stats import column_stats
from ...operators.uniqueness import exact_duplicates, uniqueness_summary
from ...operators.verdicts import rollup_verdicts, row_verdict
from ...sources.tables import ensure_parallelism, load_table

CFG = default_config()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

#: Names the driver's correctness gate must see FIRST. The gate samples
#: the first 50 entries of ``queries()``, so the front of the line goes
#: to (a) queries whose implementation changed since their last driver
#: check and (b) queries that have never had a driver row — everything
#: already green in CORRECTNESS_r02 cycles behind them. Rotate per
#: round so every oracle-backed query lands in the window at least once
#: every two rounds.
#:
#: ROUND-5 ROTATION: unless their code changes again, swap this round's
#: window out for the ~45 still-never-driver-checked queries named in
#: the queue comment inside the list below, plus whatever r5 adds or
#: changes. After r4's window lands, cumulative driver coverage should
#: be ~140/183; the r5 window closes the rest.
GATE_FRONT: list[str] = [
    # ---- r4 window ----------------------------------------------------
    # Brand-new or changed THIS round — each needs a (first or fresh)
    # driver row:
    # the r3 gate's only red, rebuilt with mod-prime digests and
    # per-zone-branch rows (verdict directive 1)
    "coercion_date_zoned",
    # its oracle swapped to_timestamp(..)::TIMESTAMP for make_timestamp
    # (session-TimeZone-proof under a non-UTC driver env)
    "coercion_date",
    # new operators: compressed lossy codec, SmartScalar, Stringified-
    # Containers (verdict directives 4 and 7)
    "audio_adpcm_snr", "adpcm_header_integrity", "audio_alaw_snr",
    "coercion_smart_scalar", "coercion_stringified",
    # changed code paths: planted-edit clamp; single-pass CMS build;
    # star-contraction clustering; stringified-aware array/object
    # coercion; config schema gained Array.StringifiedContainers;
    # executor-side ledger append feeds ledger_trend's metrics rows
    "transcript_wer", "token_heavy_hitters_cms", "dedup_clusters",
    "dedup_canonical", "coercion_array", "coercion_object",
    "config_schema", "ledger_trend", "suite_partition_verdicts",
    "embedding_spectrum",
    # ---- never-driver-checked queue (r3 verdict directive 2) ----------
    # oracle-backed, replica-green at sf0.01, rotated in by family;
    # the remainder queues for r5: drift_wasserstein,
    # audio_dynamic_range, audio_silence_trim, audio_zcr_check,
    # audio_bandwidth_check, text_tfidf, dedup_canonical(done above),
    # dedup_substring, dedup_audio_span, audio_content_dedup,
    # dup_content_conflicts, hash_uniformity, truncation_report,
    # key_emergence, join_fanout_profile, uniqueness_incremental,
    # stats_quantiles_kll (rows-only), drift_changepoint,
    # dedup_incremental, class_balance, embedding_drift,
    # embedding_quantization, corr_profile, zipf_conformity,
    # key_comissingness, snapshot_diff, approx_fd, weighted_sample,
    # source_cap, dup_transcript_distance, corpus_mix, file_skew_audit,
    # text_encoding_check, packing_efficiency, vocab_coverage,
    # text_lexical_diversity, incremental_quantile_merge,
    # manifest_dangling, event_autocorr, key_type_drift,
    # size_model_conformance, audio_polarity, data_freshness,
    # agg_reconciliation, orphan_value_mass, duration_balance,
    # split_divergence, unit_mixture, vocab_growth, text_script_mix,
    # embedding_label_coherence, text_unicode_norm, ann_recall_report
    "transcript_wer_manifest", "audio_aiff_snr", "aiff_header_integrity",
    "audio_ulaw_snr", "kmv_set_overlap", "zorder_layout",
    "distinct_hll_explicit", "audio_spectral_flatness",
    "sentinel_scan", "schema_contract", "quarantine_rows",
    "multimodal_meta", "temperature_sample", "seasonal_volume_anomaly",
    "benford_check", "domain_constraints", "partition_anomaly",
    "coverage_gaps", "sequence_inversions", "audio_goertzel_check",
    "categorical_association", "skew_profile", "transcript_conflicts",
    "label_agreement", "key_set_overlap", "drift_changepoint",
    "dedup_incremental", "class_balance", "embedding_drift",
    "embedding_quantization", "corr_profile", "zipf_conformity",
    "approx_fd",
]


def gate_order(d: dict) -> dict:
    """Reorder a registry dict so GATE_FRONT names come first (in that
    order), then the rest in registration order."""
    front = {n: d[n] for n in GATE_FRONT if n in d}
    back = {n: v for n, v in d.items() if n not in front}
    return {**front, **back}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


