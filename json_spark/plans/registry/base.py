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
#: already green in earlier CORRECTNESS cycles behind them.
#:
#: ROUND-5 ROTATION (r4 verdict directive 1): this window CLOSES the
#: never-driver-checked backlog — after it lands, every oracle-backed
#: query in the registry has a green CORRECTNESS row in some round with
#: code unchanged since (or in r5 itself), and the only rows-only
#: queries without any row are covered here too. Queries that changed
#: this round but could not fit the 50-slot window (coercion_array,
#: coercion_object, dedup_canonical, the five transcode-validation-
#: touched container queries audio_flac_roundtrip / audio_au_snr /
#: audio_aiff_snr / audio_ulaw_snr / audio_alaw_snr / audio_adpcm_snr)
#: are re-verified by the full-registry local gate at the final tree
#: (BENCH/ORACLE_r05_local.md) plus targeted pytest — their r4 driver
#: rows + the local replica cover the residual risk.
GATE_FRONT: list[str] = [
    # ---- changed or new THIS round (needs a fresh driver row) ---------
    # strict-string probe tightened to a one-element parse (r4 ADVICE);
    # both consumers of _json_string_value re-enter the window
    "coercion_smart_scalar", "coercion_stringified",
    # star-contraction CC now labels reflexive-pair singletons
    "dedup_clusters",
    # planted-edit surgery factored into alignment.plant_word_edits
    "transcript_wer",
    # NEW: Microsoft ADPCM — second compressed codec, seventh container
    "audio_msadpcm_snr", "msadpcm_header_integrity",
    # ---- never-driver-checked queue: CLOSED by this window ------------
    # oracle-backed, replica-green at sf0.01 since r3/r4:
    "drift_wasserstein", "audio_dynamic_range", "audio_silence_trim",
    "audio_zcr_check", "audio_bandwidth_check", "audio_polarity",
    "audio_content_dedup", "dedup_substring", "dedup_audio_span",
    "dup_content_conflicts", "dup_transcript_distance",
    "hash_uniformity", "truncation_report", "key_emergence",
    "key_type_drift", "key_comissingness", "join_fanout_profile",
    "manifest_dangling", "size_model_conformance", "unit_mixture",
    "vocab_growth", "split_divergence", "duration_balance",
    "orphan_value_mass", "text_tfidf", "text_script_mix",
    "text_unicode_norm", "text_encoding_check",
    "text_lexical_diversity", "packing_efficiency", "vocab_coverage",
    "weighted_sample", "source_cap", "corpus_mix",
    "embedding_label_coherence", "snapshot_diff", "agg_reconciliation",
    "incremental_quantile_merge", "event_autocorr", "data_freshness",
    "file_skew_audit",
    # rows-only queries that never had ANY driver row (the driver
    # records the weaker rows-only check for these; invariants are
    # pinned in pytest):
    "ann_recall_report", "stats_quantiles_kll", "uniqueness_incremental",
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


