"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus rows_per_sec context}.

Contention protocol (shared with tools/bench_scaling.py via
json_spark/contention.py — the host CPU is oversubscribed in bursts, so
raw single-shot timings mix engine cost with co-tenant noise):
- one spare physical core is reserved for the heartbeat probe (Spark
  gets cores-1 task slots) so a stretched heartbeat means EXTERNAL load;
- per query: a pre-attempt launch gate (/proc/stat quiet), then up to
  ``ATTEMPTS`` timed attempts each classified clean/tainted by the
  heartbeat median vs the quiet-host baseline;
- the reported figure is the min over CLEAN attempts; a query with no
  clean attempt reports its min and is listed in ``tainted`` so a slow
  artifact number is distinguishable from a slow engine.

Scaling evidence for the north rule (efficiency >= 0.8 from N to 4N
executors) is produced by tools/bench_scaling.py which runs the
end-to-end validation suite at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_spark.contention import (  # noqa: E402
    HB_TAINT_RATIO,
    Heartbeat,
    hb_calibrate,
    wait_quiet,
)
from json_spark.session import get_spark  # noqa: E402
from json_spark.plans.registry import QUERIES  # noqa: E402

#: headline set: one per operator family (stats, uniqueness, referential,
#: coercion, drift, rollup, text, dedup, similarity) — each an action that
#: scans its fact table
HEADLINE = [
    "stats_lineitem",
    "stats_cube",
    "stats_quantiles",
    "stats_quantiles_kll",
    "uniqueness_summary",
    "incremental_stats_merge",
    "incremental_quantile_merge",
    "fd_profile",
    "column_profile",
    "duplicate_keys",
    "referential_orphans",
    "manifest_dangling",
    "join_fanout_profile",
    "fuzzy_referential",
    "coercion_number",
    "coercion_date",
    "coercion_date_zoned",
    "drift_psi",
    "drift_ks",
    "drift_rolling",
    "drift_wasserstein",
    "drift_quantile_shift",
    "drift_changepoint",
    "class_balance",
    "dedup_incremental",
    "verdict_rollup",
    "text_quality",
    "text_fingerprint",
    "text_repetition",
    "text_surprisal",
    "text_tfidf",
    "text_lexical_diversity",
    "truncation_report",
    "hash_uniformity",
    "pii_scan",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "contamination_check",
    "contamination_ngram_exact",
    "dedup_substring",
    "embedded_decode",
    "key_style_stats",
    "event_sessions",
    "events_asof_join",
    "events_range_join",
    "events_rollup",
    "dataset_split",
    "doc_pack_batches",
    "stratified_sample",
    "temperature_sample",
    "token_heavy_hitters",
    "outlier_mad",
    "curation_pipeline",
    "embedding_dim_stats",
    "embedding_norms",
    "embedding_isotropy",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    # audio path (2000-clip deterministic fixture, decode included)
    "snr_partition_verdicts",
    "audio_header_integrity",
    "metadata_consistency",
    "metadata_repair",
    "pcm_content_exact",
    "audio_clipping_silence",
    "audio_amplitude_hist",
    "audio_dynamic_range",
    "audio_silence_trim",
    "audio_zcr_check",
    "audio_bandwidth_check",
    "audio_goertzel_check",
    "audio_chunks",
    "audio_resample",
    "audio_content_dedup",
    "dedup_audio_span",
    # third container: WAV→AU transcode + header rules + fused-kernel SNR
    "au_header_integrity",
    "audio_au_snr",
    # fused suite: header+snr+content+silence off ONE scan of bytes
    "suite_content_verdicts",
    "audio_perceptual_dedup",
    "audio_gain_normalize",
    "transcript_rate_check",
    "domain_constraints",
    "partition_anomaly",
    "key_emergence",
    "benford_check",
    "coverage_gaps",
    "sequence_inversions",
    # association / consistency families + late-r3 curation
    "corr_profile",
    "categorical_association",
    "zipf_conformity",
    "skew_profile",
    "snapshot_diff",
    "approx_fd",
    "transcript_conflicts",
    "label_agreement",
    "key_set_overlap",
    "weighted_sample",
    "source_cap",
    "dedup_canonical",
    "embedding_drift",
    "embedding_quantization",
    "dup_content_conflicts",
    "dup_transcript_distance",
    "corpus_mix",
    "file_skew_audit",
    "compaction_plan",
    "constraint_suggestion",
    "drift_incremental",
    "text_encoding_check",
    "packing_efficiency",
    "vocab_coverage",
    # sentinel / periodicity / type-drift / bit-depth family
    "sentinel_scan",
    "event_autocorr",
    "key_type_drift",
    "audio_bit_depth",
    "size_model_conformance",
    "schema_contract",
    "audio_polarity",
    "quarantine_rows",
    "data_freshness",
    "agg_reconciliation",
    "orphan_value_mass",
    "duration_balance",
    "split_divergence",
    "unit_mixture",
    "vocab_growth",
    "seasonal_volume_anomaly",
    # alignment / spectrum-shape / script-mix / 4th-container family
    "transcript_wer",
    "audio_spectral_flatness",
    "text_script_mix",
    "aiff_header_integrity",
    "audio_aiff_snr",
    "audio_ulaw_snr",
    "embedding_label_coherence",
    "embedding_spectrum",
    "text_unicode_norm",
    "token_heavy_hitters_cms",
    "distinct_hll_explicit",
    "zorder_layout",
    "kmv_set_overlap",
    "transcript_wer_manifest",
    # r5 additions: the second compressed codec (MS-ADPCM)
    "audio_msadpcm_snr",
    "msadpcm_header_integrity",
    # r4 additions: compressed lossy codec + the last declared-only
    # reference coercions
    "audio_adpcm_snr",
    "adpcm_header_integrity",
    "audio_alaw_snr",
    "coercion_smart_scalar",
    "coercion_stringified",
]

#: timed attempts per query; the first clean pair usually suffices, the
#: third buys a clean sample when a co-tenant burst spans the first two
ATTEMPTS = 3
#: per-query launch-gate budget — bounded so a long burst degrades to a
#: tainted (flagged) measurement instead of stalling the whole suite
GATE_MAX_WAIT_S = 45.0


def run(sf_dir: str, cores: int, spark=None) -> dict:
    own_session = spark is None
    # reserve one physical core for the heartbeat probe: with task slots
    # below the core count, a stretched heartbeat can only mean external
    # (co-tenant) contention, never the engine's own load
    spark_cores = max(cores - 1, 1) if cores >= 8 else cores
    hb_baseline = hb_calibrate(chunks=40)
    if own_session:
        spark = get_spark("json_spark-bench", cores=spark_cores,
                          shuffle_partitions=max(spark_cores, 8))
    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    tainted: list[str] = []
    total_rows = 0
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        fn = QUERIES[name]
        busy = round(wait_quiet(busy_thresh=0.15, max_wait_s=GATE_MAX_WAIT_S,
                                sample_s=0.5, poll_s=5.0), 3)
        attempts: list[float] = []
        clean: list[bool] = []
        for i in range(ATTEMPTS):
            hb = Heartbeat()
            hb.start()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            attempts.append(round(time.perf_counter() - t0, 3))
            hb_med = hb.finish()
            ratio = (hb_med / hb_baseline) if (hb_med and hb_baseline) else None
            clean.append(ratio is None or ratio <= HB_TAINT_RATIO)
            # two clean attempts bound the engine cost; skip the third
            if i >= 1 and sum(clean) >= 2:
                break
        clean_times = [t for t, c in zip(attempts, clean) if c]
        # Co-tenant contention can only INFLATE a wall-clock timing, so
        # every attempt — tainted or not — is an upper bound on the
        # engine's true cost, and the global min is the tightest one.
        # (Min-over-clean-only let a cold-JVM-but-quiet first attempt
        # outrank a warm attempt that overlapped a burst: e.g. a 28s
        # cold decode beating a 2.2s warm one.) The taint flags remain
        # as the reproducibility signal: a query whose best attempt was
        # tainted is listed so the artifact shows which figures were
        # achieved under contention.
        timings[name] = min(attempts)
        if not clean_times or min(clean_times) > min(attempts):
            tainted.append(name)
        detail[name] = {"attempts": attempts, "clean": clean,
                        "busy_at_gate": busy}
        total_rows += n
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "timing": f"min_of_{ATTEMPTS}_attempts_per_query"
                  "_gated_heartbeat_taint_flagged",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
        "spark_task_slots": spark_cores,
        "tainted": tainted,
        "queries_detail": detail,
    }
    if own_session:
        spark.stop()
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run(sf_dir, cores)))
