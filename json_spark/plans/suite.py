"""ValidationSuite — the engine's flagship entry point.

The Spark reinterpretation of the reference's decode pipeline
(internal/dirtyjson/decoder.go:91-158 ``decodeDirty``): where the reference
runs clean-then-dirty decoding per document and returns one merged struct,
the suite evaluates every check as an independent Spark job over the same
clips table and returns per-partition verdicts + violation rows (the
Green/Yellow/Red model of result.go:4-18 lifted to partitions).

Checks (north rule, BASELINE.json:6):
- stats        : null-rate / min / max / mean / stddev / quantile sketch
- uniqueness   : exact duplicate clip_ids (salted two-phase)
- referential  : clips ⟕̸ manifest (broadcast anti-join)
- transcript   : equality vs manifest (per-row invariant)
- drift        : sr_hz + dur_ms histogram PSI & binned KS vs a baseline share table
- snr          : decoded-PCM SNR >= 30 dB (Arrow pandas stage)

Resume: each check's partition verdicts land in the ledger; a re-run
anti-joins the partition worklist against DONE rows and touches only the
remainder (plus global checks that can't be partition-pruned).

Scale shape: ONE scan per check family, verdicts aggregate map-side,
violations are written (not collected); only the |partitions|x|checks|
verdict table ever reaches the driver (for the ledger append).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import __version__
from ..config.rules import RuleConfig
from ..config import default_config
from ..operators.drift import histogram, ks_statistic, psi
from ..operators.referential import orphans, transcript_mismatches
from ..operators.domain import domain_rollup, domain_violations
from ..operators.snr import pcm_scan, snr_check, snr_partition_rollup
from ..operators.stats import column_stats
from ..operators.uniqueness import exact_duplicates
from .ledger import (ledger_append_frame, ledger_read, make_lineage,
                     pending_partitions)

VERDICT_COLS = ["partition_id", "check_name", "verdict", "n_rows",
                "n_green", "n_yellow", "n_red", "metrics_json"]
VIOLATION_COLS = ["clip_id", "partition_id", "check_name", "reason",
                  "offending_value_trunc50"]


@dataclass
class SuiteConfig:
    rules: RuleConfig = field(default_factory=default_config)
    partition_col: str = "codec"
    numeric_cols: tuple[str, ...] = ("sr_hz", "dur_ms")
    key_col: str = "clip_id"
    transcript_col: str = "transcript"
    max_null_rate: float = 0.05
    psi_yellow: float = 0.1
    psi_red: float = 0.25
    ks_yellow: float = 0.1
    ks_red: float = 0.25
    snr_threshold_db: float = 30.0
    #: fuse the sample-exact PCM content + silence-curation checks into
    #: the media pass (same single scan of ``bytes`` — pcm_scan emits
    #: the digest/profile column groups alongside header + SNR)
    content_checks: bool = False
    #: per-clip YELLOW when near-silent samples exceed this share
    max_silence_ratio: float = 0.5
    #: per-clip YELLOW when the effective-bandwidth occupancy fixed
    #: point (Σ(Δv)²·10⁴ DIV Σv²) falls below this — 384 ⇔ f_eff <
    #: Nyquist/16, the upsample-suspect band (content_checks only)
    bandwidth_fp_yellow: int = 384
    #: per-clip YELLOW when effective bit depth (16 − ctz(OR of |v|))
    #: falls below this — content stored as 16-bit but quantized
    #: upstream at 8 bits shows eff = 8 (content_checks only)
    min_eff_bits_yellow: int = 9
    drift_bins: int = 10
    #: columns drifted-checked (north star: sr_hz AND dur_ms) with their
    #: fixed bucket ranges — shared by baseline and current so edges match
    drift_cols: tuple[str, ...] = ("sr_hz", "dur_ms")
    drift_ranges: dict = field(default_factory=lambda: {
        "sr_hz": (0.0, 50000.0), "dur_ms": (0.0, 1000.0)})
    #: declarative CHECK constraints (operators/domain.py) — opt-in;
    #: each rule contributes one check row per partition + violations
    domain_rules: tuple = ()
    #: cross-field metadata-vs-payload checks (container-vs-codec,
    #: dur-vs-header; operators/multimodal.py:metadata_consistency_verdicts)
    #: — opt-in; two check rows per partition + violations
    metadata_checks: bool = False
    #: schema contract (operators/schema.py:ContractField tuple) — the
    #: metadata-only pre-flight: validated BEFORE any scan is planned;
    #: contributes one table-level check row + one violation per
    #: non-GREEN field
    schema_contract: tuple = ()
    #: raise SchemaContractError (instead of scanning) when a REQUIRED
    #: contract column is missing — a broken producer fails in
    #: milliseconds, not after reading 100 TB
    schema_fail_fast: bool = True


@dataclass
class SuiteResult:
    partition_verdicts: DataFrame
    violations: DataFrame
    #: intermediates persisted during run() — caller unpersists when done
    cached: list = field(default_factory=list)

    def unpersist(self) -> None:
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


#: ceiling for literal partition-predicate resume pruning; beyond it the
#: semi-join path keeps ids executor-side (a predicate with 10^5 IN-list
#: literals would bloat the plan; and with that many partitions pending,
#: most of the table needs re-reading anyway, so file pruning buys little)
PRUNE_LITERAL_MAX = 10_000


def quarantine(clips: DataFrame, violations: DataFrame,
               key_col: str = "clip_id") -> DataFrame:
    """Full-row quarantine extraction — the violations frame names WHO
    failed but carries only 50-char truncated evidence
    (helpers.go:12-23's stance); repair, re-ingest, and manual triage
    need the FULL rows, payload included. LEFT SEMI join of the source
    against the distinct violating key set: the keys collapse to a
    (defect-sized) distinct frame that AQE broadcasts, so the payload
    column streams map-side and never shuffles — at 10^12 rows the
    cost is one pruned scan, not a payload exchange. The result is the
    side table a ``--quarantine`` sink materializes next to verdicts
    and violations.
    """
    keys = violations.select(F.col(key_col)).filter(
        F.col(key_col).isNotNull()).distinct()
    return clips.join(keys, key_col, "left_semi")


def prune_to_pending(clips: DataFrame, pending: DataFrame,
                     partition_col: str,
                     max_literal: int = PRUNE_LITERAL_MAX
                     ) -> tuple[DataFrame, int]:
    """Restrict ``clips`` to the partitions named in ``pending``
    (one string column ``partition_id``), returning ``(work, n)`` where
    n is the pending count if it is <= ``max_literal`` (else
    ``max_literal + 1`` as an "at least" marker).

    Resume-at-scale design: when few partitions are pending — the common
    resume case, a 99%-done run — the ids become a LITERAL IN-predicate
    on the partition column, which reaches the file index as a static
    ``PartitionFilters`` entry, so a hive/Iceberg-partitioned table
    SKIPS THE FINISHED PARTITIONS' FILES ENTIRELY instead of reading
    100% of the data to drop most of it row-wise. (A broadcast semi-join
    is row-correct but never prunes the file listing: dynamic partition
    pruning does not fire on this shape — verified empirically — since
    the pending frame is a tiny local relation with no selective scan.)
    The collect is bounded by ``max_literal + 1`` rows by construction.
    Beyond the ceiling it falls back to the broadcast semi-join, where
    ids stay executor-side. For a non-string partition column the
    literal path compares on the string form (matching the ledger's
    partition_id encoding and the semi-join's cast semantics), which
    still prunes when the cast folds (string partition columns — the
    suite default ``codec`` — always do).
    """
    ids = [r.partition_id
           for r in pending.limit(max_literal + 1).collect()]
    if len(ids) <= max_literal:
        if not ids:
            return clips.limit(0), 0
        dtype = dict(clips.dtypes).get(partition_col)
        col = (F.col(partition_col) if dtype == "string"
               else F.col(partition_col).cast("string"))
        return clips.filter(col.isin(ids)), len(ids)
    work = clips.join(
        F.broadcast(pending),
        on=clips[partition_col].cast("string") == pending["partition_id"],
        how="leftsemi",
    )
    return work, max_literal + 1


def _empty_violations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], "clip_id string, partition_id string, check_name string, "
            "reason string, offending_value_trunc50 string")


class ValidationSuite:
    def __init__(self, cfg: SuiteConfig | None = None):
        self.cfg = cfg or SuiteConfig()
        self._cache: list[DataFrame] = []
        self._persist_intermediates = True

    def _p(self, df: DataFrame) -> DataFrame:
        """Persist a small intermediate consumed by BOTH the verdict and the
        violation frame (duplicate keys, orphans, mismatches, per-clip SNR).
        Without this, counting verdicts and violations as two actions would
        recompute each check's heavy scan — for SNR, a second full pass over
        every audio payload. The persisted frames hold only scalar columns
        (never ``bytes``), so memory is O(violations), not O(data)."""
        if self._persist_intermediates:
            df = df.persist()
            self._cache.append(df)
        return df

    # ---------------------------------------------------------------- checks

    def check_stats(self, clips: DataFrame) -> DataFrame:
        c = self.cfg
        stats = column_stats(clips, list(c.numeric_cols), [c.partition_col])
        null_rate_red = F.lit(False)
        metrics = []
        for col in c.numeric_cols:
            nr = (F.col(f"{col}__null_count") / F.col("n_rows"))
            null_rate_red = null_rate_red | (nr > c.max_null_rate)
            metrics.append(F.lit(f'"{col}_null_rate":'))
            metrics.append(F.round(nr, 6).cast("string"))
            metrics.append(F.lit(f',"{col}_mean":'))
            metrics.append(F.round(F.col(f"{col}__mean"), 3).cast("string"))
            metrics.append(F.lit(","))
        metrics_json = F.concat(F.lit("{"), F.concat(*metrics[:-1]), F.lit("}"))
        return stats.select(
            F.col(self.cfg.partition_col).cast("string").alias("partition_id"),
            F.lit("stats").alias("check_name"),
            F.when(null_rate_red, "RED").otherwise("GREEN").alias("verdict"),
            F.col("n_rows"),
            F.when(null_rate_red, 0).otherwise(F.col("n_rows")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.when(null_rate_red, F.col("n_rows")).otherwise(0).alias("n_red"),
            metrics_json.alias("metrics_json"),
        )

    def check_domain(self, clips: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Declarative domain/CHECK constraints (cfg.domain_rules):
        one verdict row per (partition, rule) + violation rows. All
        rules evaluate in one map-combinable aggregation pass
        (operators/domain.py:domain_rollup)."""
        c = self.cfg
        roll = domain_rollup(clips, c.domain_rules, [c.partition_col])
        verdicts = roll.select(
            F.col(c.partition_col).cast("string").alias("partition_id"),
            "check_name", "verdict", "n_rows",
            "n_green", "n_yellow", "n_red",
            F.concat(
                F.lit('{"n_violations":'),
                (F.col("n_yellow") + F.col("n_red")).cast("string"),
                F.lit("}"),
            ).alias("metrics_json"),
        )
        viols = domain_violations(clips, c.domain_rules, c.key_col,
                                  c.partition_col)
        return verdicts, viols

    def check_metadata(self, clips: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Cross-field metadata-vs-payload checks (cfg.metadata_checks):
        does the codec column tell the truth about the container the
        magic bytes parse as, and does dur_ms agree with the header's
        own sample count? One verdict row per (partition, check) plus
        violation rows for every non-GREEN clip.

        Scale shape: the per-row verdicts are pure-Column byte surgery
        evaluated ONCE — the narrow (ids + declared fields + verdicts)
        frame is persisted, so the rollup and the violation filter both
        read it without a second scan of ``bytes``; the only exchange is
        the |partitions| × 2-check counter aggregation."""
        from ..operators.multimodal import metadata_consistency_verdicts

        c = self.cfg
        checks = metadata_consistency_verdicts()
        with_v = self._p(clips.select(
            F.col(c.key_col).alias("clip_id"),
            F.col(c.partition_col).cast("string").alias("partition_id"),
            F.col("codec").cast("string").alias("__codec"),
            F.col("dur_ms").cast("string").alias("__dur"),
            *[v.alias(f"__v{i}") for i, v in enumerate(checks.values())],
        ))
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for i in range(len(checks)):
            v = F.col(f"__v{i}")
            aggs += [F.sum((v == "GREEN").cast("long")).alias(f"__g{i}"),
                     F.sum((v == "YELLOW").cast("long")).alias(f"__y{i}"),
                     F.sum((v == "RED").cast("long")).alias(f"__r{i}")]
        rolled = with_v.groupBy("partition_id").agg(*aggs)
        stack_args = ", ".join(f"'{name}', __g{i}, __y{i}, __r{i}"
                               for i, name in enumerate(checks))
        verdicts = rolled.selectExpr(
            "partition_id", "n_rows",
            f"stack({len(checks)}, {stack_args}) AS "
            "(check_name, n_green, n_yellow, n_red)",
        ).select(
            "partition_id", "check_name",
            F.when(F.col("n_red") > 0, "RED")
            .when(F.col("n_yellow") > 0, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
            "n_rows", "n_green", "n_yellow", "n_red",
            F.concat(
                F.lit('{"n_violations":'),
                (F.col("n_yellow") + F.col("n_red")).cast("string"),
                F.lit("}"),
            ).alias("metrics_json"),
        )
        reasons = {
            "payload:container_vs_codec":
                ("declared codec contradicts (or cannot be verified "
                 "against) the container magic", "__codec"),
            "payload:dur_vs_header":
                ("dur_ms disagrees with (or is missing against) the "
                 "header-implied duration", "__dur"),
        }
        viol_frames = []
        for i, name in enumerate(checks):
            reason, val_col = reasons[name]
            viol_frames.append(
                with_v.filter(F.col(f"__v{i}") != "GREEN").select(
                    "clip_id", "partition_id",
                    F.lit(name).alias("check_name"),
                    F.lit(reason).alias("reason"),
                    F.substring(F.coalesce(F.col(val_col), F.lit("<null>")),
                                1, 50).alias("offending_value_trunc50"),
                ))
        viols = viol_frames[0]
        for fdf in viol_frames[1:]:
            viols = viols.unionByName(fdf)
        return verdicts, viols

    def check_uniqueness(self, clips: DataFrame) -> tuple[DataFrame, DataFrame]:
        c = self.cfg
        dups = self._p(exact_duplicates(
            clips.select(c.partition_col, c.key_col)
            .withColumn("__pk", F.concat_ws("\x00", c.partition_col, c.key_col))
            .select("__pk"),
            "__pk",
        )).select(
            F.split("__pk", "\x00").getItem(0).alias("partition_id"),
            F.split("__pk", "\x00").getItem(1).alias(c.key_col),
            F.col("dup_count"),
        )
        per_part = clips.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        dup_rollup = dups.groupBy("partition_id").agg(
            F.sum("dup_count").alias("n_dup_rows"),
            F.count(F.lit(1)).alias("n_dup_keys"),
        )
        verdicts = per_part.join(dup_rollup, "partition_id", "left").fillna(
            {"n_dup_rows": 0, "n_dup_keys": 0}
        ).select(
            "partition_id",
            F.lit("uniqueness").alias("check_name"),
            F.when(F.col("n_dup_keys") > 0, "RED").otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_dup_rows")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_dup_rows").cast("long").alias("n_red"),
            F.concat(F.lit('{"n_dup_keys":'), F.col("n_dup_keys").cast("string"),
                     F.lit("}")).alias("metrics_json"),
        )
        viols = dups.select(
            F.col(c.key_col).alias("clip_id"),
            "partition_id",
            F.lit("uniqueness").alias("check_name"),
            F.lit("duplicate clip_id").alias("reason"),
            F.substring(F.concat(F.lit("count="), F.col("dup_count").cast("string")),
                        1, 50).alias("offending_value_trunc50"),
        )
        return verdicts, viols

    def check_referential(self, clips: DataFrame, manifest: DataFrame
                          ) -> tuple[DataFrame, DataFrame]:
        c = self.cfg
        orphan_rows = self._p(orphans(
            clips.select(c.partition_col, c.key_col), manifest, c.key_col))
        per_part = clips.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        orb = orphan_rows.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        verdicts = per_part.join(orb, "partition_id", "left").fillna(
            {"n_orphans": 0}
        ).select(
            "partition_id",
            F.lit("referential").alias("check_name"),
            F.when(F.col("n_orphans") > 0, "RED").otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_orphans")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_orphans").cast("long").alias("n_red"),
            F.concat(F.lit('{"n_orphans":'), F.col("n_orphans").cast("string"),
                     F.lit("}")).alias("metrics_json"),
        )
        viols = orphan_rows.select(
            F.col(c.key_col).alias("clip_id"),
            F.col(c.partition_col).cast("string").alias("partition_id"),
            F.lit("referential").alias("check_name"),
            F.lit("clip_id missing from manifest").alias("reason"),
            F.substring(F.col(c.key_col), 1, 50).alias("offending_value_trunc50"),
        )
        return verdicts, viols

    def check_transcript(self, clips: DataFrame, manifest: DataFrame
                         ) -> tuple[DataFrame, DataFrame]:
        c = self.cfg
        mism = self._p(transcript_mismatches(
            clips.select(c.key_col, c.partition_col, c.transcript_col),
            manifest, c.key_col, c.transcript_col,
            carry_cols=[c.partition_col],
        ))
        per_part = clips.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        mm = mism.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_mismatch"))
        verdicts = per_part.join(mm, "partition_id", "left").fillna(
            {"n_mismatch": 0}
        ).select(
            "partition_id",
            F.lit("transcript").alias("check_name"),
            F.when(F.col("n_mismatch") > 0, "RED").otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_mismatch")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_mismatch").cast("long").alias("n_red"),
            F.concat(F.lit('{"n_mismatch":'), F.col("n_mismatch").cast("string"),
                     F.lit("}")).alias("metrics_json"),
        )
        viols = mism.select(
            F.col(c.key_col).alias("clip_id"),
            F.col(c.partition_col).cast("string").alias("partition_id"),
            F.lit("transcript").alias("check_name"),
            F.lit("transcript != manifest").alias("reason"),
            F.substring(F.col("actual"), 1, 50).alias("offending_value_trunc50"),
        )
        return verdicts, viols

    def check_drift(self, clips: DataFrame, baseline_shares: DataFrame) -> DataFrame:
        """PSI + binned KS per drift column (north star: sr_hz AND dur_ms)
        against the baseline share table; verdict = worst of the two
        gates, one row per (partition, column)."""
        c = self.cfg
        per_part = clips.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        frames = []
        for col in c.drift_cols:
            lo, hi = c.drift_ranges[col]
            cur = histogram(clips, col, lo, hi, c.drift_bins,
                            [c.partition_col])
            base = baseline_shares.filter(F.col("col") == col).select(
                "bucket", "share")
            scores = psi(cur, base, on=["bucket"],
                         group_cols=[c.partition_col]).join(
                ks_statistic(cur, base, group_cols=[c.partition_col]),
                c.partition_col)
            drifted_red = (F.col("psi") > c.psi_red) | (F.col("ks") > c.ks_red)
            drifted_yellow = ((F.col("psi") > c.psi_yellow)
                              | (F.col("ks") > c.ks_yellow))
            frames.append(per_part.join(
                scores.select(
                    F.col(c.partition_col).cast("string").alias("partition_id"),
                    "psi", "ks"),
                "partition_id", "left",
            ).select(
                "partition_id",
                F.lit(f"drift_{col}").alias("check_name"),
                F.when(drifted_red, "RED")
                .when(drifted_yellow, "YELLOW")
                .otherwise("GREEN").alias("verdict"),
                "n_rows",
                F.when(~drifted_yellow, F.col("n_rows")).otherwise(0).alias("n_green"),
                F.when(drifted_yellow & ~drifted_red,
                       F.col("n_rows")).otherwise(0).alias("n_yellow"),
                F.when(drifted_red, F.col("n_rows")).otherwise(0).alias("n_red"),
                F.concat(F.lit('{"psi":'), F.round("psi", 6).cast("string"),
                         F.lit(',"ks":'), F.round("ks", 6).cast("string"),
                         F.lit("}")).alias("metrics_json"),
            ))
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out

    def check_header(self, clips: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Container-header integrity on the binary column, zero Python:
        RED = broken/truncated container (RIFF magic missing or payload
        shorter than its own data-chunk declaration), YELLOW = container
        sound but the header sample rate contradicts the ``sr_hz`` metadata
        column (recoverable by trusting the header — the d3rty tolerance
        model applied to media), GREEN otherwise. Map-only over the scan;
        ``bytes`` never shuffles (only the scalar verdict columns do)."""
        from ..operators.multimodal import wav_header_columns
        c = self.cfg
        hdr = wav_header_columns(F.col("bytes"))
        container_ok = (hdr["riff_ok"]
                        & (F.length("bytes") == 44 + hdr["data_bytes"]))
        sr_ok = hdr["hdr_sr_hz"] == F.col("sr_hz")
        per_clip = self._p(clips.select(
            F.col(c.key_col).alias("clip_id"),
            F.col(c.partition_col).cast("string").alias("partition_id"),
            F.when(~container_ok, "RED")
            .when(~sr_ok, "YELLOW").otherwise("GREEN").alias("verdict"),
            hdr["hdr_sr_hz"].alias("hdr_sr_hz"),
            F.col("sr_hz"),
        ).filter(F.col("verdict") != "GREEN"))
        per_part = clips.groupBy(
            F.col(c.partition_col).cast("string").alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        return self._header_frames(per_clip, per_part)

    def _header_frames(self, per_clip: DataFrame,
                       per_part: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Header verdict roll-up + violation rows from a per-clip frame
        (clip_id, partition_id, verdict, hdr_sr_hz, sr_hz — non-GREEN rows
        only) and a per-partition row-count frame."""
        bad = per_clip.groupBy("partition_id").agg(
            F.sum((F.col("verdict") == "RED").cast("long")).alias("n_red"),
            F.sum((F.col("verdict") == "YELLOW").cast("long")).alias("n_yellow"),
        )
        verdicts = per_part.join(bad, "partition_id", "left").fillna(
            {"n_red": 0, "n_yellow": 0}
        ).select(
            "partition_id",
            F.lit("header").alias("check_name"),
            F.when(F.col("n_red") > 0, "RED")
            .when(F.col("n_yellow") > 0, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_red") - F.col("n_yellow"))
            .alias("n_green"),
            F.col("n_yellow").cast("long").alias("n_yellow"),
            F.col("n_red").cast("long").alias("n_red"),
            F.concat(F.lit('{"n_bad_container":'),
                     F.col("n_red").cast("string"),
                     F.lit(',"n_sr_mismatch":'),
                     F.col("n_yellow").cast("string"),
                     F.lit("}")).alias("metrics_json"),
        )
        viols = per_clip.select(
            "clip_id",
            "partition_id",
            F.lit("header").alias("check_name"),
            F.when(F.col("verdict") == "RED",
                   "broken or truncated container")
            .otherwise("header sample rate contradicts metadata")
            .alias("reason"),
            F.substring(F.concat(
                F.lit("hdr_sr="),
                F.coalesce(F.col("hdr_sr_hz").cast("string"), F.lit("?")),
                F.lit(" meta_sr="),
                F.coalesce(F.col("sr_hz").cast("string"), F.lit("?"))),
                1, 50).alias("offending_value_trunc50"),
        )
        return verdicts, viols

    def check_media(self, clips: DataFrame) -> tuple[
            DataFrame, DataFrame, DataFrame, DataFrame]:
        """Fused media checks: ONE pass over the ``bytes`` column serves
        both the header check and the SNR decode. A separate header job
        costs a second full scan of the binary column (~5.4s of a ~57s
        suite at local[12] on the 2M-clip fixture; paired A/B in the same
        noise window: fused 8-check suite 57.5s vs unfused 7-check 68.1s)
        — pure waste, since the Arrow stage slices those 44 bytes anyway.
        With ``snr_check(emit_header=True)`` the header fields come out of
        the SAME Arrow stage that decodes the PCM, so the scan projection
        carries no per-row JVM string surgery and no extra passthrough
        columns; the header VERDICT is then pure Column arithmetic on the
        stage's scalar output. The pure-Column parse (check_header)
        remains the zero-Python path when only header integrity is wanted.

        Returns (header_verdicts, header_violations, snr_verdicts,
        snr_violations); with ``cfg.content_checks`` five more verdict
        frames (pcm_content, silence, bandwidth, bit_depth, polarity)
        and three more violation frames ride the SAME decode pass —
        pcm_scan emits the sample-exact digest, amplitude-profile,
        energy+hfc, OR-fold, and third-moment column groups next to
        header + SNR, so seven check families cost one scan of the
        binary column.
        """
        c = self.cfg
        content = c.content_checks
        enriched = clips.select(
            F.col(c.key_col).alias("clip_id"),
            F.col("bytes"),
            F.col("dur_ms"),
            F.col(c.partition_col).cast("string").alias(c.partition_col),
            F.col("sr_hz"),
        )
        raw = pcm_scan(enriched, c.snr_threshold_db,
                       extra_cols=[c.partition_col, "sr_hz"],
                       emit_header=True,
                       emit_digest=content, emit_profile=content,
                       emit_energy=content, emit_hfc=content,
                       emit_bits=content, emit_cube=content)
        container_ok = (F.col("riff_ok")
                        & (F.col("payload_len") == 44 + F.col("data_bytes")))
        sr_ok = F.col("hdr_sr_hz") == F.col("sr_hz").cast("bigint")
        hdr_code = F.when(~container_ok, 2).when(~sr_ok, 1) \
            .otherwise(0).cast("tinyint")
        snr_red = F.col("verdict") == "RED"
        # The persisted layout is the scale decision here: O(rows)
        # cardinality is unavoidable (two downstream actions consume the
        # one decode pass), but the WIDTH must be near-zero — numeric
        # flags plus an info string that is null except on violating
        # rows. Caching wide per-clip strings (clip_id, header fields)
        # for every row cost ~15% at 12 cores while being free at 3:
        # cache-build allocation and GC compete with task CPU exactly
        # when no cores are idle, whereas at low parallelism concurrent
        # GC rides the idle cores.
        sil_bad = F.coalesce(
            F.col("n_silence") > c.max_silence_ratio * F.col("n_samples"),
            F.lit(False)) if content else F.lit(False)
        # effective-bandwidth fixed point off the same scan's energy+hfc
        # scalars (null on RED clips, so the YELLOW never double-counts)
        nhfc_fp = F.expr(
            "CASE WHEN pcm_sq_sum > 0 THEN hfc * 10000 DIV pcm_sq_sum END")
        bw_bad = (F.coalesce(nhfc_fp < c.bandwidth_fp_yellow, F.lit(False))
                  if content else F.lit(False))
        # effective bit depth off the same scan's OR-fold scalar (null
        # on RED clips): 16 − ctz via the pure-integer bit_count idiom
        eff_bits = F.when(F.col("or_abs") == 0, F.lit(0)).otherwise(
            F.lit(16) - F.bit_count(
                F.col("or_abs").bitwiseAND(-F.col("or_abs"))
                - F.lit(1))).cast("long") if content else F.lit(None)
        bits_bad = (F.coalesce(eff_bits < c.min_eff_bits_yellow,
                               F.lit(False))
                    if content else F.lit(False))
        viol_cond = (snr_red | (hdr_code != 0) | sil_bad | bw_bad
                     | bits_bad)
        content_cols = ([
            "n_samples", "pcm_sum", "pcm_abs_sum", "pcm_jv_sum",
            "n_silence", "n_ceiling", sil_bad.alias("sil_bad"),
            "hfc", "pcm_sq_sum", nhfc_fp.alias("nhfc_fp"),
            bw_bad.alias("bw_bad"),
            "or_abs", eff_bits.alias("eff_bits"),
            bits_bad.alias("bits_bad"), "pcm_cube_sum",
        ] if content else [])
        slim = self._p(raw.select(
            F.col(c.partition_col).alias("partition_id"),
            "snr_db",
            snr_red.alias("snr_red"),
            hdr_code.alias("hdr_code"),
            *content_cols,
            F.when(
                viol_cond,
                F.concat_ws(
                    "\x00", "clip_id",
                    F.coalesce(F.col("hdr_sr_hz").cast("string"), F.lit("?")),
                    F.coalesce(F.col("sr_hz"), F.lit("?")))
            ).alias("viol_info"),
        ))
        # ONE aggregation pass serves both check families' rollups; the
        # two verdict frames are cheap selects over the persisted
        # |partitions|-row result
        content_aggs = ([
            F.sum("n_samples").alias("c_n_samples"),
            F.sum("pcm_sum").alias("c_pcm_sum"),
            F.sum("pcm_abs_sum").alias("c_pcm_abs_sum"),
            F.sum("pcm_jv_sum").alias("c_pcm_jv_sum"),
            F.sum("n_silence").alias("c_n_silence"),
            F.sum("n_ceiling").alias("c_n_ceiling"),
            F.sum(F.col("sil_bad").cast("long")).alias("n_sil_yellow"),
            F.sum("hfc").alias("c_hfc_sum"),
            F.sum("pcm_sq_sum").alias("c_sq_sum"),
            F.sum(F.col("bw_bad").cast("long")).alias("n_bw_yellow"),
            F.expr("bit_or(or_abs)").alias("p_or_abs"),
            F.sum(F.col("bits_bad").cast("long")).alias("n_bits_yellow"),
            F.sum("pcm_cube_sum").alias("c_cube_sum"),
            F.sum((F.col("pcm_cube_sum") < 0).cast("long"))
            .alias("n_neg_skew"),
            F.sum((F.col("pcm_cube_sum") > 0).cast("long"))
            .alias("n_pos_skew"),
        ] if content else [])
        agg = self._p(slim.groupBy("partition_id").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("snr_red").cast("long")).alias("n_snr_red"),
            F.round(F.min("snr_db"), 3).alias("min_snr_db"),
            F.round(F.avg("snr_db"), 3).alias("mean_snr_db"),
            F.sum((F.col("hdr_code") == 2).cast("long")).alias("n_hdr_red"),
            F.sum((F.col("hdr_code") == 1).cast("long")).alias("n_hdr_yellow"),
            *content_aggs,
        ))
        hv = agg.select(
            "partition_id",
            F.lit("header").alias("check_name"),
            F.when(F.col("n_hdr_red") > 0, "RED")
            .when(F.col("n_hdr_yellow") > 0, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_hdr_red") - F.col("n_hdr_yellow"))
            .alias("n_green"),
            F.col("n_hdr_yellow").cast("long").alias("n_yellow"),
            F.col("n_hdr_red").cast("long").alias("n_red"),
            F.concat(F.lit('{"n_bad_container":'),
                     F.col("n_hdr_red").cast("string"),
                     F.lit(',"n_sr_mismatch":'),
                     F.col("n_hdr_yellow").cast("string"),
                     F.lit("}")).alias("metrics_json"),
        )
        sv = agg.select(
            "partition_id",
            F.lit("snr").alias("check_name"),
            F.when(F.col("n_snr_red") > 0, "RED").otherwise("GREEN")
            .alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_snr_red")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_snr_red").cast("long").alias("n_red"),
            F.concat(F.lit('{"min_snr_db":'),
                     F.coalesce(F.col("min_snr_db").cast("string"),
                                F.lit("null")),
                     F.lit(',"mean_snr_db":'),
                     F.coalesce(F.col("mean_snr_db").cast("string"),
                                F.lit("null")),
                     F.lit("}")).alias("metrics_json"),
        )
        viol_base = slim.filter(F.col("viol_info").isNotNull()).select(
            "partition_id", "snr_db", "snr_red", "hdr_code",
            *(["sil_bad", "n_silence", "n_samples", "bw_bad", "nhfc_fp",
               "bits_bad", "eff_bits"]
              if content else []),
            F.split("viol_info", "\x00").getItem(0).alias("clip_id"),
            F.split("viol_info", "\x00").getItem(1).alias("hdr_sr"),
            F.split("viol_info", "\x00").getItem(2).alias("meta_sr"),
        )
        hviol = viol_base.filter(F.col("hdr_code") != 0).select(
            "clip_id",
            "partition_id",
            F.lit("header").alias("check_name"),
            F.when(F.col("hdr_code") == 2, "broken or truncated container")
            .otherwise("header sample rate contradicts metadata")
            .alias("reason"),
            F.substring(F.concat(
                F.lit("hdr_sr="), F.col("hdr_sr"),
                F.lit(" meta_sr="), F.col("meta_sr")),
                1, 50).alias("offending_value_trunc50"),
        )
        sviol = viol_base.filter(F.col("snr_red")).select(
            "clip_id",
            "partition_id",
            F.lit("snr").alias("check_name"),
            F.lit(f"SNR below {c.snr_threshold_db} dB").alias("reason"),
            F.substring(
                F.concat(F.lit("snr_db="),
                         F.coalesce(F.round("snr_db", 2).cast("string"),
                                    F.lit("decode-failed"))),
                1, 50).alias("offending_value_trunc50"),
        )
        if not content:
            return hv, hviol, sv, sviol
        # content frames: two more checks out of the same persisted agg.
        # metrics_json carries exact-integer digests only (both engines
        # format BIGINT identically; no float formatting ambiguity).
        pcv = agg.select(
            "partition_id",
            F.lit("pcm_content").alias("check_name"),
            F.when(F.col("n_snr_red") > 0, "RED").otherwise("GREEN")
            .alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_snr_red")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_snr_red").cast("long").alias("n_red"),
            F.concat(
                F.lit('{"n_samples":'),
                F.coalesce(F.col("c_n_samples").cast("string"), F.lit("0")),
                F.lit(',"pcm_sum":'),
                F.coalesce(F.col("c_pcm_sum").cast("string"), F.lit("0")),
                F.lit(',"pcm_abs_sum":'),
                F.coalesce(F.col("c_pcm_abs_sum").cast("string"), F.lit("0")),
                F.lit(',"pcm_jv_sum":'),
                F.coalesce(F.col("c_pcm_jv_sum").cast("string"), F.lit("0")),
                F.lit("}")).alias("metrics_json"),
        )
        silv = agg.select(
            "partition_id",
            F.lit("silence").alias("check_name"),
            F.when(F.col("n_snr_red") > 0, "RED")
            .when(F.col("n_sil_yellow") > 0, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_snr_red") - F.col("n_sil_yellow"))
            .alias("n_green"),
            F.col("n_sil_yellow").cast("long").alias("n_yellow"),
            F.col("n_snr_red").cast("long").alias("n_red"),
            F.concat(
                F.lit('{"n_silence":'),
                F.coalesce(F.col("c_n_silence").cast("string"), F.lit("0")),
                F.lit(',"n_ceiling":'),
                F.coalesce(F.col("c_n_ceiling").cast("string"), F.lit("0")),
                F.lit("}")).alias("metrics_json"),
        )
        silviol = viol_base.filter(F.col("sil_bad")).select(
            "clip_id",
            "partition_id",
            F.lit("silence").alias("check_name"),
            F.lit(f"near-silent sample share above {c.max_silence_ratio}")
            .alias("reason"),
            F.substring(
                F.concat(F.lit("n_silence="),
                         F.col("n_silence").cast("string"),
                         F.lit("/"),
                         F.col("n_samples").cast("string")),
                1, 50).alias("offending_value_trunc50"),
        )
        bwv = agg.select(
            "partition_id",
            F.lit("bandwidth").alias("check_name"),
            F.when(F.col("n_snr_red") > 0, "RED")
            .when(F.col("n_bw_yellow") > 0, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_snr_red") - F.col("n_bw_yellow"))
            .alias("n_green"),
            F.col("n_bw_yellow").cast("long").alias("n_yellow"),
            F.col("n_snr_red").cast("long").alias("n_red"),
            F.concat(
                F.lit('{"hfc_sum":'),
                F.coalesce(F.col("c_hfc_sum").cast("string"), F.lit("0")),
                F.lit(',"pcm_sq_sum":'),
                F.coalesce(F.col("c_sq_sum").cast("string"), F.lit("0")),
                F.lit("}")).alias("metrics_json"),
        )
        bwviol = viol_base.filter(F.col("bw_bad")).select(
            "clip_id",
            "partition_id",
            F.lit("bandwidth").alias("check_name"),
            F.lit("effective bandwidth below Nyquist/16 "
                  "(upsample suspect)").alias("reason"),
            F.substring(
                F.concat(F.lit("nhfc_fp="),
                         F.col("nhfc_fp").cast("string")),
                1, 50).alias("offending_value_trunc50"),
        )
        bdv = agg.select(
            "partition_id",
            F.lit("bit_depth").alias("check_name"),
            F.when(F.col("n_snr_red") > 0, "RED")
            .when(F.col("n_bits_yellow") > 0, "YELLOW")
            .otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_snr_red") - F.col("n_bits_yellow"))
            .alias("n_green"),
            F.col("n_bits_yellow").cast("long").alias("n_yellow"),
            F.col("n_snr_red").cast("long").alias("n_red"),
            F.concat(
                F.lit('{"or_abs":'),
                F.coalesce(F.col("p_or_abs").cast("string"), F.lit("0")),
                F.lit(',"n_low_bits":'),
                F.coalesce(F.col("n_bits_yellow").cast("string"),
                           F.lit("0")),
                F.lit("}")).alias("metrics_json"),
        )
        bdviol = viol_base.filter(F.col("bits_bad")).select(
            "clip_id",
            "partition_id",
            F.lit("bit_depth").alias("check_name"),
            F.lit(f"effective bit depth below {c.min_eff_bits_yellow} "
                  "(requantized upstream)").alias("reason"),
            F.substring(
                F.concat(F.lit("eff_bits="),
                         F.col("eff_bits").cast("string")),
                1, 50).alias("offending_value_trunc50"),
        )
        plv = agg.select(
            "partition_id",
            F.lit("polarity").alias("check_name"),
            F.when(F.col("n_snr_red") > 0, "RED")
            .otherwise("GREEN").alias("verdict"),
            "n_rows",
            (F.col("n_rows") - F.col("n_snr_red")).alias("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_snr_red").cast("long").alias("n_red"),
            F.concat(
                F.lit('{"cube_sum":'),
                F.coalesce(F.col("c_cube_sum").cast("string"), F.lit("0")),
                F.lit(',"n_neg_skew":'),
                F.coalesce(F.col("n_neg_skew").cast("string"), F.lit("0")),
                F.lit(',"n_pos_skew":'),
                F.coalesce(F.col("n_pos_skew").cast("string"), F.lit("0")),
                F.lit("}")).alias("metrics_json"),
        )
        return (hv, hviol, sv, sviol, pcv, silv, bwv, bdv, plv,
                silviol, bwviol, bdviol)

    def check_snr(self, clips: DataFrame) -> tuple[DataFrame, DataFrame]:
        c = self.cfg
        snr = self._p(
            snr_check(clips, c.snr_threshold_db, extra_cols=[c.partition_col]))
        return self._snr_frames(snr)

    def _snr_frames(self, snr: DataFrame) -> tuple[DataFrame, DataFrame]:
        """SNR verdict roll-up + violation rows from a (persisted) per-clip
        snr_check output carrying at least (clip_id, partition col, snr_db,
        verdict)."""
        c = self.cfg
        roll = snr_partition_rollup(
            snr.select(c.partition_col, "snr_db", "verdict"),
            [c.partition_col]).select(
            F.col(c.partition_col).cast("string").alias("partition_id"),
            F.lit("snr").alias("check_name"),
            F.col("verdict"),
            "n_rows",
            F.col("n_green"),
            F.lit(0).cast("long").alias("n_yellow"),
            F.col("n_red"),
            F.concat(F.lit('{"min_snr_db":'),
                     F.coalesce(F.col("min_snr_db").cast("string"), F.lit("null")),
                     F.lit(',"mean_snr_db":'),
                     F.coalesce(F.col("mean_snr_db").cast("string"), F.lit("null")),
                     F.lit("}")).alias("metrics_json"),
        )
        viols = snr.filter(F.col("verdict") == "RED").select(
            F.col("clip_id"),
            F.col(c.partition_col).cast("string").alias("partition_id"),
            F.lit("snr").alias("check_name"),
            F.lit(f"SNR below {c.snr_threshold_db} dB").alias("reason"),
            F.substring(F.concat(F.lit("snr_db="),
                                 F.coalesce(F.round("snr_db", 2).cast("string"),
                                            F.lit("decode-failed"))),
                        1, 50).alias("offending_value_trunc50"),
        )
        return roll, viols

    # ------------------------------------------------------------------ run

    def check_schema(self, spark: SparkSession,
                     clips: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Metadata-only schema-contract pre-flight (operators/schema.py):
        the FlexKeys ladder over ``clips.schema`` against the declared
        contract, evaluated BEFORE any scan is planned — driver-side, no
        job. When a REQUIRED column is missing and ``schema_fail_fast``
        is set, raises SchemaContractError instead of letting a broken
        producer burn a 100 TB read; otherwise the findings flow through
        the normal verdict/violation frames as a table-level check row
        (partition_id ``__table__`` — schema is a property of the table,
        not of any partition, and the check is cheap enough to re-run
        every time, so it stays outside the resume ledger)."""
        import json as _json

        from ..operators.schema import (
            SchemaContractError, spark_type_family, validate_schema)
        c = self.cfg
        actual = [(f.name, spark_type_family(f.dataType.simpleString()))
                  for f in clips.schema.fields]
        rows = validate_schema(actual, list(c.schema_contract))
        missing_req = [r for r in rows
                       if r["match_kind"] == "missing" and r["required"]]
        if missing_req and c.schema_fail_fast:
            names = ", ".join(r["field"] for r in missing_req)
            raise SchemaContractError(
                f"required columns missing from input schema: {names}")
        rank = {"GREEN": 0, "YELLOW": 1, "RED": 2}
        worst = max((r["verdict"] for r in rows),
                    key=lambda v: rank[v], default="GREEN")
        counts = [sum(r["verdict"] == v for r in rows)
                  for v in ("GREEN", "YELLOW", "RED")]
        metrics = _json.dumps(
            {r["field"]: f'{r["match_kind"]}:{r["verdict"]}'
             for r in rows}, sort_keys=True)
        verdicts = spark.createDataFrame(
            [("__table__", "schema", worst, len(rows),
              counts[0], counts[1], counts[2], metrics)],
            "partition_id string, check_name string, verdict string, "
            "n_rows long, n_green long, n_yellow long, n_red long, "
            "metrics_json string")
        viol = [(None, "__table__", "schema",
                 f'{r["match_kind"]}:{r["field"]}',
                 (r["actual_family"] or "")[:50])
                for r in rows if r["verdict"] != "GREEN"]
        violations = (spark.createDataFrame(
            viol, "clip_id string, partition_id string, "
                  "check_name string, reason string, "
                  "offending_value_trunc50 string")
            if viol else _empty_violations(spark))
        return verdicts, violations

    def run(
        self,
        spark: SparkSession,
        clips: DataFrame,
        manifest: DataFrame | None = None,
        baseline_shares: DataFrame | None = None,
        ledger_path: str | None = None,
        input_path: str = "",
        resume: bool = True,
        persist_intermediates: bool = True,
    ) -> SuiteResult:
        c = self.cfg
        self._persist_intermediates = persist_intermediates
        self._cache = []
        verdict_frames: list[DataFrame] = []
        violation_frames: list[DataFrame] = []

        if c.schema_contract:
            sv, sviol = self.check_schema(spark, clips)
            verdict_frames.append(sv)
            violation_frames.append(sviol)

        active_checks = ["stats", "uniqueness", "header", "snr"]
        if c.content_checks:
            active_checks += ["pcm_content", "silence", "bandwidth",
                              "bit_depth", "polarity"]
        if c.domain_rules:
            active_checks += [r.check_name for r in c.domain_rules]
        if c.metadata_checks:
            active_checks += ["payload:container_vs_codec",
                              "payload:dur_vs_header"]
        if manifest is not None:
            active_checks += ["referential", "transcript"]
        if baseline_shares is not None:
            active_checks += [f"drift_{col}" for col in c.drift_cols]

        work = clips
        if ledger_path and resume:
            ledger = ledger_read(spark, ledger_path)
            parts = clips.select(
                F.col(c.partition_col).cast("string").alias("partition_id")
            ).distinct()
            # a partition is pending if ANY active check is missing for it
            pend = None
            for check in active_checks:
                p = pending_partitions(parts, ledger, check)
                pend = p if pend is None else pend.unionByName(p)
            work, n_pending = prune_to_pending(
                clips, pend.distinct(), c.partition_col)
            if n_pending == 0:
                # fully-resumed run: no partition work left, but the
                # (ledger-exempt) schema pre-flight rows still report
                empty_v = spark.createDataFrame(
                    [], "partition_id string, check_name string, "
                        "verdict string, n_rows long, n_green long, "
                        "n_yellow long, n_red long, metrics_json string")
                for vf in verdict_frames:
                    empty_v = empty_v.unionByName(vf)
                empty_viol = _empty_violations(spark)
                for vf in violation_frames:
                    empty_viol = empty_viol.unionByName(vf)
                return SuiteResult(partition_verdicts=empty_v,
                                   violations=empty_viol)

        verdict_frames.append(self.check_stats(work))
        if c.domain_rules:
            dv, dviol = self.check_domain(work)
            verdict_frames.append(dv)
            violation_frames.append(dviol)
        if c.metadata_checks:
            mv, mviol = self.check_metadata(work)
            verdict_frames.append(mv)
            violation_frames.append(mviol)
        uv, uviol = self.check_uniqueness(work)
        verdict_frames.append(uv)
        violation_frames.append(uviol)
        if manifest is not None:
            rv, rviol = self.check_referential(work, manifest)
            verdict_frames.append(rv)
            violation_frames.append(rviol)
            tv, tviol = self.check_transcript(work, manifest)
            verdict_frames.append(tv)
            violation_frames.append(tviol)
        if baseline_shares is not None:
            verdict_frames.append(self.check_drift(work, baseline_shares))
        media = self.check_media(work)
        hv, hviol, sv, sviol = media[:4]
        verdict_frames.append(hv)
        violation_frames.append(hviol)
        verdict_frames.append(sv)
        violation_frames.append(sviol)
        if c.content_checks:
            pcv, silv, bwv, bdv, plv, silviol, bwviol, bdviol = media[4:]
            for vf in (pcv, silv, bwv, bdv, plv):
                verdict_frames.append(vf)
            for vf in (silviol, bwviol, bdviol):
                violation_frames.append(vf)

        verdicts = verdict_frames[0]
        for fdf in verdict_frames[1:]:
            verdicts = verdicts.unionByName(fdf)
        viols = violation_frames[0]
        for fdf in violation_frames[1:]:
            viols = viols.unionByName(fdf)

        if ledger_path:
            lineage = make_lineage(input_path, __version__)
            # executor-side append: verdict rows are projected into
            # ledger rows and written distributed — no driver
            # materialization however many partitions×checks the run
            # covers (r3 verdict watch item #3)
            ledger_append_frame(verdicts, ledger_path, lineage)

        return SuiteResult(partition_verdicts=verdicts, violations=viols,
                           cached=list(self._cache))


def build_baseline_shares(clips: DataFrame, cfg: SuiteConfig) -> DataFrame:
    """Baseline histogram shares from a reference (un-drifted) population:
    one (col, bucket, share) row per drift column and bucket."""
    frames = []
    for col in cfg.drift_cols:
        lo, hi = cfg.drift_ranges[col]
        frames.append(
            histogram(clips, col, lo, hi, cfg.drift_bins)
            .select(F.lit(col).alias("col"), "bucket", "share"))
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out
