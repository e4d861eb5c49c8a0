"""Deterministic clips + manifest fixture generator (FIXTURES.md §1-2).

Synthesis is DISTRIBUTED: ``spark.range(n)`` fans row ids across executors
and a ``mapInPandas`` stage renders WAV payloads batch-wise with numpy —
the same shape that would synthesize (or re-check) 10^12 clips on a real
cluster. Nothing is collected driver-side; the only driver work is planning.

Planted defects (all keyed on deterministic row-id arithmetic, so expected
counts are closed-form — SURVEY.md §5 t1):
- duplicate clip_ids        : every DUP_EVERY-th row reuses the previous id
- corrupted PCM (SNR<30 dB) : every CORRUPT_EVERY-th row gets uniform noise
- orphan clips              : every ORPHAN_EVERY-th clip_id missing from manifest
- transcript mismatches     : every MISMATCH_EVERY-th manifest transcript differs
- null dur_ms               : every NULLDUR_EVERY-th row (null-rate stat)
- drifted sr_hz             : codec 'opus' draws sr from a shifted distribution
  (drift vs the baseline built from the non-drifted population)
- hot codec                 : 'pcm_s16le' ~70% of rows (skew/salting exercise)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .signal import clip_seed, pcm16_wav_bytes, reference_signal

DUP_EVERY = 1000
CORRUPT_EVERY = 997      # co-prime offsets so defects don't coincide
ORPHAN_EVERY = 991
MISMATCH_EVERY = 983
NULLDUR_EVERY = 101

CODECS = ["pcm_s16le", "flac", "opus", "mp3"]
#: hot key: pcm_s16le gets 70% of rows
CODEC_WEIGHTS = [0.70, 0.14, 0.10, 0.06]
SR_CHOICES = [8000, 16000, 22050, 44100, 48000]
#: the drifted codec draws sr_hz from the high end only
SR_CHOICES_DRIFTED = [44100, 48000]

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)

_WORDS = ("the quick brown fox jumps over lazy dog audio clip speech "
          "transcript hello world spark valid data check").split()


def _transcript(seed: int) -> str:
    rng = np.random.default_rng(seed)
    n = 4 + int(rng.integers(0, 8))
    return " ".join(_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n))


def _codec_for(seed: int) -> str:
    u = (seed % 10_000) / 10_000.0
    acc = 0.0
    for c, w in zip(CODECS, CODEC_WEIGHTS):
        acc += w
        if u < acc:
            return c
    return CODECS[-1]


def _row(i: int) -> dict:
    """Deterministic clip row (without bytes) for row number i."""
    dup = i % DUP_EVERY == (DUP_EVERY - 1) and i > 0
    base_i = i - 1 if dup else i
    clip_id = f"clip-{base_i:012d}"
    seed = clip_seed(clip_id)
    codec = _codec_for(seed)
    if codec == "opus":  # the drifted partition
        sr = SR_CHOICES_DRIFTED[seed % len(SR_CHOICES_DRIFTED)]
    else:
        sr = SR_CHOICES[seed % len(SR_CHOICES)]
    dur = None if i % NULLDUR_EVERY == (NULLDUR_EVERY - 1) else int(
        50 + (seed % 151))  # 50-200 ms keeps payloads test-sized
    return {
        "i": i,
        "clip_id": clip_id,
        "seed": seed,
        "codec": codec,
        "sr_hz": sr,
        "dur_ms": dur,
        "corrupt": i % CORRUPT_EVERY == (CORRUPT_EVERY - 1),
        "transcript": _transcript(seed),
    }


def _render_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for i in pdf["id"].to_numpy():
        r = _row(int(i))
        dur_for_audio = r["dur_ms"] if r["dur_ms"] is not None else 100
        sig = reference_signal(r["clip_id"], r["sr_hz"], dur_for_audio)
        if r["corrupt"]:
            rng = np.random.default_rng(r["seed"] ^ 0xDEAD)
            sig = sig + rng.uniform(-0.3, 0.3, sig.shape).astype(np.float32)
        out.append({
            "clip_id": r["clip_id"],
            "bytes": pcm16_wav_bytes(sig, r["sr_hz"]),
            "sr_hz": r["sr_hz"],
            "dur_ms": r["dur_ms"],
            "codec": r["codec"],
            "transcript": r["transcript"],
        })
    return pd.DataFrame(out)


def generate_clips(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Distributed clips table: ``spark.range`` → mapInPandas WAV render."""
    base = spark.range(0, n, 1, partitions)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _render_batch(pdf)

    return base.mapInPandas(render, CLIPS_SCHEMA)


def generate_manifest(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Transcript manifest: covers all clip ids except planted orphans;
    every MISMATCH_EVERY-th transcript deliberately differs."""
    base = spark.range(0, n, 1, partitions)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i % ORPHAN_EVERY == (ORPHAN_EVERY - 1):
                    continue  # orphan: clip exists, manifest entry doesn't
                clip_id = f"clip-{i:012d}"
                seed = clip_seed(clip_id)
                t = _transcript(seed)
                if i % MISMATCH_EVERY == (MISMATCH_EVERY - 1):
                    t = t + " MISMATCH"
                rows.append({"clip_id": clip_id, "transcript": t})
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(render, "clip_id string, transcript string")


def expected_defect_counts(n: int) -> dict[str, int]:
    """Closed-form planted-defect counts for assertions."""
    dup_rows = len([i for i in range(n) if i % DUP_EVERY == DUP_EVERY - 1 and i > 0])
    orphan_ids = [i for i in range(n) if i % ORPHAN_EVERY == ORPHAN_EVERY - 1]
    # a duplicated row keeps the previous row's clip_id, so base ids that
    # were duplicated do not add orphans beyond the id-level count
    return {
        "n_rows": n,
        "dup_extra_rows": dup_rows,
        "corrupt_rows": len([i for i in range(n) if i % CORRUPT_EVERY == CORRUPT_EVERY - 1]),
        "orphan_ids": len(orphan_ids),
        "mismatch_ids": len([i for i in range(n)
                             if i % MISMATCH_EVERY == MISMATCH_EVERY - 1
                             and i % ORPHAN_EVERY != ORPHAN_EVERY - 1]),
        "null_dur_rows": len([i for i in range(n) if i % NULLDUR_EVERY == NULLDUR_EVERY - 1]),
    }


def write_fixtures(spark: SparkSession, out_dir: str, n: int,
                   partitions: int = 32) -> None:
    """Materialize clips (partitioned by codec — the engine's partition
    pruning axis) + manifest as parquet."""
    clips = generate_clips(spark, n, partitions)
    clips.write.mode("overwrite").partitionBy("codec").parquet(f"{out_dir}/clips")
    manifest = generate_manifest(spark, n, max(partitions // 4, 1))
    manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
