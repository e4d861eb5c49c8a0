"""Audio segmentation & resampling — training-pipeline ops over binary
payloads.

A model-training pipeline rarely consumes whole clips: it wants
fixed-duration windows (chunking) and a uniform sample rate
(resampling). Both are implemented Spark-first:

- :func:`chunk_audio` never leaves the JVM: the chunk grid is integer
  arithmetic on the container header (``multimodal.wav_header_columns``),
  each chunk is a binary ``substring`` slice, and the per-row fan-out is
  a bounded ``explode(sequence(...))``. Map-only over the source
  partitioning — payload bytes never shuffle, so the op holds at
  10^12 rows (fan-out ≤ ceil(max_dur/chunk_ms) per clip).
- :func:`resample_dominant_freq` is sample-level math and therefore an
  Arrow stage (the engine's rule: Python only where Column expressions
  genuinely cannot express the semantics — here linear-interpolation
  resampling + rFFT), vectorized numpy per clip, scalars out.

Cross-engine contracts (what the DuckDB oracles pin):
- chunk grid: bytes_per_chunk = 2*max(1, sr*chunk_ms // 1000),
  n_chunks = ceil(data_bytes / bytes_per_chunk), all integer math;
- resample length: n_out = n_in * target_sr // sr (integer floor — no
  float rounding to diverge between engines).

Reference parity note: the reference (d3rty/json) has no media surface;
these ops exist for the brief's training-data pipeline mandate
(BASELINE.json:6 audio-clip table, SURVEY.md §2.10).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures.signal import decode_wav_pcm16
from .multimodal import wav_header_columns


def chunk_audio(clips: DataFrame, chunk_ms: int = 20) -> DataFrame:
    """Split each clip's PCM payload into fixed-duration chunks, entirely
    with Column expressions.

    Output: one row per chunk — ``clip_id``, ``codec``, ``chunk_idx``
    (0-based), ``chunk`` (binary slice), ``chunk_len`` (bytes; the tail
    chunk may be short), ``bytes_per_chunk`` (the grid this clip used —
    depends on its header sample rate).

    Rows whose container is unreadable (no RIFF/WAVE magic) are dropped:
    segmentation of an undecodable payload is meaningless — the header /
    SNR checks are where such rows get flagged.
    """
    hdr = wav_header_columns(F.col("bytes"))
    samples_per_chunk = F.greatest(
        F.lit(1).cast("long"),
        F.floor(hdr["hdr_sr_hz"] * F.lit(chunk_ms) / F.lit(1000))
        .cast("long"))
    bpc = (2 * samples_per_chunk).alias("bytes_per_chunk")
    data_bytes = hdr["data_bytes"]
    n_chunks = F.floor((data_bytes + (2 * samples_per_chunk) - 1)
                       / (2 * samples_per_chunk)).cast("long")
    # data_bytes == 0 would make sequence(0, -1) step backwards and emit
    # two bogus chunk rows; an empty data section has zero chunks
    gridded = clips.filter(hdr["riff_ok"] & (data_bytes > 0)).select(
        "clip_id", "codec", "bytes", bpc,
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        .alias("chunk_idx"),
    )
    chunk = F.substring(
        F.col("bytes"),
        (F.lit(45) + F.col("chunk_idx") * F.col("bytes_per_chunk"))
        .cast("int"),
        F.col("bytes_per_chunk").cast("int"))
    return gridded.select(
        "clip_id", "codec", "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).cast("long").alias("chunk_len"),
        "bytes_per_chunk",
    )


RESAMPLE_SCHEMA = ("clip_id string, codec string, n_out bigint, "
                   "dominant_hz double, bin_hz double")


def resample_dominant_freq(clips: DataFrame,
                           target_sr: int = 8000) -> DataFrame:
    """Linear-interpolation resample to ``target_sr`` inside an Arrow
    stage, then rFFT argmax on the RESAMPLED signal — the invariant that
    a rate-normalizing pipeline stage preserved the content's pitch.

    Length contract (oracle-reproducible, pure integer math):
    ``n_out = n_in * target_sr // sr``. Undecodable payloads and signals
    shorter than 2 output samples yield null ``dominant_hz``.
    """

    def res(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            payloads = batch.column("bytes")
            n_out_l, dom, binw = [], [], []
            for j in range(batch.num_rows):
                try:
                    sig, sr = decode_wav_pcm16(
                        memoryview(payloads[j].as_buffer()))
                except (ValueError, struct.error, AttributeError):
                    n_out_l.append(None)
                    dom.append(None)
                    binw.append(None)
                    continue
                n_in = len(sig)
                n_out = (n_in * target_sr) // sr
                n_out_l.append(n_out)
                if n_out < 2:
                    dom.append(None)
                    binw.append(None)
                    continue
                t_in = np.arange(n_in, dtype=np.float64) / sr
                t_out = np.arange(n_out, dtype=np.float64) / target_sr
                y = np.interp(t_out, t_in, sig.astype(np.float64))
                spec = np.abs(np.fft.rfft(y))
                k = int(np.argmax(spec[1:])) + 1
                dom.append(k * target_sr / n_out)
                binw.append(target_sr / n_out)
            yield pa.RecordBatch.from_arrays(
                [batch.column("clip_id"),
                 pa.array(codecs, pa.string()),
                 pa.array(n_out_l, pa.int64()),
                 pa.array(dom, pa.float64()),
                 pa.array(binw, pa.float64())],
                ["clip_id", "codec", "n_out", "dominant_hz", "bin_hz"])

    return clips.select("clip_id", "codec", "bytes").mapInArrow(
        res, RESAMPLE_SCHEMA)
