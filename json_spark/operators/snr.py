"""PCM decode + SNR invariant — the engine's only Python stage.

North-rule check (BASELINE.json input_hint): decoded PCM must match the
reference signal with SNR >= 30 dB ("allclose"). Container-agnostic:
WAV decodes first; non-RIFF payloads fall through to the real FLAC
codec (functions/flac.py), so the same invariant runs over either
container. This is the one operator that genuinely cannot be a Column
expression (byte-level container decode + numpy math), so it is an
Arrow-batched ``mapInArrow`` stage: Arrow moves
binary batches to the Python worker, numpy does vectorized math per clip,
and ONLY the scalar results (snr_db, verdict) come back — the audio bytes
never travel driver-ward or shuffle.

Why ``mapInArrow`` and not ``mapInPandas``: converting a large BINARY
column from Arrow to a pandas object Series allocates one PyBytes per row
before the UDF even runs (~0.3 ms/row measured at bench scale — as much
as the SNR math itself). RecordBatch rows are handed to numpy directly
via zero-copy buffer views instead.

Scale notes:
- the stage reads exactly (clip_id, bytes, sr_hz, dur_ms [, partition
  cols]) — column pruning keeps every other column out of the scan;
- batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  (set low in session.py because rows carry audio payloads);
- no shuffle at all: map-only over the source partitioning, then the
  tiny verdict output aggregates map-side.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures.signal import decode_wav_pcm16, reference_signal, snr_db
from ..functions.flac import decode_flac

SNR_THRESHOLD_DB = 30.0


def _probe_wav_header(buf) -> tuple[bool, int | None, int | None]:
    """(riff_ok, hdr_sr_hz, data_bytes) from the first 44 bytes — byte
    slicing only, no decode. Costs ~1µs/row next to the FFT/decode work
    the stage already does, which is why the fused suite check reads the
    header HERE instead of paying per-row JVM hex/conv string surgery on
    the full binary scan (the pure-Column parse in multimodal.py remains
    the fast path for header-ONLY validation, where no Python stage runs
    at all)."""
    if buf is None or len(buf) < 44 or bytes(buf[:4]) != b"RIFF" \
            or bytes(buf[8:12]) != b"WAVE":
        return False, None, None
    sr = struct.unpack("<I", buf[24:28])[0]
    n_bytes = struct.unpack("<I", buf[40:44])[0]
    return True, sr, n_bytes


def snr_check(clips: DataFrame, threshold_db: float = SNR_THRESHOLD_DB,
              extra_cols: list[str] | None = None,
              emit_header: bool = False) -> DataFrame:
    """Per-clip SNR vs the regenerated reference signal.

    Output: clip_id, extra_cols…, snr_db double, verdict (GREEN if
    snr >= threshold, RED otherwise — decode failures are RED with
    snr_db = null). With ``emit_header`` the stage also returns the
    container header fields it parses anyway (riff_ok, hdr_sr_hz,
    data_bytes, payload_len) so a fused caller gets header integrity
    from the same single pass over the audio payload.
    """
    extra = list(extra_cols or [])
    in_cols = ["clip_id", "bytes", "dur_ms", *extra]
    out_schema = ", ".join(
        ["clip_id string"]
        + [f"{c} string" for c in extra]
        + ["snr_db double", "verdict string"]
        + (["riff_ok boolean, hdr_sr_hz bigint, data_bytes bigint, "
            "payload_len bigint"] if emit_header else [])
    )

    def check(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            ids = batch.column("clip_id").to_pylist()
            payloads = batch.column("bytes")
            durs = batch.column("dur_ms").to_pylist()
            snrs = np.full(n, np.nan)
            hdr = ([], [], [], []) if emit_header else None
            for j in range(n):
                buf = None
                try:
                    buf = memoryview(payloads[j].as_buffer())
                except AttributeError:
                    pass  # null payload
                if emit_header:
                    riff, hsr, dbytes = _probe_wav_header(buf)
                    hdr[0].append(riff)
                    hdr[1].append(hsr)
                    hdr[2].append(dbytes)
                    hdr[3].append(None if buf is None else len(buf))
                try:
                    if buf is None:
                        continue
                    try:
                        decoded, sr = decode_wav_pcm16(buf)
                    except (ValueError, struct.error):
                        # second container: real FLAC decode (checksums
                        # enforced); rejects non-fLaC instantly at magic
                        decoded, sr = decode_flac(bytes(buf))
                    dur = int(durs[j]) if durs[j] is not None else 100
                    ref = reference_signal(ids[j], sr, dur)
                    snrs[j] = snr_db(ref, decoded)
                except (ValueError, struct.error):
                    pass  # malformed payload stays RED / null snr
            ok = snrs >= threshold_db  # NaN compares False → RED
            arrays = [batch.column("clip_id")]
            names = ["clip_id"]
            for c in extra:
                arrays.append(batch.column(c).cast(pa.string()))
                names.append(c)
            arrays.append(pa.array(
                [None if np.isnan(s) else float(s) for s in snrs],
                pa.float64()))
            names.append("snr_db")
            arrays.append(pa.array(np.where(ok, "GREEN", "RED")))
            names.append("verdict")
            if emit_header:
                arrays += [pa.array(hdr[0], pa.bool_()),
                           pa.array(hdr[1], pa.int64()),
                           pa.array(hdr[2], pa.int64()),
                           pa.array(hdr[3], pa.int64())]
                names += ["riff_ok", "hdr_sr_hz", "data_bytes", "payload_len"]
            yield pa.RecordBatch.from_arrays(arrays, names)

    return clips.select(*in_cols).mapInArrow(check, out_schema)


def snr_partition_rollup(snr_df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """Roll SNR verdicts up to partitions (worst-verdict semantics)."""
    return snr_df.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("verdict") == "GREEN").cast("long")).alias("n_green"),
        F.sum((F.col("verdict") == "RED").cast("long")).alias("n_red"),
        F.round(F.min("snr_db"), 3).alias("min_snr_db"),
        F.round(F.avg("snr_db"), 3).alias("mean_snr_db"),
        F.when(F.max((F.col("verdict") == "RED").cast("int")) == 1, "RED")
        .otherwise("GREEN").alias("verdict"),
    )
