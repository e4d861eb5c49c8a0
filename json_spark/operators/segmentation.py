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

from ..fixtures.signal import (
    decode_wav_pcm16,
    pcm16_wav_bytes,
    reference_signal,
    reference_slice,
    snr_db,
)
from .multimodal import wav_header_columns


def chunk_audio(clips: DataFrame, chunk_ms: int = 20,
                extra_cols: list[str] | None = None) -> DataFrame:
    """Split each clip's PCM payload into fixed-duration chunks, entirely
    with Column expressions.

    Output: one row per chunk — ``clip_id``, ``codec``, ``chunk_idx``
    (0-based), ``chunk`` (binary slice), ``chunk_len`` (bytes; the tail
    chunk may be short), ``bytes_per_chunk`` (the grid this clip used —
    depends on its header sample rate), plus any ``extra_cols`` carried
    through untouched (e.g. ``sr_hz``/``dur_ms`` for a downstream stage
    that regenerates the reference per chunk).

    Rows whose container is unreadable (no RIFF/WAVE magic) are dropped:
    segmentation of an undecodable payload is meaningless — the header /
    SNR checks are where such rows get flagged.
    """
    extra = list(extra_cols or [])
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
        "clip_id", "codec", *extra, "bytes", bpc,
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        .alias("chunk_idx"),
    )
    chunk = F.substring(
        F.col("bytes"),
        (F.lit(45) + F.col("chunk_idx") * F.col("bytes_per_chunk"))
        .cast("int"),
        F.col("bytes_per_chunk").cast("int"))
    return gridded.select(
        "clip_id", "codec", *extra, "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).cast("long").alias("chunk_len"),
        "bytes_per_chunk",
    )


def chunk_content_digest(chunks: DataFrame,
                         threshold_db: float = 30.0) -> DataFrame:
    """Sample-exact content digest of each CHUNK produced by
    :func:`chunk_audio` — proves the JVM-side binary ``substring``
    slicing is lossless at the int16 lattice level, chunk by chunk.

    Each chunk's raw PCM16 slice decodes with ``np.frombuffer`` (no
    header — chunks are data-section slices) and is gated per chunk
    against the reference slice at its grid offset
    (fixtures/signal.py:reference_slice — O(chunk), not O(clip)):
    chunks of planted-noise clips fail the 30 dB gate chunk-locally and
    emit null digests, exactly the set the analytic oracle excludes.
    GREEN chunks emit exact int64 digests (count, Σv, Σ|v|, Σ j_local·v)
    that pure SQL trigonometry reproduces bit-for-bit.

    Input needs ``clip_id, chunk, chunk_idx, bytes_per_chunk, sr_hz``
    (pass ``extra_cols=["sr_hz"]`` to chunk_audio — the reference slice
    is position-keyed, so clip duration is irrelevant here).
    Map-only: chunk bytes arrive on the source partitioning and never
    shuffle; ~40 digest bytes per chunk travel onward.
    """

    def digest(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            ids = batch.column("clip_id").to_pylist()
            idxs = batch.column("chunk_idx").to_pylist()
            bpcs = batch.column("bytes_per_chunk").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            payloads = batch.column("chunk")
            verd = []
            nsamp = np.full(n, -1, dtype=np.int64)
            dsum = np.zeros(n, dtype=np.int64)
            dabs = np.zeros(n, dtype=np.int64)
            djv = np.zeros(n, dtype=np.int64)
            for j in range(n):
                try:
                    buf = memoryview(payloads[j].as_buffer())
                except (AttributeError, TypeError):
                    verd.append("RED")
                    continue
                try:
                    v16 = np.frombuffer(buf, dtype="<i2")
                    if len(v16) == 0:
                        verd.append("RED")
                        continue
                    start = int(idxs[j]) * (int(bpcs[j]) // 2)
                    ref = reference_slice(ids[j], int(srs[j]), start,
                                          len(v16))
                    decoded = v16.astype(np.float32) / 32767.0
                    if snr_db(ref, decoded) >= threshold_db:
                        v = v16.astype(np.int64)
                        nsamp[j] = len(v)
                        dsum[j] = int(v.sum())
                        dabs[j] = int(np.abs(v).sum())
                        djv[j] = int(
                            (np.arange(len(v), dtype=np.int64) * v).sum())
                        verd.append("GREEN")
                    else:
                        verd.append("RED")
                except (ValueError, struct.error):
                    verd.append("RED")
            mask = nsamp >= 0
            yield pa.RecordBatch.from_arrays(
                [batch.column("clip_id"),
                 batch.column("chunk_idx").cast(pa.int64()),
                 pa.array(verd, pa.string()),
                 pa.array(np.where(mask, nsamp, 0), pa.int64(),
                          mask=~mask),
                 pa.array(dsum, pa.int64(), mask=~mask),
                 pa.array(dabs, pa.int64(), mask=~mask),
                 pa.array(djv, pa.int64(), mask=~mask)],
                ["clip_id", "chunk_idx", "verdict", "n_samples",
                 "pcm_sum", "pcm_abs_sum", "pcm_jv_sum"])

    cols = ["clip_id", "chunk", "chunk_idx", "bytes_per_chunk", "sr_hz"]
    return chunks.select(*cols).mapInArrow(
        digest,
        "clip_id string, chunk_idx long, verdict string, n_samples long, "
        "pcm_sum long, pcm_abs_sum long, pcm_jv_sum long")


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
                except (ValueError, struct.error, AttributeError, TypeError):
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


GAIN_NORMALIZE_SCHEMA = (
    "clip_id string, codec string, decoded boolean, verdict string, "
    "n_samples long, out_peak long, pcm_sum long, pcm_abs_sum long, "
    "pcm_jv_sum long, out_bytes long"
)


def normalize_gain(clips: DataFrame, target_peak: int = 30000) -> DataFrame:
    """Peak gain normalization — a CONTENT TRANSFORM with a sample-exact
    cross-engine contract (the loudness-leveling step a training
    pipeline runs before featurization).

    Per clip: decode → recover the int16 lattice → scale every sample by
    ``target_peak / max|v|`` → round half-even → re-encode as WAV →
    decode the re-encoded bytes and digest THOSE samples. The digests
    therefore certify the whole write path (scale, clip-to-lattice,
    container re-encode, second decode), not just the arithmetic. The
    contract is deterministic IEEE-754: the factor is one double
    division, each product one double multiply, rounding is half-even —
    so an independent engine reproduces every output sample bit-for-bit
    from the analytic twin (registry.py q_audio_gain_normalize does it
    in pure SQL).

    Silent clips (max|v| = 0) pass through unscaled. Undecodable
    payloads emit decoded=false with null digests. ``verdict`` is the
    reference-SNR label (as in perceptual_fingerprint): the transform
    runs on every decodable clip, but planted-noise rows are flagged so
    the closed-form oracle (which cannot derive PCG noise) excludes
    them by the engine's own classification.

    Scale shape: map-only Arrow stage; the transformed payload stays in
    the task (a real pipeline would write it straight to the sink
    partition-aligned); only ~50 bytes of digest travel onward.
    """

    def norm(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            n = batch.num_rows
            verd: list[str] = []
            dec = np.zeros(n, dtype=bool)
            nsamp = np.zeros(n, dtype=np.int64)
            peak = np.zeros(n, dtype=np.int64)
            dsum = np.zeros(n, dtype=np.int64)
            dabs = np.zeros(n, dtype=np.int64)
            djv = np.zeros(n, dtype=np.int64)
            nbytes = np.zeros(n, dtype=np.int64)
            for j in range(n):
                try:
                    buf = memoryview(payloads[j].as_buffer())
                    sig, sr = decode_wav_pcm16(buf)
                except (ValueError, struct.error, AttributeError, TypeError):
                    verd.append("RED")
                    continue
                dur = int(durs[j]) if durs[j] is not None else 100
                ref = reference_signal(ids[j], sr, dur)
                verd.append("GREEN" if snr_db(ref, sig) >= 30.0
                            else "RED")
                v = np.round(sig.astype(np.float64) * 32767.0
                             ).astype(np.int64)
                ma = int(np.abs(v).max()) if len(v) else 0
                if ma > 0:
                    factor = float(target_peak) / float(ma)
                    v2 = np.round(v.astype(np.float64) * factor
                                  ).astype(np.int64)
                else:
                    v2 = v
                # re-encode -> re-decode: certify the write path too
                wav = pcm16_wav_bytes(
                    (v2 / 32767.0).astype(np.float32), sr)
                sig2, _ = decode_wav_pcm16(memoryview(wav))
                v3 = np.round(sig2.astype(np.float64) * 32767.0
                              ).astype(np.int64)
                dec[j] = True
                nsamp[j] = len(v3)
                peak[j] = int(np.abs(v3).max()) if len(v3) else 0
                dsum[j] = int(v3.sum())
                dabs[j] = int(np.abs(v3).sum())
                djv[j] = int((np.arange(len(v3), dtype=np.int64)
                              * v3).sum())
                nbytes[j] = len(wav)
            mask = ~dec
            yield pa.RecordBatch.from_arrays(
                [batch.column("clip_id"), batch.column("codec"),
                 pa.array(dec), pa.array(verd, pa.string()),
                 pa.array(nsamp, pa.int64(), mask=mask),
                 pa.array(peak, pa.int64(), mask=mask),
                 pa.array(dsum, pa.int64(), mask=mask),
                 pa.array(dabs, pa.int64(), mask=mask),
                 pa.array(djv, pa.int64(), mask=mask),
                 pa.array(nbytes, pa.int64(), mask=mask)],
                ["clip_id", "codec", "decoded", "verdict", "n_samples",
                 "out_peak", "pcm_sum", "pcm_abs_sum", "pcm_jv_sum",
                 "out_bytes"])

    return clips.select("clip_id", "codec", "dur_ms", "bytes").mapInArrow(
        norm, GAIN_NORMALIZE_SCHEMA)


def _decode_any(buf) -> tuple[np.ndarray, int] | None:
    """Decode a WAV (then FLAC) payload; None on failure/null."""
    from ..functions.flac import decode_flac
    if buf is None:
        return None
    try:
        try:
            return decode_wav_pcm16(buf)
        except (ValueError, struct.error):
            return decode_flac(bytes(buf))
    except (ValueError, struct.error):
        return None


def slice_clips(clips: DataFrame, drop_chunks: int = 2,
                chunk_ms: int = 20, suffix: str = "-cut") -> DataFrame:
    """Derive head-cut copies of clips in the DECODED domain: decode,
    drop the first ``drop_chunks`` grid-aligned chunks of samples, and
    re-encode as canonical PCM16 WAV under ``clip_id || suffix``.

    Because decode → re-encode is an exact int16 round-trip (the
    pcm_digest inversion argument), a derived clip's samples equal the
    original's samples shifted by exactly drop_chunks·win — its chunk
    digests are the original's shifted by drop_chunks, which is what
    the audio span dedup relies on. Rows that fail to decode or are
    shorter than the cut emit nothing.

    Map-only Arrow stage over the source partitioning.
    """

    def cut(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            payloads = batch.column("bytes")
            out_ids, out_bytes, out_srs = [], [], []
            for j in range(batch.num_rows):
                try:
                    buf = memoryview(payloads[j].as_buffer())
                except (AttributeError, TypeError):
                    continue
                dec = _decode_any(buf)
                if dec is None:
                    continue
                sig, sr = dec
                win = max(1, sr * chunk_ms // 1000)
                drop = drop_chunks * win
                if len(sig) <= drop:
                    continue
                out_ids.append(ids[j] + suffix)
                out_bytes.append(pcm16_wav_bytes(sig[drop:], sr))
                out_srs.append(sr)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, pa.string()),
                 pa.array(out_bytes, pa.binary()),
                 pa.array(out_srs, pa.int32())],
                ["clip_id", "bytes", "sr_hz"])

    return clips.select("clip_id", "bytes").mapInArrow(
        cut, "clip_id string, bytes binary, sr_hz int")


def pcm_chunk_digests(clips: DataFrame, chunk_ms: int = 20) -> DataFrame:
    """Exact per-chunk int64 digests of each clip's decoded PCM stream,
    UNGATED — unlike :func:`chunk_content_digest` there is no reference
    comparison, so the stage works on any decodable payload (including
    derived ids that have no generator reference). Decode failures emit
    no rows.

    Output per chunk: clip_id, chunk_idx (0-based over the
    ``win = max(1, sr*chunk_ms // 1000)`` sample grid), n_samples,
    pcm_sum, pcm_abs_sum, pcm_jv_sum (j local to the chunk) — the
    identity key for aligned audio-span detection: two clips share a
    chunk iff all four integers match.

    Map-only Arrow stage; ~48 digest bytes per chunk travel onward,
    payloads never shuffle.
    """

    def digest(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            payloads = batch.column("bytes")
            o_id, o_p, o_n, o_s, o_a, o_jv = [], [], [], [], [], []
            for j in range(batch.num_rows):
                try:
                    buf = memoryview(payloads[j].as_buffer())
                except (AttributeError, TypeError):
                    continue
                dec = _decode_any(buf)
                if dec is None:
                    continue
                sig, sr = dec
                v = np.round(
                    sig.astype(np.float64) * 32767.0).astype(np.int64)
                win = max(1, sr * chunk_ms // 1000)
                for p in range(0, (len(v) + win - 1) // win):
                    c = v[p * win:(p + 1) * win]
                    o_id.append(ids[j])
                    o_p.append(p)
                    o_n.append(len(c))
                    o_s.append(int(c.sum()))
                    o_a.append(int(np.abs(c).sum()))
                    o_jv.append(int(
                        (np.arange(len(c), dtype=np.int64) * c).sum()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_id, pa.string()),
                 pa.array(o_p, pa.int64()),
                 pa.array(o_n, pa.int64()),
                 pa.array(o_s, pa.int64()),
                 pa.array(o_a, pa.int64()),
                 pa.array(o_jv, pa.int64())],
                ["clip_id", "chunk_idx", "n_samples", "pcm_sum",
                 "pcm_abs_sum", "pcm_jv_sum"])

    return clips.select("clip_id", "bytes").mapInArrow(
        digest,
        "clip_id string, chunk_idx long, n_samples long, pcm_sum long, "
        "pcm_abs_sum long, pcm_jv_sum long")
