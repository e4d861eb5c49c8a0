"""PCM decode + SNR invariant — the engine's only Python stage.

North-rule check (BASELINE.json input_hint): decoded PCM must match the
reference signal with SNR >= 30 dB ("allclose"). Container-agnostic:
PCM16 WAV decodes first; foreign payloads fall through to the real FLAC
codec (functions/flac.py), the big-endian Sun AU container
(functions/au.py), IFF-chunked AIFF (functions/aiff.py), and finally
IMA-ADPCM WAV (functions/adpcm.py — the compressed lossy codec; RIFF
magic but fmt tag 0x11), G.711 A-law WAV (functions/alaw.py, fmt
tag 6) and MS-ADPCM WAV (functions/msadpcm.py, fmt tag 2 — the second
compressed codec, 2-tap linear prediction) — each rejects foreign
payloads at its magic or format tag, so per-row dispatch costs a few
byte comparisons and the same invariant runs over any of the seven
formats. This is the one operator that genuinely cannot be a Column
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
from ..functions.adpcm import decode_adpcm_wav
from ..functions.aiff import decode_aiff
from ..functions.alaw import decode_alaw_wav
from ..functions.au import decode_au
from ..functions.flac import decode_flac
from ..functions.msadpcm import decode_msadpcm_wav

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


#: |v| at or below this is "near-silence" (~0.5% FS ≈ -46 dBFS)
SILENCE_THR = 164
#: |v| at or above this approaches the loudness ceiling (~0.73 FS) —
#: the fixture waveform peaks at 0.75 FS, so clean clips legitimately
#: graze it; real clipping detection would use 32767 exactly
CEILING_THR = 24000
#: amplitude histogram: 16 bins of width 4096 over [-32768, 32768)
HIST_BINS = 16
HIST_WIDTH = 4096


def pcm_scan(clips: DataFrame, threshold_db: float = SNR_THRESHOLD_DB,
             extra_cols: list[str] | None = None,
             emit_header: bool = False,
             emit_digest: bool = False,
             emit_profile: bool = False,
             emit_energy: bool = False,
             emit_runs: bool = False,
             emit_zcr: bool = False,
             emit_hfc: bool = False,
             emit_bits: bool = False,
             emit_cube: bool = False) -> DataFrame:
    """The ONE decode pass over the audio payload — every content-level
    check family is a column group off this single Arrow kernel, so a
    caller wanting SNR + header + sample-exact digests + amplitude
    profile pays exactly one scan of ``bytes`` and one container decode
    per clip (measured: a second scan of the binary column costs ~5.4s
    of a ~57s suite at local[12] on the 2M-clip fixture — see
    plans/suite.py:check_media).

    Always emitted: clip_id, extra_cols… (as string), snr_db double
    (null on decode failure), verdict (GREEN iff snr >= threshold).
    Optional groups, each computed from the same decoded buffer:

    - ``emit_header``  : riff_ok, hdr_sr_hz, data_bytes, payload_len —
      the 44-byte container probe (byte slicing, ~1µs/row).
    - ``emit_digest``  : n_samples, pcm_sum, pcm_abs_sum, pcm_jv_sum —
      order-sensitive exact int64 digests of the recovered int16
      lattice (see pcm_digest for the inversion argument). Null unless
      the clip passes the SNR gate.
    - ``emit_profile`` : n_samples, n_silence, n_ceiling, hist —
      near-silence / ceiling sample counts and the 16-bin amplitude
      histogram. Null unless GREEN.
    - ``emit_energy``  : pcm_sq_sum = sum v_j^2 (exact int64: |v| <=
      32767 so v^2 <= 2^30, overflow needs > 2^33 samples/clip) and
      pcm_peak = max |v_j| — the energy/peak pair behind dynamic-range
      (crest-factor) and DC-offset checks. Null unless GREEN.
    - ``emit_zcr``     : zcr = count of strict sign changes between
      adjacent samples (v_j * v_{j+1} < 0) and n_zero = count of exact
      zero samples — the zero-crossing-rate feature (speech/music/noise
      discrimination) as exact integers over the recovered lattice.
      Null unless GREEN.
    - ``emit_hfc``     : hfc = sum (v_j - v_{j-1})^2 over adjacent
      samples — the first-difference energy. Normalized by pcm_sq_sum
      it equals the spectrum-weighted mean of 4 sin^2(pi f / sr), i.e.
      a one-pass effective-bandwidth estimate (for a pure tone at f the
      ratio is exactly 4 sin^2(pi f / sr)); content band-limited far
      below the declared Nyquist — upsampled/re-encoded ingest — shows
      a tiny ratio. Exact int64 (|diff| <= 65534, so the sum overflows
      only past 2^31 samples/clip). Null unless GREEN.
    - ``emit_bits``    : or_abs = bitwise OR of |v_j| over the clip —
      the order/chunk-invariant fold behind effective-bit-depth QA
      (16-bit storage carrying 8-bit content has 8 trailing zero bits
      in every sample, hence in the OR). Null unless GREEN.
    - ``emit_cube``    : pcm_cube_sum = Σ v_j³ — the third-moment
      (asymmetry) digest behind polarity-inversion detection: negating
      the waveform negates it exactly while power/peak/ZCR features
      cannot see the flip. Exact int64 (|v|³ ≤ 3.52e13, overflow needs
      >2.6e5 full-scale samples/clip). Null unless GREEN.
    - ``emit_runs``    : silent-run structure over the active mask
      |v| > SILENCE_THR — lead_sil / trail_sil (leading/trailing silent
      sample counts; = n_samples when the whole clip is silent),
      n_act_runs (maximal active runs), max_sil_run (longest silent
      run anywhere). The trim/VAD curation inputs. Null unless GREEN.

    Scale shape is unchanged from snr_check: map-only mapInArrow over
    the source partitioning, zero-copy buffer views, only scalar results
    (~40-170 bytes/clip) travel onward — the payload never shuffles.
    """
    extra = list(extra_cols or [])
    emit_nsamp = (emit_digest or emit_profile or emit_energy or emit_runs
                  or emit_zcr or emit_hfc or emit_bits or emit_cube)
    in_cols = ["clip_id", "bytes", "dur_ms", *extra]
    schema_parts = (
        ["clip_id string"]
        + [f"{c} string" for c in extra]
        + ["snr_db double", "verdict string"])
    if emit_header:
        schema_parts.append(
            "riff_ok boolean, hdr_sr_hz bigint, data_bytes bigint, "
            "payload_len bigint")
    if emit_nsamp:
        schema_parts.append("n_samples long")
    if emit_digest:
        schema_parts.append("pcm_sum long, pcm_abs_sum long, pcm_jv_sum long")
    if emit_profile:
        schema_parts.append(
            "n_silence long, n_ceiling long, hist array<long>")
    if emit_energy:
        schema_parts.append("pcm_sq_sum long, pcm_peak long")
    if emit_runs:
        schema_parts.append(
            "lead_sil long, trail_sil long, n_act_runs long, "
            "max_sil_run long")
    if emit_zcr:
        schema_parts.append("zcr long, n_zero long")
    if emit_hfc:
        schema_parts.append("hfc long")
    if emit_bits:
        schema_parts.append("or_abs long")
    if emit_cube:
        schema_parts.append("pcm_cube_sum long")
    out_schema = ", ".join(schema_parts)

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            ids = batch.column("clip_id").to_pylist()
            payloads = batch.column("bytes")
            durs = batch.column("dur_ms").to_pylist()
            snrs = np.full(n, np.nan)
            hdr = ([], [], [], []) if emit_header else None
            nsamp = np.full(n, -1, dtype=np.int64)
            dsum = np.zeros(n, dtype=np.int64)
            dabs = np.zeros(n, dtype=np.int64)
            djv = np.zeros(n, dtype=np.int64)
            nsil = np.zeros(n, dtype=np.int64)
            ncap = np.zeros(n, dtype=np.int64)
            sqs = np.zeros(n, dtype=np.int64)
            peaks = np.zeros(n, dtype=np.int64)
            leads = np.zeros(n, dtype=np.int64)
            trails = np.zeros(n, dtype=np.int64)
            actruns = np.zeros(n, dtype=np.int64)
            silruns = np.zeros(n, dtype=np.int64)
            zcrs = np.zeros(n, dtype=np.int64)
            nzeros = np.zeros(n, dtype=np.int64)
            hfcs = np.zeros(n, dtype=np.int64)
            orabs = np.zeros(n, dtype=np.int64)
            cubes = np.zeros(n, dtype=np.int64)
            hists: list[list[int] | None] = [] if emit_profile else None
            for j in range(n):
                buf = None
                try:
                    buf = memoryview(payloads[j].as_buffer())
                except (AttributeError, TypeError):
                    pass  # null payload: scalar lacks as_buffer
                if emit_header:
                    riff, hsr, dbytes = _probe_wav_header(buf)
                    hdr[0].append(riff)
                    hdr[1].append(hsr)
                    hdr[2].append(dbytes)
                    hdr[3].append(None if buf is None else len(buf))
                if emit_profile:
                    hists.append(None)
                if buf is None:
                    continue
                try:
                    try:
                        decoded, sr = decode_wav_pcm16(buf)
                    except (ValueError, struct.error):
                        try:
                            # second container: real FLAC decode (checksums
                            # enforced); rejects non-fLaC instantly at magic
                            decoded, sr = decode_flac(bytes(buf))
                        except (ValueError, struct.error):
                            try:
                                # third container: big-endian Sun AU
                                # (functions/au.py); rejects at magic too
                                decoded, sr = decode_au(buf)
                            except (ValueError, struct.error):
                                try:
                                    # fourth container: IFF-chunked AIFF
                                    # with the 80-bit-float rate
                                    # (functions/aiff.py)
                                    decoded, sr = decode_aiff(buf)
                                except (ValueError, struct.error):
                                    try:
                                        # fifth: IMA-ADPCM WAV — the
                                        # compressed lossy codec
                                        # (functions/adpcm.py); RIFF
                                        # but fmt tag 0x11
                                        decoded, sr = decode_adpcm_wav(
                                            buf)
                                    except (ValueError, struct.error):
                                        try:
                                            # sixth: G.711 A-law WAV
                                            # (functions/alaw.py,
                                            # fmt 6) — µ-law's sibling
                                            decoded, sr = \
                                                decode_alaw_wav(buf)
                                        except (ValueError,
                                                struct.error):
                                            # seventh: MS-ADPCM WAV
                                            # (functions/msadpcm.py,
                                            # fmt 2) — the 2nd
                                            # compressed codec
                                            decoded, sr = \
                                                decode_msadpcm_wav(buf)
                    dur = int(durs[j]) if durs[j] is not None else 100
                    ref = reference_signal(ids[j], sr, dur)
                    snrs[j] = snr_db(ref, decoded)
                except (ValueError, struct.error):
                    continue  # malformed payload stays RED / null snr
                if emit_nsamp and snrs[j] >= threshold_db:
                    # recover the exact int16 lattice points: decode
                    # yields i/32767 in float32, whose float64x32767
                    # round-trip error is << 0.5 LSB, so round() is
                    # exact inversion for every |i| <= 32767
                    v = np.round(
                        decoded.astype(np.float64) * 32767.0
                    ).astype(np.int64)
                    nsamp[j] = len(v)
                    if emit_digest:
                        dsum[j] = int(v.sum())
                        dabs[j] = int(np.abs(v).sum())
                        djv[j] = int(
                            (np.arange(len(v), dtype=np.int64) * v).sum())
                    if emit_profile:
                        av = np.abs(v)
                        nsil[j] = int((av <= SILENCE_THR).sum())
                        ncap[j] = int((av >= CEILING_THR).sum())
                        hists[j] = np.bincount(
                            (v + 32768) // HIST_WIDTH,
                            minlength=HIST_BINS).tolist()
                    if emit_energy:
                        sqs[j] = int((v * v).sum())
                        peaks[j] = int(np.abs(v).max()) if len(v) else 0
                    if emit_zcr:
                        zcrs[j] = int((v[1:].astype(np.int64)
                                       * v[:-1] < 0).sum()) if len(v) > 1 else 0
                        nzeros[j] = int((v == 0).sum())
                    if emit_hfc:
                        d = np.diff(v)
                        hfcs[j] = int((d * d).sum()) if len(v) > 1 else 0
                    if emit_bits:
                        orabs[j] = (int(np.bitwise_or.reduce(np.abs(v)))
                                    if len(v) else 0)
                    if emit_cube:
                        # exact int64: |v|^3 <= 3.52e13, so the sum
                        # overflows only past ~2.6e5 samples/clip at
                        # full scale (fixture max ~9.8e4)
                        cubes[j] = int((v * v * v).sum())
                    if emit_runs:
                        act = np.abs(v) > SILENCE_THR
                        idx = np.flatnonzero(act)
                        if len(idx) == 0:
                            leads[j] = trails[j] = silruns[j] = len(v)
                            actruns[j] = 0
                        else:
                            leads[j] = int(idx[0])
                            trails[j] = int(len(v) - 1 - idx[-1])
                            # a new active run starts wherever the gap
                            # to the previous active index exceeds 1
                            gaps = np.diff(idx) - 1
                            actruns[j] = 1 + int((gaps > 0).sum())
                            inner = int(gaps.max()) if len(gaps) else 0
                            silruns[j] = max(int(leads[j]),
                                             int(trails[j]), inner)
            ok = snrs >= threshold_db  # NaN compares False -> RED
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
                names += ["riff_ok", "hdr_sr_hz", "data_bytes",
                          "payload_len"]
            mask = nsamp >= 0
            if emit_nsamp:
                arrays.append(pa.array(np.where(mask, nsamp, 0), pa.int64(),
                                       mask=~mask))
                names.append("n_samples")
            if emit_digest:
                arrays += [pa.array(dsum, pa.int64(), mask=~mask),
                           pa.array(dabs, pa.int64(), mask=~mask),
                           pa.array(djv, pa.int64(), mask=~mask)]
                names += ["pcm_sum", "pcm_abs_sum", "pcm_jv_sum"]
            if emit_profile:
                arrays += [pa.array(nsil, pa.int64(), mask=~mask),
                           pa.array(ncap, pa.int64(), mask=~mask),
                           pa.array(hists, pa.list_(pa.int64()))]
                names += ["n_silence", "n_ceiling", "hist"]
            if emit_energy:
                arrays += [pa.array(sqs, pa.int64(), mask=~mask),
                           pa.array(peaks, pa.int64(), mask=~mask)]
                names += ["pcm_sq_sum", "pcm_peak"]
            if emit_runs:
                arrays += [pa.array(leads, pa.int64(), mask=~mask),
                           pa.array(trails, pa.int64(), mask=~mask),
                           pa.array(actruns, pa.int64(), mask=~mask),
                           pa.array(silruns, pa.int64(), mask=~mask)]
                names += ["lead_sil", "trail_sil", "n_act_runs",
                          "max_sil_run"]
            if emit_zcr:
                arrays += [pa.array(zcrs, pa.int64(), mask=~mask),
                           pa.array(nzeros, pa.int64(), mask=~mask)]
                names += ["zcr", "n_zero"]
            if emit_hfc:
                arrays.append(pa.array(hfcs, pa.int64(), mask=~mask))
                names.append("hfc")
            if emit_bits:
                arrays.append(pa.array(orabs, pa.int64(), mask=~mask))
                names.append("or_abs")
            if emit_cube:
                arrays.append(pa.array(cubes, pa.int64(), mask=~mask))
                names.append("pcm_cube_sum")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return clips.select(*in_cols).mapInArrow(scan, out_schema)


def snr_check(clips: DataFrame, threshold_db: float = SNR_THRESHOLD_DB,
              extra_cols: list[str] | None = None,
              emit_header: bool = False) -> DataFrame:
    """Per-clip SNR vs the regenerated reference signal.

    Output: clip_id, extra_cols..., snr_db double, verdict (GREEN if
    snr >= threshold, RED otherwise — decode failures are RED with
    snr_db = null). With ``emit_header`` the stage also returns the
    container header fields it parses anyway (riff_ok, hdr_sr_hz,
    data_bytes, payload_len) so a fused caller gets header integrity
    from the same single pass over the audio payload. Thin facade over
    :func:`pcm_scan` — the north-rule check (BASELINE.json input_hint)
    with no content column groups.
    """
    return pcm_scan(clips, threshold_db, extra_cols,
                    emit_header=emit_header)


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


def pcm_digest(clips: DataFrame,
               threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Sample-exact integer digest of every clip's decoded PCM stream.

    The strongest form of the north-rule "decoded-PCM allclose" invariant
    (BASELINE.json input_hint): instead of banding the error into an SNR
    verdict, this emits order-sensitive integer aggregates over the
    decoded 16-bit samples themselves —

    - ``n_samples``     count of decoded samples
    - ``pcm_sum``       sum v_j        (signed sample sum)
    - ``pcm_abs_sum``   sum |v_j|      (magnitude content)
    - ``pcm_jv_sum``    sum j*v_j      (position-weighted: permutation- and
                                        shift-sensitive, so any reorder,
                                        truncation, or off-by-one in the
                                        decode changes it)

    all in exact int64 arithmetic, so an independent engine that recomputes
    the reference waveform analytically must reproduce them bit-for-bit on
    clean clips (the oracle does exactly that in pure SQL trigonometry —
    registry.py q_pcm_content_exact — after cross-engine float-pipeline
    pinning: float64 sin args, float32 cast, float32x32767 multiply,
    round-half-even). A match proves the container decode is sample-exact,
    not merely within 30 dB. Clips failing the SNR gate (planted noise,
    undecodable bytes) are classified RED here and carry null digests: the
    noise is numpy-PCG-generated and deliberately not SQL-derivable.

    Facade over :func:`pcm_scan` (one decode pass; reference per-case
    expected outputs, internal/dirtytesting): map-only ``mapInArrow``,
    zero-copy buffer views, payload never shuffles; only ~40 bytes/clip
    of digest travel onward. At 10^12 clips the digest table is
    groupBy-able on clip_id with ordinary hash aggregation.
    """
    return pcm_scan(clips, threshold_db, emit_digest=True).select(
        "clip_id", "verdict", "n_samples", "pcm_sum", "pcm_abs_sum",
        "pcm_jv_sum")


def pcm_amplitude_profile(clips: DataFrame,
                          extra_cols: list[str] | None = None,
                          threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Amplitude-domain profile of every clip's decoded PCM stream:
    near-silence and ceiling-proximity sample counts plus a 16-bin
    amplitude histogram — the content-level inputs for silence/clipping
    curation filters and decoded-waveform distribution drift.

    All outputs are exact integer counts over the recovered int16
    lattice (same inversion as ``pcm_digest``), so the DuckDB oracle
    reproduces them bit-for-bit from pure SQL trigonometry: bin =
    (v + 32768) // 4096, thresholds compared on identical integers.
    Clips failing the SNR gate are RED with null counts (planted noise
    is not SQL-derivable), and the gate itself is cross-checked by the
    oracle's closed-form corrupt set.

    Facade over :func:`pcm_scan` (one decode pass). Map-only Arrow
    stage; per clip only ~20 integers travel onward, the payload never
    shuffles. At 10^12 clips the histogram aggregates map-side into
    |codec|x16 rows.
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_profile=True).select(
        "clip_id", *extra, "verdict", "n_samples", "n_silence",
        "n_ceiling", "hist")


def pcm_energy_profile(clips: DataFrame,
                       extra_cols: list[str] | None = None,
                       threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Energy-domain profile of every clip's decoded PCM stream: the
    exact-integer inputs for dynamic-range (crest-factor) and DC-offset
    validation — two classic recording-defect checks a training pipeline
    runs before audio enters a corpus (hard-limited audio has crest ≈ 1,
    a miscalibrated ADC shows |mean| ≫ 0).

    Emits per clip: n_samples, pcm_sum (Σv, the DC numerator),
    pcm_sq_sum (Σv², the RMS numerator), pcm_peak (max |v|) — all exact
    int64 over the recovered int16 lattice (same inversion as
    ``pcm_digest``), so downstream crest/DC classification can stay in
    integer arithmetic and a DuckDB oracle reproduces every band count
    bit-for-bit from pure SQL trigonometry. RED clips carry nulls.

    Facade over :func:`pcm_scan` (one decode pass, map-only Arrow; ~36
    bytes/clip travel onward, the payload never shuffles). At 10^12
    clips the profile aggregates map-side into |codec| rows.
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_digest=True, emit_energy=True).select(
        "clip_id", *extra, "verdict", "n_samples", "pcm_sum",
        "pcm_sq_sum", "pcm_peak")


def pcm_silence_runs(clips: DataFrame,
                     extra_cols: list[str] | None = None,
                     threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Silent-run structure of every clip's decoded PCM stream — the
    trim/VAD curation inputs: leading/trailing silence lengths (audio
    that should have been trimmed before ingest), the count of maximal
    active runs (a coarse speech-activity segment count), and the
    longest silent run anywhere (dead air inside a clip).

    The active mask is |v| > SILENCE_THR on the recovered int16 lattice
    (same inversion as ``pcm_digest``), so every output is an exact
    integer a DuckDB oracle reproduces with islands-and-gaps SQL over
    the analytic per-sample twin. RED clips carry nulls.

    Facade over :func:`pcm_scan` (one decode pass, map-only Arrow; ~44
    bytes/clip travel onward, the payload never shuffles).
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_runs=True).select(
        "clip_id", *extra, "verdict", "n_samples", "lead_sil",
        "trail_sil", "n_act_runs", "max_sil_run")


def pcm_zcr_profile(clips: DataFrame,
                    extra_cols: list[str] | None = None,
                    threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Zero-crossing profile of every clip's decoded PCM stream — the
    classic spectral-coarseness feature (speech vs music vs wideband
    noise discrimination, and a cheap detector for sign-flipped or
    byte-swapped ingest, which roughly doubles the crossing rate).

    Emits per clip: n_samples, zcr = count of STRICT sign changes
    between adjacent samples (v_j · v_{j+1} < 0 — a run through exact
    zero is not a crossing, distinguishing this from the sign-flag
    definition in :func:`multimodal.audio_features`), and n_zero =
    count of exact zero samples. All exact int64 over the recovered
    int16 lattice, so a DuckDB oracle reproduces every value from pure
    SQL trigonometry. RED clips carry nulls.

    Facade over :func:`pcm_scan` (one decode pass, map-only Arrow; ~36
    bytes/clip travel onward, the payload never shuffles). At 10^12
    clips the downstream profile aggregates map-side into |codec| rows.
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_zcr=True).select(
        "clip_id", *extra, "verdict", "n_samples", "zcr", "n_zero")


def pcm_bandwidth_profile(clips: DataFrame,
                          extra_cols: list[str] | None = None,
                          threshold_db: float = SNR_THRESHOLD_DB
                          ) -> DataFrame:
    """Effective-bandwidth profile of every clip's decoded PCM stream —
    the upsample/re-encode detector: content whose spectrum sits far
    below the declared Nyquist (an 8 kHz phone recording stored as a
    48 kHz clip, or a low-bitrate transcode) is flagged before it
    inflates a training corpus with empty bandwidth.

    Emits per clip: n_samples, hfc = Σ(v_j − v_{j-1})² (first-difference
    energy) and pcm_sq_sum = Σv². Their ratio is the spectrum-weighted
    mean of 4·sin²(π·f/sr) — exactly 4·sin²(π·f/sr) for a pure tone —
    so ``hfc·10⁴ DIV Σv²`` is a fixed-point effective-bandwidth
    occupancy that downstream banding keeps in pure int64 (f_eff <
    Nyquist/4 ⇔ ratio < 4·sin²(π/8) ⇔ fp < 5858), and a DuckDB oracle
    reproduces every band count bit-for-bit from the analytic
    per-sample twin. RED clips carry nulls.

    Facade over :func:`pcm_scan` (one decode pass, map-only Arrow; ~28
    bytes/clip travel onward, the payload never shuffles). At 10^12
    clips the profile aggregates map-side into |codec| rows.
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_energy=True, emit_hfc=True).select(
        "clip_id", *extra, "verdict", "n_samples", "pcm_sq_sum", "hfc")


def pcm_bit_depth(clips: DataFrame,
                  extra_cols: list[str] | None = None,
                  threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Effective-bit-depth profile of every clip's decoded PCM stream —
    the fake-bit-depth detector: audio quantized at 8 bits upstream and
    re-encoded as 16-bit PCM leaves the low 8 bits of every sample
    zero, so a corpus paying 16-bit storage for 8-bit content is
    flagged before training (the audio twin of d3rty's
    "declared type wider than the information" coercion family,
    internal/decoder/decoder.go's number narrowing).

    Emits per clip: n_samples and or_abs = bitwise-OR of |v_j| over the
    recovered int16 lattice (same inversion as ``pcm_digest``). The OR
    fold is order- and chunk-invariant, so a DuckDB oracle reproduces
    it bit-for-bit with ``bit_or(abs(v))`` over the analytic per-sample
    twin; effective bit depth = 16 − ctz(or_abs) then stays in pure
    integer Column arithmetic on both sides (ctz via
    bit_count((x & −x) − 1)). RED clips carry nulls.

    Facade over :func:`pcm_scan` (one decode pass, map-only Arrow; ~20
    bytes/clip travel onward, the payload never shuffles). At 10^12
    clips the downstream roll-up ORs map-side into |codec| rows.
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_bits=True).select(
        "clip_id", *extra, "verdict", "n_samples", "or_abs")


def pcm_polarity(clips: DataFrame,
                 extra_cols: list[str] | None = None,
                 threshold_db: float = SNR_THRESHOLD_DB) -> DataFrame:
    """Waveform-asymmetry (polarity) profile of every clip's decoded PCM
    stream — the inverted-polarity ingest detector: flipping a signal's
    sign (a miswired balanced cable, a resampler bug) negates the third
    moment Σv³ exactly while leaving power, peak, RMS, ZCR, and
    histogram-magnitude features untouched. Asymmetric sources (speech
    is asymmetric; so is this fixture's phase-offset harmonic stack)
    carry a stable per-clip skew sign, so a sub-population whose sign
    disagrees with its codec's fleet is flagged before training.

    Emits per clip: n_samples, pcm_sum (first moment, the DC tell) and
    pcm_cube_sum = Σv³ — exact int64 over the recovered int16 lattice
    (|v|³ ≤ 3.52e13 ⇒ overflow needs >2.6e5 full-scale samples/clip;
    the fixture peaks at 9.8e4), so a DuckDB oracle reproduces every
    value from pure SQL trigonometry. RED clips carry nulls.

    Facade over :func:`pcm_scan` (one decode pass, map-only Arrow; ~28
    bytes/clip travel onward, the payload never shuffles). At 10^12
    clips the downstream sign roll-up aggregates map-side into |codec|
    rows.
    """
    extra = list(extra_cols or [])
    return pcm_scan(clips, threshold_db, extra,
                    emit_digest=True, emit_cube=True).select(
        "clip_id", *extra, "verdict", "n_samples", "pcm_sum",
        "pcm_cube_sum")
