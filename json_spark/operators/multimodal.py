"""Multimodal-column operators: opaque binary payloads + typed metadata.

The brief's multimodal requirement: treat image/audio/video as opaque
``binary`` columns, with decode / feature-extract / resize / frame-sample
implemented as Arrow-batched stages. The container ships no media
libraries, so:

- WAV/PCM (the fixture codec) is decoded for real (fixtures/signal.py);
- FLAC is decoded for real too — the pure-Python verbatim-subframe codec
  in functions/flac.py (CRC-8/CRC-16/MD5 enforced);
- IMA ADPCM (WAV fmt 0x11) is the real COMPRESSED lossy path at 4.1:1 —
  functions/adpcm.py, lockstep-vectorized block codec (plus Sun AU /
  AIFF containers and G.711 µ-law in functions/au.py, aiff.py);
- only genuinely external codecs (opus/mp3) route through
  :func:`decode_external`, which uses a real codec library when one is
  importable and otherwise raises ``NotImplementedError`` — callers
  choose between failing the row (verdict RED) or the deterministic
  fake used by the feature stages so the Spark-side plumbing (schema,
  partitioning, batch shape) stays fully exercised and tested.

Scale shape: every stage is ``mapInArrow`` map-only over the source
partitioning — payload bytes never shuffle; outputs are scalar features
or bounded frame samples. Feature math is numpy-vectorized per clip.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..fixtures.signal import decode_wav_pcm16
from ..functions.aiff import parse_aiff_header
from ..functions.au import parse_au_header
from ..functions.flac import decode_flac, parse_flac_streaminfo

def _pcm16_wav_ints(wav: memoryview) -> tuple[np.ndarray, int]:
    """Raw int16 samples + sample rate of a canonical PCM16-mono WAV.

    The transcode sources must VALIDATE before ``frombuffer`` (r4
    ADVICE): without the RIFF/fmt-tag/bits gate, an already-transcoded
    A-law/ADPCM WAV — or arbitrary >=44-byte binary — would be silently
    re-encoded as garbage. Raising ValueError routes foreign payloads
    into each transcode's existing except → null pass-through, the same
    stance ``decode_wav_pcm16`` takes for the decode path.
    """
    if len(wav) < 44 or wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_tag, channels, sr = struct.unpack("<HHI", wav[20:28])
    bits = struct.unpack("<H", wav[34:36])[0]
    if fmt_tag != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported wav layout: fmt={fmt_tag} ch={channels} bits={bits}")
    n_bytes = struct.unpack("<I", wav[40:44])[0]
    return np.frombuffer(wav[44:44 + n_bytes], dtype="<i2"), sr


MEDIA_META_SCHEMA = (
    "clip_id string, container string, sr_hz int, channels int, "
    "bits int, n_samples long, meta_dur_ms double"
)

AUDIO_FEATURES_SCHEMA = (
    "clip_id string, codec string, verdict string, decoded boolean, "
    "n_samples long, sum_v long, sum_sq long, peak_i long, n_zc long, "
    "rms double, peak double, zcr double"
)

FRAME_SAMPLE_SCHEMA = (
    "clip_id string, verdict string, frame_idx int, "
    "frame_n long, frame_ss long, frame_rms double"
)


def decode_external(payload: bytes, codec: str) -> np.ndarray:
    """Decode a non-WAV payload with a real codec library when present.

    The sandbox has no soundfile/librosa/ffmpeg, so this raises
    ``NotImplementedError`` here; on a production image the import
    succeeds and the same call path decodes for real.
    """
    try:  # pragma: no cover - library not present in this container
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"no decoder available for codec={codec!r} in this environment")
    import io
    data, _sr = soundfile.read(io.BytesIO(payload))  # pragma: no cover
    return np.asarray(data, dtype=np.float32)  # pragma: no cover


def _deterministic_fake(clip_id: str, n: int = 256) -> np.ndarray:
    """Deterministic stand-in signal for undecodable codecs: keyed on
    clip_id so re-runs and both sides of a comparison agree."""
    from ..fixtures.signal import reference_signal
    return reference_signal(clip_id, 8000, int(n * 1000 / 8000))


def _decode(clip_id: str, payload, codec: str) -> tuple[np.ndarray, bool]:
    """(signal, really_decoded). WAV and FLAC decode for real (the FLAC
    path is the pure-Python verbatim codec, functions/flac.py); other
    codecs try the external library, then fall back to the deterministic
    fake. A null payload (pyarrow null scalar: ``as_buffer()`` returns
    None on pyarrow>=16, raising TypeError from memoryview/bytes, NOT
    AttributeError) routes to the fake like any undecodable codec."""
    if payload is None or not payload.is_valid:
        return _deterministic_fake(clip_id), False
    try:
        sig, _sr = decode_wav_pcm16(memoryview(payload.as_buffer()))
        return sig, True
    except (ValueError, struct.error):
        pass
    try:
        sig, _sr = decode_flac(bytes(payload.as_buffer()))
        return sig, True
    except (ValueError, struct.error):
        pass
    try:
        from ..functions.adpcm import decode_adpcm_wav
        sig, _sr = decode_adpcm_wav(bytes(payload.as_buffer()))
        return sig, True
    except (ValueError, struct.error):
        pass
    try:
        from ..functions.msadpcm import decode_msadpcm_wav
        sig, _sr = decode_msadpcm_wav(bytes(payload.as_buffer()))
        return sig, True
    except (ValueError, struct.error):
        pass
    try:
        return decode_external(bytes(payload.as_buffer()), codec), True
    except NotImplementedError:
        return _deterministic_fake(clip_id), False


def extract_media_meta(clips: DataFrame) -> DataFrame:
    """Typed metadata from the binary container header (no full decode):
    container tag, sample rate, channels, bit depth, sample count, and the
    duration implied by the header — cheap per-row header peeks only."""

    def meta(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            payloads = batch.column("bytes")
            rows = {k: [] for k in ("container", "sr_hz", "channels", "bits",
                                    "n_samples", "meta_dur_ms")}
            for j in range(batch.num_rows):
                buf = (memoryview(payloads[j].as_buffer())
                       if payloads[j].is_valid else memoryview(b""))
                if len(buf) >= 44 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                    _fmt, ch, sr = struct.unpack("<HHI", buf[20:28])
                    bits = struct.unpack("<H", buf[34:36])[0]
                    n_bytes = struct.unpack("<I", buf[40:44])[0]
                    n_samp = n_bytes // max(1, (bits // 8) * ch)
                    rows["container"].append("wav")
                    rows["sr_hz"].append(sr)
                    rows["channels"].append(ch)
                    rows["bits"].append(bits)
                    rows["n_samples"].append(n_samp)
                    rows["meta_dur_ms"].append(1000.0 * n_samp / sr if sr else None)
                else:
                    try:
                        si = parse_flac_streaminfo(bytes(buf))
                        rows["container"].append("flac")
                        rows["sr_hz"].append(si["sr_hz"])
                        rows["channels"].append(si["channels"])
                        rows["bits"].append(si["bits"])
                        rows["n_samples"].append(si["n_samples"])
                        rows["meta_dur_ms"].append(
                            1000.0 * si["n_samples"] / si["sr_hz"]
                            if si["sr_hz"] else None)
                    except (ValueError, struct.error):
                        try:
                            au = parse_au_header(buf)
                            if au["encoding"] != 3:
                                raise ValueError("non-PCM16 AU")
                            n_samp = (au["data_size"]
                                      // max(1, 2 * au["channels"]))
                            rows["container"].append("au")
                            rows["sr_hz"].append(au["sample_rate"])
                            rows["channels"].append(au["channels"])
                            rows["bits"].append(16)
                            rows["n_samples"].append(n_samp)
                            rows["meta_dur_ms"].append(
                                1000.0 * n_samp / au["sample_rate"]
                                if au["sample_rate"] else None)
                        except (ValueError, struct.error):
                            try:
                                ai = parse_aiff_header(buf)
                                rows["container"].append("aiff")
                                rows["sr_hz"].append(ai["sample_rate"])
                                rows["channels"].append(ai["channels"])
                                rows["bits"].append(ai["sample_size"])
                                rows["n_samples"].append(ai["n_frames"])
                                rows["meta_dur_ms"].append(
                                    1000.0 * ai["n_frames"]
                                    / ai["sample_rate"]
                                    if ai["sample_rate"] else None)
                            except (ValueError, struct.error):
                                rows["container"].append("unknown")
                                for k in ("sr_hz", "channels", "bits",
                                          "n_samples", "meta_dur_ms"):
                                    rows[k].append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()),
                 pa.array(rows["container"], pa.string()),
                 pa.array(rows["sr_hz"], pa.int32()),
                 pa.array(rows["channels"], pa.int32()),
                 pa.array(rows["bits"], pa.int32()),
                 pa.array(rows["n_samples"], pa.int64()),
                 pa.array(rows["meta_dur_ms"], pa.float64())],
                ["clip_id", "container", "sr_hz", "channels", "bits",
                 "n_samples", "meta_dur_ms"])

    return clips.select("clip_id", "bytes").mapInArrow(meta, MEDIA_META_SCHEMA)


def audio_features(clips: DataFrame,
                   threshold_db: float = 30.0) -> DataFrame:
    """Per-clip features (rms, peak, zero-crossing rate) from the decoded
    signal; ``decoded=false`` marks rows served by the deterministic fake
    (codec library absent).

    Every feature is derived from EXACT integer digests of the recovered
    int16 lattice — ``n_samples``, ``sum_v`` (Σ v, the DC digest: a
    healthy converter centres on 0, a biased one shifts every sample),
    ``sum_sq`` (Σ v²), ``peak_i``
    (max |v|), ``n_zc`` (sign-change count) — with the float view
    (rms = sqrt(ss/n)/32767, peak = pk/32767, zcr = nzc/(n−1)) computed
    as single correctly-rounded IEEE ops, so an independent engine
    replaying the generator waveform in pure SQL reproduces every value
    bit-for-bit (registry.py q_multimodal_audio_features). A numpy float
    mean would not be replayable; the integer detour makes the feature
    set an oracle-checkable contract. ``verdict`` is the reference-SNR
    label (RED for noise plants and fake-decoded rows), letting
    oracle-gated consumers exclude rows whose samples are deliberately
    not SQL-derivable while distribution-level consumers (the rms-band
    noise detector) keep them.
    """
    import math

    from ..fixtures.signal import reference_signal, snr_db

    has_dur = "dur_ms" in clips.columns
    sel = ["clip_id", "codec", "bytes"] + (["dur_ms"] if has_dur else [])

    def feats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            durs = (batch.column("dur_ms").to_pylist() if has_dur
                    else [None] * batch.num_rows)
            payloads = batch.column("bytes")
            out = {k: [] for k in ("verdict", "decoded", "n_samples",
                                   "sum_v", "sum_sq", "peak_i", "n_zc",
                                   "rms", "peak", "zcr")}
            for j in range(batch.num_rows):
                sig, ok, sr = None, True, 8000
                try:
                    buf = memoryview(payloads[j].as_buffer())
                    try:
                        sig, sr = decode_wav_pcm16(buf)
                    except (ValueError, struct.error):
                        sig, sr = decode_flac(bytes(buf))
                except (ValueError, struct.error, AttributeError, TypeError):
                    sig = None
                if sig is None:
                    try:
                        sig = decode_external(
                            bytes(payloads[j].as_buffer()), codecs[j])
                    except (NotImplementedError, AttributeError, TypeError):
                        sig = _deterministic_fake(ids[j])
                        ok = False
                if ok:
                    dur = int(durs[j]) if durs[j] is not None else 100
                    try:
                        verd = ("GREEN" if snr_db(
                            reference_signal(ids[j], sr, dur), sig)
                            >= threshold_db else "RED")
                    except (ValueError, struct.error):
                        verd = "RED"
                else:
                    verd = "RED"
                v = np.round(
                    sig.astype(np.float64) * 32767.0).astype(np.int64)
                n = len(v)
                ss = int((v * v).sum())
                pk = int(np.abs(v).max()) if n else 0
                neg = v < 0
                nzc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
                out["verdict"].append(verd)
                out["decoded"].append(ok)
                out["n_samples"].append(n)
                out["sum_v"].append(int(v.sum()))  # DC digest (Σv exact)
                out["sum_sq"].append(ss)
                out["peak_i"].append(pk)
                out["n_zc"].append(nzc)
                out["rms"].append(
                    math.sqrt(ss / n) / 32767.0 if n else 0.0)
                out["peak"].append(pk / 32767.0)
                out["zcr"].append(nzc / (n - 1) if n > 1 else 0.0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(out["verdict"], pa.string()),
                 pa.array(out["decoded"], pa.bool_()),
                 pa.array(out["n_samples"], pa.int64()),
                 pa.array(out["sum_v"], pa.int64()),
                 pa.array(out["sum_sq"], pa.int64()),
                 pa.array(out["peak_i"], pa.int64()),
                 pa.array(out["n_zc"], pa.int64()),
                 pa.array(out["rms"], pa.float64()),
                 pa.array(out["peak"], pa.float64()),
                 pa.array(out["zcr"], pa.float64())],
                ["clip_id", "codec", "verdict", "decoded", "n_samples",
                 "sum_v", "sum_sq", "peak_i", "n_zc", "rms", "peak", "zcr"])

    return clips.select(*sel).mapInArrow(feats, AUDIO_FEATURES_SCHEMA)


FLAC_ROUNDTRIP_SCHEMA = (
    "codec string, decoded boolean, bit_exact boolean, "
    "n_samples long, flac_bytes long"
)


def flac_roundtrip(clips: DataFrame) -> DataFrame:
    """Transcode every clip's PCM to REAL FLAC and decode it back through
    the engine's pure-Python codec (functions/flac.py), reporting whether
    the decode succeeded and round-tripped bit-exactly plus the container
    sizes. Raw int16 samples move WAV→FLAC without a float round-trip, so
    ``bit_exact`` pins the whole container path (STREAMINFO, frame
    headers, CRC-8/CRC-16, MD5) — any structural bug flips it.

    Scale shape: map-only ``mapInArrow`` over the source partitioning;
    payload bytes never shuffle; output is 5 scalars per clip.
    """
    from ..functions.flac import encode_flac

    def rt(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            codecs = batch.column("codec").to_pylist()
            payloads = batch.column("bytes")
            o_dec, o_exact, o_n, o_sz = [], [], [], []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    blob = encode_flac(ints, sr)
                    sig, _sr2 = decode_flac(blob)
                    back = np.round(sig * 32767.0).astype(np.int16)
                    o_dec.append(True)
                    o_exact.append(bool(np.array_equal(back, ints)))
                    o_n.append(len(ints))
                    o_sz.append(len(blob))
                except (ValueError, struct.error, AttributeError, TypeError):
                    o_dec.append(False)
                    o_exact.append(False)
                    o_n.append(None)
                    o_sz.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(codecs, pa.string()),
                 pa.array(o_dec, pa.bool_()),
                 pa.array(o_exact, pa.bool_()),
                 pa.array(o_n, pa.int64()),
                 pa.array(o_sz, pa.int64())],
                ["codec", "decoded", "bit_exact", "n_samples", "flac_bytes"])

    return clips.select("codec", "bytes").mapInArrow(
        rt, FLAC_ROUNDTRIP_SCHEMA)


def frame_sample(clips: DataFrame, frame_ms: int = 25,
                 max_frames: int = 8,
                 threshold_db: float = 30.0) -> DataFrame:
    """Frame sampling: split each decoded clip into ``frame_ms`` windows
    and emit up to ``max_frames`` evenly-spaced frames — the audio
    analogue of video frame-sampling (bounded fan-out per row).

    Per frame this emits EXACT integer digests of the recovered int16
    lattice — ``frame_n`` (sample count) and ``frame_ss`` (sum of
    squares) — and derives ``frame_rms`` from them with a single
    correctly-rounded divide + sqrt, so an independent engine replaying
    the generator waveform in pure SQL reproduces every value
    bit-for-bit (registry.py q_multimodal_frame_sample). A float mean
    over the samples (numpy's pairwise summation) would NOT be
    SQL-replayable; the integer detour is what makes the frame energy an
    oracle-checkable contract. ``verdict`` is the reference-SNR label:
    noise-planted clips keep their frames but are flagged RED so
    oracle-gated consumers can exclude them (the PCG noise is
    deliberately not SQL-derivable). Undecodable payloads yield no
    frames. The frame grid is sized from the DECODED container rate (==
    the ``sr_hz`` metadata column for every fixture clip, making the
    grid closed-form). Map-only ``mapInArrow``: the payload never
    shuffles, only ~40 bytes/frame travel onward.
    """
    import math

    from ..fixtures.signal import reference_signal, snr_db

    has_dur = "dur_ms" in clips.columns
    sel = ["clip_id", "bytes"] + (["dur_ms"] if has_dur else [])

    def frames(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            durs = (batch.column("dur_ms").to_pylist() if has_dur
                    else [None] * batch.num_rows)
            payloads = batch.column("bytes")
            o_id, o_verd, o_idx, o_n, o_ss, o_rms = [], [], [], [], [], []
            for j in range(batch.num_rows):
                try:
                    buf = memoryview(payloads[j].as_buffer())
                    try:
                        sig, sr = decode_wav_pcm16(buf)
                    except (ValueError, struct.error):
                        sig, sr = decode_flac(bytes(buf))
                except (ValueError, struct.error, AttributeError, TypeError):
                    continue  # undecodable / null payload: no frames
                dur = int(durs[j]) if durs[j] is not None else 100
                ref = reference_signal(ids[j], sr, dur)
                verd = ("GREEN" if snr_db(ref, sig) >= threshold_db
                        else "RED")
                # exact int16 lattice recovery (see pcm_scan: the
                # i/32767 float32 round-trip error is << 0.5 LSB)
                v = np.round(
                    sig.astype(np.float64) * 32767.0).astype(np.int64)
                win = max(1, sr * frame_ms // 1000)
                n_frames = max(1, len(v) // win)
                take = np.unique(np.linspace(
                    0, n_frames - 1, min(max_frames, n_frames)).astype(int))
                for fi in take:
                    fr = v[fi * win:(fi + 1) * win]
                    ss = int((fr * fr).sum())
                    o_id.append(ids[j])
                    o_verd.append(verd)
                    o_idx.append(int(fi))
                    o_n.append(len(fr))
                    o_ss.append(ss)
                    o_rms.append(math.sqrt(ss / len(fr)) if len(fr) else 0.0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_id, pa.string()), pa.array(o_verd, pa.string()),
                 pa.array(o_idx, pa.int32()), pa.array(o_n, pa.int64()),
                 pa.array(o_ss, pa.int64()), pa.array(o_rms, pa.float64())],
                ["clip_id", "verdict", "frame_idx", "frame_n", "frame_ss",
                 "frame_rms"])

    return clips.select(*sel).mapInArrow(frames, FRAME_SAMPLE_SCHEMA)


DOMINANT_FREQ_SCHEMA = (
    "clip_id string, codec string, dominant_hz double, bin_hz double"
)


def dominant_freq(clips: DataFrame) -> DataFrame:
    """Per-clip dominant frequency via rFFT argmax (DC bin excluded) —
    the audio-content invariant: a synth/TTS corpus can be validated
    against the pitch its generator contract implies. Vectorized numpy
    per clip inside a map-only Arrow stage; emits the bin width so
    callers can form a resolution-aware tolerance. Undecodable payloads
    yield null ``dominant_hz``.
    """

    def freqs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            payloads = batch.column("bytes")
            dom, binw = [], []
            for j in range(batch.num_rows):
                try:
                    # AttributeError: a NULL bytes value has no
                    # as_buffer(); nulls are undecodable like any other
                    # bad payload and must not kill the Arrow task
                    sig, sr = decode_wav_pcm16(
                        memoryview(payloads[j].as_buffer()))
                except (ValueError, struct.error, AttributeError, TypeError):
                    dom.append(None)
                    binw.append(None)
                    continue
                n = len(sig)
                if n < 2:
                    dom.append(None)
                    binw.append(None)
                    continue
                spec = np.abs(np.fft.rfft(sig.astype(np.float64)))
                k = int(np.argmax(spec[1:])) + 1
                dom.append(k * sr / n)
                binw.append(sr / n)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(dom, pa.float64()), pa.array(binw, pa.float64())],
                ["clip_id", "codec", "dominant_hz", "bin_hz"])

    return clips.select("clip_id", "codec", "bytes").mapInArrow(
        freqs, DOMINANT_FREQ_SCHEMA)


SPECTRAL_FLATNESS_SCHEMA = (
    "clip_id string, codec string, flatness double, n_bins long"
)


def spectral_flatness(clips: DataFrame) -> DataFrame:
    """Per-clip spectral flatness (Wiener entropy): geometric mean /
    arithmetic mean of the rFFT power spectrum, DC excluded. Tonal
    content (the generator's 3-harmonic contract) concentrates power in
    a few bins -> flatness near 0; broadband noise spreads it evenly ->
    flatness near the white-noise e^-gamma ~ 0.56. On the fixture the
    planted uniform-noise corruption sits >= 0.095 while every clean
    clip sits <= 0.016 (exhaustive over the first 4000 rendered rows),
    so the 0.04 log-midpoint threshold splits them with a 6x gap — the
    spectrum-SHAPE sibling of the RMS loudness band (audio_features),
    catching equal-power corruptions RMS alone cannot.

    Undecodable/null payloads yield null flatness (same stance as
    ``dominant_freq``). Scale shape: map-only Arrow stage over the
    source partitioning, payload never shuffles, 2 scalars out per clip.
    """

    def flat(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            payloads = batch.column("bytes")
            fl, nb = [], []
            for j in range(batch.num_rows):
                try:
                    sig, _sr = decode_wav_pcm16(
                        memoryview(payloads[j].as_buffer()))
                except (ValueError, struct.error, AttributeError, TypeError):
                    fl.append(None)
                    nb.append(None)
                    continue
                n = len(sig)
                if n < 4:
                    fl.append(None)
                    nb.append(None)
                    continue
                p = np.abs(np.fft.rfft(sig.astype(np.float64))) ** 2
                p = p[1:]
                eps = 1e-20
                g = float(np.exp(np.mean(np.log(p + eps))))
                a = float(np.mean(p)) + eps
                fl.append(g / a)
                nb.append(len(p))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(fl, pa.float64()), pa.array(nb, pa.int64())],
                ["clip_id", "codec", "flatness", "n_bins"])

    return clips.select("clip_id", "codec", "bytes").mapInArrow(
        flat, SPECTRAL_FLATNESS_SCHEMA)


def le32(bytes_col: Column, pos: int) -> Column:
    """Little-endian uint32 read from a binary column at 1-based ``pos``.

    Stays entirely JVM-side: slice 4 bytes, hex them, byte-swap by string
    surgery, base-16 → base-10. Cheap (8 hex chars per row) and codegen-able,
    unlike shipping the payload to a Python worker.
    """
    hx = F.hex(F.substring(bytes_col, pos, 4))
    swapped = F.concat(F.substring(hx, 7, 2), F.substring(hx, 5, 2),
                       F.substring(hx, 3, 2), F.substring(hx, 1, 2))
    return F.conv(swapped, 16, 10).cast("long")


def be_uint(bytes_col: Column, pos: int, n: int) -> Column:
    """Big-endian unsigned read of ``n`` bytes (n ≤ 8) at 1-based ``pos``
    from a binary column — hex + base-16 conv, pure codegen (see le32)."""
    return F.conv(F.hex(F.substring(bytes_col, pos, n)), 16, 10).cast("long")


def flac_header_columns(bytes_col: Column) -> dict[str, Column]:
    """FLAC STREAMINFO fields as pure Column expressions — the
    zero-Python header path for the second container (functions/flac.py
    holds the full Arrow-stage codec; this reads ONLY the 42 leading
    bytes). STREAMINFO is required first-block by the FLAC spec, so the
    offsets are fixed: magic 1-4, block header 5-8 (type 0, length 34),
    the packed sr/channels/bps/total-samples u64 at bytes 19-26.

    ``hdr_sr_hz`` stays a signed-long shift: sample rates are 20 bits
    (< 2^19 for every real rate), so the packed top bit is 0 and the
    conv→long cast is lossless.
    """
    packed = be_uint(bytes_col, 19, 8)
    return {
        "flac_ok": (F.length(bytes_col) >= 42)
        & (F.substring(bytes_col, 1, 4) == F.lit(b"fLaC"))
        & ((be_uint(bytes_col, 5, 1).bitwiseAND(F.lit(127))) == 0)
        & (be_uint(bytes_col, 6, 3) == 34),
        "hdr_sr_hz": F.shiftrightunsigned(packed, 44),
        "channels": F.shiftrightunsigned(packed, 41).bitwiseAND(F.lit(7)) + 1,
        "bits": F.shiftrightunsigned(packed, 36).bitwiseAND(F.lit(31)) + 1,
        "n_samples": packed.bitwiseAND(F.lit((1 << 36) - 1)),
    }


def flac_header_verdicts() -> dict[str, Column]:
    """FLAC container checks as GREEN/YELLOW/RED verdict Columns for the
    streaming/batch rule surface (twin of :func:`wav_header_verdicts`):

    - ``bytes``: RED when the fLaC magic / STREAMINFO shape is missing or
      the payload is shorter than the verbatim-subframe lower bound
      (42 + 2·n_samples — valid for the engine's verbatim codec, which
      never compresses below raw), i.e. a truncated upload; GREEN else.
    - ``sr_hz``: YELLOW when the container is sound but STREAMINFO's rate
      contradicts the metadata column (recoverable by trusting the
      header); RED when unreadable; GREEN on agreement.
    """
    hdr = flac_header_columns(F.col("bytes"))
    container_ok = (hdr["flac_ok"]
                    & (F.length("bytes") >= 42 + 2 * hdr["n_samples"]))
    return {
        "bytes": F.when(container_ok, "GREEN").otherwise("RED"),
        "sr_hz": F.when(~hdr["flac_ok"], "RED")
        .when(hdr["hdr_sr_hz"] == F.col("sr_hz"), "GREEN")
        .otherwise("YELLOW"),
    }


def container_header_verdicts() -> dict[str, Column]:
    """Mixed-container rule set: dispatch per row on the magic bytes —
    RIFF payloads validate under the WAV rules, fLaC payloads under the
    FLAC rules, ``.snd`` payloads under the Sun AU rules, FORM/AIFF
    payloads under the AIFF rules, anything else is RED. One pure-Column
    CASE, so a stream (or batch table) carrying all four containers
    validates in a single rule surface with no Python stage."""
    wav = wav_header_verdicts()
    fl = flac_header_verdicts()
    au = au_header_verdicts()
    aiff = aiff_header_verdicts()
    is_wav = F.substring(F.col("bytes"), 1, 4) == F.lit(b"RIFF")
    is_flac = F.substring(F.col("bytes"), 1, 4) == F.lit(b"fLaC")
    is_au = F.substring(F.col("bytes"), 1, 4) == F.lit(b".snd")
    is_aiff = ((F.substring(F.col("bytes"), 1, 4) == F.lit(b"FORM"))
               & (F.substring(F.col("bytes"), 9, 4) == F.lit(b"AIFF")))
    return {
        col: (F.when(is_wav, wav[col]).when(is_flac, fl[col])
              .when(is_au, au[col]).when(is_aiff, aiff[col])
              .otherwise(F.lit("RED")))
        for col in ("bytes", "sr_hz")
    }


def metadata_consistency_verdicts() -> dict[str, Column]:
    """The cross-field checks of :func:`metadata_consistency` as bare
    GREEN/YELLOW/RED verdict Columns, shaped for the streaming rule
    surface (streaming_row_verdicts / streaming_windowed_verdicts) —
    pure Column byte surgery, so the streaming plan gains no Python
    stage and the batch and stream twins share one rule definition."""
    wav = wav_header_columns(F.col("bytes"))
    flc = flac_header_columns(F.col("bytes"))
    container = (F.when(wav["riff_ok"], "wav")
                 .when(flc["flac_ok"], "flac")
                 .otherwise("unknown"))
    hdr_sr = F.when(wav["riff_ok"], wav["hdr_sr_hz"]).otherwise(
        F.when(flc["flac_ok"], flc["hdr_sr_hz"]))
    n_samp = F.when(wav["riff_ok"],
                    F.floor(wav["data_bytes"] / F.lit(2))).otherwise(
        F.when(flc["flac_ok"], flc["n_samples"]))
    hdr_dur_ms = F.when(hdr_sr > 0, F.lit(1000.0) * n_samp / hdr_sr)
    expected_container = (F.when(F.col("codec") == "pcm_s16le", "wav")
                          .when(F.col("codec") == "flac", "flac")
                          .otherwise(F.lit("none")))
    return {
        "payload:container_vs_codec":
            F.when(container == "unknown", "YELLOW")
            .when(container == expected_container, "GREEN")
            .otherwise("RED"),
        "payload:dur_vs_header":
            F.when(hdr_dur_ms.isNull(), "YELLOW")
            .when(F.col("dur_ms").isNull(), "YELLOW")
            .when(F.abs(hdr_dur_ms - F.col("dur_ms"))
                  <= F.lit(1000.0) / hdr_sr, "GREEN")
            .otherwise("RED"),
    }


def repair_metadata(clips: DataFrame) -> DataFrame:
    """Fix-forward twin of :func:`metadata_consistency`: where a YELLOW/RED
    verdict means "recoverable by trusting the header", actually emit the
    recovery — the d3rty stance (coerce, don't reject;
    internal/dirtyjson/decoder.go's clean-first dirty-fallback) lifted to
    table repair:

    - ``dur_ms`` NULL with a parseable payload → the header-implied
      duration (rounded to whole ms);
    - ``codec`` contradicted by the container magic → the
      container-implied codec (RIFF/WAVE → pcm_s16le, fLaC → flac);
    - ``sr_hz`` contradicted by the header's fmt/STREAMINFO rate → the
      header rate (the exact recovery wav_header_verdicts' YELLOW names).

    Unparseable payloads repair nothing (there is no trusted side).
    Output keeps the clips schema with a ``repaired_fields``
    array<string> audit column (empty = untouched row). Pure Column
    expressions over one scan — map-only, payload never shuffles, so the
    repair pass composes with any downstream check at zero extra cost.
    """
    wav = wav_header_columns(F.col("bytes"))
    flc = flac_header_columns(F.col("bytes"))
    is_wav, is_flac = wav["riff_ok"], flc["flac_ok"]
    parsed = is_wav | is_flac
    hdr_sr = F.when(is_wav, wav["hdr_sr_hz"]).otherwise(
        F.when(is_flac, flc["hdr_sr_hz"]))
    n_samp = F.when(is_wav, F.floor(wav["data_bytes"] / F.lit(2))).otherwise(
        F.when(is_flac, flc["n_samples"]))
    hdr_dur = F.round(F.lit(1000.0) * n_samp / hdr_sr).cast("int")
    hdr_codec = F.when(is_wav, "pcm_s16le").otherwise(
        F.when(is_flac, "flac"))
    fix_dur = parsed & F.col("dur_ms").isNull() & (hdr_sr > 0)
    fix_codec = parsed & ~F.col("codec").eqNullSafe(hdr_codec)
    fix_sr = parsed & ~F.col("sr_hz").eqNullSafe(hdr_sr)
    other = [c for c in clips.columns
             if c not in ("dur_ms", "codec", "sr_hz")]
    return clips.select(
        *other,
        F.when(fix_dur, hdr_dur).otherwise(F.col("dur_ms")).alias("dur_ms"),
        F.when(fix_codec, hdr_codec).otherwise(F.col("codec")).alias("codec"),
        F.when(fix_sr, hdr_sr.cast("int")).otherwise(F.col("sr_hz"))
        .alias("sr_hz"),
        F.array_compact(F.array(
            F.when(fix_dur, "dur_ms"),
            F.when(fix_codec, "codec"),
            F.when(fix_sr, "sr_hz"))).alias("repaired_fields"),
    )


def metadata_consistency(clips: DataFrame,
                         group_cols: list[str] | None = None) -> DataFrame:
    """Declared-metadata vs payload cross-field consistency — the two
    checks :func:`wav_header_integrity` does NOT cover:

    - ``payload:container_vs_codec``: the container the magic bytes
      actually parse as (RIFF/WAVE → wav, fLaC STREAMINFO → flac) must be
      the one the ``codec`` column declares. A parseable payload that
      contradicts its declared codec is RED (the metadata lies about the
      bytes); an unparseable payload is YELLOW (unverifiable, not proven
      wrong) — the d3rty clean/dirty/fail ladder
      (internal/dirtyjson/result.go:4-18) applied to cross-field claims.
    - ``payload:dur_vs_header``: the duration implied by the header's own
      sample count must agree with the ``dur_ms`` column within one
      sample period at the header rate (the header quantizes duration to
      whole samples, so a tighter tolerance would flag rounding, not
      corruption). NULL ``dur_ms`` with a sound payload is YELLOW —
      recoverable by trusting the header, mirroring the reference's
      null-tolerant coercions (internal/dirtyjson/dirtytypes.go).

    Everything is pure Column byte surgery (hex/conv, whole-stage
    codegen): the payload never reaches Python and never shuffles — the
    only exchange is the map-combined counter aggregation, |groups| ×
    O(checks) rows. One scan serves both checks.
    """
    group_cols = group_cols if group_cols is not None else ["codec"]
    checks = metadata_consistency_verdicts()
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, v in enumerate(checks.values()):
        aggs.append(F.sum((v == "GREEN").cast("long")).alias(f"__g{i}"))
        aggs.append(F.sum((v == "YELLOW").cast("long")).alias(f"__y{i}"))
        aggs.append(F.sum((v == "RED").cast("long")).alias(f"__r{i}"))
    rolled = clips.groupBy(*group_cols).agg(*aggs)
    stack_args = ", ".join(f"'{name}', __g{i}, __y{i}, __r{i}"
                           for i, name in enumerate(checks))
    return rolled.selectExpr(
        *group_cols, "n_rows",
        f"stack({len(checks)}, {stack_args}) AS "
        "(check_name, n_green, n_yellow, n_red)",
    ).select(
        *group_cols, "check_name", "n_rows",
        "n_green", "n_yellow", "n_red",
        F.when(F.col("n_red") > 0, "RED")
        .when(F.col("n_yellow") > 0, "YELLOW")
        .otherwise("GREEN")
        .alias("verdict"),
    )


TRANSCODE_FLAC_SCHEMA = (
    "clip_id string, codec string, sr_hz int, dur_ms int, bytes binary"
)


def transcode_flac(clips: DataFrame) -> DataFrame:
    """WAV→FLAC transcode keeping the clips-table shape: each payload's
    raw int16 samples re-containered as real FLAC (functions/flac.py).
    Map-only Arrow stage over the source partitioning; undecodable
    payloads pass through as null bytes (verdict surface decides)."""
    from ..functions.flac import encode_flac

    def tr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            out: list[bytes | None] = []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    out.append(bytes(encode_flac(ints, sr)))
                except (ValueError, struct.error, AttributeError, TypeError):
                    out.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(srs, pa.int32()), pa.array(durs, pa.int32()),
                 pa.array(out, pa.binary())],
                ["clip_id", "codec", "sr_hz", "dur_ms", "bytes"])

    return clips.select("clip_id", "codec", "sr_hz", "dur_ms",
                        "bytes").mapInArrow(tr, TRANSCODE_FLAC_SCHEMA)


def transcode_au(clips: DataFrame, encoding: int | None = None) -> DataFrame:
    """WAV→AU transcode keeping the clips-table shape: each payload's raw
    int16 samples re-containered as big-endian Sun AU (functions/au.py).
    ``encoding`` selects the AU payload encoding (default PCM16; pass
    ``AU_ENCODING_ULAW`` for the 8-bit G.711 compander — the lossy
    half-size path whose round-trip stays above the 30 dB gate).
    Same scale shape as transcode_flac: map-only Arrow stage over the
    source partitioning, undecodable payloads pass through as null bytes
    (verdict surface decides), the payload never shuffles."""
    from ..functions.au import AU_ENCODING_PCM16, encode_au
    enc = AU_ENCODING_PCM16 if encoding is None else encoding

    def tr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            out: list[bytes | None] = []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    out.append(encode_au(ints, sr, encoding=enc))
                except (ValueError, struct.error, AttributeError, TypeError):
                    out.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(srs, pa.int32()), pa.array(durs, pa.int32()),
                 pa.array(out, pa.binary())],
                ["clip_id", "codec", "sr_hz", "dur_ms", "bytes"])

    return clips.select("clip_id", "codec", "sr_hz", "dur_ms",
                        "bytes").mapInArrow(tr, TRANSCODE_FLAC_SCHEMA)


def transcode_aiff(clips: DataFrame) -> DataFrame:
    """WAV→AIFF transcode keeping the clips-table shape: each payload's
    raw int16 samples re-containered as IFF-chunked AIFF
    (functions/aiff.py), 80-bit-extended-float sample rate and all.
    Same scale shape as transcode_flac/au: map-only Arrow stage over
    the source partitioning, undecodable payloads pass through as null
    bytes (verdict surface decides), the payload never shuffles."""
    from ..functions.aiff import encode_aiff

    def tr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            out: list[bytes | None] = []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    out.append(encode_aiff(ints, sr))
                except (ValueError, struct.error, AttributeError, TypeError):
                    out.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(srs, pa.int32()), pa.array(durs, pa.int32()),
                 pa.array(out, pa.binary())],
                ["clip_id", "codec", "sr_hz", "dur_ms", "bytes"])

    return clips.select("clip_id", "codec", "sr_hz", "dur_ms",
                        "bytes").mapInArrow(tr, TRANSCODE_FLAC_SCHEMA)


def transcode_adpcm(clips: DataFrame) -> DataFrame:
    """WAV→IMA-ADPCM transcode keeping the clips-table shape — the
    engine's first COMPRESSED lossy path (4.1:1; functions/adpcm.py).
    Unlike the per-row AU/AIFF transcodes, the whole Arrow batch is
    encoded in ONE lockstep pass (`encode_adpcm_wav_batch`: every block
    of every clip stacked into a single matrix, one 504-step vector
    loop) because ADPCM's per-sample recurrence would otherwise cost a
    Python iteration per sample. Map-only over the source partitioning;
    undecodable payloads pass through as null bytes; nothing shuffles."""
    from ..functions.adpcm import encode_adpcm_wav_batch

    def tr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            sigs, sig_srs, ok = [], [], []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    if len(ints) == 0:
                        raise ValueError("empty data chunk")
                    sigs.append(ints)
                    sig_srs.append(sr)
                    ok.append(True)
                except (ValueError, struct.error, AttributeError, TypeError):
                    ok.append(False)
            encoded = iter(encode_adpcm_wav_batch(sigs, sig_srs))
            out = [next(encoded) if good else None for good in ok]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(srs, pa.int32()), pa.array(durs, pa.int32()),
                 pa.array(out, pa.binary())],
                ["clip_id", "codec", "sr_hz", "dur_ms", "bytes"])

    return clips.select("clip_id", "codec", "sr_hz", "dur_ms",
                        "bytes").mapInArrow(tr, TRANSCODE_FLAC_SCHEMA)


def adpcm_header_columns(bytes_col: Column) -> dict[str, Column]:
    """IMA-ADPCM WAV header fields as pure Column expressions — the
    zero-Python header path for the COMPRESSED codec (functions/adpcm.py
    writes the canonical fmt(20)+fact+data layout; a foreign chunk order
    falls to the Python parser, the same stance as FLAC's fixed
    STREAMINFO read). 1-based offsets: fmt tag @21 (0x11), block align
    @33, samples/block @39, fact sample count @49, data size @57."""
    def le16(pos: int) -> Column:
        hx = F.hex(F.substring(bytes_col, pos, 2))
        return F.conv(F.concat(F.substring(hx, 3, 2),
                               F.substring(hx, 1, 2)), 16, 10).cast("long")

    return {
        "riff_ok": (F.length(bytes_col) >= 60)
        & (F.substring(bytes_col, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(bytes_col, 9, 4) == F.lit(b"WAVE"))
        & (F.substring(bytes_col, 41, 4) == F.lit(b"fact"))
        & (F.substring(bytes_col, 53, 4) == F.lit(b"data")),
        "fmt_tag": le16(21),
        "hdr_sr_hz": le32(bytes_col, 25),
        "block_align": le16(33),
        "bits": le16(35),
        "samples_per_block": le16(39),
        "fact_samples": le32(bytes_col, 49),
        "data_bytes": le32(bytes_col, 57),
    }


def transcode_msadpcm(clips: DataFrame) -> DataFrame:
    """WAV→MS-ADPCM transcode keeping the clips-table shape — the
    engine's SECOND compressed lossy path (fmt tag 0x02, 2-tap linear
    prediction; functions/msadpcm.py). Same lockstep shape as
    transcode_adpcm: the whole Arrow batch is encoded in ONE pass
    (every block of every clip stacked into a single matrix, one
    498-step vector loop). Map-only over the source partitioning;
    undecodable payloads pass through as null bytes; nothing shuffles."""
    from ..functions.msadpcm import encode_msadpcm_wav_batch

    def tr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            sigs, sig_srs, ok = [], [], []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    if len(ints) == 0:
                        raise ValueError("empty data chunk")
                    sigs.append(ints)
                    sig_srs.append(sr)
                    ok.append(True)
                except (ValueError, struct.error, AttributeError, TypeError):
                    ok.append(False)
            encoded = iter(encode_msadpcm_wav_batch(sigs, sig_srs))
            out = [next(encoded) if good else None for good in ok]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(srs, pa.int32()), pa.array(durs, pa.int32()),
                 pa.array(out, pa.binary())],
                ["clip_id", "codec", "sr_hz", "dur_ms", "bytes"])

    return clips.select("clip_id", "codec", "sr_hz", "dur_ms",
                        "bytes").mapInArrow(tr, TRANSCODE_FLAC_SCHEMA)


def msadpcm_header_columns(bytes_col: Column) -> dict[str, Column]:
    """MS-ADPCM WAV header fields as pure Column expressions — the
    zero-Python header path for the SECOND compressed codec
    (functions/msadpcm.py writes the canonical fmt(50)+fact+data
    layout; a foreign chunk order falls to the Python parser, the same
    stance as adpcm_header_columns). 1-based offsets: fmt tag @21
    (0x02), block align @33, samples/block @39, coefficient count @41,
    fact sample count @79, data size @87."""
    def le16(pos: int) -> Column:
        hx = F.hex(F.substring(bytes_col, pos, 2))
        return F.conv(F.concat(F.substring(hx, 3, 2),
                               F.substring(hx, 1, 2)), 16, 10).cast("long")

    return {
        "riff_ok": (F.length(bytes_col) >= 90)
        & (F.substring(bytes_col, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(bytes_col, 9, 4) == F.lit(b"WAVE"))
        & (F.substring(bytes_col, 71, 4) == F.lit(b"fact"))
        & (F.substring(bytes_col, 83, 4) == F.lit(b"data")),
        "fmt_tag": le16(21),
        "hdr_sr_hz": le32(bytes_col, 25),
        "block_align": le16(33),
        "bits": le16(35),
        "samples_per_block": le16(39),
        "n_coef": le16(41),
        "fact_samples": le32(bytes_col, 79),
        "data_bytes": le32(bytes_col, 87),
    }


def transcode_alaw(clips: DataFrame) -> DataFrame:
    """WAV→G.711-A-law transcode keeping the clips-table shape (fmt
    tag 6, 8 bits/sample, half-size payload; functions/alaw.py). Same
    scale shape as transcode_au: map-only Arrow stage over the source
    partitioning, undecodable payloads pass through as null bytes, the
    payload never shuffles."""
    from ..functions.alaw import encode_alaw_wav

    def tr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            srs = batch.column("sr_hz").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            out: list[bytes | None] = []
            for j in range(batch.num_rows):
                try:
                    wav = memoryview(payloads[j].as_buffer())
                    ints, sr = _pcm16_wav_ints(wav)
                    if len(ints) == 0:
                        raise ValueError("empty data chunk")
                    out.append(encode_alaw_wav(ints, sr))
                except (ValueError, struct.error, AttributeError, TypeError):
                    out.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(srs, pa.int32()), pa.array(durs, pa.int32()),
                 pa.array(out, pa.binary())],
                ["clip_id", "codec", "sr_hz", "dur_ms", "bytes"])

    return clips.select("clip_id", "codec", "sr_hz", "dur_ms",
                        "bytes").mapInArrow(tr, TRANSCODE_FLAC_SCHEMA)


def aiff_header_columns(bytes_col: Column) -> dict[str, Column]:
    """AIFF header fields as pure Column expressions — the zero-Python
    header path for the FOURTH container, reading the canonical
    COMM-then-SSND layout the engine's writer emits (functions/aiff.py;
    a foreign chunk order falls to the Python parser, same stance as
    FLAC's fixed STREAMINFO read).

    The crown jewel is the sample rate: AIFF stores it as an 80-bit
    IEEE 754 extended float, and this recovers the integer-exact value
    with long arithmetic only — exponent word at offset 29 (1-based),
    top-32 mantissa bits at 31, then ``sr = floor(hi32 / 2^(31-k))``
    with ``k = exp - 16383``. The division is exact in double (both
    operands < 2^32), so no float parse and no Python ever touch the
    header.

    Returned keys: ``aiff_ok`` (magic + canonical PCM16-mono COMM),
    ``n_frames``, ``sample_size``, ``hdr_sr_hz``, ``ssnd_bytes``
    (payload length declared by the SSND chunk, minus offset words).
    """
    exp = be_uint(bytes_col, 29, 2)
    hi32 = be_uint(bytes_col, 31, 4)
    k = exp - F.lit(16383)
    sr = F.floor(hi32 / F.pow(F.lit(2.0), (F.lit(31) - k).cast("double")))
    return {
        "aiff_ok": (F.length(bytes_col) >= 54)
        & (F.substring(bytes_col, 1, 4) == F.lit(b"FORM"))
        & (F.substring(bytes_col, 9, 4) == F.lit(b"AIFF"))
        & (F.substring(bytes_col, 13, 4) == F.lit(b"COMM"))
        & (be_uint(bytes_col, 17, 4) == 18)   # COMM size
        & (be_uint(bytes_col, 21, 2) == 1)    # mono
        & (be_uint(bytes_col, 27, 2) == 16)   # PCM16
        & (F.substring(bytes_col, 39, 4) == F.lit(b"SSND")),
        "n_frames": be_uint(bytes_col, 23, 4),
        "sample_size": be_uint(bytes_col, 27, 2),
        "hdr_sr_hz": sr.cast("long"),
        "ssnd_bytes": be_uint(bytes_col, 43, 4) - F.lit(8),
        "form_bytes": be_uint(bytes_col, 5, 4) + F.lit(8),
    }


def aiff_header_verdicts() -> dict[str, Column]:
    """AIFF container checks as GREEN/YELLOW/RED verdict Columns — the
    fourth-container twin of wav/flac/au_header_verdicts.

    - ``bytes``: RED when the FORM/AIFF magic or canonical PCM16-mono
      COMM shape is missing, or any of the three declared lengths
      (FORM size, SSND size, COMM frame count) contradicts the actual
      payload length; GREEN otherwise.
    - ``sr_hz``: YELLOW when the container is sound but the 80-bit
      header rate contradicts the metadata column (recoverable by
      trusting the header); RED when the header is unreadable; GREEN
      on agreement.
    """
    hdr = aiff_header_columns(F.col("bytes"))
    container_ok = (hdr["aiff_ok"]
                    & (F.length("bytes") == hdr["form_bytes"])
                    & (F.length("bytes")
                       == F.lit(54) + hdr["ssnd_bytes"])
                    & (hdr["ssnd_bytes"] == 2 * hdr["n_frames"]))
    return {
        "bytes": F.when(container_ok, "GREEN").otherwise("RED"),
        "sr_hz": F.when(~hdr["aiff_ok"], "RED")
        .when(hdr["hdr_sr_hz"] == F.col("sr_hz").cast("long"), "GREEN")
        .otherwise("YELLOW"),
    }


def au_header_columns(bytes_col: Column) -> dict[str, Column]:
    """Sun AU header fields as pure Column expressions — the zero-Python
    header path for the THIRD container (functions/au.py holds the
    Arrow-stage codec; this reads only the 24 leading bytes). AU is
    big-endian, so the reads are straight ``be_uint`` calls with no
    byte-swap string surgery — the mirror image of the WAV parse
    (wav_header_columns / le32) that proves the byte-order half of the
    pure-Column surgery toolkit.

    Returned keys: ``au_ok`` (magic + offset/encoding/channel shape the
    engine emits), ``data_offset``, ``data_bytes`` (payload length
    declared in the header), ``encoding``, ``hdr_sr_hz``, ``channels``.
    """
    return {
        "au_ok": (F.length(bytes_col) >= 28)
        & (F.substring(bytes_col, 1, 4) == F.lit(b".snd"))
        & (be_uint(bytes_col, 5, 4) >= 24)
        # 16-bit linear PCM or G.711 mu-law — the two payload
        # encodings the engine emits and decodes (functions/au.py)
        & (be_uint(bytes_col, 13, 4).isin(1, 3))
        & (be_uint(bytes_col, 21, 4) == 1),  # mono
        "data_offset": be_uint(bytes_col, 5, 4),
        "data_bytes": be_uint(bytes_col, 9, 4),
        "encoding": be_uint(bytes_col, 13, 4),
        "hdr_sr_hz": be_uint(bytes_col, 17, 4),
        "channels": be_uint(bytes_col, 21, 4),
    }


def au_header_verdicts() -> dict[str, Column]:
    """AU container checks as GREEN/YELLOW/RED verdict Columns for the
    streaming/batch rule surface — the third-container twin of
    wav_header_verdicts / flac_header_verdicts.

    - ``bytes``: RED when the ``.snd`` magic / PCM16-mono shape is
      missing or the payload is truncated relative to its own
      data_offset + data_size declaration; GREEN otherwise.
    - ``sr_hz``: YELLOW when the container is sound but the header's
      sample rate contradicts the metadata column (recoverable by
      trusting the header — the d3rty tolerance model applied to binary
      media); RED when the header is unreadable; GREEN on agreement.
    """
    hdr = au_header_columns(F.col("bytes"))
    container_ok = (hdr["au_ok"]
                    & (F.length("bytes")
                       == hdr["data_offset"] + hdr["data_bytes"]))
    return {
        "bytes": F.when(container_ok, "GREEN").otherwise("RED"),
        "sr_hz": F.when(~hdr["au_ok"], "RED")
        .when(hdr["hdr_sr_hz"] == F.col("sr_hz").cast("long"), "GREEN")
        .otherwise("YELLOW"),
    }


def wav_header_columns(bytes_col: Column) -> dict[str, Column]:
    """Canonical-WAV header fields as pure Column expressions — the
    zero-Python fast path for header-level audio integrity checks at
    10^12-row scale (the full Arrow decode stage stays reserved for
    sample-level invariants like SNR).

    Returned keys: ``riff_ok`` (RIFF/WAVE magic present), ``hdr_sr_hz``
    (sample rate declared in the fmt chunk), ``data_bytes`` (PCM payload
    length declared in the data chunk).
    """
    return {
        "riff_ok": (F.length(bytes_col) >= 44)
        & (F.substring(bytes_col, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(bytes_col, 9, 4) == F.lit(b"WAVE")),
        "hdr_sr_hz": le32(bytes_col, 25),
        "data_bytes": le32(bytes_col, 41),
    }


def wav_header_verdicts() -> dict[str, Column]:
    """Audio header checks as GREEN/YELLOW/RED verdict Columns, shaped for
    ``streaming_row_verdicts``/``streaming_windowed_verdicts`` (and equally
    valid on a batch frame — Spark's batch/streaming unification).

    - ``bytes``: RED when the RIFF/WAVE magic is missing or the payload is
      truncated relative to its own data-chunk declaration; GREEN otherwise.
    - ``sr_hz``: YELLOW when the container is sound but the header's sample
      rate contradicts the metadata column (recoverable by trusting the
      header — the d3rty tolerance model applied to binary media); RED when
      the header is unreadable; GREEN on agreement.
    """
    hdr = wav_header_columns(F.col("bytes"))
    container_ok = (hdr["riff_ok"]
                    & (F.length("bytes") == 44 + hdr["data_bytes"]))
    return {
        "bytes": F.when(container_ok, "GREEN").otherwise("RED"),
        "sr_hz": F.when(~hdr["riff_ok"], "RED")
        .when(hdr["hdr_sr_hz"] == F.col("sr_hz"), "GREEN")
        .otherwise("YELLOW"),
    }


def wav_header_integrity(clips: DataFrame,
                         group_cols: list[str] | None = None) -> DataFrame:
    """Per-group header-vs-metadata consistency over the binary column:
    RIFF magic present, declared sample rate equals the ``sr_hz`` metadata
    column, and the data-chunk length both matches the PCM16 length implied
    by ``sr_hz``/``dur_ms`` (null duration falls back to the synth default
    of 100 ms) AND agrees with the actual payload size (catches truncated
    uploads whose header still claims the full length). Map-only scan + one
    partial/final hash aggregate — the bytes column never shuffles.
    """
    group_cols = group_cols or ["codec"]
    hdr = wav_header_columns(F.col("bytes"))
    expected_n = F.greatest(
        F.lit(1).cast("long"),
        F.expr("CAST(sr_hz AS BIGINT) * coalesce(dur_ms, 100) DIV 1000"))
    parsed = clips.select(
        *group_cols,
        F.col("dur_ms"),
        hdr["riff_ok"].alias("riff_ok"),
        (hdr["hdr_sr_hz"] == F.col("sr_hz")).alias("sr_match"),
        ((hdr["data_bytes"] == 2 * expected_n)
         & (F.length("bytes") == 44 + hdr["data_bytes"])).alias("len_match"),
        hdr["data_bytes"].alias("data_bytes"),
    )
    return parsed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("riff_ok").cast("long")).alias("n_riff_ok"),
        F.sum(F.col("sr_match").cast("long")).alias("n_sr_match"),
        F.sum(F.col("len_match").cast("long")).alias("n_len_match"),
        F.sum(F.col("dur_ms").isNull().cast("long")).alias("n_null_dur"),
        F.sum("data_bytes").alias("sum_payload_bytes"),
    )


PERCEPTUAL_FP_SCHEMA = (
    "clip_id string, codec string, verdict string, f0_hz double, "
    "fp long, h2_ratio double, h3_ratio double"
)


def perceptual_fingerprint(clips: DataFrame,
                           threshold_db: float = 30.0,
                           pad_mult: int = 8) -> DataFrame:
    """Compact perceptual fingerprint of each clip's decoded CONTENT:
    a sub-Hz fundamental-frequency estimate (Hann window → zero-padded
    rFFT → log-magnitude parabolic interpolation; worst error measured
    0.06 Hz over the fixture's whole (sr, dur, f0) space) plus harmonic
    amplitude ratios. ``fp`` = round(f0) is the dedup key: it is
    invariant to gain changes, phase shifts, dither, and container
    re-encoding — the things that break byte-exact dedup
    (audio_content_dedup) — while distinct tones land in distinct keys.

    The perceptual analog of SimHash for text: same-content clips
    collide on a compact signature computed map-side, so dedup becomes
    a groupBy on a long instead of any comparison of payloads. The
    fingerprint is INTRINSIC — computed for every decodable payload, so
    renamed/re-gained copies (whose clip_id implies a different
    reference) still fingerprint identically to their source. The
    ``verdict`` column is the separate reference-SNR label (GREEN iff
    the content matches what this clip_id's reference implies); noise
    rows keep their fingerprint but are flagged RED so oracle-gated
    consumers can exclude them (a heavy-noise f0 estimate is not
    reliable to the rounding boundary).

    Scale shape: map-only ``mapInArrow`` over the source partitioning;
    only (fp, ratios) travel onward — at 10^12 clips the dedup shuffle
    carries one long per clip and the payload never leaves its scan
    partition.
    """
    from ..fixtures.signal import reference_signal, snr_db

    def fps(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            durs = batch.column("dur_ms").to_pylist()
            payloads = batch.column("bytes")
            verd, f0s, fp, h2, h3 = [], [], [], [], []
            for j in range(batch.num_rows):
                sig = None
                try:
                    buf = memoryview(payloads[j].as_buffer())
                    try:
                        sig, sr = decode_wav_pcm16(buf)
                    except (ValueError, struct.error):
                        sig, sr = decode_flac(bytes(buf))
                except (ValueError, struct.error, AttributeError, TypeError):
                    sig = None
                if sig is None or len(sig) < 4:
                    verd.append("RED")
                    f0s.append(None); fp.append(None)
                    h2.append(None); h3.append(None)
                    continue
                # reference-SNR label (content vs what clip_id implies);
                # does NOT gate the fingerprint itself
                dur = int(durs[j]) if durs[j] is not None else 100
                ref = reference_signal(ids[j], sr, dur)
                verd.append("GREEN" if snr_db(ref, sig) >= threshold_db
                            else "RED")
                n = len(sig)
                w = np.hanning(n)
                pad = 1 << int(np.ceil(np.log2(max(16, n * pad_mult))))
                spec = np.abs(np.fft.rfft(sig.astype(np.float64) * w, pad))
                k = int(np.argmax(spec[1:])) + 1
                if 1 <= k < len(spec) - 1 and spec[k - 1] > 0 \
                        and spec[k + 1] > 0:
                    a = np.log(spec[k - 1])
                    b = np.log(spec[k])
                    c = np.log(spec[k + 1])
                    den = a - 2 * b + c
                    delta = 0.5 * (a - c) / den if den != 0 else 0.0
                    delta = float(np.clip(delta, -0.5, 0.5))
                else:
                    delta = 0.0
                f0 = (k + delta) * sr / pad
                # harmonic descriptor: peak magnitude near 2f0/3f0
                # relative to the fundamental (gain-invariant)
                def mag_at(hz: float) -> float:
                    kk = int(round(hz * pad / sr))
                    lo, hi = max(0, kk - 2), min(len(spec), kk + 3)
                    return float(spec[lo:hi].max()) if hi > lo else 0.0
                base = mag_at(f0)
                f0s.append(float(f0))
                fp.append(int(round(f0)))
                h2.append(mag_at(2 * f0) / base if base > 0 else None)
                h3.append(mag_at(3 * f0) / base if base > 0 else None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(verd, pa.string()), pa.array(f0s, pa.float64()),
                 pa.array(fp, pa.int64()), pa.array(h2, pa.float64()),
                 pa.array(h3, pa.float64())],
                ["clip_id", "codec", "verdict", "f0_hz", "fp",
                 "h2_ratio", "h3_ratio"])

    return clips.select("clip_id", "codec", "dur_ms", "bytes").mapInArrow(
        fps, PERCEPTUAL_FP_SCHEMA)


GOERTZEL_SCHEMA = (
    "clip_id string, codec string, n_samples long, "
    "c_sum long, s_sum long, sum_sq long, f0 long"
)


def goertzel_profile(clips: DataFrame) -> DataFrame:
    """Single-bin spectral verification: correlate every clip's decoded
    PCM against quantized cos/sin templates at its contract pitch
    (f0 = 100 + crc32(clip_id) % 997 — the same generator contract
    audio_dominant_freq exploits), i.e. the Goertzel/matched-filter
    answer to "does the energy at the frequency this clip CLAIMS to
    carry actually dominate?" — the spectral complement of the
    broadband RMS check (a clip can pass loudness while carrying the
    wrong tone, noise, or a re-encoded artifact).

    Exactness contract: the templates are cos/sin quantized to integer
    Q15 weights via round-half-even, so ``c_sum = Σ v_j·w_j``,
    ``s_sum`` and ``sum_sq`` are EXACT int64 sums (|Σ| ≤ n·32767·32768
    ≈ 1e13 « 2^63) — the DuckDB oracle refolds the identical integers
    from the per-sample SQL twin, making every correlation bit-exact
    cross-engine (float dot-products would diverge by summation order;
    integer sums cannot).

    Scale shape: one map-only Arrow stage over the scan partitioning —
    payload bytes never shuffle; the output is 5 scalars per clip.
    Undecodable payloads emit null sums (AttributeError = null bytes,
    same contract as the sibling stages).
    """
    import zlib

    def corr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            codecs = batch.column("codec").to_pylist()
            payloads = batch.column("bytes")
            ns, cs, ss, sq, f0s = [], [], [], [], []
            for j in range(batch.num_rows):
                try:
                    buf = memoryview(payloads[j].as_buffer())
                    try:
                        sig, sr = decode_wav_pcm16(buf)
                    except (ValueError, struct.error):
                        sig, sr = decode_flac(bytes(buf))
                except (ValueError, struct.error, AttributeError,
                        TypeError):
                    # AttributeError/TypeError: a NULL bytes value has no
                    # buffer — emit null sums, like the sibling stages
                    ns.append(None); cs.append(None); ss.append(None)
                    sq.append(None); f0s.append(None)
                    continue
                v = np.round(
                    sig.astype(np.float64) * 32767.0).astype(np.int64)
                n = len(v)
                seed = zlib.crc32(ids[j].encode("utf-8")) & 0xFFFFFFFF
                f0 = 100 + (seed % 997)
                t = np.arange(n, dtype=np.float64) / sr
                ang = (2 * np.pi * f0) * t
                cw = np.round(np.cos(ang) * 32768.0).astype(np.int64)
                sw = np.round(np.sin(ang) * 32768.0).astype(np.int64)
                ns.append(n)
                cs.append(int(v @ cw))
                ss.append(int(v @ sw))
                sq.append(int((v * v).sum()))
                f0s.append(f0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(codecs, pa.string()),
                 pa.array(ns, pa.int64()), pa.array(cs, pa.int64()),
                 pa.array(ss, pa.int64()), pa.array(sq, pa.int64()),
                 pa.array(f0s, pa.int64())],
                ["clip_id", "codec", "n_samples", "c_sum", "s_sum",
                 "sum_sq", "f0"])

    return clips.select("clip_id", "codec", "bytes").mapInArrow(
        corr, GOERTZEL_SCHEMA)


def goertzel_share(n: Column, c_sum: Column, s_sum: Column,
                   sum_sq: Column) -> Column:
    """Fraction of a clip's power held by the contract frequency:
    ``2·(C² + S²) / (n · 32768² · Σv²)`` — the amplitude estimate
    Â = (2/n)·√(C²+S²)/32768 turned into power share Â²/2 ÷ (Σv²/n).
    Left-associative double arithmetic, mirrored exactly in the SQL
    oracle (the int64 inputs are < 2^53, so the double conversions are
    exact and every multiply/divide is correctly rounded identically).
    """
    c = c_sum.cast("double")
    s = s_sum.cast("double")
    return (F.lit(2.0) * (c * c + s * s)
            / (n.cast("double") * F.lit(32768.0) * F.lit(32768.0)
               * sum_sq.cast("double")))
