"""Deterministic audio signal synthesis + minimal WAV codec (pure numpy).

The engine's SNR invariant (BASELINE.json input_hint: decoded-PCM allclose,
SNR >= 30 dB) needs a reference signal that any executor can regenerate
from the row alone. Everything here is keyed on a stable hash of clip_id —
``zlib.crc32``, NOT Python's randomized ``hash()`` — so generator and
checker agree across processes, sessions, and cluster nodes.

No audio libraries: WAV is a 44-byte RIFF header + little-endian PCM16
frames, trivially (de)serialized with ``struct`` + ``numpy.frombuffer``.
FLAC is a real second container (functions/flac.py — pure-Python
verbatim-subframe codec); opus/mp3 remain opaque binary with a stubbed
decode (see operators/multimodal.py) since their libs aren't in this
container. The fixture stores PCM16-in-WAV for every codec label so the
closed-form byte-level oracles stay derivable; FLAC payload paths are
exercised by transcode (multimodal.py:transcode_flac) in their own
queries/tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def clip_seed(clip_id: str) -> int:
    """Stable 32-bit seed from a clip id."""
    return zlib.crc32(clip_id.encode("utf-8")) & 0xFFFFFFFF


def reference_signal(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """The canonical float32 signal for a clip: a 3-harmonic sine mix whose
    frequencies/phases derive from the clip seed. Values in [-0.75, 0.75]."""
    seed = clip_seed(clip_id)
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    f0 = 100.0 + (seed % 997)
    sig = (
        0.5 * np.sin(2 * np.pi * f0 * t)
        + 0.2 * np.sin(2 * np.pi * (2.0 * f0) * t + (seed % 31) * 0.1)
        + 0.05 * np.sin(2 * np.pi * (3.0 * f0) * t + (seed % 17) * 0.2)
    )
    return sig.astype(np.float32)


def reference_slice(clip_id: str, sr_hz: int, start: int,
                    count: int) -> np.ndarray:
    """Samples [start, start+count) of the canonical signal, without
    rendering the whole clip — bit-identical to
    ``reference_signal(...)[start:start+count]`` because the per-sample
    math is position-keyed only (t = j/sr in exact-integer float64), so
    a chunk-level checker pays O(chunk) instead of O(clip) per chunk."""
    seed = clip_seed(clip_id)
    t = np.arange(start, start + count, dtype=np.float64) / sr_hz
    f0 = 100.0 + (seed % 997)
    sig = (
        0.5 * np.sin(2 * np.pi * f0 * t)
        + 0.2 * np.sin(2 * np.pi * (2.0 * f0) * t + (seed % 31) * 0.1)
        + 0.05 * np.sin(2 * np.pi * (3.0 * f0) * t + (seed % 17) * 0.2)
    )
    return sig.astype(np.float32)


def pcm16_wav_bytes(signal: np.ndarray, sr_hz: int) -> bytes:
    """Encode float [-1,1] → 16-bit PCM WAV (44-byte canonical header)."""
    pcm = np.clip(signal, -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    data = ints.tobytes()
    n_bytes = len(data)
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + n_bytes)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n_bytes)
    )
    return header + data


def decode_wav_pcm16(wav: bytes) -> tuple[np.ndarray, int]:
    """Decode canonical PCM16 WAV → (float32 signal in [-1,1], sample rate).

    Raises ValueError on malformed bytes — the SNR stage maps that to a
    RED verdict rather than failing the task.
    """
    if len(wav) < 44 or wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_tag, channels, sr_hz = struct.unpack("<HHI", wav[20:28])
    bits = struct.unpack("<H", wav[34:36])[0]
    if fmt_tag != 1 or channels != 1 or bits != 16:
        raise ValueError(f"unsupported wav layout: fmt={fmt_tag} ch={channels} bits={bits}")
    n_bytes = struct.unpack("<I", wav[40:44])[0]
    data = wav[44:44 + n_bytes]
    ints = np.frombuffer(data, dtype="<i2")
    return (ints.astype(np.float32) / 32767.0), sr_hz


def snr_db(ref: np.ndarray, decoded: np.ndarray) -> float:
    """10*log10(P_signal / P_error); inf for exact match, -inf for len mismatch."""
    if ref.shape != decoded.shape:
        return float("-inf")
    err = ref.astype(np.float64) - decoded.astype(np.float64)
    p_err = float(np.sum(err * err))
    p_sig = float(np.sum(ref.astype(np.float64) ** 2))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)
