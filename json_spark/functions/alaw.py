"""G.711 A-law codec inside the WAV container (wFormatTag 6) — the
companding sibling of functions/au.py's µ-law (tag 7 / AU encoding 1),
completing the G.711 pair a telephony-sourced audio corpus ships in.

Reference parity note: the d3rty reference (Go) has no audio — this
module serves the brief's north rule (decoded-PCM SNR>=30 dB over the
audio-clip table) alongside the WAV/FLAC/AU/AIFF/ADPCM formats.

A-law per ITU-T G.711: 13-bit magnitude, 8 segments, 4-bit mantissa,
even-bit inversion (XOR 0x55) on the wire. Both directions are
vectorized numpy over the whole sample array; expand returns exact
segment midpoints so ``alaw_compress(alaw_expand(a)) == a`` for every
code — the involution law pinned in tests. Round-trip SNR on the
fixture's tonal content is ~37-38 dB: above the 30 dB verdict gate,
measurably lossy — the same tolerance-semantics pin as µ-law, reached
through a DIFFERENT standard curve (A-law's first segment is linear,
µ-law's is biased-log), so a match through both curves pins the gate
against two independent quantization shapes.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_ALAW = 0x06
_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF],
                    dtype=np.int32)


def alaw_compress(ints: np.ndarray) -> np.ndarray:
    """int16 → G.711 A-law bytes (even bits inverted per the spec)."""
    x = np.asarray(ints, dtype=np.int32)
    sign = (x >= 0).astype(np.int32)  # A-law: 1 = positive
    # 13-bit magnitude (the codec's linear domain is 13-bit signed)
    mag = np.minimum(np.abs(x) >> 3, 0xFFF)
    # segment = index of the first segment end >= mag
    seg = np.searchsorted(_SEG_END, mag).astype(np.int32)
    seg = np.minimum(seg, 7)
    # segment 0 is linear (step 2); segments 1..7 log (step 2^seg)
    mant = np.where(seg == 0, mag >> 1, (mag >> seg) & 0x0F)
    code = (sign << 7) | (seg << 4) | mant
    return (code ^ 0x55).astype(np.uint8)


def alaw_expand(a8: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 segment midpoints (exact involution:
    ``alaw_compress(alaw_expand(a)) == a`` for all 256 codes)."""
    a = np.asarray(a8, dtype=np.int32) ^ 0x55
    sign = (a >> 7) & 1
    seg = (a >> 4) & 7
    mant = a & 0x0F
    # midpoint of the quantization cell, in the 13-bit domain:
    # segment 0 is linear with step 2 (midpoint 2m+1); segment s>=1
    # covers [2^(s+4), 2^(s+5)) with step 2^s, midpoint
    # 2^(s+4) + m*2^s + 2^(s-1) == ((2m+33) << (s-1))
    mag13 = np.where(seg == 0, (mant << 1) + 1,
                     ((mant << 1) + 33) << (seg - 1))
    # back to 16-bit
    mag = mag13 << 3
    return np.where(sign == 1, mag, -mag).astype(np.int16)


def encode_alaw_wav(ints: np.ndarray, sr_hz: int) -> bytes:
    """int16 mono samples → A-law WAV bytes (fmt tag 6, 8 bits/sample,
    fact chunk carrying the sample count per the compressed-WAV rule)."""
    ints = np.asarray(ints, dtype=np.int16)
    if len(ints) == 0:
        raise ValueError("cannot encode an empty signal")
    data = alaw_compress(ints).tobytes()
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_ALAW, 1, sr_hz, sr_hz,
                      1, 8, 0)
    fact = struct.pack("<I", len(ints))
    riff_size = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data))
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_alaw_wav(buf) -> tuple[np.ndarray, int]:
    """A-law WAV bytes → (float32 signal in [-1,1], sample rate).
    Rejects foreign payloads with ValueError (RIFF magic, then fmt
    tag 6); output scale matches the PCM16 path (i / 32767)."""
    wav = bytes(buf)
    if len(wav) < 12 or wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_raw = fact_n = data = None
    while pos + 8 <= len(wav):
        cid = wav[pos:pos + 4]
        (size,) = struct.unpack("<I", wav[pos + 4:pos + 8])
        body = wav[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_raw = body
        elif cid == b"fact" and size >= 4:
            (fact_n,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt_raw is None or len(fmt_raw) < 16:
        raise ValueError("missing fmt chunk")
    tag, ch, sr = struct.unpack("<HHI", fmt_raw[:8])
    if tag != WAVE_FORMAT_ALAW:
        raise ValueError(f"not A-law: fmt tag {tag}")
    if ch != 1:
        raise ValueError("only mono A-law supported")
    if data is None:
        raise ValueError("missing data chunk")
    n = fact_n if fact_n is not None else len(data)
    ints = alaw_expand(np.frombuffer(data[:n], dtype=np.uint8))
    return ints.astype(np.float32) / 32767.0, sr
