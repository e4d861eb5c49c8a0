"""IMA ADPCM (DVI4) codec inside the WAV container — the engine's first
COMPRESSED lossy codec (4.1:1 vs PCM16), closing r3 verdict directive 4:
`decode_external` no longer guards the only compressed family the fixture
declares; this is a real, from-scratch implementation of the IMA/DVI
adaptive differential PCM algorithm (public spec: IMA Digital Audio
Focus/Compatibility groups, 1992; WAV packaging: wFormatTag 0x11).

Reference parity note: the d3rty reference (Go) has no audio at all —
this module exists for the brief's north rule (decoded-PCM SNR>=30dB over
an audio-clip table), mirroring how functions/flac.py, au.py and aiff.py
carry the lossless containers.

Why it scales — LOCKSTEP VECTORIZATION: ADPCM's recurrence (predictor +
step-index state per sample) is inherently sequential, which would mean
one Python loop iteration per SAMPLE. But WAV-ADPCM is block-structured
(each 256-byte block restarts from a 4-byte header carrying the block's
initial predictor + step index), so blocks are mutually independent.
Encode and decode therefore flatten EVERY block of EVERY clip in an
Arrow batch into one (n_blocks, 505) matrix and run a single 504-step
loop of numpy vector ops — per-batch Python cost is O(samples_per_block),
not O(total_samples). All arithmetic is integer → bit-deterministic
across runs, partitionings and platforms.

Fidelity: the codec is lossy by design. On the fixture's band-limited
multi-tone clips the measured round-trip SNR is well above the 30 dB
verdict gate (see tests/test_adpcm.py), while planted ±0.3 uniform-noise
corruption stays ~7 dB — so GREEN/RED classification through this codec
matches the closed-form plant arithmetic exactly.

SAMPLE-RATE FLOOR (r4 ADVICE): the 30 dB margin is content-dependent.
At low sample rates the per-sample delta of a full-band tone grows
(fewer samples per period), and the 4-bit quantizer's round-trip SNR
shrinks with it — a plain 440 Hz half-amplitude tone at 8 kHz measures
~29.7 dB, BELOW the gate, while the same tone at 44.1/48 kHz clears it
with >2 dB margin. Callers running an SNR>=30dB gate through this codec
must restrict it to >=22.05 kHz partitions (the shipped
``audio_adpcm_snr`` query filters to the 44.1/48 kHz 'opus' partition
for exactly this reason); low-rate content belongs behind the lossless
containers or a relaxed gate.
"""

from __future__ import annotations

import struct

import numpy as np

#: standard IMA step-size table (89 entries) and index-adjust table
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int32)

INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32)

WAVE_FORMAT_IMA_ADPCM = 0x11
BLOCK_ALIGN = 256
#: mono: 4-byte block header + (BLOCK_ALIGN-4) nibble-pair bytes
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1  # 505


def _reconstruct(pred: np.ndarray, index: np.ndarray,
                 code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One decoder step, vectorized over blocks: (pred', index') from the
    4-bit codes — the exact integer recurrence both encode and decode
    share, so the encoder's running predictor equals the decoder's."""
    step = STEP_TABLE[index]
    mag = code & 7
    diffq = (step >> 3) + step * ((mag >> 2) & 1) \
        + (step >> 1) * ((mag >> 1) & 1) + (step >> 2) * (mag & 1)
    pred = np.where(code & 8, pred - diffq, pred + diffq)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + INDEX_TABLE[code], 0, 88)
    return pred, index


def encode_blocks(samples: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """Encode a (B, SAMPLES_PER_BLOCK) int16 matrix of independent blocks
    in lockstep → (pred0, index0, nibble codes (B, SPB-1) uint8).

    Each block restarts: header predictor = its first sample; the
    initial step index is fitted per block (searchsorted of the block's
    mean |delta| into the step table) — deterministic and within a few
    adaptation steps of optimal, which block independence buys us."""
    B, S = samples.shape
    if S != SAMPLES_PER_BLOCK:
        raise ValueError(f"block must hold {SAMPLES_PER_BLOCK} samples")
    s32 = samples.astype(np.int32)
    pred = s32[:, 0].copy()
    mean_step = np.abs(np.diff(s32, axis=1)).mean(axis=1)
    index0 = np.clip(np.searchsorted(STEP_TABLE, mean_step), 0, 88) \
        .astype(np.int32)
    index = index0.copy()
    codes = np.zeros((B, S - 1), dtype=np.uint8)
    for t in range(1, S):
        diff = s32[:, t] - pred
        sign = (diff < 0).astype(np.int32)
        mag = np.abs(diff)
        step = STEP_TABLE[index]
        c = np.zeros(B, dtype=np.int32)
        b = (mag >= step).astype(np.int32)
        c |= b << 2
        mag = mag - step * b
        half = step >> 1
        b = (mag >= half).astype(np.int32)
        c |= b << 1
        mag = mag - half * b
        b = (mag >= (step >> 2)).astype(np.int32)
        c |= b
        code = c | (sign << 3)
        pred, index = _reconstruct(pred, index, code)
        codes[:, t - 1] = code.astype(np.uint8)
    return s32[:, 0].astype(np.int16), index0, codes


def decode_blocks(pred0: np.ndarray, index0: np.ndarray,
                  codes: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_blocks`: (B, SPB) int16 samples."""
    B, n_codes = codes.shape
    out = np.empty((B, n_codes + 1), dtype=np.int16)
    pred = pred0.astype(np.int32)
    index = np.clip(index0.astype(np.int32), 0, 88)
    out[:, 0] = pred0
    codes32 = codes.astype(np.int32)
    for t in range(n_codes):
        pred, index = _reconstruct(pred, index, codes32[:, t])
        out[:, t + 1] = pred.astype(np.int16)
    return out


def _pack_nibbles(codes: np.ndarray) -> np.ndarray:
    """(B, 2k) 4-bit codes → (B, k) bytes, FIRST code in the LOW nibble
    (the WAV IMA convention)."""
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    return (lo | (hi << 4)).astype(np.uint8)


def _unpack_nibbles(data: np.ndarray) -> np.ndarray:
    """(B, k) bytes → (B, 2k) codes, low nibble first."""
    B, k = data.shape
    out = np.empty((B, 2 * k), dtype=np.uint8)
    out[:, 0::2] = data & 0x0F
    out[:, 1::2] = data >> 4
    return out


def encode_adpcm_wav(ints: np.ndarray, sr_hz: int) -> bytes:
    """int16 mono samples → IMA-ADPCM WAV bytes (fmt 0x11, 256-byte
    blocks, fact chunk carrying the true sample count). The tail block
    is edge-padded before encoding; the decoder truncates back via the
    fact count, so round-trips preserve length exactly."""
    ints = np.asarray(ints, dtype=np.int16)
    n = len(ints)
    if n == 0:
        raise ValueError("cannot encode an empty signal")
    n_blocks = (n + SAMPLES_PER_BLOCK - 1) // SAMPLES_PER_BLOCK
    padded = np.full(n_blocks * SAMPLES_PER_BLOCK, ints[-1],
                     dtype=np.int16)
    padded[:n] = ints
    blocks = padded.reshape(n_blocks, SAMPLES_PER_BLOCK)
    pred0, index0, codes = encode_blocks(blocks)
    payload = np.empty((n_blocks, BLOCK_ALIGN), dtype=np.uint8)
    payload[:, 0] = (pred0.astype(np.uint16) & 0xFF).astype(np.uint8)
    payload[:, 1] = (pred0.astype(np.uint16) >> 8).astype(np.uint8)
    payload[:, 2] = index0.astype(np.uint8)
    payload[:, 3] = 0
    payload[:, 4:] = _pack_nibbles(codes)
    data = payload.tobytes()
    spb = SAMPLES_PER_BLOCK
    avg_bps = (sr_hz * BLOCK_ALIGN + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, sr_hz,
                      avg_bps, BLOCK_ALIGN, 4, 2, spb)
    fact = struct.pack("<I", n)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data))
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)


def encode_adpcm_wav_batch(signals: list[np.ndarray],
                           srs: list[int]) -> list[bytes]:
    """Encode MANY clips with ONE lockstep pass: every block of every
    clip is stacked into a single (total_blocks, 505) matrix, the
    504-step vector loop runs once for the whole batch, and the coded
    blocks are sliced back per clip for container packing. Identical
    bytes to per-clip :func:`encode_adpcm_wav` (block encoding has no
    cross-block state), verified in tests/test_adpcm.py."""
    mats, counts = [], []
    for ints in signals:
        ints = np.asarray(ints, dtype=np.int16)
        n = len(ints)
        nb = (n + SAMPLES_PER_BLOCK - 1) // SAMPLES_PER_BLOCK
        padded = np.full(nb * SAMPLES_PER_BLOCK, ints[-1], dtype=np.int16)
        padded[:n] = ints
        mats.append(padded.reshape(nb, SAMPLES_PER_BLOCK))
        counts.append(nb)
    if not mats:
        return []
    pred0, index0, codes = encode_blocks(np.vstack(mats))
    out, off = [], 0
    for ints, sr, nb in zip(signals, srs, counts):
        p, ix, c = (pred0[off:off + nb], index0[off:off + nb],
                    codes[off:off + nb])
        off += nb
        payload = np.empty((nb, BLOCK_ALIGN), dtype=np.uint8)
        payload[:, 0] = (p.astype(np.uint16) & 0xFF).astype(np.uint8)
        payload[:, 1] = (p.astype(np.uint16) >> 8).astype(np.uint8)
        payload[:, 2] = ix.astype(np.uint8)
        payload[:, 3] = 0
        payload[:, 4:] = _pack_nibbles(c)
        data = payload.tobytes()
        spb = SAMPLES_PER_BLOCK
        avg_bps = (sr * BLOCK_ALIGN + spb - 1) // spb
        fmt = struct.pack("<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, sr,
                          avg_bps, BLOCK_ALIGN, 4, 2, spb)
        fact = struct.pack("<I", len(ints))
        riff_size = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data))
        out.append(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
                   + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"fact" + struct.pack("<I", len(fact)) + fact
                   + b"data" + struct.pack("<I", len(data)) + data)
    return out


def decode_adpcm_wav(buf) -> tuple[np.ndarray, int]:
    """IMA-ADPCM WAV bytes → (float32 signal in [-1,1], sample rate).
    Rejects foreign payloads with ValueError (RIFF magic, then fmt tag
    0x11) so the fused kernel's container fall-through stays cheap.
    Output scale matches the PCM16 path exactly (i / 32767)."""
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
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not IMA ADPCM: fmt tag {tag}")
    if ch != 1:
        raise ValueError("only mono IMA ADPCM supported")
    (block_align,) = struct.unpack("<H", fmt_raw[12:14])
    if len(fmt_raw) >= 20:
        (spb,) = struct.unpack("<H", fmt_raw[18:20])
    else:
        spb = (block_align - 4) * 2 + 1
    if data is None or fact_n is None:
        raise ValueError("missing data/fact chunk")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        raise ValueError("empty ADPCM data chunk")
    raw = np.frombuffer(data[:n_blocks * block_align], dtype=np.uint8) \
        .reshape(n_blocks, block_align)
    pred0 = (raw[:, 0].astype(np.uint16)
             | (raw[:, 1].astype(np.uint16) << 8)).astype(np.int16)
    index0 = raw[:, 2].astype(np.int32)
    if np.any(index0 > 88):
        raise ValueError("corrupt ADPCM block header (step index > 88)")
    codes = _unpack_nibbles(raw[:, 4:])[:, :spb - 1]
    samples = decode_blocks(pred0, index0, codes).reshape(-1)[:fact_n]
    return samples.astype(np.float32) / 32767.0, sr
