"""AIFF (Audio Interchange File Format) container — the engine's FOURTH
real audio container, alongside WAV (fixtures/signal.py), FLAC
(functions/flac.py) and Sun AU (functions/au.py).

AIFF is Apple's IFF-structured big-endian container: a FORM wrapper
holding tagged chunks, of which two are mandatory —

    FORM <u32be size> 'AIFF'
      COMM <u32be 18>  numChannels:u16be  numSampleFrames:u32be
                       sampleSize:u16be   sampleRate:float80be
      SSND <u32be 8+data>  offset:u32be  blockSize:u32be  PCM16be frames

What AIFF uniquely adds to the container test surface (and why it earns
the fourth slot rather than being AU-again):

- the sample rate is an 80-bit IEEE 754 extended float — the only
  mainstream audio header that stores a float rate. The codec here
  implements the integer-exact subset (sign 0, explicit-integer-bit
  mantissa): encode as ``mantissa = sr << (63-k)``, ``exp = 16383+k``
  with ``k = floor(log2 sr)``; decode via the top-32 mantissa bits, so
  the pure-Column header path can recover the exact rate with long
  arithmetic (no float parse): ``sr = hi32 >> (31-k)``.
- chunks are TAGGED and order-free, so the Python parser must walk the
  chunk list (the fall-through dispatch costs 4 bytes at the magic,
  like AU/FLAC), while the engine's own writer emits the canonical
  COMM-then-SSND layout whose fixed offsets the zero-Python Column
  rules (multimodal.py:aiff_header_columns) read directly.

Everything is pure struct/numpy — no audio library, the same policy as
the other three codecs. Reference parity: one tolerant decode surface
across container shapes (internal/dirtyjson/decoder.go), realized as
the wav/flac/au/aiff magic-gated fall-through in operators/snr.py.
"""

from __future__ import annotations

import struct

import numpy as np

AIFF_FORM = b"FORM"
AIFF_TYPE = b"AIFF"
#: canonical writer layout: 12-byte FORM header, COMM(18) at 12,
#: SSND at 38, first sample byte at 54
AIFF_HEADER_BYTES = 54


def encode_f80(value: int) -> bytes:
    """Positive integer → 80-bit IEEE 754 extended float (big-endian).

    Extended precision has an EXPLICIT integer bit: mantissa is the
    value left-justified to 64 bits, exponent biased by 16383.
    Exact for any 0 < value < 2**63.
    """
    if value <= 0:
        raise ValueError("f80 encoder handles positive integers only")
    k = value.bit_length() - 1
    mant = value << (63 - k)
    return struct.pack(">HQ", 16383 + k, mant)


def decode_f80(buf: bytes) -> int:
    """80-bit extended float (big-endian) → integer value.

    Only the integer-exact subset the encoder emits is accepted; a
    fractional mantissa residue raises (a fractional sample rate in a
    PCM header is corrupt for this engine's purposes).
    """
    if len(buf) < 10:
        raise ValueError("f80 needs 10 bytes")
    exp, mant = struct.unpack(">HQ", bytes(buf[:10]))
    if exp & 0x8000:
        raise ValueError("negative f80 sample rate")
    k = exp - 16383
    if not 0 <= k <= 62:
        raise ValueError(f"f80 exponent {k} outside integer range")
    shift = 63 - k
    if mant & ((1 << shift) - 1):
        raise ValueError("non-integer f80 sample rate")
    return mant >> shift


def encode_aiff(ints: np.ndarray, sr_hz: int) -> bytes:
    """int16 samples → AIFF container bytes (big-endian PCM16, mono).

    Canonical deterministic layout (COMM then SSND, zero SSND
    offset/blockSize): total size is exactly ``54 + 2 * n_samples``,
    the closed form the `aiff_header_integrity` oracle pins.
    """
    pcm = np.asarray(ints, dtype=np.int16)
    data = pcm.astype(">i2").tobytes()
    n = len(pcm)
    comm = b"COMM" + struct.pack(">IHIH", 18, 1, n, 16) + encode_f80(
        int(sr_hz))
    ssnd = b"SSND" + struct.pack(">III", 8 + len(data), 0, 0) + data
    body = AIFF_TYPE + comm + ssnd
    return AIFF_FORM + struct.pack(">I", len(body)) + body


def parse_aiff_header(buf) -> dict:
    """Walk the chunk list → dict of COMM fields + SSND location.

    Chunk order is free per the IFF spec (the engine's writer emits
    COMM first, but a foreign writer may not); odd-sized chunks are
    padded to even per spec. Raises ValueError on anything that is not
    a well-formed AIFF — wrong magic rejects in the first 12 bytes.
    """
    if buf is None or len(buf) < 12:
        raise ValueError("too short for an AIFF header")
    if bytes(buf[:4]) != AIFF_FORM or bytes(buf[8:12]) != AIFF_TYPE:
        raise ValueError("not an AIFF payload (bad magic)")
    form_size = struct.unpack(">I", bytes(buf[4:8]))[0]
    end = min(len(buf), 8 + form_size)
    pos = 12
    out: dict = {}
    while pos + 8 <= end:
        tag = bytes(buf[pos:pos + 8][:4])
        size = struct.unpack(">I", bytes(buf[pos + 4:pos + 8]))[0]
        body = pos + 8
        if tag == b"COMM":
            if size < 18 or body + 18 > len(buf):
                raise ValueError("truncated COMM chunk")
            ch, nf, bits = struct.unpack(">HIH", bytes(buf[body:body + 8]))
            out.update(channels=ch, n_frames=nf, sample_size=bits,
                       sample_rate=decode_f80(buf[body + 8:body + 18]))
        elif tag == b"SSND":
            if size < 8 or body + 8 > len(buf):
                raise ValueError("truncated SSND chunk")
            off, _blk = struct.unpack(">II", bytes(buf[body:body + 8]))
            out.update(ssnd_start=body + 8 + off, ssnd_bytes=size - 8 - off)
        pos = body + size + (size & 1)  # odd chunks pad to even
    if "channels" not in out:
        raise ValueError("AIFF missing COMM chunk")
    if "ssnd_start" not in out:
        raise ValueError("AIFF missing SSND chunk")
    return out


def decode_aiff(buf) -> tuple[np.ndarray, int]:
    """AIFF container bytes → (float32 signal in [-1, 1], sample rate).

    Enforces PCM16 mono and the COMM/SSND consistency contract: the
    declared frame count must be present in the SSND payload and fit
    inside the actual buffer — a truncated upload whose header still
    claims the full length raises, mapping to a RED verdict in the SNR
    stage (same contract as the other three decoders).
    """
    hdr = parse_aiff_header(buf)
    if hdr["sample_size"] != 16:
        raise ValueError(f"unsupported AIFF sample size {hdr['sample_size']}")
    if hdr["channels"] != 1:
        raise ValueError(f"unsupported AIFF channel count {hdr['channels']}")
    need = 2 * hdr["n_frames"]
    if hdr["ssnd_bytes"] < need or hdr["ssnd_start"] + need > len(buf):
        raise ValueError("AIFF payload truncated vs declared frame count")
    start = hdr["ssnd_start"]
    ints = np.frombuffer(bytes(buf[start:start + need]), dtype=">i2")
    return (ints.astype(np.float32) / 32767.0), hdr["sample_rate"]
