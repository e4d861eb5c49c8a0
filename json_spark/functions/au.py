"""Sun/NeXT AU (.au / .snd) container — the engine's THIRD real audio
container, alongside canonical WAV (fixtures/signal.py) and FLAC
(functions/flac.py).

AU is the simplest spec-complete audio container in the wild (the
original Sun `audio(7)` header): six big-endian uint32 words —

    magic        '.snd'  (0x2E736E64)
    data_offset  byte offset of the first sample (>= 24; we write 28,
                 leaving a 4-byte zero annotation, the minimum the Sun
                 spec reserves for the info field)
    data_size    payload bytes, or 0xFFFFFFFF when unknown/streamed
    encoding     3 = 16-bit linear PCM (the only one this engine emits)
    sample_rate  Hz
    channels     interleaved channel count (we emit mono)

— followed by big-endian int16 frames. Everything is pure struct/numpy:
no audio library, same policy as the WAV/FLAC codecs. The container's
big-endianness (vs WAV's little-endian) is exactly why it earns a third
slot: it exercises the byte-order half of the pure-Column header surgery
(multimodal.py:be_uint) and of the Arrow decode kernel that WAV alone
cannot.

Reference parity: the d3rty reference treats *any* tolerated input shape
through one decode surface (internal/dirtyjson/decoder.go); mirroring
that, the engine's single PCM kernel (operators/snr.py:pcm_scan) accepts
WAV, FLAC, or AU per row with no caller-side dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

AU_MAGIC = b".snd"
#: 24-byte fixed header + 4-byte zero annotation (Sun's minimum info field)
AU_DATA_OFFSET = 28
AU_ENCODING_ULAW = 1
AU_ENCODING_PCM16 = 3
#: spec sentinel for "size unknown" (streamed writers)
AU_SIZE_UNKNOWN = 0xFFFFFFFF

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def ulaw_compress(ints: np.ndarray) -> np.ndarray:
    """int16 → G.711 µ-law bytes (the original AU payload encoding,
    Sun encoding tag 1) — vectorized numpy, standard bias-0x84 8-segment
    compander. The engine's first LOSSY codec with a real round-trip:
    8 bits/sample at ~36 dB SNR on full-range tonal content (measured
    worst-case over the fixture), comfortably above the 30 dB verdict
    gate yet 2x smaller than PCM16."""
    x = np.asarray(ints, dtype=np.int32)
    sign = x < 0
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7)
    mant = (mag >> (exp + 3)) & 0x0F
    u = ~((sign.astype(np.int32) << 7) | (exp << 4) | mant) & 0xFF
    return u.astype(np.uint8)


def ulaw_expand(u8: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16 (exact inverse of the segment centers:
    ``ulaw_compress(ulaw_expand(u)) == u`` for every code except 0x7F,
    negative zero, which re-encodes as positive zero 0xFF)."""
    u = (~np.asarray(u8, dtype=np.int32)) & 0xFF
    sign = u >> 7
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign == 1, -mag, mag).astype(np.int16)


def encode_au(ints: np.ndarray, sr_hz: int,
              encoding: int = AU_ENCODING_PCM16) -> bytes:
    """int16 samples → AU container bytes (mono; big-endian PCM16 by
    default, or 8-bit G.711 µ-law with ``encoding=AU_ENCODING_ULAW``).

    Deterministic layout: 28-byte header (24 fixed + 4 zero annotation)
    then 2 bytes/sample (PCM16) or 1 byte/sample (µ-law), so the
    closed-form container sizes used by the `au_header_integrity` /
    `audio_ulaw_snr` oracles are exactly ``28 + 2n`` / ``28 + n``.
    """
    pcm = np.asarray(ints, dtype=np.int16)
    if encoding == AU_ENCODING_PCM16:
        data = pcm.astype(">i2").tobytes()
    elif encoding == AU_ENCODING_ULAW:
        data = ulaw_compress(pcm).tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    header = AU_MAGIC + struct.pack(
        ">IIIII", AU_DATA_OFFSET, len(data), encoding,
        int(sr_hz), 1)
    return header + b"\x00\x00\x00\x00" + data


def parse_au_header(buf) -> dict:
    """Parse the 24-byte AU header → dict of fields.

    Raises ValueError on anything that is not a well-formed AU header —
    a wrong magic rejects instantly (so the decode chain's fall-through
    dispatch costs 4 bytes of comparison per non-AU payload).
    """
    if buf is None or len(buf) < 24:
        raise ValueError("too short for an AU header")
    if bytes(buf[:4]) != AU_MAGIC:
        raise ValueError("not an AU payload (bad magic)")
    offset, size, enc, sr, ch = struct.unpack(">IIIII", bytes(buf[4:24]))
    if offset < 24:
        raise ValueError(f"AU data offset {offset} < 24")
    return {
        "data_offset": offset,
        "data_size": size,
        "encoding": enc,
        "sample_rate": sr,
        "channels": ch,
    }


def decode_au(buf) -> tuple[np.ndarray, int]:
    """AU container bytes → (float32 signal in [-1, 1], sample rate).

    Enforces the declared layout: encoding must be 16-bit linear PCM,
    channels mono, and when ``data_size`` is declared (not the
    0xFFFFFFFF sentinel) the payload must actually contain that many
    bytes — a truncated upload whose header still claims the full
    length raises, mapping to a RED verdict in the SNR stage, the same
    contract as decode_wav_pcm16 / decode_flac.
    """
    hdr = parse_au_header(buf)
    if hdr["encoding"] not in (AU_ENCODING_PCM16, AU_ENCODING_ULAW):
        raise ValueError(f"unsupported AU encoding {hdr['encoding']}")
    if hdr["channels"] != 1:
        raise ValueError(f"unsupported AU channel count {hdr['channels']}")
    start = hdr["data_offset"]
    avail = len(buf) - start
    if avail < 0:
        raise ValueError("AU data offset beyond payload")
    width = 2 if hdr["encoding"] == AU_ENCODING_PCM16 else 1
    size = hdr["data_size"]
    if size == AU_SIZE_UNKNOWN:
        size = avail - (avail % width)
    elif avail < size:
        raise ValueError("AU payload truncated vs declared data size")
    raw = bytes(buf[start:start + size])
    if hdr["encoding"] == AU_ENCODING_PCM16:
        ints = np.frombuffer(raw, dtype=">i2")
    else:
        ints = ulaw_expand(np.frombuffer(raw, dtype=np.uint8))
    return (ints.astype(np.float32) / 32767.0), hdr["sample_rate"]
