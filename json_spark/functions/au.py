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
AU_ENCODING_PCM16 = 3
#: spec sentinel for "size unknown" (streamed writers)
AU_SIZE_UNKNOWN = 0xFFFFFFFF


def encode_au(ints: np.ndarray, sr_hz: int) -> bytes:
    """int16 samples → AU container bytes (big-endian PCM16, mono).

    Deterministic layout: 28-byte header (24 fixed + 4 zero annotation)
    then 2 bytes/sample, so the closed-form container size used by the
    `au_header_integrity` / `audio_au_roundtrip` oracles is exactly
    ``28 + 2 * n_samples``.
    """
    pcm = np.asarray(ints, dtype=np.int16)
    data = pcm.astype(">i2").tobytes()
    header = AU_MAGIC + struct.pack(
        ">IIIII", AU_DATA_OFFSET, len(data), AU_ENCODING_PCM16,
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
    if hdr["encoding"] != AU_ENCODING_PCM16:
        raise ValueError(f"unsupported AU encoding {hdr['encoding']}")
    if hdr["channels"] != 1:
        raise ValueError(f"unsupported AU channel count {hdr['channels']}")
    start = hdr["data_offset"]
    avail = len(buf) - start
    if avail < 0:
        raise ValueError("AU data offset beyond payload")
    size = hdr["data_size"]
    if size == AU_SIZE_UNKNOWN:
        size = avail - (avail % 2)
    elif avail < size:
        raise ValueError("AU payload truncated vs declared data size")
    ints = np.frombuffer(bytes(buf[start:start + size]), dtype=">i2")
    return (ints.astype(np.float32) / 32767.0), hdr["sample_rate"]
