"""Spectral-flatness (Wiener entropy) invariant (registry:
audio_spectral_flatness): the 3-tone generator contract keeps every
clean clip's flatness near 0 while the planted uniform-noise corruption
pushes it past the white-noise scale — verified exhaustively over a
rendered fixture slice (no Spark session), plus the Arrow kernel's
null-payload stance."""

import numpy as np
import pandas as pd

from json_spark.fixtures.gen import CORRUPT_EVERY, _render_batch, _row
from json_spark.fixtures.signal import decode_wav_pcm16

THRESHOLD = 0.04  # log-midpoint of clean max 0.016 / corrupt min 0.095


def _flatness(sig: np.ndarray) -> float:
    p = np.abs(np.fft.rfft(sig.astype(np.float64))) ** 2
    p = p[1:]
    g = float(np.exp(np.mean(np.log(p + 1e-20))))
    return g / (float(np.mean(p)) + 1e-20)


def test_flatness_separates_clean_from_corrupt():
    n = 2 * CORRUPT_EVERY + 10  # covers >= 2 corrupted rows
    rendered = _render_batch(pd.DataFrame({"id": range(n)}))
    n_corrupt = 0
    for i in range(n):
        sig, _sr = decode_wav_pcm16(rendered["bytes"][i])
        f = _flatness(sig)
        if _row(i)["corrupt"]:
            n_corrupt += 1
            assert f > 2 * THRESHOLD, (i, f)  # corrupt min 0.095 > 0.08
        else:
            assert f < THRESHOLD / 2, (i, f)  # clean max 0.016 < 0.02
    assert n_corrupt == 2


def test_spectral_flatness_kernel_nulls(spark):
    from json_spark.operators.multimodal import spectral_flatness
    df = spark.createDataFrame(
        [("c1", "pcm_s16le", None), ("c2", "pcm_s16le", b"not a wav")],
        "clip_id string, codec string, bytes binary")
    rows = {r["clip_id"]: r for r in spectral_flatness(df).collect()}
    assert rows["c1"]["flatness"] is None  # null payload -> null, no kill
    assert rows["c2"]["flatness"] is None  # undecodable -> null
