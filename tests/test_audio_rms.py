"""RMS loudness-band invariant (registry: audio_rms_check): the
generator contract puts every clean clip's RMS in a tight band around
sqrt(sum(a_i^2)/2) ~= 0.382 and every corrupted clip above it — verified
exhaustively over a rendered fixture slice, no Spark session needed."""

import numpy as np
import pandas as pd

from json_spark.fixtures.gen import CORRUPT_EVERY, _render_batch, _row
from json_spark.fixtures.signal import decode_wav_pcm16


def test_rms_band_separates_clean_from_corrupt():
    n = 2 * CORRUPT_EVERY + 10  # covers >= 2 corrupted rows
    rendered = _render_batch(pd.DataFrame({"id": range(n)}))
    n_corrupt = 0
    for i in range(n):
        sig, _sr = decode_wav_pcm16(rendered["bytes"][i])
        rms = float(np.sqrt(np.mean(sig.astype(np.float64) ** 2)))
        if _row(i)["corrupt"]:
            n_corrupt += 1
            assert rms > 0.40, (i, rms)
            # additive uniform(-0.3,0.3): expected ~ sqrt(0.382^2+0.03)
            assert 0.40 < rms < 0.44, (i, rms)
        else:
            assert 0.30 <= rms <= 0.40, (i, rms)
            assert 0.37 < rms < 0.39, (i, rms)  # the tight analytic band
    assert n_corrupt == 2
