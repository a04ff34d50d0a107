"""multimodal_audio_dft: planted pure tones land in the right DFT bin
(checked against numpy's FFT as the independent reference)."""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np

from logprep_spark.plans import catalog


def _embed_for_pcm(raw: list[int]) -> list[float]:
    # invert the synth: micro = raw + 32768 in [0, 65536) -> x
    return [(r + 32768) / 1_000_000 for r in raw]


def _expected_pcm(raw: list[int]) -> np.ndarray:
    return np.trunc(
        np.asarray(raw, dtype=np.float64) / 32768.0 * 32767.0
    ).astype(np.int64)


def test_pure_tones_dominate_their_bin(spark):
    tones = {}
    for vid, k in ((1, 2), (2, 3), (3, 1)):
        tones[vid] = [
            round(20000 * math.sin(2 * math.pi * k * n / 64))
            for n in range(64)
        ]
    rows = [
        (vid, _embed_for_pcm(raw), 0) for vid, raw in tones.items()
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label long"
        ).write.parquet(os.path.join(tmp, "embeddings.parquet"))
        got = catalog.queries()["multimodal_audio_dft"](
            spark, tmp
        ).collect()
    by = {}
    for r in got:
        by.setdefault(r["vec_id"], {})[r["bin"]] = r.asDict()
    for vid, k in ((1, 2), (2, 3), (3, 1)):
        dom = [b for b, r in by[vid].items() if r["is_dominant"]]
        assert dom == [k], (vid, dom)
        # independent reference: numpy FFT magnitudes over the exact
        # pcm the codec path decodes
        pcm = _expected_pcm(tones[vid])
        fft = np.fft.fft(pcm.astype(np.float64))
        mags = {b: abs(fft[b]) for b in range(1, 5)}
        assert max(mags, key=mags.get) == k
        # engine magnitudes agree with the fft within micro rounding
        for b in range(1, 5):
            re = by[vid][b]["re_micro"] / 1e6
            im = by[vid][b]["im_micro"] / 1e6
            assert abs(math.hypot(re, im) - mags[b]) < 2.0
