#!/usr/bin/env python
"""Audio feature extraction benchmark (BASELINE config #1).

Times the envelope set the audio-reactive patches use — onsets (madmom
-role spectral-flux ensemble), chroma (CENS), rms, plus the fused MXU
mel-spectrogram kernel — over 3 minutes of 44.1 kHz audio, end to end
(host audio -> device features fetched back). The reference computes
these on CPU via librosa/madmom (`audioreactive/mir.py:16-122`); here
they are jitted device programs (`maua_tpu/audio`,
`kernels/spectrogram.py`).

Prints ONE JSON line like bench.py.
"""

import json
import os
import sys
import time


def main():
    import jax

    from maua_tpu.utility import enable_compilation_cache

    enable_compilation_cache()  # opt-in via MAUA_COMPILE_CACHE
    import jax.numpy as jnp
    import numpy as np

    from maua_tpu import audiovisual
    from maua_tpu.audiovisual import audioreactive as ar
    from maua_tpu.kernels.spectrogram import melspectrogram_mxu

    sr = 44100
    minutes = float(os.environ.get("MAUA_BENCH_AUDIO_MINUTES", "3"))
    n = int(sr * 60 * minutes)
    rng = np.random.RandomState(0)
    t = np.arange(n) / sr
    audio = (
        0.4 * np.sin(2 * np.pi * 110 * t)
        + 0.2 * np.sin(2 * np.pi * 220 * t * (1 + 0.01 * np.sin(2 * np.pi * 0.25 * t)))
        + 0.1 * rng.randn(n)
    ).astype(np.float32)
    n_frames = int(24 * 60 * minutes)

    def extract(y):
        y = jnp.asarray(y)  # ONE host->device upload; features share it
        feats = {
            "onsets": ar.onsets(y, sr, n_frames),
            "rms": ar.rms(y, sr, n_frames),
            "chroma": ar.chroma(y, sr, n_frames),
            "mel": melspectrogram_mxu(y, sr=sr),
        }
        return feats

    # warm (compile)
    feats = extract(audio)
    sync = float(sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values()))
    assert np.isfinite(sync)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        feats = extract(audio)
        float(sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values()))
        times.append(time.perf_counter() - t0)

    secs = min(times)
    print(json.dumps({
        "metric": "audio_feature_extraction_3min_sec",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(60 * minutes / secs, 2),  # x realtime
    }))


if __name__ == "__main__":
    sys.exit(main())
