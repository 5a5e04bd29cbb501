"""Per-stage TPU timings for the envelope-extraction pipeline.

Run from /root/repo: python workspace/profiling/bench_audio_stages.py
Times each MIR stage on the real chip with scalar-fetch sync, sharing
one device-resident track (the bench's upload-once pattern).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from maua_tpu.audio import mir
    from maua_tpu.audio.spectral import harmonic, hpss, percussive, spec_abs, stft
    from maua_tpu.audio.constantq import cqt
    from maua_tpu.audio.chroma import chroma_cens, nn_filter_cosine_median
    from maua_tpu.audiovisual import audioreactive as ar

    sr = 44100
    n = sr * 180
    rng = np.random.RandomState(0)
    audio = (0.4 * np.sin(2 * np.pi * 110 * np.arange(n) / sr) + 0.1 * rng.randn(n)).astype(np.float32)
    y = jnp.asarray(audio)
    float(jnp.sum(y))  # force upload

    def t(name, f):
        r = f()
        first = None
        t0 = time.perf_counter()
        r = f()
        _sync(r)
        print(f"{name}: {time.perf_counter() - t0:.3f}s", flush=True)
        return r

    def _sync(r):
        if isinstance(r, tuple):
            r = r[0]
        float(jnp.sum(jnp.abs(r).astype(jnp.float32)))

    D = stft(y, n_fft=2048, hop_length=512)
    mag = spec_abs(D)
    _sync(mag)
    t("hpss_masks(2048xT)", lambda: hpss(mag, mask=True, margin=8.0)[0])
    h = t("harmonic_full", lambda: harmonic(y, margin=4.0))
    t("percussive_full", lambda: percussive(y, margin=4.0))
    t("cqt84", lambda: spec_abs(cqt(h, sr=sr, hop_length=512, n_bins=84)))
    ch = t("chroma_cens(252bin)", lambda: chroma_cens(h, sr=sr, hop_length=512))
    t("nn_filter", lambda: nn_filter_cosine_median(ch))
    p = percussive(y, margin=4.0)
    t("onset_ensemble", lambda: mir.onset_ensemble(p, sr))
    n_frames = 24 * 180
    t("ar.rms", lambda: ar.rms(y, sr, n_frames))
    t("ar.onsets", lambda: ar.onsets(y, sr, n_frames))
    t("ar.chroma", lambda: ar.chroma(y, sr, n_frames))


if __name__ == "__main__":
    main()
