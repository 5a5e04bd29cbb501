"""The `ar` convenience API used by patches: frame-rate-aligned
envelopes, latent loops, smoothing.

This is the interface the reference's example patches program against
(`maua/audiovisual/patches/examples/stylegan2.py:15-68` calls
`ar.onsets(audio, sr, n_frames, margin=, clip=, smooth=)` etc. — an
API the reference's own `audioreactive/` package had drifted away
from; SURVEY.md section 2.5 flags this). We implement the patch-facing
contract: every feature is resampled to `n_frames`, percentile-clipped
and gaussian-smoothed on request.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import beat as _beat
from ..audio import chroma as _chroma
from ..audio import mir as _mir
from ..audio.io import band_pass, high_pass, load_audio, low_pass  # noqa: F401
from ..audio.latent import (  # noqa: F401
    multi_weighted,
    single_weighted,
    slerp,
    slerp_loops,
    spline_loops,
    tempo_loops,
)
from ..audio.spectral import harmonic as _harmonic
from ..audio.spectral import percussive as _percussive
from ..audio.spectral import rms as _rms
from ..ops.signal import compress, gaussian_filter, normalize, percentile_clip, resample_1d  # noqa: F401


def _postprocess(env: jax.Array, n_frames: Optional[int], clip: Optional[float], smooth: Optional[float]) -> jax.Array:
    if n_frames is not None:
        env = resample_1d(env, n_frames)
    if clip is not None:
        env = percentile_clip(env, float(clip))
    if smooth is not None and smooth > 0:
        env = gaussian_filter(env, float(smooth), causal=0.0)
        env = normalize(env)
    return env


# Each feature extractor compiles ONCE per (static-knob, input-shape)
# combination: a full-track envelope is hundreds of XLA ops, and eager
# dispatch pays the per-op round trip on remote backends (~26 ms on the
# axon relay — the difference between minutes and seconds for one
# process_audio). lru_cache holds the jitted program per knob tuple.
@functools.lru_cache(maxsize=None)
def _onsets_prog(sr, n_frames, margin, clip, smooth, type):
    def f(y):
        if margin:
            y = _percussive(y, margin=float(margin))
        env = _mir.onset_ensemble(y, sr) if type == "mm" else _beat.onset_strength(y, sr=sr)
        return _postprocess(env, n_frames, clip, smooth)

    return jax.jit(f)


def onsets(
    audio, sr, n_frames: Optional[int] = None, margin: float = 2.0, clip: Optional[float] = 95.0,
    smooth: Optional[float] = 2.0, type: str = "mm",
) -> jax.Array:
    """Frame-aligned onset envelope in [0, 1]."""
    return _onsets_prog(float(sr), n_frames, float(margin),
                        None if clip is None else float(clip),
                        None if smooth is None else float(smooth), type)(jnp.asarray(audio))


@functools.lru_cache(maxsize=None)
def _rms_prog(n_frames, smooth, clip, power):
    def f(y):
        env = _rms(y) ** power
        return _postprocess(env, n_frames, clip, smooth)

    return jax.jit(f)


def rms(
    audio, sr, n_frames: Optional[int] = None, smooth: Optional[float] = 5.0, clip: Optional[float] = 95.0,
    power: float = 1.0,
) -> jax.Array:
    """Frame-aligned loudness envelope in [0, 1]."""
    return _rms_prog(n_frames, None if smooth is None else float(smooth),
                     None if clip is None else float(clip), float(power))(jnp.asarray(audio))


@functools.lru_cache(maxsize=None)
def _chroma_prog(sr, n_frames, margin, type, notes):
    def f(y):
        ch = _mir.chroma(y, sr, type=type, preharmonic=margin, notes=notes)
        if n_frames is not None:
            ch = resample_1d(ch, n_frames)
        return ch

    return jax.jit(f)


_CHROMA_EAGER_TYPES: set = set()


def chroma(
    audio, sr, n_frames: Optional[int] = None, margin: float = 2.0, type: str = "cens", notes: int = 12,
) -> jax.Array:
    """Frame-aligned chromagram (n_frames, notes)."""
    y = jnp.asarray(audio)
    if type not in _CHROMA_EAGER_TYPES:
        try:
            return _chroma_prog(float(sr), n_frames, float(margin), type, int(notes))(y)
        except jax.errors.TracerArrayConversionError:
            # this variant builds a data-dependent numpy table (tuning
            # estimated from the audio, e.g. type="stft") — it cannot
            # trace; run it eagerly from now on
            _CHROMA_EAGER_TYPES.add(type)
    ch = _mir.chroma(y, sr, type=type, preharmonic=margin, notes=notes)
    if n_frames is not None:
        ch = resample_1d(ch, n_frames)
    return ch


def volume(audio, sr, n_frames: Optional[int] = None, smooth: Optional[float] = None) -> jax.Array:
    env = _mir.volume(audio, sr)
    return _postprocess(env, n_frames, None, smooth)


def tempo(audio, sr, **kw):
    return _mir.tempo(audio, sr, **kw)


def pulse(audio, sr, n_frames: Optional[int] = None, **kw) -> jax.Array:
    env = _mir.pulse(audio, sr, **kw)
    return _postprocess(env, n_frames, None, None)


def laplacian_segmentation(audio, sr, k: int = 5):
    return _mir.laplacian_segmentation(audio, sr, k=k)


def separate_sources(
    audio, sr, device=None, params=None, checkpoint=None, neural: Optional[bool] = None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(vocals, drums, bass, other) source separation — the `unmix`
    role (`audioreactive/audio.py:51-76`, openunmix + Wiener niter=3).

    Neural path: the umx-style spectrogram-mask BLSTM in
    `audio/separate.py` (pass converted openunmix weights via `params`
    or a `checkpoint` dir of per-target torch state dicts). DSP
    fallback (neural=False, or no weights given): HPSS splits
    percussive (drums) from harmonic, the harmonic part is band-split
    into bass (<250 Hz), vocals (250-4k), other (rest)."""
    if neural or params is not None or checkpoint is not None:
        from ..audio import separate as umx

        cfg = umx.UMXConfig()
        if params is None and checkpoint is not None:
            import os

            import torch

            sds = {
                t: torch.load(os.path.join(checkpoint, f"{t}.pth"), map_location="cpu", weights_only=False)
                for t in umx.TARGETS
            }
            params = umx.params_from_torch(
                {t: {k: v.numpy() for k, v in sd.items()} for t, sd in sds.items()}, cfg
            )
        return umx.separate(audio, sr, params=params, cfg=cfg)
    y = jnp.asarray(audio)
    harm, perc = _hpss_prog()(y)
    drums = perc
    bass = jnp.asarray(low_pass(np.asarray(harm), sr, 250))
    vocals = jnp.asarray(band_pass(np.asarray(harm), sr, 250, 4000))
    other = harm - bass - vocals
    return vocals, drums, bass, other


@functools.lru_cache(maxsize=None)
def _hpss_prog():
    return jax.jit(lambda y: (_harmonic(y, margin=3.0), _percussive(y, margin=3.0)))


def chroma_weight_latents(chroma: jax.Array, latents: jax.Array) -> jax.Array:
    """Weighted sum of latents by chroma activations
    (the example patch's mapping recipe): (T, N), (N, L, D) -> (T, L, D)."""
    w = chroma / jnp.maximum(chroma.sum(axis=1, keepdims=True), 1e-10)
    return jnp.einsum("tn,nld->tld", w, latents)


def plot_signals(signals, path: Optional[str] = None):
    """Diagnostic plot (`audioreactive/util.py:28-103`); no-op when
    matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, axes = plt.subplots(len(signals), 1, figsize=(12, 2 * len(signals)), squeeze=False)
    for ax, sig in zip(axes[:, 0], signals):
        ax.plot(np.asarray(sig).squeeze())
    plt.tight_layout()
    plt.savefig(path or "workspace/signals.png")
    plt.close(fig)


def plot_spectra(spectra, path: Optional[str] = None):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, axes = plt.subplots(len(spectra), 1, figsize=(12, 2 * len(spectra)), squeeze=False)
    for ax, spec in zip(axes[:, 0], spectra):
        ax.imshow(np.asarray(spec).squeeze().T, aspect="auto", origin="lower")
    plt.tight_layout()
    plt.savefig(path or "workspace/spectra.png")
    plt.close(fig)


def plot_audio(audio, sr: int, path: Optional[str] = None):
    """Mel-spectrogram diagnostic of an audio signal
    (`audioreactive/util.py:68-84`); no-op without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    from ..audio.convert import power_to_db
    from ..audio.spectral import melspectrogram

    mel = np.asarray(power_to_db(melspectrogram(jnp.asarray(audio), sr)))
    plt.figure(figsize=(16, 9))
    plt.imshow(mel.squeeze().T if mel.shape[0] > mel.shape[-1] else mel.squeeze(),
               aspect="auto", origin="lower")
    plt.colorbar(format="%+2.f dB")
    plt.tight_layout()
    plt.savefig(path or "workspace/audio.png")
    plt.close()


def plot_chroma_comparison(audio, sr: int, path: Optional[str] = None):
    """Side-by-side chromagram strategies
    (`audioreactive/util.py:85-103`); no-op without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(nrows=2, ncols=3, figsize=(16, 9), squeeze=False)
    for col, types in enumerate([["cens", "cqt"], ["deep", "clp"], ["stft"]]):
        for row, type in enumerate(types):
            ch = np.asarray(chroma(audio, sr, n_frames=None, type=type))
            if ch.ndim == 2 and ch.shape[1] == 12:
                ch = ch.T
            ax[row][col].imshow(ch, aspect="auto", origin="lower")
            ax[row][col].set(title=type)
    plt.tight_layout()
    plt.savefig(path or "workspace/chroma-comparison.png")
    plt.close(fig)
