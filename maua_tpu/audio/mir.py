"""High-level MIR feature wrappers with reference-parity signatures.

Rebuild of `audioreactive/mir.py` (onsets :16-61, volume :64-77,
chroma :80-122, tonnetz :125-132, pitch_track :135-141, spectral_max
:145-151, pitch_dominance :154-160, pulse :163-176, tempo :183-209,
laplacian_segmentation :212-293).

The madmom 5-way onset ensemble (`mir.py:36-57`) is reimplemented
from the published onset detection function definitions (Boeck et al.)
on a log-filtered spectrogram — madmom is GPL-adjacent C/Python, so
the flux variants are built from our own STFT primitives instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.signal import percentile_clip
from . import beat as _beat
from . import chroma as _chroma
from . import pitch as _pitch
from . import segment as _segment
from .spectral import harmonic as _harmonic
from .spectral import melspectrogram, percussive as _percussive, rms as _rms, spec_abs, spec_angle, stft


# ----------------------------------------------------- onset ensemble
def _log_filterbank(sr: float, n_fft: int, bands_per_octave: int = 24, fmin: float = 30.0, fmax: float = 17000.0):
    """Triangular filterbank on a log frequency axis (madmom
    LogarithmicFilterbank equivalent)."""
    fmax = min(fmax, sr / 2)
    n_oct = np.log2(fmax / fmin)
    n_bands = int(np.floor(n_oct * bands_per_octave)) + 2
    centers = fmin * 2.0 ** (np.arange(n_bands) / bands_per_octave)
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    # snap centers to bins, dedupe
    bins = np.unique(np.round(centers / (sr / n_fft)).astype(int))
    bins = bins[(bins > 0) & (bins < len(fftfreqs))]
    fb = np.zeros((len(bins) - 2, 1 + n_fft // 2), np.float32)
    for i in range(len(bins) - 2):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        if mid > lo:
            fb[i, lo:mid] = np.linspace(0, 1, mid - lo, endpoint=False)
        if hi > mid:
            fb[i, mid:hi] = np.linspace(1, 0, hi - mid, endpoint=False)
    return fb


def onset_ensemble(y: jax.Array, sr: float, n_fft: int = 2048, hop_length: int = 512) -> jax.Array:
    """Mean of five normalized onset detection functions (replacement
    for the madmom ensemble, `audioreactive/mir.py:36-57`)."""
    D = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag = spec_abs(D)
    phase = spec_angle(D)
    fb = jnp.asarray(_log_filterbank(sr, n_fft))
    filt = (fb @ mag).T  # (T, bands)
    log_filt = jnp.log10(1.0 + 5.0 * filt)

    def hwr(x):
        return jnp.maximum(x, 0.0)

    # 1. spectral diff: sum of squared positive differences
    d = jnp.diff(filt, axis=0)
    spectral_diff = jnp.sum(jnp.square(hwr(d)), axis=1)
    # 2. spectral flux: L1 of positive differences on the log spectrogram
    dl = jnp.diff(log_filt, axis=0)
    spectral_flux = jnp.sum(hwr(dl), axis=1)
    # 3. superflux: flux against a frequency-max-filtered trailing frame
    pad = jnp.pad(log_filt, ((0, 0), (1, 1)), mode="edge")
    maxfilt = jnp.maximum(jnp.maximum(pad[:, :-2], pad[:, 1:-1]), pad[:, 2:])
    superflux = jnp.sum(hwr(log_filt[2:] - maxfilt[:-2]), axis=1)
    superflux = jnp.concatenate([superflux[:1], superflux])
    # 4. complex flux: complex-domain deviation from phase prediction
    # (computed on real parts only — complex dtypes are unavailable on
    # the TPU relay: |m2 e^{i p2} - m1 e^{i tp}| expanded via cos/sin)
    mag_t = mag.T
    phase_t = phase.T
    target_phase = 2 * phase_t[1:-1] - phase_t[:-2]
    d_re = mag_t[2:] * jnp.cos(phase_t[2:]) - mag_t[1:-1] * jnp.cos(target_phase)
    d_im = mag_t[2:] * jnp.sin(phase_t[2:]) - mag_t[1:-1] * jnp.sin(target_phase)
    cdev = jnp.sqrt(d_re * d_re + d_im * d_im)
    complex_flux = (fb @ cdev.T).T.sum(axis=1)
    complex_flux = jnp.concatenate([complex_flux[:1], complex_flux])
    # 5. modified Kullback-Leibler divergence between successive frames
    mkl = jnp.sum(jnp.log(1.0 + filt[1:] / (filt[:-1] + 0.03)), axis=1)

    feats = [spectral_diff, spectral_flux, superflux, complex_flux, mkl]
    T = min(f.shape[0] for f in feats)
    stack = jnp.stack([f[:T] / jnp.maximum(jnp.max(f[:T]), 1e-10) for f in feats])
    return jnp.mean(stack, axis=0)


def onsets(audio, sr, type: str = "mm", prepercussive: int = 4) -> jax.Array:
    """Onset envelope (`audioreactive/mir.py:16-61`): optional
    percussive pre-separation, flux ensemble ('mm') or plain
    onset_strength ('rosa'), then 95th-peak-percentile clip."""
    y = jnp.asarray(audio)
    if prepercussive:
        y = _percussive(y, margin=float(prepercussive))
    if type == "rosa":
        onset = _beat.onset_strength(y, sr=sr)
    else:
        onset = onset_ensemble(y, sr)
    return percentile_clip(onset, 95.0)


def volume(audio, sr) -> jax.Array:
    """RMS envelope normalized to [0, 1]
    (`audioreactive/mir.py:64-77`)."""
    vol = _rms(jnp.asarray(audio))
    vol = vol - vol.min()
    return vol / jnp.maximum(vol.max(), 1e-10)


def chroma(
    audio, sr, type: str = "cens", nearest_neighbor: bool = True, preharmonic: int = 4, notes: int = 12
) -> jax.Array:
    """Chromagram of the harmonic component, (T, notes)
    (`audioreactive/mir.py:80-122`)."""
    y = jnp.asarray(audio)
    if preharmonic:
        y = _harmonic(y, margin=float(preharmonic))
    if type == "cqt":
        ch = _chroma.chroma_cqt(y, sr=sr)
    elif type == "stft":
        ch = _chroma.chroma_stft(y, sr=sr)
    else:
        if type not in ("cens",):
            print(f"chroma type {type} not available, options are [cens, cqt, stft]. defaulting to cens...")
        ch = _chroma.chroma_cens(y, sr=sr)
    if nearest_neighbor:
        ch = jnp.minimum(ch, _chroma.nn_filter_cosine_median(ch))
    ch = ch.T  # (T, 12)
    if notes < 12:
        order = jnp.argsort(-ch.sum(axis=0))
        ch = ch[:, order[:notes]]
    ch = ch - ch.min()
    return ch / (ch.max() + 1e-8)


def tonnetz(audio, sr, type: str = "cens", nearest_neighbor: bool = True, preharmonic: int = 4) -> jax.Array:
    """(T, 6) tonal centroids (`audioreactive/mir.py:125-132`)."""
    ch = chroma(audio, sr, type=type, nearest_neighbor=nearest_neighbor, preharmonic=preharmonic)
    ton = _chroma.tonnetz(ch.T).T
    ton = ton - ton.min()
    return ton / jnp.maximum(ton.max(), 1e-10)


def pitch_track(audio, sr, preharmonic: int = 4) -> jax.Array:
    """(`audioreactive/mir.py:135-141`)"""
    y = jnp.asarray(audio)
    if preharmonic:
        y = _harmonic(y, margin=float(preharmonic))
    return _pitch.pitch_track_envelope(y, sr=sr)


def spectral_max(audio, sr, n_mels: int = 512) -> jax.Array:
    """(`audioreactive/mir.py:145-151`)"""
    spec = melspectrogram(jnp.asarray(audio), sr, n_mels=n_mels)
    spec = jnp.amax(spec, axis=0)
    spec = spec - spec.min()
    return spec / jnp.maximum(spec.max(), 1e-10)


def pitch_dominance(audio, sr, type: str = "cens", nearest_neighbor: bool = True, preharmonic: int = 4) -> jax.Array:
    """Pitch classes sorted by dominance (`audioreactive/mir.py:154-160`)."""
    ch = chroma(audio, sr, type=type, nearest_neighbor=nearest_neighbor, preharmonic=preharmonic)
    norm = ch / jnp.maximum(ch.sum(axis=1, keepdims=True), 1e-10)
    return jnp.argsort(-norm.sum(axis=0))


def pulse(audio, sr, prior: str = "lognorm", type: str = "mm", prepercussive: int = 4) -> jax.Array:
    """Predominant local pulse curve (`audioreactive/mir.py:163-176`)."""
    onset_env = onsets(audio, sr, type=type, prepercussive=prepercussive)
    fps = onset_env.shape[0] / (len(np.asarray(audio)) / sr)
    tempo_min, tempo_max = (30.0, 300.0)
    pul = _beat.plp(onset_env, sr=fps, hop_length=1, tempo_min=tempo_min, tempo_max=tempo_max)
    mx = jnp.max(jnp.abs(pul))
    return pul / jnp.maximum(mx, 1e-10)


def round_to_nearest_half(number: float) -> float:
    return round(number * 2) / 2


def tempo(audio, sr, prior: str = "uniform", type: str = "mm", prepercussive: int = 4):
    """Tempo candidates in BPM (`audioreactive/mir.py:183-209`):
    primary estimate + autocorrelation-peak candidates folded into
    [80, 200], all rounded to nearest half BPM."""
    onset_env = onsets(audio, sr, type=type, prepercussive=prepercussive)
    fps = onset_env.shape[0] / (len(np.asarray(audio)) / sr)

    ac = _beat.autocorrelate(onset_env, max_size=512)
    ac = ac / jnp.maximum(jnp.max(jnp.abs(ac)), 1e-10)
    ac_np = np.asarray(ac)
    # local maxima of the autocorrelation (librosa-style peak picking);
    # a plain top-k would return the ~10 samples around the single
    # global maximum instead of distinct tempo candidates
    is_peak = np.zeros(len(ac_np), bool)
    is_peak[1:-1] = (ac_np[1:-1] >= ac_np[:-2]) & (ac_np[1:-1] >= ac_np[2:])
    cand = np.where(is_peak)[0]
    peaks = cand[np.argsort(-ac_np[cand])][:10]
    peaks = peaks[(peaks > 3) & (peaks < len(ac_np))]
    from .convert import tempo_frequencies

    tempos_ac = tempo_frequencies(512, hop_length=1, sr=fps)[peaks]
    for t in range(len(tempos_ac)):
        while tempos_ac[t] < 80:
            tempos_ac[t] *= 2
        while tempos_ac[t] > 200:
            tempos_ac[t] /= 2

    main = float(_beat.tempo(onset_env, sr=fps, hop_length=1))
    return [round_to_nearest_half(b) for b in (main, *tempos_ac)]


def laplacian_segmentation(audio, sr, k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """(`audioreactive/mir.py:212-293`)"""
    return _segment.laplacian_segmentation(jnp.asarray(audio), sr, k=k)
