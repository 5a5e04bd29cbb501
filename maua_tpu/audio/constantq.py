"""Constant-Q / variable-Q transform, multirate with early
downsampling — jittable per-octave pipeline.

Rebuild of `rosa/constantq.py` (multirate vqt/cqt :13-116, sparse FFT
basis :118-165) following the librosa recursive sub-sampling
algorithm: per octave, correlate the signal with that octave's complex
wavelet filterbank via FFT (one matmul against an FFT basis), then
halve the sample rate and hop and recurse. Static shapes per octave,
Python loop unrolled at trace time.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .convert import cqt_frequencies, note_to_hz
from .spectral import RISpec, frame, spec_abs, spec_concat, spec_mul_real, stft, use_real_dft


def _lowpass_kernel(numtaps: int = 64, cutoff: float = 0.5) -> np.ndarray:
    """Kaiser-windowed half-band lowpass for decimation by 2."""
    from scipy.signal import firwin

    return firwin(numtaps + 1, cutoff, window=("kaiser", 8.0)).astype(np.float32)


_DECIM_KERNEL = None


def decimate2(y: jax.Array) -> jax.Array:
    """Anti-aliased downsample by 2 (jittable FIR polyphase)."""
    global _DECIM_KERNEL
    if _DECIM_KERNEL is None:
        _DECIM_KERNEL = _lowpass_kernel()
    k = jnp.asarray(_DECIM_KERNEL)
    r = len(_DECIM_KERNEL) // 2
    yp = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(r, r)], mode="reflect")
    out = jnp.convolve(yp, k, mode="valid") if y.ndim == 1 else None
    if out is None:
        raise NotImplementedError("decimate2 expects 1-D input")
    return out[::2]


def wavelet_basis(
    freqs: np.ndarray, sr: float, Q: float, gamma: float = 0.0, alpha: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Complex wavelet filterbank in the frequency domain.

    Returns (basis (n_bins, 1+n_fft//2), lengths, n_fft); basis rows
    are FFTs of l1-normalized Hann-windowed complex exponentials."""
    if alpha is None:
        alpha = 2.0 ** (1.0 / 12) - 1
    lengths = Q * sr / (freqs + gamma / alpha)
    n_fft = int(2.0 ** np.ceil(np.log2(lengths.max())))
    basis = np.zeros((len(freqs), n_fft), np.complex64)
    for i, (f, l) in enumerate(zip(freqs, lengths)):
        li = int(np.floor(l))
        t = np.arange(li) - li // 2
        sig = np.exp(2j * np.pi * f * t / sr)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(li) + 0.5) / li)
        sig = sig * win
        sig = sig / np.sum(np.abs(sig))
        start = (n_fft - li) // 2
        basis[i, start : start + li] = sig
    fft_basis = np.fft.fft(basis * lengths[:, None] / n_fft, axis=1)[:, : 1 + n_fft // 2]
    return fft_basis.astype(np.complex64), lengths, n_fft


_TIME_BASIS_CACHE: dict = {}


def _time_basis(freqs: np.ndarray, sr: float, Q: float, gamma: float, alpha: float):
    """Fold the frame rFFT into the wavelet filterbank: the octave
    response `fft_basis @ rFFT(frames)` is `(fft_basis @ E) @ frames`
    with E the (1+n_fft//2, n_fft) DFT matrix, so the time-domain
    operator W (n_bins, n_fft) correlates frames directly — ~n_fft/2 /
    n_bins fewer MXU FLOPs per octave than materializing the full
    spectrogram, and the (1+n_fft//2, T) intermediate never exists.
    Identical math to the rFFT formulation, reassociated."""
    key = (float(sr), float(Q), float(gamma), float(alpha), np.asarray(freqs, np.float64).tobytes())
    hit = _TIME_BASIS_CACHE.get(key)
    if hit is not None:
        return hit
    basis, lengths, n_fft = wavelet_basis(freqs, sr, Q, gamma=gamma, alpha=alpha)
    # W[b, n] = sum_{f<=n_fft/2} basis[b, f] e^{-2pi i f n / n_fft} is the
    # DFT of the zero-padded half spectrum — O(n_fft log n_fft) per row
    # instead of a dense (1+n_fft/2, n_fft) DFT matrix.
    half = np.zeros((len(lengths), n_fft), np.complex128)
    half[:, : 1 + n_fft // 2] = basis
    W = np.fft.fft(half, axis=1)
    out = (W.real.astype(np.float32), W.imag.astype(np.float32), lengths, n_fft)
    _TIME_BASIS_CACHE[key] = out
    return out


def vqt(
    y: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    gamma: float = 0.0,
    filter_scale: float = 1.0,
    scale: bool = True,
) -> jax.Array:
    """Variable-Q transform (`rosa/constantq.py:13-116`).
    Returns complex (n_bins, T)."""
    if fmin is None:
        fmin = note_to_hz("C1")
    n_octaves = int(math.ceil(n_bins / bins_per_octave))
    freqs = cqt_frequencies(n_bins, fmin, bins_per_octave)
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1
    Q = filter_scale / alpha

    responses = []
    my, msr, mhop = y, float(sr), hop_length
    for octv in range(n_octaves):
        hi = n_bins - bins_per_octave * octv
        lo = max(hi - bins_per_octave, 0)
        f_oct = freqs[lo:hi]
        w_re, w_im, lengths, n_fft = _time_basis(f_oct, msr, Q, gamma, alpha)
        yp = jnp.pad(my, [(0, 0)] * (my.ndim - 1) + [(n_fft // 2, n_fft // 2)], mode="reflect")
        # strided correlation with the time-domain wavelets as one
        # time-major matmul: (T, n_fft) gcd-block frames against the
        # (n_fft, 2*bins) stacked re/im operator. lax.conv computes
        # the same thing marginally faster but costs ~76 s of XLA
        # compile per octave shape on the TPU backend; the matmul
        # compiles in seconds and rides the MXU just as well.
        wk = jnp.asarray(np.concatenate([w_re, w_im], 0).T)  # (n_fft, 2*bins)
        fr = frame(yp, n_fft, mhop, time_major=True)  # (..., T, n_fft)
        out = jnp.swapaxes(fr @ wk, -1, -2)  # (..., 2*bins, T)
        re, im = jnp.split(out, 2, axis=-2)
        resp = RISpec(re, im) if use_real_dft() else re + 1j * im
        responses.append((resp, np.asarray(lengths)))
        if mhop % 2 == 0 and octv < n_octaves - 1 and my.shape[-1] >= 2 * n_fft:
            my = decimate2(my) * np.sqrt(2.0)
            msr /= 2.0
            mhop //= 2
    # align frame counts and stack low->high
    min_t = min(r.shape[-1] for r, _ in responses)
    C = spec_concat([r[:, :min_t] for r, _ in reversed(responses)], axis=0)[-n_bins:]
    all_lengths = np.concatenate([l for _, l in reversed(responses)])[-n_bins:]
    if scale:
        # amplitude normalization: divide by sqrt(filter length at the
        # rate each octave was analyzed (librosa scale=True))
        C = spec_mul_real(C, 1.0 / jnp.sqrt(jnp.asarray(all_lengths))[:, None])
    return C


def cqt(
    y: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
    scale: bool = True,
) -> jax.Array:
    """Constant-Q transform = VQT with gamma 0
    (`rosa/constantq.py:13`)."""
    return vqt(
        y, sr, hop_length, fmin, n_bins, bins_per_octave, gamma=0.0, filter_scale=filter_scale, scale=scale
    )


def pseudo_cqt(
    y: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
) -> jax.Array:
    """Single-resolution CQT approximation: CQT filterbank applied to
    the magnitude STFT (librosa.pseudo_cqt) — cheap fallback."""
    if fmin is None:
        fmin = note_to_hz("C1")
    freqs = cqt_frequencies(n_bins, fmin, bins_per_octave)
    alpha = 2.0 ** (1.0 / bins_per_octave) - 1
    Q = 1.0 / alpha
    basis, lengths, n_fft = wavelet_basis(freqs, sr, Q)
    mag_basis = jnp.abs(jnp.asarray(basis))
    D = spec_abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    return mag_basis @ D
