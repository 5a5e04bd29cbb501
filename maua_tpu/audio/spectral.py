"""Spectral features: STFT, mel, MFCC, HPSS, RMS — jittable.

Rebuild of `rosa/spectral.py` (stft/istft :10-33, FFT-based dct
:35-56, spectrogram :59-62, melspectrogram :65-78, magphase :113-120,
softmask :123-142, hpss :145-161) with librosa-compatible semantics.
These are the ops the BASELINE names as the fused-Pallas-spectrogram
target; the jnp forms here are the reference implementations the
kernels are verified against.
"""

from __future__ import annotations

import functools
import math
import os

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .convert import mel_filterbank, power_to_db


def hann_window(n: int) -> jnp.ndarray:
    """Periodic Hann (torch.hann_window / scipy periodic)."""
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def frame(y: jax.Array, frame_length: int, hop_length: int, time_major: bool = False) -> jax.Array:
    """(..., T) -> (..., frame_length, n_frames) sliding frames
    (or (..., n_frames, frame_length) with time_major=True, which
    skips the final transpose — feed it to a right-matmul instead).

    When gcd(frame_length, hop) is large enough, frames assemble from
    consecutive gcd-blocks with slices/concat only — TPU gathers are an
    order of magnitude slower (see kernels/spectrogram.py)."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop_length
    g = math.gcd(frame_length, hop_length)
    k, s = frame_length // g, hop_length // g
    if g >= 8:
        # decompose into gcd-sized blocks: frame i = k consecutive
        # blocks starting at block i*s. Covers frame%hop==0 (g=hop,
        # s=1) AND hop%frame==0 / mixed cases (e.g. the CQT octaves'
        # small-window STFTs), keeping every consumer off TPU gathers.
        # need is a multiple of g (hop and frame_length both are) and
        # <= T by the n_frames definition, so the slice always fits.
        need = (n_frames - 1) * hop_length + frame_length
        n_blocks = need // g
        blocks = y[..., :need].reshape(y.shape[:-1] + (n_blocks, g))
        last = (n_frames - 1) * s
        parts = [blocks[..., i : last + i + 1 : s, :] for i in range(k)]
        frames = jnp.concatenate(parts, axis=-1)
        return frames if time_major else jnp.swapaxes(frames, -1, -2)
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[None, :] + jnp.arange(frame_length)[:, None]
    return jnp.swapaxes(y[..., idx], -1, -2) if time_major else y[..., idx]


# --------------------------------------------------------- real-DFT seam
# The axon TPU relay implements neither complex dtypes nor FFT ops
# (jnp.fft.* and complex64 arithmetic fail with UNIMPLEMENTED, and a
# failed call poisons the runtime, so probing is unsafe). The fused mel
# kernel (`kernels/spectrogram.py`) already established DFT-by-matmul
# is *faster* than gather/FFT formulations at audio sizes on the MXU,
# so on TPU backends `stft` returns an `RISpec` (re, im) pair computed
# by cos/sin matmuls, and every in-package consumer goes through the
# `spec_*` helpers, which accept both complex arrays and RISpec.
# Override with MAUA_AUDIO_FFT={complex,real}; CPU defaults to the
# complex path (bit-compatible with the original librosa-parity tests).


class RISpec(NamedTuple):
    """A complex spectrum as separate real/imag float arrays."""

    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def __getitem__(self, idx):
        return RISpec(self.re[idx], self.im[idx])


SpecLike = Union[jax.Array, RISpec]


def use_real_dft() -> bool:
    mode = os.environ.get("MAUA_AUDIO_FFT", "auto")
    if mode == "real":
        return True
    if mode == "complex":
        return False
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _rdft_bases(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """np.fft.rfft as matmuls: re = x @ C.T, im = x @ S.T (sign matches
    X[k] = sum_t x[t] e^{-2i pi k t / n})."""
    k = np.arange(1 + n // 2)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irdft_bases(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """np.fft.irfft as matmuls: x = re @ Cw + im @ Sw, using hermitian
    symmetry (interior bins doubled; DC and nyquist not)."""
    n_freq = 1 + n // 2
    k = np.arange(n_freq)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    w = np.full((n_freq, 1), 2.0 / n)
    w[0] = 1.0 / n
    if n % 2 == 0:
        w[-1] = 1.0 / n
    return (np.cos(ang) * w).astype(np.float32), (-np.sin(ang) * w).astype(np.float32)


def rfft_real(x: jax.Array, n: Optional[int] = None, axis: int = -1) -> RISpec:
    """Matmul rfft of a real array along `axis` (zero-pads to n)."""
    length = x.shape[axis]
    if n is not None and n != length:
        pads = [(0, 0)] * x.ndim
        pads[axis % x.ndim] = (0, n - length)
        x = jnp.pad(x, pads)
    else:
        n = length
    C, S = _rdft_bases(n)
    re = jnp.moveaxis(jnp.tensordot(x, jnp.asarray(C), axes=[[axis % x.ndim], [1]]), -1, axis)
    im = jnp.moveaxis(jnp.tensordot(x, jnp.asarray(S), axes=[[axis % x.ndim], [1]]), -1, axis)
    return RISpec(re, im)


def irfft_real(spec: RISpec, n: int, axis: int = -1) -> jax.Array:
    """Matmul irfft (inverse of rfft_real / np.fft.rfft) along `axis`."""
    Cw, Sw = _irdft_bases(n)
    ax = axis % spec.re.ndim
    x = jnp.tensordot(spec.re, jnp.asarray(Cw), axes=[[ax], [0]]) + jnp.tensordot(
        spec.im, jnp.asarray(Sw), axes=[[ax], [0]]
    )
    return jnp.moveaxis(x, -1, axis)


def spec_abs(D: SpecLike) -> jax.Array:
    if isinstance(D, RISpec):
        return jnp.sqrt(D.re * D.re + D.im * D.im)
    return jnp.abs(D)


def spec_angle(D: SpecLike) -> jax.Array:
    if isinstance(D, RISpec):
        return jnp.arctan2(D.im, D.re)
    return jnp.angle(D)


def spec_mul_real(D: SpecLike, r: jax.Array) -> SpecLike:
    """Scale a spectrum by a real array (masking, normalization)."""
    if isinstance(D, RISpec):
        return RISpec(D.re * r, D.im * r)
    return D * r


def spec_concat(specs, axis: int = 0) -> SpecLike:
    if isinstance(specs[0], RISpec):
        return RISpec(
            jnp.concatenate([s.re for s in specs], axis=axis),
            jnp.concatenate([s.im for s in specs], axis=axis),
        )
    return jnp.concatenate(specs, axis=axis)


def spec_matmul(B: np.ndarray, D: SpecLike) -> SpecLike:
    """Left-multiply a spectrum by a (possibly complex) numpy basis."""
    if isinstance(D, RISpec):
        Br = jnp.asarray(np.ascontiguousarray(B.real.astype(np.float32)))
        Bi = jnp.asarray(np.ascontiguousarray(B.imag.astype(np.float32)))
        return RISpec(Br @ D.re - Bi @ D.im, Br @ D.im + Bi @ D.re)
    return jnp.asarray(B) @ D


def stft(
    y: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 1024,
    center: bool = True,
    window: Optional[jax.Array] = None,
    pad_mode: str = "reflect",
) -> SpecLike:
    """STFT, shape (..., 1 + n_fft//2, n_frames)
    (`rosa/spectral.py:10-21`, torch.stft semantics). Complex on CPU;
    an RISpec (re, im) pair on TPU backends (see real-DFT seam above)."""
    if window is None:
        window = hann_window(n_fft)
    if center:
        pads = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pads, mode=pad_mode)
    frames = frame(y, n_fft, hop_length)  # (..., n_fft, T)
    frames = frames * window[:, None]
    if use_real_dft():
        return rfft_real(frames, axis=-2)
    return jnp.fft.rfft(frames, axis=-2)


def istft(
    spec: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 1024,
    center: bool = True,
    window: Optional[jax.Array] = None,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT via windowed overlap-add
    (`rosa/spectral.py:24-33`, torch.istft semantics)."""
    if window is None:
        window = hann_window(n_fft)
    if isinstance(spec, RISpec):
        frames = irfft_real(spec, n_fft, axis=-2) * window[:, None]
    else:
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-2) * window[:, None]  # (..., n_fft, T)
    n_frames = frames.shape[-1]
    out_len = n_fft + hop_length * (n_frames - 1)

    idx = (jnp.arange(n_fft)[:, None] + jnp.arange(n_frames)[None, :] * hop_length).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (-1,))
    y = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype).at[..., idx].add(flat)
    wsum = jnp.zeros((out_len,), window.dtype).at[idx].add(jnp.tile(jnp.square(window)[:, None], (1, n_frames)).reshape(-1))
    y = y / jnp.maximum(wsum, 1e-11)
    if center:
        y = y[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        if y.shape[-1] < length:
            pads = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pads)
        y = y[..., :length]
    return y


@functools.lru_cache(maxsize=None)
def _dct2_basis(n: int) -> np.ndarray:
    """Direct DCT-II matrix: V[k] = 2 * sum_t x[t] cos(pi k (2t+1) / 2n)."""
    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    return (2.0 * np.cos(np.pi * k * (2 * t + 1) / (2 * n))).astype(np.float32).T


def dct(x: jax.Array, norm: Optional[str] = None) -> jax.Array:
    """DCT-II along the last axis (`rosa/spectral.py:35-56`): FFT-based
    on CPU, direct cosine matmul on TPU (no complex FFT on the relay,
    and n is small — n_mels-scale — so the matmul is the faster form
    anyway)."""
    shape = x.shape
    N = shape[-1]
    x2 = x.reshape(-1, N)
    if use_real_dft():
        V = 0.5 * (x2 @ jnp.asarray(_dct2_basis(N)))
    else:
        v = jnp.concatenate([x2[:, ::2], x2[:, 1::2][:, ::-1]], axis=1)
        Vc = jnp.fft.fft(v, axis=1)
        k = -jnp.arange(N, dtype=x.dtype)[None, :] * np.pi / (2 * N)
        V = Vc.real * jnp.cos(k) - Vc.imag * jnp.sin(k)
    if norm == "ortho":
        scale = jnp.full((N,), 1.0 / (math.sqrt(N / 2) * 2))
        scale = scale.at[0].set(1.0 / (math.sqrt(N) * 2))
        V = V * scale[None, :]
    return (2 * V).reshape(shape)


def spectrogram(
    y: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 1024,
    power: float = 1.0,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Magnitude spectrogram. NOTE: mirrors the reference's dropping of
    the final STFT frame (`rosa/spectral.py:59-62` slices [:, :-1])."""
    S = stft(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
    S = S[..., :-1]
    return spec_abs(S) ** power


def melspectrogram(
    y: jax.Array,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 1024,
    power: float = 2.0,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jax.Array:
    """(`rosa/spectral.py:65-78`): mel_basis @ spectrogram."""
    S = spectrogram(y, n_fft=n_fft, hop_length=hop_length, power=power)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax))
    return basis @ S


def magphase(D: SpecLike, power: float = 1.0) -> Tuple[jax.Array, SpecLike]:
    """(`rosa/spectral.py:113-120`)"""
    if isinstance(D, RISpec):
        mag1 = jnp.maximum(spec_abs(D), 1e-20)
        return mag1**power, RISpec(D.re / mag1, D.im / mag1)
    mag = jnp.abs(D) ** power
    phase = jnp.exp(1.0j * jnp.angle(D))
    return mag, phase


def softmask(X: jax.Array, X_ref: jax.Array, power: float = 1.0, split_zeros: bool = False) -> jax.Array:
    """librosa.util.softmask (`rosa/spectral.py:123-142`)."""
    Z = jnp.maximum(X, X_ref)
    bad_idx = Z < jnp.finfo(Z.dtype).tiny
    Zsafe = jnp.where(bad_idx, 1.0, Z)
    if np.isfinite(power):
        ref_mask = (X_ref / Zsafe) ** power
        X_mask = (X / Zsafe) ** power
        mask = X_mask / (X_mask + ref_mask)
        fill = 0.5 if split_zeros else 0.0
        mask = jnp.where(bad_idx, fill, mask)
    else:
        mask = (X > X_ref).astype(X.dtype)
    return mask


@functools.lru_cache(maxsize=None)
def _median_network(k: int):
    """Pruned compare-exchange network selecting the median of k values.

    Bitonic sort over ceil-pow2 wires (missing wires are +inf
    sentinels), backward-pruned to the comparators that can influence
    the median output wire(s). Expressed as (i, j) pairs applied as
    (min, max) elementwise ops, the whole filter is a single XLA
    fusion over the shifted views — no (k, ...) stack in HBM and no
    variadic sort, which on TPU is what makes `jnp.median` of a
    31-deep stack the dominant cost of `hpss` (see PERFORMANCE.md).
    Returns (n_wires, comparators, out_wires): out_wires has one entry
    for odd k, two (to be averaged) for even k."""
    n = 1 << (k - 1).bit_length()
    ces = []

    def merge(lo, cnt, direction):
        if cnt > 1:
            m = cnt // 2
            for i in range(lo, lo + m):
                ces.append((i, i + m) if direction else (i + m, i))
            merge(lo, m, direction)
            merge(lo + m, m, direction)

    def sort(lo, cnt, direction):
        if cnt > 1:
            m = cnt // 2
            sort(lo, m, True)
            sort(lo + m, m, False)
            merge(lo, cnt, direction)

    sort(0, n, True)
    out = [(k - 1) // 2] if k % 2 else [k // 2 - 1, k // 2]
    live = set(out)
    kept = []
    for i, j in reversed(ces):
        if i in live or j in live:
            kept.append((i, j))
            live.update((i, j))
    kept.reverse()
    return n, tuple(kept), tuple(out)


def _median_of(values, k: int):
    """Exact median of a list of k same-shaped arrays via the pruned
    compare-exchange network (values beyond k are ignored)."""
    n, ces, out = _median_network(k)
    inf = jnp.full_like(values[0], jnp.inf)
    wires = list(values[:k]) + [inf] * (n - k)
    for i, j in ces:
        lo = jnp.minimum(wires[i], wires[j])
        hi = jnp.maximum(wires[i], wires[j])
        wires[i], wires[j] = lo, hi
    if len(out) == 1:
        return wires[out[0]]
    return 0.5 * (wires[out[0]] + wires[out[1]])


@functools.partial(jax.jit, static_argnums=(1, 2))
def _median_filter_axis(x: jax.Array, size: int, axis: int) -> jax.Array:
    """Median filter along one axis via shifted views + the selection
    network (edge-padded; exact order statistic, same as jnp.median).
    Jitted so the ~2*size*log^2(size) min/max ops fuse into one pass
    even when the surrounding pipeline runs eagerly (the MIR envelope
    extractors are op-by-op; compile cost here is one small fusion)."""
    r = size // 2
    x = jnp.moveaxis(x, axis, -1)
    pads = [(0, 0)] * (x.ndim - 1) + [(r, size - 1 - r)]
    xp = jnp.pad(x, pads, mode="edge")
    views = [xp[..., i : i + x.shape[-1]] for i in range(size)]
    med = _median_of(views, size)
    return jnp.moveaxis(med, -1, axis)


def median_filter2d(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Separable-application 2D median filter (applies per-axis medians
    when one size is 1; general case runs the full-window selection
    network, jitted so it fuses even from eager pipelines)."""
    sh, sw = size
    if sh == 1:
        return _median_filter_axis(x, sw, -1)
    if sw == 1:
        return _median_filter_axis(x, sh, -2)
    return _median_filter_2d_full(x, sh, sw)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _median_filter_2d_full(x: jax.Array, sh: int, sw: int) -> jax.Array:
    r0, r1 = sh // 2, sw // 2
    pads = [(0, 0)] * (x.ndim - 2) + [(r0, sh - 1 - r0), (r1, sw - 1 - r1)]
    xp = jnp.pad(x, pads, mode="edge")
    h, w = x.shape[-2], x.shape[-1]
    windows = [xp[..., i : i + h, j : j + w] for i in range(sh) for j in range(sw)]
    return _median_of(windows, sh * sw)


def hpss(
    S: jax.Array, kernel_size: int = 31, power: float = 2.0, mask: bool = False, margin: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    """Harmonic/percussive separation on a magnitude spectrogram
    (`rosa/spectral.py:145-161`; librosa.decompose.hpss).
    S: (freq, time)."""
    harm = _median_filter_axis(S, kernel_size, axis=-1)   # smooth over time
    perc = _median_filter_axis(S, kernel_size, axis=-2)   # smooth over freq
    split_zeros = margin == 1.0
    mask_harm = softmask(harm, perc * margin, power=power, split_zeros=split_zeros)
    mask_perc = softmask(perc, harm * margin, power=power, split_zeros=split_zeros)
    if mask:
        return mask_harm, mask_perc
    return S * mask_harm, S * mask_perc


def harmonic(y: jax.Array, margin: float = 8.0, n_fft: int = 2048, hop_length: int = 512) -> jax.Array:
    """Time-domain harmonic component (librosa.effects.harmonic;
    reference `audioreactive/audio.py:85-88`)."""
    D = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag, phase = magphase(D)
    mask_h, _ = hpss(mag, mask=True, margin=margin)
    return istft(spec_mul_real(D, mask_h), n_fft=n_fft, hop_length=hop_length, length=y.shape[-1])


def percussive(y: jax.Array, margin: float = 8.0, n_fft: int = 2048, hop_length: int = 512) -> jax.Array:
    """(reference `audioreactive/audio.py:91-94`)"""
    D = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag, phase = magphase(D)
    _, mask_p = hpss(mag, mask=True, margin=margin)
    return istft(spec_mul_real(D, mask_p), n_fft=n_fft, hop_length=hop_length, length=y.shape[-1])


def rms(y: jax.Array, frame_length: int = 2048, hop_length: int = 512, center: bool = True) -> jax.Array:
    """Frame-wise root-mean-square energy (librosa.feature.rms;
    reference volume envelope `audioreactive/mir.py:64-77`)."""
    if center:
        pads = [(0, 0)] * (y.ndim - 1) + [(frame_length // 2, frame_length // 2)]
        y = jnp.pad(y, pads, mode="constant")
    frames = frame(y, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(jnp.square(frames), axis=-2))


def mfcc(
    y: jax.Array, sr: float, n_mfcc: int = 20, n_fft: int = 2048, hop_length: int = 512, n_mels: int = 128
) -> jax.Array:
    """(selfsupervised `features/audio.py` mfcc): DCT-II(ortho) of the
    log-mel spectrogram; returns (n_mfcc, T)."""
    S = melspectrogram(y, sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)
    logS = power_to_db(S)
    return dct(logS.T, norm="ortho").T[..., :n_mfcc, :]


def spectral_contrast(
    y: jax.Array,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_bands: int = 6,
    fmin: float = 200.0,
    quantile: float = 0.02,
) -> jax.Array:
    """librosa.feature.spectral_contrast (valley/peak per octave band)."""
    S = spec_abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    out = []
    for k in range(n_bands + 1):
        f_low, f_high = octa[k], octa[k + 1]
        idx = np.flatnonzero((freqs >= f_low) & (freqs <= f_high))
        if len(idx) == 0:
            idx = np.array([0])
        sub = S[..., idx, :]
        n = max(int(np.rint(quantile * len(idx))), 1)
        srt = jnp.sort(sub, axis=-2)
        valley = jnp.mean(srt[..., :n, :], axis=-2)
        peak = jnp.mean(srt[..., -n:, :], axis=-2)
        out.append(power_to_db(peak, top_db=None) - power_to_db(valley, top_db=None))
    return jnp.stack(out, axis=-2)


def spectral_flatness(y: jax.Array, n_fft: int = 2048, hop_length: int = 512, power: float = 2.0) -> jax.Array:
    """librosa.feature.spectral_flatness: geometric/arithmetic mean."""
    S = spec_abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** power
    S = jnp.maximum(S, 1e-10)
    gmean = jnp.exp(jnp.mean(jnp.log(S), axis=-2))
    amean = jnp.mean(S, axis=-2)
    return gmean / amean
