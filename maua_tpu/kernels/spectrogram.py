"""Fused mel-spectrogram kernels for TPU.

The BASELINE names "maua/audio's STFT/mel ... as fused Pallas
spectrogram kernels". On TPU the fast formulation is DFT-as-matmul:
framing -> (window ⊙ frame) @ [cos|sin] DFT bases -> |.|^2 -> @ mel
basis, which runs entirely on the MXU (an FFT would serialize on the
VPU). Two implementations:

* `melspectrogram_mxu` — jnp matmuls; XLA fuses window/square/add.
* `melspectrogram_pallas` — one Pallas kernel, blocked over frames x
  frequency chunks with the power spectrum kept in VMEM (never
  materialized in HBM).

Both match `maua_tpu.audio.spectral.melspectrogram` (the rfft
reference) to float tolerance.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.convert import mel_filterbank


def _dft_bases(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _frame_centered(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    pads = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pads, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    if n_fft % hop == 0:
        # gather-free framing: overlapping frames are concatenations of
        # consecutive hop-sized blocks (TPU gathers are very slow)
        k = n_fft // hop
        n_blocks = y.shape[-1] // hop
        blocks = y[..., : n_blocks * hop].reshape(y.shape[:-1] + (n_blocks, hop))
        parts = [blocks[..., i : n_blocks - k + 1 + i, :] for i in range(k)]
        frames = jnp.concatenate(parts, axis=-1)
        return frames[..., :n_frames, :]
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[..., idx]  # (..., T, n_fft)


def melspectrogram_mxu(
    y: jax.Array,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 1024,
    n_mels: int = 128,
    power: float = 2.0,
    fmax: Optional[float] = None,
    drop_last_frame: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """MXU mel-spectrogram (matmul DFT). Returns (n_mels, T) matching
    audio.spectral.melspectrogram (which drops the final frame,
    `rosa/spectral.py:59-62`)."""
    cosb, sinb = _dft_bases(n_fft)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)
    mel_b = mel_filterbank(sr, n_fft, n_mels=n_mels, fmax=fmax)

    frames = _frame_centered(y, n_fft, hop_length)
    if drop_last_frame:
        frames = frames[..., :-1, :]
    fw = (frames * window).astype(dtype)
    re = fw @ jnp.asarray(cosb, dtype)
    im = fw @ jnp.asarray(sinb, dtype)
    p = (re.astype(jnp.float32) ** 2 + im.astype(jnp.float32) ** 2)
    if power != 2.0:
        p = p ** (power / 2.0)
    return (p @ jnp.asarray(mel_b.T)).T


try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _mel_kernel(frames_ref, cos_ref, sin_ref, melb_ref, out_ref, *, n_freq_blocks: int, fb: int):
    """One program = one block of frames; loops over frequency chunks
    keeping the power spectrum in registers/VMEM."""
    fw = frames_ref[...]  # (BT, n_fft) pre-windowed
    acc = jnp.zeros((fw.shape[0], out_ref.shape[1]), jnp.float32)

    def body(i, acc):
        cosb = cos_ref[:, pl.ds(i * fb, fb)]
        sinb = sin_ref[:, pl.ds(i * fb, fb)]
        re = jnp.dot(fw, cosb, preferred_element_type=jnp.float32)
        im = jnp.dot(fw, sinb, preferred_element_type=jnp.float32)
        p = re * re + im * im
        melb = melb_ref[pl.ds(i * fb, fb), :]
        return acc + jnp.dot(p, melb, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_freq_blocks, body, acc)
    out_ref[...] = acc


def melspectrogram_pallas(
    y: jax.Array,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 1024,
    n_mels: int = 128,
    fmax: Optional[float] = None,
    drop_last_frame: bool = True,
    block_frames: int = 128,
    freq_block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused Pallas mel-spectrogram (power=2). Returns (n_mels, T)."""
    if not _HAVE_PALLAS:
        return melspectrogram_mxu(y, sr, n_fft, hop_length, n_mels, 2.0, fmax, drop_last_frame)
    cosb, sinb = _dft_bases(n_fft)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)
    mel_b = mel_filterbank(sr, n_fft, n_mels=n_mels, fmax=fmax)

    frames = _frame_centered(y, n_fft, hop_length)
    if drop_last_frame:
        frames = frames[:-1]
    fw = (frames * window).astype(jnp.float32)
    t = fw.shape[0]

    # pad freq axis to a freq_block multiple, frames to block multiple
    n_freq = n_fft // 2 + 1
    n_freq_pad = -(-n_freq // freq_block) * freq_block
    cosp = np.zeros((n_fft, n_freq_pad), np.float32)
    sinp = np.zeros((n_fft, n_freq_pad), np.float32)
    cosp[:, :n_freq] = cosb
    sinp[:, :n_freq] = sinb
    melp = np.zeros((n_freq_pad, max(n_mels, 128)), np.float32)
    melp[:n_freq, :n_mels] = mel_b.T

    t_pad = -(-t // block_frames) * block_frames
    fw = jnp.pad(fw, ((0, t_pad - t), (0, 0)))

    kernel = functools.partial(_mel_kernel, n_freq_blocks=n_freq_pad // freq_block, fb=freq_block)
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // block_frames,),
        in_specs=[
            pl.BlockSpec((block_frames, n_fft), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, n_freq_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, n_freq_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_freq_pad, melp.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_frames, melp.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, melp.shape[1]), jnp.float32),
        interpret=interpret,
    )(fw, jnp.asarray(cosp), jnp.asarray(sinp), jnp.asarray(melp))
    return out[:t, :n_mels].T
