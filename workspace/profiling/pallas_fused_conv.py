"""Fused 3x3 conv + noise + bias + lrelu + clamp Pallas kernel.

The space-to-depth StyleGAN2 tail (gan/fast_synthesis.py) runs 3x3
convs at 512^2 x 128ch whose outputs then take a separate elementwise
pass (noise add + bias + leaky-relu + clamp). At ~1 GB per activation
tensor that epilogue costs extra HBM round-trips per layer. This
kernel keeps the input in HBM, DMAs haloed row-blocks into VMEM,
computes the conv as 9 shifted MXU matmuls, and applies the epilogue
before the single output write.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _xla_reference(x, w, bias, noise, alpha, gain, clamp):
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if noise is not None:
        g = noise.shape[-1]
        y = (y.reshape(b, h, wd, g, co // g) + noise[..., None].astype(y.dtype)).reshape(b, h, wd, co)
    y = y + bias.astype(y.dtype)
    y = jnp.where(y >= 0, y, y * alpha) * jnp.asarray(gain, y.dtype)
    if clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    return y


def _kernel(x_hbm, w_ref, noise_ref, bias_ref, out_ref, scratch, sem, *, block_rows: int,
            width: int, wp_pad: int, c_in: int, c_out: int, alpha: float, gain: float,
            clamp: float, n_groups: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # DMA the haloed row block (block_rows + 2 padded rows) into the
    # sublane-aligned scratch (trailing pad columns stay unused)
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * block_rows, block_rows + 2)], scratch.at[:, : width + 2], sem
    )
    dma.start()
    dma.wait()

    # one matmul per row shift over the full padded width (contiguous
    # fold thanks to the aligned wp_pad), column shifts handled as
    # strided adds — Mosaic cannot reshape column-sliced windows
    acc = jnp.zeros((block_rows, width, c_out), jnp.float32)
    for dy in range(3):
        xf = scratch[dy : dy + block_rows].reshape(block_rows * wp_pad, c_in)
        # w_ref[dy]: (c_in, 3*c_out) — all three column taps, one pass
        p = jnp.dot(xf, w_ref[dy], preferred_element_type=jnp.float32)
        p3 = p.reshape(block_rows, wp_pad, 3 * c_out)
        for dx in range(3):
            acc = acc + p3[:, dx : dx + width, dx * c_out : (dx + 1) * c_out]
    if n_groups > 0:
        rep = c_out // n_groups
        acc = acc + jnp.repeat(noise_ref[...].astype(jnp.float32), rep, axis=-1)
    acc = acc + bias_ref[...].astype(jnp.float32)
    acc = jnp.where(acc >= 0, acc, acc * alpha) * gain
    if clamp >= 0:
        acc = jnp.clip(acc, -clamp, clamp)
    out_ref[...] = acc.astype(out_ref.dtype)


def fused_conv3x3_act(
    x: jax.Array,  # (B, H, W, C_in)
    w: jax.Array,  # (3, 3, C_in, C_out)
    bias: jax.Array,  # (C_out,)
    noise: Optional[jax.Array] = None,  # (B, H, W, G); broadcast over C_out // G
    alpha: float = 0.2,
    gain: float = float(np.sqrt(2.0)),
    clamp: float = 256.0,
    block_rows: int = 32,
    interpret: bool = False,
    use_pallas: bool = False,
) -> jax.Array:
    """SAME-padded 3x3 conv with fused noise/bias/lrelu/clamp epilogue.

    STATUS: the Pallas path is experimental (Mosaic currently rejects
    the collapse-reshape of the haloed VMEM window on this toolchain,
    "infer-vector-layout: unsupported shape cast") and stays opt-in
    behind use_pallas; the default XLA path is used in production."""
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    vmem_est = (block_rows + 2) * (wd + 2) * ci * x.dtype.itemsize + block_rows * wd * co * 4
    ok = (
        (use_pallas or interpret)
        and _HAVE_PALLAS
        and (on_tpu or interpret)
        and h % block_rows == 0
        and ci % 8 == 0
        and co % 8 == 0
        and vmem_est < 14 * 1024 * 1024
    )
    if not ok:
        return _xla_reference(x, w, bias, noise, alpha, gain, clamp)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n_groups = 0 if noise is None else noise.shape[-1]
    if noise is None:
        noise = jnp.zeros((b, h, wd, 8), x.dtype)
    wp_pad = -(-(wd + 2) // 8) * 8
    # pre-pack weights: (3, c_in, 3*c_out) with column taps concatenated
    w_packed = jnp.concatenate([w[:, dx] for dx in range(3)], axis=-1)  # (3, ci, 3co)

    kernel = functools.partial(
        _kernel, block_rows=block_rows, width=wd, wp_pad=wp_pad, c_in=ci, c_out=co,
        alpha=alpha, gain=gain, clamp=clamp, n_groups=n_groups,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full array in HBM
            pl.BlockSpec((3, ci, 3 * co), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((None, block_rows, wd, noise.shape[-1]), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((co,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((None, block_rows, wd, co), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2, wp_pad, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_packed.astype(x.dtype), noise, bias)
    return out
