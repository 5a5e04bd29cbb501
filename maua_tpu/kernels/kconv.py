"""K-packed 3x3 conv Pallas kernel for lane-starved channel counts.

XLA's TPU conv emitter contracts over Ci per kernel tap, so a 3x3 conv
with Ci/Co << 128 idles the MXU on lane padding both ways: the SG3
tail (1044^2, 81->51->32->32) measures 5-15% MXU and RRDB's gc=32
growth convs ~7-19% (reference roles: `maua/GAN/wrappers/stylegan3.py`
synthesis tail, `maua/super/image/models/realesrgan.py:13-49` RRDB).

This kernel packs all 9 taps into the contraction dim instead:

    y[i, w, :] = P_i @ Wk,   P_i (W, 9*Cip) = lane-concat of the nine
                             (dy, dx)-shifted input slices

- P is built in VMEM per row band (9x im2col inflation never touches
  HBM; the lane-concat is cheap VPU relayout at Cip multiples of 32);
- the dot runs M = W (long stream), K = 9*Cip (near-full contraction
  lanes), N = Co — one MXU pass instead of nine K=Ci passes, lifting
  the utilization ceiling from (Ci/128c)*(Co/128c) to ~(9Ci/9Cic)*(Co/128c);
- optional fused epilogue: per-sample input style scale, per-sample
  output demodulation (the modulated-conv pattern), bias, leaky-relu.

Exact vs the XLA conv at f32 (tests/test_kconv.py); bf16 in-kernel
compute matches the bf16 XLA path to roundoff.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(R, W, Wp, cip, co_p, n_valid_rows, has_style, has_demod, has_bias,
                 act_alpha, act_gain, out_dtype):
    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kernel(*refs):
        idx = 0
        xa_ref, xb_ref, xc_ref, w_ref = refs[0], refs[1], refs[2], refs[3]
        idx = 4
        style_ref = demod_ref = bias_ref = None
        if has_style:
            style_ref = refs[idx]; idx += 1
        if has_demod:
            demod_ref = refs[idx]; idx += 1
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        out_ref = refs[idx]
        p_ref = refs[idx + 1]  # VMEM scratch (W, 9*cip)

        j = pl.program_id(1)
        cdt = xb_ref.dtype
        # haloed row window (R+2, Wp, cip): last row of prev band + band
        # + first row of next band (bands are padded with R zero rows
        # on each side of the image)
        xb = jnp.concatenate([xa_ref[0, R - 1 :], xb_ref[0], xc_ref[0, :1]], axis=0)
        if has_style:
            xb = xb * style_ref[0, 0].astype(cdt)  # (cip,) input scale

        wk = w_ref[...].astype(cdt)  # (9*cip, co_p)
        for i in range(R):
            # P_i (W, 9*cip): nine tap slices packed along lanes. Built
            # via scratch-ref stores, NOT jnp.concatenate — Mosaic
            # rejects lane-concat of inputs with mismatched sublane
            # offsets ("result/input offset mismatch on non-concat
            # dimension"; the dx slices carry sublane offsets 0/1/2),
            # while stores relayout for free.
            for dy in range(3):
                for dx in range(3):
                    t = dy * 3 + dx
                    p_ref[:, t * cip : (t + 1) * cip] = xb[i + dy, dx : dx + W, :].astype(cdt)
            y = dot(p_ref[...], wk)  # (W, co_p) f32
            # zero rows beyond the image (bottom pad of the last band)
            row = j * R + i
            valid = (row < n_valid_rows).astype(jnp.float32)
            y = y * valid
            if has_demod:
                y = y * demod_ref[0, 0].astype(jnp.float32)
            if has_bias:
                y = y + bias_ref[0].astype(jnp.float32)
            if act_alpha is not None:
                y = jnp.where(y >= 0, y, y * act_alpha) * act_gain
            out_ref[0, i] = y.astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("alpha", "gain", "band_r", "interpret"))
def _kconv(x, w, bias, style, demod, alpha, gain, band_r, interpret):
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    cip = -(-ci // 32) * 32  # pad Ci to a 32-lane multiple for cheap concat
    co_p = -(-co // 128) * 128

    import os

    R = int(os.environ.get("MAUA_KCONV_R", "0")) or band_r
    if R == 0:
        # VMEM: P_i (W, 9cip) + x window + out block; keep P under ~2.5 MB
        R = 8 if wd * 9 * cip * x.dtype.itemsize <= 2_500_000 else 4
    hp = -h % R
    # rows: R zero rows on each side so the staggered band views exist
    xpad = jnp.pad(x, ((0, 0), (R, R + hp), (1, 1), (0, cip - ci)))
    wp = wd + 2
    nbands = (h + hp) // R

    # weights (3, 3, ci, co) -> (9*cip, co_p), tap-major to match the
    # in-kernel concat order
    wk = jnp.zeros((9 * cip, co_p), w.dtype)
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            wk = wk.at[t * cip : t * cip + ci, :co].set(w[dy, dx])

    band = lambda off: pl.BlockSpec((1, R, wp, cip), lambda i, j, off=off: (i, j + off, 0, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [band(0), band(1), band(2),
                pl.BlockSpec(wk.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)]
    args = [xpad, xpad, xpad, wk]
    if style is not None:
        sp = jnp.pad(style, ((0, 0), (0, cip - ci)))
        in_specs.append(pl.BlockSpec((1, 1, cip), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM))
        args.append(sp[:, None, :])
    if demod is not None:
        dp = jnp.pad(demod, ((0, 0), (0, co_p - co)))
        in_specs.append(pl.BlockSpec((1, 1, co_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM))
        args.append(dp[:, None, :])
    if bias is not None:
        bp = jnp.pad(bias, (0, co_p - co))
        in_specs.append(pl.BlockSpec((1, co_p), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        args.append(bp[None, :])

    kernel = _make_kernel(R, wd, wp, cip, co_p, h, style is not None, demod is not None,
                          bias is not None, alpha, gain, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, nbands),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, wd, co_p), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h + hp, wd, co_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((wd, 9 * cip), x.dtype)],
        interpret=interpret,
    )(*args)
    return out[:, :h, :, :co]


def kconv3x3(
    x: jax.Array,  # (B, H, W, Ci)
    w: jax.Array,  # (3, 3, Ci, Co) HWIO
    bias: Optional[jax.Array] = None,  # (Co,)
    style: Optional[jax.Array] = None,  # (B, Ci) input scale (modulation)
    demod: Optional[jax.Array] = None,  # (B, Co) output scale (demodulation)
    alpha: Optional[float] = None,  # leaky-relu slope (None = linear)
    gain: float = 1.0,
    band_r: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """SAME-padded stride-1 3x3 conv with K-packed im2col on the MXU and
    an optional fused modulated-conv epilogue. Drop-in for
    `lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)), NHWC)`."""
    assert w.shape[:2] == (3, 3)
    return _kconv(x, w, bias, style, demod, alpha, gain, band_r, interpret)
