"""Fused Pallas filtered-lrelu for StyleGAN3 (polyphase, MXU matmuls).

The alias-free nonlinearity (kaiser up-FIR -> lrelu*sqrt2 -> FIR-down,
`gan/stylegan3.py _filtered_lrelu_direct`; reference upfirdn semantics
from `maua/GAN/wrappers/inference/ops.py:87-114`) is SG3's cost
center: at 1024^2 the XLA path materializes a 2x-oversampled grid in
HBM per layer and runs 10-30x off roofline (dilated depthwise convs
are VPU-bound; the measured flrelu share of a batch-8 1024^2 synthesis
is ~320 of 440 ms).

This kernel computes the same function via polyphase decomposition
with every FIR pass expressed as an MXU matmul (the v5e VPU is ~50x
slower than the MXU; shifted-add formulations measure no faster than
XLA):

- tmp-phase planes live at the *input* rate — the oversampled grid
  never exists, in HBM or VMEM;
- layout is (B*C, H, W): W on lanes, H on sublanes; any channel count
  gets full lane utilization (the SG3 tail has C = 81/51/32 where
  NHWC pads lanes 1.6-4x);
- H-axis FIRs: one banded-matrix dot per block, all phases stacked
  along rows ((up*Rt, Rx) @ (Rx, P));
- W-axis FIRs: per-128-lane-tile dots against 3-neighbor banded
  matrices (y_t = sum_d x_{t+d} @ K[d]), unrolled over tiles;
- one HBM read of x (3 band views), one write of y.

Supports (up=2, down=2) -> same-rate and (up=4, down=2) -> 2x output
(SG3's two layer kinds). Filters are baked into constant matrices
passed as kernel inputs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _up_phase_taps(f1: np.ndarray, up: int):
    """tmp[up*j + p] = sum_o coef[p][o] * x[j + o] (zero outside).

    From u[m] = sum_s f1[s] * dil[m + s - pu], dil[j] = x[j/up] for
    j % up == 0, pu = (taps-1)//2."""
    ut = len(f1)
    pu = (ut - 1) // 2
    tables = []
    for p in range(up):
        coefs = {}
        for s in range(ut):
            if (p + s - pu) % up == 0:
                o = (p + s - pu) // up
                coefs[o] = coefs.get(o, 0.0) + float(f1[s])
        tables.append(sorted(coefs.items()))
    return tables


def _down_phase_taps(f2: np.ndarray, up: int, down: int):
    """y[r*k + q] = sum_{(p,o,c) in table[q]} c * t_p[k + o] with
    r = up//down (integer for SG3: 1 or 2).

    From y[n] = sum_s f2[s] * t[down*n + s - pd], pd = (taps-1)//2,
    and t stored phase-planar: t[up*j + p] = t_p[j]."""
    dt = len(f2)
    pd = (dt - 1) // 2
    r = up // down
    tables = []
    for q in range(r):
        coefs = {}
        for s in range(dt):
            m = down * q + s - pd  # tmp index offset relative to up*k
            p = m % up
            o = (m - p) // up
            coefs[(p, o)] = coefs.get((p, o), 0.0) + float(f2[s])
        tables.append(sorted(coefs.items()))
    return tables


def _halos(up_taps, down_taps):
    """(input halo, t-phase halo) rows/cols needed on each side."""
    t_halo = max(max(abs(o) for (_, o), _c in tab) for tab in down_taps)
    x_halo = t_halo + max(max(abs(o) for o, _c in tab) for tab in up_taps)
    return x_halo, t_halo


def _build_matrices(up_tabs, down_tabs, R, Rt, Rx, x_halo, t_halo, P):
    """Constant operands for the kernel's matmuls (numpy, f32).

    A   (up*Rt, Rx): H-up.  A[p*Rt+jj, jj + (x_halo - t_halo) + o] = c
    Ku  (up, 3, 128, 128): W-up per px. Ku[px, d, l+o-128(d-1), l] = c
    Kd  (r, up, 3, 128, 128): W-down per (qx, px)
    B   (r, R, up*Rt): H-down per qy. B[qy, n, p*Rt + n+o+t_halo] = c
    """
    up = len(up_tabs)
    r = len(down_tabs)
    A = np.zeros((up * Rt, Rx), np.float32)
    for p in range(up):
        for jj in range(Rt):
            for o, c in up_tabs[p]:
                ii = jj + (x_halo - t_halo) + o
                if 0 <= ii < Rx:
                    A[p * Rt + jj, ii] = c
    Ku = np.zeros((up, 3, 128, 128), np.float32)
    for px in range(up):
        for o, c in up_tabs[px]:
            for l in range(128):
                src = l + o
                d = src // 128 + 1  # neighbor tile: -1, 0, +1 -> 0, 1, 2
                if 0 <= d < 3:
                    Ku[px, d, src % 128, l] = c
    Kd = np.zeros((r, up, 3, 128, 128), np.float32)
    B = np.zeros((r, R, up * Rt), np.float32)
    for q in range(r):
        for (p, o), c in down_tabs[q]:
            for l in range(128):
                src = l + o
                d = src // 128 + 1
                if 0 <= d < 3:
                    Kd[q, p, d, src % 128, l] = c
            for n in range(R):
                jj = n + o + t_halo
                if 0 <= jj < Rt:
                    B[q, n, p * Rt + jj] = c
    assert P % 128 == 0
    return A, Ku, Kd, B


def _make_kernel(R, Rt, Rx, x_halo, t_halo, up, r, P, W, h_valid, gain_sqrt2, out_dtype):
    nt = P // 128

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def wpass(planes, K):
        """planes (rows, P) @ 3-neighbor tile matrices K (3, 128, 128)."""
        tiles = []
        for t in range(nt):
            acc = None
            for d in (-1, 0, 1):
                if not (0 <= t + d < nt):
                    continue
                src = planes[:, (t + d) * 128 : (t + d + 1) * 128]
                term = dot(src, K[d + 1])
                acc = term if acc is None else acc + term
            tiles.append(acc)
        return jnp.concatenate(tiles, axis=1)

    def kernel(xa_ref, xb_ref, xc_ref, a_ref, ku_ref, kd_ref, b_ref, *out_refs):
        j = pl.program_id(1)
        cdt = xb_ref.dtype
        # halo window (Rx, P) = tail of prev band + band + head of next
        x = jnp.concatenate(
            [xa_ref[0, R - x_halo :, :], xb_ref[0], xc_ref[0, :x_halo, :]], axis=0
        )

        # ---- H-up: all phases in one dot -> (up*Rt, P)
        uy = dot(a_ref[...].astype(cdt), x)

        # t-phase row validity: global t row = j*R + (row % Rt) - t_halo
        rr = jax.lax.broadcasted_iota(jnp.int32, (up * Rt, 1), 0) % Rt
        row_idx = rr + (j * R - t_halo)
        row_mask = ((row_idx >= 0) & (row_idx < h_valid)).astype(jnp.float32)
        # t-phase col validity: col < W
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        col_mask = (col_idx < W).astype(jnp.float32)
        uy = uy * row_mask

        # ---- W-up + lrelu per px phase -> t planes (up*Rt, P) each
        uy16 = uy.astype(cdt)
        d_acc = [None] * r
        for px in range(up):
            t_px = wpass(uy16, ku_ref[px].astype(cdt))
            t_px = jnp.where(t_px >= 0, t_px, t_px * 0.2) * (gain_sqrt2 * col_mask)
            # ---- W-down: accumulate into d[qx] (up*Rt, P)
            t16 = t_px.astype(cdt)
            for qx in range(r):
                term = wpass(t16, kd_ref[qx, px].astype(cdt))
                d_acc[qx] = term if d_acc[qx] is None else d_acc[qx] + term

        # ---- H-down: out[qy*r + qx] (R, P)
        for qy in range(r):
            for qx in range(r):
                out = dot(b_ref[qy].astype(cdt), d_acc[qx].astype(cdt))
                out_refs[qy * r + qx][0] = out.astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("up_f", "down_f", "up", "down", "interpret"))
def _flrelu_bchw(x, up_f: tuple, down_f: tuple, up: int, down: int, interpret: bool = False):
    """x: (B, C, H, W) -> (B, C, H*r, W*r), r = up//down.

    Matches ops.upfirdn2d(x, f_up, up, 'same' odd-centered pad,
    gain=up^2) -> lrelu*sqrt2 -> upfirdn2d(:, f_down, down, same pad).
    """
    assert up in (2, 4) and down == 2
    r = up // down
    f1 = np.asarray(up_f, np.float32) * up  # gain = up^2 split per axis
    f2 = np.asarray(down_f, np.float32)
    up_tabs = _up_phase_taps(f1, up)
    down_tabs = _down_phase_taps(f2, up, down)
    x_halo, t_halo = _halos(up_tabs, down_tabs)

    b, c, h, w = x.shape
    # band height: bounded by a ~6 MB VMEM plane budget
    import os

    n_planes = 2 + up + 2 * r + r * r
    P = -(-w // 128) * 128
    budget = int(float(os.environ.get("MAUA_FLRELU_BUDGET", "6e6")))
    R = max(32, min(256, budget // (n_planes * P * 4) // 32 * 32, h + (-h % 32)))
    assert R > x_halo
    hp = -h % R
    Rt, Rx = R + 2 * t_halo, R + 2 * x_halo
    bc = b * c
    xpad = jnp.pad(x.reshape(bc, h, w), ((0, 0), (R, R + hp), (0, P - w)))
    nbands = (h + hp) // R

    A, Ku, Kd, B = _build_matrices(up_tabs, down_tabs, R, Rt, Rx, x_halo, t_halo, P)
    kernel = _make_kernel(R, Rt, Rx, x_halo, t_halo, up, r, P, w, h,
                          math.sqrt(2.0), x.dtype)

    band = lambda off: pl.BlockSpec((1, R, P), lambda i, j, off=off: (i, j + off, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, R, P), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(bc, nbands),
        out_shape=tuple(jax.ShapeDtypeStruct((bc, h + hp, P), x.dtype) for _ in range(r * r)),
        in_specs=[band(0), band(1), band(2), const(A), const(Ku), const(Kd), const(B)],
        out_specs=tuple(out_spec for _ in range(r * r)),
        interpret=interpret,
    )(xpad, xpad, xpad, A, Ku, Kd, B)

    if r == 1:
        return outs[0][:, :h, :w].reshape(b, c, h, w)
    # interleave output phase planes: y[2k+qy, 2l+qx] = outs[qy*r+qx][k, l]
    y = jnp.stack(outs, axis=0).reshape(r, r, bc, h + hp, P)
    y = y.transpose(2, 3, 0, 4, 1).reshape(bc, (h + hp) * r, P * r)
    return y[:, : h * r, : w * r].reshape(b, c, h * r, w * r)


def filtered_lrelu_pallas(x, up_f, down_f, up: int, down: int, interpret: bool = False):
    """NHWC wrapper: x (B, H, W, C) -> (B, H*r, W*r, C); drop-in for
    `stylegan3._filtered_lrelu_direct` when up in {2,4} and down == 2
    with odd-centered 'same' padding."""
    xt = jnp.transpose(x, (0, 3, 1, 2))
    yt = _flrelu_bchw(xt, tuple(np.asarray(up_f).tolist()), tuple(np.asarray(down_f).tolist()),
                      up, down, interpret)
    return jnp.transpose(yt, (0, 2, 3, 1))
