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
from typing import Optional

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


def _make_kernel(R, Rt, Rx, x_halo, t_halo, up, r, P, W, h_valid, gain_sqrt2, out_dtype,
                 reorder: bool = False, h_in: int = 0, has_pre: bool = False,
                 has_post: bool = False):
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

    def masks(j):
        # t-phase row validity: global t row = j*R + (row % Rt) - t_halo
        rr = jax.lax.broadcasted_iota(jnp.int32, (up * Rt, 1), 0) % Rt
        row_idx = rr + (j * R - t_halo)
        row_mask = ((row_idx >= 0) & (row_idx < h_valid)).astype(jnp.float32)
        # t-phase col validity: col < W (tmp cols live at the input rate)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        col_mask = (col_idx < W).astype(jnp.float32)
        return row_mask, col_mask

    def load_x(xa_ref, xb_ref, xc_ref, pre_ref, j):
        """Haloed window (Rx, P) with the optional fused per-plane
        input affine (x*s + b on valid input pixels): the modulated-conv
        demod/bias of the PRECEDING conv is a per-(b, c)-plane scalar
        pair, free here vs a full HBM round-trip as a separate pass."""
        x = jnp.concatenate(
            [xa_ref[0, R - x_halo :, :], xb_ref[0], xc_ref[0, :x_halo, :]], axis=0
        )
        if pre_ref is not None:
            i = pl.program_id(0)
            ps = pre_ref[i, 0]
            pb = pre_ref[i, 1]
            # the +b applies only inside the image (outside is the
            # upfirdn zero-padding)
            rr = jax.lax.broadcasted_iota(jnp.int32, (Rx, 1), 0) + (j * R - x_halo)
            cc = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            valid = ((rr >= 0) & (rr < h_in) & (cc < W)).astype(x.dtype)
            x = x * ps.astype(x.dtype) + pb.astype(x.dtype) * valid
        return x

    def post_scale(pref):
        return pref[pl.program_id(0), 0] if pref is not None else None

    def split_refs(refs):
        idx = 7
        pre_ref = post_ref = None
        if has_pre:
            pre_ref = refs[idx]; idx += 1
        if has_post:
            post_ref = refs[idx]; idx += 1
        return refs[:7] + (pre_ref, post_ref) + (refs[idx:],)

    def kernel(*refs):
        (xa_ref, xb_ref, xc_ref, a_ref, ku_ref, kd_ref, b_ref,
         pre_ref, post_ref, out_refs) = split_refs(refs)
        j = pl.program_id(1)
        cdt = xb_ref.dtype
        x = load_x(xa_ref, xb_ref, xc_ref, pre_ref, j)
        row_mask, col_mask = masks(j)

        # ---- H-up: all phases in one dot -> (up*Rt, P)
        uy = dot(a_ref[...].astype(cdt), x) * row_mask

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
        po = post_scale(post_ref)
        for qy in range(r):
            for qx in range(r):
                out = dot(b_ref[qy].astype(cdt), d_acc[qx].astype(cdt))
                if po is not None:
                    out = out * po
                out_refs[qy * r + qx][0] = out.astype(out_dtype)

    def kernel_reordered(*refs):
        """Same function, W-cheap schedule for up > 2: every W-pass runs
        on input-rate (W-up, Rx rows) or output-rate (W-down, R rows)
        planes instead of the up*Rt-row phase stacks — for up=4 this
        trades 3 extra H dots for 12 -> ~8 effective wpass-rows, a
        ~1.4x raw-FLOP cut at like R (more at small R; all passes are
        per-axis linear so the exchange is exact)."""
        (xa_ref, xb_ref, xc_ref, a_ref, ku_ref, kd_ref, b_ref,
         pre_ref, post_ref, out_refs) = split_refs(refs)
        j = pl.program_id(1)
        cdt = xb_ref.dtype
        x = load_x(xa_ref, xb_ref, xc_ref, pre_ref, j)
        row_mask, col_mask = masks(j)

        y_acc = [None] * (r * r)
        for px in range(up):
            # ---- W-up at the input rate: (Rx, P)
            xu = wpass(x.astype(cdt), ku_ref[px].astype(cdt)).astype(cdt)
            # ---- H-up all H-phases of this px: (up*Rt, P)
            t_px = dot(a_ref[...].astype(cdt), xu) * row_mask
            t_px = jnp.where(t_px >= 0, t_px, t_px * 0.2) * (gain_sqrt2 * col_mask)
            t16 = t_px.astype(cdt)
            for qy in range(r):
                # ---- H-down first: (R, P)
                h = dot(b_ref[qy].astype(cdt), t16).astype(cdt)
                for qx in range(r):
                    # ---- W-down on output-rate rows
                    term = wpass(h, kd_ref[qx, px].astype(cdt))
                    k = qy * r + qx
                    y_acc[k] = term if y_acc[k] is None else y_acc[k] + term
        po = post_scale(post_ref)
        for k in range(r * r):
            out = y_acc[k] * po if po is not None else y_acc[k]
            out_refs[k][0] = out.astype(out_dtype)

    return kernel_reordered if reorder else kernel


@functools.partial(jax.jit, static_argnames=("up_f", "down_f", "up", "down", "interpret",
                                              "reorder", "band_r"))
def _flrelu_bchw(x, up_f: tuple, down_f: tuple, up: int, down: int, interpret: bool = False,
                 reorder: Optional[bool] = None, band_r: int = 0,
                 pre=None, post=None):
    """x: (B, C, H, W) -> (B, C, H*r, W*r), r = up//down.

    Matches ops.upfirdn2d(x, f_up, up, 'same' odd-centered pad,
    gain=up^2) -> lrelu*sqrt2 -> upfirdn2d(:, f_down, down, same pad).

    `pre` (B*C, 2) applies x*pre[:,0] + pre[:,1] to valid input pixels
    before the filter chain (the preceding modulated conv's demod+bias,
    fused per plane); `post` (B*C,) scales the output (the NEXT conv's
    input style modulation). Both are per-plane scalars — free in the
    kernel vs full HBM passes outside it.

    `reorder` picks the W-cheap schedule (default on: measured 1.3-1.4x
    at every shape the SG3 dispatch sends here — 1044^2 c51/c32 up2 and
    532^2 c81 up4; workspace/profiling/bench_flrelu_reorder.py).
    `band_r` forces the band height (0 = auto; MAUA_FLRELU_R env
    overrides for profiling).
    """
    assert up in (2, 4) and down == 2
    r = up // down
    if reorder is None:
        reorder = True
    f1 = np.asarray(up_f, np.float32) * up  # gain = up^2 split per axis
    f2 = np.asarray(down_f, np.float32)
    up_tabs = _up_phase_taps(f1, up)
    down_tabs = _down_phase_taps(f2, up, down)
    x_halo, t_halo = _halos(up_tabs, down_tabs)

    b, c, h, w = x.shape
    # band height: bounded by a ~6 MB VMEM plane budget; the reordered
    # schedule's banded-H waste grows with R, so it prefers small bands
    # (measured knee ~64-96 at 532^2)
    import os

    n_planes = 2 + up + 2 * r + r * r
    P = -(-w // 128) * 128
    budget = int(float(os.environ.get("MAUA_FLRELU_BUDGET", "6e6")))
    R = max(32, min(256, budget // (n_planes * P * 4) // 32 * 32, h + (-h % 32)))
    if reorder:
        R = min(R, 96)
    R = int(os.environ.get("MAUA_FLRELU_R", "0")) or band_r or R
    assert R > x_halo
    hp = -h % R
    Rt, Rx = R + 2 * t_halo, R + 2 * x_halo
    bc = b * c
    xpad = jnp.pad(x.reshape(bc, h, w), ((0, 0), (R, R + hp), (0, P - w)))
    nbands = (h + hp) // R

    A, Ku, Kd, B = _build_matrices(up_tabs, down_tabs, R, Rt, Rx, x_halo, t_halo, P)
    # out rows valid = h*r for r=2 (phase planes each hold h rows); the
    # row mask works at the t rate indexed over Rt, bounded by h (input
    # rows) — h_valid semantics unchanged; h_in bounds the fused input
    # affine's +bias region
    kernel = _make_kernel(R, Rt, Rx, x_halo, t_halo, up, r, P, w, h,
                          math.sqrt(2.0), x.dtype, reorder=reorder, h_in=h,
                          has_pre=pre is not None, has_post=post is not None)

    band = lambda off: pl.BlockSpec((1, R, P), lambda i, j, off=off: (i, j + off, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, R, P), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    in_specs = [band(0), band(1), band(2), const(A), const(Ku), const(Kd), const(B)]
    args = [xpad, xpad, xpad, A, Ku, Kd, B]
    if pre is not None:
        in_specs.append(pl.BlockSpec((bc, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM))
        args.append(pre.reshape(bc, 2).astype(jnp.float32))
    if post is not None:
        in_specs.append(pl.BlockSpec((bc, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM))
        args.append(post.reshape(bc, 1).astype(jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(bc, nbands),
        out_shape=tuple(jax.ShapeDtypeStruct((bc, h + hp, P), x.dtype) for _ in range(r * r)),
        in_specs=in_specs,
        out_specs=tuple(out_spec for _ in range(r * r)),
        interpret=interpret,
    )(*args)

    if r == 1:
        return outs[0][:, :h, :w].reshape(b, c, h, w)
    # interleave output phase planes: y[2k+qy, 2l+qx] = outs[qy*r+qx][k, l]
    y = jnp.stack(outs, axis=0).reshape(r, r, bc, h + hp, P)
    y = y.transpose(2, 3, 0, 4, 1).reshape(bc, (h + hp) * r, P * r)
    return y[:, : h * r, : w * r].reshape(b, c, h * r, w * r)


def filtered_lrelu_pallas(x, up_f, down_f, up: int, down: int, interpret: bool = False,
                          reorder: Optional[bool] = None, band_r: int = 0,
                          pre_scale=None, pre_add=None, post_scale=None):
    """NHWC wrapper: x (B, H, W, C) -> (B, H*r, W*r, C); drop-in for
    `stylegan3._filtered_lrelu_direct` when up in {2,4} and down == 2
    with odd-centered 'same' padding.

    Optional fused per-plane affines: pre_scale/pre_add (B, C) apply
    x*s + b on valid input pixels (a modulated conv's demodulation +
    bias); post_scale (B, C) scales the output (the next conv's style)."""
    xt = jnp.transpose(x, (0, 3, 1, 2))
    pre = None
    if pre_scale is not None or pre_add is not None:
        b, _, _, c = x.shape
        ps = jnp.ones((b, c), jnp.float32) if pre_scale is None else pre_scale.astype(jnp.float32)
        pa = jnp.zeros((b, c), jnp.float32) if pre_add is None else pre_add.astype(jnp.float32)
        pre = jnp.stack([ps, pa], axis=-1)  # (B, C, 2)
    post = post_scale.astype(jnp.float32) if post_scale is not None else None
    yt = _flrelu_bchw(xt, tuple(np.asarray(up_f).tolist()), tuple(np.asarray(down_f).tolist()),
                      up, down, interpret, reorder=reorder, band_r=band_r,
                      pre=pre, post=post)
    return jnp.transpose(yt, (0, 2, 3, 1))
