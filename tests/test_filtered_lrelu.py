"""Pallas fused filtered-lrelu (kernels/filtered_lrelu.py) vs the
direct XLA path (stylegan3._filtered_lrelu_direct) — exact parity in
interpret mode, plus phase-table unit checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.gan.stylegan3 import _filtered_lrelu_direct, _lowpass
from maua_tpu.kernels.filtered_lrelu import (
    _down_phase_taps,
    _up_phase_taps,
    filtered_lrelu_pallas,
)


@pytest.mark.parametrize("reorder", [False, True])
@pytest.mark.parametrize(
    "up,down,h,w,c",
    [
        (2, 2, 24, 20, 5),
        (2, 2, 33, 31, 3),   # non-multiple sizes exercise hp padding + masks
        (4, 2, 16, 12, 5),   # transition layer: 2x output, 4 phases
        (4, 2, 21, 19, 2),
        (2, 2, 70, 260, 2),  # multiple 128-lane W tiles
        (4, 2, 70, 260, 2),  # multi-tile + multi-band transition
    ],
)
def test_pallas_matches_direct(up, down, h, w, c, reorder):
    up_f = _lowpass(6 * up, 100.0, 80.0, 1024.0)
    down_f = _lowpass(12, 100.0, 80.0, 1024.0)
    x = np.random.RandomState(0).randn(2, h, w, c).astype(np.float32)
    ref = np.asarray(_filtered_lrelu_direct(jnp.asarray(x), up_f, down_f, up, down))
    got = np.asarray(filtered_lrelu_pallas(jnp.asarray(x), up_f, down_f, up, down,
                                           interpret=True, reorder=reorder))
    assert got.shape == ref.shape == (2, h * up // down, w * up // down, c)
    assert np.abs(ref - got).max() < 1e-5


@pytest.mark.parametrize("up,down,h,w,c", [(2, 2, 33, 31, 3), (4, 2, 21, 19, 2)])
def test_pallas_fused_affines(up, down, h, w, c):
    """pre_scale/pre_add/post_scale (fused modulated-conv demod + bias +
    next-layer style) match applying the affines outside the kernel."""
    rng = np.random.RandomState(3)
    up_f = _lowpass(6 * up, 100.0, 80.0, 1024.0)
    down_f = _lowpass(12, 100.0, 80.0, 1024.0)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    ps = jnp.asarray(rng.rand(2, c).astype(np.float32) + 0.5)
    pa = jnp.asarray(rng.randn(2, c).astype(np.float32))
    po = jnp.asarray(rng.rand(2, c).astype(np.float32) + 0.5)
    xin = x * ps[:, None, None, :] + pa[:, None, None, :]
    ref = np.asarray(_filtered_lrelu_direct(xin, up_f, down_f, up, down)
                     * po[:, None, None, :])
    got = np.asarray(filtered_lrelu_pallas(x, up_f, down_f, up, down, interpret=True,
                                           pre_scale=ps, pre_add=pa, post_scale=po))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-4


def test_up4_equals_stuffed_up2():
    """The dispatch's big-transition route: up4/down2 == zero-stuff-2 ->
    up2/down2 with the up filter carrying the extra x2 gain (stuff4 =
    stuff2 o stuff2). Exact in f32."""
    rng = np.random.RandomState(4)
    up_f = _lowpass(24, 100.0, 80.0, 1024.0)
    down_f = _lowpass(12, 100.0, 80.0, 1024.0)
    h, w, c = 19, 23, 3
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    ref = np.asarray(_filtered_lrelu_direct(x, up_f, down_f, 4, 2))
    x2 = jnp.pad(x[:, :, None, :, None, :], ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
    x2 = x2.reshape(2, h * 2, w * 2, c)
    got = np.asarray(filtered_lrelu_pallas(x2, np.asarray(up_f) * 2.0, down_f, 2, 2,
                                           interpret=True))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-5


def test_phase_tables_reconstruct_upfirdn():
    """Polyphase tables reproduce zero-stuff -> FIR -> stride exactly."""
    rng = np.random.RandomState(1)
    for up, down in [(2, 2), (4, 2)]:
        ut, dt = 6 * up, 12
        f1, f2 = rng.randn(ut), rng.randn(dt)
        H = 13
        x = rng.randn(H)
        pu, pd = (ut - 1) // 2, (dt - 1) // 2

        def upfirdn1d(v, f, u, d, pad):
            dil = np.zeros((len(v) - 1) * u + 1)
            dil[::u] = v
            vp = np.concatenate([np.zeros(pad[0]), dil, np.zeros(pad[1])])
            T = len(f)
            out = np.array([(vp[m : m + T] * f).sum() for m in range(len(vp) - T + 1)])
            return out[::d]

        u = upfirdn1d(x, f1, up, 1, (pu, ut - 1 - pu + up - 1))
        up_tabs = _up_phase_taps(f1, up)
        for p in range(up):
            for j in range(H):
                val = sum(c * (x[j + o] if 0 <= j + o < H else 0.0) for o, c in up_tabs[p])
                assert abs(val - u[up * j + p]) < 1e-9

        t = np.maximum(u, 0.2 * u)
        y = upfirdn1d(t, f2, 1, down, (pd, dt - 1 - pd))
        dn_tabs = _down_phase_taps(f2, up, down)
        r = up // down
        for q in range(r):
            for k in range(H):
                n = r * k + q
                if n >= len(y):
                    continue
                val = sum(c * t[up * (k + o) + p] for (p, o), c in dn_tabs[q] if 0 <= k + o < H)
                assert abs(val - y[n]) < 1e-9
