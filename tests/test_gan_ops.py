"""Golden parity tests for maua_tpu.gan.ops against a torch oracle that
reproduces the reference semantics (maua/GAN/wrappers/inference/ops.py:
upfirdn2d :87-114, conv2d_resample :189-233, modulated_conv2d :146-186,
bias_act :65-84). The oracle is written independently from the
mathematical definitions (zero-insert upsample -> pad/crop -> FIR
correlation -> stride downsample; per-sample modulated grouped conv).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maua_tpu.gan import ops as gops  # noqa: E402


# ---------------------------------------------------------------- oracles
def oracle_upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0):
    """x: (B,C,H,W) torch; f: 2D torch filter."""
    b, c, h, w = x.shape
    padx0, padx1, pady0, pady1 = padding
    # zero-insert upsample
    x = x.reshape(b, c, h, 1, w, 1)
    x = F.pad(x, [0, up - 1, 0, 0, 0, up - 1])
    x = x.reshape(b, c, h * up, w * up)
    # pad then crop (negative pads)
    x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[:, :, max(-pady0, 0) : x.shape[2] - max(-pady1, 0), max(-padx0, 0) : x.shape[3] - max(-padx1, 0)]
    # FIR (correlation, depthwise)
    f = f * (gain ** (f.ndim / 2))
    kern = f[None, None].repeat(c, 1, 1, 1)
    x = F.conv2d(x, kern, groups=c)
    return x[:, :, ::down, ::down]


def oracle_conv2d_resample(x, w, f=None, up=1, down=1, padding=0):
    """x: (B,C,H,W); w: (Co,Ci,kh,kw); reference padding algebra."""
    co, ci, kh, kw = w.shape
    fw, fh = (f.shape[-1], f.shape[0]) if f is not None else (1, 1)
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    if up > 1:
        wt = w.permute(1, 0, 2, 3)
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        x = F.conv_transpose2d(x, wt, stride=up, padding=(pyt, pxt))
        x = oracle_upfirdn2d(x, f, padding=(px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt), gain=up**2)
        if down > 1:
            x = oracle_upfirdn2d(x, f, down=down)
        return x
    if down > 1:
        x = oracle_upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        return F.conv2d(x, w, stride=down)
    return F.conv2d(x, w, padding=(py0, px0))


def oracle_modulated_conv2d(x, weight, styles, noise=None, up=1, padding=0, f=None, demodulate=True):
    """Per-sample grouped-conv formulation (the reference's execution
    strategy, inference/ops.py:167-186)."""
    B, xc, xh, xw = x.shape
    co, ci, kh, kw = weight.shape
    w = weight[None] * styles[:, None, :, None, None]  # (B,Co,Ci,kh,kw)
    if demodulate:
        denom = (w.square().sum(dim=(2, 3, 4)) + 1e-8).sqrt()
        w = w / denom[:, :, None, None, None]
    x = x.reshape(1, B * xc, xh, xw)
    w = w.reshape(B * co, ci, kh, kw)
    if up > 1:
        # grouped conv_transpose path
        wt = w.reshape(B, co, ci, kh, kw).permute(0, 2, 1, 3, 4).reshape(B * ci, co, kh, kw)
        fw, fh = f.shape[-1], f.shape[0]
        px0 = px1 = py0 = py1 = padding
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        y = F.conv_transpose2d(x, wt, stride=up, padding=(pyt, pxt), groups=B)
        y = oracle_upfirdn2d(y, f, padding=(px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt), gain=up**2)
    else:
        y = F.conv2d(x, w, padding=padding, groups=B)
    y = y.reshape(B, co, xh * up, xw * up)
    if noise is not None:
        y = y + noise
    return y


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def to_nhwc(x_np_nchw):
    return np.transpose(x_np_nchw, (0, 2, 3, 1))


# ----------------------------------------------------------------- tests
@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (0, 0, 0, 0)),
        (1, 1, (1, 1, 1, 1)),
        (2, 1, (1, 1, 1, 1)),
        (2, 1, (2, 1, 2, 1)),
        (1, 2, (1, 1, 1, 1)),
        (2, 2, (1, 2, 2, 1)),
        (1, 1, (-1, 2, 0, -1)),
        (2, 1, (-1, -1, 2, 2)),
    ],
)
def test_upfirdn2d_parity(up, down, pad):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 8, 8, 3).astype(np.float32)
    f = gops.setup_filter([1, 3, 3, 1])
    out = np.asarray(gops.upfirdn2d(x, f, up=up, down=down, padding=pad, gain=1.5))
    ref = oracle_upfirdn2d(nchw(x), torch.from_numpy(f), up=up, down=down, padding=pad, gain=1.5)
    assert np.allclose(out, to_nhwc(ref.numpy()), atol=1e-5), np.abs(out - to_nhwc(ref.numpy())).max()


@pytest.mark.parametrize("up,down,padding,k", [(1, 1, 1, 3), (2, 1, 1, 3), (1, 2, 1, 3), (1, 1, 0, 1), (2, 1, 0, 1)])
def test_conv2d_resample_parity(up, down, padding, k):
    rs = np.random.RandomState(1)
    ci, co = 4, 5
    x = rs.randn(2, 8, 8, ci).astype(np.float32)
    w_oihw = rs.randn(co, ci, k, k).astype(np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    f = gops.setup_filter([1, 3, 3, 1])
    out = np.asarray(gops.conv2d_resample(x, w_hwio, f=f, up=up, down=down, padding=padding))
    ref = oracle_conv2d_resample(nchw(x), torch.from_numpy(w_oihw), torch.from_numpy(f), up, down, padding)
    assert out.shape == to_nhwc(ref.numpy()).shape
    assert np.allclose(out, to_nhwc(ref.numpy()), atol=1e-4), np.abs(out - to_nhwc(ref.numpy())).max()


@pytest.mark.parametrize("up,demod", [(1, True), (1, False), (2, True)])
def test_modulated_conv2d_parity(up, demod):
    rs = np.random.RandomState(2)
    B, ci, co, k, h = 3, 6, 8, 3, 8
    x = rs.randn(B, h, h, ci).astype(np.float32)
    w_oihw = rs.randn(co, ci, k, k).astype(np.float32) * 0.3
    styles = (rs.rand(B, ci).astype(np.float32) + 0.5)
    noise = rs.randn(B, h * up, h * up, 1).astype(np.float32) * 0.1
    f = gops.setup_filter([1, 3, 3, 1])
    out = np.asarray(
        gops.modulated_conv2d(
            x,
            np.transpose(w_oihw, (2, 3, 1, 0)),
            styles,
            noise=noise,
            up=up,
            padding=k // 2,
            resample_filter=f if up > 1 else None,
            demodulate=demod,
        )
    )
    ref = oracle_modulated_conv2d(
        nchw(x),
        torch.from_numpy(w_oihw),
        torch.from_numpy(styles),
        noise=torch.from_numpy(np.transpose(noise, (0, 3, 1, 2))),
        up=up,
        padding=k // 2,
        f=torch.from_numpy(f),
        demodulate=demod,
    )
    assert np.allclose(out, to_nhwc(ref.numpy()), atol=1e-4), np.abs(out - to_nhwc(ref.numpy())).max()


def test_bias_act_lrelu():
    rs = np.random.RandomState(3)
    x = rs.randn(2, 4, 4, 8).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    out = np.asarray(gops.bias_act(x, b, act="lrelu", clamp=0.5))
    ref = F.leaky_relu(nchw(x) + torch.from_numpy(b)[None, :, None, None], 0.2) * np.sqrt(2)
    ref = ref.clamp(-0.5, 0.5)
    assert np.allclose(out, to_nhwc(ref.numpy()), atol=1e-5)


def test_upsample2d_parity():
    rs = np.random.RandomState(4)
    x = rs.randn(1, 6, 6, 2).astype(np.float32)
    f = gops.setup_filter([1, 3, 3, 1])
    out = np.asarray(gops.upsample2d(x, f))
    # oracle: upfirdn with the same padding algebra
    fw, fh = 4, 4
    p = ((fw + 1) // 2, (fw - 2) // 2, (fh + 1) // 2, (fh - 2) // 2)
    ref = oracle_upfirdn2d(nchw(x), torch.from_numpy(f), up=2, padding=p, gain=4)
    assert out.shape == (1, 12, 12, 2)
    assert np.allclose(out, to_nhwc(ref.numpy()), atol=1e-5)


def test_normalize_2nd_moment():
    rs = np.random.RandomState(5)
    x = rs.randn(4, 16).astype(np.float32)
    out = np.asarray(gops.normalize_2nd_moment(x))
    ref = x / np.sqrt(np.mean(x**2, axis=-1, keepdims=True) + 1e-8)
    assert np.allclose(out, ref, atol=1e-5)


def test_space_to_depth_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 12, 5).astype(np.float32))
    cells = gops.space_to_depth(x)
    assert cells.shape == (2, 4, 6, 20)
    assert np.allclose(np.asarray(gops.depth_to_space(cells)), np.asarray(x))
    # channel order: (p*2+q)*C + c
    assert np.allclose(np.asarray(cells[0, 0, 0, 5:10]), np.asarray(x[0, 0, 1, :]))
    assert np.allclose(np.asarray(cells[0, 0, 0, 10:15]), np.asarray(x[0, 1, 0, :]))


def test_conv2d_s2d_exact_vs_direct():
    """The cell-grid 3x3 conv (4x FLOPs, full MXU lanes) must equal the
    direct SAME conv bit-for-bit up to float association — including at
    the borders, where the cell conv's 2-fine-pixel padding must
    reproduce the fine conv's 1-pixel zero pad."""
    rs = np.random.RandomState(1)
    for (h, w, ci, co) in [(8, 8, 3, 5), (16, 12, 7, 4), (6, 10, 1, 1)]:
        x = jnp.asarray(rs.randn(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(rs.randn(3, 3, ci, co).astype(np.float32))
        direct = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        cell = gops.conv2d_s2d(x, k)
        assert np.abs(np.asarray(cell) - np.asarray(direct)).max() < 1e-4, (h, w, ci, co)


def test_modulated_conv2d_s2d_matches_plain():
    """modulated_conv2d(s2d=True) must match the default path (same
    modulation/demodulation, conv evaluated on the cell grid)."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 12, 12, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 6, 9).astype(np.float32) * 0.2)
    styles = jnp.asarray(rs.rand(2, 6).astype(np.float32) + 0.5)
    a = gops.modulated_conv2d(x, w, styles, padding=1, demodulate=True)
    b = gops.modulated_conv2d(x, w, styles, padding=1, demodulate=True, s2d=True)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4
    # odd spatial size must fall back to the direct path (still correct)
    x3 = jnp.asarray(rs.randn(2, 11, 12, 6).astype(np.float32))
    a3 = gops.modulated_conv2d(x3, w, styles, padding=1, demodulate=True)
    b3 = gops.modulated_conv2d(x3, w, styles, padding=1, demodulate=True, s2d=True)
    assert np.abs(np.asarray(a3) - np.asarray(b3)).max() < 1e-4
