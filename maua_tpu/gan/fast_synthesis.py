"""Space-to-depth fast path for StyleGAN2 synthesis.

The top synthesis blocks run at huge spatial sizes with few channels
(1024^2 x 32ch at 1024 res) — direct 3x3 convs there reach only ~4-8%
MXU utilization because the channel dim is far below the 128-lane MXU
tile. Since every op in the tail (transposed conv, FIR resample, 1x1
torgb, img upsample) is a zero-padded linear convolution, each layer
is EXACTLY equivalent to a convolution between space-to-depth cell
grids at half resolution and 4x channels — where the MXU runs at
5-10x the throughput.

The composed cell-level kernels are extracted numerically at build
time by impulse-probing the reference ops (`gan/ops.py`), so the fast
path is exact by construction (style modulation stays outside the
conv as input/output scaling, see ops.modulated_conv2d).

Packing convention: phase-major — s2d(x)[..., i, j, (p*2+q)*C + c] =
x[..., 2i+p, 2j+q, c].
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .stylegan2 import SG2Config, fc_forward

_DN = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), phase-major."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


# ------------------------------------------------- numpy probe ops
# Pure-numpy mirrors of the gan/ops conv paths, used only for impulse
# probing at plan-build time (avoids one XLA compile per kernel; the
# end-to-end exactness tests in tests/test_fast_synthesis.py guard
# parity with the jax ops).


def _np_pad_crop(x, pads):
    (py0, py1), (px0, px1) = pads
    x = np.pad(x, ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    return x[:, max(-py0, 0) : h - max(-py1, 0), max(-px0, 0) : w - max(-px1, 0), :]


def _np_corr(x, w, pads=((0, 0), (0, 0)), lhs_dilation=1, strides=1, depthwise=False):
    """Correlation matching lax.conv_general_dilated NHWC/HWIO."""
    n, h, wd, ci = x.shape
    if lhs_dilation > 1:
        up = np.zeros((n, (h - 1) * lhs_dilation + 1, (wd - 1) * lhs_dilation + 1, ci), x.dtype)
        up[:, ::lhs_dilation, ::lhs_dilation, :] = x
        x = up
    x = _np_pad_crop(x, pads)
    kh, kw = w.shape[0], w.shape[1]
    n, h, wd, ci = x.shape
    oh, ow = (h - kh) // strides + 1, (wd - kw) // strides + 1
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(x, (kh, kw), axis=(1, 2))[:, ::strides, ::strides]  # (n, oh, ow, ci, kh, kw)
    return np.einsum("nhwikm,kmio->nhwo", win, w)


def _np_upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0):
    """Mirror of ops.upfirdn2d (zero-insert appends trailing zeros)."""
    padx0, padx1, pady0, pady1 = padding
    c = x.shape[-1]
    f2 = (f * (gain ** (f.ndim / 2))).astype(np.float32)
    pads = ((pady0, pady1), (padx0, padx1))
    n, h, wd, _ = x.shape
    if up > 1:
        z = np.zeros((n, h * up, wd * up, c), x.dtype)
        z[:, ::up, ::up] = x
        x = z
    x = _np_pad_crop(x, pads)
    from numpy.lib.stride_tricks import sliding_window_view

    kh, kw = f2.shape
    win = sliding_window_view(x, (kh, kw), axis=(1, 2))  # (n, oh, ow, c, kh, kw)
    y = np.einsum("nhwckm,km->nhwc", win, f2)
    return y[:, ::down, ::down]


def _np_conv2d_resample_up2(x, w, f, padding):
    """Mirror of ops.conv2d_resample with up=2 (HWIO weights)."""
    kh, kw = w.shape[0], w.shape[1]
    fw, fh = f.shape[-1], f.shape[0]
    px0 = px1 = py0 = py1 = padding
    px0 += (fw + 1) // 2
    px1 += (fw - 2) // 2
    py0 += (fh + 1) // 2
    py1 += (fh - 2) // 2
    px0 -= kw - 1
    px1 -= kw - 2
    py0 -= kh - 1
    py1 -= kh - 2
    pxt = max(min(-px0, -px1), 0)
    pyt = max(min(-py0, -py1), 0)
    w_t = w[::-1, ::-1]
    y = _np_corr(x, w_t, pads=((kh - 1 - pyt, kh - 1 - pyt), (kw - 1 - pxt, kw - 1 - pxt)), lhs_dilation=2)
    return _np_upfirdn2d(y, f, padding=(px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt), gain=4.0)


def _np_upsample2d(x, f):
    fw, fh = f.shape[-1], f.shape[0]
    p = ((fw + 1) // 2, (fw - 2) // 2, (fh + 1) // 2, (fh - 2) // 2)
    return _np_upfirdn2d(x, f, up=2, padding=p, gain=4.0)


def _extract_kernel(op, c_in: int, in_cell: int, out_cell: int, grid: int = 12, support: int = 5) -> np.ndarray:
    """Impulse-probe a linear, cell-shift-invariant op into an HWIO
    cell-space kernel.

    op: (N, grid*in_cell, grid*in_cell, c_in) -> (N, grid*out_scale...,
    ..., c_out) full-resolution function. in_cell/out_cell: pixels per
    cell on each side. Returns (kh, kw, c_in*in_cell^2, c_out*out_cell^2)
    phase-major on both sides."""
    n_basis = c_in * in_cell * in_cell
    h = grid * in_cell
    x = np.zeros((n_basis, h, h, c_in), np.float32)
    center = grid // 2
    b = 0
    for p in range(in_cell):
        for q in range(in_cell):
            for c in range(c_in):
                x[b, center * in_cell + p, center * in_cell + q, c] = 1.0
                b += 1
    y = np.asarray(op(x))  # (n_basis, grid*out_cell, grid*out_cell, c_out)
    c_out = y.shape[-1]
    out_grid = y.shape[1] // out_cell
    # cell view of the output, phase-major features
    y = y.reshape(n_basis, out_grid, out_cell, out_grid, out_cell, c_out)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n_basis, out_grid, out_grid, out_cell * out_cell * c_out)

    # the op preserves the cell grid, so the response centers on `center`
    r = support // 2
    K = np.zeros((support, support, n_basis, y.shape[-1]), np.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            yy, xx = center + dy, center + dx
            if 0 <= yy < y.shape[1] and 0 <= xx < y.shape[2]:
                # kernel tap (correlation convention): output at cell o
                # reads input cell o + (dy, dx) with tap K[r - dy, r - dx]?
                K[r + dy, r + dx] = y[:, yy, xx, :]
    # convert impulse responses to a correlation kernel: response at
    # offset d means output[o] += K_resp[d] * input[o - d]  ->
    # correlation kernel tap at (-d)
    K = K[::-1, ::-1]
    # trim all-zero outer rings
    while K.shape[0] > 1 and not (np.any(K[0]) or np.any(K[-1]) or np.any(K[:, 0]) or np.any(K[:, -1])):
        K = K[1:-1, 1:-1]
    return np.ascontiguousarray(K)


def _conv(x, k, dtype):
    pad = ((k.shape[0] // 2, (k.shape[0] - 1) // 2), (k.shape[1] // 2, (k.shape[1] - 1) // 2))
    return jax.lax.conv_general_dilated(x, jnp.asarray(k, dtype), (1, 1), pad, dimension_numbers=_DN)


def _conv_i8(x, k):
    """int8 x int8 -> int32 conv (the v5e MXU runs int8 at ~1.5x the
    bf16 rate at these tail shapes — workspace/profiling/bench_int8_conv.py).
    Accumulation is exact: max |acc| <= taps^2 * C * 127^2 < 2^31."""
    pad = ((k.shape[0] // 2, (k.shape[0] - 1) // 2), (k.shape[1] // 2, (k.shape[1] - 1) // 2))
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), pad, dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def _quantize_act(x: jax.Array, amax: np.ndarray) -> jax.Array:
    """Per-channel symmetric int8 quantization with calibrated amax."""
    s = jnp.asarray(127.0 / amax, jnp.float32)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * s), -127.0, 127.0).astype(jnp.int8)


def build_fast_plan(params: Dict, cfg: SG2Config, min_channels: int = 128) -> Dict:
    """Extract composed cell kernels for every block whose channel
    count is below `min_channels` (where direct convs starve the MXU).
    Returns a plan dict used by `synthesis_fast`.

    Impulse probing runs in pure numpy (mirrored ops below) — no XLA
    compiles at build time. Plans are disk-cached per (config, weight
    checksum)."""
    import os

    from ..utility import WORKSPACE, content_hash

    probe = []
    for res in cfg.block_resolutions:
        if res != 4 and cfg.channels(res) < min_channels:
            probe.append(np.asarray(params["synthesis"][f"b{res}"]["conv0"]["weight"])[0, 0, 0, :4])
    cache_key = content_hash(repr(cfg), min_channels, *probe) if probe else None
    cache_path = None
    if cache_key is not None:
        os.makedirs(os.path.join(WORKSPACE, "fast_plans"), exist_ok=True)
        cache_path = os.path.join(WORKSPACE, "fast_plans", f"plan_{cache_key}.npz")
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                plan = {"blocks": {}, "min_channels": min_channels}
                for k in z.files:
                    res_s, name = k.split("_", 1)
                    plan["blocks"].setdefault(int(res_s), {})[name] = z[k]
                return plan

    plan = _build_fast_plan_impl(params, cfg, min_channels)

    if cache_path is not None:
        np.savez(cache_path, **{f"{res}_{name}": arr for res, e in plan["blocks"].items()
                                for name, arr in e.items()})
    return plan


def _build_fast_plan_impl(params: Dict, cfg: SG2Config, min_channels: int) -> Dict:
    rfilter = ops.setup_filter(list(cfg.resample_filter))
    plan = {"blocks": {}, "min_channels": min_channels}
    for res in cfg.block_resolutions:
        co = cfg.channels(res)
        if res == 4 or co >= min_channels:
            continue
        block = params["synthesis"][f"b{res}"]
        ci = cfg.channels(res // 2)
        entry = {}

        # conv0: transposed conv up2 + FIR, input at res/2 grid (one
        # pixel per cell), output s2d cells of 2x2
        w0 = np.asarray(block["conv0"]["weight"], np.float32)
        entry["k0"] = _extract_kernel(
            lambda x: _np_conv2d_resample_up2(x, w0, rfilter, padding=1),
            ci, in_cell=1, out_cell=2,
        )
        # conv1: 3x3 same at res, in/out s2d cells
        w1 = np.asarray(block["conv1"]["weight"], np.float32)
        entry["k1"] = _extract_kernel(
            lambda x: _np_corr(x, w1, pads=((1, 1), (1, 1))),
            co, in_cell=2, out_cell=2,
        )
        if "torgb" in block:
            wt = np.asarray(block["torgb"]["weight"], np.float32)
            entry["kt"] = _extract_kernel(
                lambda x: _np_corr(x, wt, pads=((0, 0), (0, 0))),
                co, in_cell=2, out_cell=2,
            )
        # img upsample FIR: img at res/2 full-res (1px cells) -> s2d
        # cells at res/2 grid
        entry["kimg"] = _extract_kernel(
            lambda x: _np_upsample2d(x, rfilter), cfg.img_channels, in_cell=1, out_cell=2,
        )
        # w^2 sums for demodulation (original weight layout)
        entry["w0_sq"] = np.sum(w0**2, axis=(0, 1))  # (ci, co)
        entry["w1_sq"] = np.sum(np.asarray(block["conv1"]["weight"], np.float32) ** 2, axis=(0, 1))
        plan["blocks"][res] = entry
    return plan


def _tile_styles_in(styles: jax.Array, cells: int) -> jax.Array:
    """Input-channel scaling in phase-major s2d layout: (B, C) ->
    (B, cells^2 * C) by tiling across phases."""
    return jnp.tile(styles, (1, cells * cells))


def _cell_noise(p, name, res, batch, noise_mode, noises, key, dtype):
    """Per-layer noise directly in cell layout (B, res/2, res/2, 4, 1).

    random mode samples straight into the cell shape (iid, so the
    distribution matches the full-res path without the s2d transpose);
    const/dict modes transform the exact buffers."""
    if noise_mode == "none":
        return None
    strength = p.get("noise_strength", jnp.ones(()))
    if noises is not None and name in noises:
        n = noises[name]
        if n.ndim == 5:  # already cell-packed (B, r/2, r/2, 4, 1)
            return (n * strength).astype(dtype)
        if n.ndim == 2:
            n = n[None, :, :, None]
        elif n.ndim == 3:
            n = n[..., None]
        n = jnp.broadcast_to(n * strength, (batch, res, res, 1))
        return space_to_depth(n).reshape(batch, res // 2, res // 2, 4, 1).astype(dtype)
    if noise_mode == "random":
        n = jax.random.normal(key, (batch, res // 2, res // 2, 4, 1), dtype)
        return n * strength.astype(dtype)
    nc = p["noise_const"] * strength  # (res, res)
    return space_to_depth(nc[None, :, :, None]).reshape(1, res // 2, res // 2, 4, 1).astype(dtype)


def _add_cell_noise(y: jax.Array, n, co: int):
    """y: (B, h, w, 4*co) phase-major; n: (B|1, h, w, 4, 1)."""
    if n is None:
        return y
    b, h, w, _ = y.shape
    return (y.reshape(b, h, w, 4, co) + n).reshape(b, h, w, 4 * co)


def _fused_epilogue(y, demod, n_cell, bias, clamp, pre_next=None, quant_out=False):
    """Post-conv chain (demod scale + cell noise + bias + lrelu + clamp
    [+ next layer's input scale]) as ONE fused HBM pass.

    Default: one consolidated XLA chain in native NHWC (XLA fuses and
    overlaps it well in the full graph — measured 203 fps at 1024^2).
    MAUA_FUSED_EPILOGUE=1 dispatches to the Pallas kernel
    (`kernels/epilogue.py`) instead, which wins in isolation (8.8 ms vs
    14.7 ms per 16x512x512x128 layer on v5e) but loses in the full
    pipeline (160 fps): the pallas_call boundary blocks XLA's
    cross-layer overlap. Kept opt-in for standalone epilogue use.

    y: (B, h, w, 4co); demod: (B, 4co) f32; n_cell: (B|1, h, w, 4, 1) or
    None; bias: (4co,); pre_next: (B, 4co) or None."""
    import os

    from ..kernels.epilogue import _xla_epilogue, modconv_epilogue

    b, h, w, c = y.shape
    n4 = None if n_cell is None else n_cell.reshape(n_cell.shape[0], h, w, 4)
    if quant_out or os.environ.get("MAUA_FUSED_EPILOGUE", "0") != "1":
        return _xla_epilogue(y, demod, n4, bias, 0.2, float(np.sqrt(2.0)),
                             float(clamp) if clamp is not None else None, pre_next,
                             quant_out=quant_out)
    return modconv_epilogue(
        y, demod, n4, bias,
        clamp=float(clamp) if clamp is not None else None, pre_next=pre_next,
    )


def motion_layer_bound(plan: Dict, cfg: SG2Config) -> int:
    """First per-conv layer index that falls inside the s2d tail —
    motion transforms at indices below this run in the direct head and
    are therefore fast-path compatible (wrappers.StyleGAN2.synthesizer
    dispatch)."""
    li = 2
    for res in cfg.block_resolutions[1:]:
        if res in plan["blocks"]:
            return li
        li += 2
    return li


def synthesis_fast(
    params: Dict,
    plan: Dict,
    ws: jax.Array,
    cfg: SG2Config,
    noise_mode: str = "random",
    noises: Optional[Dict] = None,
    noise_key: Optional[jax.Array] = None,
    translation: Optional[jax.Array] = None,
    zoom: Optional[jax.Array] = None,
    rotation: Optional[jax.Array] = None,
    rcfg=None,
    _amax_tape: Optional[Dict] = None,
) -> jax.Array:
    """Exact fast-path synthesis: identical math to
    `stylegan2.synthesis`, with the low-channel tail running on
    space-to-depth grids.

    If the plan was passed through `quantize_plan`, the tail convs run
    int8 on the MXU (calibrated per-channel activation quantization;
    dequant scales folded into the demod epilogue). `_amax_tape` is the
    calibration hook: when a dict is supplied, per-channel |max| of each
    quantizable conv input is recorded into it during the trace."""
    from .stylegan2 import synthesis_layer, torgb_layer, _layer_noise

    syn = params["synthesis"]
    rfilter = ops.setup_filter(list(cfg.resample_filter))
    batch = ws.shape[0]
    if noise_key is None:
        noise_key = jax.random.PRNGKey(0)

    # motion transforms (translate/zoom/rotate at rcfg.*_layer) apply in
    # the DIRECT head only — those layers sit at coarse resolutions
    # (default 7 ~ b32), far below the s2d tail; `motion_layers_in_head`
    # guards the dispatch. Same per-conv layer indexing as
    # `stylegan2.synthesize` (li=0 after b4.conv1, then 2,3,... per conv).
    if rcfg is None:
        from .wrappers import RenderConfig

        rcfg = RenderConfig()

    def maybe_motion(x, idx):
        from ..ops import warp as W

        if translation is not None and idx == rcfg.translation_layer:
            h, w = x.shape[1], x.shape[2]
            t = jnp.asarray(translation, jnp.float32) * jnp.asarray([w, h], jnp.float32)
            x = W.translate(x.astype(jnp.float32), t).astype(x.dtype)
        if zoom is not None and idx == rcfg.zoom_layer:
            x = W.zoom(x.astype(jnp.float32), zoom, rcfg.zoom_center).astype(x.dtype)
        if rotation is not None and idx == rcfg.rotation_layer:
            x = W.rotate(x.astype(jnp.float32), rotation, rcfg.rotation_center).astype(x.dtype)
        return x

    li = 1
    x = None
    img = None  # while in direct mode: (B, H, W, 3); in s2d mode: cell layout
    w_idx = 0
    s2d_mode = False

    for bi, res in enumerate(cfg.block_resolutions):
        block = syn[f"b{res}"]
        dtype = cfg.compute_dtype(res)
        num_conv = cfg.block_num_conv(res)
        block_ws = ws[:, w_idx : w_idx + num_conv + 1]
        fast = res in plan["blocks"]

        if not fast:
            # direct path (low-res blocks with big channel counts)
            if res == 4:
                x = jnp.tile(block["const"][None].astype(dtype), (batch, 1, 1, 1))
                n = _layer_noise(block["conv1"], f"b{res}.conv1", res, batch, noise_mode, noises,
                                 jax.random.fold_in(noise_key, 2 * bi + 1))
                x = synthesis_layer(block["conv1"], x, block_ws[:, 0], res, 1, rfilter, cfg, n)
                x = maybe_motion(x, 0)
                li = 2
            else:
                x = x.astype(dtype)
                n0 = _layer_noise(block["conv0"], f"b{res}.conv0", res, batch, noise_mode, noises,
                                  jax.random.fold_in(noise_key, 2 * bi))
                n1 = _layer_noise(block["conv1"], f"b{res}.conv1", res, batch, noise_mode, noises,
                                  jax.random.fold_in(noise_key, 2 * bi + 1))
                x = synthesis_layer(block["conv0"], x, block_ws[:, 0], res, 2, rfilter, cfg, n0)
                x = maybe_motion(x, li)
                li += 1
                x = synthesis_layer(block["conv1"], x, block_ws[:, 1], res, 1, rfilter, cfg, n1)
                x = maybe_motion(x, li)
                li += 1
            if img is not None:
                img = ops.upsample2d(img, rfilter)
            if res == cfg.img_resolution or cfg.architecture == "skip":
                y = torgb_layer(block["torgb"], x, block_ws[:, num_conv], cfg)
                img = (img + y.astype(img.dtype)) if img is not None else y.astype(jnp.float32)
            w_idx += num_conv
            continue

        # ---------------- fast s2d block ----------------
        entry = plan["blocks"][res]
        ci = cfg.channels(res // 2)
        co = cfg.channels(res)
        p0, p1 = block["conv0"], block["conv1"]

        if s2d_mode:
            x = depth_to_space(x)  # chained fast blocks hand off s2d

        quant = "q0" in entry

        # conv0 (up): input direct grid (res/2), output s2d cells
        styles0 = fc_forward(p0["affine"], block_ws[:, 0].astype(jnp.float32))
        x_in = x.astype(dtype) * styles0.astype(dtype)[:, None, None, :]
        if _amax_tape is not None:
            _amax_tape[f"{res}.a0"] = jnp.max(jnp.abs(x_in.astype(jnp.float32)), axis=(0, 1, 2))
        d0 = jax.lax.rsqrt(jnp.square(styles0) @ jnp.asarray(entry["w0_sq"]) + 1e-8)
        n0 = _cell_noise(p0, f"b{res}.conv0", res, batch, noise_mode, noises,
                         jax.random.fold_in(noise_key, 2 * bi), dtype)
        # fused epilogue also applies conv1's input style scale, saving
        # a further full-tensor HBM pass
        styles1 = fc_forward(p1["affine"], block_ws[:, 1].astype(jnp.float32))
        d1 = jax.lax.rsqrt(jnp.square(styles1) @ jnp.asarray(entry["w1_sq"]) + 1e-8)
        pre1 = _tile_styles_in(styles1, 2)
        if quant:
            y = _conv_i8(_quantize_act(x_in, entry["a0"]), entry["q0"]).astype(jnp.float32)
            # dequant scale (per-out-channel weight scale) folds into
            # the demod; the next conv's quantization (127/a1) folds
            # into pre_next so the epilogue emits int8 directly
            y = _fused_epilogue(
                y, jnp.tile(d0, (1, 4)) * jnp.asarray(entry["s0"])[None], n0,
                jnp.tile(p0["bias"], (4,)), cfg.conv_clamp,
                pre_next=pre1 * jnp.asarray(127.0 / entry["a1"], jnp.float32)[None],
                quant_out=True,
            )
            z = _conv_i8(y, entry["q1"]).astype(jnp.float32)
            x = _fused_epilogue(
                z, jnp.tile(d1, (1, 4)) * jnp.asarray(entry["s1"])[None],
                _cell_noise(p1, f"b{res}.conv1", res, batch, noise_mode, noises,
                            jax.random.fold_in(noise_key, 2 * bi + 1), jnp.float32),
                jnp.tile(p1["bias"], (4,)), cfg.conv_clamp,
            ).astype(dtype)
        else:
            y = _conv(x_in, entry["k0"], dtype)  # (B, res/2, res/2, 4*co)
            y = _fused_epilogue(y, jnp.tile(d0, (1, 4)), n0, jnp.tile(p0["bias"], (4,)),
                                cfg.conv_clamp, pre_next=pre1)
            if _amax_tape is not None:
                _amax_tape[f"{res}.a1"] = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=(0, 1, 2))

            # conv1 (same): s2d -> s2d (input scale already applied above)
            z = _conv(y, entry["k1"], dtype)
            n1 = _cell_noise(p1, f"b{res}.conv1", res, batch, noise_mode, noises,
                             jax.random.fold_in(noise_key, 2 * bi + 1), dtype)
            x = _fused_epilogue(z, jnp.tile(d1, (1, 4)), n1, jnp.tile(p1["bias"], (4,)),
                                cfg.conv_clamp)

        # img path: upsample previous img into this block's s2d cells
        if img is not None:
            if s2d_mode:
                img = depth_to_space(img)  # back to full res of res/2 grid
            img = _conv(img.astype(jnp.float32), entry["kimg"], jnp.float32)  # s2d at res/2 grid
        if res == cfg.img_resolution or cfg.architecture == "skip":
            pt = block["torgb"]
            stylest = fc_forward(pt["affine"], block_ws[:, num_conv].astype(jnp.float32))
            k = pt["weight"].shape[0]
            weight_gain = 1.0 / math.sqrt(co * k * k)
            xin = x * _tile_styles_in(stylest * weight_gain, 2).astype(dtype)[:, None, None, :]
            yt = _conv(xin, entry["kt"], dtype)
            biast = jnp.tile(pt["bias"], (4,))
            yt = ops.bias_act(yt, biast.astype(dtype), clamp=cfg.conv_clamp)
            img = (img + yt.astype(jnp.float32)) if img is not None else yt.astype(jnp.float32)
        s2d_mode = True
        w_idx += num_conv

    if s2d_mode:
        img = depth_to_space(img)
    return img.astype(jnp.float32)


def quantize_plan(params: Dict, plan: Dict, cfg: SG2Config, ws: Optional[jax.Array] = None,
                  batch: int = 8, seed: int = 0, margin: float = 1.05) -> Dict:
    """Calibrate and quantize the fast-tail convs to int8 (opt-in).

    The v5e MXU runs int8 x int8 -> int32 at ~1.5x the bf16 rate at the
    tail shapes (workspace/profiling/bench_int8_conv.py), and the int8
    epilogue output halves the activation HBM write. Exactness becomes
    approximation: per-channel symmetric activation quantization with
    amax calibrated over `batch` mapped latents (x `margin`, clipped at
    runtime), per-output-channel weight scales folded into the demod
    epilogue. Quality: ~32 dB PSNR vs the f32 reference with the tail
    blocks quantized (vs ~47 dB for the bf16 path) — W8A8 with max
    calibration, so use only where speed matters more than the last
    bits of fidelity (tests/test_fast_synthesis.py pins >30 dB).

    Mutates and returns `plan` with `q0/s0/a0/q1/s1/a1` per fast block;
    `synthesis_fast` auto-dispatches on their presence."""
    if not plan["blocks"]:
        return plan
    # recalibration: strip any existing quant keys so the calibration
    # trace takes the float path (which is what writes the amax tape)
    for entry in plan["blocks"].values():
        for k in ("q0", "q1", "s0", "s1", "a0", "a1"):
            entry.pop(k, None)
    if ws is None:
        from .stylegan2 import mapping

        z = jax.random.normal(jax.random.PRNGKey(seed), (batch, cfg.z_dim))
        c = None
        if cfg.c_dim > 0:
            # conditional model: calibrate over random one-hot labels
            labels = jax.random.randint(jax.random.PRNGKey(seed + 7), (batch,), 0, cfg.c_dim)
            c = jax.nn.one_hot(labels, cfg.c_dim)
        ws = mapping(params, z, cfg, c=c)

    def run(ws):
        tape: Dict = {}
        synthesis_fast(params, plan, ws, cfg, noise_mode="random",
                       noise_key=jax.random.PRNGKey(seed + 1), _amax_tape=tape)
        return tape

    tape = jax.device_get(jax.jit(run)(ws))
    for res, entry in plan["blocks"].items():
        a0 = np.maximum(np.asarray(tape[f"{res}.a0"], np.float32) * margin, 1e-6)
        a1 = np.maximum(np.asarray(tape[f"{res}.a1"], np.float32) * margin, 1e-6)
        for kname, a, sk, qk in (("k0", a0, "s0", "q0"), ("k1", a1, "s1", "q1")):
            # fold the activation dequant (a/127 per input channel) into
            # the weight, then quantize per output channel
            w = entry[kname] * (a / 127.0)[None, None, :, None]
            s = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12).astype(np.float32)
            entry[qk] = np.clip(np.round(w / s), -127, 127).astype(np.int8)
            entry[sk] = s
        entry["a0"], entry["a1"] = a0, a1
    return plan


def make_fast_synthesis(params: Dict, cfg: SG2Config, min_channels: int = 128,
                        int8: bool = False):
    """Build the plan and return a jitted fast synthesis closure.

    int8=True additionally calibrates + quantizes the tail convs
    (`quantize_plan`) — faster, no longer bit-exact."""
    plan = build_fast_plan(params, cfg, min_channels)
    if int8:
        plan = quantize_plan(params, plan, cfg)
    return jax.jit(lambda ws, **kw: synthesis_fast(params, plan, ws, cfg, **kw),
                   static_argnames=("noise_mode",)), plan
