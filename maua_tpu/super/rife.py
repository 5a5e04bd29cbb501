"""RIFE-style frame interpolation (IFNet), functional JAX.

Rebuild of `maua/super/video/framerate/rife.py` (load_model :39-90,
recursive_inference :93-102, interpolate :105-119): a coarse-to-fine
IFNet predicting bidirectional flow + fusion mask, applied recursively
to produce 2^n x framerate. Warping uses maua_tpu.ops.warp.grid_sample.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import grid_sample, identity_grid


@dataclasses.dataclass(frozen=True)
class RIFEConfig:
    base_channels: int = 32
    scales: int = 3  # coarse-to-fine IFBlocks at 1/4, 1/2, 1/1


def _conv_init(key, ci, co, k=3):
    s = math.sqrt(2.0 / (ci * k * k))
    return {"w": jax.random.normal(key, (k, k, ci, co)) * s, "b": jnp.zeros((co,))}


def _conv(p, x, stride=1):
    pad = p["w"].shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def _init_ifblock(key, c_in, c):
    ks = jax.random.split(key, 6)
    return {
        "conv0": _conv_init(ks[0], c_in, c),
        "conv1": _conv_init(ks[1], c, c),
        "conv2": _conv_init(ks[2], c, c),
        "conv3": _conv_init(ks[3], c, c),
        # 4 flow channels (two bidirectional flows) + 1 mask
        "head": _conv_init(ks[4], c, 5),
    }


def _ifblock(p, x):
    h = jax.nn.leaky_relu(_conv(p["conv0"], x, stride=2), 0.2)
    h = jax.nn.leaky_relu(_conv(p["conv1"], h), 0.2)
    h = jax.nn.leaky_relu(_conv(p["conv2"], h), 0.2)
    h = jax.nn.leaky_relu(_conv(p["conv3"], h), 0.2)
    out = _conv(p["head"], h)
    b, hh, ww, c = out.shape
    return jax.image.resize(out, (b, hh * 2, ww * 2, c), "bilinear")


def init_params(key, cfg: RIFEConfig = RIFEConfig()) -> Dict:
    ks = jax.random.split(key, cfg.scales)
    blocks = []
    for i in range(cfg.scales):
        c_in = 6 if i == 0 else 6 + 5  # frames (+ prev flow/mask estimate)
        blocks.append(_init_ifblock(ks[i], c_in, cfg.base_channels * (2 ** (cfg.scales - 1 - i))))
    return {"blocks": blocks}


def _warp(img, flow):
    """Backward-warp img by flow in pixels. img (B,H,W,C), flow (B,H,W,2)."""
    b, h, w, _ = img.shape
    grid = identity_grid(b, h, w)
    norm = jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
    return grid_sample(img, grid + flow * norm, padding_mode="border")


def midpoint(params: Dict, frame0: jax.Array, frame1: jax.Array, cfg: RIFEConfig = RIFEConfig()) -> jax.Array:
    """Predict the temporal midpoint frame. Frames (B, H, W, 3) in
    [0, 1] with H, W divisible by 2^(scales+1)."""
    b, h, w, _ = frame0.shape
    est = None
    for i, blk in enumerate(params["blocks"]):
        scale = 2 ** (cfg.scales - 1 - i)
        f0 = jax.image.resize(frame0, (b, h // scale, w // scale, 3), "bilinear")
        f1 = jax.image.resize(frame1, (b, h // scale, w // scale, 3), "bilinear")
        if est is None:
            inp = jnp.concatenate([f0, f1], axis=-1)
        else:
            est_up = jax.image.resize(est, (b, h // scale, w // scale, 5), "bilinear")
            est_up = est_up.at[..., :4].multiply(2.0)  # flows scale with resolution
            w0 = _warp(f0, est_up[..., 0:2])
            w1 = _warp(f1, est_up[..., 2:4])
            inp = jnp.concatenate([w0, w1, est_up], axis=-1)
            est = est_up
        delta = _ifblock(blk, inp)
        est = delta if est is None else est + delta
    flow0 = est[..., 0:2]
    flow1 = est[..., 2:4]
    mask = jax.nn.sigmoid(est[..., 4:5])
    w0 = _warp(frame0, flow0)
    w1 = _warp(frame1, flow1)
    return jnp.clip(w0 * mask + w1 * (1 - mask), 0.0, 1.0)


def recursive_inference(params, frame0, frame1, n: int, cfg: RIFEConfig = RIFEConfig(),
                        mid_fn=None) -> List[jax.Array]:
    """2^n - 1 intermediate frames (`rife.py:93-102`). Pass a jitted
    `mid_fn(params, a, b)` to avoid eager per-op dispatch."""
    if n == 0:
        return []
    fn = mid_fn if mid_fn is not None else (lambda p, a, b: midpoint(p, a, b, cfg))
    mid = fn(params, frame0, frame1)
    return (recursive_inference(params, frame0, mid, n - 1, cfg, fn) + [mid]
            + recursive_inference(params, mid, frame1, n - 1, cfg, fn))


def interpolate(frames: np.ndarray, factor: int = 2, params=None, cfg: RIFEConfig = RIFEConfig(),
                key=None, pix_fmt: str = "rgb24") -> Iterator[np.ndarray]:
    """Yield an interpolated frame stream at `factor`x rate
    (`rife.py:105-119`). frames: (T, H, W, 3) in [0, 1].

    Frames for pair i are fetched while pair i+1's midpoints are
    dispatched (device->host overlap, PERFORMANCE.md encode-path
    pipelining). pix_fmt="yuv420p" additionally converts to planar I420
    uint8 on device — (3H/2, W) per yielded frame, half the bytes."""
    if params is None:
        params = init_params(key if key is not None else jax.random.PRNGKey(0), cfg)
    n = int(math.log2(factor))
    mids_fn = jax.jit(lambda p, a, b: midpoint(p, a, b, cfg))

    if pix_fmt == "yuv420p":
        from ..ops.video import rgb_to_yuv420

        conv = jax.jit(lambda x: rgb_to_yuv420(jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8))[0])
    else:
        conv = lambda x: x[0]

    pending: List = []
    for i in range(len(frames) - 1):
        f0, f1 = jnp.asarray(frames[i : i + 1]), jnp.asarray(frames[i + 1 : i + 2])
        cur = [conv(f0)]
        if n == 1:
            cur.append(conv(mids_fn(params, f0, f1)))
        elif n > 1:
            cur += [conv(m) for m in recursive_inference(params, f0, f1, n, cfg, mid_fn=mids_fn)]
        for m in pending:  # fetch pair i-1 while pair i computes
            yield np.asarray(m)
        pending = cur
    pending.append(conv(jnp.asarray(frames[-1:])))
    for m in pending:
        yield np.asarray(m)
