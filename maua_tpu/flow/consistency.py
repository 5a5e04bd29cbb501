"""Ruder forward-backward flow consistency check, jittable.

Rebuild of `maua/flow/consistency.py:86-127` (torch port of the Ruder
et al. consistencyChecker): marks motion boundaries, mismatched
round-trips, and out-of-frame warps as unreliable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.warp import grid_sample


def _conv2(x, k):
    """Depthwise 'same' correlation of (H, W, C) with (kh, kw)."""
    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x[None], kern, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]


def _sample(field: jax.Array, pos: jax.Array) -> jax.Array:
    """Sample (H, W, C) field at pixel positions pos (H, W, 2),
    align_corners=True convention like the reference (:78-82)."""
    h, w, _ = field.shape
    max_pos = jnp.asarray([w - 1, h - 1], jnp.float32)
    grid = pos / (max_pos / 2.0) - 1.0
    # align_corners=True: rescale to half-pixel convention used by our
    # grid_sample (align_corners=False): x_ac = grid * (n-1)/n
    scale = (max_pos) / jnp.asarray([w, h], jnp.float32)
    grid = grid * scale
    return grid_sample(field[None], grid[None], padding_mode="border")[0]


def check_consistency(flow_forward: jax.Array, flow_backward: jax.Array) -> jax.Array:
    """(B, H, W, 2) flows -> (H, W) reliability mask in [0, 1]
    (`flow/consistency.py:86-127`)."""
    fwd = jnp.asarray(flow_forward)
    bwd = jnp.asarray(flow_backward)
    if fwd.ndim == 4:
        fwd, bwd = fwd[0], bwd[0]
    h, w, _ = fwd.shape

    dx_k = jnp.array([[0, 0, 0], [1, 0, -1], [0, 0, 0]], jnp.float32) / 2.0
    dy_k = jnp.array([[0, 1, 0], [0, 0, 0], [0, -1, 0]], jnp.float32) / 2.0
    f_x = _conv2(bwd, dx_k)
    f_y = _conv2(bwd, dy_k)
    motionedge = jnp.sum(jnp.square(f_x), -1) + jnp.sum(jnp.square(f_y), -1)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    p1 = jnp.stack([xs, ys], axis=-1)
    p0 = p1 + bwd
    v0 = _sample(fwd, p0)
    p1_back = p0 + v0
    v1_back = bwd

    r1 = jnp.floor(p0)
    r2 = r1 + 1
    overshoot = (
        (r1[..., 0] < 0) | (r1[..., 1] < 0) | (r2[..., 0] > w - 1) | (r2[..., 1] > h - 1)
    )

    roundtrip_err = jnp.sum(jnp.square(p1_back - p1), axis=-1)
    flow_mag = jnp.sum(jnp.square(v1_back), axis=-1) + jnp.sum(jnp.square(v0), axis=-1)
    missed = roundtrip_err >= flow_mag * 0.01 + 0.5
    motion_boundary = motionedge >= jnp.sum(jnp.square(v1_back), axis=-1) * 0.01 + 0.002

    reliable = jnp.ones((h, w))
    reliable = jnp.where(motion_boundary, 0.0, reliable)
    reliable = jnp.where(missed, -0.75, reliable)
    reliable = jnp.where(overshoot, 0.0, reliable)

    # 3x3 gaussian blur then clip (torchvision gaussian_blur(k=3))
    g = jnp.array([0.25, 0.5, 0.25])
    gk = jnp.outer(g, g)
    blurred = _conv2(reliable[..., None], gk)[..., 0]
    return jnp.clip(blurred, 0.0, 1.0)


def check_consistency_np(flow_forward, flow_backward):
    """numpy entry point (`flow/consistency.py:8-75`)."""
    import numpy as np

    return np.asarray(check_consistency(flow_forward, flow_backward))
