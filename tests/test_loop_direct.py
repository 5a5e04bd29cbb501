"""Tests for the direct multi-pass diffusion video loop
(reference: maua/diffusion/experimental/loop_direct.py)."""

import uuid

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.diffusion.loop_direct import _blend_init, _warp, loop_direct_sample
from maua_tpu.diffusion.processors.base import BaseDiffusionProcessor
from maua_tpu.ops.video import write_video


class MarkerDiffusion(BaseDiffusionProcessor):
    """Partial-denoise stub: records every (t_start, t_end) call and
    nudges the image deterministically so pass blending is observable."""

    image_size = 32

    def __init__(self):
        self.calls = []

    def forward(self, img, prompts, t_start, t_end=1.0, verbose=True, key=None):
        self.calls.append((round(float(t_start), 4), round(float(t_end), 4)))
        return jnp.clip(img * 0.9 + 0.05, -1, 1)


@pytest.fixture()
def tiny_video(tmp_path):
    # unique stem: preprocess_optical_flow caches by stem in WORKSPACE
    path = str(tmp_path / f"ld_{uuid.uuid4().hex[:8]}.mp4")
    rs = np.random.RandomState(0)
    base = rs.rand(24, 24, 3).astype(np.float32)
    # smooth horizontal pan so farneback finds real flow
    frames = np.stack([np.roll(base, s, axis=1) for s in range(4)])
    write_video(frames, path, fps=8, value_range=(0, 1))
    return path


def test_loop_direct_multipass_schedule(tiny_video):
    """blend_every splits the denoise schedule into passes covering
    [t_start, t_end) windows that tile (skip, 1.0]."""
    diff = MarkerDiffusion()
    video = loop_direct_sample(
        diff, tiny_video, text="x", size=(16, 16), timesteps=10, skip=0.4,
        blend_every=3, blend=2.0, verbose=False, key=jax.random.PRNGKey(0),
    )
    assert video.shape == (4, 16, 16, 3)
    assert np.all(np.isfinite(video))
    # n_steps = 6 -> passes of 3+3 steps: windows (0.4,0.7], (0.7,1.0]
    windows = sorted(set(diff.calls))
    assert windows == [(0.4, 0.7), (0.7, 1.0)]
    # every frame diffused once per pass
    assert len(diff.calls) == 2 * 4


def test_loop_direct_turbo_warps(tiny_video):
    """turbo=2 diffuses every 2nd frame and pure-warps the rest."""
    diff = MarkerDiffusion()
    video = loop_direct_sample(
        diff, tiny_video, size=(16, 16), timesteps=10, skip=0.6,
        blend_every=None, turbo=2, verbose=False, key=jax.random.PRNGKey(1),
    )
    assert video.shape == (4, 16, 16, 3)
    assert len(diff.calls) == 2  # 4 frames / turbo 2, one pass


def test_blend_init_math():
    """init' = (init + mask*warp(prev)) / (1+mask) with
    mask = (rel*trust + 1-trust)*blend — zero flow makes warp identity,
    rel=1/trust=1 gives (init + blend*prev)/(1+blend)."""
    init = jnp.ones((1, 8, 8, 3)) * 0.5
    prev = jnp.zeros((1, 8, 8, 3))
    flow = jnp.zeros((8, 8, 2))
    rel = jnp.ones((8, 8))
    out = np.asarray(_blend_init(init, prev, flow, rel, jnp.float32(1.0), jnp.float32(2.0)))
    assert np.allclose(out, 0.5 / 3.0, atol=1e-6)
    # warp with zero flow is identity
    img = jnp.arange(8.0 * 8 * 3).reshape(1, 8, 8, 3)
    assert np.allclose(np.asarray(_warp(img, flow)), np.asarray(img), atol=1e-4)
