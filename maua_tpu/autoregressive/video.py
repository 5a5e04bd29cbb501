"""Frame-sequential autoregressive video generation with a rolling
token window and tensor-parallel sharding.

Rebuild of the CogVideo first-party logic (`maua/autoregressive/cog/
video/generate.py` sequence-filling sampler :182-547,
model-parallel init :1250-1253; rolling window `infinite.py:80-116`):
frames are generated as successive image-token grids conditioned on a
window of previous frames; the megatron TP becomes pjit NamedShardings
from `transformer.tp_shardings` over the mesh `tensor` axis.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from .transformer import ARConfig, generate_tokens, tp_shardings


def generate_video_tokens(
    params,
    text_tokens: jax.Array,
    cfg: ARConfig,
    n_frames: int,
    key=None,
    window: int = 2,
    temperature: float = 1.0,
    top_k: int = 64,
) -> np.ndarray:
    """Rolling-window frame generation: each frame's token grid is
    sampled conditioned on the text + a window of previous frames
    folded into the text slot (`cog/video/infinite.py:80-116`).
    Returns (n_frames, B, rows*cols)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    frames = []
    ctx = jnp.asarray(text_tokens)
    for f in range(n_frames):
        key, sub = jax.random.split(key)
        toks = generate_tokens(params, ctx, cfg, sub, temperature=temperature, top_k=top_k)
        frames.append(np.asarray(toks))
        # roll previous frame tokens into the conditioning slot
        prev = (toks[:, : cfg.text_length] % cfg.text_vocab_size).astype(jnp.int32)
        ctx = prev if window <= 1 else jnp.concatenate(
            [ctx[:, prev.shape[1]:], prev[:, : cfg.text_length]], axis=1
        )[:, : cfg.text_length]
    return np.stack(frames)


def sharded_generate(params, text_tokens, cfg: ARConfig, mesh, key=None, **kwargs):
    """Run generation with TP-sharded params over a mesh (the pjit
    replacement for `mpu.initialize_model_parallel`,
    `cog/video/generate.py:1250-1253`)."""
    shardings = tp_shardings(params, mesh)
    params_sharded = jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), params, shardings)
    with mesh:
        return generate_tokens(params_sharded, jnp.asarray(text_tokens), cfg,
                               key if key is not None else jax.random.PRNGKey(0), **kwargs)
