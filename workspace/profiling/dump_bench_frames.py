"""Dump the exact e2e bench content (bench.py's latent-interpolation
loop frames) to disk so codec experiments (rate allocation, predictors,
decoder SIMD) can run offline on this host without the TPU.

Writes workspace/bench_frames_c{K}.npy, (32, 1024, 1024, 3) uint8 each.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from maua_tpu.gan import fast_synthesis as fs
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.ops.video import fetch_parallel

resolution, batch = 1024, 56
cfg = sg2.SG2Config(img_resolution=resolution, dtype="bfloat16")
params = sg2.init_params(jax.random.PRNGKey(0), cfg)
plan = fs.build_fast_plan(params, cfg)

key = jax.random.PRNGKey(3)
noises = {}
for res in cfg.block_resolutions:
    for c in (["conv1"] if res == 4 else ["conv0", "conv1"]):
        key, sub = jax.random.split(key)
        if res in plan["blocks"]:
            noises[f"b{res}.{c}"] = jax.random.normal(sub, (batch, res // 2, res // 2, 4, 1), jnp.bfloat16)
        else:
            noises[f"b{res}.{c}"] = jax.random.normal(sub, (batch, res, res, 1))

base_ws = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.num_ws, cfg.w_dim), jnp.float32)
e2e_batch = min(batch, 32)
kf = base_ws[:4]
loop_frames = 192


def _ws_at(t_idx):
    t = t_idx.astype(jnp.float32) / loop_frames * 4.0
    i0 = jnp.floor(t).astype(jnp.int32) % 4
    i1 = (i0 + 1) % 4
    frac = (t - jnp.floor(t))[:, None, None]
    smooth = frac * frac * (3.0 - 2.0 * frac)
    return (1.0 - smooth) * kf[i0] + smooth * kf[i1]


def render_frames(params, noises_b, c):
    idx = c * e2e_batch + jnp.arange(e2e_batch)
    img = fs.synthesis_fast(params, plan, _ws_at(idx), cfg, noises=noises_b)
    return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


render_rgb = jax.jit(render_frames)
noises_b = {k: v[:e2e_batch] for k, v in noises.items()}

for c in [0, 1, 2]:
    t0 = time.perf_counter()
    rgb = fetch_parallel(render_rgb(params, noises_b, jnp.int32(c)))
    print(f"chunk {c}: fetched {rgb.nbytes/1e6:.0f} MB in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    np.save(f"workspace/bench_frames_c{c}.npy", np.asarray(rgb))
print("done", file=sys.stderr)
