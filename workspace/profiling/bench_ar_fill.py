"""Measure KV-cached vs recompute-prefix sequence filling on the real
chip. Run from /root/repo: `python workspace/profiling/bench_ar_fill.py`."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from maua_tpu.autoregressive import video
from maua_tpu.autoregressive.transformer import ARConfig, init_params

cfg = ARConfig(width=384, layers=6, heads=8, image_rows=16, image_cols=16,
               text_length=16, max_frames=5)
params = init_params(jax.random.PRNGKey(0), cfg)
text = np.zeros((1, cfg.text_length), np.int64)
n_frames = 5
seq, fids, boi = video.build_video_sequence(cfg, text, n_frames)
T = seq.shape[1]
n_sampled = int(np.sum(seq < 0))
print(f"T={T} tokens, {n_sampled} sampled, width={cfg.width} layers={cfg.layers}")

for name, cached in [("kv-cached", True), ("recompute", False)]:
    k = jax.random.PRNGKey(1)
    t0 = time.time()
    out = video.filling_sequence(params, seq, fids, boi, cfg, k, cached=cached)
    np.asarray(out)
    compile_t = time.time() - t0
    t0 = time.time()
    reps = 2
    for i in range(reps):
        out = video.filling_sequence(params, seq, fids, boi, cfg,
                                     jax.random.PRNGKey(2 + i), cached=cached)
        np.asarray(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt:.3f} s/window ({n_sampled / dt:.1f} tok/s), compile+1st {compile_t:.1f} s")
