#!/usr/bin/env python
"""StyleGAN3 (alias-free) 1024^2 synthesis frames/sec on one chip.

Companion to bench.py (the driver's headline SG2 bench): same scan-
over-chunks structure and scalar-fetch sync, through the bf16 trunk +
fused Pallas filtered-lrelu path. Knobs:

  MAUA_BENCH_SG3_BATCH   frames per chunk (default 8)
  MAUA_BENCH_SG3_CHUNKS  chunks per timed call (default 4)
  MAUA_BENCH_SG3_TORGB   "bf16" to run torgb in bf16 as well

Prints ONE JSON line like bench.py.
"""

import json
import os
import sys
import time


def main():
    import jax

    from maua_tpu.utility import enable_compilation_cache

    enable_compilation_cache()  # opt-in via MAUA_COMPILE_CACHE
    import jax.numpy as jnp

    from maua_tpu.gan import stylegan3 as sg3

    batch = int(os.environ.get("MAUA_BENCH_SG3_BATCH", "8"))
    n_chunks = int(os.environ.get("MAUA_BENCH_SG3_CHUNKS", "4"))
    cfg = sg3.SG3Config(img_resolution=1024, dtype="bfloat16",
                        torgb_bf16=os.environ.get("MAUA_BENCH_SG3_TORGB", "") == "bf16")
    params = jax.device_put(sg3.init_params(jax.random.PRNGKey(0), cfg))
    int8_plan = None
    if os.environ.get("MAUA_BENCH_SG3_INT8", "") == "1":
        int8_plan = jax.device_put(sg3.quantize_sg3(params, cfg, batch=2))

    def render_chunk(params, base_ws, keys):
        def body(carry, k):
            ws = base_ws + 0.1 * jax.random.normal(k, base_ws.shape, jnp.float32)
            img = sg3.synthesis(params, ws, cfg, int8_plan=int8_plan)
            img8 = jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
            return carry + jnp.sum(img8.astype(jnp.uint32)), ()

        checksum, _ = jax.lax.scan(body, jnp.uint32(0), keys)
        return checksum

    render = jax.jit(render_chunk)
    base_ws = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.num_ws, cfg.w_dim), jnp.float32)

    float(render(params, base_ws, jax.random.split(jax.random.PRNGKey(2), n_chunks)))  # compile+sync
    times = []
    for trial in range(3):
        keys = jax.random.split(jax.random.PRNGKey(4 + trial), n_chunks)
        t0 = time.perf_counter()
        float(render(params, base_ws, keys))
        times.append(time.perf_counter() - t0)

    fps = batch * n_chunks / min(times)
    from maua_tpu.profiling import mfu, sg3_frame_flops

    frame_flops = sg3_frame_flops(cfg)
    print(json.dumps({
        "metric": "stylegan3_1024_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "model_tflops_per_s": round(frame_flops * fps / 1e12, 1),
        "mfu": round(mfu(frame_flops * fps, 1.0), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
