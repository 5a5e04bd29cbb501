#!/usr/bin/env python
"""RealESRGAN-class 4x super-resolution throughput (BASELINE config #4).

Times RRDBNet x4 on a batch of 256^2 frames -> 1024^2 on one chip
(reference: `maua/super/image/single.py:44` upscale over the
realesrgan RRDBNet). Weights are random-init (zero egress) — identical
FLOPs/shapes to the pretrained checkpoints.

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

    from maua_tpu.super.models.rrdbnet import RRDBConfig, init_params, forward

    batch = int(os.environ.get("MAUA_BENCH_SR_BATCH", "8"))
    size = int(os.environ.get("MAUA_BENCH_SR_SIZE", "256"))
    n_batches = 4

    dtype = os.environ.get("MAUA_BENCH_SR_DTYPE", "bfloat16")
    cfg = RRDBConfig(dtype=dtype)  # x4, 23 blocks — RealESRGAN-x4plus sized
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32)

    @jax.jit
    def run(p, x):
        def body(c, _):
            y = forward(p, c, cfg)
            # derive the next input from the output so the scan isn't DCE'd
            nxt = jax.image.resize(y, c.shape, "bilinear")
            return 0.5 * c + 0.5 * nxt, jnp.sum(y)
        _, sums = jax.lax.scan(body, x, None, length=n_batches)
        return jnp.sum(sums)

    float(run(params, x))  # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        times.append(time.perf_counter() - t0)

    ips = batch * n_batches / min(times)
    from maua_tpu.profiling import mfu, rrdb_flops

    img_flops = rrdb_flops(cfg, size, size)
    print(json.dumps({
        "metric": "realesrgan_x4_256to1024_images_per_sec",
        "value": round(ips, 3),
        "unit": "img/s",
        "vs_baseline": round(ips, 3),
        "model_tflops_per_s": round(img_flops * ips / 1e12, 1),
        "mfu": round(mfu(img_flops * ips, 1.0), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
