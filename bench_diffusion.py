#!/usr/bin/env python
"""Secondary benchmark: 512^2 Stable-Diffusion-class CFG denoiser
steps/sec on the real TPU chip (the second BASELINE.md metric; the
driver's headline bench is bench.py).

One "step" = one classifier-free-guidance denoiser evaluation on the
64x64x4 latent of a 512^2 image: a 2x-batched SD-1.x UNet forward
(cond + uncond) through the k-diffusion sigma-space wrapper, exactly
what every sampler iteration in `maua_tpu/diffusion/samplers.py`
executes (reference loop: `maua/diffusion/processors/stable.py:240-279`).

Prints ONE JSON line like bench.py.
"""

import json
import os
import time


def main():
    import jax

    from maua_tpu.utility import enable_compilation_cache

    enable_compilation_cache()  # opt-in via MAUA_COMPILE_CACHE
    import jax.numpy as jnp
    import numpy as np

    from maua_tpu.diffusion.models import unet as unet_mod
    from maua_tpu.diffusion.samplers import make_ddpm_schedule
    from maua_tpu.diffusion.wrappers import EpsDenoiser, cfg_denoiser

    n_images = int(os.environ.get("MAUA_BENCH_DIFF_BATCH", "1"))
    n_steps = 12

    cfg = unet_mod.UNetConfig(dtype="bfloat16")  # SD-1.x sized
    params = unet_mod.init_params(jax.random.PRNGKey(0), cfg)

    alphas_cumprod = np.asarray(make_ddpm_schedule())

    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 768), jnp.float32)
    uncond = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (n_images, 64, 64, 4), jnp.float32) * 14.6

    @jax.jit
    def run(p, x):
        # params enter as a jit argument (device-resident), never as
        # baked-in constants
        def eps_model(xx, t, context=None):
            return unet_mod.forward(p, xx.astype(cfg.compute_dtype), t, cfg,
                                    context=context.astype(cfg.compute_dtype)).astype(jnp.float32)

        model = cfg_denoiser(EpsDenoiser(eps_model, alphas_cumprod), cond, uncond, cond_scale=7.5)

        def body(carry, sigma):
            d = model(carry, jnp.full((carry.shape[0],), sigma))
            return d, ()

        sigmas = jnp.linspace(14.6, 0.1, n_steps)
        out, _ = jax.lax.scan(body, x, sigmas)
        return jnp.sum(out)

    params = jax.device_put(params)
    float(run(params, x))  # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        times.append(time.perf_counter() - t0)

    sps = n_steps * n_images / min(times)
    from maua_tpu.profiling import mfu, unet_step_flops

    step_flops = 2 * unet_step_flops(cfg, 64)  # CFG = cond + uncond UNet evals
    print(json.dumps({
        "metric": "sd512_cfg_denoiser_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps, 3),
        "model_tflops_per_s": round(step_flops * sps / 1e12, 1),
        "mfu": round(mfu(step_flops * sps, 1.0), 3),
    }))


if __name__ == "__main__":
    main()
