"""GAN training throughput: StyleGAN2 D+G steps/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null — the reference (PyTorch-Lightning DDP loop,
`maua/GAN/training/trainer.py`) publishes no numbers.

Measures the full alternating train step (`maua_tpu/gan/training.py
train_step`: D update, G update, lazy R1 + path-length regularizers,
EMA) at 256^2 with a device-resident synthetic batch, iterated inside
one jitted `lax.scan` so the ~26 ms relay dispatch is amortized; sync
via scalar fetch (block_until_ready is unreliable on the axon relay).
"""

import json
import os
import time


def main():
    import jax

    from maua_tpu.utility import enable_compilation_cache

    enable_compilation_cache()  # opt-in via MAUA_COMPILE_CACHE
    import jax.numpy as jnp

    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan import training as tr
    from maua_tpu.gan.discriminator import D2Config

    res = int(os.environ.get("MAUA_BENCH_TRAIN_RES", "256"))
    batch = int(os.environ.get("MAUA_BENCH_TRAIN_BATCH", "16"))
    n_steps = int(os.environ.get("MAUA_BENCH_TRAIN_STEPS", "20"))
    # width knobs so the bench is also validatable on the 1-CPU host
    # (full-width compiles take >10 min there)
    cbase = int(os.environ.get("MAUA_BENCH_TRAIN_CHANNEL_BASE", "32768"))
    cmax = int(os.environ.get("MAUA_BENCH_TRAIN_CHANNEL_MAX", "512"))

    g_cfg = sg2.SG2Config(img_resolution=res, num_fp16_res=0, channel_base=cbase, channel_max=cmax)
    d_cfg = D2Config(img_resolution=res, channel_base=cbase, channel_max=cmax)
    t_cfg = tr.TrainConfig()

    key = jax.random.PRNGKey(0)
    state = tr.init_train_state(key, g_cfg, d_cfg, t_cfg)
    real = jax.random.normal(jax.random.PRNGKey(1), (batch, res, res, 3), jnp.float32)

    def run(state, keys):
        def body(s, k):
            s, _metrics = tr.train_step(s, real, k, g_cfg, d_cfg, t_cfg)
            return s, None

        state, _ = jax.lax.scan(body, state, keys)
        return state

    run = jax.jit(run)

    def once():
        # fixed scan length: warmup reuses the timed program (a second
        # scan length would mean a second multi-minute XLA compile)
        keys = jax.random.split(jax.random.PRNGKey(2), n_steps)
        out = run(state, keys)
        return int(out["step"])  # scalar fetch = sync

    once()  # compile + warm
    t0 = time.time()
    final_step = once()
    dt = time.time() - t0
    assert final_step == n_steps, final_step

    steps_per_s = n_steps / dt
    print(f"# {res}^2 batch {batch}: {steps_per_s:.2f} steps/s "
          f"({steps_per_s * batch:.1f} img/s through D+G+regs+EMA)")
    from maua_tpu.profiling import gan_train_step_flops, mfu

    step_flops = gan_train_step_flops(g_cfg, d_cfg, batch)
    print(json.dumps({
        "metric": f"sg2_{res}_train_steps_per_s",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "images_per_s": round(steps_per_s * batch, 1),
        "model_tflops_per_s": round(step_flops * steps_per_s / 1e12, 1),
        # f32 params, but XLA's default matmul precision executes the
        # matmuls on the bf16 MXU path -> peak is the bf16 rate
        "mfu": round(mfu(step_flops * steps_per_s, 1.0, dtype="bfloat16"), 3),
    }))


if __name__ == "__main__":
    main()
