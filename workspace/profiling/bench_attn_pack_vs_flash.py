"""Probe: masked head-packing (XLA) vs the production Pallas flash
kernel at the SD UNet self-attention shape (B=2, H=8, N=4096, D=40).

The head-pack probe showed packed QK^T at 120 lanes is 1.54x the plain
per-head XLA path; this decides whether it also beats the flash
kernel's VMEM single-shot path (whose dots pay the same 40->128 lane
padding)."""

import time

import jax
import jax.numpy as jnp

from maua_tpu.kernels.attention import attention_xla, flash_attention, attention_packed


def timed(fn, *args, iters=8, reps=3):
    def loop(*a):
        def body(c, _):
            return c + jnp.sum(fn(*a).astype(jnp.float32)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out
    jitted = jax.jit(loop)
    float(jitted(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    B, H, N, D = 2, 8, 4096, 40
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.bfloat16)

    for name, fn in [
        ("xla per-head", attention_xla),
        ("pallas flash", flash_attention),
        ("xla masked-pack", attention_packed),
    ]:
        t = timed(fn, q, k, v)
        print(f"{name:16s}: {t*1e3:7.2f} ms")
    # parity
    import numpy as np
    a = np.asarray(attention_xla(q, k, v).astype(jnp.float32))
    b = np.asarray(attention_packed(q, k, v).astype(jnp.float32))
    print("max err packed vs xla:", np.abs(a - b).max())


if __name__ == "__main__":
    main()
