"""Scan-amortized stage timing of the SD-class UNet at 512^2 (CFG batch 2).

Each op is iterated N times inside one jitted lax.scan and synced with
one scalar fetch, so the ~26 ms axon dispatch round-trip amortizes away.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp

from maua_tpu.diffusion.models import unet as unet_mod

N = 40


def timeit(make_fn, x, n_rep=3):
    """make_fn(x) -> same-shaped array; scanned N times."""

    @jax.jit
    def run(x):
        def body(c, _):
            return make_fn(c), ()
        out, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(out.astype(jnp.float32))

    float(run(x))  # compile
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    return (min(times)) / N * 1e3


def main():
    cfg = unet_mod.UNetConfig(dtype="bfloat16")
    B = 2
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768), jnp.bfloat16)
    emb = jnp.ones((B, 1280), jnp.bfloat16)

    # empty-scan overhead
    print("identity: %.3f ms" % timeit(lambda x: x * 1.000001, jnp.ones((8, 8), jnp.bfloat16)))

    from maua_tpu.diffusion.models.unet import (
        _init_resblock, _init_spatial_transformer, resblock, spatial_transformer,
        _init_transformer_block, cross_attention, layer_norm, linear,
    )
    from maua_tpu.kernels.attention import attention_xla, flash_attention

    total = 0.0
    # SD1 down path spatial transformers: 2 each at (64,320),(32,640),(16,1280); mid 1 at 8? no:
    # SD1: attention_resolutions ds in (4,2,1) -> 64^2(ds1) c320 x2, 32^2 c640 x2, 16^2 c1280 x2 down;
    # mid at 8^2 c1280 x1; ups: 3 each at 16^2, 32^2, 64^2.
    counts = {(64, 320): 5, (32, 640): 5, (16, 1280): 5, (8, 1280): 1}
    for (hw, c), cnt in counts.items():
        sp = jax.device_put(_init_spatial_transformer(jax.random.PRNGKey(3), c, 768, 8, 1))
        xx = jax.random.normal(jax.random.PRNGKey(4), (B, hw, hw, c), jnp.bfloat16)
        ms = timeit(lambda x: spatial_transformer(sp, x, ctx, 8), xx)
        total += ms * cnt
        print("spatial_transformer %4d^2 c%4d: %7.3f ms  x%d" % (hw, c, ms, cnt))

    rcounts = {(64, 320): 7, (32, 640): 7, (16, 1280): 13, (8, 1280): 2}
    for (hw, c), cnt in rcounts.items():
        rp = jax.device_put(_init_resblock(jax.random.PRNGKey(5), c, c, 1280, cfg))
        xx = jax.random.normal(jax.random.PRNGKey(6), (B, hw, hw, c), jnp.bfloat16)
        ms = timeit(lambda x: resblock(rp, x, emb, cfg), xx)
        total += ms * cnt
        print("resblock            %4d^2 c%4d: %7.3f ms  x%d" % (hw, c, ms, cnt))
    print("resblock+transformer estimate: %.2f ms (measured full ~24.3)" % total)

    # transformer innards at 64^2 c320
    c, hw = 320, 64
    n = hw * hw
    tb = jax.device_put(_init_transformer_block(jax.random.PRNGKey(7), c, 768, 8, c // 8))
    xt = jax.random.normal(jax.random.PRNGKey(8), (B, n, c), jnp.bfloat16)
    print("  attn1 self  64^2: %7.3f ms" % timeit(
        lambda x: x + cross_attention(tb["attn1"], layer_norm(tb["norm1"], x), layer_norm(tb["norm1"], x), 8), xt))
    print("  attn2 cross 64^2: %7.3f ms" % timeit(
        lambda x: x + cross_attention(tb["attn2"], layer_norm(tb["norm2"], x), ctx, 8), xt))

    def ff(x):
        h = linear(tb["ff_in"], layer_norm(tb["norm3"], x))
        a, gate = jnp.split(h, 2, axis=-1)
        return x + linear(tb["ff_out"], a * jax.nn.gelu(gate))
    print("  geglu ff    64^2: %7.3f ms" % timeit(ff, xt))

    # raw attention op: flash vs xla, self at 64^2 (N=4096, H=8, D=40)
    for (nn, d, name) in [(4096, 40, "64^2 d40"), (1024, 80, "32^2 d80"), (256, 160, "16^2 d160")]:
        q = jax.random.normal(jax.random.PRNGKey(9), (B, 8, nn, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(10), (B, 8, nn, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(11), (B, 8, nn, d), jnp.bfloat16)
        print("  flash %-9s: %7.3f ms | xla: %7.3f ms" % (
            name,
            timeit(lambda x: flash_attention(x, k, v), q),
            timeit(lambda x: attention_xla(x, k, v), q)))


if __name__ == "__main__":
    main()
