"""Per-layer SG3 tail conv: direct vs s2d cell-grid, plus torgb variants."""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.gan import ops
from maua_tpu.gan import stylegan3 as sg3

N = 12
B = 8


def timeit(fn, x, n_rep=3):
    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            return c * 0.999 + 0.001 * jnp.mean(y.astype(jnp.float32)).astype(c.dtype), jnp.sum(y.astype(jnp.float32))
        _, outs = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(outs)

    float(run(x))
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / N * 1e3


def main():
    cfg = sg3.SG3Config(img_resolution=1024, dtype="bfloat16")
    _, _, _, _, sizes, channels = cfg.layer_plan()
    base = timeit(lambda x: x * 1.000001, jnp.ones((8, 8), jnp.bfloat16))
    print("identity overhead: %.3f ms" % base)

    key = jax.random.PRNGKey(0)
    for i in [10, 11, 12]:
        in_size, ci, co = int(sizes[i]), int(channels[i]), int(channels[i + 1])
        x = jax.random.normal(key, (B, in_size, in_size, ci), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ci, co)) / math.sqrt(9 * ci)
        styles = jax.random.normal(key, (B, ci), jnp.float32)
        t_dir = timeit(lambda xx: ops.modulated_conv2d(xx, w.astype(xx.dtype), styles, padding=1), x) - base
        t_s2d = timeit(lambda xx: ops.modulated_conv2d(xx, w.astype(xx.dtype), styles, padding=1, s2d=True), x) - base
        # parity
        y0 = ops.modulated_conv2d(x[:1], w.astype(x.dtype), styles[:1], padding=1)
        y1 = ops.modulated_conv2d(x[:1], w.astype(x.dtype), styles[:1], padding=1, s2d=True)
        err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
        print(f"conv layer {i}: {in_size}^2 {ci}->{co}: direct {t_dir:7.2f} ms | s2d {t_s2d:7.2f} ms | maxdiff {err:.2e}")

    # torgb: 1x1 modulated conv 32->3 at 1024^2
    ci, co = 32, 3
    w = jax.random.normal(key, (1, 1, ci, co)) / math.sqrt(ci)
    styles = jax.random.normal(key, (B, ci), jnp.float32)
    for dt, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        x = jax.random.normal(key, (B, 1024, 1024, ci), dt)
        t = timeit(lambda xx: ops.modulated_conv2d(xx, w.astype(xx.dtype), styles, padding=0, demodulate=False), x) - base
        print(f"torgb modconv {name}: {t:7.2f} ms")
        # einsum variant (single contraction, no conv op)
        def eins(xx):
            xs = xx * styles.astype(xx.dtype)[:, None, None, :]
            return jnp.einsum("bhwc,co->bhwo", xs, w[0, 0].astype(xx.dtype))
        t2 = timeit(eins, x) - base
        print(f"torgb einsum  {name}: {t2:7.2f} ms")
        # padded-out variant: co padded to 32, slice after
        wpad = jnp.zeros((1, 1, ci, 32), w.dtype).at[..., :co].set(w)
        def padded(xx):
            y = ops.modulated_conv2d(xx, wpad.astype(xx.dtype), styles, padding=0, demodulate=False)
            return y[..., :co]
        t3 = timeit(padded, x) - base
        print(f"torgb pad32   {name}: {t3:7.2f} ms")


if __name__ == "__main__":
    main()
