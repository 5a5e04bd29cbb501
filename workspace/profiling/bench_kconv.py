"""K-packed Pallas conv vs XLA direct at SG3-tail and RRDB shapes (batch 8, bf16)."""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.kernels.kconv import kconv3x3

N = 12


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


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    base = timeit(lambda x: x * 1.000001, jnp.ones((8, 8), jnp.bfloat16))
    print("identity overhead: %.3f ms" % base)
    key = jax.random.PRNGKey(0)
    cases = [
        ("sg3 L10", 8, 1044, 81, 51),
        ("sg3 L11", 8, 1044, 51, 32),
        ("sg3 L12", 8, 1044, 32, 32),
        ("rrdb c1", 8, 256, 64, 32),
        ("rrdb c3", 8, 256, 128, 32),
        ("rrdb c4", 8, 256, 160, 32),
        ("rrdb c5", 8, 256, 192, 64),
        ("rrdb up", 8, 512, 64, 64),
    ]
    for name, b, s, ci, co in cases:
        x = jax.random.normal(key, (b, s, s, ci), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ci, co), jnp.float32) * 0.05
        t_xla = timeit(lambda xx: xla_conv(xx, w), x) - base
        row = f"{name} {s}^2 {ci:3d}->{co:3d}: xla {t_xla:7.2f}"
        for R in (4, 8):
            try:
                t = timeit(lambda xx, R=R: kconv3x3(xx, w.astype(xx.dtype), band_r=R), x) - base
                row += f" | kconv@{R} {t:7.2f}"
            except Exception as e:
                row += f" | kconv@{R} FAIL({type(e).__name__})"
        # parity spot check on chip
        try:
            y0 = xla_conv(x[:1], w)
            y1 = kconv3x3(x[:1], w.astype(x.dtype))
            err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
            row += f" | maxdiff {err:.2e}"
        except Exception as e:
            row += f" | parity FAIL: {e}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
