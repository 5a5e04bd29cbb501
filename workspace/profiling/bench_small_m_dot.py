"""Does the v5e MXU run small-M dots at full rate? (M = output channels
in a transposed conv formulation: Y(co, spatial) = W(co, 9ci) @ P.)"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp

N_ITERS = 30


def timeit(fn, *args, n_rep=3):
    @jax.jit
    def run(*a):
        def body(c, _):
            y = fn(*a)
            return c + jnp.sum(y[:1, :1].astype(jnp.float32)), ()
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_ITERS)
        return s

    float(run(*args))
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / N_ITERS


def main():
    key = jax.random.PRNGKey(0)
    # (M, K, N) cases: transposed-conv shapes vs square reference
    cases = [
        (32, 576, 131072),    # RRDB conv1: co=32, 9*64, spatial 256^2*2... per-dot slice
        (32, 1728, 131072),   # RRDB conv3: 9*192
        (64, 1728, 131072),   # RRDB conv5
        (51, 768, 131072),    # SG3 layer-10 tail: co=51, 9*81 padded
        (128, 1152, 131072),  # M=128 comparison
        (1024, 1024, 131072), # square-ish reference
    ]
    for m, k, n in cases:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        f = lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        dt = timeit(f, a, b)
        fl = 2 * m * k * n
        print(f"M={m:5d} K={k:5d} N={n}: {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s ({fl/dt/197e12*100:4.1f}% peak)")


if __name__ == "__main__":
    main()
