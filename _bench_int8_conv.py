"""Probe: how much faster does the v5e MXU run int8 convs than bf16?

Times the SG2 fast-tail conv shape (space-to-depth cell grids,
C=128 lanes full) in bf16 vs int8(+int32 accum) inside one jitted
lax.scan, one scalar fetch (single-call timing is swamped by the
~26 ms relay dispatch round-trip — see PERFORMANCE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def timed(fn, *args, iters=30, reps=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warm + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def scan_conv(x, w, iters, acc_dtype=None):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN,
            preferred_element_type=acc_dtype,
        )
        if acc_dtype is not None:
            y = (y >> 7).astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.integer) else y.astype(x.dtype)
        return y, ()

    y, _ = jax.lax.scan(body, x, None, length=iters)
    return y


def main():
    iters = 30
    for (b, h, wd, ci, co) in [(8, 512, 512, 128, 128), (8, 256, 256, 128, 128), (4, 512, 512, 128, 512)]:
        k = jax.random.PRNGKey(0)
        xf = jax.random.normal(k, (b, h, wd, ci), jnp.bfloat16)
        wf = jax.random.normal(k, (3, 3, ci, co), jnp.bfloat16) * 0.05
        xi = jnp.clip((xf.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
        wi = jnp.clip((wf.astype(jnp.float32) * 512), -127, 127).astype(jnp.int8)

        t_bf = timed(lambda x: scan_conv(x, wf, iters), xf, iters=iters)
        flops = 2 * b * h * wd * ci * co * 9
        print(f"shape {b}x{h}x{wd}x{ci}->{co}: bf16 {t_bf*1e3:7.2f} ms  {flops/t_bf/1e12:6.1f} TFLOP/s")
        try:
            t_i8 = timed(lambda x: scan_conv(x, wi, iters, acc_dtype=jnp.int32), xi, iters=iters)
            print(f"  int8 {t_i8*1e3:7.2f} ms  {flops/t_i8/1e12:6.1f} TOP/s  speedup {t_bf/t_i8:.2f}x")
        except Exception as e:
            print(f"  int8 FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
