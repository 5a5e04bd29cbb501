"""Microbench: can a Pallas VPU kernel do 6-tap FIR via sublane-offset
slices at near-peak rate? Layout (H, W, 128): W on sublanes, lanes=128.

Compares against the XLA depthwise-conv formulation of the same FIR.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = [0.11, 0.23, 0.31, 0.19, 0.09, 0.07]
H, W, C = 2048, 512, 128
R = 8


def timeit(fn, x, n=8, n_rep=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return c, jnp.sum(fn(c).astype(jnp.float32))
        _, outs = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(outs)
    float(run(x))
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n * 1e3


def fir_w_kernel(x_ref, o_ref, acc_ref):
    # x block (R, W + 8, 128); out (R, W, 128): 6-tap FIR along axis 1
    acc_ref[...] = x_ref[:, 0:W, :].astype(jnp.float32) * TAPS[0]
    for i, t in enumerate(TAPS[1:], start=1):
        acc_ref[...] += x_ref[:, i : i + W, :].astype(jnp.float32) * t
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_fir_w(x):
    # x (H, W+8, 128)
    return pl.pallas_call(
        fir_w_kernel,
        grid=(H // R,),
        in_specs=[pl.BlockSpec((R, W + 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, W, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((R, W, 128), jnp.float32)],
    )(x)


def fir_h_kernel(xa_ref, xb_ref, o_ref, acc_ref):
    # H-axis FIR: rows from prev band tail + this band (halo 8)
    x = jnp.concatenate([xa_ref[R - 8 :], xb_ref[...]], axis=0)  # (R+8, W, 128)
    acc_ref[...] = x[0:R].astype(jnp.float32) * TAPS[0]
    for i, t in enumerate(TAPS[1:], start=1):
        acc_ref[...] += x[i : i + R].astype(jnp.float32) * t
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_fir_h(x):
    # x (H + R, W, 128) padded by R rows in front
    spec = lambda off: pl.BlockSpec((R, W, 128), lambda i, off=off: (i + off, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        fir_h_kernel,
        grid=(H // R,),
        in_specs=[spec(0), spec(1)],
        out_specs=pl.BlockSpec((R, W, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((R, W, 128), jnp.float32)],
    )(x, x)


def xla_fir_w(x):
    # depthwise conv along W, 6 taps
    f = jnp.asarray(TAPS, jnp.bfloat16)[None, :, None, None] * jnp.ones((1, 1, 1, 128), jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x[None], f, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=128)[0]


def main():
    key = jax.random.PRNGKey(0)
    xw = jax.random.normal(key, (H, W + 8, 128), jnp.bfloat16)
    xh = jax.random.normal(key, (H + R, W, 128), jnp.bfloat16)

    gb = (H * W * 128 * 2 * 2) / 1e9  # read + write, bf16
    flops = H * W * 128 * 6 * 2 / 1e9

    t = timeit(pallas_fir_w, xw)
    print("pallas W-FIR : %7.3f ms  -> %6.1f GB/s eff, %6.1f GFLOP/s" % (t, gb / t * 1e3, flops / t * 1e3))
    t = timeit(pallas_fir_h, xh)
    print("pallas H-FIR : %7.3f ms  -> %6.1f GB/s eff, %6.1f GFLOP/s" % (t, gb / t * 1e3, flops / t * 1e3))
    t = timeit(xla_fir_w, xw)
    print("xla dw W-FIR : %7.3f ms  -> %6.1f GB/s eff, %6.1f GFLOP/s" % (t, gb / t * 1e3, flops / t * 1e3))

    # parity
    y = pallas_fir_w(xw)
    ref = xla_fir_w(xw)[:, :W, :]
    print("W maxdiff:", float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
