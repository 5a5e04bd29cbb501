"""Probe: where does the on-device frame-codec encode spend its time?

Times cumulative pipeline prefixes (synth | +yuv | +dct | +quant |
+pack) on the real chip, each inside the same jit with a scalar-sum
output fetched for sync, min over reps. Run on an otherwise idle host.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.gan import fast_synthesis as fs
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.ops import framecodec as fc


def timed(fn, *args, reps=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B = 16
    cfg = sg2.SG2Config(img_resolution=1024, dtype="bfloat16")
    params = sg2.init_params(jax.random.PRNGKey(0), cfg)
    plan = fs.build_fast_plan(params, cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.num_ws, cfg.w_dim))
    rgb_host = np.random.RandomState(0).randint(0, 255, (B, 1024, 1024, 3), np.uint8)
    codec = fc.calibrate_chunk(rgb_host[:4])
    ci, cd = codec.intra, codec.delta

    def synth(ws):
        img = fs.synthesis_fast(params, plan, ws, cfg, noise_mode="const")
        return jnp.sum(jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8).astype(jnp.uint32))

    def rgb(ws):
        img = fs.synthesis_fast(params, plan, ws, cfg, noise_mode="const")
        return jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8)

    def plus_yuv(ws):
        y, u, v = fc._yuv_planes_device(rgb(ws))
        return jnp.sum(y) + jnp.sum(u) + jnp.sum(v)

    def plus_dct(ws):
        y, u, v = fc._yuv_planes_device(rgb(ws))
        return sum(jnp.sum(fc._block_dct_device(p)) for p in (y, u, v))

    def plus_quant(ws):
        y, u, v = fc._yuv_planes_device(rgb(ws))
        tot = jnp.float32(0)
        for p, lev, q in ((y, ci.levels_y, ci.qstep_y), (u, ci.levels_c, ci.qstep_c), (v, ci.levels_c, ci.qstep_c)):
            m = jnp.asarray((np.asarray(lev, np.int64) - 1) // 2, jnp.float32)
            C = jnp.clip(jnp.round(fc._block_dct_device(p) / q), -m, m).astype(jnp.int32)
            tot = tot + jnp.sum(C)
        return tot

    def full(ws):
        intra, deltas = fc.encode_chunk(rgb(ws), codec)
        return jnp.sum(intra.astype(jnp.uint32)) + jnp.sum(deltas[::64].astype(jnp.uint32))

    for name, fn in [("synth", synth), ("+yuv", plus_yuv), ("+dct", plus_dct),
                     ("+quant", plus_quant), ("+pack(full encode)", full)]:
        t = timed(fn, ws)
        print(f"{name:22s}: {t*1e3:8.1f} ms for {B} frames  ({t/B*1e3:6.1f} ms/frame)")


if __name__ == "__main__":
    main()
