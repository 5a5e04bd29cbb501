"""Reordered vs original Pallas schedule vs XLA, per SG3 up4 layer + tail up2 layers."""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.gan import stylegan3 as sg3
from maua_tpu.kernels.filtered_lrelu import filtered_lrelu_pallas

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
    cutoffs, stopbands, srates, half_widths, sizes, channels = cfg.layer_plan()

    base = timeit(lambda x: x * 1.000001, jnp.ones((8, 8), jnp.bfloat16))
    print("identity overhead: %.3f ms" % base)

    layers = [int(a) for a in (_os.environ.get("LAYERS", "6,8,9").split(","))]
    rs = [int(a) for a in (_os.environ.get("RS", "0,64,96,128").split(","))]
    for i in layers:
        in_rate, out_rate = float(srates[i]), float(srates[i + 1])
        in_size = int(sizes[i])
        co = int(channels[i + 1])
        tmp_rate = max(in_rate, out_rate) * 2
        up = int(np.rint(tmp_rate / in_rate))
        down = int(np.rint(tmp_rate / out_rate))
        up_f = sg3._lowpass(cfg.filter_size * up if up > 1 else 1, float(cutoffs[i]), float(half_widths[i]), tmp_rate)
        down_f = sg3._lowpass(cfg.filter_size * down if down > 1 else 1, float(cutoffs[i + 1]), float(half_widths[i + 1]), tmp_rate)
        x = jax.random.normal(jax.random.PRNGKey(i), (B, in_size, in_size, co), jnp.bfloat16)

        xla = timeit(lambda xx: sg3._filtered_lrelu_direct(xx, up_f, down_f, up, down), x) - base
        old = timeit(lambda xx: filtered_lrelu_pallas(xx, up_f, down_f, up, down, reorder=False), x) - base
        row = f"layer {i:2d} size {in_size:4d} c{co:3d} up{up}: xla {xla:7.2f} | old {old:7.2f}"
        for br in rs:
            t = timeit(lambda xx, br=br: filtered_lrelu_pallas(xx, up_f, down_f, up, down,
                                                               reorder=True, band_r=br), x) - base
            row += f" | re@{br or 'auto'} {t:7.2f}"
        print(row)


if __name__ == "__main__":
    main()
