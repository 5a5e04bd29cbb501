"""Scan-amortized per-layer timing of SG3 1024^2 synthesis (batch 8, bf16)."""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.gan import ops
from maua_tpu.gan import stylegan3 as sg3

N = 20
B = 8


def timeit(fn, x, n_rep=3):
    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            # renormalize back to input shape via slicing/broadcast not
            # possible generally; instead return y and re-seed carry
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
    params = sg3.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    cutoffs, stopbands, srates, half_widths, sizes, channels = cfg.layer_plan()

    print("identity overhead: %.3f ms" % timeit(lambda x: x * 1.000001, jnp.ones((8, 8), jnp.bfloat16)))

    styles_key = jax.random.PRNGKey(1)
    total = 0.0
    for i, layer in enumerate(jax.device_get(params["layers"])):
        is_torgb = i == cfg.num_layers - 1
        in_size = int(sizes[i])
        ci = int(channels[i])
        x = jax.random.normal(jax.random.PRNGKey(i), (B, in_size, in_size, ci),
                              jnp.float32 if is_torgb else jnp.bfloat16)
        layer = jax.device_put(layer)
        styles = jax.random.normal(styles_key, (B, ci), jnp.float32)

        w = layer["weight"] * (1.0 / math.sqrt(np.prod(layer["weight"].shape[:3])))

        def conv_fn(xx, w=w, styles=styles, is_torgb=is_torgb):
            return ops.modulated_conv2d(xx, w.astype(xx.dtype), styles,
                                        padding=w.shape[0] // 2, demodulate=not is_torgb)

        conv_ms = timeit(conv_fn, x)

        lrelu_ms = 0.0
        up = down = 1
        if not is_torgb:
            in_rate, out_rate = float(srates[i]), float(srates[i + 1])
            tmp_rate = max(in_rate, out_rate) * 2
            up = int(np.rint(tmp_rate / in_rate))
            down = int(np.rint(tmp_rate / out_rate))
            up_f = sg3._lowpass(cfg.filter_size * up if up > 1 else 1, float(cutoffs[i]), float(half_widths[i]), tmp_rate)
            down_f = sg3._lowpass(cfg.filter_size * down if down > 1 else 1, float(cutoffs[i + 1]), float(half_widths[i + 1]), tmp_rate)
            co = int(channels[i + 1])
            xo = jax.random.normal(jax.random.PRNGKey(100 + i), (B, in_size, in_size, co), jnp.bfloat16)
            lrelu_ms = timeit(lambda xx: sg3._filtered_lrelu(xx, up_f, down_f, up, down), xo)

        total += conv_ms + lrelu_ms
        print("layer %2d size %4d c%4d->%4d up%d down%d: conv %7.3f ms  flrelu %7.3f ms"
              % (i, in_size, ci, int(channels[i + 1]), up, down, conv_ms, lrelu_ms))
    print("sum: %.1f ms for batch %d -> %.1f fps" % (total, B, B / total * 1e3))


if __name__ == "__main__":
    main()
