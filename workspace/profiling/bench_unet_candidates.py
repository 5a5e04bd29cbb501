"""VERDICT r5 #7 probes: (a) stride-2 downsample conv as s2d (lossless
for stride 2), (b) GroupNorm statistics in bf16, (c) nearest-upsample
fold. Scan-amortized per-op timings at the SD1 512^2 shapes (B=2 CFG)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from maua_tpu.utility import enable_compilation_cache
enable_compilation_cache()
from maua_tpu.diffusion.models import unet as um

N = 60

def timeit(fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            return fn(*((c,) + a[1:])), ()
        out, _ = jax.lax.scan(body, a[0], None, length=N)
        return jnp.sum(out.astype(jnp.float32))
    float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / N * 1e3

key = jax.random.PRNGKey(0)
# (a) stride-2 down conv at the three down levels
for hw, c in ((64, 320), (32, 640), (16, 1280)):
    x = jax.random.normal(key, (2, hw, hw, c), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
    def direct(x, w):
        y = jax.lax.conv_general_dilated(x, w, (2, 2), ((1, 1), (1, 1)),
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.image.resize(y, x.shape, "nearest")  # keep scan shape
    def s2d(x, w):
        b, h, wd, ci = x.shape
        # stride-2 3x3 conv == dense 2x2-cell conv on the s2d grid:
        # pad to 4x4 cells (3x3 taps straddle 2 cells)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cells = xp.reshape(b, (h + 2) // 2, 2, (wd + 2) // 2, 2, ci).transpose(0, 1, 3, 2, 4, 5)
        cells = cells.reshape(b, (h + 2) // 2, (wd + 2) // 2, 4 * ci)
        wc = jnp.zeros((2, 2, 4 * ci, w.shape[-1]), w.dtype)
        for dy in range(3):
            for dx in range(3):
                cy, iy = (dy + 1) // 2, (dy + 1) % 2
                cx, ix = (dx + 1) // 2, (dx + 1) % 2
                wc = wc.at[cy, cx, (iy * 2 + ix) * ci : (iy * 2 + ix + 1) * ci, :].add(w[dy, dx])
        y = jax.lax.conv_general_dilated(cells, wc, (1, 1), "VALID",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.image.resize(y, x.shape, "nearest")
    print(f"down {hw}^2 c{c}: direct {timeit(direct, x, w):.3f} ms | s2d {timeit(s2d, x, w):.3f} ms", flush=True)

# (b) GroupNorm f32 vs bf16 stats at the busiest shape
p = {"scale": jnp.ones((320,)), "bias": jnp.zeros((320,))}
x = jax.random.normal(key, (2, 64, 64, 320), jnp.bfloat16)
def gn_f32(x, p):
    return um.group_norm(p, x)
def gn_bf16(x, p):
    xg = x.reshape(x.shape[:-1] + (32, 10))
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    out = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
    return (out * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype))
print(f"GN+silu 64^2 c320: f32-stats {timeit(lambda v: jax.nn.silu(gn_f32(v, p)), x):.3f} ms | "
      f"bf16-stats {timeit(lambda v: jax.nn.silu(gn_bf16(v, p)), x):.3f} ms", flush=True)
