"""Where do RRDBNet's 56 ms/img go? Scan-amortized stage timing."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from maua_tpu.utility import enable_compilation_cache
enable_compilation_cache()
from maua_tpu.super.models import rrdbnet as rr

cfg = rr.RRDBConfig(dtype="bfloat16")
params = jax.device_put(rr.init_params(jax.random.PRNGKey(0), cfg))
B = 8
N = 30

def timeit(fn, x, n_rep=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(out.astype(jnp.float32))
    float(run(x))
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / N * 1e3

x256 = jax.random.normal(jax.random.PRNGKey(1), (B, 256, 256, 64), jnp.bfloat16)
x512 = jax.random.normal(jax.random.PRNGKey(2), (B, 512, 512, 64), jnp.bfloat16)
x1024 = jax.random.normal(jax.random.PRNGKey(3), (B, 1024, 1024, 64), jnp.bfloat16)

blk = params["body"][0]
t_rdb = timeit(lambda v: rr._rdb(blk["rdb1"], v), x256)
t_rdb_paired = timeit(lambda v: rr._rdb_paired(blk["rdb1"], v), x256)
print(f"one RDB 256^2 b{B}: grouped {t_rdb:.2f} ms, paired {t_rdb_paired:.2f} ms -> body(69) {69*t_rdb:.0f} ms", flush=True)

cv = lambda p, v: rr.conv(p, v)
t_up1 = timeit(lambda v: cv(params["conv_up1"], rr._up2(x256[..., :64])) if False else cv(params["conv_up1"], v), x512)
t_hr = timeit(lambda v: cv(params["conv_hr"], v), x1024)
up2fn = lambda v: cv(params["conv_up2"], rr._up2(v))
t_upsample2 = timeit(lambda v: up2fn(v)[..., :64][:, ::2, ::2], x512)  # up+conv then fold back for scan shape
print(f"conv 512^2 64->64: {t_up1:.2f} ms | conv 1024^2 64->64: {t_hr:.2f} ms | up2+conv 512->1024: {t_upsample2:.2f} ms", flush=True)
