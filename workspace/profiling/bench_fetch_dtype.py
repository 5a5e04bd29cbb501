"""Does the relay client's CPU cost scale with element COUNT or bytes?
Fetch the same 33 MB as uint8 / uint32 / float32, and sweep stream
counts at the real chunk size."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from maua_tpu.ops.video import fetch_parallel

N = 33_554_432  # 32 MiB
base = jnp.arange(N, dtype=jnp.uint32)  # 128 MiB source
u8 = jax.jit(lambda x: (x & 0xFF).astype(jnp.uint8))(base)
u32 = jax.jit(lambda x: x[: N // 4])(base)
f32 = jax.jit(lambda x: x[: N // 4].astype(jnp.float32))(base)
float(jnp.sum(u8[::1000].astype(jnp.uint32)))  # sync

for name, arr in (("u8", u8), ("u32", u32), ("f32", f32)):
    for streams in ((4, 8, 12) if name == "u8" else (8,)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fetch_parallel(arr, streams)
            ts.append(time.perf_counter() - t0)
        mb = arr.nbytes / 1e6
        print(f"{name} x{streams}: {mb:.0f} MB in {min(ts):.2f}s = {mb/min(ts):.1f} MB/s  (trials {[round(t,2) for t in ts]})", flush=True)
