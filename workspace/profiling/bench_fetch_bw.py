"""Probe: device->host fetch bandwidth through the axon relay as a
function of transfer size (the e2e frame-delivery bottleneck).

Also measures whether a dispatched render overlaps an in-flight fetch
(the double-buffering assumption in ops/video.pipelined_frames)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    key = jax.random.PRNGKey(0)
    make = jax.jit(lambda k, n: (jax.random.uniform(k, (n,)) * 255).astype(jnp.uint8),
                   static_argnums=1)
    for mb in (0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0):
        n = int(mb * 1e6)
        arrs = [make(jax.random.fold_in(key, i), n) for i in range(3)]
        float(jnp.sum(arrs[0].astype(jnp.uint32)))  # sync
        best = float("inf")
        for a in arrs:
            t0 = time.perf_counter()
            np.asarray(a)
            best = min(best, time.perf_counter() - t0)
        print(f"{mb:6.3f} MB: {best*1e3:8.2f} ms  {mb/best:7.2f} MB/s")


if __name__ == "__main__":
    main()
