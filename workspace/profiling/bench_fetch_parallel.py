"""Probe: do concurrent device->host fetches through the axon relay
overlap (threads fetching different arrays), or serialize?

If N parallel streams scale, the delivery path should shard each frame
batch into N slices fetched by a small thread pool."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    key = jax.random.PRNGKey(0)
    make = jax.jit(lambda k, n: (jax.random.uniform(k, (n,)) * 255).astype(jnp.uint8),
                   static_argnums=1)
    total_mb = float(__import__("os").environ.get("TOTAL_MB", "42"))  # real e2e chunk size
    for nstreams in (8, 12, 16, 24, 32):
        n = int(total_mb * 1e6 / nstreams)
        best = float("inf")
        for rep in range(3):
            # fresh arrays per rep: jax caches the host copy on the
            # Array object, so refetching the same array is free
            arrs = [make(jax.random.fold_in(key, 1000 * nstreams + 100 * rep + i), n)
                    for i in range(nstreams)]
            for a in arrs:
                float(jnp.sum(a[:16].astype(jnp.uint32)))  # ensure materialized
            outs = [None] * nstreams
            def fetch(i):
                outs[i] = np.asarray(arrs[i])
            threads = [threading.Thread(target=fetch, args=(i,)) for i in range(nstreams)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            best = min(best, time.perf_counter() - t0)
        print(f"{nstreams} streams x {n/1e6:.2f} MB: {best*1e3:8.2f} ms  {total_mb/best:7.2f} MB/s")


if __name__ == "__main__":
    main()
