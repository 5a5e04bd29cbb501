"""Serving throughput: warm StyleGAN2 service under closed-loop clients.

Measures requests/s through `maua_tpu.serve.GANImageService` (submit ->
uint8 frame; PNG encode excluded — it is host-CPU work independent of
the device path) at concurrency 1 vs 16, plus the batch occupancy the
micro-batcher achieved. The concurrency-16 run shows the MicroBatcher
coalescing effect: one static-shape device call serves up to
`max_batch` requests.

Env overrides: MAUA_BENCH_RES (default 256), MAUA_SERVE_BATCH (8),
MAUA_SERVE_REQUESTS (64).

Note (axon relay): device->host transfer (~15 MB/s) bounds per-request
fetch; on a real TPU-VM host PCIe moves frames at GB/s and the device
step dominates instead. Compare occupancy, not absolute rps, across
environments.
"""

import os
import threading
import time


def main():
    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan.wrappers import StyleGAN2
    from maua_tpu.serve import GANImageService

    res = int(os.environ.get("MAUA_BENCH_RES", "256"))
    max_batch = int(os.environ.get("MAUA_SERVE_BATCH", "8"))
    n_requests = int(os.environ.get("MAUA_SERVE_REQUESTS", "64"))

    gen = StyleGAN2(cfg=sg2.SG2Config(img_resolution=res, dtype="bfloat16"))
    svc = GANImageService(generator=gen, max_batch=max_batch, max_wait_ms=10.0)
    svc.submit({"seed": 0}).result(timeout=600)  # warm compile

    def closed_loop(concurrency: int) -> float:
        ids = iter(range(n_requests))
        lock = threading.Lock()

        def client():
            while True:
                with lock:
                    i = next(ids, None)
                if i is None:
                    return
                svc.submit({"seed": i}).result(timeout=600)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(concurrency)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return n_requests / (time.perf_counter() - t0)

    def run_metrics(concurrency: int):
        # per-run occupancy: ServiceMetrics accumulates for the life
        # of the service, so diff the counters around the run
        before = svc.metrics.snapshot()
        rps = closed_loop(concurrency)
        after = svc.metrics.snapshot()
        batches = after["batches"] - before["batches"]
        served = after["served"] - before["served"]
        occ = served / max(batches, 1)
        return rps, occ, after

    rps1, occ1, _ = run_metrics(1)
    rps16, occ16, snap = run_metrics(16)
    svc.close()
    print(
        f"GAN serving {res}x{res} (max_batch {max_batch}): "
        f"{rps1:.2f} rps @ concurrency 1, {rps16:.2f} rps @ 16 "
        f"({rps16 / max(rps1, 1e-9):.2f}x); mean occupancy {occ1:.2f} -> {occ16:.2f}, "
        f"max {snap['max_occupancy']}"
    )


if __name__ == "__main__":
    main()
