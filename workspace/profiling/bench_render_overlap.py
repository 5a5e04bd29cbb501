"""Measure device->host overlap in the SG2 render generator.

Compares wall-clock of StyleGAN2.render() (double-buffered fetch: batch
N transfers while batch N+1 synthesizes) against a serialized
fetch-after-synth loop, at 1024^2 through the axon relay where the
device->host transfer is the end-to-end bottleneck.

Run from /root/repo: python workspace/profiling/bench_render_overlap.py
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan.wrappers import StyleGAN2

    res = int(os.environ.get("MAUA_BENCH_RES", "1024"))
    n_frames = int(os.environ.get("MAUA_BENCH_FRAMES", "32"))
    batch = int(os.environ.get("MAUA_BENCH_BATCH", "8"))

    gen = StyleGAN2(cfg=sg2.SG2Config(img_resolution=res, dtype="bfloat16"))
    ws = gen.get_w_latents(f"0-{max(n_frames // 8, 1) - 1}")
    lat = jnp.tile(ws, (8, 1, 1))[:n_frames]

    # warm both paths
    for _ in gen.render(lat[: 2 * batch], batch_size=batch):
        pass

    t0 = time.time()
    n = sum(1 for _ in gen.render(lat, batch_size=batch))
    overlap = time.time() - t0
    assert n == n_frames

    # serialized reference: synth -> blocking fetch per batch
    def serial():
        for lo in range(0, n_frames, batch):
            imgs = gen.synthesizer(lat[lo : lo + batch])
            imgs = jnp.clip((imgs + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
            yield from np.asarray(imgs)

    t0 = time.time()
    n = sum(1 for _ in serial())
    ser = time.time() - t0
    assert n == n_frames

    print(f"overlapped render: {n_frames / overlap:.2f} fps e2e")
    print(f"serialized render: {n_frames / ser:.2f} fps e2e")
    print(f"speedup: {ser / overlap:.3f}x")


if __name__ == "__main__":
    main()
