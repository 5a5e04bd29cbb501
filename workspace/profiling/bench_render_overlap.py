"""Measure the render encode-path pipelining on the chip.

Three variants of delivering SG2 frames to the host at 1024^2 through
the axon relay (where device->host transfer bounds e2e fps):

  serialized : synth -> blocking rgb24 fetch per batch (old behavior)
  overlapped : StyleGAN2.render() double-buffer, rgb24
  overlap+yuv: StyleGAN2.render(pix_fmt="yuv420p") — double-buffer plus
               on-device I420 (half the bytes over the link)

Run from /root/repo: python workspace/profiling/bench_render_overlap.py
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())


def main():
    import jax.numpy as jnp
    import numpy as np

    from maua_tpu.gan import stylegan2 as sg2
    from maua_tpu.gan.wrappers import StyleGAN2

    res = int(os.environ.get("MAUA_BENCH_RES", "1024"))
    n_frames = int(os.environ.get("MAUA_BENCH_FRAMES", "32"))
    batch = int(os.environ.get("MAUA_BENCH_BATCH", "8"))

    gen = StyleGAN2(cfg=sg2.SG2Config(img_resolution=res, dtype="bfloat16"))
    ws = gen.get_w_latents(f"0-{max(n_frames // 8, 1)}")  # end-exclusive seed range
    lat = jnp.tile(ws, (8, 1, 1))[:n_frames]

    # serialized reference: synth -> blocking fetch per batch
    def serial():
        for lo in range(0, n_frames, batch):
            imgs = gen.synthesizer(lat[lo : lo + batch])
            imgs = jnp.clip((imgs + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
            yield from np.asarray(imgs)

    variants = {
        "serialized rgb24": serial,
        "overlapped rgb24": lambda: gen.render(lat, batch_size=batch),
        "overlap + yuv420": lambda: gen.render(lat, batch_size=batch, pix_fmt="yuv420p"),
    }
    for name, make in variants.items():
        for _ in make():  # warm (compile + first transfers)
            break
        t0 = time.time()
        n = sum(1 for _ in make())
        dt = time.time() - t0
        assert n == n_frames, (name, n)
        print(f"{name}: {n_frames / dt:6.2f} fps e2e  ({dt:.2f} s / {n_frames} frames)")


if __name__ == "__main__":
    main()
