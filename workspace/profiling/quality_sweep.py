"""Quality -> (bpp, PSNR, decode ms/frame) elasticity on the real bench
content: sizes the auto-tune win (VERDICT r5 #1a) offline."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, os.getcwd())
import jax
from maua_tpu.ops import framecodec as fc
from maua_tpu.ops.video import rgb_to_yuv420

rgb = np.load("workspace/bench_frames_c1.npy")
cal = np.load("workspace/bench_frames_c0.npy")[:8]
ref = np.asarray(jax.jit(rgb_to_yuv420)(rgb))
T = len(rgb)
for q in [float(x) for x in (sys.argv[1:] or [1.1, 1.19, 1.3, 1.45])]:
    codec = fc.calibrate_chunk(cal, quality=q)
    intra, deltas = map(np.asarray, jax.jit(lambda x: fc.encode_chunk(x, codec))(rgb))
    dec = fc.decode_chunk(intra, deltas, codec)
    t0 = time.perf_counter(); dec = fc.decode_chunk(intra, deltas, codec); t_dec = time.perf_counter() - t0
    mse = np.mean((dec.astype(np.float64) - ref.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse)
    print(f"q={q:5.3f}: {codec.bits_per_pixel(T):5.2f} bpp  intra {codec.intra.frame_bytes/1e6:.2f} MB  "
          f"PSNR {psnr:5.2f} dB  decode {t_dec/T*1e3:5.1f} ms/frame", flush=True)
