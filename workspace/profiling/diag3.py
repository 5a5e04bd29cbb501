"""Full-chunk calibration: bpp + per-chunk PSNR on c1/c2, flat per-frame error check."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
from maua_tpu.ops import framecodec as fc
from maua_tpu.ops.video import rgb_to_yuv420

q = float(sys.argv[1]) if len(sys.argv) > 1 else 1.19
cal = np.load("workspace/bench_frames_c0.npy")
codec = fc.calibrate_chunk(cal, quality=q)
print(f"q={q}: {codec.bits_per_pixel(32):.2f} bpp, cap_y={codec.esc_cap_y} cap_c={codec.esc_cap_c}, chunk {codec.chunk_bytes(32)/1e6:.2f} MB")
enc = jax.jit(lambda x: fc.encode_chunk(x, codec))
for ci in (1, 2):
    rgb = np.load(f"workspace/bench_frames_c{ci}.npy")
    intra, deltas = map(np.asarray, enc(rgb))
    dec = fc.decode_chunk(intra, deltas, codec)
    t0 = time.perf_counter(); dec = fc.decode_chunk(intra, deltas, codec); t_dec = time.perf_counter() - t0
    ref = np.asarray(jax.jit(rgb_to_yuv420)(rgb))
    e = (dec.astype(np.float64) - ref.astype(np.float64)).reshape(len(rgb), -1)
    mse = (e ** 2).mean(axis=1)
    psnr = 10 * np.log10(255.0**2 / mse.mean())
    worst = 10 * np.log10(255.0**2 / mse.max())
    print(f"chunk {ci}: PSNR {psnr:.2f} dB (worst frame {worst:.2f}), decode {t_dec/len(rgb)*1e3:.1f} ms/frame")
