import os, sys, pickle
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, os.getcwd())
import jax
from maua_tpu.ops import framecodec as fc
from maua_tpu.ops.video import rgb_to_yuv420

q = float(sys.argv[1]) if len(sys.argv) > 1 else 1.19
cal = np.load("workspace/bench_frames_c0.npy")[:8]
rgb = np.load("workspace/bench_frames_c1.npy")
codec = fc.calibrate_chunk(cal, quality=q)
lev_y = np.asarray(codec.delta.levels_y); lev_c = np.asarray(codec.delta.levels_c)
n_esc_y = int((( lev_y % 2 == 0) & (lev_y > 1)).sum()); n_esc_c = int(((lev_c % 2 == 0) & (lev_c > 1)).sum())
print(f"q={q}: esc positions y={n_esc_y} c={n_esc_c}, cap_y/frame={codec.esc_cap_y} cap_c={codec.esc_cap_c}, order2_y={sum(codec.order2_y) if codec.order2_y else 0}")
# actual escapes needed on the target chunk
y, u, v = fc._host_yuv_planes(rgb)
for name, pl, lev_i, lev_d, qs, cap in (("y", y, codec.intra.levels_y, lev_y, codec.intra.qstep_y, codec.esc_cap_y),
                                        ("c", np.concatenate([u, v]), codec.intra.levels_c, lev_c, codec.intra.qstep_c, codec.esc_cap_c)):
    C = fc._host_quantize_int(fc._host_block_dct(pl), qs, lev_i)
    d1 = C[1:] - C[:-1]
    d2 = np.concatenate([d1[:1], d1[1:] - d1[:-1]], axis=0)
    o2 = np.asarray(codec.order2_y if name == "y" else codec.order2_c, bool)
    d = d1.copy()
    if o2.size and o2.any():
        d[:, :, o2] = d2[:, :, o2]
    md = (lev_d - 1) // 2
    escp = (lev_d % 2 == 0) & (lev_d > 1)
    need = (np.abs(d) > md[None, None, :]) & escp[None, None, :]
    per_frame = need.sum(axis=(1, 2)) // (2 if name == "c" else 1)
    print(f"  {name}: escapes/frame needed min/med/max = {per_frame.min()}/{int(np.median(per_frame))}/{per_frame.max()} vs cap {cap}")
# per-frame PSNR of decode
intra, deltas = map(np.asarray, jax.jit(lambda x: fc.encode_chunk(x, codec))(rgb))
dec = fc.decode_chunk(intra, deltas, codec)
ref = np.asarray(jax.jit(rgb_to_yuv420)(rgb))
e = (dec.astype(np.float64) - ref.astype(np.float64))
pf = [10*np.log10(255**2/ max(np.mean(e[t]**2),1e-12)) for t in range(len(dec))]
print("per-frame PSNR:", " ".join(f"{p:.1f}" for p in pf))
