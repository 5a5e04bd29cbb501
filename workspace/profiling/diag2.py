import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
from maua_tpu.ops import framecodec as fc
from maua_tpu.ops.video import rgb_to_yuv420

q = 1.19
cal = np.load("workspace/bench_frames_c0.npy")[:8]
rgb = np.load("workspace/bench_frames_c1.npy")
codec = fc.calibrate_chunk(cal, quality=q)
print("chroma_step", codec.chroma_step, "order2_c", sum(codec.order2_c) if codec.order2_c else 0,
      "order2_y", sum(codec.order2_y) if codec.order2_y else 0)
intra, deltas = map(np.asarray, jax.jit(lambda x: fc.encode_chunk(x, codec))(rgb))
np.savez("workspace/diag_enc.npz", intra=intra, deltas=deltas)
dec = fc.decode_chunk(intra, deltas, codec)
ref = np.asarray(jax.jit(rgb_to_yuv420)(rgb))
H, W = 1024, 1024
T = len(rgb)
d = dec.reshape(T, -1).astype(np.float64); r = ref.reshape(T, -1).astype(np.float64)
ny = H * W
for name, sl in (("y", slice(0, ny)), ("u", slice(ny, ny + ny // 4)), ("v", slice(ny + ny // 4, None))):
    mse = ((d[:, sl] - r[:, sl]) ** 2).mean(axis=1)
    print(name, " ".join(f"{m:7.1f}" for m in mse[::3]))
# count actual kept escape markers per frame in the luma stream
cd = codec.delta
lev = np.asarray(cd.levels_y, np.int64)
sy = (T - 1) * codec.luma_delta_bytes
sym = fc._host_unpack_sym(deltas[:sy].reshape(T - 1, -1), cd.n_blocks_y, cd.levels_y, cd.groups_y, cd.strip_y)
escp = (lev % 2 == 0) & (lev > 1)
mark = escp[None, None, :] & (sym == (lev - 1)[None, None, :])
print("kept y-escape markers/frame:", mark.sum(axis=(1, 2))[::3])
print("esc cap/frame:", codec.esc_cap_y)
