"""Interleaved A/B of (fetch streams, pipeline depth) on the real e2e
loop — alternating configs per trial cancels relay weather drift."""
import collections, os, sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from maua_tpu.utility import enable_compilation_cache
enable_compilation_cache()
from maua_tpu.gan import fast_synthesis as fs
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.ops import framecodec as fc
from maua_tpu.ops import video as vid
from maua_tpu.ops.video import presplit, submit_fetches, fetch_parallel

batch = 48
cfg = sg2.SG2Config(img_resolution=1024, dtype="bfloat16")
params = sg2.init_params(jax.random.PRNGKey(0), cfg)
plan = fs.build_fast_plan(params, cfg)
key = jax.random.PRNGKey(3)
noises = {}
for res in cfg.block_resolutions:
    for c in (["conv1"] if res == 4 else ["conv0", "conv1"]):
        key, sub = jax.random.split(key)
        if res in plan["blocks"]:
            noises[f"b{res}.{c}"] = jax.random.normal(sub, (batch, res // 2, res // 2, 4, 1), jnp.bfloat16)
        else:
            noises[f"b{res}.{c}"] = jax.random.normal(sub, (batch, res, res, 1))
base_ws = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.num_ws, cfg.w_dim), jnp.float32)
kf = base_ws[:4]
loop_frames = 192

def ws_at(t_idx):
    t = t_idx.astype(jnp.float32) / loop_frames * 4.0
    i0 = jnp.floor(t).astype(jnp.int32) % 4
    i1 = (i0 + 1) % 4
    frac = (t - jnp.floor(t))[:, None, None]
    smooth = frac * frac * (3.0 - 2.0 * frac)
    return (1.0 - smooth) * kf[i0] + smooth * kf[i1]

def render_frames(params, nbat, c):
    idx = c * batch + jnp.arange(batch)
    img = fs.synthesis_fast(params, plan, ws_at(idx), cfg, noises=nbat)
    return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

render0 = jax.jit(render_frames)
render = lambda c: render0(params, noises, jnp.int32(c))
rgb0 = fetch_parallel(render(0))
codec = fc.calibrate_chunk(rgb0, quality=1.19)
encode = jax.jit(lambda x: fc.encode_chunk(x, codec))
i, d = encode(render(1))
_ = [np.asarray(s) for s in [i] + presplit(d)]
print(f"{codec.bits_per_pixel(batch):.2f} bpp, chunk {codec.chunk_bytes(batch)/1e6:.1f} MB", flush=True)

def trial(streams, depth, n_chunks=6):
    vid._FETCH_STREAMS = streams
    vid._FETCH_POOL = None
    def packed(c):
        i, d = encode(render(c))
        return submit_fetches([i] + presplit(d))
    def fetch_dec(futs):
        intra = futs[0].result()
        deltas = np.concatenate([f.result() for f in futs[1:]]) if len(futs) > 1 else None
        return fc.decode_chunk(intra, deltas, codec)
    t0 = time.perf_counter()
    q = collections.deque()
    for c in range(min(depth, n_chunks)):
        q.append(packed(c))
    for c in range(depth, n_chunks):
        nxt = packed(c)
        fetch_dec(q.popleft())
        q.append(nxt)
    while q:
        fetch_dec(q.popleft())
    dt = time.perf_counter() - t0
    return n_chunks * batch / dt

configs = [(8, 1), (8, 2), (12, 2), (12, 1)]
results = {c: [] for c in configs}
for rep in range(3):
    for cfg_ in configs:
        fps = trial(*cfg_)
        results[cfg_].append(fps)
        print(f"rep{rep} streams={cfg_[0]} depth={cfg_[1]}: {fps:.1f} fps", flush=True)
for cfg_, v in results.items():
    print(f"streams={cfg_[0]} depth={cfg_[1]}: median {sorted(v)[1]:.1f}, best {max(v):.1f}, worst {min(v):.1f}")
