"""e2e delivery grid: (fetch streams, chunk batch) on the real bench
pipeline — same codec quality, same content class, 2 trials each."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

from maua_tpu.utility import enable_compilation_cache
enable_compilation_cache()
from maua_tpu.gan import fast_synthesis as fs
from maua_tpu.gan import stylegan2 as sg2
from maua_tpu.ops import framecodec as fc
from maua_tpu.ops import video as vid
from maua_tpu.ops.video import presplit, rgb_to_yuv420, submit_fetches, fetch_parallel

cfg = sg2.SG2Config(img_resolution=1024, dtype="bfloat16")
params = sg2.init_params(jax.random.PRNGKey(0), cfg)
plan = fs.build_fast_plan(params, cfg)
key = jax.random.PRNGKey(3)
noises = {}
for res in cfg.block_resolutions:
    for c in (["conv1"] if res == 4 else ["conv0", "conv1"]):
        key, sub = jax.random.split(key)
        if res in plan["blocks"]:
            noises[f"b{res}.{c}"] = jax.random.normal(sub, (48, res // 2, res // 2, 4, 1), jnp.bfloat16)
        else:
            noises[f"b{res}.{c}"] = jax.random.normal(sub, (48, res, res, 1))
base_ws = jax.random.normal(jax.random.PRNGKey(1), (48, cfg.num_ws, cfg.w_dim), jnp.float32)
kf = base_ws[:4]
loop_frames = 192

def ws_at(t_idx):
    t = t_idx.astype(jnp.float32) / loop_frames * 4.0
    i0 = jnp.floor(t).astype(jnp.int32) % 4
    i1 = (i0 + 1) % 4
    frac = (t - jnp.floor(t))[:, None, None]
    smooth = frac * frac * (3.0 - 2.0 * frac)
    return (1.0 - smooth) * kf[i0] + smooth * kf[i1]

codecs = {}
renders = {}
encodes = {}

def setup(batch):
    nb = {k: v[:batch] for k, v in noises.items()}
    def render_frames(params, nbat, c):
        idx = c * batch + jnp.arange(batch)
        img = fs.synthesis_fast(params, plan, ws_at(idx), cfg, noises=nbat)
        return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
    render0 = jax.jit(render_frames)
    render = lambda p, c: render0(p, nb, c)
    rgb0 = fetch_parallel(render(params, jnp.int32(0)))
    codec = fc.calibrate_chunk(rgb0, quality=1.19)
    encode = jax.jit(lambda x: fc.encode_chunk(x, codec))
    # warm
    i, d = encode(render(params, jnp.int32(1)))
    _ = [np.asarray(s) for s in [i] + presplit(d)]
    print(f"batch {batch}: {codec.bits_per_pixel(batch):.2f} bpp, chunk {codec.chunk_bytes(batch)/1e6:.1f} MB", flush=True)
    return render, encode, codec

for batch in (32, 48):
    renders[batch], encodes[batch], codecs[batch] = setup(batch)

def trial(streams, batch, total_frames=256):
    os.environ["MAUA_FETCH_STREAMS"] = str(streams)
    vid._FETCH_STREAMS = streams
    vid._FETCH_POOL = None
    render, encode, codec = renders[batch], encodes[batch], codecs[batch]
    n_chunks = -(-total_frames // batch)
    def packed(c):
        i, d = encode(render(params, jnp.int32(c)))
        return submit_fetches([i] + presplit(d))
    def fetch_dec(futs):
        intra = futs[0].result()
        deltas = np.concatenate([f.result() for f in futs[1:]]) if len(futs) > 1 else None
        return fc.decode_chunk(intra, deltas, codec)
    t0 = time.perf_counter()
    pending = packed(0)
    for i in range(1, n_chunks):
        nxt = packed(i)
        fetch_dec(pending)
        pending = nxt
    fetch_dec(pending)
    dt = time.perf_counter() - t0
    return n_chunks * batch / dt

grid = [(8, 32), (12, 32), (16, 32), (12, 48), (16, 48), (8, 48)]
for streams, batch in grid:
    fps = [trial(streams, batch) for _ in range(2)]
    print(f"streams={streams} batch={batch}: {max(fps):.1f} fps best / {min(fps):.1f} worst", flush=True)
