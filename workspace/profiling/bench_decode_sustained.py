"""Sustained host-decode probe: is decode ms/frame stable when run in a
loop, idle vs under synthetic memcpy load (simulating relay fetch threads)?"""
import os, sys, time, threading
import numpy as np
sys.path.insert(0, "/root/repo")

# build a synthetic encoded chunk via the codec's own encode path on CPU
import jax
jax.config.update("jax_platforms", "cpu")
from maua_tpu.ops import framecodec as fc

rng = np.random.RandomState(0)
T, H, W = 32, 1024, 1024
# smooth-ish moving content (latent-interp-like): low-freq base + drift
base = rng.rand(H // 8, W // 8, 3).astype(np.float32)
frames = []
big = np.kron(base, np.ones((8, 8, 1), np.float32))
for t in range(T):
    shift = t  # slow pan
    f = np.roll(big, shift, axis=1) * 255.0
    f += rng.randn(H, W, 3).astype(np.float32) * 6.0
    frames.append(np.clip(f, 0, 255).astype(np.uint8))
rgb = np.stack(frames)
codec = fc.calibrate_chunk(rgb[:8], quality=1.1)
intra_d, deltas_d = jax.jit(lambda x: fc.encode_chunk(x, codec))(rgb)
intra = np.asarray(intra_d); deltas = np.asarray(deltas_d)
print(f"chunk: {codec.bits_per_pixel(T):.2f} bpp, {(intra.nbytes + deltas.nbytes)/1e6:.1f} MB")

out = fc.decode_chunk(intra, deltas, codec)  # warm native build
print("native:", fc._NATIVE_CHUNK_FN is not None)

stop = threading.Event()
def memcpy_load():
    src = np.random.bytes(4 << 20)
    while not stop.is_set():
        dst = bytes(src)  # ~memcpy
def run(label, seconds=20, load_threads=0):
    ts = [threading.Thread(target=memcpy_load, daemon=True) for _ in range(load_threads)]
    stop.clear(); [t.start() for t in ts]
    t_end = time.time() + seconds
    i = 0
    while time.time() < t_end:
        t0 = time.perf_counter()
        fc.decode_chunk(intra, deltas, codec)
        dt = time.perf_counter() - t0
        if i % 3 == 0:
            print(f"{label} iter {i}: {dt / T * 1e3:.2f} ms/frame")
        i += 1
    stop.set(); [t.join(timeout=1) for t in ts]

run("idle", 20, 0)
run("load4", 20, 4)
