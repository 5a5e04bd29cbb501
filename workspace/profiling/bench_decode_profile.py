"""Attribute host chunk-decode time (the e2e critical path: 12-14
ms/frame measured in-bench r4) to unpack / IDCT / emit+DPCM stages
without touching the C++: three decode timings on crafted inputs whose
differences isolate the stages.

  T_real   = unpack + idct + emit          (real stream)
  T_zero   = unpack + idct-skipped + emit  (all-zero words: every
             symbol decodes to mid -> coef 0 -> the 16-lane zero
             short-circuit skips the dense IDCT)
  T_empty  = emit only                     (delta levels all 1: no
             words, no escapes; geometry unchanged)

Also caches the encoded chunk to workspace/codec_cache.npz so decoder
experiments re-run without the (slow, CPU) jit encode.

Usage: python workspace/profiling/bench_decode_profile.py [quality]
"""

import dataclasses
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.getcwd())

from maua_tpu import native
from maua_tpu.ops import framecodec as fc

QUALITY = float(sys.argv[1]) if len(sys.argv) > 1 else 1.19
CACHE = f"workspace/codec_cache_q{QUALITY}.npz"


def load_or_encode():
    if os.path.exists(CACHE):
        z = np.load(CACHE, allow_pickle=True)
        return z["intra"], z["deltas"], pickle.loads(z["codec"].tobytes())
    import jax

    cal = np.load("workspace/bench_frames_c0.npy")[:8]
    rgb = np.load("workspace/bench_frames_c1.npy")
    codec = fc.calibrate_chunk(cal, quality=QUALITY)
    intra, deltas = map(np.asarray, jax.jit(lambda x: fc.encode_chunk(x, codec))(rgb))
    np.savez(CACHE, intra=intra, deltas=deltas,
             codec=np.frombuffer(pickle.dumps(codec), np.uint8))
    return intra, deltas, codec


def timeit(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    intra, deltas, codec = load_or_encode()
    T = codec.frames_for_delta_bytes(deltas.size)
    print(f"chunk: {T} frames, {codec.bits_per_pixel(T):.2f} bpp, "
          f"{(intra.nbytes + deltas.nbytes) / 1e6:.1f} MB, quality {QUALITY}")

    t_real = timeit(lambda: native.framecodec_decode_chunk_u8(intra, deltas, codec, T))
    t_wrap = timeit(lambda: fc.decode_chunk(intra, deltas, codec))

    zero = np.zeros_like(deltas)  # all-zero words; zero escape counts
    t_zero = timeit(lambda: native.framecodec_decode_chunk_u8(intra, zero, codec, T))

    lev1 = dataclasses.replace(
        codec,
        delta=dataclasses.replace(codec.delta, levels_y=(1,) * 64, levels_c=(1,) * 64,
                                  groups_y=(), groups_c=()),
        esc_cap_y=0, esc_cap_c=0, order2_y=(), order2_c=(),
    )
    empty = np.zeros((lev1.delta_bytes(T),), np.uint8)
    t_empty = timeit(lambda: native.framecodec_decode_chunk_u8(intra, empty, lev1, T))

    ms = lambda t: t / T * 1e3
    print(f"decode real : {ms(t_real):6.2f} ms/frame  (wrapper {ms(t_wrap):.2f})")
    print(f"decode zero : {ms(t_zero):6.2f} ms/frame  -> dense IDCT ~ {ms(t_real - t_zero):.2f}")
    print(f"decode empty: {ms(t_empty):6.2f} ms/frame  -> unpack    ~ {ms(t_zero - t_empty):.2f}")
    print(f"                                 -> emit+DPCM+loop ~ {ms(t_empty):.2f}")


if __name__ == "__main__":
    main()
