"""Offline codec lab: runs the delivery codec on REAL bench content
(workspace/bench_frames_c*.npy, dumped from the TPU by
dump_bench_frames.py) entirely on the host — measures bpp, PSNR, and
host decode time, and evaluates rate-allocation experiments without
touching the chip.

Usage: JAX_PLATFORMS=cpu python workspace/profiling/codec_lab.py [exp]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.getcwd())

from maua_tpu.ops import framecodec as fc


def load_chunks():
    import glob
    paths = sorted(glob.glob("workspace/bench_frames_c*.npy"))
    if not paths:
        raise FileNotFoundError("run dump_bench_frames.py first")
    return [np.load(p) for p in paths]


def psnr_vs_i420(dec_yuv, rgb):
    from maua_tpu.ops.video import rgb_to_yuv420
    import jax

    ref = np.asarray(jax.jit(rgb_to_yuv420)(rgb))
    mse = np.mean((dec_yuv.astype(np.float64) - ref.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def baseline(quality=1.15):
    import jax

    chunks = load_chunks()
    codec = fc.calibrate_chunk(chunks[0][:8], quality=quality)
    enc = jax.jit(lambda x: fc.encode_chunk(x, codec))
    print(f"codec: {codec.bits_per_pixel(32):.2f} bpp, chunk {codec.chunk_bytes(32)/1e6:.2f} MB")
    for c, rgb in enumerate(chunks):
        t0 = time.perf_counter()
        intra, deltas = map(np.asarray, enc(rgb))
        t_enc = time.perf_counter() - t0
        dec = fc.decode_chunk(intra, deltas, codec)  # warm native build
        t0 = time.perf_counter()
        dec = fc.decode_chunk(intra, deltas, codec)
        t_dec = time.perf_counter() - t0
        print(f"chunk {c}: encode(cpu) {t_enc:.2f}s, decode {t_dec:.3f}s "
              f"({t_dec/len(rgb)*1e3:.1f} ms/frame), PSNR {psnr_vs_i420(dec, rgb):.2f} dB "
              f"(native={fc._NATIVE_CHUNK_FN is not None})")


def entropy_report(quality=1.15):
    """Where do the bits go, and what would ideal entropy coding save?"""
    chunks = load_chunks()
    codec = fc.calibrate_chunk(chunks[0][:8], quality=quality)
    ci, cd = codec.intra, codec.delta
    rgb = np.concatenate([c for c in chunks], axis=0)
    y, u, v = fc._host_yuv_planes(rgb)

    for name, plane, lev_i, lev_d, q in [
        ("luma", y, ci.levels_y, cd.levels_y, ci.qstep_y),
        ("chroma", np.concatenate([u, v]), ci.levels_c, cd.levels_c, ci.qstep_c),
    ]:
        C = fc._host_quantize_int(fc._host_block_dct(plane), q, lev_i)
        d = (C[1:] - C[:-1]).reshape(-1, 64)
        md = (np.asarray(lev_d, np.int64) - 1) // 2
        dc = np.clip(d, -md, md)
        # static cost vs empirical entropy per position
        live = np.asarray(lev_d) > 1
        static_bits = np.log2(np.asarray(lev_d, np.float64))[live].sum()
        ent = 0.0
        for i in np.nonzero(live)[0]:
            vals, counts = np.unique(dc[:, i], return_counts=True)
            p = counts / counts.sum()
            ent += -(p * np.log2(p)).sum()
        # spatial adaptivity: entropy if each BLOCK-position had its own
        # optimal static table (upper bound for per-strip classes)
        nb = d.shape[0] // (len(plane) - 1) if False else None
        print(f"{name}: live {live.sum()}/64 pos, static {static_bits:.1f} "
              f"bits/block, entropy {ent:.1f} ({(1-ent/static_bits)*100:.0f}% gap)")
        # per-position detail: top 10 cost positions
        costs = [(np.log2(lev_d[i]), i) for i in np.nonzero(live)[0]]
        costs.sort(reverse=True)
        print("  top positions (bits): ", [(i, f"{b:.1f}") for b, i in costs[:8]])




def levers(quality=1.15):
    """Measure candidate bit-savings: (a) per-strip spatial classes,
    (b) order-2 temporal prediction, per plane."""
    chunks = load_chunks()
    codec = fc.calibrate_chunk(chunks[0][:8], quality=quality)
    ci, cd = codec.intra, codec.delta
    rgb = np.concatenate([c for c in chunks], axis=0)
    y, u, v = fc._host_yuv_planes(rgb)

    def bits_for(dq):
        # static mixed-radix cost for covering quantile-range dq (per position)
        m = np.maximum(np.ceil(dq).astype(np.int64), 1)
        return np.log2(2 * m + 1).sum(axis=-1)

    for name, plane, lev_i, q, strip in [
        ("luma", y, ci.levels_y, ci.qstep_y, ci.strip_y),
        ("chroma-u", u, ci.levels_c, ci.qstep_c, ci.strip_c),
        ("chroma-v", v, ci.levels_c, ci.qstep_c, ci.strip_c),
    ]:
        T = plane.shape[0]
        C = fc._host_quantize_int(fc._host_block_dct(plane), q, lev_i)  # (T, nb, 64)
        d1 = np.abs(np.diff(C, axis=0))          # (T-1, nb, 64)
        d2 = np.abs(np.diff(C, 2, axis=0))       # (T-2, nb, 64)
        nb = C.shape[1]
        margin = 1.3
        # global (current scheme)
        g1 = np.quantile(d1.reshape(-1, 64), 0.999, axis=0) * margin
        g2 = np.quantile(d2.reshape(-1, 64), 0.999, axis=0) * margin
        # per-strip: quantile over (T-1)*strip samples per strip per position
        s1 = np.quantile(d1.reshape(T - 1, nb // strip, strip, 64), 0.999,
                         axis=(0, 2)) * margin  # (ns, 64)
        b_glob1 = bits_for(g1)
        b_glob2 = bits_for(g2)
        b_strip1 = bits_for(s1).mean()
        # K-means-ish classes on per-strip bit vectors (just quantile buckets
        # of total strip bits, then class table = max over members)
        sb = bits_for(s1)
        for K in (4, 8, 16):
            order = np.argsort(sb)
            classes = np.array_split(order, K)
            tot = 0.0
            for cls in classes:
                tot += bits_for(s1[cls].max(axis=0)) * len(cls)
            print(f"  {name}: K={K} classes -> {tot/nb*strip:.1f} bits/block", end="")
        print()
        print(f"{name}: global-o1 {b_glob1:.1f} b/blk | global-o2 {b_glob2:.1f} | "
              f"per-strip-o1 {b_strip1:.1f} (lower bound)")



def simd_check(quality=1.15):
    """SIMD decoder vs scalar vs numpy: exactness + speed on real frames."""
    import ctypes
    import jax
    from maua_tpu import native

    chunks = load_chunks()
    codec = fc.calibrate_chunk(chunks[0][:8], quality=quality)
    enc = jax.jit(lambda x: fc.encode_chunk(x, codec))
    rgb = chunks[2]
    intra, deltas = map(np.asarray, enc(rgb))

    lib = native._lib()
    print("simd available:", lib.framecodec_simd_available())

    # numpy reference (no native)
    saved = fc._NATIVE_CHUNK_FN, fc._NATIVE_CHUNK_CHECKED
    fc._NATIVE_CHUNK_FN, fc._NATIVE_CHUNK_CHECKED = None, True
    ref = fc.decode_chunk(intra, deltas, codec)
    fc._NATIVE_CHUNK_FN, fc._NATIVE_CHUNK_CHECKED = saved

    out = native.framecodec_decode_chunk_u8(intra, deltas, codec, len(rgb))
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    print(f"simd-vs-numpy: max diff {diff.max()}, frac nonzero {np.mean(diff>0):.2e}")

    for _ in range(2):
        t0 = time.perf_counter()
        out = native.framecodec_decode_chunk_u8(intra, deltas, codec, len(rgb))
        t = time.perf_counter() - t0
    print(f"decode: {t:.3f}s ({t/len(rgb)*1e3:.1f} ms/frame)")


def pfor(quality=1.15):
    """Escape-coded (PFor-style) rate: per position choose m minimizing
    log2(2m+2) + P(|d|>m)*16 (escape alphabet slot + exact int16
    exception). Compare vs current static levels, for delta and intra."""
    chunks = load_chunks()
    codec = fc.calibrate_chunk(chunks[0][:8], quality=quality)
    ci, cd = codec.intra, codec.delta
    rgb = np.concatenate([c for c in chunks], axis=0)
    y, u, v = fc._host_yuv_planes(rgb)

    def best_cost(vals, exc_bits=16.0):
        # vals: (N, 64) integer symbols (unclipped). per-position optimal m.
        out_bits = np.zeros(64)
        out_m = np.zeros(64, np.int64)
        out_rate = np.zeros(64)
        a = np.abs(vals)
        N = a.shape[0]
        for i in range(64):
            hi = int(a[:, i].max())
            # candidate m values: 0..hi (cap the sweep via quantiles)
            cands = np.unique(np.concatenate([[0, hi],
                np.quantile(a[:, i], [0.5, 0.8, 0.9, 0.95, 0.98, 0.99, 0.995, 0.999, 0.9995]).astype(np.int64)]))
            best = None
            for m in cands:
                p_exc = np.mean(a[:, i] > m)
                c = np.log2(2 * m + 2 if p_exc > 0 else max(2 * m + 1, 1)) + p_exc * exc_bits
                if m == 0 and p_exc == 0:
                    c = 0.0  # dead position
                if best is None or c < best[0]:
                    best = (c, m, p_exc)
            out_bits[i], out_m[i], out_rate[i] = best[0], best[1], best[2]
        return out_bits, out_m, out_rate

    tot_cur = 0.0
    tot_new = 0.0
    for name, plane, lev_i, lev_d, q in [
        ("luma", y, ci.levels_y, cd.levels_y, ci.qstep_y),
        ("chroma", np.concatenate([u, v]), ci.levels_c, cd.levels_c, ci.qstep_c),
    ]:
        # UNCLIPPED quantization (escape ships exact values)
        C = np.round(fc._host_block_dct(plane) / q).astype(np.int64)
        d = (C[1:] - C[:-1]).reshape(-1, 64)
        bits_d, m_d, rate_d = best_cost(d)
        cur_d = np.log2(np.maximum(np.asarray(lev_d, np.float64), 1.0)).sum()
        i0 = C[0:1].reshape(-1, 64)  # intra symbols (one frame here; use all frames as intra stats)
        ia = C.reshape(-1, 64)
        bits_i, m_i, rate_i = best_cost(ia)
        cur_i = np.log2(np.maximum(np.asarray(lev_i, np.float64), 1.0)).sum()
        w = 1.0 if name == "luma" else 2.0  # u+v already concatenated; weight blocks
        print(f"{name}: delta {cur_d:.1f} -> {bits_d.sum():.1f} bits/block "
              f"({(1-bits_d.sum()/cur_d)*100:.0f}% saving, mean exc rate {rate_d.mean()*100:.2f}%)")
        print(f"{name}: intra {cur_i:.1f} -> {bits_i.sum():.1f} bits/block "
              f"({(1-bits_i.sum()/cur_i)*100:.0f}% saving, mean exc rate {rate_i.mean()*100:.2f}%)")
        tot_cur += cur_d
        tot_new += bits_d.sum()

    # overall chunk bpp estimate (32 frames, 1 intra + 31 delta)
    nb_y, nb_c = cd.n_blocks_y, cd.n_blocks_c
    print(f"current bpp {codec.bits_per_pixel(32):.2f}")


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    globals()[exp]()
