"""Escape coding x prediction order x exception width, on real frames."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

sys.path.insert(0, os.getcwd())
from maua_tpu.ops import framecodec as fc


def load_chunks():
    return [np.load(f"workspace/bench_frames_c{i}.npy") for i in range(3)]


def cost_at(col, m, exc_bits):
    p = np.mean(col > m)
    c = np.log2(2 * m + 2 if p > 0 else max(2 * m + 1, 1)) + p * exc_bits
    return 0.0 if (m == 0 and p == 0) else c


def best_cost(vals, exc_bits=16.0, two_level=False):
    out = np.zeros(64)
    a = np.abs(vals)
    for i in range(64):
        col = a[:, i]
        hi = int(col.max())
        qs = np.quantile(col, [0.3, 0.5, 0.65, 0.8, 0.9, 0.95, 0.98, 0.99, 0.995, 0.999, 0.9995]).astype(np.int64)
        cands = np.unique(np.concatenate([[0, hi], qs]))
        best = min(cost_at(col, int(m), exc_bits) for m in cands)
        if two_level:
            for m0 in cands:
                p1 = np.mean(col > m0)
                p2 = np.mean(col > int(m0) + 127)
                c = np.log2(2 * int(m0) + 2 if p1 > 0 else max(2 * int(m0) + 1, 1)) + (p1 - p2) * 8 + p2 * (8 + 16)
                if m0 == 0 and p1 == 0:
                    c = 0.0
                best = min(best, c)
        out[i] = best
    return out


def main(quality=1.15):
    chunks = load_chunks()
    codec = fc.calibrate_chunk(chunks[0][:8], quality=quality)
    ci, cd = codec.intra, codec.delta
    rgb = np.concatenate(list(chunks), axis=0)
    y, u, v = fc._host_yuv_planes(rgb)

    for name, plane, lev_d, q in [
        ("luma", y, cd.levels_y, ci.qstep_y),
        ("chroma", np.concatenate([u, v]), cd.levels_c, ci.qstep_c),
    ]:
        C = np.round(fc._host_block_dct(plane) / q).astype(np.int64)
        d1 = C[1:] - C[:-1]
        d2 = (d1[1:] - d1[:-1]).reshape(-1, 64)
        d1f = d1.reshape(-1, 64)
        cur = np.log2(np.maximum(np.asarray(lev_d, np.float64), 1.0)).sum()
        b_o1 = best_cost(d1f)
        b_o2 = best_cost(d2)
        b_o1_2l = best_cost(d1f, two_level=True)
        b_o2_2l = best_cost(d2, two_level=True)
        b_mix = np.minimum(b_o1, b_o2)
        b_mix2 = np.minimum(b_o1_2l, b_o2_2l)
        n_o2 = int((b_o2_2l < b_o1_2l).sum())
        print(f"{name}: cur {cur:.1f} | o1+esc {b_o1.sum():.1f} | o2+esc {b_o2.sum():.1f} | "
              f"mix {b_mix.sum():.1f} | o1+2lvl {b_o1_2l.sum():.1f} | mix+2lvl {b_mix2.sum():.1f} "
              f"({n_o2}/64 pos prefer o2)")


if __name__ == "__main__":
    main()
