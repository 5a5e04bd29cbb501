"""Probe: can head-packing lift the SD UNet self-attention above ~23%
MXU utilization at head_dim=40 (8 heads, N=4096)?

Analysis first (why most packings are mathematically excluded):
attention contracts PER HEAD — QK^T contracts over d=40, PV over N
with 40 output lanes. Packing 3 heads into one 120-lane tile makes the
MXU sum cross-head products (concat(q_h) . concat(k_h) = sum_h q_h.k_h),
which is a different function. Recovering per-head results needs either
masked operands (same FLOPs as padding) or block-diagonal operands
(8x FLOP inflation > the 3.2x padding waste). This probe MEASURES the
remaining candidates so the 23% figure is a verdict, not an assumption:

  a) baseline: batched per-head attention, d=40 (what ships)
  b) d=128 reference: same token count, head_dim 128 (counts what full
     lanes would buy)
  c) masked-pack: 3 heads per 120-lane tile, per-head masked K — same
     hardware work as (a) but fewer, fatter matmul dispatches
  d) qk-merged: one (8N, d) x (d, 8N) matmul computing all cross-head
     blocks, diagonal blocks kept — full lanes, 8x FLOPs
"""

import time

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N, H, D = 4096, 8, 40
    B = 2  # CFG batch
    iters = 8
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.bfloat16)

    def attn(q, k, v):
        def body(c, _):
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (1.0 / D**0.5)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
            return c + jnp.sum(o.astype(jnp.float32)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    t_a = timed(attn, q, k, v) / iters
    flops = iters and 2 * B * H * (2 * N * N * D)
    print(f"(a) per-head d=40       : {t_a*1e3:7.2f} ms  {flops/t_a/1e12:6.1f} TFLOP/s model")

    q128 = jax.random.normal(key, (B, H, N, 128), jnp.bfloat16)
    k128 = jax.random.normal(jax.random.fold_in(key, 3), (B, H, N, 128), jnp.bfloat16)
    v128 = jax.random.normal(jax.random.fold_in(key, 4), (B, H, N, 128), jnp.bfloat16)
    t_b = timed(attn, q128, k128, v128) / iters
    flops128 = 2 * B * H * (2 * N * N * 128)
    print(f"(b) per-head d=128 ref  : {t_b*1e3:7.2f} ms  {flops128/t_b/1e12:6.1f} TFLOP/s model")

    # (c) masked-pack: heads grouped 3+3+2 into 120/80-lane tiles; K is
    # zero outside each head's lane block so cross-head terms vanish
    def attn_packed(q, k, v):
        groups = [(0, 3), (3, 3), (6, 2)]
        def body(c, _):
            acc = jnp.float32(0)
            for h0, g in groups:
                qg = q[:, h0:h0 + g].transpose(0, 2, 1, 3).reshape(B, N, g * D)
                kg = k[:, h0:h0 + g]
                vg = v[:, h0:h0 + g]
                for j in range(g):
                    mask = jnp.zeros((g, 1), jnp.bfloat16).at[j].set(1.0)
                    kgm = (kg * mask[None, :, None, :]).transpose(0, 2, 1, 3).reshape(B, N, g * D)
                    s = jnp.einsum("bnc,bmc->bnm", qg, kgm) * (1.0 / D**0.5)
                    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(jnp.bfloat16)
                    o = jnp.einsum("bnm,bmd->bnd", p, vg[:, j])
                    acc = acc + jnp.sum(o.astype(jnp.float32))
            return c + acc, ()
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    t_c = timed(attn_packed, q, k, v) / iters
    print(f"(c) masked 120-lane pack: {t_c*1e3:7.2f} ms  {flops/t_c/1e12:6.1f} TFLOP/s model")

    # (d) merged cross-head QK^T: one (B, 8N, d)x(B, d, 8N) matmul,
    # keep diagonal blocks (8x FLOPs, full M/N tiles, K still 40)
    def attn_merged(q, k, v):
        qm = q.transpose(0, 2, 1, 3).reshape(B, N * H, D)  # interleave later
        km = k.transpose(0, 2, 1, 3).reshape(B, N * H, D)
        def body(c, _):
            s_all = jnp.einsum("bnd,bmd->bnm", qm, km) * (1.0 / D**0.5)
            s = s_all.reshape(B, N, H, N, H)
            s = jnp.einsum("bnhmh->bhnm", s)  # diagonal blocks
            p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(jnp.bfloat16)
            o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
            return c + jnp.sum(o.astype(jnp.float32)), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    t_d = timed(attn_merged, q, k, v) / iters
    print(f"(d) merged 8x-flop QK^T : {t_d*1e3:7.2f} ms  {flops/t_d/1e12:6.1f} TFLOP/s model")


if __name__ == "__main__":
    main()
