"""Attention: XLA reference implementation + Pallas flash-attention
kernel for TPU.

This replaces the reference's memory-adaptive *sliced* cross-attention
monkey-patch (`maua/diffusion/processors/stable.py:33-86`), which
serializes query chunks to fit VRAM. On TPU the equivalent is a
blockwise (flash) kernel: O(N) memory via online softmax, MXU matmuls
per block — no host-side slicing heuristics.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp



def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """Plain softmax attention. q: (B, H, Nq, D), k/v: (B, H, Nk, D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    Matmuls keep the input dtype (bf16 on the MXU) with f32
    accumulation via preferred_element_type — upcasting the operands
    to f32 would run the MXU at 1/8 rate."""
    q = q_ref[...]  # (Bq, D), input dtype
    n_k = k_ref.shape[0]
    num_blocks = n_k // block_k

    def body(i, carry):
        acc, row_max, row_sum = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (Bq, Bk) f32
        new_max = jnp.maximum(row_max, jnp.max(s, axis=-1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(s - new_max)
        acc = acc * correction + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        row_sum = row_sum * correction + jnp.sum(p, axis=-1, keepdims=True)
        return acc, new_max, row_sum

    bq, d = q.shape
    acc0 = jnp.zeros((bq, v_ref.shape[1]), jnp.float32)
    max0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    sum0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, row_sum = jax.lax.fori_loop(0, num_blocks, body, (acc0, max0, sum0))
    o_ref[...] = (acc / row_sum).astype(o_ref.dtype)


def _attn_kernel_single(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Single-shot per-program attention: K/V live fully in VMEM (fine
    up to a few thousand tokens), so each program is two large MXU
    matmuls + one softmax — no online-softmax loop needed."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[...] = (acc / denom).astype(o_ref.dtype)


try:  # pallas import kept lazy-safe for CPU test environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None,
    block_q: int = 256, block_k: int = 256, interpret: bool = False,
) -> jax.Array:
    """Blockwise flash attention via Pallas. q: (B, H, Nq, D).

    Falls back to the XLA path when shapes don't tile cleanly or
    Pallas is unavailable."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, h, nq, d = q.shape
    nk = k.shape[2]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (
        not _HAVE_PALLAS
        or (not on_tpu and not interpret)
        or nq % block_q != 0
        or nk % block_k != 0
        or d % 8 != 0
    ):
        return attention_xla(q, k, v, scale)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, v.shape[-1])

    # K/V small enough for VMEM residency -> single-shot programs;
    # otherwise the blocked online-softmax kernel
    if nk * d <= 1_048_576 and nk * block_q <= 4_194_304:
        kernel = functools.partial(_attn_kernel_single, scale=scale)
    else:
        kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, nk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, nk, vf.shape[-1]), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, vf.shape[-1]), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, vf.shape[-1]), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, vf.shape[-1])


def attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                     scale: Optional[float] = None) -> jax.Array:
    """Masked head-packing for small head dims: groups of heads share
    one ~128-lane tile for the QK^T matmuls (K masked per head so
    cross-head products vanish) — at head_dim 40 the per-head matmul
    loads only 40 of the MXU's 128 contraction lanes, and packing 3
    heads measured 1.54x the per-head path on v5e
    (workspace/profiling/bench_attn_headpack.py). Exact same function
    as attention_xla (the masking is algebraic, not approximate)."""
    b, h, n, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    g = max(min(128 // d, h), 1)  # heads per 128-lane tile
    outs = []
    for h0 in range(0, h, g):
        gh = min(g, h - h0)
        qg = q[:, h0:h0 + gh].transpose(0, 2, 1, 3).reshape(b, n, gh * d)
        kg = k[:, h0:h0 + gh]
        for j in range(gh):
            mask = jnp.zeros((gh,), q.dtype).at[j].set(1.0)
            kgm = (kg * mask[None, :, None, None]).transpose(0, 2, 1, 3).reshape(b, -1, gh * d)
            s = jnp.einsum("bnc,bmc->bnm", qg, kgm) * scale
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            outs.append(jnp.einsum("bnm,bmd->bnd", p, v[:, h0 + j]))
    return jnp.stack(outs, axis=1)


# attention_packed materializes full (B, N, N) score matrices per head;
# above this sequence length the memory-bounded flash kernel wins (and the
# packed path's win was only measured at N=4096, the SD 512^2 shape).
_PACKED_MAX_SEQ = 4096


def attention(q, k, v, scale=None, use_flash: bool = True):
    """Dispatcher used by the UNet's attention layers.

    Self-attention with small head dims (<64), several heads, and
    sequences short enough that the full score matrix is cheap routes
    through the masked head-packing formulation (attention_packed);
    everything else uses the flash kernel (use_flash=True) or the plain
    XLA path. use_flash=False always bypasses the packed path so callers
    can force the dense reference formulation."""
    d = q.shape[-1]
    if (use_flash and d < 64 and q.shape[1] >= 2
            and q.shape[2] == k.shape[2] and q.shape[2] <= _PACKED_MAX_SEQ):
        return attention_packed(q, k, v, scale)
    if use_flash:
        return flash_attention(q, k, v, scale)
    return attention_xla(q, k, v, scale)
