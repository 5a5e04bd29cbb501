"""Mixture-of-experts FFN with expert parallelism over a mesh axis.

The reference framework has no MoE models (SURVEY.md 2.14 "EP:
absent"), but the EP axis is part of this framework's parallelism
surface: experts' FFN weights shard on an `expert` mesh axis, every
device evaluates only its local experts, and the gated combine is a
single `psum` over the axis — the GShard/Switch dispatch expressed as
masked dense einsums (static shapes, MXU-friendly) instead of
ragged all-to-alls.

Routing is top-k token-choice with renormalized softmax gates
(Switch k=1 / GShard k=2 style) plus the standard load-balancing
auxiliary loss (mean fraction-routed x mean gate prob per expert,
scaled by n_experts).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    width: int = 64
    hidden: int = 128
    n_experts: int = 4
    top_k: int = 2


def init_moe(key, cfg: MoEConfig) -> Dict:
    kr, k1, k2 = jax.random.split(key, 3)
    scale_in = 1.0 / jnp.sqrt(cfg.width)
    scale_hid = 1.0 / jnp.sqrt(cfg.hidden)
    return {
        "router": jax.random.normal(kr, (cfg.width, cfg.n_experts)) * scale_in,
        "w1": jax.random.normal(k1, (cfg.n_experts, cfg.width, cfg.hidden)) * scale_in,
        "b1": jnp.zeros((cfg.n_experts, cfg.hidden)),
        "w2": jax.random.normal(k2, (cfg.n_experts, cfg.hidden, cfg.width)) * scale_hid,
        "b2": jnp.zeros((cfg.n_experts, cfg.width)),
    }


def router_stats(params: Dict, x: jax.Array, cfg: MoEConfig):
    """(tokens, width) -> (gates, frac, pbar): the dense gate matrix
    (tokens, n_experts) — zero outside each token's top-k experts,
    softmax-renormalized inside them — plus the per-expert routed
    fraction and mean router probability (the load-balance statistics,
    kept separate so data-parallel shards can pmean them BEFORE the
    aux-loss product: the loss is bilinear in (frac, pbar), not linear
    in tokens)."""
    logits = x.astype(jnp.float32) @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    if cfg.top_k >= cfg.n_experts:
        gates = probs
    else:
        vals, idxs = jax.lax.top_k(logits, cfg.top_k)
        w = jax.nn.softmax(vals, axis=-1)
        gates = jnp.zeros_like(logits)
        gates = gates.at[jnp.arange(x.shape[0])[:, None], idxs].set(w)
    frac = jnp.mean(
        jax.nn.one_hot(jnp.argmax(logits, -1), cfg.n_experts, dtype=jnp.float32), axis=0
    )
    return gates.astype(x.dtype), frac, jnp.mean(probs, axis=0)


def _aux_loss(frac: jax.Array, pbar: jax.Array, cfg: MoEConfig) -> jax.Array:
    """Switch aux loss: n_experts * sum_e f_e * p_e."""
    return cfg.n_experts * jnp.sum(frac * pbar)


def router_gates(params: Dict, x: jax.Array, cfg: MoEConfig) -> Tuple[jax.Array, jax.Array]:
    """(tokens, width) -> (gates, aux_loss). See `router_stats`."""
    gates, frac, pbar = router_stats(params, x, cfg)
    return gates, _aux_loss(frac, pbar, cfg)


def _expert_ffn(w1, b1, w2, b2, x):
    """All-experts FFN on all tokens: (N, W) x (E, W, H) -> (N, E, W)."""
    h = jnp.einsum("nw,ewh->neh", x, w1) + b1[None]
    h = jax.nn.gelu(h)
    return jnp.einsum("neh,ehw->new", h, w2) + b2[None]


def moe_apply(params: Dict, x: jax.Array, cfg: MoEConfig) -> Tuple[jax.Array, jax.Array]:
    """Dense (single-device) reference path: every expert computed for
    every token, combined with the gate matrix. Returns (out, aux_loss);
    `out` has x's shape. The EP path below is numerically equivalent."""
    shape = x.shape
    tok = x.reshape(-1, cfg.width)
    gates, aux = router_gates(params, tok, cfg)
    y = _expert_ffn(params["w1"], params["b1"], params["w2"], params["b2"], tok)
    out = jnp.einsum("ne,new->nw", gates, y)
    return out.reshape(shape), aux


def ep_shardings(params: Dict, mesh: Mesh, axis: str = "expert"):
    """NamedShardings placing each expert-indexed leaf's leading dim on
    the `expert` mesh axis (router replicated)."""
    from jax.sharding import NamedSharding

    def spec(path, leaf):
        name = getattr(path[-1], "key", None)
        if name in ("w1", "b1", "w2", "b2"):
            return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return {
        k: jax.device_put(v, spec((jax.tree_util.DictKey(k),), v))
        for k, v in params.items()
    }


def moe_apply_ep(
    params: Dict,
    x: jax.Array,
    cfg: MoEConfig,
    mesh: Mesh,
    axis: str = "expert",
    data_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Expert-parallel path: expert weights sharded on `axis`, each
    device computes ONLY its n_experts/S local experts for the tokens it
    sees, and the gated partial sums combine with one `psum` over the
    expert axis (zero-gate experts contribute zeros, so the psum IS the
    top-k combine). Pass `data_axis` to additionally shard tokens
    (DP x EP): token shards never move — only the replicated-router
    gates and the psum cross the expert axis."""
    shape = x.shape
    n_local = cfg.n_experts // mesh.shape[axis]
    if n_local * mesh.shape[axis] != cfg.n_experts:
        raise ValueError(f"{cfg.n_experts} experts not divisible over {mesh.shape[axis]} devices")

    expert_spec = {
        "router": P(),
        "w1": P(axis, None, None),
        "b1": P(axis, None),
        "w2": P(axis, None, None),
        "b2": P(axis, None),
    }
    tok_spec = P(data_axis, None) if data_axis else P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(expert_spec, tok_spec),
        out_specs=(tok_spec, P()),
        check_vma=False,
    )
    def run(p, tok):
        gates, frac, pbar = router_stats({"router": p["router"]}, tok, cfg)
        if data_axis:
            # global statistics first — the aux loss is bilinear in
            # (frac, pbar), so shard-local products would not match the
            # unsharded value
            frac = jax.lax.pmean(frac, data_axis)
            pbar = jax.lax.pmean(pbar, data_axis)
        aux = _aux_loss(frac, pbar, cfg)
        lo = jax.lax.axis_index(axis) * n_local
        local_gates = jax.lax.dynamic_slice_in_dim(gates, lo, n_local, axis=1)
        y = _expert_ffn(p["w1"], p["b1"], p["w2"], p["b2"], tok)
        out = jnp.einsum("ne,new->nw", local_gates, y)
        out = jax.lax.psum(out, axis)
        return out, aux

    out, aux = run(params, x.reshape(-1, cfg.width))
    return out.reshape(shape), aux
