"""Pipeline parallelism (GPipe-style) over a mesh axis.

The reference framework has no pipeline parallelism (SURVEY.md 2.14
"PP: absent" — its largest model, CogVideo, uses megatron TP only), but
models larger than one chip's HBM need it, so this is a TPU-first
addition: per-stage layer parameters live sharded on a `stage` mesh
axis, microbatches flow through the stages over ICI via
`jax.lax.ppermute` inside ONE `shard_map`-wrapped `lax.scan` — no
host-side scheduling, no NCCL send/recv analogs; XLA overlaps each
stage's compute with the neighbor permute.

Schedule: classic GPipe fill-drain. With S stages and M microbatches
the scan runs M + S - 1 ticks; at tick t, stage s computes microbatch
t - s (when 0 <= t - s < M). Bubble fraction = (S-1)/(M+S-1) — pick
M >= 4*S in production. The whole schedule (and its backward) is
differentiable: `jax.grad` through `pipelined_apply` yields the
standard GPipe backward (stage S-1 first, activations rematerialized
per microbatch when the stage fn is `jax.checkpoint`-wrapped).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(blocks: List, n_stages: int):
    """Stack a list of L identically-structured per-layer pytrees into
    one pytree whose leaves have leading axes (n_stages, L//n_stages).

    The leading `stage` axis is the one sharded over the mesh's pipeline
    axis; the second axis is scanned within each stage."""
    n_layers = len(blocks)
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible into {n_stages} stages")
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked
    )


def scan_layers(layer_fn: Callable, stage_params, x):
    """Apply a stage's stacked layers (leading axis = layers-per-stage)
    sequentially: the canonical stage function body."""

    def body(h, layer):
        return layer_fn(layer, h), None

    out, _ = jax.lax.scan(body, x, stage_params)
    return out


def pipelined_apply(
    mesh: Mesh,
    axis: str,
    stage_params,
    stage_fn: Callable,
    x: jax.Array,
    num_microbatches: int,
):
    """Run `x` (B, ...) through S pipeline stages, returning the same
    shape. `stage_params` leaves carry a leading axis of size
    S = mesh.shape[axis] (see `stack_stage_params`); `stage_fn(params_s,
    x_mb) -> y_mb` must preserve the microbatch activation shape (true
    for transformer blocks).

    Mechanics (all inside one shard_map + lax.scan):
      - stage 0 injects microbatch t at tick t (clipped garbage after
        the last microbatch — never read);
      - every stage applies `stage_fn` to its current activation;
      - activations rotate to the next stage with `ppermute`;
      - the last stage writes finished microbatches into an output
        buffer, combined across stages with a masked `psum` (all other
        stages contribute zeros), so the result is replicated.
    """
    n_stages = mesh.shape[axis]
    batch = x.shape[0]
    if batch % num_microbatches != 0:
        raise ValueError(f"batch {batch} not divisible by {num_microbatches} microbatches")
    mb = batch // num_microbatches
    xmb = x.reshape((num_microbatches, mb) + x.shape[1:])

    # stage params: leading dim sharded over the pipeline axis;
    # activations replicated over it (each stage sees the full
    # microbatch — combine PP with DP by sharding the microbatch dim
    # over a data axis at the call site).
    param_spec = jax.tree_util.tree_map(lambda _: P(axis), stage_params)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_spec, P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(params, xmb):
        params = jax.tree_util.tree_map(lambda a: a[0], params)  # this stage's shard
        idx = jax.lax.axis_index(axis)
        n_mb = xmb.shape[0]
        state = jnp.zeros_like(xmb[0])
        outputs = jnp.zeros_like(xmb)

        def tick(carry, t):
            state, outputs = carry
            feed = jax.lax.dynamic_index_in_dim(
                xmb, jnp.clip(t, 0, n_mb - 1), 0, keepdims=False
            )
            h = jnp.where(idx == 0, feed, state)
            y = stage_fn(params, h)
            out_t = t - (n_stages - 1)
            slot = jnp.clip(out_t, 0, n_mb - 1)
            write = (idx == n_stages - 1) & (out_t >= 0)
            cur = jax.lax.dynamic_index_in_dim(outputs, slot, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, y, cur), slot, 0
            )
            state = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(num_microbatches + n_stages - 1)
        )
        # only the last stage wrote non-zeros; psum replicates its buffer
        return jax.lax.psum(outputs, axis)

    out = run(stage_params, xmb)
    return out.reshape((batch,) + x.shape[1:])


def pipeline_forward(
    params,
    tokens: jax.Array,
    cfg,
    mesh: Mesh,
    axis: str = "stage",
    num_microbatches: int = 4,
    remat: bool = False,
) -> jax.Array:
    """Pipeline-parallel full-sequence logits for the AR transformer
    (`autoregressive/transformer.py forward`), numerically matching the
    single-device path: embedding and head are replicated (tiny next to
    the blocks); the `cfg.layers` blocks are split into
    mesh.shape[axis] stages and pipelined over `num_microbatches`
    microbatches of the batch axis."""
    from ..autoregressive.transformer import position_table, transformer_block, _ln

    t = tokens.shape[1]
    x = params["tok_emb"][tokens] + position_table(params, cfg, t)[None]
    mask = jnp.tril(jnp.ones((t, t), bool))

    def layer_fn(blk, h):
        return transformer_block(blk, h, cfg, mask)

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    stacked = stack_stage_params(params["blocks"], mesh.shape[axis])
    stage_fn = partial(scan_layers, layer_fn)
    x = pipelined_apply(mesh, axis, stacked, stage_fn, x, num_microbatches)
    return _ln(params["ln_f"], x) @ params["head"]["w"]
