"""RuDALL-E-style autoregressive finetuning.

Rebuild of `maua/autoregressive/ru_dalle/finetune.py:115-407`:
- selective freeze: attention + FF weights frozen, embeddings /
  layernorms / head trainable (`freeze(...)` :148)
- AdamW or 8-bit Adam (:150) — here `quantized_adam`, an optax
  transform holding Adam moments as blockwise-quantized int8 with
  per-block float scales (the bitsandbytes trick), cutting optimizer
  HBM by ~4x vs fp32 moments
- OneCycle LR schedule (:151-153), global-norm grad clip 0.24 (:178)
- cross-entropy split into text/image segments with the reference's
  `(text + w * img) / (w + 1)` weighting (:293-297); by default only
  the image loss trains (:176-178 `loss = loss["image"]`)
- gradient checkpointing via `transformer.forward(remat=True)`
  (:259-261)
- checkpoint save/restore (.npz pytree) incl. interrupt save (:190-196)

The step is one jitted function; DP over the mesh `data` axis works by
sharding the batch like `gan/training.py`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .transformer import ARConfig, forward


# ------------------------------------------------ int8 blockwise Adam
def _quantize_block(x: jax.Array, block: int) -> Tuple[jax.Array, jax.Array]:
    flat = x.reshape(-1)
    pad = (-flat.shape[0]) % block
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_block(q: jax.Array, scale: jax.Array, shape) -> jax.Array:
    n = int(np.prod(shape))
    return (q.astype(jnp.float32) * scale).reshape(-1)[:n].reshape(shape)


def quantized_adam(
    learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, block: int = 256
) -> optax.GradientTransformation:
    """Adam with int8 blockwise-quantized moment state (the 8-bit Adam
    role, `finetune.py:150` bitsandbytes Adam8bit): m is linear int8
    codes + per-block absmax scale; the second moment is stored as
    sqrt(v) so small entries keep resolution, and the denominator is
    floored by half a quantization step so entries that round to zero
    can't explode 1/(sqrt(v)+eps)."""

    def init(params):
        def q(p):
            z = jnp.zeros_like(p)
            mq, ms = _quantize_block(z, block)
            return {"mq": mq, "ms": ms, "uq": mq, "us": ms}

        return {"count": jnp.zeros((), jnp.int32), "state": jax.tree_util.tree_map(q, params)}

    def update(grads, opt_state, params=None):
        count = opt_state["count"] + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def upd(g, s):
            m = _dequantize_block(s["mq"], s["ms"], g.shape)
            u = _dequantize_block(s["uq"], s["us"], g.shape)  # sqrt(v)
            v = u * u
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            uq, us = _quantize_block(jnp.sqrt(v), block)
            # quantization-uncertainty floor: half a code step per block
            floor = jnp.max(us) * 0.5
            step = -lr * mhat / (jnp.sqrt(vhat) + floor + eps)
            mq, ms = _quantize_block(m, block)
            return step, {"mq": mq, "ms": ms, "uq": uq, "us": us}

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(opt_state["state"])
        out = [upd(g, s) for g, s in zip(flat_g, flat_s)]
        steps = treedef.unflatten([o[0] for o in out])
        state = treedef.unflatten([o[1] for o in out])
        return steps, {"count": count, "state": state}

    return optax.GradientTransformation(init, update)


# ------------------------------------------------------- freeze mask
def trainable_mask(params: Dict) -> Dict:
    """True = train. Matches the reference freeze pattern
    (`finetune.py:148` freeze_attn=True, freeze_ff=True,
    freeze_emb/ln/other=False): embeddings, layernorms, and the output
    head train; qkv/proj/fc1/fc2 weights are frozen."""
    frozen = {"qkv", "proj", "fc1", "fc2"}

    def mask(path, leaf):
        names = {getattr(k, "key", None) for k in path}
        return not (names & frozen)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(treedef, [mask(p, l) for p, l in flat])


# ----------------------------------------------------------- loss
def finetune_loss(
    params: Dict, tokens: jax.Array, cfg: ARConfig, img_weight: float = 7.0, train_text: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Next-token CE split into text / image segments
    (`finetune.py:285-297`): text logits restricted to the text vocab,
    image logits to the image vocab; combined as
    (text + w * img) / (w + 1), or image-only by default (:176)."""
    logits = forward(params, tokens[:, :-1], cfg, remat=remat)
    labels = tokens[:, 1:]
    tl = cfg.text_length - 1  # positions predicting text tokens

    text_logits = logits[:, :tl, : cfg.text_vocab_size].astype(jnp.float32)
    text_labels = labels[:, :tl]
    loss_text = optax.softmax_cross_entropy_with_integer_labels(text_logits, text_labels).mean()

    img_logits = logits[:, tl:, cfg.text_vocab_size :].astype(jnp.float32)
    img_labels = labels[:, tl:] - cfg.text_vocab_size
    loss_img = optax.softmax_cross_entropy_with_integer_labels(img_logits, img_labels).mean()

    if train_text:
        return (loss_text + img_weight * loss_img) / (img_weight + 1.0)
    return loss_img


# ----------------------------------------------------------- harness
@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    lr: float = 1e-5
    steps: int = 500
    grad_clip: float = 0.24
    img_weight: float = 7.0
    train_text: bool = False
    adam8bit: bool = False
    gradient_checkpointing: bool = False
    warmup_frac: float = 0.3  # OneCycle ramp fraction
    final_div_factor: float = 500.0


def make_optimizer(params: Dict, cfg: FinetuneConfig) -> optax.GradientTransformation:
    # optax's onecycle divides by int interval sizes that collapse to 0
    # below ~10 steps, yielding NaN lr — floor the horizon
    sched = optax.cosine_onecycle_schedule(
        transition_steps=max(cfg.steps, 10), peak_value=cfg.lr,
        pct_start=cfg.warmup_frac, final_div_factor=cfg.final_div_factor,
    )
    inner = quantized_adam(sched) if cfg.adam8bit else optax.adamw(sched)
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask(params))
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()}, labels),
    )


def init_finetune_state(params: Dict, cfg: FinetuneConfig) -> Dict:
    return {"params": params, "opt": make_optimizer(params, cfg).init(params),
            "step": jnp.zeros((), jnp.int32)}


@partial(jax.jit, static_argnames=("ar_cfg", "ft_cfg"))
def finetune_step(state: Dict, tokens: jax.Array, ar_cfg: ARConfig, ft_cfg: FinetuneConfig):
    """One jitted finetune step over (B, total_length) full-vocab
    token rows (text ++ image, image ids offset by text_vocab_size)."""
    loss, grads = jax.value_and_grad(finetune_loss)(
        state["params"], tokens, ar_cfg, ft_cfg.img_weight, ft_cfg.train_text,
        remat=ft_cfg.gradient_checkpointing,
    )
    opt = make_optimizer(state["params"], ft_cfg)
    updates, new_opt = opt.update(grads, state["opt"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    return {"params": new_params, "opt": new_opt, "step": state["step"] + 1}, loss


def save_checkpoint(path: str, state: Dict) -> None:
    """Flat .npz pytree dump (the `torch.save(state_dict)` role,
    `finetune.py:190-196`)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays = {jax.tree_util.keystr(p): np.asarray(l) for p, l in flat}
    np.savez(path, **arrays)


def restore_checkpoint(path: str, state: Dict) -> Dict:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(p)]).astype(l.dtype).reshape(l.shape) for p, l in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def finetune(
    params: Dict,
    batches: Iterator[np.ndarray],
    ar_cfg: ARConfig,
    ft_cfg: Optional[FinetuneConfig] = None,
    save_path: Optional[str] = None,
    verbose: bool = True,
):
    """Finetune loop (`finetune.py:115-196`): iterate (B, T) token
    batches for ft_cfg.steps steps; KeyboardInterrupt saves a partial
    checkpoint like the reference. Returns (params, losses)."""
    ft_cfg = ft_cfg or FinetuneConfig()
    state = init_finetune_state(params, ft_cfg)
    losses = []
    try:
        for tokens in batches:
            state, loss = finetune_step(state, jnp.asarray(tokens), ar_cfg, ft_cfg)
            losses.append(float(loss))
            if verbose and len(losses) % 50 == 0:
                print(f"step {len(losses)}: loss {losses[-1]:.4f}")
            if len(losses) >= ft_cfg.steps:
                break
    except KeyboardInterrupt:
        if save_path:
            save_checkpoint(save_path.replace(".npz", "_keyboardinterrupt.npz"), state)
        raise
    if save_path:
        save_checkpoint(save_path, state)
    return state["params"], losses
