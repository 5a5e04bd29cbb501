"""Stable-Diffusion finetuning on an image/caption folder.

Rebuild of `maua/diffusion/finetune_stable.py:114-276` (Lightning
finetune of CompVis SD): one jitted optax train step over the
eps-prediction objective (batch shardable on the mesh `data` axis),
plus the Lightning-side loop machinery the reference gets for free —
EMA weights (the WeightsEMA role), orbax checkpoint/resume
(`save_every`, `trainer.save_checkpoint` :233-275), and a validation
image hook (`ImageLogger.log_images` :52-65, `log_every` :181).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..text.clip_text import encode_text, tokenize
from .models import unet as unet_mod
from .models import vae as vae_mod
from .samplers import q_sample


@partial(jax.jit, static_argnames=("unet_cfg", "opt_update"))
def _train_step(unet_params, opt_state, latents, context, key, alphas_cumprod, unet_cfg, opt_update):
    k_t, k_n = jax.random.split(key)
    b = latents.shape[0]
    t = jax.random.randint(k_t, (b,), 0, alphas_cumprod.shape[0])
    noise = jax.random.normal(k_n, latents.shape)
    x_t = q_sample(latents, alphas_cumprod[t], noise)

    def loss_fn(p):
        eps = unet_mod.forward(p, x_t, t.astype(jnp.float32), unet_cfg, context)
        return jnp.mean(jnp.square(eps - noise))

    loss, grads = jax.value_and_grad(loss_fn)(unet_params)
    updates, opt_state = opt_update(grads, opt_state, unet_params)
    unet_params = optax.apply_updates(unet_params, updates)
    return unet_params, opt_state, loss


def save_checkpoint(path: str, state) -> None:
    """Orbax pytree checkpoint (`trainer.save_checkpoint` role)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(like))


def finetune(
    diffusion,
    images: np.ndarray,  # (N, H, W, 3) in [-1, 1]
    captions,
    n_steps: int = 1000,
    batch_size: int = 4,
    lr: float = 1e-5,
    ema_decay: float = 0.999,
    save_every: int = 0,  # 0 = only at the end (`finetune_stable.py:182` save_every)
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    sample_every: int = 0,  # validation image hook cadence (`:181` log_every)
    sample_hook: Optional[Callable] = None,  # fn(step, images (B,H,W,3) [-1,1])
    sample_text: Optional[str] = None,
    key=None,
    verbose: bool = True,
):
    """Finetune the UNet of a StableDiffusion processor on
    (image, caption) pairs with EMA, orbax checkpoint/resume, and a
    validation sample hook. Returns (params, ema_params); the
    processor is left holding the EMA weights like the reference's
    use_ema inference path."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ac = jnp.asarray(diffusion.alphas_cumprod, jnp.float32)
    opt = optax.adamw(lr)

    state = {
        "params": diffusion.unet_params,
        "ema": diffusion.unet_params,
        "opt": opt.init(diffusion.unet_params),
        "step": jnp.zeros((), jnp.int32),
    }
    ckpt_path = os.path.join(checkpoint_dir, "finetune_last") if checkpoint_dir else None
    if resume and ckpt_path and os.path.exists(ckpt_path):
        state = load_checkpoint(ckpt_path, state)
        if verbose:
            print(f"resumed finetune at step {int(state['step'])}")

    # precompute latents + text embeddings once
    latents = jnp.concatenate([
        diffusion.encode(jnp.asarray(images[i : i + batch_size])) for i in range(0, len(images), batch_size)
    ])
    cl = diffusion.text_cfg.context_length
    contexts = jnp.concatenate([
        encode_text(diffusion.text_params, jnp.asarray(tokenize(c, cl)), diffusion.text_cfg) for c in captions
    ])

    ema_update = jax.jit(
        lambda ema, p: jax.tree_util.tree_map(lambda e, q: ema_decay * e + (1 - ema_decay) * q, ema, p)
    )

    def maybe_sample(step):
        if sample_hook is None or sample_every <= 0 or step % sample_every:
            return
        prev = diffusion.unet_params
        diffusion.unet_params = state["ema"]
        from ..prompt import TextPrompt

        prompts = [TextPrompt(sample_text or (captions[0] if len(captions) else ""))]
        imgs = diffusion.forward(
            jnp.zeros((1, diffusion.image_size, diffusion.image_size, 3)), prompts, t_start=0.0, verbose=False,
        )
        diffusion.unet_params = prev
        sample_hook(step, np.asarray(imgs))

    n = latents.shape[0]
    start = int(state["step"])
    for step in range(start, n_steps):
        key, k_b, k_s = jax.random.split(key, 3)
        idx = jax.random.randint(k_b, (min(batch_size, n),), 0, n)
        params, opt_state, loss = _train_step(
            state["params"], state["opt"], latents[idx], contexts[idx], k_s, ac,
            diffusion.unet_cfg, opt.update,
        )
        state = {
            "params": params,
            "ema": ema_update(state["ema"], params),
            "opt": opt_state,
            "step": jnp.asarray(step + 1, jnp.int32),
        }
        if verbose and step % max(n_steps // 10, 1) == 0:
            print(f"finetune step {step}/{n_steps} loss {float(loss):.5f}")
        if ckpt_path and save_every > 0 and (step + 1) % save_every == 0:
            save_checkpoint(ckpt_path, state)
        maybe_sample(step + 1)

    if ckpt_path:
        save_checkpoint(ckpt_path, state)
    diffusion.unet_params = state["ema"]
    return state["params"], state["ema"]
