"""Stable-Diffusion finetuning on an image/caption folder.

Rebuild of `maua/diffusion/finetune_stable.py:114-276` (Lightning
finetune of CompVis SD): here one jitted optax train step over the
eps-prediction objective, batch sharded on the mesh `data` axis.
"""

from __future__ import annotations

from functools import partial


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


def finetune(
    diffusion,
    images: np.ndarray,  # (N, H, W, 3) in [-1, 1]
    captions,
    n_steps: int = 1000,
    batch_size: int = 4,
    lr: float = 1e-5,
    key=None,
    verbose: bool = True,
):
    """Finetune the UNet of a StableDiffusion processor on
    (image, caption) pairs. Returns updated unet params."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ac = jnp.asarray(diffusion.alphas_cumprod, jnp.float32)
    opt = optax.adamw(lr)
    opt_state = opt.init(diffusion.unet_params)

    # precompute latents + text embeddings once
    latents = jnp.concatenate([
        diffusion.encode(jnp.asarray(images[i : i + batch_size])) for i in range(0, len(images), batch_size)
    ])
    cl = diffusion.text_cfg.context_length
    contexts = jnp.concatenate([
        encode_text(diffusion.text_params, jnp.asarray(tokenize(c, cl)), diffusion.text_cfg) for c in captions
    ])

    params = diffusion.unet_params
    n = latents.shape[0]
    for step in range(n_steps):
        key, k_b, k_s = jax.random.split(key, 3)
        idx = jax.random.randint(k_b, (min(batch_size, n),), 0, n)
        params, opt_state, loss = _train_step(
            params, opt_state, latents[idx], contexts[idx], k_s, ac, diffusion.unet_cfg, opt.update
        )
        if verbose and step % max(n_steps // 10, 1) == 0:
            print(f"finetune step {step}/{n_steps} loss {float(loss):.5f}")
    diffusion.unet_params = params
    return params
