"""Neural style transfer (Gatys-style optimization).

Rebuild of `maua/style/image.py:23-117` (`transfer`): parameterization
+ perceptor + optimizer loop with optional EMA decode, the whole
update step jitted (value_and_grad through decode -> perceptor).
"""

from __future__ import annotations


from typing import Dict, Optional

import jax
import jax.numpy as jnp

import optax

from ..loss import tv_loss
from ..ops.image import match_histogram, resample
from ..ops.io import load_images
from ..optimizers import load_optimizer
from ..parameterizations import load_parameterization
from ..perceptors import load_perceptor


def transfer(
    content_img,
    style_imgs,
    init_img=None,
    init_type: str = "content",
    match_hist: str = "avg",
    size: int = 512,
    parameterization: str = "rgb",
    perceptor: str = "kbc-vgg19",
    perceptor_kwargs: Optional[Dict] = None,
    optimizer: str = "lbfgs",
    lr: float = 0.5,
    optimizer_kwargs: Optional[Dict] = None,
    n_iters: int = 512,
    content_weight: float = 1.0,
    style_weight: float = 50.0,
    tv_weight: float = 100.0,
    style_scale: float = 1.0,
    ema: bool = False,
    verbose: bool = True,
    key=None,
):
    """(`maua/style/image.py:23-117`): returns the stylized image
    (1, H, W, 3) in [-1, 1]."""
    key = key if key is not None else jax.random.PRNGKey(0)
    content_img, style_list, init_img = load_images(content_img, style_imgs, init_img)
    if not isinstance(style_list, list):
        style_list = [style_list]

    content = resample(jnp.asarray(content_img) * 2 - 1, size)
    styles = [resample(jnp.asarray(im) * 2 - 1, int(size * style_scale)) for im in style_list]
    content = match_histogram(content, styles, mode=match_hist)

    if init_img is not None:
        init_tensor = jnp.asarray(init_img) * 2 - 1
    elif init_type == "content":
        init_tensor = content
    else:
        init_tensor = None

    h, w = content.shape[1], content.shape[2]
    pastiche = load_parameterization(parameterization)(h, w, tensor=init_tensor, ema=ema, key=key)

    percept = load_perceptor(perceptor)(**(perceptor_kwargs or {}))
    # content/style targets: content features of `content`, gram
    # matrices of each style image (averaged)
    from ..loss import gram_matrix

    content_feats = percept.get_features(content)
    content_targets = [content_feats[i] for i in percept.content_layers]
    style_targets = None
    for s in styles:
        feats = percept.get_features(s)
        grams = [gram_matrix(feats[i]) for i in percept.style_layers]
        if style_targets is None:
            style_targets = [g / len(styles) for g in grams]
        else:
            style_targets = [t + g / len(styles) for t, g in zip(style_targets, grams)]

    opt, niter = load_optimizer(optimizer, lr, optimizer_kwargs, n_iters)
    params = pastiche.params()
    opt_state = opt.init(params)

    from ..loss import scaled_mse_loss

    def loss_fn(p):
        pastiche.set_params(p)
        img = pastiche.decode()
        feats = percept.get_features(img)
        loss = 0.0
        for i, t in zip(percept.content_layers, content_targets):
            loss = loss + content_weight * scaled_mse_loss(feats[i], t)
        for i, t in zip(percept.style_layers, style_targets):
            loss = loss + style_weight * scaled_mse_loss(gram_matrix(feats[i]), t)
        if tv_weight > 0:
            loss = loss + tv_weight * tv_loss(img)
        return loss

    value_and_grad = jax.value_and_grad(loss_fn)
    is_lbfgs = "lbfgs" in optimizer.lower()

    if is_lbfgs:
        vg_from_state = optax.value_and_grad_from_state(loss_fn)

        @jax.jit
        def step(params, opt_state):
            value, grad = vg_from_state(params, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, params, value=value, grad=grad, value_fn=loss_fn
            )
            params = optax.apply_updates(params, updates)
            return params, opt_state, value
    else:

        @jax.jit
        def step(params, opt_state):
            value, grad = value_and_grad(params)
            updates, opt_state = opt.update(grad, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, value

    for it in range(niter):
        params, opt_state, value = step(params, opt_state)
        pastiche.set_params(params)
        pastiche.update_ema()
        if verbose and (it % max(niter // 10, 1) == 0):
            print(f"iter {it}/{niter} loss {float(value):.4f}")

    pastiche.set_params(params)
    return pastiche.decode_average()
