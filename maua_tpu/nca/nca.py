"""Texture neural cellular automata, functional JAX.

Rebuild of `maua/nca/train.py` (sobel/laplacian perception :158-170,
CA update rule :172-189, VGG-gram style-matched training :196+) and
`maua/nca/generate.py:1-40` rollout. The rollout is a `lax.scan` and
the training step is one jitted update with gradient flow through the
unrolled CA.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_IDENT = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 0]], np.float32)
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_LAP = np.array([[1, 2, 1], [2, -12, 2], [1, 2, 1]], np.float32)

CA_PARAMS_INIT = dict(chn=12, hidden_n=96)


def perception(x: jax.Array) -> jax.Array:
    """Per-channel [ident, sobel_x, sobel_y, laplacian] features with
    circular padding (`nca/train.py:158-170`).
    x: (B, H, W, C) -> (B, H, W, 4C)."""
    filters = np.stack([_IDENT, _SOBEL_X, _SOBEL_X.T, _LAP])  # (4, 3, 3)
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
    # depthwise, channel multiplier 4: output channel g*4+f applies
    # filter f to input channel g (matches the reference's reshape
    # ordering, train.py:162-166)
    kern = np.zeros((3, 3, 1, 4 * c), np.float32)
    for g in range(c):
        for f in range(4):
            kern[:, :, 0, g * 4 + f] = filters[f]
    y = jax.lax.conv_general_dilated(
        xp, jnp.asarray(kern, x.dtype), (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y


def init_params(key, chn: int = 12, hidden_n: int = 96) -> Dict:
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(chn * 4)
    return {
        "w1": jax.random.normal(k1, (1, 1, chn * 4, hidden_n)) * scale,
        # non-zero bias (torch Conv2d default) keeps the all-zero seed
        # state trainable
        "b1": jax.random.uniform(k2, (hidden_n,), minval=-scale, maxval=scale),
        "w2": jnp.zeros((1, 1, hidden_n, chn)),  # zero-init like the reference
    }


def ca_step(params: Dict, x: jax.Array, key, update_rate: float = 0.5) -> jax.Array:
    """One CA update (`nca/train.py:178-185`)."""
    y = perception(x)
    conv = lambda v, w: jax.lax.conv_general_dilated(
        v, w.astype(v.dtype), (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = jax.nn.relu(conv(y, params["w1"]) + params["b1"])
    y = conv(y, params["w2"])
    b, h, w, c = y.shape
    update_mask = jnp.floor(jax.random.uniform(key, (b, h, w, 1)) + update_rate)
    return x + y * update_mask


def seed(n: int, chn: int = 12, sz: int = 128) -> jax.Array:
    """(`nca/train.py:187-189`)"""
    return jnp.zeros((n, sz, sz, chn))


def to_rgb(x: jax.Array) -> jax.Array:
    """(`nca/train.py:192-194`)"""
    return x[..., :3]


def rollout(params: Dict, x: jax.Array, n_steps: int, key, update_rate: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Evolve n_steps via lax.scan; returns (final state, rgb frames)."""

    def body(carry, k):
        x = ca_step(params, carry, k, update_rate)
        return x, to_rgb(x)

    keys = jax.random.split(key, n_steps)
    return jax.lax.scan(body, x, keys)


def train_nca(
    style_img: jax.Array,  # (1, H, W, 3) in [-1, 1]
    n_steps: int = 2000,
    rollout_steps: Tuple[int, int] = (32, 64),
    batch: int = 4,
    size: int = 128,
    lr: float = 2e-3,
    chn: int = 12,
    hidden_n: int = 96,
    pool_size: int = 256,
    key=None,
    verbose: bool = True,
) -> Dict:
    """VGG-gram style-matched NCA training (`nca/train.py:196+`) with a
    sample pool."""
    import optax

    from ..loss import gram_matrix, scaled_mse_loss
    from ..perceptors.vgg import VGGPerceptor

    key = key if key is not None else jax.random.PRNGKey(0)
    percept = VGGPerceptor(arch="vgg16")
    feats = percept.get_features(style_img)
    target_grams = [gram_matrix(feats[i]) for i in percept.style_layers]

    params = init_params(key, chn, hidden_n)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    pool = jnp.tile(seed(1, chn, size), (pool_size, 1, 1, 1))

    def loss_fn(params, x0, k, n_roll):
        x, _ = rollout(params, x0, n_roll, k)
        img = jnp.clip(to_rgb(x), -1, 1)
        feats = percept.get_features(img)
        loss = sum(scaled_mse_loss(gram_matrix(feats[i]), jnp.tile(t, (img.shape[0], 1, 1)))
                   for i, t in zip(percept.style_layers, target_grams))
        return loss, x

    @partial(jax.jit, static_argnames=("n_roll",))
    def step(params, opt_state, x0, k, n_roll):
        (loss, x), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x0, k, n_roll)
        # normalize gradients per-leaf (reference's grad normalization)
        grads = jax.tree_util.tree_map(lambda g: g / (jnp.linalg.norm(g.reshape(-1)) + 1e-8), grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, x

    for i in range(n_steps):
        key, k1, k2, k3 = jax.random.split(key, 4)
        idx = jax.random.choice(k1, pool_size, (batch,), replace=False)
        x0 = pool[idx]
        # periodically reset one sample to the seed state
        x0 = x0.at[0].set(seed(1, chn, size)[0])
        n_roll = int(jax.random.randint(k2, (), rollout_steps[0], rollout_steps[1]))
        params, opt_state, loss, x = step(params, opt_state, x0, k3, n_roll)
        pool = pool.at[idx].set(x)
        if verbose and i % max(n_steps // 10, 1) == 0:
            print(f"nca step {i}/{n_steps} loss {float(loss):.4f}")
    return params


def generate_video(params: Dict, output_file: str, size: int = 256, num_frames: int = 600, chn: int = 12,
                   key=None) -> str:
    """NCA evolution video (`nca/generate.py:1-40`)."""
    from ..ops.video import VideoWriter

    key = key if key is not None else jax.random.PRNGKey(0)
    x = seed(1, chn, size)
    with VideoWriter(output_file, (size, size), fps=24, value_range=(-1, 1)) as vid:
        for k in range(num_frames):
            step_n = min(2 ** (k // 30), 32)
            key, sub = jax.random.split(key)
            x, _ = rollout(params, x, step_n, sub)
            vid.write(np.asarray(jnp.clip(to_rgb(x[0]), -1, 1)))
    return output_file


def main(args=None):
    """CLI (`python -m maua.nca` role; `nca/train.py:254`,
    `nca/generate.py:1-40`): train a texture NCA on a style image and
    render its evolution, or render from a saved params file."""
    import argparse
    import pickle
    from pathlib import Path

    import numpy as np

    from ..ops.io import load_image

    parser = argparse.ArgumentParser(description="texture neural cellular automata")
    parser.add_argument("--style", type=str, default=None, help="style image to train on")
    parser.add_argument("--params", type=str, default=None, help="load trained params instead of training")
    parser.add_argument("--n_steps", default=2000, type=int)
    parser.add_argument("--train_size", default=128, type=int)
    parser.add_argument("--size", default=256, type=int, help="render resolution")
    parser.add_argument("--num_frames", default=600, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)

    Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    if args.params is not None:
        with open(args.params, "rb") as f:
            params = pickle.load(f)
        stem = Path(args.params).stem
    elif args.style is not None:
        img = jnp.asarray(load_image(args.style)) * 2.0 - 1.0
        params = train_nca(img, n_steps=args.n_steps, size=args.train_size,
                           key=jax.random.PRNGKey(args.seed))
        stem = Path(args.style).stem
        with open(f"{args.out_dir}/{stem}_nca.pkl", "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
    else:
        parser.error("pass --style (train) or --params (render)")

    out_file = generate_video(params, f"{args.out_dir}/{stem}_nca.mp4", size=args.size,
                              num_frames=args.num_frames, key=jax.random.PRNGKey(args.seed))
    print(out_file)
    return 0


if __name__ == "__main__":
    main()
