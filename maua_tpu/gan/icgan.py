"""Instance-conditioned GAN generation + CLIP-guided latent search.

Rebuild of `maua/GAN/icgan/` (load_icgan `generate.py:90`, icgan_clip
`guided.py:56`): generation conditioned on instance feature vectors
(feature-extractor embeddings of a conditioning image) and
CLIP-guided optimization of (z, instance feature) toward a text
prompt. The conditional generator is this package's StyleGAN2 with
c_dim > 0 (class/instance conditioning through the mapping network).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

import optax

from . import stylegan2 as sg2


def load_icgan(
    model_file: Optional[str] = None,
    instance_dim: int = 256,
    resolution: int = 128,
    cfg: Optional[sg2.SG2Config] = None,
    backbone: str = "stylegan2",
    biggan_cfg=None,
    key=None,
):
    """Build/load an instance-conditioned generator
    (`icgan/generate.py:90`).

    backbone="biggan" gives the reference's actual IC-GAN backbone
    (`gan/biggan.py` — BigGAN with hierarchical z + ccbn conditioned on
    embedded SwAV features); real ic_gan checkpoints convert via
    `biggan.params_from_torch` with spectral norm folded. The
    StyleGAN2 c_dim path remains as this package's own
    instance-conditioned variant."""
    if backbone == "biggan":
        from . import biggan

        bcfg = biggan_cfg or biggan.BigGANConfig(resolution=resolution)
        if model_file:
            import torch

            sd = torch.load(model_file, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            params = biggan.params_from_torch({k: v.numpy() for k, v in sd.items()}, bcfg)
        else:
            params = biggan.init_params(key if key is not None else jax.random.PRNGKey(0), bcfg)
        return BigGANWrapper(params, bcfg)
    if cfg is None:
        cfg = sg2.SG2Config(img_resolution=resolution, c_dim=instance_dim, num_fp16_res=0)
    if model_file:
        from .load import load_network

        params, cfg = load_network(model_file)
        gen = sg2.Generator(cfg, params=params)
    else:
        gen = sg2.Generator(cfg, key=key or jax.random.PRNGKey(0))
    return gen


class BigGANWrapper:
    """Minimal generator facade for the BigGAN backbone."""

    def __init__(self, params, cfg):
        from . import biggan

        self.params, self.cfg = params, cfg
        self._fwd = jax.jit(lambda p, z, f: biggan.generator(p, z, cfg, features=f))

    def __call__(self, z, features=None):
        return self._fwd(self.params, z, features)


def instance_features(images, extractor: Optional[Callable] = None, dim: int = 256) -> jax.Array:
    """Feature-extractor embeddings of conditioning images. With no
    extractor given, uses the SwAV ResNet-50 (`gan/extractors.py`) —
    the reference's actual IC-GAN instance-feature tower — when
    dim == 2048, else the small test extractor."""
    if extractor is None:
        if dim == 2048:
            from .extractors import load_swav

            extractor = load_swav()
        else:
            from .metrics import ResNetExtractor

            extractor = ResNetExtractor(feat_dim=dim)
    feats = extractor(jnp.asarray(images))
    return feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)


def generate(gen: sg2.Generator, instance_feats: jax.Array, n_per_instance: int = 4,
             truncation: float = 1.0, key=None) -> jax.Array:
    """Sample images conditioned on each instance feature."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k = instance_feats.shape[0]
    z = jax.random.normal(key, (k * n_per_instance, gen.cfg.z_dim))
    c = jnp.repeat(instance_feats, n_per_instance, axis=0)
    return sg2.generator(gen.params, z, gen.cfg, c=c, truncation_psi=truncation)


def icgan_clip(
    gen: sg2.Generator,
    text: str,
    perceptor=None,
    n_steps: int = 100,
    lr: float = 0.05,
    batch: int = 4,
    key=None,
    verbose: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """CLIP-guided optimization of (z, instance feature)
    (`icgan/guided.py:56`): minimize spherical distance between the
    generated images' CLIP embeddings and the prompt embedding.

    Returns (images, optimized latents)."""
    from ..loss import spherical_dist_loss

    if perceptor is None:
        from ..perceptors.clip import CLIPPerceptor

        perceptor = CLIPPerceptor()
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    txt_emb = perceptor.encode_text([text])

    params = {
        "z": jax.random.normal(k1, (batch, gen.cfg.z_dim)),
        "c": jax.random.normal(k2, (batch, gen.cfg.c_dim)) * 0.1 if gen.cfg.c_dim > 0 else None,
    }
    params = {k: v for k, v in params.items() if v is not None}

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        img = sg2.generator(gen.params, p["z"], gen.cfg, c=p.get("c"))
        size = perceptor.image_size
        img = jax.image.resize(img, (img.shape[0], size, size, 3), "bilinear")
        emb = perceptor.encode_image(img)
        return jnp.mean(spherical_dist_loss(emb, txt_emb)) + 1e-3 * jnp.mean(jnp.square(p["z"]))

    @jax.jit
    def step(p, s):
        v, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, v

    for i in range(n_steps):
        params, opt_state, v = step(params, opt_state)
        if verbose and i % max(n_steps // 5, 1) == 0:
            print(f"icgan_clip step {i}/{n_steps} loss {float(v):.4f}")

    imgs = sg2.generator(gen.params, params["z"], gen.cfg, c=params.get("c"))
    return imgs, params
