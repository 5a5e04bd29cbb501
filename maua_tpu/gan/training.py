"""GAN training: losses, regularizers, fused pjit-able train step.

TPU-native rebuild of the reference training harness core
(`maua/GAN/training/trainer.py:127-306` LightningGAN alternating G/D
`training_step` :206-257, WeightsEMA callback :23-124; losses:
softplus `training/losses/softplus.py:6-24`, BCE
`losses/cross_entropy.py:6-36`, lazy R1 `losses/r1_penalty.py:7-29`,
path-length `losses/path_length_regularization.py:8-34`).

Design: the whole alternating step (D update + G update + lazy regs +
EMA) is ONE jitted function over a sharded TrainState. Data parallel
via a batch sharded on the mesh `data` axis; tensor parallel via
param NamedShardings — XLA inserts the psum/all-gather collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from . import stylegan2 as sg2
from .discriminator import D2Config, discriminator, init_params as init_d_params


# ------------------------------------------------- model family seam
@dataclasses.dataclass(frozen=True)
class GenericModel:
    """Config for the non-StyleGAN families in the plugin registry
    (`maua/GAN/training/models/`): the reference's reflection system
    lets any G pair with any D; here one hashable config names the
    family and the step/fit functions dispatch on it."""

    family: str  # 'dcgan' | 'hypermixer' | 'involution' | 'steerable'
    resolution: int = 64
    z_dim: int = 100
    base: int = 64  # generator width (`--ngf`)
    d_base: int = 0  # discriminator width (`--ndf`); 0 = same as base
    dim: int = 0  # hypermixer token width (`--w_dim`); 0 = family default


def _generic_init(key, m: GenericModel):
    from . import models_experimental as me

    kg, kd = jax.random.split(key)
    depth = max((m.resolution // 4).bit_length() - 1, 1) if m.family == "steerable" else None
    d_base = m.d_base or m.base
    if m.family == "dcgan":
        return me.init_dcgan_g(kg, m.z_dim, m.base, m.resolution), me.init_dcgan_d(kd, d_base, m.resolution)
    if m.family == "hypermixer":
        g_kw = {"dim": m.dim} if m.dim else {}
        return (me.init_hypermixer_g(kg, z_dim=m.z_dim, resolution=m.resolution, **g_kw),
                me.init_dcgan_d(kd, d_base, m.resolution))
    if m.family == "involution":
        return me.init_involution_g(kg, m.z_dim, m.base, m.resolution), me.init_involution_d(kd, d_base, m.resolution)
    if m.family == "steerable":
        return (me.init_steerable_g(kg, m.z_dim, m.base, m.resolution, depth=depth),
                me.init_steerable_d(kd, d_base, m.resolution, depth=depth))
    raise ValueError(f"unknown model family {m.family!r}")


def generate(g_params, z: jax.Array, g_cfg, noise_key=None) -> jax.Array:
    """Model-agnostic z -> image, used by the train step and eval."""
    if isinstance(g_cfg, sg2.SG2Config):
        mode = "random" if noise_key is not None else "const"
        return sg2.generator(g_params, z, g_cfg, noise_mode=mode, noise_key=noise_key)
    from . import models_experimental as me

    return {"dcgan": me.dcgan_g, "hypermixer": me.hypermixer_g,
            "involution": me.involution_g, "steerable": me.steerable_g}[g_cfg.family](g_params, z)


def disc_forward(d_params, img: jax.Array, d_cfg) -> jax.Array:
    if isinstance(d_cfg, D2Config):
        return discriminator(d_params, img, d_cfg)
    from . import models_experimental as me

    d_fn = me.involution_d if d_cfg.family == "involution" else (
        me.steerable_d if d_cfg.family == "steerable" else me.dcgan_d)
    return d_fn(d_params, img)


# ------------------------------------------------------------- losses
def g_logistic_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating softplus G loss (`losses/softplus.py:6-24`)."""
    return jnp.mean(jax.nn.softplus(-fake_logits))


def d_logistic_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Logistic D loss (`losses/softplus.py`)."""
    return jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(jax.nn.softplus(-real_logits))


def g_bce_loss(fake_logits: jax.Array) -> jax.Array:
    """(`losses/cross_entropy.py:6-36`)"""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(fake_logits, jnp.ones_like(fake_logits)))


def d_bce_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(real_logits, jnp.ones_like(real_logits))
    ) + jnp.mean(optax.sigmoid_binary_cross_entropy(fake_logits, jnp.zeros_like(fake_logits)))


def r1_penalty(d_params, real: jax.Array, d_cfg) -> jax.Array:
    """R1 gradient penalty (`losses/r1_penalty.py:7-29`): E[|grad D(x)|^2]."""

    def d_sum(img):
        return jnp.sum(disc_forward(d_params, img, d_cfg))

    grads = jax.grad(d_sum)(real)
    return jnp.mean(jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=(1, 2, 3)))


def path_length_penalty(
    g_params, ws: jax.Array, key, g_cfg: sg2.SG2Config, pl_mean: jax.Array,
    decay: float = 0.01, batch_shrink: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Path-length regularization
    (`losses/path_length_regularization.py:8-34`): penalize deviation
    of |J_w^T y| from its running mean. `batch_shrink` evaluates the
    penalty on batch//shrink samples (the reference's
    `--pl_batch_shrink` cost knob)."""
    if batch_shrink > 1:
        ws = ws[: max(ws.shape[0] // batch_shrink, 1)]

    def synth(ws_in):
        img = sg2.synthesis(g_params, ws_in, g_cfg, noise_mode="none")
        noise = jax.random.normal(key, img.shape) / jnp.sqrt(img.shape[1] * img.shape[2])
        return jnp.sum(img * noise)

    grads = jax.grad(synth)(ws)
    lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grads), axis=2), axis=1) + 1e-8)
    new_pl_mean = pl_mean + decay * (jnp.mean(lengths) - pl_mean)
    penalty = jnp.mean(jnp.square(lengths - new_pl_mean))
    return penalty, new_pl_mean


# ------------------------------------------------------ initial blur
def initial_blur(img: jax.Array, step: jax.Array, batch_size: int,
                 init_sigma: float, fade_kimg: float) -> jax.Array:
    """StyleGAN-XL-style fade-out blur on D inputs early in training
    (`training/augmentation/blur.py:24-35`): sigma ramps linearly from
    init_sigma to 0 over fade_kimg*batch/32 thousand images. Traced
    sigma with a STATIC kernel size (3*init_sigma, odd) keeps the
    shape fixed under jit; at sigma ~ 0 the kernel collapses to a
    delta, so no data-dependent branch is needed."""
    size = int(3 * init_sigma)
    size = size + 1 - size % 2
    fade = fade_kimg * batch_size / 32.0
    sigma = jnp.maximum(1.0 - (step.astype(jnp.float32) * batch_size) / (fade * 1e3), 0.0) * init_sigma
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    k1d = jnp.exp(-0.5 * jnp.square(x) / (jnp.square(sigma) + 1e-8))
    k1d = k1d / jnp.sum(k1d)
    c = img.shape[-1]
    kh = jnp.tile(k1d[:, None, None, None], (1, 1, 1, c))  # depthwise (K,1,1,C)
    kw = jnp.tile(k1d[None, :, None, None], (1, 1, 1, c))
    pad = size // 2
    dn = ("NHWC", "HWIO", "NHWC")
    img = jax.lax.conv_general_dilated(img, kh, (1, 1), ((pad, pad), (0, 0)),
                                       dimension_numbers=dn, feature_group_count=c)
    return jax.lax.conv_general_dilated(img, kw, (1, 1), ((0, 0), (pad, pad)),
                                        dimension_numbers=dn, feature_group_count=c)


# -------------------------------------------------------------- state
@dataclasses.dataclass(frozen=True)
class TrainConfig:
    g_lr: float = 2.5e-3
    d_lr: float = 2.5e-3
    beta1: float = 0.0
    beta2: float = 0.99
    r1_gamma: float = 10.0
    r1_interval: int = 16
    pl_weight: float = 2.0
    pl_interval: int = 4
    pl_decay: float = 0.01  # running-mean EMA (`path_length_regularization.py --pl_decay`)
    pl_batch_shrink: int = 2  # PL on batch//shrink samples (`--pl_batch_shrink`)
    n_d_steps: int = 1  # D updates per G update (`__main__.py --n_D_steps`)
    ema_beta: float = 0.999
    loss: str = "logistic"  # 'logistic' | 'bce'
    latent: str = "normal"  # latent distribution (`training/latent_spaces/`)
    blur_init_sigma: float = 0.0  # 0 disables the InitialBlur fade
    blur_fade_kimg: float = 200.0


def _latent_sampler(kind: str):
    """Latent-space plugin (`maua/GAN/training/latent_spaces/`): the
    reference ships `normal`; `uniform` is an extra here."""
    if kind == "uniform":
        return lambda k, shape: jax.random.uniform(k, shape, minval=-1.0, maxval=1.0) * jnp.sqrt(3.0)
    return jax.random.normal


def make_optimizers(cfg: TrainConfig):
    g_opt = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    d_opt = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    return g_opt, d_opt


def init_train_state(key, g_cfg, d_cfg, t_cfg: TrainConfig) -> Dict:
    kg, kd = jax.random.split(key)
    # G and D initialize independently so families can mix
    # (`__main__.py -G/-D`: any generator with any discriminator)
    g_params = (sg2.init_params(kg, g_cfg) if isinstance(g_cfg, sg2.SG2Config)
                else _generic_init(kg, g_cfg)[0])
    d_params = (init_d_params(kd, d_cfg) if isinstance(d_cfg, D2Config)
                else _generic_init(kd, d_cfg)[1])
    g_opt, d_opt = make_optimizers(t_cfg)
    return {
        "g_params": g_params,
        "d_params": d_params,
        "g_ema": jax.tree_util.tree_map(jnp.copy, g_params),
        "g_opt": g_opt.init(g_params),
        "d_opt": d_opt.init(d_params),
        "pl_mean": jnp.zeros((), jnp.float32),
        "step": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------- train step
@partial(jax.jit, static_argnames=("g_cfg", "d_cfg", "t_cfg"))
def train_step(
    state: Dict,
    real: jax.Array,  # (B, H, W, C) in [-1, 1]
    key: jax.Array,
    g_cfg,  # sg2.SG2Config | GenericModel
    d_cfg,  # D2Config | GenericModel
    t_cfg: TrainConfig,
) -> Tuple[Dict, Dict]:
    """One alternating D+G update with lazy R1/path-length regs and EMA
    (`trainer.py:206-257` semantics, fused into one compiled step).
    Path-length regularization only applies to the StyleGAN family
    (it needs the mapping/synthesis split); generic families get
    D+G+R1+EMA."""
    is_sg2 = isinstance(g_cfg, sg2.SG2Config)
    g_opt, d_opt = make_optimizers(t_cfg)
    kz_d, kz_g, kn_d, kn_g, kpl = jax.random.split(key, 5)
    batch = real.shape[0]

    g_loss_fn = g_logistic_loss if t_cfg.loss == "logistic" else g_bce_loss
    d_loss_fn = d_logistic_loss if t_cfg.loss == "logistic" else d_bce_loss

    if t_cfg.blur_init_sigma > 0:
        maybe_blur = lambda img: initial_blur(img, state["step"], batch,
                                              t_cfg.blur_init_sigma, t_cfg.blur_fade_kimg)
    else:
        maybe_blur = lambda img: img
    real = maybe_blur(real)

    sample_z = _latent_sampler(t_cfg.latent)

    # ---- D update(s): n_d_steps per G step (`__main__.py --n_D_steps`)
    def d_loss(d_params, kz, kn):
        z = sample_z(kz, (batch, g_cfg.z_dim))
        fake = maybe_blur(generate(state["g_params"], z, g_cfg, noise_key=kn))
        fake_logits = disc_forward(d_params, jax.lax.stop_gradient(fake), d_cfg)
        real_logits = disc_forward(d_params, real, d_cfg)
        loss = d_loss_fn(real_logits, fake_logits)
        do_r1 = (state["step"] % t_cfg.r1_interval) == 0
        r1 = jax.lax.cond(
            do_r1,
            lambda: r1_penalty(d_params, real, d_cfg),
            lambda: jnp.zeros((), jnp.float32),
        )
        loss = loss + (t_cfg.r1_gamma / 2) * r1 * t_cfg.r1_interval
        return loss, (jnp.mean(real_logits), jnp.mean(fake_logits), r1)

    d_params, d_opt_state = state["d_params"], state["d_opt"]
    for i in range(max(t_cfg.n_d_steps, 1)):
        (d_l, (rl, fl, r1)), d_grads = jax.value_and_grad(d_loss, has_aux=True)(
            d_params, jax.random.fold_in(kz_d, i), jax.random.fold_in(kn_d, i)
        )
        d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

    # ---- G update
    def g_loss(g_params):
        z = sample_z(kz_g, (batch, g_cfg.z_dim))
        if is_sg2:
            ws = sg2.mapping(g_params, z, g_cfg)
            fake = sg2.synthesis(g_params, ws, g_cfg, noise_mode="random", noise_key=kn_g)
        else:
            fake = generate(g_params, z, g_cfg)
        fake_logits = disc_forward(d_params, maybe_blur(fake), d_cfg)
        loss = g_loss_fn(fake_logits)
        if not is_sg2:
            return loss, state["pl_mean"]
        do_pl = (state["step"] % t_cfg.pl_interval) == 0
        pl, new_pl_mean = jax.lax.cond(
            do_pl,
            lambda: path_length_penalty(g_params, ws, kpl, g_cfg, state["pl_mean"],
                                        decay=t_cfg.pl_decay, batch_shrink=t_cfg.pl_batch_shrink),
            lambda: (jnp.zeros(()), state["pl_mean"]),
        )
        loss = loss + t_cfg.pl_weight * pl * t_cfg.pl_interval
        return loss, new_pl_mean

    (g_l, pl_mean), g_grads = jax.value_and_grad(g_loss, has_aux=True)(state["g_params"])
    g_updates, g_opt_state = g_opt.update(g_grads, state["g_opt"], state["g_params"])
    g_params = optax.apply_updates(state["g_params"], g_updates)

    # ---- EMA (WeightsEMA, trainer.py:23-124)
    g_ema = jax.tree_util.tree_map(
        lambda e, p: e * t_cfg.ema_beta + p * (1.0 - t_cfg.ema_beta), state["g_ema"], g_params
    )

    new_state = {
        "g_params": g_params,
        "d_params": d_params,
        "g_ema": g_ema,
        "g_opt": g_opt_state,
        "d_opt": d_opt_state,
        "pl_mean": pl_mean,
        "step": state["step"] + 1,
    }
    metrics = {"d_loss": d_l, "g_loss": g_l, "real_logits": rl, "fake_logits": fl, "r1": r1}
    return new_state, metrics
