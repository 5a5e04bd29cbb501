"""Pluggable guidance-gradient modules for diffusion.

Rebuild of `maua/grad.py` (GradModule :15-24, differentiable_histogram
:27-45, ColorMatchGrads :48-72, CLIPGrads :96-165, VGGGrads :75-93,
LPIPSGrads :179-196, LossGrads :168-176, LatentSSIMGrads :199-217).
Each module exposes `set_targets(prompts)` and `__call__(img, t) ->
d(loss)/d(img)`; gradients come from jax.grad instead of
torch.enable_grad blocks.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


from .loss import range_loss, spherical_dist_loss, tv_loss
from .prompt import ContentPrompt, ImagePrompt, StylePrompt, TextPrompt


class GradModule:
    """(`maua/grad.py:15-24`)"""

    scale: float = 1.0

    def __init__(self, scale: float = 1.0):
        self.scale = scale

    def set_targets(self, prompts: Sequence):
        pass

    def __call__(self, img: jax.Array, t) -> jax.Array:
        raise NotImplementedError


def differentiable_histogram(x: jax.Array, bins: int = 255, min: float = 0.0, max: float = 1.0) -> jax.Array:
    """Soft histogram via triangular kernels (`maua/grad.py:27-45`).
    x: (B, H, W, C) -> (B, C, bins)."""
    delta = (max - min) / bins
    centers = min + delta * (jnp.arange(bins, dtype=jnp.float32) + 0.5)
    xf = x.reshape(x.shape[0], -1, x.shape[-1])  # (B, N, C)
    diff = 1.0 - jnp.abs(xf[:, :, :, None] - centers[None, None, None, :]) / delta
    weights = jnp.clip(diff, 0.0, 1.0)
    return weights.sum(axis=1).swapaxes(1, 2)


class ColorMatchGrads(GradModule):
    """Match color histograms to a style image
    (`maua/grad.py:48-72`)."""

    def __init__(self, scale: float = 1.0, bins: int = 64):
        super().__init__(scale)
        self.bins = bins
        self.target_hist = None

    def set_targets(self, prompts):
        for p in prompts:
            if isinstance(p, (StylePrompt, ImagePrompt)) and not isinstance(p, ContentPrompt):
                img = jnp.asarray(p.img)
                self.target_hist = differentiable_histogram((img + 1) / 2, self.bins)

    def __call__(self, img, t):
        if self.target_hist is None:
            return jnp.zeros_like(img)

        def loss(im):
            hist = differentiable_histogram((im + 1) / 2, self.bins)
            h = hist / jnp.maximum(hist.sum(-1, keepdims=True), 1e-8)
            ht = self.target_hist / jnp.maximum(self.target_hist.sum(-1, keepdims=True), 1e-8)
            return jnp.mean(jnp.square(h - ht))

        return jax.grad(loss)(img) * self.scale


class LossGrads(GradModule):
    """Arbitrary image-loss guidance (`maua/grad.py:168-176`)."""

    def __init__(self, loss_fn: Callable, scale: float = 1.0):
        super().__init__(scale)
        self.loss_fn = loss_fn

    def __call__(self, img, t):
        return jax.grad(lambda im: jnp.sum(self.loss_fn(im)))(img) * self.scale


class RangeGrads(LossGrads):
    def __init__(self, scale: float = 1.0):
        super().__init__(range_loss, scale)


class TVGrads(LossGrads):
    def __init__(self, scale: float = 1.0):
        super().__init__(tv_loss, scale)


class CLIPGrads(GradModule):
    """CLIP guidance with cutouts + spherical distance
    (`maua/grad.py:96-165`). Requires a CLIP perceptor
    (`maua_tpu.perceptors.clip`)."""

    def __init__(self, perceptor=None, scale: float = 1.0, n_cutouts: int = 16, cutout_key=None):
        super().__init__(scale)
        if perceptor is None:
            from .perceptors.clip import CLIPPerceptor

            perceptor = CLIPPerceptor()
        self.perceptor = perceptor
        self.n_cutouts = n_cutouts
        self.key = cutout_key if cutout_key is not None else jax.random.PRNGKey(0)
        self.text_embeds = None
        self.text_weights = None
        self.img_embeds = None

    def set_targets(self, prompts):
        texts, weights = [], []
        img_embeds = []
        for p in prompts:
            if isinstance(p, TextPrompt):
                texts.append(p.text)
                weights.append(p.weight)
            elif isinstance(p, ImagePrompt) and not isinstance(p, (ContentPrompt,)):
                img_embeds.append(self.perceptor.encode_image(jnp.asarray(p.img)))
        if texts:
            self.text_embeds = self.perceptor.encode_text(texts)
            self.text_weights = jnp.asarray(weights, jnp.float32)
        if img_embeds:
            self.img_embeds = jnp.concatenate(img_embeds)

    def __call__(self, img, t):
        if self.text_embeds is None and self.img_embeds is None:
            return jnp.zeros_like(img)
        self.key, sub = jax.random.split(self.key)

        def loss(im):
            from .ops.cutouts import random_cutouts

            cuts = random_cutouts(sub, im, self.perceptor.image_size, self.n_cutouts)
            embeds = self.perceptor.encode_image(cuts)
            total = 0.0
            if self.text_embeds is not None:
                d = spherical_dist_loss(embeds[:, None, :], self.text_embeds[None])
                total += jnp.sum(d * self.text_weights[None])
            if self.img_embeds is not None:
                d = spherical_dist_loss(embeds[:, None, :], self.img_embeds[None])
                total += jnp.sum(d)
            return total / self.n_cutouts

        return jax.grad(loss)(img) * self.scale


class VGGGrads(GradModule):
    """VGG gram-matrix style guidance (`maua/grad.py:75-93`)."""

    def __init__(self, perceptor=None, scale: float = 1.0):
        super().__init__(scale)
        if perceptor is None:
            from .perceptors.vgg import VGGPerceptor

            perceptor = VGGPerceptor()
        self.perceptor = perceptor
        self.target_grams = None

    def set_targets(self, prompts):
        from .loss import gram_matrix

        for p in prompts:
            if isinstance(p, (StylePrompt, ImagePrompt)) and not isinstance(p, ContentPrompt):
                feats = self.perceptor.get_features(jnp.asarray(p.img))
                self.target_grams = [gram_matrix(f) for f in feats]

    def __call__(self, img, t):
        if self.target_grams is None:
            return jnp.zeros_like(img)
        from .loss import gram_matrix, scaled_mse_loss

        def loss(im):
            feats = self.perceptor.get_features(im)
            return sum(scaled_mse_loss(gram_matrix(f), g) for f, g in zip(feats, self.target_grams))

        return jax.grad(loss)(img) * self.scale


class ContentGrads(GradModule):
    """Perceptual content matching (role of LPIPSGrads,
    `maua/grad.py:179-196`, via perceptor features)."""

    def __init__(self, perceptor=None, scale: float = 1.0):
        super().__init__(scale)
        if perceptor is None:
            from .perceptors.vgg import VGGPerceptor

            perceptor = VGGPerceptor()
        self.perceptor = perceptor
        self.target_feats = None

    def set_targets(self, prompts):
        for p in prompts:
            if isinstance(p, ContentPrompt):
                self.target_feats = self.perceptor.get_features(jnp.asarray(p.img))

    def __call__(self, img, t):
        if self.target_feats is None:
            return jnp.zeros_like(img)

        def loss(im):
            feats = self.perceptor.get_features(im)
            return sum(jnp.mean(jnp.square(f - tf)) for f, tf in zip(feats, self.target_feats))

        return jax.grad(loss)(img) * self.scale


class LPIPSGrads(GradModule):
    """LPIPS perceptual content guidance with learned linear
    calibration (`maua/grad.py:179-196`): both images resampled to 256
    and scored by the lpips-vgg metric (`perceptors/lpips.py`); pass
    converted lin+vgg weights via `params` for literature-comparable
    behavior."""

    def __init__(self, scale: float = 1.0, params=None, key=None):
        super().__init__(scale)
        from .perceptors.lpips import init_params as _lpips_init, lpips as _lpips

        self._lpips = _lpips
        self.params = params if params is not None else _lpips_init(key)
        self.target = None

    def set_targets(self, prompts):
        for p in prompts:
            if isinstance(p, ContentPrompt):
                self.target = jnp.asarray(p.img)  # [-1, 1]

    def __call__(self, img, t):
        if self.target is None:
            return jnp.zeros_like(img)
        from .ops.image import resample

        tgt = resample(self.target, (256, 256))

        def loss(im):
            return jnp.sum(self._lpips(self.params, resample(im, (256, 256)), tgt))

        return jax.grad(loss)(img) * self.scale


def ssim(x: jax.Array, y: jax.Array, data_range: float = 10.0, win_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over (B, H, W, C) with a gaussian window (the
    pytorch_msssim.SSIM role, `maua/grad.py:199-206`)."""
    half = win_size // 2
    g = jnp.exp(-0.5 * ((jnp.arange(win_size) - half) / sigma) ** 2)
    g = g / g.sum()

    def blur(im):
        c = im.shape[-1]
        kh = jnp.tile(g.reshape(win_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, win_size, 1, 1), (1, 1, 1, c))
        dn = ("NHWC", "HWIO", "NHWC")
        im = jax.lax.conv_general_dilated(im, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
        return jax.lax.conv_general_dilated(im, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mx, my = blur(x), blur(y)
    mxx, myy, mxy = blur(x * x), blur(y * y), blur(x * y)
    vx = mxx - mx * mx
    vy = myy - my * my
    cov = mxy - mx * my
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / ((mx * mx + my * my + c1) * (vx + vy + c2))
    return jnp.mean(s)


class LatentSSIMGrads(GradModule):
    """Structural-similarity content guidance in LATENT space
    (`maua/grad.py:199-217`): the content image is VAE-encoded once and
    the running latent x is pulled toward it by 1 - SSIM (data_range 10,
    4 channels). `encode_fn` is the model's first-stage encoder."""

    def __init__(self, scale: float = 1.0, encode_fn: Callable = None):
        super().__init__(scale)
        self.encode_fn = encode_fn
        self.target = None

    def set_targets(self, prompts):
        for p in prompts:
            if isinstance(p, ContentPrompt):
                img = jnp.asarray(p.img)
                self.target = self.encode_fn(img) if self.encode_fn is not None else None

    def __call__(self, x, t):
        if self.target is None:
            return jnp.zeros_like(x)

        def loss(lat):
            return 1.0 - ssim(lat, self.target, data_range=10.0)

        return jax.grad(loss)(x) * self.scale
