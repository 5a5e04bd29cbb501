"""Palette-constrained pixel-art parameterization.

Full rebuild of `maua/parameterizations/pixel.py:49-333` (the PyTTI
Pixel image): a brightness `value` map (h, w), soft pallet-selection
`tensor` (n_pallets, h, w), and a `pallet` (pallet_size, n_pallets, 3)
of luma-sorted color ramps; decoding mixes a continuous (lerped,
softmax-weighted) render with a discrete (rounded, argmax) render
through a straight-through estimator (:226-260), nearest-upsampled by
`scale`. Includes the reference's palette losses — `PalletLoss`
(decorrelate pallet usage + maximize per-pallet variance, :49-78) and
`HdrLoss` (luma ramp matched to a gamma curve, :81-110) — plus pallet
sorting (:207-216), pallet lock/target (:186-202), and image encoding
(:306-333, closed-form variant)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..loss import replace_grad
from . import Parameterization

# https://alienryderflex.com/hsp.html luma weights (`pixel.py:211-213`)
_MAGIC_COLOR = np.asarray([0.299, 0.587, 0.114], np.float32)  # numpy: no device op at import


def sort_pallet(pallet: jax.Array, pallet_inertia: float = 2.0) -> jax.Array:
    """Luma-sort each pallet's ramp (`pixel.py:207-216`).
    pallet (S, P, 3) -> sorted, clamped to [0, 1]."""
    p = jnp.clip(pallet / pallet_inertia, 0.0, 1.0)
    luma = jnp.sum(jnp.square(p) * _MAGIC_COLOR, axis=-1)  # (S, P)
    order = jnp.argsort(luma, axis=0)  # per-pallet brightness order
    return jnp.take_along_axis(p, order[:, :, None], axis=0)


class Pixel(Parameterization):
    def __init__(
        self,
        height: int,
        width: int,
        tensor=None,
        n_colors: int = 8,  # pallet_size (brightness steps per ramp)
        n_pallets: int = 2,
        scale: int = 1,
        gamma: float = 1.0,
        hdr_weight: float = 0.5,
        norm_weight: float = 0.1,
        hard: bool = False,
        ema: bool = False,
        key=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        self.pallet_size = n_colors
        self.n_pallets = n_pallets
        self.n_colors = n_colors
        self.scale = scale
        self.gamma = gamma
        self.hdr_weight = hdr_weight
        self.norm_weight = norm_weight
        self.hard = hard
        self.pallet_inertia = 2.0
        h, w = height // scale, width // scale
        # gamma-spaced grey ramps repeated per pallet (`pixel.py:141-147`)
        pallet = (
            jnp.linspace(0, self.pallet_inertia, n_colors) ** gamma
        ).reshape(n_colors, 1, 1) * jnp.ones((1, n_pallets, 3))
        params = {
            "value": jnp.zeros((h, w)),
            "tensor": jax.random.normal(key, (n_pallets, h, w)) * 0.1,
            "pallet": pallet,
        }
        super().__init__(height, width, params, ema=ema)
        self.pallet_target: Optional[jax.Array] = None
        self.use_pallet_target = False
        if tensor is not None:
            self.encode(tensor)

    # ------------------------------------------------------- decoding
    def _sorted_pallet(self, p=None):
        if self.use_pallet_target and self.pallet_target is not None:
            return self.pallet_target
        pal = (self.tensor if p is None else p)["pallet"]
        return sort_pallet(pal, self.pallet_inertia)

    def decode(self, tensor=None) -> jax.Array:
        """(`pixel.py:226-260`): straight-through mix of the discrete
        (rounded value, argmax pallet) and continuous (lerped,
        softmaxed) renders, nearest-upsampled by `scale`; [-1, 1]."""
        p = self.tensor if tensor is None else tensor
        pallet = self._sorted_pallet(p)

        values = jnp.clip(p["value"], 0, 1) * (self.pallet_size - 1)
        floors = jnp.clip(jnp.floor(values).astype(jnp.int32), 0, self.pallet_size - 1)
        ceils = jnp.clip(jnp.ceil(values).astype(jnp.int32), 0, self.pallet_size - 1)
        rounds = jnp.clip(jnp.round(values).astype(jnp.int32), 0, self.pallet_size - 1)
        fracs = (values - jnp.floor(values))[..., None, None]

        weights = jnp.moveaxis(p["tensor"], 0, -1)  # (h, w, P)
        hard_w = jax.nn.one_hot(jnp.argmax(weights, -1), self.n_pallets)[..., None]
        soft_w = jax.nn.softmax(weights, -1)[..., None]

        colors_disc = jnp.sum(pallet[rounds] * hard_w, axis=2)  # (h, w, 3)
        colors_cont = jnp.sum((pallet[floors] * (1 - fracs) + pallet[ceils] * fracs) * soft_w, axis=2)

        if self.hard:
            out = replace_grad(colors_disc, colors_cont)
        else:
            out = replace_grad(colors_disc, colors_cont * 0.5 + colors_disc * 0.5)
        if self.scale > 1:
            out = jnp.repeat(jnp.repeat(out, self.scale, axis=0), self.scale, axis=1)
        return out[None] * 2.0 - 1.0

    # -------------------------------------------------------- losses
    def palette_loss(self) -> jax.Array:
        """PalletLoss (`pixel.py:55-69`): anticorrelate pallet usage
        across pixels and maximize within-pallet variance."""
        t = jnp.moveaxis(self.tensor["tensor"], 0, -1).reshape(-1, self.n_pallets)
        t = jax.nn.softmax(t, axis=-1)
        n = t.shape[0]
        mu = t.mean(axis=0, keepdims=True)
        sigma = t.std(axis=0, keepdims=True) + 1e-8
        c = t - mu
        S = (c.T @ c) / (sigma * sigma.T * n)
        S = S - jnp.diag(jnp.diag(S))
        loss = S.mean() + jnp.mean(1.0 / (sigma * n))
        return loss * self.norm_weight

    def hdr_loss(self) -> jax.Array:
        """HdrLoss (`pixel.py:96-102`): pallet luma matched to a
        gamma-spaced ramp."""
        if self.hdr_weight == 0:
            return jnp.zeros(())
        pallet = self._sorted_pallet()
        comp = (jnp.linspace(0, 1, self.pallet_size) ** 2.5)[:, None] * jnp.ones((1, self.n_pallets))
        color_norms = jnp.linalg.norm(pallet * jnp.sqrt(_MAGIC_COLOR), axis=-1)
        return jnp.mean(jnp.square(color_norms - comp)) * self.hdr_weight

    def image_loss(self) -> jax.Array:
        """(`pixel.py:204-205`)"""
        return self.palette_loss() + self.hdr_loss()

    # ------------------------------------------------------- encoding
    def encode(self, img):
        """Closed-form image fit (`pixel.py:306-333` without the inner
        optimization loop): value from HSP luma; pallet ramps from
        per-pallet luma-quantile colors; tensor from color distance."""
        x = (jnp.asarray(img) + 1.0) / 2.0
        if x.ndim == 4:
            x = x[0]
        h, w = self.tensor["value"].shape
        x = jax.image.resize(x, (h, w, 3), "linear")
        luma = jnp.linalg.norm(x * jnp.sqrt(_MAGIC_COLOR), axis=-1)
        value = jnp.clip(luma, 0, 1)

        flat = x.reshape(-1, 3)
        order = jnp.argsort(jnp.sum(flat * _MAGIC_COLOR, -1))
        qidx = jnp.linspace(0, flat.shape[0] - 1, self.pallet_size).astype(jnp.int32)
        ramp = flat[order[qidx]]  # (S, 3) luma-sorted representative colors
        rng = np.random.default_rng(0)
        jitter = jnp.asarray(rng.normal(0, 0.02, (self.pallet_size, self.n_pallets, 3)))
        pallet = jnp.clip(ramp[:, None, :] + jitter, 0, 1) * self.pallet_inertia

        # pallet assignment from distance of each pixel to its ramp entry
        idx = jnp.clip(jnp.round(value * (self.pallet_size - 1)).astype(jnp.int32), 0, self.pallet_size - 1)
        cand = sort_pallet(pallet, self.pallet_inertia)[idx.reshape(-1)]  # (N, P, 3)
        d = jnp.sum((cand - flat[:, None, :]) ** 2, -1)  # (N, P)
        tensor = jnp.moveaxis((-d * 10.0).reshape(h, w, self.n_pallets), -1, 0)
        self.tensor = {"value": value, "tensor": tensor, "pallet": pallet}

    # ------------------------------------------------- pallet locking
    def lock_pallet(self, lock: bool = True):
        """(`pixel.py:199-202`)"""
        if lock:
            self.pallet_target = self._sorted_pallet()
        self.use_pallet_target = lock

    def set_pallet_target(self, img):
        """(`pixel.py:186-197`): fit a pallet to an image and lock it."""
        saved = self.tensor
        self.encode(img)
        self.pallet_target = sort_pallet(self.tensor["pallet"], self.pallet_inertia)
        self.tensor = {**saved, "pallet": self.tensor["pallet"]}
        self.use_pallet_target = True

    def update(self):
        """Post-step clamps (`pixel.py:300-304`)."""
        self.tensor = {
            "value": jnp.clip(self.tensor["value"], 0, 1),
            "tensor": jnp.maximum(self.tensor["tensor"], 0),
            "pallet": jnp.clip(self.tensor["pallet"], 0, self.pallet_inertia),
        }
