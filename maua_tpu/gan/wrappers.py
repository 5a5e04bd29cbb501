"""High-level StyleGAN wrapper API: Mapper / Synthesizer / Generator
with arbitrary output resolution, latent-space camera motion, noise
pyramids, and a batched render loop.

Functional rebuild of `maua/GAN/wrappers/` (`__init__.py:20-99` Maua
Mapper/Synthesizer/Generator + render; `stylegan.py:11-74` seed
latents; `stylegan2.py:25-340` hook machinery). Every mutable-hook
behavior of the reference becomes explicit static config
(`RenderConfig`) + per-call modulation arrays — XLA sees fixed shapes
per compile.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warp as W
from . import ops
from .load import load_network
from .stylegan2 import SG2Config, fc_forward, init_params, mapping, torgb_layer


def layer_names(cfg: SG2Config):
    """Per-conv layer names, reproducing the reference's list
    (`wrappers/stylegan2.py:50-53`) including its duplicate first
    entry for b4."""
    names = []
    for c, res in enumerate(sorted(list(cfg.block_resolutions) * 2)):
        names.append(f"b{res}.conv{1 if res == 4 else c % 2}")
    return names


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static synthesis customization (replaces the reference's
    change_output_resolution / apply_* hooks)."""

    output_size: Optional[Tuple[int, int]] = None  # (W, H)
    strategy: str = "stretch"  # 'stretch' | 'pad-<how>-<where>'
    layer: int = 0
    translation_layer: int = 7
    zoom_layer: int = 7
    rotation_layer: int = 7
    zoom_center: Optional[Tuple[float, float]] = None
    rotation_center: Optional[Tuple[float, float]] = None
    resize_noise: bool = True


def _resize_plan(cfg: SG2Config, rcfg: RenderConfig):
    """Compute (resize_layer_index, per-layer target (H, W)) or None.

    A layer index of None means the requested size is not representable
    in feature space at the chosen layer (the per-layer target rounds
    below one pixel — e.g. 64^2 output from a 1024 model at layer 0) —
    synthesize natively and resize the final image instead."""
    if rcfg.output_size is None:
        return None
    out_w, out_h = rcfg.output_size
    if (out_w, out_h) == (cfg.img_resolution, cfg.img_resolution):
        return None
    names = layer_names(cfg)
    name = names[rcfg.layer]
    res = int(name.split(".")[0][1:])
    lay_mult = cfg.img_resolution // res
    target = (int(round(out_h / lay_mult)), int(round(out_w / lay_mult)))
    if min(target) < 1:
        return None, (out_h, out_w)
    return rcfg.layer, target


def _apply_strategy(x: jax.Array, target_hw: Tuple[int, int], strategy: str, noise_key=None) -> jax.Array:
    """Feature resize/pad (`wrappers/stylegan2.py:216-320`)."""
    th, tw = target_hw
    if strategy == "stretch":
        out = W.resize_bicubic(x, (th, tw))
    elif strategy.startswith("pad"):
        _, how, where = strategy.split("-")
        h, w = x.shape[1], x.shape[2]
        pad_h, pad_w = th - h, tw - w
        if where == "out":
            padding = (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2)
        elif where == "left":
            padding = (pad_w, 0, pad_h // 2, pad_h - pad_h // 2)
        elif where == "right":
            padding = (0, pad_w, pad_h // 2, pad_h - pad_h // 2)
        elif where == "top":
            padding = (pad_w // 2, pad_w - pad_w // 2, pad_h, 0)
        else:  # bottom
            padding = (pad_w // 2, pad_w - pad_w // 2, 0, pad_h)
        l, r, t, b = padding
        if how in ("reflect", "replicate", "circular"):
            mode = {"reflect": "reflect", "replicate": "edge", "circular": "wrap"}[how]
            out = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode=mode)
        else:
            out = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), constant_values=float(how))
    else:
        raise ValueError(f"Resize strategy not found: {strategy}")
    if noise_key is not None:
        # channel-stat-matched noise refill (`stylegan2.py:240-254`)
        mean = out.mean(axis=(0, 1, 2))
        std = out.std(axis=(0, 1, 2))
        n = jax.random.normal(noise_key, (1,) + out.shape[1:3] + (out.shape[3],), out.dtype)
        out = out + (n * std + mean)
    return out


def synthesize(
    params: Dict,
    ws: jax.Array,
    cfg: SG2Config,
    rcfg: RenderConfig = RenderConfig(),
    translation: Optional[jax.Array] = None,
    zoom: Optional[jax.Array] = None,
    rotation: Optional[jax.Array] = None,
    noises: Optional[Dict] = None,
    noise_mode: str = "const",
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Customizable synthesis forward: arbitrary output size +
    translate/zoom/rotate at chosen layers + explicit per-frame noise
    (the functional equivalent of `StyleGAN2Synthesizer.forward`,
    `wrappers/stylegan2.py:65-102`)."""
    syn = params["synthesis"]
    rfilter = ops.setup_filter(list(cfg.resample_filter))
    batch = ws.shape[0]
    if noise_key is None:
        noise_key = jax.random.PRNGKey(0)
    plan = _resize_plan(cfg, rcfg)

    names = layer_names(cfg)
    # global conv index per (block, conv): b4.conv1 -> 0 (and 1); later
    # blocks 2 per block, mirroring the reference indexing
    li = 1  # reference's duplicate entry means b8.conv0 is layer 2

    x = None
    img = None
    w_idx = 0

    def maybe_motion(x, idx):
        if translation is not None and idx == rcfg.translation_layer:
            h, w = x.shape[1], x.shape[2]
            t = jnp.asarray(translation, jnp.float32) * jnp.asarray([w, h], jnp.float32)
            x = W.translate(x.astype(jnp.float32), t).astype(x.dtype)
        if zoom is not None and idx == rcfg.zoom_layer:
            x = W.zoom(x.astype(jnp.float32), zoom, rcfg.zoom_center).astype(x.dtype)
        if rotation is not None and idx == rcfg.rotation_layer:
            x = W.rotate(x.astype(jnp.float32), rotation, rcfg.rotation_center).astype(x.dtype)
        return x

    def layer_noise(p, name, shape_hw, idx):
        if noise_mode == "none":
            return None
        if noises is not None and name in noises:
            n = noises[name]
            if n.ndim == 2:
                n = n[None, :, :, None]
            elif n.ndim == 3:
                n = n[..., None]
            if n.shape[1:3] != shape_hw:
                n = W.resize_bicubic(n, shape_hw)
            return n
        if noise_mode == "random":
            return jax.random.normal(jax.random.fold_in(noise_key, idx), (batch,) + shape_hw + (1,))
        # const: use stored buffer when shapes match, else deterministic
        # refill (the reference's noise_adjust hook, stylegan2.py:139-147)
        nc = p.get("noise_const")
        if nc is not None and nc.shape == shape_hw:
            return nc[None, :, :, None]
        return jax.random.normal(jax.random.fold_in(noise_key, 7000 + idx), (1,) + shape_hw + (1,))

    for bi, res in enumerate(cfg.block_resolutions):
        block = syn[f"b{res}"]
        dtype = cfg.compute_dtype(res)
        num_conv = 1 if res == 4 else 2
        block_ws = ws[:, w_idx : w_idx + num_conv + 1]
        resized_this_block = False

        if res == 4:
            x = jnp.tile(block["const"][None].astype(dtype), (batch, 1, 1, 1))
            if plan is not None and plan[0] is not None and plan[0] <= 1:
                # layer 0/1: pre-hook resize of the const input
                x = _apply_strategy(
                    x, plan[1], rcfg.strategy,
                    jax.random.fold_in(noise_key, 9999) if rcfg.resize_noise else None,
                )
                resized_this_block = True
            cur_hw = (x.shape[1], x.shape[2])
            n = layer_noise(block["conv1"], "b4.conv1", cur_hw, 0)
            if n is not None:
                n = n * block["conv1"].get("noise_strength", jnp.ones(()))
            styles = fc_forward(block["conv1"]["affine"], block_ws[:, 0].astype(jnp.float32))
            x = ops.modulated_conv2d(x, block["conv1"]["weight"].astype(dtype), styles, noise=n, padding=1)
            clamp = cfg.conv_clamp
            x = ops.bias_act(x, block["conv1"]["bias"].astype(dtype), act="lrelu", clamp=clamp)
            x = maybe_motion(x, 0)
            li = 2
        else:
            x = x.astype(dtype)
            for ci, cname in enumerate(["conv0", "conv1"]):
                p = block[cname]
                up = 2 if ci == 0 else 1
                out_hw = (x.shape[1] * up, x.shape[2] * up)
                n = layer_noise(p, f"b{res}.{cname}", out_hw, li)
                if n is not None:
                    n = n * p.get("noise_strength", jnp.ones(()))
                styles = fc_forward(p["affine"], block_ws[:, ci].astype(jnp.float32))
                x = ops.modulated_conv2d(
                    x, p["weight"].astype(dtype), styles, noise=n, up=up, padding=1,
                    resample_filter=rfilter if up > 1 else None,
                )
                x = ops.bias_act(x, p["bias"].astype(dtype), act="lrelu", clamp=cfg.conv_clamp)
                if plan is not None and plan[0] is not None and plan[0] == li and plan[0] > 1:
                    x = _apply_strategy(
                        x, plan[1], rcfg.strategy,
                        jax.random.fold_in(noise_key, 9999) if rcfg.resize_noise else None,
                    )
                    resized_this_block = True
                x = maybe_motion(x, li)
                li += 1

        if img is not None:
            img = ops.upsample2d(img, rfilter)
        if res == cfg.img_resolution or cfg.architecture == "skip":
            y = torgb_layer(block["torgb"], x, block_ws[:, num_conv], cfg)
            if img is not None and img.shape[1:3] != y.shape[1:3]:
                img = W.resize_bicubic(img, y.shape[1:3])
            img = (img + y.astype(img.dtype)) if img is not None else y.astype(jnp.float32)
        w_idx += num_conv
    if plan is not None:
        # guarantee the advertised output size exactly: covers the
        # final-resize plan (layer None) and any per-layer rounding
        out_w, out_h = rcfg.output_size
        if img.shape[1:3] != (out_h, out_w):
            img = W.resize_bicubic(img, (out_h, out_w))
    return img.astype(jnp.float32)


def make_noise_pyramid(cfg: SG2Config, noise: jax.Array, layer_limit: int = 8, rcfg: RenderConfig = RenderConfig()):
    """Resize a (T, H, W, 1) noise video to each synthesis layer's
    spatial size, std-normalized (`wrappers/stylegan2.py:196-213`).
    Returns {layer_name: (T, h, w, 1)}."""
    noises = {}
    names = layer_names(cfg)[1:]
    plan = _resize_plan(cfg, rcfg)
    for l, name in enumerate(names):
        if l > layer_limit:
            continue
        res = int(name.split(".")[0][1:])
        h = w = res
        if plan is not None and plan[0] is not None:
            rl_name = layer_names(cfg)[plan[0]]
            rl_res = int(rl_name.split(".")[0][1:])
            if res >= rl_res:
                scale = res // rl_res
                h, w = plan[1][0] * scale, plan[1][1] * scale
        n = W.resize_bicubic(noise, (h, w))
        n = n / jnp.maximum(n.std(axis=(1, 2, 3), keepdims=True), 1e-8)
        noises[name] = n
    return noises


def get_z_latents(seeds, z_dim: int = 512) -> np.ndarray:
    """Seed spec ('1,3,5-10') -> z latents with numpy RandomState
    parity (`wrappers/stylegan.py:58-69`)."""
    seed_list = sum(
        [
            ([int(s)] if "-" not in s else list(range(int(s.split("-")[0]), int(s.split("-")[1]))))
            for s in str(seeds).split(",")
        ],
        [],
    )
    return np.concatenate([np.random.RandomState(s).randn(1, z_dim) for s in seed_list]).astype(np.float32)


class StyleGAN2:
    """Mapper+Synthesizer facade (`wrappers/__init__.py:20-47`,
    `wrappers/stylegan.py:39-77`)."""

    def __init__(
        self,
        model_file: Optional[str] = None,
        output_size: Optional[Tuple[int, int]] = None,
        strategy: str = "stretch",
        layer: int = 0,
        dtype: str = "bfloat16",
        cfg: Optional[SG2Config] = None,
        params: Optional[Dict] = None,
    ):
        self.model_file = model_file if model_file not in (None, "None") else None
        if model_file is not None and model_file != "None":
            self.params, self.cfg = load_network(model_file, dtype=dtype)
        elif params is not None and cfg is not None:
            self.params, self.cfg = params, cfg
        else:
            self.cfg = cfg or SG2Config(dtype=dtype)
            self.params = init_params(jax.random.PRNGKey(0), self.cfg)
        self.rcfg = RenderConfig(output_size=output_size, strategy=strategy, layer=layer)
        self.z_dim = self.cfg.z_dim
        self.w_dim = self.cfg.w_dim
        self.num_ws = self.cfg.num_ws
        self.res = self.cfg.img_resolution

        self._synth = jax.jit(
            partial(synthesize, cfg=self.cfg, rcfg=self.rcfg), static_argnames=("noise_mode",)
        )
        # space-to-depth fast path (exact; see gan/fast_synthesis.py)
        # for the uncustomized forward — resize/motion mods fall back
        self._fast_plan = None
        self._fast_synth = None
        self._vanilla = self.rcfg.output_size in (None, (self.res, self.res))

    def _get_fast(self):
        if self._fast_synth is None:
            from .fast_synthesis import build_fast_plan, synthesis_fast

            self._fast_plan = build_fast_plan(self.params, self.cfg)
            plan = self._fast_plan
            rcfg = self.rcfg
            if plan["blocks"]:
                self._fast_synth = jax.jit(
                    lambda p, ws, noises, nk, t, z, r: synthesis_fast(
                        p, plan, ws, self.cfg, noise_mode="const", noises=noises, noise_key=nk,
                        translation=t, zoom=z, rotation=r, rcfg=rcfg,
                    )
                )
            else:
                self._fast_synth = False
        return self._fast_synth

    def _motion_fast_ok(self, translation, zoom, rotation) -> bool:
        """Motion mods are fast-path compatible when every active
        transform layer sits in the direct head (below the s2d tail) —
        the default layers (~b32) always do for 1024-class models."""
        used = [layer for v, layer in ((translation, self.rcfg.translation_layer),
                                       (zoom, self.rcfg.zoom_layer),
                                       (rotation, self.rcfg.rotation_layer)) if v is not None]
        if not used:
            return True
        from .fast_synthesis import motion_layer_bound

        return max(used) < motion_layer_bound(self._fast_plan, self.cfg)

    # ------------------------------------------------------------ mapper
    def get_z_latents(self, seeds) -> jax.Array:
        return jnp.asarray(get_z_latents(seeds, self.z_dim))

    def mapper(self, z=None, c=None, truncation: float = 1.0, latent_z=None, class_conditioning=None) -> jax.Array:
        """z -> w+ latents; accepts the reference's keyword names
        (`wrappers/stylegan.py:31-33`) as aliases."""
        z = z if z is not None else latent_z
        c = c if c is not None else class_conditioning
        return mapping(self.params, jnp.asarray(z), self.cfg, c, truncation_psi=truncation)

    def get_w_latents(self, seeds, truncation: float = 1.0) -> jax.Array:
        return self.mapper(self.get_z_latents(seeds), truncation=truncation)

    # ------------------------------------------------------- synthesizer
    def synthesizer(self, latents, translation=None, zoom=None, rotation=None, noises=None,
                    noise_mode: str = "const", noise_key=None) -> jax.Array:
        if self._vanilla and noise_mode == "const":
            fast = self._get_fast()
            if fast and self._motion_fast_ok(translation, zoom, rotation):
                if noise_key is None:
                    noise_key = jax.random.PRNGKey(0)
                return fast(self.params, jnp.asarray(latents), noises, noise_key,
                            translation, zoom, rotation)
        return self._synth(
            self.params, jnp.asarray(latents), translation=translation, zoom=zoom, rotation=rotation,
            noises=noises, noise_mode=noise_mode, noise_key=noise_key,
        )

    def __call__(self, z, c=None, truncation: float = 1.0, **kw) -> jax.Array:
        return self.synthesizer(self.mapper(z, c, truncation), **kw)

    def make_noise_pyramid(self, noise, layer_limit: int = 8):
        return make_noise_pyramid(self.cfg, jnp.asarray(noise), layer_limit, self.rcfg)

    # ----------------------------------------------------------- render
    def render(
        self,
        latents: jax.Array,  # (T, num_ws, w_dim)
        noises: Optional[Dict] = None,  # {name: (T, h, w, 1)}
        translation: Optional[jax.Array] = None,  # (T, 2)
        zoom: Optional[jax.Array] = None,  # (T,)
        rotation: Optional[jax.Array] = None,  # (T,)
        batch_size: int = 8,
        postprocess=None,
        mesh=None,
        pix_fmt: str = "rgb24",
    ) -> Iterator[np.ndarray]:
        """Batched frame generator (`wrappers/__init__.py:52-99`):
        yields uint8 HWC frames. The device loop is jitted per batch
        shape; the tail batch is padded to keep one compilation.

        Passing a Mesh shards each frame batch on its `data` axis —
        video frames are the natural sequence axis for ICI data
        parallelism (SURVEY.md section 2.14).

        pix_fmt="yuv420p" converts to planar I420 on device and yields
        (3H/2, W) uint8 frames (the raw yuv420p byte layout) — half the
        device->host bytes of rgb24, for writers that encode yuv
        anyway."""
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            batch_size = max(batch_size // n_data, 1) * n_data
            sharding = lambda x: jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )
        T = latents.shape[0]
        min_batch = mesh.shape["data"] if mesh is not None else 1

        def batches():
            nonlocal batch_size
            lo = 0
            while lo < T:
                hi = min(lo + batch_size, T)
                pad = batch_size - (hi - lo)

                def take(arr):
                    if arr is None:
                        return None
                    sl = jnp.asarray(arr[lo:hi])
                    if pad:
                        sl = jnp.concatenate([sl, jnp.repeat(sl[-1:], pad, axis=0)], axis=0)
                    if sharding is not None:
                        sl = sharding(sl)
                    return sl

                def synth():
                    batch_noises = None if noises is None else {k: take(v) for k, v in noises.items()}
                    return self.synthesizer(
                        take(latents),
                        translation=take(translation),
                        zoom=take(zoom),
                        rotation=take(rotation),
                        noises=batch_noises,
                    )

                try:
                    imgs = synth()
                except Exception as e:
                    # halve the render chunk on device OOM and keep going
                    # (`wrappers/stylegan2.py:204-211` role); batch stays a
                    # multiple of the mesh data axis
                    from ..oom import is_oom_error

                    if not is_oom_error(e) or batch_size <= min_batch:
                        raise
                    batch_size = max(batch_size // 2, min_batch)
                    print(f"device OOM during render; retrying with batch_size={batch_size}")
                    continue
                if postprocess is not None:
                    imgs = postprocess(imgs)
                yield jnp.clip((imgs + 1.0) * 127.5, 0, 255).astype(jnp.uint8), hi - lo
                lo = hi

        from ..ops.video import pipelined_frames

        yield from pipelined_frames(batches(), pix_fmt)


def get_generator_class(architecture: str):
    """(`wrappers/__init__.py:102-112`)"""
    if architecture in ("stylegan2", "stylegan"):
        return StyleGAN2
    if architecture == "stylegan3":
        from .stylegan3 import StyleGAN3

        return StyleGAN3
    raise ValueError(f"unknown generator architecture {architecture}")
