"""Image super-resolution: model registry + upscale API + tiled
inference + mesh-sharded bulk processing.

Rebuild of `maua/super/image/` (registry+upscale `single.py:18-97`,
tiling as in `models/waifu.py`, multi-process DDP bulk
`bulk.py:30-113` -> mesh-sharded batches). Checkpoints convert from
basicsr/realesrgan state dicts when present in modelzoo/; otherwise
random-init models keep the pipeline runnable offline.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Generator, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..oom import run_with_oom_fallback
from ..ops.image import destitch, restitch
from ..ops.io import load_image, tensor2img
from ..utility import MODELZOO
from .models import rrdbnet, swinir, waifu

# model name -> (architecture kind, config); mirrors the reference's
# full registry surface (`single.py:18-41`): RealESRGAN (rrdb/srvgg),
# SwinIR M/L, waifu2x UpConv_7 + CARN, BSRGAN/RealSR (rrdb), and the
# diffusion-based "latent-diffusion" upscaler.
MODEL_REGISTRY = {
    "latent-diffusion": ("ldm", None),
    "RealESRGAN-x4plus": ("rrdb", rrdbnet.RRDBConfig()),
    "RealESRGAN-x4plus-anime": ("rrdb", rrdbnet.RRDBConfig(num_block=6)),
    "RealESRGAN-xsx4-animevideo": ("srvgg", rrdbnet.SRVGGConfig()),
    "RealESRGAN-pbaylies-wikiart": ("rrdb", rrdbnet.RRDBConfig()),
    "RealESRGAN-pbaylies-hr-paintings": ("rrdb", rrdbnet.RRDBConfig()),
    "SwinIR-L-DFOWMFC-GAN": ("swinir", swinir.SWINIR_L),
    "SwinIR-L-DFOWMFC-PSNR": ("swinir", swinir.SWINIR_L),
    "SwinIR-M-DFO-GAN": ("swinir", swinir.SWINIR_M),
    "SwinIR-M-DFO-PSNR": ("swinir", swinir.SWINIR_M),
    **{f"waifu2x-{w}-noise{n}": ("upconv7", waifu.UpConv7Config())
       for w in ("anime", "photo") for n in range(4)},
    "CARN": ("carn", waifu.CARNConfig()),
    "BSRGAN": ("rrdb", rrdbnet.RRDBConfig()),
    "RealSR": ("rrdb", rrdbnet.RRDBConfig()),
}
MODEL_NAMES = list(MODEL_REGISTRY.keys())

_CHECKPOINT_FILES = {
    "RealESRGAN-x4plus": "RealESRGAN_x4plus.pth",
    "RealESRGAN-x4plus-anime": "RealESRGAN_x4plus_anime_6B.pth",
    "RealESRGAN-xsx4-animevideo": "RealESRGANv2-animevideo-xsx4.pth",
    "RealESRGAN-pbaylies-wikiart": "wikiart_g.pth",
    "RealESRGAN-pbaylies-hr-paintings": "hr-paintings_g.pth",
    "SwinIR-L-DFOWMFC-GAN": "SwinIR-L-DFOWMFC-GAN.pth",
    "SwinIR-L-DFOWMFC-PSNR": "SwinIR-L-DFOWMFC-PSNR.pth",
    "SwinIR-M-DFO-GAN": "SwinIR-M-DFO-GAN.pth",
    "SwinIR-M-DFO-PSNR": "SwinIR-M-DFO-PSNR.pth",
    **{f"waifu2x-{w}-noise{n}": f"waifu2x/{w}/noise{n}_scale2.0x_model.json"
       for w in ("anime", "photo") for n in range(4)},
    "CARN": "CARN_model_checkpoint.pt",
    "BSRGAN": "BSRGAN.pth",
    "RealSR": "RealSR.pth",
}

_INIT_FNS = {
    "rrdb": lambda key, cfg: rrdbnet.init_params(key, cfg),
    "srvgg": lambda key, cfg: rrdbnet.init_srvgg_params(key, cfg),
    "swinir": lambda key, cfg: swinir.init_params(key, cfg),
    "upconv7": lambda key, cfg: waifu.init_upconv7_params(key),
    "carn": lambda key, cfg: waifu.init_carn_params(key, cfg),
}
_FWD_FNS = {
    "rrdb": rrdbnet.forward,
    "srvgg": rrdbnet.srvgg_forward,
    "swinir": swinir.forward,
    "upconv7": waifu.upconv7_forward,
    "carn": waifu.carn_forward,
}


class Upscaler:
    def __init__(self, model_name: str = "RealESRGAN-x4plus", tile: int = 0, tile_overlap: int = 1, key=None):
        if model_name not in MODEL_REGISTRY:
            raise ValueError(f"unknown model {model_name}; options: {MODEL_NAMES}")
        self.kind, self.cfg = MODEL_REGISTRY[model_name]
        self.tile = tile
        self.tile_overlap = tile_overlap
        if self.kind == "ldm":
            self._ldm = _LDMUpscale(key=key)
            return
        ckpt = os.path.join(MODELZOO, _CHECKPOINT_FILES.get(model_name, ""))
        params = None
        if os.path.exists(ckpt):
            params = self._load_checkpoint(ckpt)
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = _INIT_FNS[self.kind](key, self.cfg)
        self.params = params
        fwd = _FWD_FNS[self.kind]
        self._fwd = jax.jit(lambda p, x: fwd(p, x, self.cfg))

    def _load_checkpoint(self, path: str):
        try:
            if self.kind == "upconv7" and path.endswith(".json"):
                return waifu.upconv7_params_from_json(path)
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=False)
            sd = obj.get("params_ema", obj.get("params", obj)) if isinstance(obj, dict) else obj
            sd = {k: v.float().numpy() for k, v in sd.items()}
            if self.kind == "rrdb":
                return rrdbnet.params_from_torch(sd, self.cfg)
            if self.kind == "swinir":
                return swinir.params_from_torch(sd, self.cfg)
            if self.kind == "upconv7":
                return waifu.upconv7_params_from_torch(sd)
            if self.kind == "srvgg":
                return rrdbnet.srvgg_params_from_torch(sd, self.cfg)
            print(f"warning: no checkpoint converter for kind {self.kind!r} — running RANDOM-INIT weights")
        except Exception as e:  # tolerant cascade like GAN/load.py:192-207
            print(f"checkpoint load failed ({e}); using random init")
        return None

    @property
    def scale(self) -> int:
        if self.kind == "ldm":
            return 4
        if self.kind in ("srvgg", "swinir"):
            return self.cfg.upscale
        return self.cfg.scale  # rrdb / upconv7 / carn

    def _run(self, img: jax.Array) -> jax.Array:
        if self.kind != "swinir":
            return self._fwd(self.params, img)
        # mirror-pad to the window multiple, crop after (swinir.py:73-81)
        ws = self.cfg.window_size
        h, w = img.shape[1], img.shape[2]
        hp, wp = (-h) % ws, (-w) % ws
        if hp or wp:
            img = jnp.concatenate([img, img[:, ::-1]], 1)[:, : h + hp]
            img = jnp.concatenate([img, img[:, :, ::-1]], 2)[:, :, : w + wp]
        out = self._fwd(self.params, img)
        return out[:, : h * self.scale, : w * self.scale]

    def __call__(self, img: jax.Array) -> jax.Array:
        """img (B, H, W, C) in [0, 1] -> upscaled in [0, 1].

        Survives device OOM by walking a ladder of smaller tiles and,
        as the last rung, returning a lanczos upscale without the model
        (the `single.py:91-96` copy-original role)."""
        img = jnp.asarray(img, jnp.float32)
        # LDM tiles are valid img2img inputs, so it shares the
        # destitch/restitch branch instead of silently processing the
        # whole image when tiling was requested
        run = self._ldm if self.kind == "ldm" else self._run
        h, w = img.shape[1], img.shape[2]

        def tiled(tile):
            def thunk():
                tiles = destitch(img, tile_size=tile, overtile=self.tile_overlap)
                return jnp.clip(
                    restitch(run(tiles), h * self.scale, w * self.scale, overtile=self.tile_overlap), 0, 1
                )

            return thunk

        if self.tile and min(h, w) > self.tile:
            attempts = [(f"tile {self.tile}", tiled(self.tile))]
            t = self.tile // 2
        else:
            attempts = [("full image", lambda: jnp.clip(run(img), 0, 1))]
            t = min(h, w) // 2
        while t >= 64:
            attempts.append((f"tile {t}", tiled(t)))
            t //= 2
        from ..ops.image import resample

        attempts.append(
            ("lanczos-only fallback", lambda: jnp.clip(resample(img, (h * self.scale, w * self.scale)), 0, 1))
        )
        return run_with_oom_fallback(attempts)


class _LDMUpscale:
    """Diffusion-based 4x upscaling (the reference's `latent-diffusion`
    registry entry, `super/image/models/latent_diffusion.py`): lanczos
    4x up, then a partial denoise through the LatentDiffusion processor
    refines the upsampled image (img2img in latent space)."""

    def __init__(self, t_start: float = 0.65, timesteps: int = 25, key=None):
        from ..diffusion.processors.latent import LatentDiffusion
        from ..ops.image import resample

        self._resample = resample
        self.t_start = t_start
        self.proc = LatentDiffusion(sampler="ddim", timesteps=timesteps, cfg_scale=1.0, key=key)

    def __call__(self, img: jax.Array) -> jax.Array:
        b, h, w, c = img.shape
        up = self._resample(jnp.asarray(img, jnp.float32), (h * 4, w * 4))
        out = self.proc(up * 2 - 1, [], t_start=self.t_start)
        return jnp.clip((out + 1) / 2, 0, 1)


def load_model(model_name: str = "RealESRGAN-x4plus", **kw) -> Upscaler:
    """(`single.py:49-56` load path)"""
    return Upscaler(model_name, **kw)


def upscale(images: Iterable, model_name: str = "RealESRGAN-x4plus", model: Optional[Upscaler] = None,
            **kw) -> Generator[np.ndarray, None, None]:
    """Generator over upscaled images (`single.py:44-56`). Accepts
    paths / PIL / arrays; yields (1, H*scale, W*scale, C) arrays in
    [0, 1]."""
    model = model or Upscaler(model_name, **kw)
    for img in images:
        arr = load_image(img)
        yield np.asarray(model(arr))


def upscale_image(image, model_name: str = "RealESRGAN-x4plus", model: Optional[Upscaler] = None, **kw):
    """(`single.py:58-71`)"""
    model = model or Upscaler(model_name, **kw)
    return model(load_image(image) if isinstance(image, (str, Path)) else jnp.asarray(image))


def upscale_bulk_sharded(images: Iterable, model_name: str = "RealESRGAN-x4plus", batch_size: int = 8,
                         mesh=None) -> Generator[np.ndarray, None, None]:
    """Data-parallel bulk upscaling over a device mesh — the TPU-native
    replacement for the gloo DDP worker pool (`bulk.py:30-113`): frames
    batch-shard over the `data` axis, one host feeder thread, no
    process groups."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_mesh

    mesh = mesh or make_mesh()
    model = Upscaler(model_name)
    batch = []
    metas = []

    def flush():
        nonlocal batch, metas
        if not batch:
            return []
        arr = jnp.concatenate(batch)
        pad = (-arr.shape[0]) % mesh.shape["data"]
        if pad:
            arr = jnp.concatenate([arr, jnp.repeat(arr[-1:], pad, 0)])
        arr = jax.device_put(arr, NamedSharding(mesh, P("data", None, None, None)))
        out = np.asarray(model(arr))
        res = [out[i : i + 1] for i in range(len(metas))]
        batch, metas = [], []
        return res

    for img in images:
        batch.append(load_image(img))
        metas.append(True)
        if len(batch) >= batch_size:
            yield from flush()
    yield from flush()


def main(args=None):
    import argparse

    parser = argparse.ArgumentParser(description="image super-resolution")
    parser.add_argument("images", nargs="+")
    parser.add_argument("--model_name", default="RealESRGAN-x4plus", choices=MODEL_NAMES)
    parser.add_argument("--out_dir", default="output/")
    parser.add_argument("--tile", default=0, type=int)
    parser.add_argument("--postdownsample", default=1, type=int)
    parser.add_argument("--comparison", action="store_true",
                        help="run every registered model on each image "
                             "(`maua/super/image/comparison.py` / the reference's "
                             "`super image comparison` subcommand)")
    parser.add_argument("--models", nargs="*", default=None,
                        help="restrict --comparison to these registry names")
    args = parser.parse_args(args)

    if args.comparison:
        for path in args.images:
            compare(path, model_names=args.models,
                    out_dir=f"{args.out_dir}/{Path(path).stem}_comparison", tile=args.tile)
            print(f"{args.out_dir}/{Path(path).stem}_comparison")
        return

    os.makedirs(args.out_dir, exist_ok=True)
    model = Upscaler(args.model_name, tile=args.tile)
    for path in args.images:
        out_path = f"{args.out_dir}/{Path(path).stem}_{args.model_name}.png"
        if os.path.exists(out_path):
            continue
        img = np.asarray(model(load_image(path)))
        im = tensor2img(img)
        if args.postdownsample > 1:
            im = im.resize((im.size[0] // args.postdownsample, im.size[1] // args.postdownsample))
        im.save(out_path)
        print(out_path)


if __name__ == "__main__":
    main()


def compare(image, model_names=None, out_dir: str = "output/comparison", **kw):
    """Run all (or selected) registered models side-by-side on one
    image (`maua/super/image/comparison.py`). Returns {name: array}."""
    results = {}
    os.makedirs(out_dir, exist_ok=True)
    arr = load_image(image) if isinstance(image, (str, Path)) else np.asarray(image)
    for name in model_names or MODEL_NAMES:
        out = np.asarray(Upscaler(name, **kw)(jnp.asarray(arr)))
        results[name] = out
        tensor2img(out).save(f"{out_dir}/{name}.png")
    return results
