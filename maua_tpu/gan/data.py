"""Training data pipeline: image folder -> cached array store ->
device-side augmented batches.

Rebuild of the reference's FFCV `.beton` pipeline
(`maua/GAN/training/__main__.py:167-203`: cached preprocessed dataset
+ random-crop decoder + flip): here a one-time npy cache (the .beton
role) and a host iterator feeding device_put batches, with the random
crop/flip running on device.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def build_cache(input_dir: str, resolution: int, cache_file: Optional[str] = None,
                cache_dir: Optional[str] = None, jpeg_quality: int = 0) -> str:
    """Decode + center-crop-resize all images once into one npy
    (`__main__.py:167-185` beton build). `cache_dir` relocates the
    cache (`--cache_dir`); `jpeg_quality` > 0 round-trips each image
    through JPEG at that quality first — the reference cache stores
    jpegs, trading disk/fidelity (`--jpeg_quality`)."""
    from PIL import Image

    if cache_file is None:
        base = cache_dir or input_dir
        os.makedirs(base, exist_ok=True)
        q = f"_q{jpeg_quality}" if jpeg_quality else ""
        stem = Path(input_dir).name if cache_dir else ""
        cache_file = os.path.join(base, f"cache_{stem}{q}_{resolution}.npy".replace("__", "_"))
    if os.path.exists(cache_file):
        return cache_file
    paths = sorted(p for p in Path(input_dir).rglob("*") if p.suffix.lower() in IMAGE_EXTS)
    if not paths:
        raise FileNotFoundError(f"no images under {input_dir}")
    arrs = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        w, h = im.size
        s = min(w, h)
        im = im.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2)).resize((resolution, resolution))
        if jpeg_quality:
            import io

            buf = io.BytesIO()
            im.save(buf, format="JPEG", quality=jpeg_quality)
            buf.seek(0)
            im = Image.open(buf).convert("RGB")
        arrs.append(np.asarray(im, np.uint8))
    np.save(cache_file, np.stack(arrs))
    return cache_file


def make_data_augment(resolution: int, hflip: bool = False, vflip: bool = False,
                      random_crop: bool = False, crop_zoom: float = float(np.sqrt(2)),
                      crop_ratio: float = 0.1, random_rotate: bool = False,
                      rotate_degrees: float = 360.0):
    """Host-side *data* augmentations — visible in output data, unlike
    the ADA pipeline (`__main__.py:44-51` Input-data group): random
    resized crop with zoom/aspect jitter, flips, rotation. Returns
    f(uint8 (B, H, W, 3), rng) -> uint8 (B, resolution, resolution, 3),
    run in the prefetch thread so it overlaps the train step."""
    import cv2

    def aug(imgs: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        out = np.empty((len(imgs), resolution, resolution, 3), np.uint8)
        for i, im in enumerate(imgs):
            h, w = im.shape[:2]
            if random_rotate:
                deg = rng.uniform(-rotate_degrees, rotate_degrees)
                m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
                im = cv2.warpAffine(im, m, (w, h), flags=cv2.INTER_LINEAR,
                                    borderMode=cv2.BORDER_REFLECT)
            if random_crop:
                zoom = rng.uniform(1.0, max(crop_zoom, 1.0))
                ratio = np.exp(rng.uniform(-crop_ratio, crop_ratio))
                ch = min(int(round(h / zoom * np.sqrt(ratio))), h)
                cw = min(int(round(w / zoom / np.sqrt(ratio))), w)
                y0 = rng.integers(0, h - ch + 1)
                x0 = rng.integers(0, w - cw + 1)
                im = im[y0 : y0 + ch, x0 : x0 + cw]
            if im.shape[:2] != (resolution, resolution):
                im = cv2.resize(im, (resolution, resolution), interpolation=cv2.INTER_AREA)
            if hflip and rng.random() < 0.5:
                im = im[:, ::-1]
            if vflip and rng.random() < 0.5:
                im = im[::-1]
            out[i] = im
        return out

    return aug


class ImageDataset:
    """Epoch iterator over the cached array with device-side
    normalize + random flip (`__main__.py:186-203` decode pipeline)."""

    def __init__(self, cache_file: str, batch_size: int, seed: int = 0, mesh=None,
                 prefetch: int = 2, data_augment=None):
        self.data = np.load(cache_file, mmap_mode="r")
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.mesh = mesh
        self.prefetch = prefetch
        self.data_augment = data_augment  # see make_data_augment

    def __len__(self):
        return len(self.data) // self.batch_size

    def _load_batch(self, order, i) -> jax.Array:
        idx = order[i * self.batch_size : (i + 1) * self.batch_size]
        imgs = np.asarray(self.data[np.sort(idx)])
        if self.data_augment is not None:
            imgs = self.data_augment(imgs, self.rng)
        batch = imgs.astype(np.float32) / 127.5 - 1.0
        arr = jnp.asarray(batch)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            arr = shard_batch(self.mesh, arr)
        return arr

    def __iter__(self) -> Iterator[jax.Array]:
        order = self.rng.permutation(len(self.data))
        if self.prefetch <= 0:
            for i in range(len(self)):
                yield self._load_batch(order, i)
            return
        # background producer: mmap decode + host->device transfer of
        # batch N+1..N+prefetch overlap the train step on batch N
        # (device_put is async; the bounded queue caps staged HBM)
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for i in range(len(self)):
                    # re-check stop before decoding the next batch: a
                    # blocked put can succeed during the shutdown drain,
                    # and the next decode+transfer must not start then
                    if stop.is_set() or not put(self._load_batch(order, i)):
                        return
                put(None)
            except BaseException as e:  # surface in the consumer
                put(e)

        thread = threading.Thread(target=produce, daemon=True, name="maua-data-prefetch")
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # unblock the producer if the consumer bailed early; swallow
            # errors from interpreter-shutdown finalization (threading
            # internals may already be torn down — the thread is daemon)
            stop.set()
            try:
                while not q.empty():
                    q.get_nowait()
                thread.join(timeout=5)
            except Exception:
                pass


def augment_batch(key, batch: jax.Array, p_flip: float = 0.5, p_translate: float = 0.2,
                  max_shift: float = 0.125, p_color: float = 0.1) -> jax.Array:
    """ADA-style differentiable augmentation on device
    (`maua/GAN/training/augmentation/` role): x-flip, integer
    translation, brightness/contrast jitter."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    b, h, w, c = batch.shape

    flip = jax.random.bernoulli(k1, p_flip, (b,))
    batch = jnp.where(flip[:, None, None, None], batch[:, :, ::-1, :], batch)

    do_t = jax.random.bernoulli(k2, p_translate, (b,))
    shift = jax.random.randint(k3, (b, 2), -int(max_shift * h), int(max_shift * h) + 1)
    shift = jnp.where(do_t[:, None], shift, 0)

    def translate_one(img, s):
        return jnp.roll(img, (s[0], s[1]), axis=(0, 1))

    batch = jax.vmap(translate_one)(batch, shift)

    do_c = jax.random.bernoulli(k4, p_color, (b,))
    bright = jax.random.uniform(k5, (b,), minval=-0.2, maxval=0.2)
    batch = jnp.where(do_c[:, None, None, None], jnp.clip(batch + bright[:, None, None, None], -1, 1), batch)
    return batch
