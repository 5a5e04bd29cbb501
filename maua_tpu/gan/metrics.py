"""GAN evaluation metrics: FID, KID, PRDC with pluggable feature
extractors.

Rebuild of `maua/GAN/metrics/` (clean-resize pipeline `compute.py:95+`,
Newton-Schulz sqrtm + frechet_distance `frechet.py:4-61`,
kernel_distance `kernel.py:4`, prdc `prdc.py:40`). The real extractors
— FID InceptionV3 (`extractors/inception.py:26-35`) and SwAV ResNet-50
(`swav.py:142-354`) — live in `gan/extractors.py` with torch
state-dict converters; `ResNetExtractor` below remains only as a tiny
fast stand-in for unit tests of the metric math itself.
"""

from __future__ import annotations

import math

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp



# ------------------------------------------------------------ distances
def sqrtm_newton_schulz(A: jax.Array, num_iters: int = 50) -> jax.Array:
    """Matrix square root via Newton-Schulz iteration
    (`metrics/frechet.py:4-35`)."""
    dim = A.shape[0]
    norm = jnp.linalg.norm(A)
    Y = A / norm
    I = jnp.eye(dim, dtype=A.dtype)
    Z = jnp.eye(dim, dtype=A.dtype)

    def body(_, carry):
        Y, Z = carry
        T = 0.5 * (3.0 * I - Z @ Y)
        return Y @ T, T @ Z

    Y, Z = jax.lax.fori_loop(0, num_iters, body, (Y, Z))
    return Y * jnp.sqrt(norm)


def _sqrtm_psd(A: jax.Array) -> jax.Array:
    eva, eve = jnp.linalg.eigh(A)
    return (eve * jnp.sqrt(jnp.clip(eva, 0.0, None))[None, :]) @ eve.T


def frechet_distance(mu_x: jax.Array, sigma_x: jax.Array, mu_y: jax.Array, sigma_y: jax.Array) -> jax.Array:
    """FID between two Gaussians (`metrics/frechet.py:38-61`).

    tr(sqrtm(Sx Sy)) is computed via the PSD form
    tr(sqrt(sqrt(Sx) Sy sqrt(Sx))) (eigh) — the reference's
    Newton-Schulz iteration diverges on the near-singular covariances
    of small sample sets."""
    sx_half = _sqrtm_psd(sigma_x)
    M = sx_half @ sigma_y @ sx_half
    tr_covmean = jnp.sum(jnp.sqrt(jnp.clip(jnp.linalg.eigvalsh(M), 0.0, None)))
    diff = mu_x - mu_y
    return jnp.sum(diff * diff) + jnp.trace(sigma_x) + jnp.trace(sigma_y) - 2.0 * tr_covmean


def feature_stats(feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
    mu = feats.mean(axis=0)
    c = feats - mu
    sigma = c.T @ c / (feats.shape[0] - 1)
    return mu, sigma


def fid(feats_real: jax.Array, feats_fake: jax.Array, eps: float = 1e-6) -> jax.Array:
    mu_r, sig_r = feature_stats(feats_real)
    mu_f, sig_f = feature_stats(feats_fake)
    # regularize so rank-deficient covariances (few samples) stay
    # numerically stable under Newton-Schulz
    I = jnp.eye(sig_r.shape[0], dtype=sig_r.dtype)
    return frechet_distance(mu_r, sig_r + eps * I, mu_f, sig_f + eps * I)


def kernel_distance(feats_x: jax.Array, feats_y: jax.Array, degree: int = 3, gamma: Optional[float] = None,
                    coef0: float = 1.0) -> jax.Array:
    """Unbiased polynomial-kernel MMD^2 = KID (`metrics/kernel.py:4`)."""
    d = feats_x.shape[1]
    if gamma is None:
        gamma = 1.0 / d
    k_xx = (gamma * feats_x @ feats_x.T + coef0) ** degree
    k_yy = (gamma * feats_y @ feats_y.T + coef0) ** degree
    k_xy = (gamma * feats_x @ feats_y.T + coef0) ** degree
    m = feats_x.shape[0]
    n = feats_y.shape[0]
    sum_xx = (jnp.sum(k_xx) - jnp.trace(k_xx)) / (m * (m - 1))
    sum_yy = (jnp.sum(k_yy) - jnp.trace(k_yy)) / (n * (n - 1))
    sum_xy = jnp.mean(k_xy)
    return sum_xx + sum_yy - 2 * sum_xy


def prdc(feats_real: jax.Array, feats_fake: jax.Array, nearest_k: int = 5) -> Dict[str, jax.Array]:
    """Precision / recall / density / coverage (`metrics/prdc.py:40`)."""

    def pairwise(a, b):
        a2 = jnp.sum(a * a, 1)
        b2 = jnp.sum(b * b, 1)
        return jnp.sqrt(jnp.maximum(a2[:, None] + b2[None] - 2 * a @ b.T, 0.0))

    d_rr = pairwise(feats_real, feats_real)
    d_ff = pairwise(feats_fake, feats_fake)
    d_rf = pairwise(feats_real, feats_fake)

    def kth_radius(d, k):
        return jnp.sort(d, axis=1)[:, k]  # k-th NN excluding self at idx 0

    r_real = kth_radius(d_rr, nearest_k)
    r_fake = kth_radius(d_ff, nearest_k)

    precision = jnp.mean(jnp.any(d_rf < r_real[:, None], axis=0).astype(jnp.float32))
    recall = jnp.mean(jnp.any(d_rf < r_fake[None, :], axis=1).astype(jnp.float32))
    density = jnp.mean(jnp.sum((d_rf < r_real[:, None]).astype(jnp.float32), axis=0)) / nearest_k
    coverage = jnp.mean((jnp.min(d_rf, axis=1) < r_real).astype(jnp.float32))
    return {"precision": precision, "recall": recall, "density": density, "coverage": coverage}


# ------------------------------------------------------------ extractor
def clean_resize(img: jax.Array, size: int = 299) -> jax.Array:
    """Anti-aliased resize for metric features
    (`metrics/compute.py:25-35` clean-fid resize)."""
    b, h, w, c = img.shape
    return jax.image.resize(img, (b, size, size, c), method="bicubic", antialias=True)


class ResNetExtractor:
    """Tiny random-init ResNet trunk — a fast stand-in used by metric
    unit tests only; real FID/KID runs should pass extractor="swav" or
    "inception" (see `gan/extractors.py`)."""

    def __init__(self, width: int = 32, depth: Tuple[int, ...] = (2, 2, 2, 2), feat_dim: int = 512, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = iter(jax.random.split(key, 64))
        nk = lambda: next(keys)
        self.params = {"stem": self._conv_init(nk(), 7, 3, width)}
        blocks = []
        ch = width
        for stage, n in enumerate(depth):
            out_ch = width * 2**stage
            for i in range(n):
                blocks.append({
                    "conv1": self._conv_init(nk(), 3, ch, out_ch),
                    "conv2": self._conv_init(nk(), 3, out_ch, out_ch),
                    "skip": None if ch == out_ch else self._conv_init(nk(), 1, ch, out_ch),
                    "stride": 2 if (i == 0 and stage > 0) else 1,
                })
                ch = out_ch
        self.params["blocks"] = blocks
        self.params["head"] = {"w": jax.random.normal(nk(), (ch, feat_dim)) / math.sqrt(ch)}
        self.feat_dim = feat_dim
        self._fwd = jax.jit(self._forward)

    @staticmethod
    def _conv_init(key, k, ci, co):
        return {"w": jax.random.normal(key, (k, k, ci, co)) * math.sqrt(2.0 / (ci * k * k)), "b": jnp.zeros((co,))}

    def _forward(self, img):
        def conv(p, x, stride=1):
            pad = p["w"].shape[0] // 2
            return jax.lax.conv_general_dilated(
                x, p["w"], (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"]

        x = jax.nn.relu(conv(self.params["stem"], img, stride=2))
        for blk in self.params["blocks"]:
            y = jax.nn.relu(conv(blk["conv1"], x, stride=blk["stride"]))
            y = conv(blk["conv2"], y)
            skip = x if blk["skip"] is None else conv(blk["skip"], x, stride=1)
            if blk["stride"] > 1:
                skip = skip[:, :: blk["stride"], :: blk["stride"], :]
            x = jax.nn.relu(y + skip)
        x = x.mean(axis=(1, 2))
        return x @ self.params["head"]["w"]

    def __call__(self, img: jax.Array) -> jax.Array:
        """img (B, H, W, 3) in [-1, 1] -> (B, feat_dim)."""
        return self._fwd(clean_resize(img, 64))


def compute_metrics(
    real_images: jax.Array,
    fake_images: jax.Array,
    extractor: Optional[Callable] = None,
    batch: int = 32,
    nearest_k: int = 5,
) -> Dict[str, float]:
    """Full metric suite over image batches (`metrics/compute.py:95+`).

    `extractor` may be a callable, or a name: "swav" (reference default,
    `compute.py:100`) / "inception" — the real architectures in
    `gan/extractors.py` (checkpoints slot in via
    `extractors.get_extractor(name, checkpoint)`)."""
    if isinstance(extractor, str):
        from .extractors import get_extractor

        extractor = get_extractor(extractor)
    extractor = extractor or ResNetExtractor()

    def extract(images):
        outs = []
        for i in range(0, len(images), batch):
            outs.append(extractor(jnp.asarray(images[i : i + batch])))
        return jnp.concatenate(outs)

    fr = extract(real_images)
    ff = extract(fake_images)
    out = {"fid": float(fid(fr, ff)), "kid": float(kernel_distance(fr, ff))}
    out.update({k: float(v) for k, v in prdc(fr, ff, nearest_k).items()})
    return out


def compute(
    real_samples,
    fake_samples: Callable,
    n_samples: int = 10_000,
    extractor="swav",
    batch_size: int = 32,
    nearest_k: int = 5,
    ignore_cache: bool = False,
    size: int = 256,
) -> Dict[str, float]:
    """Folder-vs-generator metric run with real-feature caching
    (`metrics/compute.py:95-160`): `real_samples` is an image directory
    (or an array); `fake_samples()` yields a batch of images in [0, 1].
    Real features cache to workspace/cache keyed by folder, extractor,
    and n_samples, like the reference's `cache/<stem>_real_*.npz`."""
    import os

    import numpy as np

    from ..ops.image import resample
    from ..utility import WORKSPACE

    if isinstance(extractor, str):
        from .extractors import get_extractor

        name, extract_fn = extractor, get_extractor(extractor)
    else:
        name, extract_fn = getattr(extractor, "__name__", "custom"), extractor

    def features(batches):
        # batches arrive in [0, 1]; extractors take [-1, 1]
        outs = []
        for b in batches:
            b = jnp.asarray(b, jnp.float32)
            if b.shape[1] != size or b.shape[2] != size:
                b = jnp.clip(resample(b, size), 0, 1)  # clean-resize role (compute.py:25-35)
            outs.append(np.asarray(extract_fn(b * 2 - 1)))
        return np.concatenate(outs)

    # real side: folder with caching, or raw arrays
    if isinstance(real_samples, (str, os.PathLike)):
        cache_dir = os.path.join(WORKSPACE, "cache")
        stem = os.path.basename(os.path.normpath(str(real_samples)))
        cache_file = os.path.join(cache_dir, f"{stem}_real_{name}_{n_samples}_features.npz")
        if os.path.exists(cache_file) and not ignore_cache:
            fr = np.load(cache_file)["features"]
        else:
            from ..ops.io import load_image

            exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
            paths = sorted(
                os.path.join(str(real_samples), f)
                for f in os.listdir(str(real_samples)) if f.lower().endswith(exts)
            )[:n_samples]
            if not paths:
                raise ValueError(f"no images found in {real_samples}")
            batches = (
                np.concatenate([np.asarray(resample(jnp.asarray(load_image(p)), size)) for p in paths[i : i + batch_size]])
                for i in range(0, len(paths), batch_size)
            )
            fr = features(batches)
            os.makedirs(cache_dir, exist_ok=True)
            np.savez(cache_file, features=fr)
    else:
        arr = np.asarray(real_samples)[:n_samples]
        fr = features(arr[i : i + batch_size] for i in range(0, len(arr), batch_size))

    n_fake = min(n_samples, len(fr))
    ff = []
    while sum(len(f) for f in ff) < n_fake:
        ff.append(np.asarray(features([fake_samples()])))
    ff = np.concatenate(ff)[:n_fake]

    fr_j, ff_j = jnp.asarray(fr[: len(ff)]), jnp.asarray(ff)
    out = {"fid": float(fid(fr_j, ff_j)), "kid": float(kernel_distance(fr_j, ff_j))}
    out.update({k: float(v) for k, v in prdc(fr_j, ff_j, nearest_k).items()})
    return out
