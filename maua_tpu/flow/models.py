"""Optical flow estimators.

Rebuild of `maua/flow/__init__.py:9-64`: the reference averages an
ensemble of estimators (sniklaus pwc/spynet, mmflow RAFT/GMA — all in
stripped submodules) with cv2 Farneback as the default. Here:
Farneback via cv2 on host (the reference default), plus a pure-JAX
multiscale Lucas-Kanade/Horn-Schunck hybrid usable on device; model
ensembling averages whatever estimators are requested.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def farneback_flow(frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
    """cv2 Farneback (reference default, `flow/__init__.py:55-62`).
    frames (H, W, 3) in [0, 1] -> flow (H, W, 2) in pixels."""
    import cv2

    g1 = cv2.cvtColor((np.asarray(frame1) * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor((np.asarray(frame2) * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    return cv2.calcOpticalFlowFarneback(
        g1, g2, None, pyr_scale=0.5, levels=5, winsize=15, iterations=3, poly_n=5, poly_sigma=1.2, flags=0
    ).astype(np.float32)


def _gray(x):
    return 0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def _hs_level(i1, i2, flow, n_iter: int = 40, alpha: float = 0.01):
    """Horn-Schunck refinement at one pyramid level (jittable)."""
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32) / 8.0
    kx = ky.T

    def convolve(img, k):
        return jax.lax.conv_general_dilated(
            img[None, :, :, None], k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    from ..ops.warp import grid_sample, identity_grid

    h, w = i1.shape

    def warp(img, f):
        grid = identity_grid(1, h, w)
        norm = jnp.asarray([2.0 / w, 2.0 / h])
        return grid_sample(img[None, :, :, None], grid + f[None] * norm, padding_mode="border")[0, :, :, 0]

    avg_k = jnp.array([[1, 2, 1], [2, 0, 2], [1, 2, 1]], jnp.float32) / 12.0

    def body(_, f):
        # warped incremental update: smooth the field, measure the
        # residual at the smoothed estimate, take a regularized
        # gradient-descent step on the brightness constancy error
        f_s = jnp.stack([convolve(f[..., 0], avg_k), convolve(f[..., 1], avg_k)], axis=-1)
        i2w = warp(i2, f_s)
        ix = 0.5 * (convolve(i1, kx) + convolve(i2w, kx))
        iy = 0.5 * (convolve(i1, ky) + convolve(i2w, ky))
        it = i2w - i1
        denom = alpha + ix**2 + iy**2
        du = -ix * it / denom
        dv = -iy * it / denom
        step = jnp.clip(jnp.stack([du, dv], axis=-1), -1.0, 1.0)
        return f_s + step

    return jax.lax.fori_loop(0, n_iter, body, flow)


def jax_flow(frame1, frame2, levels: int = 4) -> jnp.ndarray:
    """Coarse-to-fine Horn-Schunck flow fully on device.
    frames (H, W, 3) in [0, 1] -> (H, W, 2) pixels."""
    i1 = _gray(jnp.asarray(frame1, jnp.float32))
    i2 = _gray(jnp.asarray(frame2, jnp.float32))
    h, w = i1.shape
    flow = jnp.zeros((h // 2 ** (levels - 1), w // 2 ** (levels - 1), 2))
    for lvl in range(levels - 1, -1, -1):
        hs, ws = h // 2**lvl, w // 2**lvl
        p1 = jax.image.resize(i1, (hs, ws), "bilinear")
        p2 = jax.image.resize(i2, (hs, ws), "bilinear")
        if flow.shape[:2] != (hs, ws):
            flow = jax.image.resize(flow, (hs, ws, 2), "bilinear") * 2.0
        flow = _hs_level(p1, p2, flow)
    return flow


def _neural_params(name: str, candidates: Sequence[str], convert: Callable,
                   allow_random: bool):
    """Load + convert the first present torch checkpoint in modelzoo/.

    A neural estimator with RANDOM weights silently corrupts every
    downstream warp when averaged into the ensemble, so a missing
    checkpoint RAISES unless the caller explicitly opts in with
    allow_random=True (architecture smoke runs / tests). The reference
    hard-depends on its submodule checkpoints instead
    (`maua/flow/__init__.py:24-49`)."""
    import os

    from ..utility import MODELZOO

    errs = []
    for fname in candidates:
        ckpt = os.path.join(MODELZOO, fname)
        if os.path.exists(ckpt):
            try:
                import torch

                sd = torch.load(ckpt, map_location="cpu", weights_only=False)
                if isinstance(sd, dict) and "model" in sd:
                    sd = sd["model"]  # training-state wrapper (raft/gma)
                sd = {k: v.float().numpy() for k, v in sd.items()}
                return convert(sd)
            except Exception as e:
                errs.append(f"{ckpt}: {e}")
    if allow_random:
        if errs:
            print(f"{name} checkpoint load failed ({'; '.join(errs)}); using random init")
        return None
    paths = ", ".join(os.path.join(MODELZOO, f) for f in candidates)
    raise FileNotFoundError(
        f"flow model {name!r} has no checkpoint (looked for: {paths})"
        + (f"; load errors: {'; '.join(errs)}" if errs else "")
        + " -- pass allow_random=True to get_flow_model to run it with random weights"
    )


def get_flow_model(which: Sequence[str] = ("farneback",), allow_random: bool = False) -> Callable:
    """Ensemble-averaged flow callable (`flow/__init__.py:9-64`).
    Returns fn(frame1, frame2) -> (H, W, 2) numpy flow.

    Neural estimators (spynet/pwc/liteflownet/unflow/raft/gma) need
    their converted checkpoints in modelzoo/ and raise FileNotFoundError
    when absent; allow_random=True opts into random initialization
    instead (tests, architecture smoke runs)."""
    fns: List[Callable] = []
    for name in which:
        if name == "farneback":
            fns.append(farneback_flow)
        elif name in ("hs", "jax"):
            fns.append(lambda a, b: np.asarray(jax_flow(a, b)))
        elif name == "unflow":
            # TPU-native UnFlow-CSS (flow/unflow.py); weights convert
            # from the published network-css.pytorch
            from . import unflow as unflow_mod

            p = _neural_params(name, ("unflow.pth", "network-css.pytorch", "unflow_css.pth"),
                               unflow_mod.params_from_torch, allow_random)
            fns.append(lambda a, b, _p=p: unflow_mod.unflow_flow(a, b, params=_p))
        elif name == "liteflownet":
            # TPU-native LiteFlowNet (flow/liteflownet.py); weights
            # convert from the sniklaus network-default.pytorch
            from . import liteflownet as lfn_mod

            p = _neural_params(name, ("liteflownet.pth", "network-default-lfn.pytorch",
                                      "liteflownet_default.pth"),
                               lfn_mod.params_from_torch, allow_random)
            fns.append(lambda a, b, _p=p: lfn_mod.liteflownet_flow(a, b, params=_p))
        elif name in ("raft", "gma", "raft_large"):
            # TPU-native RAFT / GMA (flow/raft.py); weights convert
            # from torchvision raft_large or the published GMA ckpts
            from . import raft as raft_mod

            gma = name == "gma"
            p = _neural_params(
                name,
                ("gma-sintel.pth", "gma-things.pth", "gma.pth") if gma else ("raft_large.pth",),
                raft_mod.params_from_torch_gma if gma else raft_mod.params_from_torch,
                allow_random,
            )
            if p is None and gma:
                p = raft_mod.init_params(jax.random.PRNGKey(0), gma=True)
            fns.append(lambda a, b, _p=p: raft_mod.raft_flow(a, b, params=_p))
        elif name in ("pwc", "pwcnet"):
            # TPU-native PWC-Net (flow/pwc.py); weights convert from
            # the sniklaus network-default.pytorch
            from . import pwc as pwc_mod

            p = _neural_params(name, ("pwc.pth", "network-default.pytorch", "pwc_default.pth"),
                               pwc_mod.params_from_torch, allow_random)
            fns.append(lambda a, b, _p=p: pwc_mod.pwc_flow(a, b, params=_p))
        elif name == "spynet":
            # TPU-native SpyNet (flow/spynet.py); weights convert from
            # the published pytorch-spynet checkpoints
            from . import spynet as spynet_mod

            p = _neural_params(name, ("spynet.pth", "network-sintel-final.pytorch",
                                      "spynet_sintel_final.pth"),
                               spynet_mod.params_from_torch, allow_random)
            fns.append(lambda a, b, _p=p: spynet_mod.spynet_flow(a, b, params=_p))
        else:
            print(f"flow model {name} unavailable in this build; using farneback")
            fns.append(farneback_flow)

    def model(frame1, frame2):
        flows = [np.asarray(fn(frame1, frame2)) for fn in fns]
        return np.mean(flows, axis=0)

    return model
