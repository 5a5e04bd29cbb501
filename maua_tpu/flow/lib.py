"""Flow utilities: JPEG-safe mflo codec, warp maps, consistency maps,
cached preprocessing.

Rebuild of `maua/flow/lib.py` (encode/decode_mflo :18-48,
flow_warp_map :51-63, get_consistency_map :66-80,
preprocess_optical_flow :84-135).
"""

from __future__ import annotations

import os
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.warp import identity_grid
from ..utility import WORKSPACE
from .consistency import check_consistency


def encode_mflo(flow: np.ndarray) -> np.ndarray:
    """Pack float flow into a JPEG-safe uint8 image: u,v normalized to
    [0,255] + absmax float encoded into byte quadrants
    (`flow/lib.py:18-34`)."""
    absmax = np.max(np.abs(flow))
    if absmax == 0:
        absmax = 1e-8
    one, two, three, four = struct.pack("!f", np.float32(absmax))
    h, w, _ = flow.shape
    absmax_channel = np.zeros((h, w, 1), dtype=np.uint8)
    absmax_channel[: h // 2, : w // 2] = one
    absmax_channel[: h // 2, w // 2 :] = two
    absmax_channel[h // 2 :, : w // 2] = three
    absmax_channel[h // 2 :, w // 2 :] = four
    mflo = np.round((flow / absmax + 1) * 127.5).astype(np.uint8)
    return np.concatenate((mflo, absmax_channel), axis=2)


def decode_mflo(mflo: np.ndarray) -> np.ndarray:
    """(`flow/lib.py:37-48`)"""
    h, w, _ = mflo.shape
    ac = mflo[..., 2].astype(np.float32)
    one = np.uint8(np.round(np.mean(ac[: h // 2, : w // 2])))
    two = np.uint8(np.round(np.mean(ac[: h // 2, w // 2 :])))
    three = np.uint8(np.round(np.mean(ac[h // 2 :, : w // 2])))
    four = np.uint8(np.round(np.mean(ac[h // 2 :, w // 2 :])))
    (absmax,) = struct.unpack("!f", bytes([one, two, three, four]))
    return (mflo[..., :2].astype(np.float32) / 127.5 - 1) * absmax


def flow_warp_map(flow: jax.Array) -> jax.Array:
    """Pixel flow (B, H, W, 2) -> normalized grid_sample map
    (`flow/lib.py:51-63`)."""
    flow = jnp.asarray(flow, jnp.float32)
    if flow.ndim == 3:
        flow = flow[None]
    b, h, w, _ = flow.shape
    norm = jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
    return identity_grid(b, h, w) + flow * norm


def get_consistency_map(forward_flow, backward_flow, consistency: str = "full") -> jax.Array:
    """(`flow/lib.py:66-80`)"""
    forward_flow = jnp.asarray(forward_flow)
    if consistency == "magnitude":
        return jnp.sqrt(jnp.sum(jnp.square(forward_flow), axis=-1))
    if consistency in ("full", "numpy"):
        return check_consistency(forward_flow, jnp.asarray(backward_flow))
    shape = forward_flow.shape
    return jnp.ones(shape[-3:-1] if len(shape) >= 3 else shape[:2])


def preprocess_optical_flow(video_file: str, flow_model, consistency: str = "full",
                            max_frames: Optional[int] = None) -> Tuple[np.ndarray, ...]:
    """Estimate + cache per-frame forward/backward/reliable flow
    (`flow/lib.py:84-135`). Returns (frames, forward, backward,
    reliable) numpy arrays (frames NHWC in [0,1])."""
    from ..ops.video import read_video

    stem = Path(video_file).stem
    if max_frames is not None:
        stem += f"_n{max_frames}"  # cache keyed on frame count too
    os.makedirs(WORKSPACE, exist_ok=True)
    frf = f"{WORKSPACE}/{stem}_content.npy"
    fwf = f"{WORKSPACE}/{stem}_forward_flow.npy"
    bkf = f"{WORKSPACE}/{stem}_backward_flow.npy"
    rlf = f"{WORKSPACE}/{stem}_reliable_{consistency}_flow.npy"

    if not (os.path.exists(frf) and os.path.exists(fwf) and os.path.exists(bkf)):
        frames, _ = read_video(video_file, max_frames=max_frames)
        n = len(frames)
        forward = np.stack([flow_model(frames[i], frames[(i + 1) % n]) for i in range(n)])
        backward = np.stack([flow_model(frames[(i + 1) % n], frames[i]) for i in range(n)])
        np.save(frf, frames)
        np.save(fwf, forward)
        np.save(bkf, backward)

    frames = np.load(frf, mmap_mode="r")
    forward = np.load(fwf, mmap_mode="r")
    backward = np.load(bkf, mmap_mode="r")

    if not os.path.exists(rlf):
        reliable = np.stack(
            [np.asarray(get_consistency_map(f, b, consistency)) for f, b in zip(forward, backward)]
        ).astype(np.float32)
        np.save(rlf, reliable)
    reliable = np.load(rlf, mmap_mode="r")
    return frames, forward, backward, reliable
