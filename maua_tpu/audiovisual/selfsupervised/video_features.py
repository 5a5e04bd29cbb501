"""Video feature trajectories for audio-video alignment evaluation.

Rebuild of `selfsupervised/features/video.py:12-190`: per-frame visual
descriptors (luminance/color moments, edge energy, optical-flow
magnitude via the farneback pool) resampled to the audio feature rate.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from ...flow.models import farneback_flow
from ...ops.signal import resample_1d


def luminance_envelope(frames: np.ndarray) -> np.ndarray:
    """(T,) mean luma per frame."""
    return (0.2989 * frames[..., 0] + 0.587 * frames[..., 1] + 0.114 * frames[..., 2]).mean(axis=(1, 2))


def color_moments(frames: np.ndarray) -> np.ndarray:
    """(T, 6) per-channel mean + std."""
    mean = frames.mean(axis=(1, 2))
    std = frames.std(axis=(1, 2))
    return np.concatenate([mean, std], axis=1)


def edge_energy(frames: np.ndarray) -> np.ndarray:
    """(T,) mean gradient magnitude."""
    gray = 0.2989 * frames[..., 0] + 0.587 * frames[..., 1] + 0.114 * frames[..., 2]
    gx = np.diff(gray, axis=2, append=gray[:, :, -1:])
    gy = np.diff(gray, axis=1, append=gray[:, -1:, :])
    return np.sqrt(gx**2 + gy**2).mean(axis=(1, 2))


def flow_magnitude(frames: np.ndarray) -> np.ndarray:
    """(T,) mean optical-flow magnitude (farneback pool,
    `features/video.py:120-190`)."""
    mags = [0.0]
    for i in range(len(frames) - 1):
        flow = farneback_flow(frames[i], frames[i + 1])
        mags.append(float(np.sqrt((flow**2).sum(-1)).mean()))
    return np.asarray(mags, np.float32)


def extract_video_features(frames: np.ndarray, n_frames_out: int = None) -> Dict[str, np.ndarray]:
    """frames (T, H, W, 3) in [0, 1] -> feature dict; optionally
    resampled to the audio feature frame count."""
    feats = {
        "luminance": luminance_envelope(frames)[:, None],
        "color": color_moments(frames),
        "edges": edge_energy(frames)[:, None],
        "flow": flow_magnitude(frames)[:, None],
    }
    if n_frames_out is not None:
        feats = {k: np.asarray(resample_1d(jnp.asarray(v), n_frames_out)) for k, v in feats.items()}
    return feats


def video_feature_matrix(frames: np.ndarray, n_frames_out: int = None) -> np.ndarray:
    feats = extract_video_features(frames, n_frames_out)
    return np.concatenate(list(feats.values()), axis=1)
