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


# ---------------------------------------------------------------- the
# reference's full descriptor set (`features/video.py:12-190`)


def _histogram(chan: np.ndarray, bins: int) -> np.ndarray:
    """Per-frame histogram over the frame's own value range
    (torch.histc default semantics), max-normalized."""
    hist = np.stack([
        np.histogram(f, bins=bins, range=(float(f.min()), float(f.max()) + 1e-6))[0] for f in chan
    ]).astype(np.float32)
    return hist / np.maximum(hist.max(axis=1, keepdims=True), 1e-10)


def redogram(frames: np.ndarray, bins: int = 32) -> np.ndarray:
    return _histogram(frames[..., 0], bins)


def greenogram(frames: np.ndarray, bins: int = 32) -> np.ndarray:
    return _histogram(frames[..., 1], bins)


def blueogram(frames: np.ndarray, bins: int = 32) -> np.ndarray:
    return _histogram(frames[..., 2], bins)


def rgb_hist(frames: np.ndarray, bins: int = 96) -> np.ndarray:
    b = bins // 3
    return np.concatenate([redogram(frames, b), greenogram(frames, b), blueogram(frames, b)], -1)


def _rgb_to_hsv(frames: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) RGB [0,1] -> HSV with hue in radians (kornia
    convention used by the reference)."""
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    maxc = frames.max(-1)
    minc = frames.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-10), 0.0)
    dz = np.maximum(delta, 1e-10)
    h = np.where(
        maxc == r, (g - b) / dz % 6.0, np.where(maxc == g, (b - r) / dz + 2.0, (r - g) / dz + 4.0)
    )
    h = np.where(delta > 0, h, 0.0) * (np.pi / 3.0)
    return np.stack([h, s, v], axis=-1)


def huestogram(frames: np.ndarray, bins: int = 32) -> np.ndarray:
    return _histogram(_rgb_to_hsv(frames)[..., 0], bins)


def saturogram(frames: np.ndarray, bins: int = 32) -> np.ndarray:
    return _histogram(_rgb_to_hsv(frames)[..., 1], bins)


def valueogram(frames: np.ndarray, bins: int = 32) -> np.ndarray:
    return _histogram(_rgb_to_hsv(frames)[..., 2], bins)


def hsv_hist(frames: np.ndarray, bins: int = 96) -> np.ndarray:
    b = bins // 3
    return np.concatenate([huestogram(frames, b), saturogram(frames, b), valueogram(frames, b)], -1)


def visual_variance(frames: np.ndarray) -> np.ndarray:
    return frames.reshape(len(frames), -1).var(axis=1)[:, None]


def absdiff(frames: np.ndarray) -> np.ndarray:
    """Per-frame total absolute change vs the previous frame
    (`video.py:66-76`; last value repeated)."""
    d = np.abs(np.diff(frames, axis=0)).reshape(len(frames) - 1, -1).sum(axis=1)
    return np.concatenate([d, d[-1:]])[:, None].astype(np.float32)


def video_spectrogram(frames: np.ndarray) -> np.ndarray:
    """Radial spatial-frequency profile per frame (`video.py:79-98`):
    |rfft2| quarter-plane, quantile-clamped, log-polar warped, averaged
    over channels and angles."""
    t, h, w, _ = frames.shape
    freqs = np.abs(np.fft.rfft2(frames, axes=(1, 2), norm="forward"))[:, : h // 2, : w // 2]
    lo, hi = np.quantile(freqs, 0.0015), np.quantile(freqs, 0.9985)
    freqs = np.clip(freqs, lo, hi).astype(np.float32)
    try:
        import cv2

        radius = max(h, w) // 4
        polar = np.stack([
            np.stack([cv2.linearPolar(freqs[i, :, :, c], (0, 0), radius, cv2.WARP_FILL_OUTLIERS)
                      for c in range(freqs.shape[-1])], 0)
            for i in range(t)
        ])  # (T, C, angle, radius)
        spec = polar.mean(axis=(1, 2))
    except Exception:
        # radial-bin fallback without cv2
        yy, xx = np.meshgrid(np.arange(h // 2), np.arange(w // 2), indexing="ij")
        rad = np.sqrt(yy**2 + xx**2).astype(int)
        nb = min(h, w) // 2
        spec = np.stack([
            np.bincount(rad.ravel(), weights=freqs[i].mean(-1).ravel(), minlength=nb)[:nb]
            / np.maximum(np.bincount(rad.ravel(), minlength=nb)[:nb], 1)
            for i in range(t)
        ]).astype(np.float32)
    return spec[:, 2:]


def low_freq_rms(frames: np.ndarray) -> np.ndarray:
    spec = video_spectrogram(frames)
    f = spec.shape[1]
    return (spec[:, : f // 3] ** 2).mean(axis=1, keepdims=True)


def mid_freq_rms(frames: np.ndarray) -> np.ndarray:
    spec = video_spectrogram(frames)
    f = spec.shape[1]
    return (spec[:, f // 3 : 2 * f // 3] ** 2).mean(axis=1, keepdims=True)


def high_freq_rms(frames: np.ndarray) -> np.ndarray:
    spec = video_spectrogram(frames)
    f = spec.shape[1]
    return (spec[:, 2 * f // 3 :] ** 2).mean(axis=1, keepdims=True)


def adaptive_freq_rms(frames: np.ndarray, k: int = 10) -> np.ndarray:
    spec = video_spectrogram(frames)
    k = min(k, spec.shape[1])
    idx = np.argsort(spec.std(axis=0))[-k:]
    return (spec[:, idx] ** 2).mean(axis=1, keepdims=True)


def _flows(frames: np.ndarray) -> np.ndarray:
    return np.stack([farneback_flow(frames[i], frames[i + 1]) for i in range(len(frames) - 1)])


def directogram(flow: np.ndarray, bins: int = 8) -> np.ndarray:
    """Magnitude-weighted flow-direction histogram per frame
    (`video.py:160-177`), 3-tap median-smoothed along time."""
    mag = np.sqrt((flow**2).sum(-1))
    ang = np.arctan2(flow[..., 1], flow[..., 0]) % (2 * np.pi)
    dg = np.stack([
        np.histogram(ang[i], bins=bins, range=(0, 2 * np.pi), weights=mag[i])[0] for i in range(len(flow))
    ]).astype(np.float32)
    if len(dg) >= 3:
        padded = np.concatenate([dg[:1], dg, dg[-1:]])
        dg = np.median(np.stack([padded[:-2], padded[1:-1], padded[2:]]), axis=0)
    return dg


def spectral_flux(spec: np.ndarray) -> np.ndarray:
    """(`processing.py:89-91`)"""
    return np.diff(spec, axis=0, append=np.zeros((1, spec.shape[1]), spec.dtype))


def onset_envelope(flux: np.ndarray) -> np.ndarray:
    """Half-wave-rectified flux sum, quantile-clamped, [0,1]
    (`processing.py:94-99`)."""
    u = (0.5 * (flux + np.abs(flux))).sum(axis=1)
    u = np.clip(u, np.quantile(u, 0.025), np.quantile(u, 0.975))
    u = u - u.min()
    return (u / max(u.max(), 1e-10)).astype(np.float32)


def video_flow_onsets(frames: np.ndarray) -> np.ndarray:
    """(`video.py:179-184`)"""
    dg = directogram(_flows(frames))
    onset = onset_envelope(spectral_flux(dg))
    return np.concatenate([onset[:1], onset])[:, None]


def video_spectral_onsets(frames: np.ndarray) -> np.ndarray:
    """(`video.py:187-190`)"""
    return onset_envelope(spectral_flux(video_spectrogram(frames)))[:, None]


def extract_video_features(frames: np.ndarray, n_frames_out: int = None) -> Dict[str, np.ndarray]:
    """frames (T, H, W, 3) in [0, 1] -> feature dict; optionally
    resampled to the audio feature frame count."""
    spec = video_spectrogram(frames)
    f = spec.shape[1]
    feats = {
        "luminance": luminance_envelope(frames)[:, None],
        "color": color_moments(frames),
        "edges": edge_energy(frames)[:, None],
        "flow": flow_magnitude(frames)[:, None],
        "rgb_hist": rgb_hist(frames),
        "hsv_hist": hsv_hist(frames),
        "visual_variance": visual_variance(frames),
        "absdiff": absdiff(frames),
        "low_freq_rms": (spec[:, : f // 3] ** 2).mean(axis=1, keepdims=True),
        "mid_freq_rms": (spec[:, f // 3 : 2 * f // 3] ** 2).mean(axis=1, keepdims=True),
        "high_freq_rms": (spec[:, 2 * f // 3 :] ** 2).mean(axis=1, keepdims=True),
        "adaptive_freq_rms": adaptive_freq_rms(frames),
        "flow_onsets": video_flow_onsets(frames),
        "spectral_onsets": video_spectral_onsets(frames),
    }
    if n_frames_out is not None:
        feats = {k: np.asarray(resample_1d(jnp.asarray(v), n_frames_out)) for k, v in feats.items()}
    return feats


def video_feature_matrix(frames: np.ndarray, n_frames_out: int = None) -> np.ndarray:
    feats = extract_video_features(frames, n_frames_out)
    return np.concatenate(list(feats.values()), axis=1)
