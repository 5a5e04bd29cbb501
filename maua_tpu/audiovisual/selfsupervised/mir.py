"""Music information retrieval for self-supervised patches.

Rebuild of `selfsupervised/mir.py:24-45`: 8 features x multiple
segmentation granularities + tempo.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ...audio import beat as _beat
from ...audio import segment as _segment
from ...ops.signal import gaussian_filter, normalize
from .features import extract_features, salience_weighted

HOP = 1024


def segment_feature(feature: jnp.ndarray, beats: np.ndarray, ks: Sequence[int]) -> List[np.ndarray]:
    """Laplacian segmentation of a (T, F) feature matrix at several k,
    returning per-frame labels (role of `rosa/segment.py:133-190` on
    beat-synced features)."""
    t = feature.shape[0]
    beats = np.asarray([b for b in beats if 0 <= b < t])
    if len(beats) < max(ks) + 2:
        beats = np.linspace(0, t - 1, max(max(ks) + 2, 8)).astype(int)
    Xsync = _segment.sync_median(jnp.asarray(feature).T, beats, len(beats))
    R = _segment.recurrence_matrix(Xsync, width=2, sym=True)
    Rf = _segment.timelag_median_filter(R, size=5)
    deg = Rf.sum(axis=1)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-10))
    L = jnp.eye(Rf.shape[0]) - (dinv[:, None] * Rf) * dinv[None, :]
    evals, evecs = jnp.linalg.eigh(L)
    outs = []
    for k in ks:
        Cnorm = jnp.sqrt(jnp.cumsum(jnp.square(evecs), axis=1))
        X = evecs[:, :k] / jnp.maximum(Cnorm[:, k - 1 : k], 1e-10)
        labels, _ = _segment.kmeans(X, k)
        labels = np.asarray(labels)
        # upsample beat labels to frames
        frame_labels = np.zeros(t, np.int32)
        bounds = list(beats) + [t]
        for i in range(len(beats)):
            frame_labels[bounds[i] : bounds[i + 1]] = labels[i]
        frame_labels[: bounds[0]] = labels[0]
        outs.append(frame_labels)
    return outs


def retrieve_music_information(audio, sr, ks: Sequence[int] = (2, 4, 6, 8, 12, 16)):
    """(`selfsupervised/mir.py:24-45`): returns (features dict,
    segmentations dict keyed (name, k), tempo)."""
    raw_feats = extract_features(audio, sr)

    onset_env = _beat.onset_strength(jnp.asarray(audio), sr=sr, hop_length=HOP)
    tempo = float(_beat.tempo(onset_env, sr=sr, hop_length=HOP, start_bpm=120.0, max_tempo=240.0))
    t = next(iter(raw_feats.values())).shape[0]
    frames_per_beat = max((60.0 / max(tempo, 1e-3)) * sr / HOP, 1.0)
    beats = np.arange(frames_per_beat, t, frames_per_beat).astype(int)

    segmentations: Dict[Tuple[str, int], np.ndarray] = {}
    for name, feature in raw_feats.items():
        for k, seg in zip(ks, segment_feature(feature, beats, ks)):
            segmentations[(name, k)] = seg

    features = {k: normalize(salience_weighted(gaussian_filter(f, 2.0))) for k, f in raw_feats.items()}
    return features, segmentations, tempo
