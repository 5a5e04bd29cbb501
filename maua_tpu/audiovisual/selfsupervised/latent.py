"""Latent sequence construction for self-supervised patches.

Rebuild of `selfsupervised/latent.py:7-80` (wrapping spline loops +
latent_patch merge rules).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...audio.latent import natural_cubic_spline_coeffs, natural_cubic_spline_evaluate
from ...ops.signal import gaussian_filter


def spline_loop_latents(y: jax.Array, size: int, n_loops: float = 1.0) -> jax.Array:
    """Natural-cubic-spline loop with wrapped time
    (`selfsupervised/latent.py:7-14`). (K, L, D) -> (size, L, D)."""
    y = jnp.concatenate([y, y[:1]], axis=0)
    t_in = jnp.linspace(0.0, 1.0, y.shape[0])
    t_out = jnp.mod(jnp.linspace(0.0, float(n_loops), size), 1.0)
    coeffs = natural_cubic_spline_coeffs(t_in, y)
    return natural_cubic_spline_evaluate(coeffs, t_out)


_DEPTH_SLICES = {
    "low": (0, 6),
    "mid": (6, 12),
    "high": (12, 18),
    "lowmid": (0, 12),
    "midhigh": (6, 18),
    "all": (0, 18),
}


def latent_patch(
    key,
    latents: jax.Array,  # (T, L, D)
    palette: jax.Array,  # (P, L, D)
    segmentations: Dict,
    features: Dict,
    tempo: float,
    fps: float,
    patch_type: str,
    segments: int,
    loop_bars: int,
    seq_feat: str,
    seq_feat_weight: float,
    mod_feat: str,
    mod_feat_weight: float,
    merge_type: str,
    merge_depth: str,
) -> jax.Array:
    """Apply one random latent subpatch (`selfsupervised/latent.py:17-80`)."""
    t, n_layers, d = latents.shape
    feature = seq_feat_weight * jnp.asarray(features[seq_feat])[:t]
    permutation = jax.random.permutation(key, palette.shape[0])

    if patch_type == "segmentation":
        segmentation = np.asarray(segmentations[(seq_feat, int(segments))])[:t]
        selection = permutation[: int(segments)]
        sequence = palette[selection[jnp.asarray(segmentation)]]
        sequence = gaussian_filter(sequence, 5.0)
    elif patch_type == "feature":
        n_select = feature.shape[1]
        if n_select == 1:
            selection = permutation[:2]
            f = feature[..., None]
            sequence = f * palette[selection][0][None] + (1 - f) * palette[selection][1][None]
        else:
            # wrap when the feature has more channels than the palette
            selection = permutation[jnp.arange(n_select) % permutation.shape[0]]
            sequence = jnp.einsum("TN,NWL->TWL", feature, palette[selection])
    else:  # loop
        selection = permutation[: int(segments)]
        n_loops = max(t / fps * max(tempo, 1e-3) / 60 / 4 / loop_bars, 0.25)
        sequence = spline_loop_latents(palette[selection], t, n_loops=n_loops)
    sequence = gaussian_filter(sequence, 1.0)

    lo, hi = _DEPTH_SLICES[merge_depth]
    hi = min(hi, n_layers)
    if merge_type == "average":
        merged = (latents[:, lo:hi] + sequence[:, lo:hi]) / 2
    elif merge_type == "modulate":
        modulation = mod_feat_weight * jnp.asarray(features[mod_feat])[:t, :1][..., None]
        merged = latents[:, lo:hi] * (1 - modulation) + modulation * sequence[:, lo:hi]
    else:
        merged = sequence[:, lo:hi]
    return latents.at[:, lo:hi].set(merged)
