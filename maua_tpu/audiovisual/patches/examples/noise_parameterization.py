"""Noise-parameterization example patch.

Rebuild of `maua/audiovisual/patches/examples/noise_parameterization.py:43-128`:
envelope-mixed latents (onset/volume/tonnetz driven blends of spline
loops and chroma-weighted colors) plus a structured noise pyramid — a
rotating perlin-noise annulus composited over static perlin inside a
circular disc mask, per-frame rotation completing one revolution every
few seconds. Deterministic JAX PRNG replaces the reference's
`random.choice` calls (seeded, so renders are reproducible).
"""

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.audiovisual import audioreactive as ar
from maua_tpu.ops.noise import perlin_noise
from maua_tpu.ops.warp import rotate
from maua_tpu.audiovisual.patches.base import StyleGAN2Patch


def circular_mask(h, w, radius=None):
    cy, cx = h / 2, w / 2
    radius = radius if radius is not None else min(cx, cy)
    yy, xx = np.ogrid[:h, :w]
    return (np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2) <= radius).astype(np.float32)


class NoiseParameterization(StyleGAN2Patch):
    seed = 42

    def process_audio(self):
        n = self.n_frames
        self.onsets = ar.onsets(self.audio, self.sr, n, clip=95, smooth=40).reshape(-1, 1, 1)
        self.volume = ar.volume(self.audio, self.sr, n, smooth=80).reshape(-1, 1, 1)
        self.chroma = ar.chroma(self.audio, self.sr, n)

    def process_mapper_inputs(self):
        return {"latent_z": self.stylegan2.get_z_latents("1-40,400-440")}

    def process_synthesizer_inputs(self, latent_w):
        n = self.n_frames
        rng = np.random.RandomState(self.seed)
        sel = lambda pool, k: pool[rng.permutation(pool.shape[0])[:k]]

        base_structure = sel(latent_w[:40], 10)
        chroma_colors = sel(latent_w[40:], 12)
        onset_colors = sel(latent_w[40:], rng.choice(range(3, 7)))
        volume_colors = sel(latent_w[40:], rng.choice(range(3, 7)))

        latents = ar.chroma_weight_latents(self.chroma, chroma_colors)
        base_loop = ar.spline_loops(base_structure, n, n_loops=int(rng.choice(range(1, 3))))
        onset_latents = ar.spline_loops(onset_colors, n, n_loops=int(rng.choice(range(2, 7))))
        volume_latents = ar.spline_loops(volume_colors, n, n_loops=int(rng.choice(range(2, 7))))

        latents = latents.at[:, :4].set(base_loop[:, :4])
        latents = (1 - self.volume) * latents + self.volume * volume_latents
        latents = (1 - self.onsets) * latents + self.onsets * onset_latents
        latents = ar.gaussian_filter(latents, 2)

        # one revolution every ~6-8 seconds, tiled over the video
        steps_per_rev = int(rng.choice([6, 6.5, 7, 8]) * self.fps)
        revolution = -np.linspace(0, 360 * (1 - 1 / steps_per_rev), steps_per_rev, dtype=np.float32)
        angles = np.resize(np.tile(revolution, max(n // steps_per_rev + 1, 1)), n)

        s = 64
        time_res = int(rng.choice([4, 8]))
        space_res = int(rng.choice([4, 8]))
        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        rot_src = perlin_noise(k1, (n, s, s), (time_res, space_res, space_res))[..., None]
        rotating = rotate(rot_src, jnp.asarray(angles), padding_mode="reflection")
        static = perlin_noise(k2, (n, s, s), (time_res, space_res, space_res))[..., None]

        disc = circular_mask(s, s) - circular_mask(s, s, radius=int(s / rng.choice([6, 6.5, 7])))
        disc = jnp.asarray(disc)[None, :, :, None]
        noise = (1 - disc) * static + float(rng.choice([1, 2, 3, 4])) * disc * rotating
        noise = noise - noise.mean(axis=(1, 2), keepdims=True)
        noise = noise / ar.gaussian_filter(noise.std(axis=(1, 2), keepdims=True), 10)
        noise = noise * float(rng.choice([1, 2, 3, 4]))

        noises = self.stylegan2.make_noise_pyramid(noise, layer_limit=13)
        # slow-drifting fully-random coarse layers on top
        for i, name in enumerate(list(noises.keys())[:3]):
            kk = jax.random.fold_in(key, i)
            extra = ar.gaussian_filter(jax.random.normal(kk, noises[name].shape), 50)
            extra = extra / ar.gaussian_filter(extra.std(axis=(1, 2), keepdims=True), 10)
            noises[name] = extra if i == 0 else noises[name] + (2.0 if i == 1 else 1.0) * extra

        return {"latent_w_plus": jnp.asarray(latents), **noises}
