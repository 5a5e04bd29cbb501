"""Tests for the selfsupervised audio-reactive subsystem
(reference: maua/audiovisual/audioreactive/selfsupervised/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.audiovisual.selfsupervised import correlation, features, latent, mir, noise, patch

SR = 22050


@pytest.fixture(scope="module")
def audio():
    t = np.arange(SR * 4) / SR
    y = 0.4 * np.sin(2 * np.pi * 330 * t)
    for i in range(0, len(y), SR // 2):
        y[i : i + 100] += np.hanning(100) * 0.4
    return y.astype(np.float32)


@pytest.fixture(scope="module")
def music_info(audio):
    return mir.retrieve_music_information(audio, SR, ks=(2, 4))


def test_extract_features_shapes(audio):
    feats = features.extract_features(audio, SR)
    t = next(iter(feats.values())).shape[0]
    dims = {"chromagram": 12, "tonnetz": 6, "mfcc": 20, "spectral_contrast": 7,
            "spectral_flatness": 1, "rms": 1, "drop_strength": 1, "onsets": 1}
    for name, dim in dims.items():
        assert feats[name].shape == (t, dim), name
        assert np.all(np.isfinite(np.asarray(feats[name]))), name


def test_retrieve_music_information(music_info):
    feats, segs, tempo = music_info
    assert 40 <= tempo <= 300
    assert all(np.asarray(f).min() >= -1e-6 and np.asarray(f).max() <= 1 + 1e-5 for f in feats.values())
    t = next(iter(feats.values())).shape[0]
    for (name, k), seg in segs.items():
        assert seg.shape == (t,)
        assert seg.max() < k


def test_patch_generation_and_persistence(music_info, tmp_path):
    feats, segs, tempo = music_info
    p = patch.Patch(feats, segs, tempo, seed=7, min_subpatches=2, max_subpatches=4)
    assert len(p.latent_patches) >= 2
    # determinism: same seed -> same subpatches
    p2 = patch.Patch(feats, segs, tempo, seed=7, min_subpatches=2, max_subpatches=4)
    assert p.latent_patches == p2.latent_patches
    # persistence
    path = str(tmp_path / "patch.json")
    p.save(path)
    p3 = patch.Patch.load(path, feats, segs, tempo)
    assert p3.latent_patches == p.latent_patches
    assert p3.n_base_latents == p.n_base_latents
    # intensity mutation changes weights
    p.update_intensity(2.0)
    assert p.latent_patches[0]["seq_feat_weight"] != 1.0


def test_patch_realization(music_info):
    feats, segs, tempo = music_info
    p = patch.Patch(feats, segs, tempo, seed=3, min_subpatches=2, max_subpatches=3)
    palette = jax.random.normal(jax.random.PRNGKey(0), (16, 18, 64))
    lats, noises = p(palette, noise_sizes=[4, 8, 16])
    assert lats.shape == (p.length, 18, 64)
    assert np.all(np.isfinite(np.asarray(lats)))
    assert len(noises) == 3
    win = noises[1](5, 4)
    assert win.shape == (4, 8, 8)
    assert np.all(np.isfinite(np.asarray(win)))


def test_noise_modules():
    key = jax.random.PRNGKey(0)
    mod = jnp.abs(jax.random.normal(key, (20, 3)))
    loop = noise.Loop(key, 20, (8, 8), n_loops=2)
    blend = noise.Blend(key, 20, (8, 8), mod)
    mult = noise.Multiply(key, 20, (8, 8), mod)
    avg = noise.Average(loop, blend)
    modl = noise.Modulate(loop, mult, mod)
    sb = noise.ScaleBias(modl, 2.0, 0.1)
    for m in (loop, blend, mult, avg, modl, sb):
        w = m(3, 5)
        assert w.shape == (5, 8, 8)
        assert np.all(np.isfinite(np.asarray(w)))


def test_correlation_metrics():
    rs = np.random.RandomState(0)
    X = rs.randn(64, 5).astype(np.float32)
    # Y strongly dependent on X
    Y = X @ rs.randn(5, 3).astype(np.float32) + 0.1 * rs.randn(64, 3).astype(np.float32)
    Z = rs.randn(64, 3).astype(np.float32)
    out_dep = correlation.audio_video_correlation(X, Y)
    out_ind = correlation.audio_video_correlation(X, Z)
    for name in ("rv", "linear_cka", "cca", "distance_correlation", "pearson_mean"):
        assert out_dep[name] > out_ind[name], name
    assert 0 <= out_dep["rv"] <= 1 + 1e-6


def test_video_features():
    from maua_tpu.audiovisual.selfsupervised.video_features import video_feature_matrix

    rs = np.random.RandomState(0)
    frames = rs.rand(6, 32, 32, 3).astype(np.float32)
    M = video_feature_matrix(frames, n_frames_out=12)
    assert M.shape == (12, 1 + 6 + 1 + 1)
    assert np.all(np.isfinite(M))
