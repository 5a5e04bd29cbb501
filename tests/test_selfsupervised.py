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


def test_correlation_battery_orders_similarity():
    """The reference's exported battery (`correlation.py:416` harness):
    X vs X-minus-one-PC must score higher than X vs noise for every
    matched-shape metric."""
    rs = np.random.RandomState(1)
    X = rs.randn(120, 16).astype(np.float32)
    X -= X.mean()
    U, s, V = np.linalg.svd(X, full_matrices=False)
    Y1 = (np.delete(U, 2, 1) @ np.diag(np.delete(s, 2)) @ np.delete(V, 2, 0)).astype(np.float32)
    Y2 = rs.randn(120, 16).astype(np.float32)

    battery = ("pearson", "spearman", "concordance", "autocorrcorr", "rv", "rv2", "smi",
               "r1", "r2", "r3", "r4", "rG", "svcca", "pwcca", "op", "rvadj_maye",
               "rvadj_ghaziri", "coxhead2")
    for name in battery:
        fn = correlation.METRICS[name]
        hi = float(fn(X, Y1))
        lo = float(fn(X, Y2))
        assert np.isfinite(hi) and np.isfinite(lo), name
        assert hi > lo, (name, hi, lo)
        assert hi <= 1.0 + 1e-4, (name, hi)


def test_generate_end_to_end(audio, tmp_path):
    """Full selfsupervised pipeline (`selfsupervised/sample.py:36-101`):
    audio -> music info -> seeded Patch -> render -> decodable video,
    through the pipelined encode path (double-buffer + I420/cv2)."""
    import scipy.io.wavfile

    from maua_tpu.audiovisual.selfsupervised.sample import generate
    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.ops.video import read_video

    wav = str(tmp_path / "s.wav")
    scipy.io.wavfile.write(wav, SR, (audio * 32767).astype(np.int16))
    cfg = SG2Config(img_resolution=32, channel_base=2048, channel_max=64, num_fp16_res=0)
    out = generate(
        wav, output_file=str(tmp_path / "ss.mp4"), fps=2, seed=1, batch_size=4,
        stylegan_kwargs={"cfg": cfg, "dtype": "float32"}, max_seconds=3.0, verbose=False,
    )
    video, _ = read_video(out)
    assert video.shape[1:] == (32, 32, 3)
    assert video.shape[0] >= 4
    assert np.asarray(video).std() > 0.01


def test_video_features():
    from maua_tpu.audiovisual.selfsupervised import video_features as vf

    rs = np.random.RandomState(0)
    frames = rs.rand(6, 32, 32, 3).astype(np.float32)
    feats = vf.extract_video_features(frames, n_frames_out=12)
    expected_dims = {
        "luminance": 1, "color": 6, "edges": 1, "flow": 1, "rgb_hist": 96, "hsv_hist": 96,
        "visual_variance": 1, "absdiff": 1, "low_freq_rms": 1, "mid_freq_rms": 1,
        "high_freq_rms": 1, "adaptive_freq_rms": 1, "flow_onsets": 1, "spectral_onsets": 1,
    }
    for name, dim in expected_dims.items():
        assert feats[name].shape == (12, dim), name
        assert np.all(np.isfinite(np.asarray(feats[name]))), name
    M = vf.video_feature_matrix(frames, n_frames_out=12)
    assert M.shape == (12, sum(expected_dims.values()))

    # descriptor sanity (`features/video.py:12-190` semantics)
    assert vf.rgb_hist(frames).max() <= 1.0 + 1e-6
    dg = vf.directogram(np.stack([np.ones((8, 8, 2), np.float32)] * 5))
    assert dg.shape == (5, 8) and np.all(dg >= 0)
    # a cut (hard frame change) spikes the absdiff/onset features
    cut = np.concatenate([np.zeros((5, 16, 16, 3), np.float32), np.ones((5, 16, 16, 3), np.float32)])
    ad = vf.absdiff(cut).squeeze()
    assert ad.argmax() == 4
