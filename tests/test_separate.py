"""Tests for umx-style neural source separation
(reference: maua/audiovisual/audioreactive/audio.py:51-76 openunmix)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.audio import separate as umx

torch = pytest.importorskip("torch")

CFG = umx.UMXConfig(n_fft=512, hop_length=128, hidden=32, lstm_layers=2, max_bin=100, niter=2)


def _torch_state_dict(cfg, seed=0):
    """Random mono openunmix-style state dict in torch naming."""
    g = torch.Generator().manual_seed(seed)
    h = cfg.hidden
    sd = {
        "input_mean": torch.randn(cfg.max_bin, generator=g) * 0.1,
        "input_scale": torch.rand(cfg.max_bin, generator=g) + 0.5,
        "output_mean": torch.randn(cfg.n_bins, generator=g) * 0.1,
        "output_scale": torch.rand(cfg.n_bins, generator=g) + 0.5,
        "fc1.weight": torch.randn(h, cfg.max_bin, generator=g) / np.sqrt(cfg.max_bin),
        "fc2.weight": torch.randn(h, 2 * h, generator=g) / np.sqrt(2 * h),
        "fc3.weight": torch.randn(cfg.n_bins, h, generator=g) / np.sqrt(h),
    }
    for i, c in ((1, h), (2, h), (3, cfg.n_bins)):
        sd[f"bn{i}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"bn{i}.bias"] = torch.randn(c, generator=g) * 0.1
        sd[f"bn{i}.running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[f"bn{i}.running_var"] = torch.rand(c, generator=g) + 0.5
    lh = h // 2
    for li in range(cfg.lstm_layers):
        ci = h
        for sfx in (f"l{li}", f"l{li}_reverse"):
            sd[f"lstm.weight_ih_{sfx}"] = torch.randn(4 * lh, ci, generator=g) / np.sqrt(ci)
            sd[f"lstm.weight_hh_{sfx}"] = torch.randn(4 * lh, lh, generator=g) / np.sqrt(lh)
            sd[f"lstm.bias_ih_{sfx}"] = torch.randn(4 * lh, generator=g) * 0.1
            sd[f"lstm.bias_hh_{sfx}"] = torch.randn(4 * lh, generator=g) * 0.1
    return sd


def _torch_forward(sd, mag, cfg):
    """Independent torch oracle of the OpenUnmix forward (eval BN)."""
    F = torch.nn.functional
    x = torch.as_tensor(mag)[:, : cfg.max_bin]
    x = (x - sd["input_mean"]) / sd["input_scale"]

    def bn(i, t):
        return F.batch_norm(t, sd[f"bn{i}.running_mean"], sd[f"bn{i}.running_var"],
                            sd[f"bn{i}.weight"], sd[f"bn{i}.bias"], training=False, eps=1e-5)

    x = torch.tanh(bn(1, x @ sd["fc1.weight"].T))
    lstm = torch.nn.LSTM(cfg.hidden, cfg.hidden // 2, num_layers=cfg.lstm_layers,
                         bidirectional=True, batch_first=False)
    lstm_sd = {k[len("lstm."):]: v for k, v in sd.items() if k.startswith("lstm.")}
    lstm.load_state_dict(lstm_sd)
    with torch.no_grad():
        h, _ = lstm(x[:, None, :])
    x = torch.cat([x, h[:, 0]], dim=-1)
    x = torch.relu(bn(2, x @ sd["fc2.weight"].T))
    x = bn(3, x @ sd["fc3.weight"].T)
    x = x * sd["output_scale"] + sd["output_mean"]
    return torch.relu(x).numpy()


def test_target_mask_matches_torch_oracle():
    sd = _torch_state_dict(CFG, seed=1)
    params = umx.params_from_torch({"vocals": {k: v.numpy() for k, v in sd.items()}}, CFG)
    rng = np.random.default_rng(2)
    mag = np.abs(rng.standard_normal((20, CFG.n_bins))).astype(np.float32)

    want = _torch_forward(sd, mag, CFG)
    got = np.asarray(umx.target_mask(params["vocals"], jnp.asarray(mag), CFG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_separation_reconstructs_mixture():
    """Masks are EM-normalized to sum to 1, so separated stems sum back
    to the mixture (up to iSTFT edge effects)."""
    sr = 16000
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 110 * t)).astype(np.float32)
    params = umx.init_params(CFG, seed=3)
    stems = umx.separate(y, sr, params=params, cfg=CFG)
    assert len(stems) == 4
    total = np.sum(np.stack([np.asarray(s) for s in stems]), axis=0)
    assert total.shape == y.shape
    mid = slice(CFG.n_fft, len(y) - CFG.n_fft)
    np.testing.assert_allclose(total[mid], y[mid], atol=5e-3)


def test_separate_sources_neural_seam():
    from maua_tpu.audiovisual import audioreactive as ar

    sr = 16000  # band_pass's 4 kHz edge must stay below Nyquist
    y = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    params = umx.init_params(CFG, seed=4)
    # patch in the small test config through the seam
    from maua_tpu.audio import separate as sep_mod

    stems = sep_mod.separate(y, sr, params=params, cfg=CFG)
    v, d, b, o = ar.separate_sources(y, sr)  # DSP fallback still works
    for s in (v, d, b, o):
        assert np.asarray(s).shape == y.shape
    for s in stems:
        assert np.all(np.isfinite(np.asarray(s)))
