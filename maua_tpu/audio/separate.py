"""Neural music source separation (openunmix-style).

Rebuild of the reference's `unmix` separator
(`maua/audiovisual/audioreactive/audio.py:51-76`, which calls
openunmix `separate(..., niter=3)`): per-target spectrogram-mask
networks — fc + BN + tanh -> 3-layer BLSTM with skip connection ->
fc + BN + relu -> fc + BN -> relu mask — followed by ratio-mask
expectation-maximization refinement (the norbert Wiener-filter role)
and inverse STFT.

TPU-first notes: the BLSTM runs as two `lax.scan`s (forward/backward)
over frames with MXU matmuls inside; the STFT/iSTFT ride the package's
real-DFT seam (`audio/spectral.py`) so the whole separator works on
the no-complex-FFT relay. `params_from_torch` converts real openunmix
checkpoints (umxhq naming: fc1/bn1/lstm.*_l{0,1,2}[_reverse]/fc2/bn2/
fc3/bn3 + input_mean/input_scale/output_mean/output_scale); with no
checkpoint a seeded random init keeps the exact code path testable.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spectral


TARGETS = ("vocals", "drums", "bass", "other")


@dataclasses.dataclass(frozen=True)
class UMXConfig:
    n_fft: int = 4096
    hop_length: int = 1024
    hidden: int = 512
    lstm_layers: int = 3
    max_bin: int = 1487  # umxhq 16 kHz bandwidth crop
    niter: int = 3  # EM refinement passes (`audio.py:53` niter=3)

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1


def _rand_linear(rng, ci, co):
    return {"w": (rng.standard_normal((ci, co)) / np.sqrt(ci)).astype(np.float32)}


def _rand_bn(rng, c):
    return {
        "scale": np.ones(c, np.float32),
        "bias": np.zeros(c, np.float32),
        "mean": np.zeros(c, np.float32),
        "var": np.ones(c, np.float32),
    }


def _rand_lstm(rng, ci, ch):
    def gate(ci_):
        return (rng.standard_normal((ci_, 4 * ch)) / np.sqrt(ci_)).astype(np.float32)

    return {"wi": gate(ci), "wh": gate(ch), "b": np.zeros(4 * ch, np.float32)}


def init_params(cfg: UMXConfig, seed: int = 0, targets=TARGETS) -> Dict:
    """Random-init per-target models in the converted layout."""
    out = {}
    for t_i, target in enumerate(targets):
        rng = np.random.default_rng(seed + t_i)
        h = cfg.hidden
        # openunmix: per-direction hidden h//2 -> BLSTM output h;
        # fc2 input = skip (h) ++ lstm out (h) = 2h
        layers = [
            {"fwd": _rand_lstm(rng, h, h // 2), "bwd": _rand_lstm(rng, h, h // 2)}
            for _ in range(cfg.lstm_layers)
        ]
        out[target] = {
            "input_mean": np.zeros(cfg.max_bin, np.float32),
            "input_scale": np.ones(cfg.max_bin, np.float32),
            "output_mean": np.zeros(cfg.n_bins, np.float32),
            "output_scale": np.ones(cfg.n_bins, np.float32),
            "fc1": _rand_linear(rng, cfg.max_bin, h),
            "bn1": _rand_bn(rng, h),
            "lstm": layers,
            "fc2": _rand_linear(rng, 2 * h, h),
            "bn2": _rand_bn(rng, h),
            "fc3": _rand_linear(rng, h, cfg.n_bins),
            "bn3": _rand_bn(rng, cfg.n_bins),
        }
    return jax.tree_util.tree_map(jnp.asarray, out)


def params_from_torch(state_dicts: Dict[str, Dict], cfg: UMXConfig) -> Dict:
    """{target: torch state dict} -> params. Mono fold: openunmix fc1
    takes nb_channels * nb_bins inputs; stereo weights are summed over
    the channel copies (we separate the mono mean like the reference's
    `.mean(0)`, `audio.py:57-60`)."""
    out = {}
    for target, sd in state_dicts.items():
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

        def lin(name, in_dim):
            w = sd[f"{name}.weight"]  # (out, in_channels*bins) torch layout
            if w.shape[1] != in_dim:  # stereo: fold channel copies
                w = w.reshape(w.shape[0], -1, in_dim).sum(1)
            return {"w": w.T.copy()}

        def bn(name):
            return {
                "scale": sd[f"{name}.weight"],
                "bias": sd[f"{name}.bias"],
                "mean": sd[f"{name}.running_mean"],
                "var": sd[f"{name}.running_var"],
            }

        def lstm_dir(li, rev):
            sfx = f"l{li}" + ("_reverse" if rev else "")
            return {
                "wi": sd[f"lstm.weight_ih_{sfx}"].T.copy(),
                "wh": sd[f"lstm.weight_hh_{sfx}"].T.copy(),
                "b": sd[f"lstm.bias_ih_{sfx}"] + sd[f"lstm.bias_hh_{sfx}"],
            }

        mean_in = sd["input_mean"]
        scale_in = sd["input_scale"]
        out[target] = {
            "input_mean": mean_in[: cfg.max_bin],
            "input_scale": scale_in[: cfg.max_bin],
            "output_mean": sd["output_mean"],
            "output_scale": sd["output_scale"],
            "fc1": lin("fc1", cfg.max_bin),
            "bn1": bn("bn1"),
            "lstm": [{"fwd": lstm_dir(li, False), "bwd": lstm_dir(li, True)} for li in range(cfg.lstm_layers)],
            "fc2": lin("fc2", sd["fc2.weight"].shape[1]),
            "bn2": bn("bn2"),
            "fc3": lin("fc3", sd["fc3.weight"].shape[1]),
            "bn3": bn("bn3"),
        }
    return jax.tree_util.tree_map(jnp.asarray, out)


def _bn(p, x):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]


def _lstm_scan(p, xs, reverse: bool):
    """One LSTM direction over (T, B, C) via lax.scan; torch gate
    order i, f, g, o."""
    ch = p["wh"].shape[0]

    def step(carry, x):
        h, c = carry
        gates = x @ p["wi"] + h @ p["wh"] + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    b = xs.shape[1]
    init = (jnp.zeros((b, ch), xs.dtype), jnp.zeros((b, ch), xs.dtype))
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs


def _blstm(layers: List[Dict], x):
    """3-layer bidirectional LSTM, (T, B, C) -> (T, B, hidden//2)."""
    for layer in layers:
        fwd = _lstm_scan(layer["fwd"], x, reverse=False)
        bwd = _lstm_scan(layer["bwd"], x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x


def target_mask(p: Dict, mag: jax.Array, cfg: UMXConfig) -> jax.Array:
    """Magnitude spectrogram (T, n_bins) -> nonneg mask (T, n_bins)
    (the OpenUnmix forward)."""
    x = mag[:, : cfg.max_bin]
    x = (x - p["input_mean"]) / p["input_scale"]
    x = jnp.tanh(_bn(p["bn1"], x @ p["fc1"]["w"]))
    skip = x
    h = _blstm(p["lstm"], x[:, None, :])[:, 0]
    x = jnp.concatenate([skip, h], axis=-1)
    x = jax.nn.relu(_bn(p["bn2"], x @ p["fc2"]["w"]))
    x = _bn(p["bn3"], x @ p["fc3"]["w"])
    x = x * p["output_scale"] + p["output_mean"]
    return jax.nn.relu(x)


@partial(jax.jit, static_argnames=("cfg",))
def _separate_masks(params: Dict, mag: jax.Array, cfg: UMXConfig) -> jax.Array:
    """(T, bins) -> (n_targets, T, bins) EM-refined ratio masks.

    The multichannel Wiener filter (norbert, niter=3) reduces in mono
    to iterative ratio-mask refinement: v_j <- m_j^2 * |X|^2 /
    sum_k m_k^2 |X|^2 posterior updates."""
    est = jnp.stack([target_mask(params[t], mag, cfg) for t in TARGETS])  # (J, T, F) magnitudes
    v = est**2
    for _ in range(cfg.niter):
        total = jnp.maximum(v.sum(0, keepdims=True), 1e-10)
        ratio = v / total
        v = (ratio * mag[None]) ** 2
    total = jnp.maximum(v.sum(0, keepdims=True), 1e-10)
    return v / total


def separate(
    audio: jax.Array, sr: int, params: Optional[Dict] = None, cfg: Optional[UMXConfig] = None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Mono waveform -> (vocals, drums, bass, other) waveforms, each
    the same length as the input (the `unmix` role,
    `audioreactive/audio.py:51-76`)."""
    cfg = cfg or UMXConfig()
    if params is None:
        params = init_params(cfg)
    y = jnp.asarray(audio, jnp.float32)
    n = y.shape[-1]
    D = spectral.stft(y, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
    mag = spectral.spec_abs(D).T  # (T, bins)
    masks = _separate_masks(params, mag, cfg)  # (4, T, bins)
    outs = []
    for j in range(len(TARGETS)):
        Dj = spectral.spec_mul_real(D, masks[j].T)
        outs.append(spectral.istft(Dj, n_fft=cfg.n_fft, hop_length=cfg.hop_length, length=n))
    return tuple(outs)
