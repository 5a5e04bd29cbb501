"""StyleGAN3 (alias-free) generator, pure-functional JAX.

The reference's SG3 network lives in the stripped `GAN/nv` submodule;
its first-party wrapper (`maua/GAN/wrappers/stylegan3.py:15-133`)
manipulates the input Fourier-feature transform (translate/rotate
:82-93), output resizing with per-layer multipliers :15-19, and the
@RiversHaveWings stabilization trick :54-58. This module implements
the alias-free-T generator from the published architecture: Fourier
input with learned affine transform, modulated convs, and filtered
nonlinearities (kaiser-sinc up 2x -> lrelu -> down) with per-layer
cutoff/sampling-rate schedules.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .stylegan2 import fc_forward, _init_fc


@dataclasses.dataclass(frozen=True)
class SG3Config:
    z_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 1024
    img_channels: int = 3
    num_layers: int = 14
    num_critical: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    first_cutoff: float = 2.0
    first_stopband: float = 2.0 ** 2.1
    last_stopband_rel: float = 2.0 ** 0.3
    margin_size: int = 10
    filter_size: int = 6
    mapping_layers: int = 2
    conv_kernel: int = 3
    dtype: str = "float32"
    # run the final torgb conv in bf16 too (f32 accumulation): ~10 ms
    # per batch-8 1024^2 step; output SNR ~48 dB vs the f32 path, above
    # the 40 dB parity bar but off by default to keep full margin
    torgb_bf16: bool = False

    def layer_plan(self):
        """Per-layer (cutoff, stopband, sampling rate, size, channels)
        — the alias-free-T scheduling."""
        n = self.num_layers
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(np.arange(n + 1) / (n - self.num_critical), 1.0)
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        srates = np.exp2(np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution))))
        half_widths = np.maximum(stopbands, srates / 2) - cutoffs
        sizes = srates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(np.minimum((self.channel_base / 2) / cutoffs, self.channel_max))
        channels[-1] = self.img_channels
        return cutoffs, stopbands, srates, half_widths, sizes.astype(int), channels.astype(int)

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2


def _lowpass(numtaps: int, cutoff: float, width: float, fs: float) -> Optional[np.ndarray]:
    """Kaiser-windowed sinc lowpass (scipy firwin)."""
    if numtaps == 1:
        return None
    from scipy.signal import firwin, kaiser_atten, kaiser_beta

    beta = kaiser_beta(kaiser_atten(numtaps, width * 2 / fs))
    return firwin(numtaps, cutoff, window=("kaiser", beta), fs=fs).astype(np.float32)


def init_params(key, cfg: SG3Config) -> Dict:
    keys = iter(jax.random.split(key, 64 + cfg.num_layers * 4))
    nk = lambda: next(keys)
    cutoffs, stopbands, srates, half_widths, sizes, channels = cfg.layer_plan()

    mapping = {}
    for i in range(cfg.mapping_layers):
        ci = cfg.z_dim if i == 0 else cfg.w_dim
        mapping[f"fc{i}"] = _init_fc(nk(), ci, cfg.w_dim, lr_multiplier=0.01)
    mapping["w_avg"] = jnp.zeros((cfg.w_dim,))

    # SynthesisInput: fourier frequencies within the first cutoff disk
    c0 = int(channels[0])
    rk = nk()
    freqs = jax.random.normal(rk, (c0, 2))
    radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
    freqs = freqs / radii * jnp.exp(jax.random.uniform(nk(), (c0, 1)) * 0.25) * cfg.first_cutoff
    phases = jax.random.uniform(nk(), (c0,)) - 0.5
    input_p = {
        "freqs": freqs,
        "phases": phases,
        "affine": _init_fc(nk(), cfg.w_dim, 4),
        "weight": jax.random.normal(nk(), (1, 1, c0, c0)) / math.sqrt(c0),
        "transform": jnp.eye(3),
    }
    # affine bias init: (1, 0, 0, 0) (r_c, r_s, t_x, t_y)
    input_p["affine"]["b"] = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    input_p["affine"]["w"] = input_p["affine"]["w"] * 0.0  # zero weight like NVIDIA init

    layers = []
    for i in range(cfg.num_layers):
        ci, co = int(channels[i]), int(channels[i + 1])
        is_torgb = i == cfg.num_layers - 1
        k = 1 if is_torgb else cfg.conv_kernel
        layers.append({
            "affine": _init_fc(nk(), cfg.w_dim, ci, bias_init=1.0),
            "weight": jax.random.normal(nk(), (k, k, ci, co)),
            "bias": jnp.zeros((co,)),
            "magnitude_ema": jnp.ones(()),
        })
    return {"mapping": mapping, "input": input_p, "layers": layers}


@partial(jax.jit, static_argnames=("cfg",))
def mapping(params: Dict, z: jax.Array, cfg: SG3Config, truncation_psi: float = 1.0) -> jax.Array:
    x = ops.normalize_2nd_moment(z.astype(jnp.float32))
    for i in range(cfg.mapping_layers):
        x = fc_forward(params["mapping"][f"fc{i}"], x, activation="lrelu", lr_multiplier=0.01)
    ws = jnp.tile(x[:, None], (1, cfg.num_ws, 1))
    w_avg = params["mapping"]["w_avg"]
    return w_avg + truncation_psi * (ws - w_avg)


def synthesis_input(params: Dict, w0: jax.Array, cfg: SG3Config, size: int, srate: float,
                    transform: Optional[jax.Array] = None) -> jax.Array:
    """Fourier-feature input plane with per-sample learned affine +
    user transform (the surface the reference wrapper's
    translate/rotate drives, `wrappers/stylegan3.py:54-61,82-93`)."""
    p = params["input"]
    b = w0.shape[0]
    t = fc_forward(p["affine"], w0)  # (B, 4): r_c, r_s, t_x, t_y
    t = t / jnp.maximum(jnp.linalg.norm(t[:, :2], axis=1, keepdims=True), 1e-8)
    m_r = jnp.zeros((b, 3, 3)).at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1]) \
        .at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0]).at[:, 2, 2].set(1.0)
    m_t = jnp.tile(jnp.eye(3)[None], (b, 1, 1)).at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
    user = transform if transform is not None else p["transform"]
    if user.ndim == 2:
        user = jnp.tile(user[None], (b, 1, 1))
    transforms = m_r @ m_t @ user  # (B, 3, 3)

    freqs = p["freqs"][None] @ transforms[:, :2, :2]  # (B, C, 2)
    phases = p["phases"][None] + jnp.einsum("bcd,bd->bc", freqs, transforms[:, :2, 2])

    # amplitude rolloff near the band limit
    amp = 1.0 - jnp.clip(
        (jnp.linalg.norm(freqs, axis=-1) - cfg.first_cutoff) / (srate / 2 - cfg.first_cutoff), 0, 1
    )  # (B, C)

    theta = (jnp.arange(size) + 0.5) / srate - (size / srate) / 2
    gx = jnp.einsum("x,bc->bxc", theta, freqs[:, :, 0])  # (B, X, C)
    gy = jnp.einsum("y,bc->byc", theta, freqs[:, :, 1])  # (B, Y, C)
    field = gy[:, :, None, :] + gx[:, None, :, :] + phases[:, None, None, :]
    feats = jnp.sin(field * (2 * jnp.pi)) * amp[:, None, None, :]  # (B, H, W, C)
    return jax.lax.conv_general_dilated(feats, p["weight"], (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _filtered_lrelu_direct(x: jax.Array, up_f, down_f, up: int, down: int) -> jax.Array:
    """up-FIR -> lrelu*sqrt2 -> FIR-down at the 2x temporary rate
    (the alias-free nonlinearity), materializing the full tmp grid."""
    if up > 1:
        ut = len(up_f)
        pt = (ut - 1) // 2
        x = ops.upfirdn2d(x, up_f, up=up, padding=(pt, ut - 1 - pt, pt, ut - 1 - pt), gain=up * up)
    x = jax.nn.leaky_relu(x, 0.2) * math.sqrt(2.0)
    if down > 1:
        dt = len(down_f)
        pt = (dt - 1) // 2
        x = ops.upfirdn2d(x, down_f, down=down, padding=(pt, dt - 1 - pt, pt, dt - 1 - pt))
    return x


# chunk the filtered nonlinearity only when the 2x tmp grid would
# approach the HBM ceiling (banding costs ~28% throughput from halo
# recompute + lost fusion, so it is purely an OOM escape valve;
# measured: batch 8 unchunked 18.4 fps vs chunked 13.3 fps, batch 16
# OOMs unchunked at an 11.7 GB tmp tensor; the batch-8 layer-9 tmp
# (2.9e9 elems, 5.9 GB bf16) runs direct at 82 ms vs 91 ms banded)
_CHUNK_TMP_ELEMS = 3_200_000_000


def _filtered_lrelu(x: jax.Array, up_f, down_f, up: int, down: int,
                    pre_scale: Optional[jax.Array] = None,
                    pre_add: Optional[jax.Array] = None,
                    post_scale: Optional[jax.Array] = None) -> jax.Array:
    """Filtered nonlinearity dispatch. On TPU, big layers run the fused
    Pallas polyphase kernel (`kernels/filtered_lrelu.py`): the
    2x-oversampled tmp grid never exists, one HBM read + one write,
    ~4-10x faster than the XLA path at the 1024^2 tail. Small layers
    (and non-TPU backends) use the XLA path, row-banded only as an OOM
    escape valve.

    pre_scale/pre_add (B, C): per-plane input affine (the preceding
    modulated conv's demodulation + bias — XLA cannot fuse elementwise
    passes into conv operands, so each costs a full HBM round-trip at
    1044^2; the Pallas kernel applies them per-plane for free).
    post_scale (B, C): output scale (the NEXT conv's style modulation).
    Semantics are identical on every dispatch path."""
    import os

    b, hi, wi, c = x.shape
    use_pallas = os.environ.get("MAUA_SG3_PALLAS", "1") != "0"
    # Pallas wins where channels are lane-starved and W is large: the
    # same-rate up2 tail (c<=81 at 1044^2, 2-3x) and the big up4
    # transition via the reordered W-cheap schedule (532^2 c81: 63 vs
    # 83 ms XLA). Small up4 layers (<512) keep XLA: at c>=128 the
    # depthwise FIRs already fill the VPU lanes and measure 1.5-3x
    # faster than either Pallas schedule (workspace/profiling/
    # bench_flrelu_reorder.py).
    if (use_pallas and up in (2, 4) and down == 2 and up_f is not None
            and down_f is not None and min(hi, wi) >= 512
            and jax.default_backend() == "tpu"):
        from ..kernels.filtered_lrelu import filtered_lrelu_pallas

        if up == 4:
            # up4/down2 == zero-stuff-2 -> up2/down2 on the stuffed grid
            # (stuff4 = stuff2 o stuff2; the up filter carries the extra
            # x2 gain). The same-rate up2 schedule runs the big
            # transition ~1.6x faster than the direct up4 kernel (the
            # W-passes cost per PLANE row, and the up4 schedule runs
            # 12-20 of them vs up2's ~6 — measured 532^2 c81: 63 ms
            # direct-up4 vs ~40 ms stuffed-up2 incl. the stuff pass).
            if pre_scale is not None:
                x = x * pre_scale.astype(x.dtype)[:, None, None, :]
            if pre_add is not None:
                # bias applies to the samples, not the stuffed zeros
                x = x + pre_add.astype(x.dtype)[:, None, None, :]
            x2 = jnp.pad(x[:, :, None, :, None, :],
                         ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
            x2 = x2.reshape(b, hi * 2, wi * 2, c)
            return filtered_lrelu_pallas(x2, np.asarray(up_f) * 2.0, down_f, 2, 2,
                                         post_scale=post_scale)
        return filtered_lrelu_pallas(x, up_f, down_f, up, down, pre_scale=pre_scale,
                                     pre_add=pre_add, post_scale=post_scale)
    if pre_scale is not None:
        x = x * pre_scale.astype(x.dtype)[:, None, None, :]
    if pre_add is not None:
        x = x + pre_add.astype(x.dtype)[:, None, None, :]
    tmp_elems = b * hi * up * wi * up * c
    bands = int(os.environ.get("MAUA_SG3_BANDS", "0"))
    if bands == 0:
        bands = max(1, int(np.ceil(tmp_elems / _CHUNK_TMP_ELEMS)))
    if post_scale is not None:
        post = lambda yy: yy * post_scale.astype(yy.dtype)[:, None, None, :]
    else:
        post = lambda yy: yy
    fn = lambda xx: _filtered_lrelu_direct(xx, up_f, down_f, up, down)
    if bands <= 1:
        return post(fn(x))

    ho = jax.eval_shape(fn, x).shape[1]
    ratio = up / down
    halo = 24  # rows at the input rate, >> filter influence radius
    outs = []
    for k in range(bands):
        s = (k * ho // bands) // 4 * 4
        e = ho if k == bands - 1 else ((k + 1) * ho // bands) // 4 * 4
        if e <= s:
            continue
        a = max(0, (int(s / ratio) - halo) // 4 * 4)
        bb = min(hi, int(np.ceil(e / ratio)) + halo)
        yb = fn(x[:, a:bb])
        off = int(round(a * ratio))
        outs.append(yb[:, s - off : e - off])
    return post(jnp.concatenate(outs, axis=1))


def synthesis(params: Dict, ws: jax.Array, cfg: SG3Config, transform: Optional[jax.Array] = None,
              int8_plan: Optional[Dict] = None, _amax_tape: Optional[Dict] = None) -> jax.Array:
    """ws (B, num_ws, w_dim) -> (B, H, W, C) in [-1, 1].

    int8_plan (from `quantize_sg3`) runs the trunk's modulated convs
    int8 x int8 -> int32 on the MXU (per-channel activation quant with
    calibrated amax, per-output-channel weight scales) — opt-in
    speed/quality trade like gan/fast_synthesis.quantize_plan.
    `_amax_tape` is the calibration hook."""
    cutoffs, stopbands, srates, half_widths, sizes, channels = cfg.layer_plan()
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = synthesis_input(params, ws[:, 0], cfg, int(sizes[0]), float(srates[0]), transform)

    # styles per layer up front (torgb folds the fan-in gain into its
    # styles exactly once — networks_stylegan3 SynthesisLayer semantics)
    styles_all = []
    for i, layer in enumerate(params["layers"]):
        s = fc_forward(layer["affine"], ws[:, i + 1])
        if i == cfg.num_layers - 1:
            s = s * (1.0 / math.sqrt(int(channels[i])))
        styles_all.append(s)

    # In the fused path each conv runs UNmodulated: the input style
    # scale rides the PREVIOUS filtered-lrelu's per-plane post_scale and
    # the demod+bias ride the NEXT one's pre affine (free in the Pallas
    # kernel; explicit — i.e. exactly the legacy passes — on the XLA
    # fallback). The int8/calibration paths keep the legacy structure.
    fuse = int8_plan is None and _amax_tape is None

    for i, layer in enumerate(params["layers"]):
        is_torgb = i == cfg.num_layers - 1
        # bf16 through the resample-heavy trunk (the oversampled
        # intermediate grids dominate HBM); torgb stays f32
        x = x.astype(compute_dtype if (not is_torgb or cfg.torgb_bf16) else jnp.float32)
        in_rate, out_rate = float(srates[i]), float(srates[i + 1])
        in_size, out_size = int(sizes[i]), int(sizes[i + 1])
        in_cut, out_cut = float(cutoffs[i]), float(cutoffs[i + 1])
        in_hw, out_hw = float(half_widths[i]), float(half_widths[i + 1])

        styles = styles_all[i]
        w = layer["weight"]
        if not is_torgb:
            w = w * (1.0 / math.sqrt(np.prod(layer["weight"].shape[:3])))
        w = w / jnp.maximum(jnp.sqrt(layer["magnitude_ema"]), 1e-8)
        if _amax_tape is not None and not is_torgb:
            xs32 = x.astype(jnp.float32) * styles.astype(jnp.float32)[:, None, None, :]
            _amax_tape[f"L{i}"] = jnp.max(jnp.abs(xs32), axis=(0, 1, 2))
        demod = None
        if int8_plan is not None and f"L{i}" in int8_plan:
            x = _modconv_int8(x, int8_plan[f"L{i}"], w, styles)
            x = x + layer["bias"].astype(x.dtype)
        elif fuse:
            if i == 0:
                x = x * styles.astype(x.dtype)[:, None, None, :]
            # x is already style-scaled (layer 0 above; otherwise by the
            # previous flrelu's post_scale) — plain shared-weight conv
            if w.shape[0] == 1:
                y = jnp.einsum("bhwc,co->bhwo", x, w[0, 0].astype(x.dtype))
            else:
                k = w.shape[0]
                y = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), (1, 1), ((k // 2, (k - 1) // 2),) * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if not is_torgb:
                w32 = w.astype(jnp.float32)
                w2 = jnp.sum(jnp.square(w32), axis=(0, 1))  # (Ci, Co)
                demod = jax.lax.rsqrt(jnp.square(styles.astype(jnp.float32)) @ w2 + 1e-8)
                x = y
            else:
                x = y + layer["bias"].astype(y.dtype)
        else:
            import os

            # dense space-to-depth for the lane-starved tail convs was
            # measured on chip and REJECTED: 25.6 -> 19.6 fps at batch 8
            # (4x FLOP inflation beats the lane-padding win; the direct
            # conv already sits near the HBM roofline at these shapes).
            # Kept opt-in for profiling (MAUA_SG3_S2D=1).
            use_s2d = (os.environ.get("MAUA_SG3_S2D", "0") == "1"
                       and not is_torgb and w.shape[0] == 3
                       and w.shape[-1] < 128 and min(x.shape[1], x.shape[2]) >= 512
                       and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                       and jax.default_backend() in ("tpu", "axon"))
            x = ops.modulated_conv2d(x, w.astype(x.dtype), styles, padding=w.shape[0] // 2,
                                     demodulate=not is_torgb, s2d=use_s2d)
            x = x + layer["bias"].astype(x.dtype)

        if is_torgb:
            break

        # filtered nonlinearity: up to tmp_rate, lrelu, down to out_rate
        tmp_rate = max(in_rate, out_rate) * 2
        up = int(np.rint(tmp_rate / in_rate))
        down = int(np.rint(tmp_rate / out_rate))
        up_taps = cfg.filter_size * up if up > 1 else 1
        down_taps = cfg.filter_size * down if down > 1 else 1
        up_f = _lowpass(up_taps, in_cut, in_hw, tmp_rate)
        down_f = _lowpass(down_taps, out_cut, out_hw, tmp_rate)

        if fuse and demod is not None:
            b = x.shape[0]
            bias_b = jnp.broadcast_to(layer["bias"].astype(jnp.float32), (b, w.shape[-1]))
            x = _filtered_lrelu(x, up_f, down_f, up, down, pre_scale=demod,
                                pre_add=bias_b, post_scale=styles_all[i + 1])
        else:
            x = _filtered_lrelu(x, up_f, down_f, up, down)
        # center crop / pad to the target canvas
        h = x.shape[1]
        if h > out_size:
            o = (h - out_size) // 2
            x = x[:, o : o + out_size, o : o + out_size, :]
        elif h < out_size:
            o = (out_size - h) // 2
            x = jnp.pad(x, ((0, 0), (o, out_size - h - o), (o, out_size - h - o), (0, 0)))

    return x.astype(jnp.float32)


def _modconv_int8(x, entry, w_runtime, styles):
    """Modulated conv with the conv itself int8 on the MXU: activation
    quantized per input channel against calibrated amax (folded into
    the weights), weights per-output-channel int8; demod stays f32
    (identical math to ops.modulated_conv2d up to quantization)."""
    xs = x.astype(jnp.float32) * styles.astype(jnp.float32)[:, None, None, :]
    scale = jnp.asarray(127.0 / entry["a"], jnp.float32)
    xq = jnp.clip(jnp.round(xs * scale), -127.0, 127.0).astype(jnp.int8)
    k = entry["q"].shape[0]
    y = jax.lax.conv_general_dilated(
        xq, jnp.asarray(entry["q"]), (1, 1), ((k // 2, (k - 1) // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * jnp.asarray(entry["s"])[None, None, None, :]
    w32 = w_runtime.astype(jnp.float32)
    w2 = jnp.sum(jnp.square(w32), axis=(0, 1))
    d = jax.lax.rsqrt(jnp.square(styles.astype(jnp.float32)) @ w2 + 1e-8)
    return (y * d[:, None, None, :]).astype(x.dtype)


def quantize_sg3(params: Dict, cfg: SG3Config, ws: Optional[jax.Array] = None,
                 batch: int = 4, seed: int = 0, margin: float = 1.05) -> Dict:
    """Calibrate an int8 plan for the SG3 trunk convs (all modulated
    convs except torgb). Returns {"L{i}": {"q", "s", "a"}} to pass as
    `synthesis(..., int8_plan=plan)`. Quality: ~30-35 dB vs the f32
    path on random init (tests/test_stylegan3.py pins >28 dB) — use
    where fps matters more than the last bits of fidelity."""
    if ws is None:
        z = jax.random.normal(jax.random.PRNGKey(seed), (batch, cfg.z_dim))
        ws = mapping(params, z, cfg)

    def run(ws):
        tape: Dict = {}
        synthesis(params, ws, cfg, _amax_tape=tape)
        return tape

    tape = jax.device_get(jax.jit(run)(ws))
    _, _, _, _, _, channels = cfg.layer_plan()
    plan: Dict = {}
    for i, layer in enumerate(params["layers"]):
        if i == cfg.num_layers - 1:
            continue  # torgb stays float
        a = np.maximum(np.asarray(tape[f"L{i}"], np.float32) * margin, 1e-6)
        w = np.asarray(layer["weight"], np.float32)
        w = w * (1.0 / math.sqrt(np.prod(w.shape[:3])))
        w = w / max(float(np.sqrt(np.asarray(layer["magnitude_ema"]))), 1e-8)
        wf = w * (a / 127.0)[None, None, :, None]
        s = np.maximum(np.abs(wf).max(axis=(0, 1, 2)) / 127.0, 1e-12).astype(np.float32)
        plan[f"L{i}"] = {
            "q": np.clip(np.round(wf / s), -127, 127).astype(np.int8),
            "s": s,
            "a": a,
        }
    return plan


def make_transform_mat(translate: Tuple[float, float], angle_deg: float) -> jnp.ndarray:
    """(`wrappers/stylegan3.py:82-93`): inverse rotation+translation
    fed into the input transform."""
    s = math.sin(angle_deg / 360.0 * math.pi * 2)
    c = math.cos(angle_deg / 360.0 * math.pi * 2)
    m = np.array([[c, s, translate[0]], [-s, c, translate[1]], [0, 0, 1]], np.float64)
    try:
        m = np.linalg.inv(m)
    except np.linalg.LinAlgError:
        m = np.linalg.pinv(m)
    return jnp.asarray(m, jnp.float32)


class StyleGAN3:
    """Facade mirroring the reference wrapper surface
    (`wrappers/stylegan3.py:26-133`)."""

    def __init__(self, cfg: Optional[SG3Config] = None, params: Optional[Dict] = None, key=None,
                 model_file: Optional[str] = None, output_size=None, strategy: str = "stretch",
                 layer: int = 0, dtype: str = "float32"):
        self.model_file = model_file if model_file not in (None, "None") else None
        if model_file is not None and model_file != "None":
            from .load import load_network

            self.params, self.cfg = load_network(model_file)
            assert isinstance(self.cfg, SG3Config), f"{model_file} is not an alias-free checkpoint"
        else:
            self.cfg = cfg or SG3Config()
            key = key if key is not None else jax.random.PRNGKey(0)
            self.params = params if params is not None else init_params(key, self.cfg)
        self.num_ws = self.cfg.num_ws
        self.w_dim = self.cfg.w_dim
        self.z_dim = self.cfg.z_dim
        self.res = self.cfg.img_resolution
        # SG3's Fourier-feature input makes arbitrary output sizes a
        # sampling-grid change, not a feature-resize; keep the SG2 facade
        # kwargs but render at native resolution and resize in pixels.
        self.output_size = tuple(output_size) if output_size else None

    def get_z_latents(self, seeds) -> jax.Array:
        from .wrappers import get_z_latents

        return jnp.asarray(get_z_latents(seeds, self.z_dim))

    def mapper(self, z=None, truncation: float = 1.0, latent_z=None, c=None, class_conditioning=None):
        if z is None:
            z = latent_z  # patch pipelines pass the reference kwarg name
        return mapping(self.params, jnp.asarray(z), self.cfg, truncation)

    def synthesizer(self, latents, translation=None, rotation=None):
        transform = None
        if translation is not None or rotation is not None:
            t = translation if translation is not None else (0.0, 0.0)
            r = rotation if rotation is not None else 0.0
            transform = make_transform_mat(tuple(np.asarray(t).reshape(-1)[:2]), float(np.asarray(r).reshape(-1)[0]))
        return synthesis(self.params, jnp.asarray(latents), self.cfg, transform)

    def __call__(self, z, truncation: float = 1.0, translation=None, rotation=None):
        return self.synthesizer(self.mapper(z, truncation), translation, rotation)

    def render(self, latent_w_plus, translation=None, rotation=None, batch_size: int = 4,
               postprocess=None, pix_fmt: str = "rgb24", **_ignored):
        """Batched frame generator mirroring the SG2 wrapper surface
        (`wrappers/__init__.py:52-99`): per-frame translation (T, 2) and
        rotation (T,) drive the Fourier input transform."""
        latent_w_plus = jnp.asarray(latent_w_plus)
        t = latent_w_plus.shape[0]
        mats = None
        if translation is not None or rotation is not None:
            tr = np.zeros((t, 2), np.float32) if translation is None else np.asarray(translation)
            ro = np.zeros((t,), np.float32) if rotation is None else np.asarray(rotation).reshape(-1)
            mats = jnp.stack([make_transform_mat((float(tr[i, 0]), float(tr[i, 1])), float(ro[i]))
                              for i in range(t)])

        # cache the jitted synthesis on the instance: a fresh jit per
        # render() call would recompile the full graph every invocation
        if not hasattr(self, "_render_fn"):
            self._render_fn = jax.jit(lambda params, ws, m: synthesis(params, ws, self.cfg, m))
        fn = lambda ws, m: self._render_fn(self.params, ws, m)

        def batches():
            for s0 in range(0, t, batch_size):
                ws = latent_w_plus[s0 : s0 + batch_size]
                m = mats[s0 : s0 + batch_size] if mats is not None else None
                imgs = fn(ws, m)
                if getattr(self, "output_size", None) and (imgs.shape[2], imgs.shape[1]) != self.output_size:
                    w_out, h_out = self.output_size
                    imgs = jax.image.resize(imgs, (imgs.shape[0], h_out, w_out, imgs.shape[3]), "linear")
                if postprocess is not None:
                    imgs = postprocess(imgs)
                # uint8 HWC frames, same contract as the SG2 wrapper render
                yield jnp.clip((jnp.clip(imgs, -1, 1) + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

        from ..ops.video import pipelined_frames

        yield from pipelined_frames(batches(), pix_fmt)
