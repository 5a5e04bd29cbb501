"""Profiling + per-stage timing, first-class.

The reference has no formal tracing (SURVEY.md section 5: tqdm bars +
ad-hoc timing harnesses). Rebuild: jax.profiler traces and a
lightweight stage timer whose reports drive perf work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    """Accumulating wall-clock stage timer with device sync."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                          total(s)   calls   mean(ms)"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30} {total:8.3f} {n:7d} {1000 * total / n:10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/maua_trace"):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in XProf timelines)."""
    return jax.profiler.TraceAnnotation(name)


# ------------------------------------------------------------------ MFU
# TPU v5e (v5 litepod) chip peaks; bf16 and int8 run through the same
# MXU at 1x / 2x rate.
V5E_PEAK_TFLOPS = {"bfloat16": 197.0, "int8": 394.0, "float32": 197.0 / 4}


def compiled_flops(fn, *args, **kwargs) -> float:
    """XLA's own FLOP estimate for one call of `fn(*args)` (lower ->
    compile -> cost_analysis). Counts executed hardware FLOPs, so
    padding/inflation shows up — this measures hardware utilization;
    pair with an analytic model-FLOP count for algorithmic efficiency."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", float("nan")))


def mfu(model_flops: float, seconds: float, dtype: str = "bfloat16") -> float:
    """Model-FLOPs utilization: achieved useful TFLOP/s over chip peak."""
    peak = V5E_PEAK_TFLOPS.get(dtype, V5E_PEAK_TFLOPS["bfloat16"])
    return (model_flops / seconds) / (peak * 1e12)


def sg2_frame_flops(cfg) -> float:
    """Analytic model FLOPs for ONE StyleGAN2 synthesis frame
    (modulated convs + torgb; mapping and FIR resampling are noise).
    2*H*W*Cin*Cout*k^2 per conv at output resolution."""
    total = 0.0
    for res in cfg.block_resolutions:
        co = cfg.channels(res)
        if res == 4:
            total += 2 * res * res * co * co * 9  # conv1
        else:
            ci = cfg.channels(res // 2)
            total += 2 * res * res * ci * co * 9  # conv0 (up)
            total += 2 * res * res * co * co * 9  # conv1
        total += 2 * res * res * co * cfg.img_channels  # torgb 1x1
    return total


def unet_step_flops(cfg, hw: int, context_len: int = 77) -> float:
    """Analytic model FLOPs for ONE SD-class UNet eval on an hw x hw
    latent (res blocks 3x3 convs + attention qkv/proj + attention
    matmuls + geglu FFN), approximate but within ~10%."""
    total = 0.0
    chans = [cfg.model_channels * m for m in cfg.channel_mult]
    # encoder/decoder resblock convs at each level (down + up + skips):
    # ~3x the encoder count is a fair approximation of the UNet ladder
    for lvl, c in enumerate(chans):
        size = hw // (2 ** lvl)
        n_blocks = cfg.num_res_blocks * 3
        total += n_blocks * 2 * (size * size) * c * c * 9 * 2  # two convs per block
        if (2 ** lvl) in cfg.attention_resolutions:
            n = size * size
            d = c
            per_tx = (
                4 * 2 * n * d * d            # self qkv + proj
                + 2 * 2 * n * n * d          # qk^T + av
                + 2 * 2 * n * d * d          # cross q + proj
                + 2 * 2 * context_len * d * d  # cross kv
                + 2 * 2 * n * context_len * d  # cross attention matmuls
                + 2 * n * d * (8 * d) * 2    # geglu ffn
            )
            total += n_blocks * per_tx * cfg.transformer_depth
    return total


def sg3_frame_flops(cfg) -> float:
    """Analytic model FLOPs for ONE StyleGAN3 frame: the modulated
    convs at each layer's input canvas (the filtered-lrelu FIR chain is
    bandwidth-, not FLOP-, dominated and is excluded — this counts the
    model's matmul work)."""
    _, _, _, _, sizes, chans = cfg.layer_plan()
    k = cfg.conv_kernel
    total = 2 * int(sizes[0]) ** 2 * cfg.channel_max * int(chans[0])  # input 1x1 mix
    for i in range(1, len(chans)):
        ci, co = int(chans[i - 1]), int(chans[i])
        kk = 1 if i == len(chans) - 1 else k  # torgb is 1x1
        total += 2 * int(sizes[i - 1]) ** 2 * ci * co * kk * kk
    return float(total)


def rrdb_flops(cfg, h: int, w: int) -> float:
    """Analytic model FLOPs for ONE RRDBNet forward on an (h, w) input
    (dense blocks + trunk + nearest-upsample convs, RealESRGAN x4)."""
    nf, gc, nb = cfg.num_feat, cfg.num_grow_ch, cfg.num_block
    hw = h * w
    total = 2 * hw * cfg.num_in_ch * nf * 9  # conv_first
    per_db = sum(2 * hw * (nf + k * gc) * (gc if k < 4 else nf) * 9 for k in range(5))
    total += nb * 3 * per_db  # 3 dense blocks per RRDB
    total += 2 * hw * nf * nf * 9  # trunk conv
    s = 1
    while s < cfg.scale:  # upsample convs run at the upsampled size
        s *= 2
        total += 2 * (h * s) * (w * s) * nf * nf * 9
    total += 2 * (h * cfg.scale) * (w * cfg.scale) * nf * nf * 9  # conv_hr
    total += 2 * (h * cfg.scale) * (w * cfg.scale) * nf * cfg.num_out_ch * 9  # conv_last
    return float(total)


def d2_forward_flops(cfg) -> float:
    """Analytic model FLOPs for ONE discriminator forward (resnet D:
    two 3x3 convs + 1x1 skip per block at the block's input size)."""
    total = 2 * cfg.img_resolution**2 * cfg.img_channels * cfg.channels(cfg.img_resolution)  # frgb 1x1
    for res in cfg.block_resolutions:
        ci, co = cfg.channels(res), cfg.channels(res // 2)
        total += 2 * res * res * ci * ci * 9          # conv0 (same)
        total += 2 * (res // 2) ** 2 * ci * co * 9    # conv1 (down)
        total += 2 * (res // 2) ** 2 * ci * co        # skip 1x1
    c4 = cfg.channels(4)
    total += 2 * 16 * (c4 + cfg.mbstd_num_channels) * c4 * 9  # final conv
    total += 2 * 16 * c4 * c4  # fc
    return float(total)


def gan_train_step_flops(g_cfg, d_cfg, batch: int) -> float:
    """Approximate model FLOPs for one alternating D+G train step at
    `batch` images (bwd counted as 2x fwd): D step = G fwd (no grad) +
    D fwd+bwd on fake AND real; G step = G fwd+bwd + D fwd+bwd(input
    grads). Lazy R1/path-length regularizer steps are excluded (they
    run every r1_interval/pl_interval steps)."""
    g = sg2_frame_flops(g_cfg)
    d = d2_forward_flops(d_cfg)
    per_image = (1 * g + 3 * d + 3 * d) + (3 * g + 3 * d)
    return float(per_image * batch)
