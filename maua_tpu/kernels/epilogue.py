"""Fused modulated-conv epilogue Pallas kernel.

The space-to-depth StyleGAN2 tail (gan/fast_synthesis.py) follows each
cell-grid conv with an elementwise chain — demodulation scale, grouped
cell-noise add, bias, leaky-relu(+gain), clamp, and (for conv0) the next
layer's input style scale. XLA fuses bias/act/clamp into the conv output
for free, but the grouped noise add requires a lane-splitting reshape
that limits fusion: measured on v5e, a 16x512x512x128 layer spends
~13 ms in the conv and up to another ~10 ms in the epilogue relayout
(reference epilogue semantics: `maua/GAN/wrappers/inference/ops.py:65-84`
bias_act, `.../stylegan2.py:195-251` noise add + demod ordering).

The kernel streams the conv output through VMEM in native NHWC row
blocks — no reshape ever touches the big tensor (a flatten between the
conv and its consumers blocks XLA fusion and costs more than it saves).
Noise expansion happens as per-group lane broadcast + concat on the
small (rows, W, G) block. Op order and dtypes mirror the XLA path
(all arithmetic in the input dtype).

STATUS: measured on v5e, the kernel beats the unfused XLA chain in
isolation (8.8 ms vs 14.7 ms for 16x512x512x128 with noise; the pure
bf16 copy roofline is 5.2 ms), but in the full synthesis graph the
pallas_call boundary blocks XLA's cross-layer fusion/overlap and the
end-to-end fps drops (203 -> 160). fast_synthesis therefore uses the
consolidated XLA chain by default (MAUA_FUSED_EPILOGUE=1 opts in);
the kernel remains the right tool for standalone epilogue passes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_SQRT2 = float(np.sqrt(2.0))


def _xla_epilogue(z, post, noise, bias, alpha, gain, clamp, pre_next, quant_out=False):
    """Reference chain, identical op order/dtypes to the fast-path tail.

    z: (B, H, W, C); post/pre_next: (B, C); noise: (B|1, H, W, G).

    quant_out: emit int8 — the caller folds the activation quantization
    scale (127/amax) into pre_next, so the output IS the next int8
    conv's operand (saves a full-tensor HBM pass AND writes 1 byte per
    element instead of 2)."""
    dt = z.dtype
    b, h, w, c = z.shape
    y = z * post[:, None, None, :].astype(dt)
    if noise is not None:
        g = noise.shape[-1]
        y = (y.reshape(b, h, w, g, c // g) + noise[..., None].astype(dt)).reshape(b, h, w, c)
    y = y + bias.astype(dt)
    y = jnp.where(y >= 0, y, y * jnp.asarray(alpha, dt)) * jnp.asarray(gain, dt)
    if clamp is not None and clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    if pre_next is not None:
        y = y * pre_next[:, None, None, :].astype(dt)
    if quant_out:
        y = jnp.clip(jnp.round(y.astype(jnp.float32)), -127.0, 127.0).astype(jnp.int8)
    return y


def _kernel(z_ref, post_ref, noise_ref, bias_ref, pre_ref, out_ref, *,
            alpha: float, gain: float, clamp: Optional[float], use_noise: bool,
            use_pre: bool):
    y = z_ref[...]  # (bh, W, C)
    dt = y.dtype
    y = y * post_ref[...].astype(dt)  # (1, 1, C)
    if use_noise:
        # exact expansion: per-group lane broadcast + concat (pure data
        # movement — same values as the grouped reshape)
        nb = noise_ref[...].astype(dt)  # (bh, W, G)
        g = nb.shape[-1]
        rep = y.shape[-1] // g
        n = jnp.concatenate(
            [jnp.broadcast_to(nb[..., i : i + 1], nb.shape[:2] + (rep,)) for i in range(g)],
            axis=-1,
        )
        y = y + n
    y = y + bias_ref[...].astype(dt)
    # v5e Mosaic lacks bf16 vector compare: predicate in f32 (exact cast)
    y = jnp.where(y.astype(jnp.float32) >= 0, y, y * jnp.asarray(alpha, dt))
    y = y * jnp.asarray(gain, dt)
    if clamp is not None and clamp >= 0:
        y = jnp.minimum(jnp.maximum(y, jnp.asarray(-clamp, dt)), jnp.asarray(clamp, dt))
    if use_pre:
        y = y * pre_ref[...].astype(dt)
    out_ref[...] = y


def _pick_rows(h: int, w: int, c: int, itemsize: int, budget: int = 1024 * 1024) -> int:
    bh = 1
    cand = 1
    while cand <= h:
        if h % cand == 0 and cand * w * c * itemsize <= budget:
            bh = cand
        cand *= 2
    return bh


def modconv_epilogue(
    z: jax.Array,  # (B, H, W, C) conv output (NHWC)
    post: jax.Array,  # (B, C) demodulation scale
    noise: Optional[jax.Array],  # (B|1, H, W, G); group g covers channels [g*C/G, (g+1)*C/G)
    bias: jax.Array,  # (C,)
    alpha: float = 0.2,
    gain: float = _SQRT2,
    clamp: Optional[float] = 256.0,
    pre_next: Optional[jax.Array] = None,  # (B, C) next layer's input scale
    interpret: bool = False,
) -> jax.Array:
    """demod * z + grouped noise + bias -> lrelu*gain -> clamp [-> pre_next*].

    Single fused HBM pass over the conv output in native NHWC blocks,
    replacing 2-3 partially-fused elementwise passes. Falls back to
    identical-math XLA off-TPU or on shapes the kernel does not tile."""
    b, h, w, c = z.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    bh = _pick_rows(h, w, c, z.dtype.itemsize)
    ok = (
        _HAVE_PALLAS
        and (on_tpu or interpret)
        and c % 128 == 0
        and w % 8 == 0
        and (noise is None or c % noise.shape[-1] == 0)
    )
    if not ok:
        return _xla_epilogue(z, post, noise, bias, alpha, gain, clamp, pre_next)

    g = noise.shape[-1] if noise is not None else 8
    if noise is None:
        noise_in = jnp.zeros((1, bh, w, g), z.dtype)
        noise_spec = pl.BlockSpec((None, bh, w, g), lambda i, j: (0, 0, 0, 0))
    elif noise.shape[0] == 1:  # shared (const-mode) noise buffer
        noise_in = noise
        noise_spec = pl.BlockSpec((None, bh, w, g), lambda i, j: (0, j, 0, 0))
    else:
        noise_in = noise
        noise_spec = pl.BlockSpec((None, bh, w, g), lambda i, j: (i, j, 0, 0))
    pre_in = jnp.ones((b, c), z.dtype) if pre_next is None else pre_next

    kernel = functools.partial(
        _kernel, alpha=alpha, gain=gain, clamp=clamp,
        use_noise=noise is not None, use_pre=pre_next is not None,
    )
    # per-sample vectors carry singleton spatial axes so every block
    # equals the full trailing dims (TPU lowering requirement)
    return pl.pallas_call(
        kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((None, bh, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((None, 1, 1, c), lambda i, j: (i, 0, 0, 0)),
            noise_spec,
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((None, 1, 1, c), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, bh, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), z.dtype),
        interpret=interpret,
    )(z, post[:, None, None, :], noise_in, jnp.reshape(bias, (1, 1, c)),
      pre_in[:, None, None, :])
