"""Model export: serialized StableHLO artifacts for deployment.

Production deployments want model artifacts that load WITHOUT the
Python model code — version-skew isolation, serving fleets that ship
a runtime but not the framework, archival of exact compiled behavior.
`jax.export` serializes a jitted computation as versioned StableHLO
with embedded shape/dtype signatures; weights captured by closure are
baked into the module as constants, so one file is the whole model.

    from maua_tpu.export import export_generator, load_exported
    export_generator(StyleGAN2(model_file="G.pkl"), "g.stablehlo", batch_size=8)
    ...
    synth = load_exported("g.stablehlo")   # no maua_tpu model code needed
    frames = synth(z)                      # (8, H, W, 3) uint8

Artifacts are lowered for the exporting platform by default (TPU when
exported on TPU); pass ``platforms=("tpu", "cpu")`` to emit a
multi-platform module. No reference counterpart (torch would use
TorchScript/ONNX here); this rounds out the serving story.
"""

from __future__ import annotations

import json
import zipfile
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

_META_NAME = "meta.json"
_MODULE_NAME = "module.stablehlo"


def export_fn(
    fn: Callable,
    example_args: Tuple,
    path: str,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize `jit(fn)(*example_args)` as a StableHLO artifact.

    Anything `fn` closes over (e.g. weights) is baked in as constants.
    The artifact replays exactly the traced computation for inputs of
    the example shapes/dtypes.
    """
    import jax

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax.export.export(jax.jit(fn), **kwargs)(*example_args)
    data = exported.serialize()
    meta = {
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
    }
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MODULE_NAME, data)
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
    return path


def exported_meta(path: str) -> dict:
    """Read an artifact's signature without loading the module."""
    with zipfile.ZipFile(path) as zf:
        return json.loads(zf.read(_META_NAME))


def load_exported(path: str) -> Callable:
    """Load a StableHLO artifact back into a callable (jittable,
    composable with other jax code; needs no model-definition code)."""
    import jax

    with zipfile.ZipFile(path) as zf:
        exported = jax.export.deserialize(bytearray(zf.read(_MODULE_NAME)))
    return exported.call


def export_diffusion(
    processor,
    path: str,
    batch_size: int = 2,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export the full text->image sampler of an SD-class processor:
    `(tokens (B,L) i32, seeds (B,) u32, cfg_scales (B,) f32) -> uint8
    frames`. Text encoder, CFG denoise scan, VAE decode, and all
    weights bake into one module; tokenization stays host-side
    (`text.clip_text.tokenize`)."""
    import jax.numpy as jnp

    from .serve import text2img_fn

    tokens = jnp.zeros((batch_size, processor.text_cfg.context_length), jnp.int32)
    seeds = jnp.zeros((batch_size,), jnp.uint32)
    scales = jnp.ones((batch_size,), jnp.float32)
    return export_fn(text2img_fn(processor), (tokens, seeds, scales), path, platforms=platforms)


def export_generator(
    gen,
    path: str,
    batch_size: int = 1,
    truncation: Optional[float] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export a GAN wrapper (StyleGAN2/3 facade) as a self-contained
    frames module at a fixed batch size (the serving contract: one
    static shape, see `serve.py`).

    truncation=None (default) exports `(z, psi) -> uint8 frames` with
    per-sample truncation as a runtime argument — what
    `serve.ArtifactGANService` consumes. A float bakes it in and the
    module signature is `z -> uint8 frames`.
    """
    import jax.numpy as jnp

    from .serve import _find_w_avg

    def to_u8(img):
        return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    z = jnp.zeros((batch_size, gen.z_dim), jnp.float32)
    if truncation is not None:
        def synth(z):
            return to_u8(gen.synthesizer(gen.mapper(z, truncation=truncation)))

        return export_fn(synth, (z,), path, platforms=platforms)

    w_avg = _find_w_avg(gen.params)

    def synth(z, psi):
        ws = gen.mapper(z)
        if w_avg is not None:
            ws = w_avg + psi[:, None, None] * (ws - w_avg)
        return to_u8(gen.synthesizer(ws))

    psi = jnp.ones((batch_size,), jnp.float32)
    return export_fn(synth, (z, psi), path, platforms=platforms)
