"""CLI tree: `python -m maua_tpu {diffusion,super,style,audiovisual,gan,autoregressive}`.

Rebuild of `maua/cli/entrypoint.py:6-33` (argparse tree dispatching to
subcommand mains; subparsers in `maua/cli/{autoregressive,diffusion,
style,super}.py`). Subcommands forward their remaining argv to the
pipeline module's own `main`, so every pipeline stays directly
runnable as `python -m maua_tpu.<module>` too.
"""

from __future__ import annotations

import sys

COMMANDS = {
    "diffusion": {
        "image": ("maua_tpu.diffusion.image", "Multi-resolution (guided) diffusion image synthesis"),
        "video": ("maua_tpu.diffusion.video", "Flow-warped diffusion video stylization"),
        "interpolate": ("maua_tpu.diffusion.interpolate", "Latent interpolation video between input images"),
        "klmc2": ("maua_tpu.diffusion.klmc2", "KLMC2 latent-space animation"),
        "outpaint": ("maua_tpu.diffusion.outpaint", "Diffusion outpainting"),
        "loop": ("maua_tpu.diffusion.loop_direct", "Direct multi-pass diffusion video loop"),
    },
    "dataset": {
        "retrieve": ("maua_tpu.dataset.laion_clip_retrieval", "LAION CLIP-retrieval image scraper"),
    },
    "super": {
        "image": ("maua_tpu.super.image", "Image super-resolution (RealESRGAN-class models)"),
        "video": ("maua_tpu.super.video", "Video super-resolution / RIFE frame interpolation"),
    },
    "style": {
        "image": ("maua_tpu.style.cli", "Neural style transfer"),
        "video": ("maua_tpu.style.video", "Flow-consistent video style transfer"),
    },
    "audiovisual": {
        "generate": ("maua_tpu.audiovisual.generate", "Audio-reactive GAN video synthesis"),
        "interactive": ("maua_tpu.audiovisual.interactive", "Interactive per-section patch evolution REPL"),
        "selfsupervised": ("maua_tpu.audiovisual.selfsupervised.sample", "Self-supervised audio-reactive generation"),
    },
    "gan": {
        "generate": ("maua_tpu.gan.cli", "StyleGAN image generation"),
        "train": ("maua_tpu.gan.train_cli", "GAN training (plugin registry of models/losses/augs)"),
    },
    "autoregressive": {
        "generate": ("maua_tpu.autoregressive.cli", "Autoregressive text-to-image generation"),
        "video": ("maua_tpu.autoregressive.video_cli", "Two-stage autoregressive text-to-video"),
    },
    "nca": {
        "run": ("maua_tpu.nca.nca", "Texture NCA: train on a style image / render evolution video"),
    },
    "serve": {
        "http": ("maua_tpu.serve", "Warm-model inference server (micro-batched, HTTP)"),
    },
}


def usage():
    print("usage: python -m maua_tpu <command> <subcommand> [args...]\n")
    for cmd, subs in COMMANDS.items():
        for sub, (_, desc) in subs.items():
            print(f"  {cmd} {sub:<10} {desc}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 1 or argv[0] in ("-h", "--help"):
        usage()
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}\n")
        usage()
        return 1
    subs = COMMANDS[cmd]
    sub = argv[1] if len(argv) > 1 and argv[1] in subs else next(iter(subs))
    rest = argv[2:] if len(argv) > 1 and argv[1] in subs else argv[1:]
    module_path, _ = subs[sub]
    import importlib
    import os

    # MAUA_PLATFORM=cpu forces the CPU backend for any subcommand. The
    # axon sitecustomize force-sets jax_platforms="axon,cpu" AFTER env
    # vars are read, so JAX_PLATFORMS alone is ignored — the in-process
    # config update below is the only override that sticks.
    plat = os.environ.get("MAUA_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    from ..utility import enable_compilation_cache

    enable_compilation_cache()  # no-op unless MAUA_COMPILE_CACHE is set
    mod = importlib.import_module(module_path)
    return mod.main(rest)


if __name__ == "__main__":
    sys.exit(main())
