"""Autoregressive CLI: generate / finetune / api subcommands
(`maua/cli/autoregressive.py:14-33` surface; generate flags from
`ru_dalle_generate` :36-53, finetune from `ru_dalle_finetune` :56-75,
api from `ru_dalle_api`)."""

from __future__ import annotations

import argparse


def _text_tokens(text: str, cfg):
    import jax.numpy as jnp
    import numpy as np

    words = text.split()[: cfg.text_length]
    ids = [hash(w) % cfg.text_vocab_size for w in words] + [0] * (cfg.text_length - len(words))
    return jnp.asarray(np.array([ids], np.int32))


def _build(seed: int, checkpoint=None):
    import jax

    from .finetune import restore_checkpoint
    from .transformer import ARConfig, init_params

    cfg = ARConfig(width=128, layers=2, heads=4, image_rows=8, image_cols=8, text_length=16)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    if checkpoint:
        params = restore_checkpoint(checkpoint, {"params": params})["params"]
    return params, cfg


def generate(args):
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.io import tensor2img
    from . import vq
    from .oversample import oversample_generate
    from .transformer import generate_tokens

    params, cfg = _build(args.seed, args.checkpoint)
    text_tokens = _text_tokens(args.text, cfg)
    key = jax.random.PRNGKey(args.seed)

    vq_cfg = vq.VQConfig(codebook_size=cfg.vocab_size)
    vq_params = vq.init_params(jax.random.PRNGKey(1), vq_cfg)
    decode = lambda toks: np.asarray(
        vq.decode_tokens(vq_params, jnp.asarray(toks).reshape(len(toks), -1), vq_cfg,
                         cfg.image_rows, toks.shape[-1] if toks.ndim == 3 else cfg.image_cols))

    width, height = (int(v) for v in args.size.split(","))
    target_cols = max(round(cfg.image_cols * width / max(height, 1)), cfg.image_cols)

    batched = jnp.tile(text_tokens, (args.num_outputs, 1))
    if target_cols > cfg.image_cols and not args.no_oversample:
        # non-native aspect ratio: sliding-window oversampled decode
        grid = oversample_generate(params, batched, cfg, key, target_cols=target_cols,
                                   temperature=args.temperature, top_k=args.top_k)
        imgs = decode(grid)
    else:
        toks = generate_tokens(params, batched, cfg, key,
                               temperature=args.temperature, top_k=args.top_k, top_p=args.top_p)
        imgs = decode(np.asarray(toks).reshape(args.num_outputs, cfg.image_rows, cfg.image_cols))

    if args.rerank and args.rerank < len(imgs):
        from .rerank import clip_rerank

        imgs = imgs[clip_rerank(jnp.asarray(imgs), args.text, top_n=args.rerank)]

    os.makedirs(args.output_dir, exist_ok=True)
    stem = args.output_name or "ar"
    for i, im in enumerate(imgs):
        tensor2img(((im + 1) / 2)[None]).save(f"{args.output_dir}/{stem}_{i}.png")
    print(args.output_dir)
    return 0


def finetune_cmd(args):
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.image import resample
    from ..ops.io import load_image
    from . import vq
    from .finetune import FinetuneConfig, finetune

    params, cfg = _build(args.seed, args.checkpoint)
    paths = list(args.images or [])
    if args.input_dir:
        paths += sorted(sum((glob.glob(f"{args.input_dir}/*.{e}") for e in ("png", "jpg", "jpeg")), []))
    if not paths:
        raise SystemExit("no training images: pass --input_dir or --images")

    vq_cfg = vq.VQConfig(codebook_size=cfg.vocab_size)
    vq_params = vq.init_params(jax.random.PRNGKey(1), vq_cfg)
    size = cfg.image_rows * vq_cfg.upscale
    text = _text_tokens(args.input_text, cfg)

    grids = []
    for p in paths:
        img = resample(jnp.asarray(load_image(p)) * 2 - 1, size)
        toks = vq.encode_tokens(vq_params, img, vq_cfg) + cfg.text_vocab_size
        grids.append(np.concatenate([np.asarray(text), np.asarray(toks)], axis=1))
    data = np.concatenate(grids)  # (N, text+img tokens)

    def batches():
        rs = np.random.RandomState(args.seed)
        while True:
            yield data[rs.randint(len(data), size=min(args.batch_size, len(data)))]

    ft_cfg = FinetuneConfig(steps=args.steps, lr=args.lr, gradient_checkpointing=args.low_memory)
    new_params, losses = finetune(params, batches(), cfg, ft_cfg, save_path=None)
    # params-only checkpoint so `--checkpoint` restores into a fresh model
    from .finetune import save_checkpoint

    import os

    os.makedirs(os.path.dirname(args.save_path) or ".", exist_ok=True)
    save_checkpoint(args.save_path, {"params": new_params})
    print(f"{len(losses)} steps, loss {losses[0]:.4f} -> {losses[-1]:.4f}; saved {args.save_path}")
    return 0


def api_cmd(args):
    from .api import build_request_payload, request_kandinsky

    if args.dry_run:
        print(build_request_payload(args.text, top_k=args.top_k, top_p=args.top_p,
                                    images_num=args.num_outputs))
        return 0
    for i, img in enumerate(request_kandinsky(args.text, args.url, top_k=args.top_k,
                                              top_p=args.top_p, images_num=args.num_outputs)):
        img.save(f"{args.output_dir}/kandinsky_{i}.png")
    return 0


def main(args=None):
    parser = argparse.ArgumentParser(description="autoregressive text-to-image")
    sub = parser.add_subparsers(dest="cmd")

    # fmt: off
    g = sub.add_parser("generate", help="sample images (oversampled decode for non-native sizes)")
    g.add_argument("--text", "--input_text", dest="text", required=True, type=str)
    g.add_argument("--num_outputs", "--n_candidates", dest="num_outputs", default=4, type=int)
    g.add_argument("--size", default="256,256", type=str, help="width,height (wider than native -> oversampling)")
    g.add_argument("--no_oversample", action="store_true")
    g.add_argument("--seed", default=0, type=int)
    g.add_argument("--top_k", default=64, type=int)
    g.add_argument("--top_p", default=0.0, type=float)
    g.add_argument("--temperature", default=1.0, type=float)
    g.add_argument("--rerank", default=0, type=int, help="keep top-N by CLIP similarity")
    g.add_argument("--checkpoint", default=None, type=str)
    g.add_argument("--output_name", default=None, type=str)
    g.add_argument("--output_dir", "--out_dir", dest="output_dir", default="output/", type=str)
    g.set_defaults(func=generate)

    f = sub.add_parser("finetune", help="finetune on images (int8 blockwise Adam)")
    f.add_argument("--input_dir", default=None, type=str)
    f.add_argument("--images", nargs="*", default=[])
    f.add_argument("--input_text", default="", type=str)
    f.add_argument("--steps", default=100, type=int)
    f.add_argument("--lr", default=1e-4, type=float)
    f.add_argument("--batch_size", default=1, type=int)
    f.add_argument("--low_memory", action="store_true", help="gradient checkpointing")
    f.add_argument("--seed", default=0, type=int)
    f.add_argument("--checkpoint", default=None, type=str)
    f.add_argument("--save_path", default="output/ar_finetuned.npz", type=str)
    f.set_defaults(func=finetune_cmd)

    a = sub.add_parser("api", help="Sbercloud Kandinsky API request (dry-run prints the payload)")
    a.add_argument("--text", required=True, type=str)
    a.add_argument("--url", default="", type=str)
    a.add_argument("--dry_run", action="store_true", default=True)
    a.add_argument("--no_dry_run", dest="dry_run", action="store_false")
    a.add_argument("--top_k", default=1500, type=int)
    a.add_argument("--top_p", default=0.99, type=float)
    a.add_argument("--num_outputs", default=4, type=int)
    a.add_argument("--output_dir", default="output/", type=str)
    a.set_defaults(func=api_cmd)
    # fmt: on

    import sys

    argv = list(sys.argv[1:] if args is None else args)
    if not argv or argv[0] not in ("generate", "finetune", "api"):
        # bare flag-style invocation (the old single-command CLI): default to generate
        argv = ["generate"] + argv
    ns = parser.parse_args(argv)
    return ns.func(ns)
