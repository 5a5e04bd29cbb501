"""GAN training fit loop: metric-gated LR decay / checkpointing /
early stopping, EWMA logging, periodic evaluation.

Rebuild of the reference training harness orchestration
(`maua/GAN/training/trainer.py`: EWMA-smoothed metric logging
:276-288, metric-gated LR/ckpt/stop :290-306, validation grids
:259-264; `__main__.py:205-247` fit). Checkpoints are orbax-saved
pytrees; evaluation runs the FID/KID/PRDC suite.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

import jax


from . import stylegan2 as sg2
from . import training as tr
from .data import ImageDataset, augment_batch
from .discriminator import D2Config
from .metrics import compute_metrics


def save_checkpoint(path: str, state: Dict):
    """Orbax pytree checkpoint (aux subsystem: checkpoint/resume)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Dict) -> Dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(like))


@dataclass
class FitConfig:
    total_steps: int = 10_000
    eval_every: int = 1_000
    log_every: int = 50
    ewma_beta: float = 0.9
    lr_decay_factor: float = 0.5
    lr_patience: int = 3  # evals without improvement before decay
    early_stop_patience: int = 10
    n_eval_images: int = 64
    out_dir: str = "workspace/gan_training"
    augment_p: float = 0.2
    ckpt_every: int = 0  # periodic scored checkpoints (0 = best/final only)
    ckpt_top_k: int = 10  # keep this many periodic checkpoints (`--ckpt_top_k`)
    monitor_metric: str = "fid"  # metric gating lr decay/early stop/top-k (`--monitor_metric`)


def fit(
    dataset: ImageDataset,
    g_cfg: sg2.SG2Config,
    d_cfg: D2Config,
    t_cfg: tr.TrainConfig = tr.TrainConfig(),
    fit_cfg: FitConfig = FitConfig(),
    state: Optional[Dict] = None,
    key=None,
    verbose: bool = True,
) -> Dict:
    """Train until total_steps or early stop; returns final state."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if state is None:
        key, sub = jax.random.split(key)
        state = tr.init_train_state(sub, g_cfg, d_cfg, t_cfg)
    os.makedirs(fit_cfg.out_dir, exist_ok=True)

    ewma: Dict[str, float] = {}
    best_score = float("inf")
    evals_since_best = 0
    lr_scale = 1.0
    kept_ckpts = []  # (monitor score, path) of periodic checkpoints, lower = better
    step = int(jax.device_get(state["step"]))
    data_iter = iter(dataset)

    # reals for FID reference
    reals = []
    for batch in dataset:
        reals.append(np.asarray(batch))
        if sum(r.shape[0] for r in reals) >= fit_cfg.n_eval_images:
            break
    reals = np.concatenate(reals)[: fit_cfg.n_eval_images]

    while step < fit_cfg.total_steps:
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = iter(dataset)
            batch = next(data_iter)
        key, k_aug, k_step = jax.random.split(key, 3)
        if fit_cfg.augment_p > 0:
            batch = augment_batch(k_aug, batch, p_translate=fit_cfg.augment_p)

        state, metrics = tr.train_step(state, batch, k_step, g_cfg, d_cfg, t_cfg)
        step += 1

        if step % fit_cfg.log_every == 0:
            for k, v in metrics.items():
                v = float(jax.device_get(v))
                ewma[k] = v if k not in ewma else fit_cfg.ewma_beta * ewma[k] + (1 - fit_cfg.ewma_beta) * v
            if verbose:
                msg = " ".join(f"{k}={v:.4f}" for k, v in ewma.items())
                print(f"step {step}: {msg} lr_scale={lr_scale:.3f}")

        if step % fit_cfg.eval_every == 0 or step == fit_cfg.total_steps:
            key, k_eval = jax.random.split(key)
            z = jax.random.normal(k_eval, (fit_cfg.n_eval_images, g_cfg.z_dim))
            fakes = []
            for i in range(0, fit_cfg.n_eval_images, 16):
                fakes.append(np.asarray(tr.generate(state["g_ema"], z[i : i + 16], g_cfg)))
            fakes = np.concatenate(fakes)
            scores = compute_metrics(reals, fakes, batch=16)
            if verbose:
                print(f"eval @ {step}: " + " ".join(f"{k}={v:.4f}" for k, v in scores.items()))

            # image grid dump (trainer.py:260-264)
            from ..ops.io import tensor2img

            n = min(16, len(fakes))
            side = int(np.ceil(np.sqrt(n)))
            h, w = fakes.shape[1:3]
            grid = np.zeros((side * h, side * w, 3), np.float32)
            for i in range(n):
                r, c = divmod(i, side)
                grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = (fakes[i] + 1) / 2
            tensor2img(np.clip(grid, 0, 1)[None]).save(f"{fit_cfg.out_dir}/grid_{step:07d}.png")

            # metric-gated callbacks (trainer.py:290-306). monitor is
            # lower-is-better (FID/KID family, the reference's default
            # "Frechet SwAV Distance" role).
            monitor = scores.get(fit_cfg.monitor_metric, scores["fid"])

            # periodic scored checkpoints, keep top-k (`__main__.py
            # --ckpt_kimg/--ckpt_top_k` via ModelCheckpoint(save_top_k))
            if fit_cfg.ckpt_every > 0 and step % fit_cfg.ckpt_every == 0:
                path = f"{fit_cfg.out_dir}/ckpt_{step:07d}"
                save_checkpoint(path, state)
                kept_ckpts.append((monitor, path))
                kept_ckpts.sort(key=lambda sp: sp[0])
                while len(kept_ckpts) > fit_cfg.ckpt_top_k:
                    _, worst = kept_ckpts.pop()
                    import shutil

                    shutil.rmtree(worst, ignore_errors=True)

            if monitor < best_score:
                best_score = monitor
                evals_since_best = 0
                save_checkpoint(f"{fit_cfg.out_dir}/ckpt_best", state)
            else:
                evals_since_best += 1
                if evals_since_best % fit_cfg.lr_patience == 0:
                    lr_scale *= fit_cfg.lr_decay_factor
                    t_cfg = tr.TrainConfig(
                        **{**t_cfg.__dict__, "g_lr": t_cfg.g_lr * fit_cfg.lr_decay_factor,
                           "d_lr": t_cfg.d_lr * fit_cfg.lr_decay_factor}
                    )
                if evals_since_best >= fit_cfg.early_stop_patience:
                    if verbose:
                        print(f"early stop at step {step} "
                              f"(best {fit_cfg.monitor_metric} {best_score:.3f})")
                    break
    save_checkpoint(f"{fit_cfg.out_dir}/ckpt_final", state)
    return state
