"""KLMC2 animation: kinetic Langevin MCMC over the diffusion score
field.

Rebuild of `maua/diffusion/klmc2_animation.py` (sample_mcmc_klmc2
:151-318): second-order (underdamped) Langevin dynamics in latent
space driven by the denoiser's score, with the Hessian-vector products
the reference takes via functorch jvp/vjp expressed as jax.jvp over
the score function.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np




def score_from_denoiser(denoiser: Callable, sigma: float) -> Callable:
    """score(x) = (denoised - x) / sigma^2."""

    def score(x):
        s = sigma * jnp.ones(x.shape[0])
        return (denoiser(x, s) - x) / sigma**2

    return score


def sample_mcmc_klmc2(
    denoiser: Callable,  # (x, sigma_batch) -> denoised
    x0: jax.Array,
    sigma: float = 1.0,
    n_steps: int = 100,
    step_size: float = 0.05,
    friction: float = 1.0,
    alpha: float = 0.0,
    tau: float = 1.0,
    use_hvp: bool = True,
    key=None,
) -> Tuple[jax.Array, jax.Array]:
    """Kinetic Langevin MCMC (KLMC2, `klmc2_animation.py:151-318`):
    x'' = score(x) - gamma x' + sqrt(2 gamma tau) noise, integrated with
    a second-order scheme using score jvp (Hessian-vector products).
    `alpha` adds the reference's quadratic penalty (weight decay) to the
    potential (score -= alpha * x, `klmc2_animation.py:388`); `tau`
    scales the injected-noise temperature (`:389`).

    Returns (final x, trajectory (n_steps, ...))."""
    key = key if key is not None else jax.random.PRNGKey(0)
    base_score = score_from_denoiser(denoiser, sigma)
    score = (lambda x: base_score(x) - alpha * x) if alpha > 0 else base_score
    gamma = friction
    h = step_size

    def step(carry, k):
        x, v = carry
        k1, k2 = jax.random.split(k)
        s = score(x)
        if use_hvp:
            # second-order correction: d score/dt = H @ v  (jvp)
            _, hvp = jax.jvp(score, (x,), (v,))
            s_mid = s + 0.5 * h * hvp
        else:
            s_mid = s
        noise = jax.random.normal(k1, x.shape) * jnp.sqrt(tau)
        v = v * jnp.exp(-gamma * h) + h * s_mid + jnp.sqrt(1 - jnp.exp(-2 * gamma * h)) * noise
        x = x + h * v
        return (x, v), x

    v0 = jnp.zeros_like(x0)
    (x, _), traj = jax.lax.scan(step, (x0, v0), jax.random.split(key, n_steps))
    return x, traj


def klmc2_animation(
    diffusion,
    shape: Tuple[int, int] = (64, 64),
    n_frames: int = 64,
    sigma: float = 1.0,
    step_size: float = 0.05,
    batch_decode: int = 8,
    text: Optional[str] = None,
    cond_scale: float = 1.0,
    friction: float = 1.0,
    alpha: float = 0.0,
    tau: float = 1.0,
    use_hvp: bool = True,
    key=None,
) -> np.ndarray:
    """Animate a latent-space KLMC2 trajectory through the SD score
    field, decoding frames in batches. Returns (T, H, W, 3).
    `text`/`cond_scale` steer the score with CFG like the reference
    CLI's prompt/--cond_scale (`klmc2_animation.py:377-397`)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ds = diffusion.vae_cfg.downscale
    h, w = shape[0] // ds, shape[1] // ds
    x0 = jax.random.normal(k1, (1, h, w, diffusion.vae_cfg.z_channels)) * sigma

    from ..prompt import TextPrompt
    from .wrappers import cfg_denoiser

    cond, uncond = diffusion.conditioning([TextPrompt(text)] if text else [])
    model_fn = cfg_denoiser(diffusion.denoiser, cond, uncond, cond_scale)
    _, traj = sample_mcmc_klmc2(model_fn, x0, sigma=sigma, n_steps=n_frames, step_size=step_size,
                                friction=friction, alpha=alpha, tau=tau, use_hvp=use_hvp, key=k2)

    frames = []
    for i in range(0, n_frames, batch_decode):
        z = traj[i : i + batch_decode, 0]
        frames.append(np.asarray(diffusion.decode(z)))
    return np.concatenate(frames)


def main(args=None):
    """CLI (`klmc2_animation.py:377-397`)."""
    import argparse

    from ..ops.video import write_video
    from .image import get_diffusion_model

    parser = argparse.ArgumentParser(description="KLMC2 latent-space animation",
                                     formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("prompt", type=str)
    parser.add_argument("--cond_scale", type=float, default=5.0, help="prompt conditioning strength")
    parser.add_argument("--n", default=120, type=int, help="frames to sample")
    parser.add_argument("--fps", default=20, type=int)
    parser.add_argument("--sigma", default=0.75, type=float, help="noise level to sample at")
    parser.add_argument("--h", default=0.2, type=float, help="step size (0 to 1)")
    parser.add_argument("--gamma", default=0.5, type=float, help="friction (lower -> smoother)")
    parser.add_argument("--alpha", default=1e-3, type=float, help="quadratic penalty (weight decay) strength")
    parser.add_argument("--tau", default=1.0, type=float, help="temperature (noise added per step)")
    parser.add_argument("--hvp_method", default="forward", choices=["forward", "zero"],
                        help="'forward' = real jvp Hessian-vector products, 'zero' = first-order KLMC")
    parser.add_argument("--model_path", default=None, type=str,
                        help="custom stable-diffusion checkpoint to load (CompVis format)")
    parser.add_argument("--size", default="512,512", type=str)
    parser.add_argument("--out_dir", default="output/", type=str)
    args = parser.parse_args(args)

    diffusion = get_diffusion_model(args.model_path or "stable", timesteps=50)
    shape = tuple(int(s) for s in args.size.split(","))
    frames = klmc2_animation(
        diffusion, shape=shape, n_frames=args.n, sigma=args.sigma, step_size=args.h,
        text=args.prompt, cond_scale=args.cond_scale, friction=args.gamma,
        alpha=args.alpha, tau=args.tau, use_hvp=args.hvp_method == "forward",
    )
    out_file = f"{args.out_dir}/{args.prompt.replace(' ', '_')}_klmc2.mp4"
    write_video(frames, out_file, fps=args.fps, value_range=(-1, 1))
    print(out_file)
    return 0


if __name__ == "__main__":
    main()
