#!/usr/bin/env python
"""End-to-end pipeline wall-clocks for the two BASELINE configs that
name full entry points rather than kernels:

  #2  text-to-image CFG diffusion, 256^2, 50 timesteps, through
      `maua_tpu.diffusion.image.image_sample` (reference entry:
      `maua/diffusion/image.py:217`), SD-class UNet, lms sampler.
  #5  full audio-reactive pipeline: wav -> envelopes -> latent/noise
      modulation -> 1024^2 StyleGAN2 frames -> encoded video, through
      `maua_tpu.audiovisual.generate.generate_audiovisual_from_patch`
      (reference entry: `maua/audiovisual/generate.py:16-54`) with the
      example SG2 patch.

Weights are random-init (zero egress) — identical shapes/FLOPs to the
pretrained checkpoints; wall-clock and fps are what is being measured.
Prints one JSON line per config, bench.py style.

Knobs: MAUA_BENCH_AV_SECONDS (default 60), MAUA_BENCH_IMG_STEPS (50).
"""

import json
import os
import sys
import time


def bench_image_sample():
    import jax

    from maua_tpu.diffusion.image import image_sample

    steps = int(os.environ.get("MAUA_BENCH_IMG_STEPS", "50"))
    size = int(os.environ.get("MAUA_BENCH_IMG_SIZE", "256"))
    # the model builds ONCE (the reference CLI also holds one processor
    # per process); the pipeline wall-clock is what config #2 names.
    # First sample pays trace+compile, second is the steady state.
    from maua_tpu.diffusion.image import get_diffusion_model

    t0 = time.perf_counter()
    model = get_diffusion_model("stable", timesteps=steps, sampler="lms")
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    img = image_sample(text="a painting of a tpu supercomputer", sizes=((size, size),),
                       timesteps=steps, diffusion=model, verbose=False)
    float(jax.numpy.sum(img))  # scalar-fetch sync (relay-safe)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    img = image_sample(text="a painting of a tpu supercomputer", sizes=((size, size),),
                       timesteps=steps, diffusion=model, verbose=False,
                       key=jax.random.PRNGKey(1))
    float(jax.numpy.sum(img))
    warm = time.perf_counter() - t0
    print(f"bench_pipelines: image_sample {size}^2 {steps} steps: model build {build:.2f}s, "
          f"first sample {cold:.2f}s (trace+compile), steady {warm:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": f"image_sample_{size}_{steps}step_wall_clock",
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": round(warm, 3),
        "cold_s": round(cold, 2),
        "steps_per_sec": round(steps / warm, 2),
    }))


def bench_audiovisual(seconds: float):
    import numpy as np
    from scipy.io import wavfile

    from maua_tpu.audiovisual.generate import generate_audiovisual_from_patch

    sr = 22050
    t = np.arange(int(seconds * sr)) / sr
    # band-limited test track with beats + melody so onsets/chroma have
    # real structure to extract
    kick = (np.sin(2 * np.pi * 55 * t) * np.exp(-((t % 0.5) * 14)))
    mel = 0.3 * np.sin(2 * np.pi * 220 * 2 ** (np.floor(t * 2) % 8 / 12.0) * t)
    hat = 0.1 * np.random.RandomState(0).randn(t.size) * (np.exp(-((t + 0.25) % 0.5) * 40))
    wav = np.clip(kick + mel + hat, -1, 1)
    wav_path = "/tmp/bench_track.wav"
    wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))

    out_dir = "/tmp/bench_av"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    video, _ = generate_audiovisual_from_patch(
        audio_file=wav_path,
        model_file=None,  # random-init SG2 at 1024^2
        patch_file="maua_tpu/audiovisual/patches/examples/stylegan2.py",
        renderer="ffmpeg",
        renderer_kwargs={"output_file": f"{out_dir}/bench.mp4"},
        fps=24,
        out_size=(int(os.environ.get("MAUA_BENCH_AV_SIZE", "1024")),) * 2,
    )
    wall = time.perf_counter() - t0
    n_frames = int(seconds * 24)
    size = os.path.getsize(video) if os.path.exists(video) else 0
    print(f"bench_pipelines: audiovisual {seconds:.0f}s wav -> video: {wall:.1f}s "
          f"wall ({n_frames / wall:.1f} fps incl. envelopes+encode), output {size / 1e6:.1f} MB",
          file=sys.stderr)
    print(json.dumps({
        "metric": "audiovisual_generate_1024_wall_clock",
        "value": round(n_frames / wall, 3),
        "unit": "frames/s",
        "vs_baseline": round(n_frames / wall / 30.0, 3),
        "wall_s": round(wall, 1),
        "audio_seconds": seconds,
    }))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "image"):
        bench_image_sample()
    if which in ("all", "av"):
        bench_audiovisual(float(os.environ.get("MAUA_BENCH_AV_SECONDS", "60")))


if __name__ == "__main__":
    sys.exit(main())
