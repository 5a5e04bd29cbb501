"""maua_tpu — a TPU-native generative art framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
maua-maua-maua/maua (see SURVEY.md). Compute paths are pure-functional
and jittable; orchestration is host-side Python; hot kernels are Pallas.

Layer map (mirrors reference layers, re-designed TPU-first):
  ops/          L0 tensor/image/signal/video utilities
  audio/        L1 differentiable MIR (librosa-parity features in JAX)
  gan/          L2 StyleGAN2/3 inference + training + analysis
  diffusion/    L2/L3 diffusion processors + multi-res/video pipelines
  super/        L2 super-resolution + frame interpolation
  flow/         L1 optical flow + consistency
  style/        L3 neural style transfer
  audiovisual/  L3 audio-reactive orchestration (patches, render)
  parallel/     mesh/sharding helpers (DP/TP over ICI)
  kernels/      Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"
