"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

The environment's axon sitecustomize force-registers the TPU backend
and sets jax_platforms="axon,cpu", so an env var alone is not enough —
we override the config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------- tiers
# Modules dominated by big model builds / multi-minute XLA compiles on
# this 1-CPU host (measured per-module wall times; see README "Testing").
# Smoke tier: `pytest -m "not slow"`; full suite for deep verification.
SLOW_MODULES = {
    "test_ar_cli.py",
    "test_ar_finetune.py",
    "test_audiovisual.py",
    "test_autoregressive.py",
    "test_bert.py",
    "test_biggan.py",
    "test_cogvideo.py",
    "test_diffusion_extras.py",
    "test_diffusion_pipeline.py",
    "test_diffusion_samplers.py",
    "test_experimental_models.py",
    "test_export.py",
    "test_extractors.py",
    "test_fast_synthesis.py",
    "test_filtered_lrelu.py",
    "test_flow.py",
    "test_gan_analysis.py",
    "test_graft_entry.py",
    "test_icgan.py",
    "test_interactive.py",
    "test_latent_glide.py",
    "test_loop_pipeline.py",
    "test_parallel_pp_ep.py",
    "test_perceptor_zoo.py",
    "test_raft.py",
    "test_secondary_model.py",
    "test_selfsupervised.py",
    "test_separate.py",
    "test_serve.py",
    "test_sg2_parity.py",
    "test_style.py",
    "test_style_video.py",
    "test_stylegan2.py",
    "test_stylegan3.py",
    "test_super.py",
    "test_swinir_waifu.py",
    "test_train_loop.py",
    "test_training.py",
    "test_yuv420.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Bound compiled-executable memory growth across the (long) suite:
    one pytest process accumulates every module's jitted executables,
    which on this 1-CPU host has produced rare flaky SIGSEGVs deep into
    the run. Modules don't share compilations, so dropping caches at
    module teardown costs nothing."""
    yield
    jax.clear_caches()
