"""Tests for the alias-free StyleGAN3 generator
(reference: maua/GAN/wrappers/stylegan3.py surface)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.gan import stylegan3 as sg3

CFG = sg3.SG3Config(
    z_dim=32, w_dim=32, img_resolution=64, channel_base=1024, channel_max=64,
    num_layers=6, mapping_layers=2, margin_size=4,
)


@pytest.fixture(scope="module")
def gen():
    return sg3.StyleGAN3(CFG, key=jax.random.PRNGKey(0))


def test_layer_plan():
    cutoffs, stopbands, srates, half_widths, sizes, channels = CFG.layer_plan()
    assert len(cutoffs) == CFG.num_layers + 1
    assert cutoffs[0] == CFG.first_cutoff
    assert cutoffs[-1] == CFG.img_resolution / 2
    assert np.all(np.diff(cutoffs) >= 0)
    assert sizes[-1] == CFG.img_resolution
    assert channels[-1] == CFG.img_channels


def test_generator_forward(gen):
    z = np.random.RandomState(0).randn(2, 32).astype(np.float32)
    img = gen(z)
    assert img.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_translation_shifts_output(gen):
    """The defining SG3 property: input-transform translation shifts
    the image content continuously."""
    z = np.random.RandomState(1).randn(1, 32).astype(np.float32)
    ws = gen.mapper(z)
    base = np.asarray(gen.synthesizer(ws))
    shifted = np.asarray(gen.synthesizer(ws, translation=(0.25, 0.0)))
    assert not np.allclose(base, shifted)
    # shifting by a quarter frame should roughly align base shifted in x
    px = int(0.25 * 64 / (64 / CFG.img_resolution))  # 16 px at out res
    a = base[0, :, : 64 - 16]
    b = shifted[0, :, 16:]
    err_aligned = np.abs(a - b).mean()
    err_raw = np.abs(base[0, :, 16:] - shifted[0, :, 16:]).mean()
    assert err_aligned < err_raw


def test_rotation_changes_output(gen):
    z = np.random.RandomState(2).randn(1, 32).astype(np.float32)
    ws = gen.mapper(z)
    base = np.asarray(gen.synthesizer(ws))
    rot = np.asarray(gen.synthesizer(ws, rotation=45.0))
    assert not np.allclose(base, rot)


def test_truncation(gen):
    z = np.random.RandomState(3).randn(1, 32).astype(np.float32)
    ws0 = np.asarray(gen.mapper(z, truncation=0.0))
    w_avg = np.asarray(gen.params["mapping"]["w_avg"])
    assert np.allclose(ws0, np.broadcast_to(w_avg, ws0.shape), atol=1e-6)


def test_filtered_lrelu_chunked_exact(monkeypatch):
    """Row-banded filtered nonlinearity is bit-exact vs the direct
    path for every up/down combination the layer plan produces."""
    import numpy as np

    from maua_tpu.gan import stylegan3 as sg3

    rs = np.random.RandomState(0)
    monkeypatch.setenv("MAUA_SG3_BANDS", "3")
    for (hi, up, down, ut, dt) in [(64, 2, 2, 12, 12), (48, 4, 2, 24, 12),
                                   (64, 2, 1, 12, 1), (60, 1, 2, 1, 12)]:
        x = jnp.asarray(rs.randn(2, hi, hi, 8).astype(np.float32))
        up_f = sg3._lowpass(ut, 0.35 * up, 0.1 * up, 2.0 * up) if up > 1 else None
        down_f = sg3._lowpass(dt, 0.3 * down, 0.1 * down, 2.0 * down) if down > 1 else None
        ref = sg3._filtered_lrelu_direct(x, up_f, down_f, up, down)
        out = sg3._filtered_lrelu(x, up_f, down_f, up, down)
        assert out.shape == ref.shape
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-6


def test_sg3_render_generator_and_patch_base(tmp_path):
    """StyleGAN3 facade render() streams frames with per-frame
    translation/rotation; StyleGAN3Patch wires it for audiovisual
    patches (`patches/base/stylegan3.py`, `wrappers/__init__.py:52-99`)."""
    from scipy.io import wavfile

    from maua_tpu.audiovisual.patches.base import StyleGAN3Patch

    sr = 8000
    t = np.arange(sr) / sr
    y = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = str(tmp_path / "tone.wav")
    wavfile.write(wav, sr, (y * 32767).astype(np.int16))

    patch = StyleGAN3Patch(None, wav, fps=4, duration=1, output_size=(64, 64), cfg=CFG)
    z = patch.stylegan3.get_z_latents("1-3")
    ws = patch.mapper(z)
    n = 4
    lat = jnp.tile(jnp.asarray(ws[:1]), (n, 1, 1))
    frames = list(patch.stylegan3.render(
        lat, translation=np.zeros((n, 2), np.float32),
        rotation=np.linspace(0, 90, n).astype(np.float32), batch_size=2))
    assert len(frames) == n
    assert frames[0].shape == (64, 64, 3)
    assert np.all(np.isfinite(np.stack(frames)))
    # rotation actually changes the output
    assert not np.allclose(frames[0], frames[-1])


def test_sg3_state_dict_roundtrip():
    """NVIDIA-style SG3 state dict (mapping.fc*, synthesis.input.*,
    synthesis.L{i}_{size}_{ch}.*) converts to the functional pytree and
    reproduces the source generator exactly (`GAN/load.py:130-164` role
    for alias-free checkpoints)."""
    import numpy as np

    from maua_tpu.gan.load import infer_sg3_config, is_stylegan3, sg3_params_from_state_dict

    src = sg3.init_params(jax.random.PRNGKey(3), CFG)
    _, _, _, _, sizes, channels = CFG.layer_plan()

    sd = {}
    for i in range(CFG.mapping_layers):
        sd[f"mapping.fc{i}.weight"] = np.asarray(src["mapping"][f"fc{i}"]["w"]).T
        sd[f"mapping.fc{i}.bias"] = np.asarray(src["mapping"][f"fc{i}"]["b"])
    sd["mapping.w_avg"] = np.asarray(src["mapping"]["w_avg"])
    sd["synthesis.input.freqs"] = np.asarray(src["input"]["freqs"])
    sd["synthesis.input.phases"] = np.asarray(src["input"]["phases"])
    sd["synthesis.input.affine.weight"] = np.asarray(src["input"]["affine"]["w"]).T
    sd["synthesis.input.affine.bias"] = np.asarray(src["input"]["affine"]["b"])
    sd["synthesis.input.weight"] = np.asarray(src["input"]["weight"])[0, 0].T * np.sqrt(src["input"]["weight"].shape[-2])  # NVIDIA stores raw
    sd["synthesis.input.transform"] = np.asarray(src["input"]["transform"])
    for i, layer in enumerate(src["layers"]):
        name = f"L{i}_{int(sizes[i + 1])}_{int(channels[i + 1])}"
        sd[f"synthesis.{name}.weight"] = np.transpose(np.asarray(layer["weight"]), (3, 2, 0, 1))
        sd[f"synthesis.{name}.bias"] = np.asarray(layer["bias"])
        sd[f"synthesis.{name}.affine.weight"] = np.asarray(layer["affine"]["w"]).T
        sd[f"synthesis.{name}.affine.bias"] = np.asarray(layer["affine"]["b"])
        sd[f"synthesis.{name}.magnitude_ema"] = np.asarray(layer["magnitude_ema"])

    assert is_stylegan3(sd)
    cfg2 = infer_sg3_config(sd)
    assert cfg2.img_resolution == CFG.img_resolution
    assert cfg2.num_layers == CFG.num_layers
    assert cfg2.conv_kernel == CFG.conv_kernel

    params = sg3_params_from_state_dict(sd, CFG)
    z = jax.random.normal(jax.random.PRNGKey(4), (2, CFG.z_dim))
    ref = sg3.synthesis(src, sg3.mapping(src, z, CFG), CFG)
    out = sg3.synthesis(params, sg3.mapping(params, z, CFG), CFG)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_sg3_facade_loads_pt_file(tmp_path):
    """StyleGAN3(model_file=...) end-to-end: torch-saved alias-free
    state dict routes through load_network's SG3 branch."""
    import numpy as np
    import torch

    src = sg3.init_params(jax.random.PRNGKey(5), CFG)
    _, _, _, _, sizes, channels = CFG.layer_plan()
    sd = {}
    for i in range(CFG.mapping_layers):
        sd[f"mapping.fc{i}.weight"] = torch.from_numpy(np.asarray(src["mapping"][f"fc{i}"]["w"]).T.copy())
        sd[f"mapping.fc{i}.bias"] = torch.from_numpy(np.asarray(src["mapping"][f"fc{i}"]["b"]).copy())
    sd["mapping.w_avg"] = torch.from_numpy(np.asarray(src["mapping"]["w_avg"]).copy())
    sd["synthesis.input.freqs"] = torch.from_numpy(np.asarray(src["input"]["freqs"]).copy())
    sd["synthesis.input.phases"] = torch.from_numpy(np.asarray(src["input"]["phases"]).copy())
    sd["synthesis.input.affine.weight"] = torch.from_numpy(np.asarray(src["input"]["affine"]["w"]).T.copy())
    sd["synthesis.input.affine.bias"] = torch.from_numpy(np.asarray(src["input"]["affine"]["b"]).copy())
    sd["synthesis.input.weight"] = torch.from_numpy((np.asarray(src["input"]["weight"])[0, 0].T * np.sqrt(src["input"]["weight"].shape[-2])).copy())  # NVIDIA stores raw
    sd["synthesis.input.transform"] = torch.from_numpy(np.asarray(src["input"]["transform"]).copy())
    for i, layer in enumerate(src["layers"]):
        name = f"L{i}_{int(sizes[i + 1])}_{int(channels[i + 1])}"
        sd[f"synthesis.{name}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(layer["weight"]), (3, 2, 0, 1)).copy())
        sd[f"synthesis.{name}.bias"] = torch.from_numpy(np.asarray(layer["bias"]).copy())
        sd[f"synthesis.{name}.affine.weight"] = torch.from_numpy(np.asarray(layer["affine"]["w"]).T.copy())
        sd[f"synthesis.{name}.affine.bias"] = torch.from_numpy(np.asarray(layer["affine"]["b"]).copy())
        sd[f"synthesis.{name}.magnitude_ema"] = torch.from_numpy(np.asarray(layer["magnitude_ema"]).copy())

    path = str(tmp_path / "sg3.pt")
    torch.save(sd, path)
    g = sg3.StyleGAN3(model_file=path)
    assert g.cfg.img_resolution == CFG.img_resolution
    assert g.cfg.margin_size == CFG.margin_size  # inferred from layer-name sizes
    z = np.random.RandomState(0).randn(1, g.cfg.z_dim).astype(np.float32)
    img = np.asarray(g(z))
    assert img.shape[-3:] == (CFG.img_resolution, CFG.img_resolution, 3)
    # value parity: the NVIDIA-format dict must reproduce the source
    # params exactly (regression: input-weight and torgb gains were
    # applied twice/none, and margin_size was not inferred)
    ref = np.asarray(sg3.synthesis(src, sg3.mapping(src, jnp.asarray(z), CFG), CFG))
    assert np.max(np.abs(img - ref)) < 1e-4, np.max(np.abs(img - ref))

def test_torgb_bf16_psnr(gen):
    """torgb_bf16 keeps output within the 40 dB parity bar of the f32
    torgb path (both on the bf16 trunk config)."""
    import dataclasses

    cfg16 = dataclasses.replace(CFG, dtype="bfloat16")
    cfg16_rgb = dataclasses.replace(cfg16, torgb_bf16=True)
    ws = jnp.asarray(np.random.RandomState(1).randn(1, CFG.num_ws, 32), jnp.float32)
    ref = np.asarray(sg3.synthesis(gen.params, ws, cfg16))
    out = np.asarray(sg3.synthesis(gen.params, ws, cfg16_rgb))
    mse = float(np.mean((ref - out) ** 2))
    peak = float(ref.max() - ref.min()) or 1.0
    psnr = 10 * np.log10(peak * peak / max(mse, 1e-20))
    assert psnr >= 40.0, psnr


def test_sg3_patch_pipeline_mapper_contract(tmp_path, gen):
    """The audiovisual driver calls patch.mapper(**{'latent_z': ...})
    (reference kwarg name); StyleGAN3.mapper must accept it
    (regression: TypeError crashed every SG3 audiovisual run)."""
    z = np.random.RandomState(0).randn(2, 32).astype(np.float32)
    ws = gen.mapper(latent_z=z)
    assert ws.shape == (2, CFG.num_ws, 32)
    # render yields uint8 frames like the SG2 wrapper (regression:
    # float frames desynced the rawvideo pipe)
    frame = next(gen.render(ws[:1]))
    assert frame.dtype == np.uint8 and frame.shape[-1] == 3


def test_int8_plan_psnr(gen):
    """quantize_sg3's int8 trunk vs the f32 path (the opt-in
    speed/quality trade; W8A8 with max calibration)."""
    params = gen.params
    ws = sg3.mapping(params, jax.random.normal(jax.random.PRNGKey(7), (2, CFG.z_dim)), CFG)
    ref = np.asarray(sg3.synthesis(params, ws, CFG))
    plan = sg3.quantize_sg3(params, CFG, ws=ws)
    assert set(plan) == {f"L{i}" for i in range(CFG.num_layers - 1)}
    out = np.asarray(sg3.synthesis(params, ws, CFG, int8_plan=plan))
    mse = np.mean((out - ref) ** 2)
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 28, psnr
