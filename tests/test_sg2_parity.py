"""End-to-end golden parity: our JAX StyleGAN2 vs the reference's
pure-torch inference net (loaded directly from the read-only reference
mount as a test oracle). North-star target: PSNR >= 40 dB at fixed
weights + latents (BASELINE.md)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from maua_tpu.gan import load as gload  # noqa: E402
from maua_tpu.gan import stylegan2 as sg2  # noqa: E402

REF = "/root/reference/maua/GAN/wrappers/inference"


@pytest.fixture(scope="module")
def ref_sg2():
    """Import the reference inference net without triggering the maua
    package __init__ chain."""
    pkg = types.ModuleType("refsg2")
    pkg.__path__ = [REF]
    sys.modules.setdefault("refsg2", pkg)
    spec = importlib.util.spec_from_file_location("refsg2.ops", f"{REF}/ops.py")
    ops_mod = importlib.util.module_from_spec(spec)
    sys.modules["refsg2.ops"] = ops_mod
    spec.loader.exec_module(ops_mod)

    # the reference net is TorchScript-oriented: scalar args are typed
    # Tensor (`.repeat()` is called on them) and `torch.max(t, 0)` means
    # the elementwise overload under scripting. Shim those semantics so
    # the oracle runs eagerly.
    class _TorchProxy:
        def __getattr__(self, name):
            return getattr(torch, name)

        @staticmethod
        def max(a, b):
            return torch.maximum(torch.as_tensor(a), torch.as_tensor(b))

        @staticmethod
        def min(a, b):
            return torch.minimum(torch.as_tensor(a), torch.as_tensor(b))

    ops_mod.torch = _TorchProxy()

    orig_cr = ops_mod.conv2d_resample

    def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1):
        t = torch.as_tensor
        return orig_cr(x, w, f, t(up), t(down), t(padding), t(groups))

    orig_uf = ops_mod.upfirdn2d

    def upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1):
        t = torch.as_tensor
        pad_ints = torch.as_tensor([int(p) for p in padding])
        return orig_uf(x, f, t(up), t(down), pad_ints, t(gain))

    ops_mod.conv2d_resample = conv2d_resample
    ops_mod.upfirdn2d = upfirdn2d

    # conv_transpose2d rejects tensor-typed stride/padding/groups
    import torch.nn.functional as TF

    if not getattr(TF, "_maua_ct_patched", False):
        orig_ct = TF.conv_transpose2d

        def ct(input, weight, bias=None, stride=1, padding=0, output_padding=0, groups=1, dilation=1):
            def ii(v):
                if isinstance(v, torch.Tensor):
                    return int(v)
                if isinstance(v, (tuple, list)):
                    return tuple(int(x) for x in v)
                return v

            return orig_ct(input, weight, bias, ii(stride), ii(padding), ii(output_padding), ii(groups), ii(dilation))

        TF.conv_transpose2d = ct
        TF._maua_ct_patched = True

    spec2 = importlib.util.spec_from_file_location("refsg2.stylegan2", f"{REF}/stylegan2.py")
    m2 = importlib.util.module_from_spec(spec2)
    sys.modules["refsg2.stylegan2"] = m2
    spec2.loader.exec_module(m2)
    return m2


def psnr(a, b, data_range=2.0):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(data_range**2 / mse)


@pytest.mark.parametrize("res", [64, 128])
def test_generator_parity_psnr(ref_sg2, res):
    torch.manual_seed(0)
    G = ref_sg2.Generator(512, 0, 512, res, 3, channel_base=8192, channel_max=256)
    G.eval()

    sd = {k: v.detach().float().numpy() for k, v in G.state_dict().items()}
    params = gload.params_from_state_dict(sd)
    cfg = gload.infer_config(gload._normalize_keys(sd))
    assert cfg.img_resolution == res
    assert cfg.channel_base == 8192 and cfg.channel_max == 256
    assert cfg.num_ws == G.num_ws

    z = np.random.RandomState(123).randn(2, 512).astype(np.float32)
    with torch.inference_mode():
        ref_img = G(torch.from_numpy(z), None, torch.tensor(0.7), None).numpy()
    out = np.asarray(sg2.generator(params, z, cfg, truncation_psi=0.7))
    out_nchw = np.transpose(out, (0, 3, 1, 2))
    assert out_nchw.shape == ref_img.shape
    p = psnr(out_nchw, ref_img)
    assert p >= 40.0, f"PSNR {p:.2f} dB < 40 dB"


def test_mapping_parity(ref_sg2):
    torch.manual_seed(1)
    G = ref_sg2.Generator(512, 0, 512, 64, 3, channel_base=4096, channel_max=128)
    G.eval()
    sd = {k: v.detach().float().numpy() for k, v in G.state_dict().items()}
    params = gload.params_from_state_dict(sd)
    cfg = gload.infer_config(gload._normalize_keys(sd))
    z = np.random.RandomState(7).randn(4, 512).astype(np.float32)
    with torch.inference_mode():
        ref_ws = G.mapping(torch.from_numpy(z), None).numpy()
    ws = np.asarray(sg2.mapping(params, z, cfg))
    assert np.abs(ws - ref_ws).max() < 1e-3


def test_rosinality_remap_shapes():
    """Synthesize a fake rosinality state dict and check remapping."""
    rs = np.random.RandomState(0)
    res = 16  # blocks: 4, 8, 16 -> convs 0..3, to_rgbs 0..1
    sd = {
        "input.input": rs.randn(1, 64, 4, 4).astype(np.float32),
        "conv1.conv.weight": rs.randn(1, 64, 64, 3, 3).astype(np.float32),
        "conv1.activate.bias": rs.randn(64).astype(np.float32),
        "conv1.conv.modulation.weight": rs.randn(64, 512).astype(np.float32),
        "conv1.conv.modulation.bias": rs.randn(64).astype(np.float32),
        "conv1.noise.weight": np.ones(1, np.float32),
        "to_rgb1.conv.weight": rs.randn(1, 3, 64, 1, 1).astype(np.float32),
        "to_rgb1.bias": rs.randn(1, 3, 1, 1).astype(np.float32),
        "to_rgb1.conv.modulation.weight": rs.randn(64, 512).astype(np.float32),
        "to_rgb1.conv.modulation.bias": rs.randn(64).astype(np.float32),
        "noises.noise_0": rs.randn(1, 1, 4, 4).astype(np.float32),
    }
    for i in range(1, 8):
        sd[f"style.{i}.weight"] = rs.randn(512, 512).astype(np.float32)
        sd[f"style.{i}.bias"] = rs.randn(512).astype(np.float32)
    n = 0
    for r in (8, 16):
        for j in (0, 1):
            sd[f"convs.{n}.conv.weight"] = rs.randn(1, 64, 64, 3, 3).astype(np.float32)
            sd[f"convs.{n}.activate.bias"] = rs.randn(64).astype(np.float32)
            sd[f"convs.{n}.conv.modulation.weight"] = rs.randn(64, 512).astype(np.float32)
            sd[f"convs.{n}.conv.modulation.bias"] = rs.randn(64).astype(np.float32)
            sd[f"convs.{n}.noise.weight"] = np.ones(1, np.float32)
            sd[f"noises.noise_{n + 1}"] = rs.randn(1, 1, r, r).astype(np.float32)
            n += 1
    for m, r in enumerate((8, 16)):
        sd[f"to_rgbs.{m}.conv.weight"] = rs.randn(1, 3, 64, 1, 1).astype(np.float32)
        sd[f"to_rgbs.{m}.bias"] = rs.randn(1, 3, 1, 1).astype(np.float32)
        sd[f"to_rgbs.{m}.conv.modulation.weight"] = rs.randn(64, 512).astype(np.float32)
        sd[f"to_rgbs.{m}.conv.modulation.bias"] = rs.randn(64).astype(np.float32)

    assert gload.is_rosinality(sd)
    ada = gload.rosinality_to_ada(sd)
    cfg = gload.infer_config(ada)
    assert cfg.img_resolution == 16
    assert cfg.mapping_layers == 7
    params = gload.params_from_state_dict(ada, cfg)
    z = np.random.RandomState(5).randn(1, 512).astype(np.float32)
    img = sg2.generator(params, z, cfg)
    assert img.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(img)))
