"""Parity test for the secondary diffusion UNet against a torch oracle
built from the published architecture (reference:
maua/diffusion/processors/guided.py:38-141)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from maua_tpu.diffusion.models import secondary  # noqa: E402


def build_torch_oracle():
    import torch.nn as nn

    class ConvBlock(nn.Sequential):
        def __init__(self, c_in, c_out):
            super().__init__(nn.Conv2d(c_in, c_out, 3, padding=1), nn.ReLU(inplace=True))

    class SkipBlock(nn.Module):
        def __init__(self, main):
            super().__init__()
            self.main = nn.Sequential(*main)

        def forward(self, x):
            return torch.cat([self.main(x), x], dim=1)

    class FourierFeatures(nn.Module):
        def __init__(self, in_features, out_features):
            super().__init__()
            self.weight = nn.Parameter(torch.randn([out_features // 2, in_features]))

        def forward(self, x):
            f = 2 * torch.pi * x @ self.weight.T
            return torch.cat([f.cos(), f.sin()], dim=-1)

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            c = 64
            cs = [c, c * 2, c * 2, c * 4, c * 4, c * 8]
            self.timestep_embed = FourierFeatures(1, 16)
            down = nn.AvgPool2d(2)
            up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False)
            self.net = nn.Sequential(
                ConvBlock(3 + 16, cs[0]),
                ConvBlock(cs[0], cs[0]),
                SkipBlock([
                    down, ConvBlock(cs[0], cs[1]), ConvBlock(cs[1], cs[1]),
                    SkipBlock([
                        down, ConvBlock(cs[1], cs[2]), ConvBlock(cs[2], cs[2]),
                        SkipBlock([
                            down, ConvBlock(cs[2], cs[3]), ConvBlock(cs[3], cs[3]),
                            SkipBlock([
                                down, ConvBlock(cs[3], cs[4]), ConvBlock(cs[4], cs[4]),
                                SkipBlock([
                                    down, ConvBlock(cs[4], cs[5]), ConvBlock(cs[5], cs[5]),
                                    ConvBlock(cs[5], cs[5]), ConvBlock(cs[5], cs[4]), up,
                                ]),
                                ConvBlock(cs[4] * 2, cs[4]), ConvBlock(cs[4], cs[3]), up,
                            ]),
                            ConvBlock(cs[3] * 2, cs[3]), ConvBlock(cs[3], cs[2]), up,
                        ]),
                        ConvBlock(cs[2] * 2, cs[2]), ConvBlock(cs[2], cs[1]), up,
                    ]),
                    ConvBlock(cs[1] * 2, cs[1]), ConvBlock(cs[1], cs[0]), up,
                ]),
                ConvBlock(cs[0] * 2, cs[0]),
                nn.Conv2d(cs[0], 3, 3, padding=1),
            )

        def forward(self, x, t):
            te = self.timestep_embed(t[:, None])[:, :, None, None].repeat(1, 1, x.shape[2], x.shape[3])
            v = self.net(torch.cat([x, te], dim=1))
            alphas = torch.cos(t * torch.pi / 2)[:, None, None, None]
            sigmas = torch.sin(t * torch.pi / 2)[:, None, None, None]
            pred = x * alphas - v * sigmas
            eps = x * sigmas + v * alphas
            return v, pred, eps

    return Oracle()


def test_secondary_parity():
    torch.manual_seed(0)
    oracle = build_torch_oracle().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = secondary.params_from_torch(sd)

    rs = np.random.RandomState(1)
    x = rs.randn(2, 32, 32, 3).astype(np.float32)
    t = np.array([0.3, 0.8], np.float32)
    out = secondary.forward(params, x, t)
    with torch.inference_mode():
        v_t, pred_t, eps_t = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(t))
    for mine, ref in [(out["v"], v_t), (out["pred"], pred_t), (out["eps"], eps_t)]:
        ref_np = np.transpose(ref.numpy(), (0, 2, 3, 1))
        assert np.abs(np.asarray(mine) - ref_np).max() < 2e-3


def test_secondary_random_init_runs():
    import jax

    params = secondary.init_params(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    out = secondary.forward(params, x, np.array([0.5], np.float32))
    assert out["pred"].shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out["v"])))
