"""End-to-end drive of the `gan generate` CLI additions on the CPU
backend: tiny ADA-format G+D checkpoint -> load_network /
load_discriminator -> class/transform flags -> DDLS langevin sampling.

Run from /root/repo: python workspace/verify_gan_cli.py
"""

import os
import sys

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

rs = np.random.RandomState(0)


def t(*shape):
    return torch.from_numpy(0.1 * rs.randn(*shape).astype(np.float32))


# tiny skip-arch SG2 G at res 32: channels 4->32 (base 128, cmax 32)
g = {
    "mapping.fc0.weight": t(32, 32), "mapping.fc0.bias": t(32),
    "mapping.fc1.weight": t(32, 32), "mapping.fc1.bias": t(32),
    "mapping.w_avg": t(32),
    "synthesis.b4.const": t(32, 4, 4),
}
chans = {4: 32, 8: 16, 16: 8, 32: 4}
for res in (4, 8, 16, 32):
    ci = chans[res // 2] if res > 4 else chans[4]
    co = chans[res]
    b = f"synthesis.b{res}"
    if res > 4:
        g[f"{b}.conv0.weight"] = t(co, ci, 3, 3)
        g[f"{b}.conv0.bias"] = t(co)
        g[f"{b}.conv0.affine.weight"] = t(ci, 32)
        g[f"{b}.conv0.affine.bias"] = torch.ones(ci)
        g[f"{b}.conv0.noise_const"] = t(res, res)
        g[f"{b}.conv0.noise_strength"] = t(1)[0]
    g[f"{b}.conv1.weight"] = t(co, co, 3, 3)
    g[f"{b}.conv1.bias"] = t(co)
    g[f"{b}.conv1.affine.weight"] = t(co, 32)
    g[f"{b}.conv1.affine.bias"] = torch.ones(co)
    g[f"{b}.conv1.noise_const"] = t(res, res)
    g[f"{b}.conv1.noise_strength"] = t(1)[0]
    g[f"{b}.torgb.weight"] = t(3, co, 1, 1)
    g[f"{b}.torgb.bias"] = t(3)
    g[f"{b}.torgb.affine.weight"] = t(co, 32)
    g[f"{b}.torgb.affine.bias"] = torch.ones(co)

# matching ADA D at res 32
d = {"b32.fromrgb.weight": t(4, 3, 1, 1), "b32.fromrgb.bias": t(4)}
for res in (32, 16, 8):
    ci, co = chans[res], chans[res // 2]
    d[f"b{res}.conv0.weight"] = t(ci, ci, 3, 3)
    d[f"b{res}.conv0.bias"] = t(ci)
    d[f"b{res}.conv1.weight"] = t(co, ci, 3, 3)
    d[f"b{res}.conv1.bias"] = t(co)
    d[f"b{res}.skip.weight"] = t(co, ci, 1, 1)
d.update({
    "b4.conv.weight": t(32, 33, 3, 3), "b4.conv.bias": t(32),
    "b4.fc.weight": t(32, 32 * 16), "b4.fc.bias": t(32),
    "b4.out.weight": t(1, 32), "b4.out.bias": t(1),
})

ckpt = "/tmp/tiny_sg2.pt"
torch.save({"G_ema": g, "D": d}, ckpt)
print("saved", ckpt)

from maua_tpu.cli.entrypoint import main

rc = main([
    "gan", "generate", "--model_file", ckpt, "--seeds", "0-4,7",
    "--translation", "0.1,0.0", "--rotation", "5",
    "--batch_size", "4", "--out_dir", "/tmp/gverify",
])
print("transforms rc:", rc)
files = sorted(os.listdir("/tmp/gverify"))
assert len(files) == 5, files  # 0-4 is exclusive (4 seeds) + seed 7
print("rendered:", files)

rc = main([
    "gan", "generate", "--model_file", ckpt, "--seeds", "0-4",
    "--sampling", "langevin", "--langevin_critic", "discriminator",
    "--batch_size", "4", "--grid", "--out_dir", "/tmp/gverify_ddls",
])
print("ddls rc:", rc)
assert os.path.exists("/tmp/gverify_ddls/grid.png")
from PIL import Image

im = np.asarray(Image.open("/tmp/gverify_ddls/grid.png"))
print("grid:", im.shape, "std:", im.std())
assert im.std() > 0
print("VERIFY OK")
