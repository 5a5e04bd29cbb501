"""Tests for optical flow + flow-warped video diffusion
(reference: maua/flow/, maua/diffusion/video.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.flow import consistency, lib, models


def _shifted_pair(shift=3, size=64):
    rs = np.random.RandomState(0)
    base = rs.rand(size + 16, size + 16, 3).astype(np.float32)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(base, (1.5, 1.5, 0))
    base = (base - base.min()) / (base.max() - base.min())
    f1 = base[8 : 8 + size, 8 : 8 + size]
    f2 = base[8 : 8 + size, 8 - shift : 8 - shift + size]  # content moves right by +shift
    return f1, f2


def test_mflo_roundtrip():
    rs = np.random.RandomState(1)
    flow = rs.randn(32, 48, 2).astype(np.float32) * 5
    rt = lib.decode_mflo(lib.encode_mflo(flow))
    assert np.abs(rt - flow).max() < np.abs(flow).max() / 100


def test_farneback_recovers_translation():
    f1, f2 = _shifted_pair(shift=3)
    flow = models.farneback_flow(f1, f2)
    assert flow.shape == (64, 64, 2)
    interior = flow[16:-16, 16:-16]
    assert abs(np.median(interior[..., 0]) - 3.0) < 1.0
    assert abs(np.median(interior[..., 1])) < 1.0


def test_jax_flow_recovers_translation():
    f1, f2 = _shifted_pair(shift=2)
    flow = np.asarray(models.jax_flow(f1, f2))
    interior = flow[16:-16, 16:-16]
    assert abs(np.median(interior[..., 0]) - 2.0) < 1.0


def test_flow_warp_map_and_sample():
    from maua_tpu.ops.warp import grid_sample

    f1, f2 = _shifted_pair(shift=3)
    flow = models.farneback_flow(f1, f2)
    warp = lib.flow_warp_map(flow)
    warped_f2 = np.asarray(grid_sample(jnp.asarray(f2[None]), warp, padding_mode="border"))[0]
    # warping frame2 back by the flow should reconstruct frame1
    err_warped = np.abs(warped_f2[8:-8, 8:-8] - f1[8:-8, 8:-8]).mean()
    err_plain = np.abs(f2[8:-8, 8:-8] - f1[8:-8, 8:-8]).mean()
    assert err_warped < err_plain * 0.6


def test_consistency_mask_range():
    f1, f2 = _shifted_pair(shift=3)
    fwd = models.farneback_flow(f1, f2)
    bwd = models.farneback_flow(f2, f1)
    mask = np.asarray(consistency.check_consistency(fwd, bwd))
    assert mask.shape == (64, 64)
    assert mask.min() >= 0 and mask.max() <= 1
    # consistent translation: most of the frame is reliable
    assert mask[8:-8, 8:-8].mean() > 0.6


def test_consistency_detects_occlusion():
    """Random independent flows should be marked unreliable."""
    rs = np.random.RandomState(2)
    fwd = rs.randn(32, 32, 2).astype(np.float32) * 4
    bwd = rs.randn(32, 32, 2).astype(np.float32) * 4
    mask = np.asarray(consistency.check_consistency(fwd, bwd))
    assert mask.mean() < 0.5


def test_video_flow_diffusion_end_to_end(tmp_path, monkeypatch):
    """Flow-warped diffusion over a tiny synthetic video with a tiny SD."""
    import cv2

    from maua_tpu.diffusion.models import unet as unet_mod
    from maua_tpu.diffusion.models import vae as vae_mod
    from maua_tpu.diffusion.processors.stable import StableDiffusion
    from maua_tpu.diffusion.video import VideoFlowDiffusionProcessor
    from maua_tpu.text.clip_text import CLIPTextConfig

    monkeypatch.setenv("MAUA_WORKSPACE", str(tmp_path))
    import maua_tpu.utility as util

    monkeypatch.setattr(util, "WORKSPACE", str(tmp_path))
    import maua_tpu.flow.lib as fl

    monkeypatch.setattr(fl, "WORKSPACE", str(tmp_path))

    # synthetic moving-square video
    vid_path = str(tmp_path / "test.mp4")
    writer = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 64))
    for i in range(4):
        frame = np.zeros((64, 64, 3), np.uint8)
        frame[20 : 40, 10 + 4 * i : 30 + 4 * i] = 255
        writer.write(frame)
    writer.release()

    sd = StableDiffusion(
        sampler="euler", timesteps=3,
        unet_cfg=unet_mod.UNetConfig(in_channels=4, out_channels=4, model_channels=16, channel_mult=(1, 2),
                                     num_res_blocks=1, attention_resolutions=(), context_dim=32),
        vae_cfg=vae_mod.VAEConfig(base_channels=8, channel_mult=(1, 2), num_res_blocks=1),
        text_cfg=CLIPTextConfig(width=32, layers=1, heads=2, context_length=8),
        image_size=32,
    )
    out = VideoFlowDiffusionProcessor()(
        sd, vid_path, text="test", size=(32, 32), t_start=0.5, verbose=False, max_frames=3,
    )
    assert out.shape == (3, 32, 32, 3)
    assert np.all(np.isfinite(out))

    # turbo + wrap_around + first_skip/first_frame_init: diffuse every
    # 2nd frame, flow-interpolate the rest, close the loop with 1 extra
    # frame (reference maua/diffusion/video.py:382-416 flag surface)
    import cv2 as _cv2

    init_png = str(tmp_path / "ff.png")
    _cv2.imwrite(init_png, np.full((32, 32, 3), 128, np.uint8))
    out2 = VideoFlowDiffusionProcessor()(
        sd, vid_path, text="test", size=(32, 32), skip=0.6, first_skip=0.3,
        first_frame_init=init_png, turbo=2, wrap_around=1, hist_persist=True,
        flow_exaggeration=1.5, verbose=False, max_frames=3,
    )
    assert out2.shape == (3, 32, 32, 3)
    assert np.all(np.isfinite(out2))


def test_flo_roundtrip(tmp_path):
    """Middlebury .flo write/read roundtrip (`maua/flow/utils.py:69-90`)."""
    from maua_tpu.flow import viz

    flow = np.random.RandomState(0).randn(17, 23, 2).astype(np.float32) * 5
    path = str(tmp_path / "f.flo")
    viz.write_flo(flow, path)
    back = viz.read_flo(path)
    assert back.shape == flow.shape and np.array_equal(back, flow)


def test_flow_to_image_matches_reference_rules():
    """Middlebury color coding: direction -> hue, magnitude -> saturation,
    unknown -> black (`maua/flow/utils.py:152-177` semantics)."""
    from maua_tpu.flow import viz

    h = w = 17
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    flow = np.stack([xx, yy], axis=-1).astype(np.float32) * 3
    img = viz.flow_to_image(flow)
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    # zero flow is white (rad 0 -> col 1), corners are saturated colors
    center = img[h // 2, w // 2]
    assert np.all(center >= 240), center
    assert img[0, 0].tolist() != img[-1, -1].tolist()  # opposite directions differ
    # unknown vectors render black
    flow[3, 3] = 1e9
    img2 = viz.flow_to_image(flow)
    assert np.all(img2[3, 3] == 0)


# ------------------------------------------------------------------ SpyNet
def test_spynet_shapes_and_ensemble():
    from maua_tpu.flow import spynet

    rs = np.random.RandomState(0)
    f1 = rs.rand(40, 56, 3).astype(np.float32)
    f2 = rs.rand(40, 56, 3).astype(np.float32)
    flow = spynet.spynet_flow(f1, f2)
    assert flow.shape == (40, 56, 2) and np.isfinite(flow).all()
    # the full declared ensemble contract (`flow/__init__.py:9-64`)
    model = models.get_flow_model(("spynet", "farneback", "hs"))
    out = model(f1, f2)
    assert out.shape == (40, 56, 2) and np.isfinite(out).all()


def test_spynet_parity_vs_torch_oracle():
    """Same weights, same input: the JAX SpyNet must match a torch
    reimplementation of the sniklaus net (conv7x7+ReLU stacks with
    bilinear warping) at each basic unit, and the converter must accept
    the published `netBasic.{L}.netBasic.{2k}` key layout."""
    torch = pytest.importorskip("torch")
    from maua_tpu.flow import spynet

    rs = np.random.RandomState(1)
    n_levels = 3
    sd = {}
    for lvl in range(n_levels):
        chans = [8, 32, 64, 32, 16, 2]
        for k, (ci, co) in enumerate(zip(chans[:-1], chans[1:])):
            sd[f"netBasic.{lvl}.netBasic.{2*k}.weight"] = rs.randn(co, ci, 7, 7).astype(np.float32) * 0.05
            sd[f"netBasic.{lvl}.netBasic.{2*k}.bias"] = rs.randn(co).astype(np.float32) * 0.01
    params = spynet.params_from_torch(sd, n_levels=n_levels)

    # torch oracle for ONE basic unit on a fixed input (warping math is
    # covered by the translation test below; this pins the conv stack)
    x = rs.rand(1, 16, 16, 8).astype(np.float32)
    ours = np.asarray(spynet._basic_unit(params[1], jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for k in range(5):
        w = torch.from_numpy(sd[f"netBasic.1.netBasic.{2*k}.weight"])
        b = torch.from_numpy(sd[f"netBasic.1.netBasic.{2*k}.bias"])
        xt = torch.nn.functional.conv2d(xt, w, b, padding=3)
        if k < 4:
            xt = torch.relu(xt)
    ref = xt.detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - ref).max() < 1e-4


def test_spynet_level_ordering_oracle():
    """Checkpoint module 0 must run at the COARSEST level (upstream
    inserts pooled pyramid levels at the list head and applies
    netBasic[intLevel] walking coarse->fine). With all conv weights zero
    and per-level-distinct final biases b_L, the forward is analytic:
    each level adds its unit's bias after a 2x flow upsample, so the
    full-res flow is sum_L b_L * 2^(n-1-L). The reversed ordering gives
    sum_L b_L * 2^L — this test distinguishes them."""
    from maua_tpu.flow import spynet

    n_levels = 3
    biases = [0.25, 1.0, 7.0]  # distinct per torch module index
    sd = {}
    chans = [8, 32, 64, 32, 16, 2]
    for lvl in range(n_levels):
        for k, (ci, co) in enumerate(zip(chans[:-1], chans[1:])):
            sd[f"netBasic.{lvl}.netBasic.{2*k}.weight"] = np.zeros((co, ci, 7, 7), np.float32)
            b = np.full(co, biases[lvl], np.float32) if k == 4 else np.zeros(co, np.float32)
            sd[f"netBasic.{lvl}.netBasic.{2*k}.bias"] = b
    params = spynet.params_from_torch(sd, n_levels=n_levels)
    im = jnp.zeros((1, 16, 16, 3), jnp.float32)
    flow = np.asarray(spynet.spynet_forward(params, im, im))
    expect = sum(b * 2 ** (n_levels - 1 - lvl) for lvl, b in enumerate(biases))
    assert np.abs(flow - expect).max() < 1e-5, (flow[0, 0, 0], expect)


# ------------------------------------------------------------------ PWC-Net
def test_pwc_shapes_and_ensemble():
    from maua_tpu.flow import pwc

    f1, f2 = _shifted_pair(shift=2)
    flow = pwc.pwc_flow(f1, f2)
    assert flow.shape == (64, 64, 2)
    assert np.isfinite(flow).all()
    model = models.get_flow_model(("pwc", "farneback"))
    out = model(f1, f2)
    assert out.shape == (64, 64, 2)


def test_pwc_deconv_matches_torch():
    """The lhs-dilated transposed conv + the converter's flip/swap must
    reproduce torch ConvTranspose2d(k=4, s=2, p=1) exactly."""
    torch = pytest.importorskip("torch")
    from maua_tpu.flow import pwc

    rs = np.random.RandomState(2)
    w = rs.randn(5, 3, 4, 4).astype(np.float32) * 0.1  # (in, out, kh, kw)
    b = rs.randn(3).astype(np.float32) * 0.01
    x = rs.rand(1, 6, 7, 5).astype(np.float32)

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1,
    ).detach().numpy().transpose(0, 2, 3, 1)

    wf = np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    ours = np.asarray(pwc._deconv(jnp.asarray(x), {"w": jnp.asarray(wf), "b": jnp.asarray(b)}))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 1e-4


def test_pwc_correlation_matches_torch_loop():
    """The 81-shift cost volume must equal an explicit torch loop
    (channel-mean correlation over the 9x9 displacement window)."""
    torch = pytest.importorskip("torch")
    from maua_tpu.flow import pwc

    rs = np.random.RandomState(3)
    f1 = rs.randn(1, 10, 12, 6).astype(np.float32)
    f2 = rs.randn(1, 10, 12, 6).astype(np.float32)
    ours = np.asarray(pwc._correlation(jnp.asarray(f1), jnp.asarray(f2)))

    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2))
    t2 = torch.nn.functional.pad(torch.from_numpy(f2.transpose(0, 3, 1, 2)), (4, 4, 4, 4))
    refs = []
    for dy in range(9):
        for dx in range(9):
            refs.append((t1 * t2[:, :, dy:dy + 10, dx:dx + 12]).mean(dim=1))
    ref = torch.stack(refs, dim=-1).numpy()[0]
    ref = np.where(ref > 0, ref, 0.1 * ref)  # leaky relu
    assert np.abs(ours[0] - ref).max() < 1e-5


def test_pwc_converter_roundtrip_forward():
    """A synthetic state dict in the sniklaus key layout must convert
    and run the full forward with correct shapes at every level."""
    from maua_tpu.flow import pwc

    rs = np.random.RandomState(4)
    sd = {}
    names = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]
    ci = 3
    for nm, co in zip(names, [16, 32, 64, 96, 128, 196]):
        for i, (a, b_) in enumerate([(ci, co), (co, co), (co, co)]):
            sd[f"netExtractor.{nm}.{2*i}.weight"] = rs.randn(b_, a, 3, 3).astype(np.float32) * 0.05
            sd[f"netExtractor.{nm}.{2*i}.bias"] = np.zeros(b_, np.float32)
        ci = co
    for lvl, nm in ((6, "netSix"), (5, "netFiv"), (4, "netFou"), (3, "netThr"), (2, "netTwo")):
        c = pwc._corr_in(lvl)
        for sub, w_ in zip(names, [128, 128, 96, 64, 32]):
            sd[f"{nm}.{sub}.0.weight"] = rs.randn(w_, c, 3, 3).astype(np.float32) * 0.03
            sd[f"{nm}.{sub}.0.bias"] = np.zeros(w_, np.float32)
            c += w_
        sd[f"{nm}.netSix.0.weight"] = rs.randn(2, c, 3, 3).astype(np.float32) * 0.03
        sd[f"{nm}.netSix.0.bias"] = np.zeros(2, np.float32)
        if lvl != 6:  # upsamples the coarser level's flow + dense feats
            c_prev = pwc._corr_in(lvl + 1) + 128 + 128 + 96 + 64 + 32
            sd[f"{nm}.netUpflow.weight"] = rs.randn(2, 2, 4, 4).astype(np.float32) * 0.1
            sd[f"{nm}.netUpflow.bias"] = np.zeros(2, np.float32)
            sd[f"{nm}.netUpfeat.weight"] = rs.randn(c_prev, 2, 4, 4).astype(np.float32) * 0.02
            sd[f"{nm}.netUpfeat.bias"] = np.zeros(2, np.float32)
    c = pwc._corr_in(2) + 128 + 128 + 96 + 64 + 32
    for i, (a, b_) in enumerate([(c, 128), (128, 128), (128, 128), (128, 96), (96, 64), (64, 32), (32, 2)]):
        sd[f"netRefiner.netMain.{2*i}.weight"] = rs.randn(b_, a, 3, 3).astype(np.float32) * 0.02
        sd[f"netRefiner.netMain.{2*i}.bias"] = np.zeros(b_, np.float32)

    params = pwc.params_from_torch(sd)
    out = pwc.pwc_forward(params, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
