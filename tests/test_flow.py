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
    model = models.get_flow_model(("spynet", "farneback", "hs"), allow_random=True)
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
    model = models.get_flow_model(("pwc", "farneback"), allow_random=True)
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


def test_liteflownet_shapes_and_ensemble():
    from maua_tpu.flow import liteflownet as lfn, models

    f1, f2 = _shifted_pair(shift=2)
    flow = lfn.liteflownet_flow(f1, f2)
    assert flow.shape == (*f1.shape[:2], 2)
    assert np.isfinite(flow).all()
    model = models.get_flow_model(("liteflownet",), allow_random=True)
    out = model(f1, f2)
    assert out.shape == (*f1.shape[:2], 2)


def test_missing_flow_weights_raise(tmp_path, monkeypatch):
    """A neural ensemble member without its checkpoint must fail loudly
    — averaging a random-init net into the ensemble silently corrupts
    every downstream warp. allow_random=True is the explicit opt-in.
    Reference contract: `maua/flow/__init__.py:24-49` (hard submodule
    dependency instead)."""
    from maua_tpu import utility

    monkeypatch.setattr(utility, "MODELZOO", str(tmp_path))  # no checkpoints here
    for name in ("liteflownet", "unflow", "spynet", "pwc", "raft"):
        with pytest.raises(FileNotFoundError, match="allow_random"):
            models.get_flow_model((name,))


def test_unflow_shapes_and_ensemble():
    from maua_tpu.flow import models, unflow as uf

    f1, f2 = _shifted_pair(shift=2)
    flow = uf.unflow_flow(f1, f2)
    assert flow.shape == (*f1.shape[:2], 2)
    assert np.isfinite(flow).all()
    model = models.get_flow_model(("unflow",), allow_random=True)
    out = model(f1, f2)
    assert out.shape == (*f1.shape[:2], 2)


def test_liteflownet_grouped_deconv_matches_torch():
    """The grouped (1ch/group, no bias) lhs-dilated deconv must equal
    torch ConvTranspose2d(C, C, 4, 2, 1, groups=C, bias=False) — the
    reference's netUpflow/netUpcorr modules."""
    torch = pytest.importorskip("torch")
    from maua_tpu.flow import liteflownet as lfn

    rs = np.random.RandomState(7)
    C = 2
    x = rs.randn(1, 6, 5, C).astype(np.float32)
    w = rs.randn(C, 1, 4, 4).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        None, stride=2, padding=1, groups=C,
    ).numpy().transpose(0, 2, 3, 1)
    wf = jnp.asarray(w[:, 0, ::-1, ::-1].transpose(1, 2, 0)[..., None, :])
    ours = np.asarray(lfn._deconv_grouped(jnp.asarray(x), wf))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 1e-5


def test_liteflownet_strided_correlation_matches_torch_loop():
    """The stride-2 cost volume (netUpcorr levels) must equal an
    explicit torch loop: correlation evaluated on the half-resolution
    spatial lattice, displacement window +-3, channel mean, lrelu."""
    torch = pytest.importorskip("torch")
    from maua_tpu.flow import liteflownet as lfn

    rs = np.random.RandomState(8)
    f1 = rs.randn(1, 8, 10, 5).astype(np.float32)
    f2 = rs.randn(1, 8, 10, 5).astype(np.float32)
    ours = np.asarray(lfn._correlation(jnp.asarray(f1), jnp.asarray(f2), stride=2))
    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2))[:, :, ::2, ::2]
    t2 = torch.nn.functional.pad(torch.from_numpy(f2.transpose(0, 3, 1, 2)), (3, 3, 3, 3))
    refs = []
    for dy in range(7):
        for dx in range(7):
            s = t2[:, :, dy : dy + 8 : 2, dx : dx + 10 : 2]
            refs.append((t1 * s).mean(dim=1))
    ref = torch.stack(refs, dim=-1).numpy()[0].transpose(0, 1, 2)
    ref = np.where(ref > 0, ref, 0.1 * ref)
    assert np.abs(ours[0] - ref).max() < 1e-5


def test_liteflownet_regularization_preserves_constant_flow():
    """The distance-softmax local filtering is a convex re-averaging of
    the flow window: a spatially constant flow field must pass through
    unchanged regardless of the learned distance logits (partition of
    unity: netScaleX/Y with all-ones 1x1 weights and the divisor)."""
    from maua_tpu.flow import liteflownet as lfn

    params = lfn.init_params(jax.random.PRNGKey(3))
    lvl = 6
    p = jax.tree_util.tree_map(lambda x: x, params[f"regularization{lvl}"])
    p["scale_x"] = [{"w": jnp.ones_like(params[f"regularization{lvl}"]["scale_x"][0]["w"]),
                     "b": jnp.zeros((1,))}]
    p["scale_y"] = [{"w": jnp.ones_like(params[f"regularization{lvl}"]["scale_y"][0]["w"]),
                     "b": jnp.zeros((1,))}]
    rs = np.random.RandomState(9)
    im1 = jnp.asarray(rs.rand(1, 8, 8, 3), jnp.float32)
    im2 = jnp.asarray(rs.rand(1, 8, 8, 3), jnp.float32)
    feat = jnp.asarray(rs.rand(1, 8, 8, 192), jnp.float32)
    flow = jnp.full((1, 8, 8, 2), 0.7, jnp.float32)
    out = np.asarray(lfn._regularization(p, lvl, im1, im2, feat, flow))
    # interior pixels see a full window of the constant flow; the
    # zero-padded border mixes in zeros, so check the interior only
    assert np.abs(out[:, 2:-2, 2:-2] - 0.7).max() < 1e-5


def test_liteflownet_converter_roundtrip_forward():
    """A synthetic state dict in the sniklaus key layout (ModuleList
    index 0 = FINEST level 2) must convert and run the full forward;
    level ordering is pinned by per-level-distinct biases on the final
    Matching flow conv."""
    from maua_tpu.flow import liteflownet as lfn

    rs = np.random.RandomState(11)
    sd = {}

    def put_seq(prefix, specs, bias_val=0.0):
        for i, (kh, kw, ci, co) in enumerate(specs):
            sd[f"{prefix}.{2*i}.weight"] = rs.randn(co, ci, kh, kw).astype(np.float32) * 0.02
            sd[f"{prefix}.{2*i}.bias"] = np.full(co, bias_val, np.float32)

    for name, specs in lfn._feature_specs().items():
        put_seq(f"netFeatures.net{name.capitalize()}", specs)
    lvl_bias = {2: 0.11, 3: 0.22, 4: 0.33, 5: 0.44, 6: 0.55}
    for i, lvl in enumerate(lfn.LEVELS):
        ms = lfn._matching_specs(lvl)
        put_seq(f"netMatching.{i}.netFeat", ms["feat"])
        put_seq(f"netMatching.{i}.netMain", ms["main"], bias_val=lvl_bias[lvl])
        if ms["upflow"]:
            sd[f"netMatching.{i}.netUpflow.weight"] = rs.randn(2, 1, 4, 4).astype(np.float32) * 0.1
        if ms["upcorr"]:
            sd[f"netMatching.{i}.netUpcorr.weight"] = rs.randn(49, 1, 4, 4).astype(np.float32) * 0.1
        ss = lfn._subpixel_specs(lvl)
        put_seq(f"netSubpixel.{i}.netFeat", ss["feat"])
        put_seq(f"netSubpixel.{i}.netMain", ss["main"])
        rg = lfn._regularization_specs(lvl)
        put_seq(f"netRegularization.{i}.netFeat", rg["feat"])
        put_seq(f"netRegularization.{i}.netMain", rg["main"])
        put_seq(f"netRegularization.{i}.netDist", rg["dist"])
        put_seq(f"netRegularization.{i}.netScaleX", rg["scale_x"])
        put_seq(f"netRegularization.{i}.netScaleY", rg["scale_y"])

    params = lfn.params_from_torch(sd)
    # ordering pin: ModuleList index i landed at level i+2
    for i, lvl in enumerate(lfn.LEVELS):
        got = float(np.asarray(params[f"matching{lvl}"]["main"][-1]["b"][0]))
        assert abs(got - lvl_bias[lvl]) < 1e-6, (lvl, got)
    out = lfn.liteflownet_forward(params, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_unflow_converter_roundtrip_forward():
    """A synthetic state dict in the pytorch-unflow key layout
    (netFlownets ModuleList, stage 0 = FlowNetC) must convert and run
    the stacked CSS forward with correct shapes."""
    from maua_tpu.flow import unflow as uf

    rs = np.random.RandomState(12)
    sd = {}

    def put_conv(name, kh, kw, ci, co):
        sd[f"{name}.weight"] = rs.randn(co, ci, kh, kw).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = np.zeros(co, np.float32)

    def put_deconv(name, ci, co):
        sd[f"{name}.weight"] = rs.randn(ci, co, 4, 4).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(co, np.float32)

    for s in range(3):
        pre = f"netFlownets.{s}"
        for name, k, ci, co, _ in uf._stage_specs(complex_=(s == 0)):
            put_conv(f"{pre}.net{name.title().replace('_', '')}.0", k, k, ci, co)
        put_conv(f"{pre}.netUpconv.netSixOut.0", 3, 3, 1024, 2)
        for name, co, cin in uf._DEC:
            put_deconv(f"{pre}.netUpconv.net{name.title()}Next.0", cin, co)
            put_deconv(f"{pre}.netUpconv.net{name.title()}Up.0", 2, 2)
        put_conv(f"{pre}.netUpconv.netFivOut.0", 3, 3, 512 + 512 + 2, 2)
        put_conv(f"{pre}.netUpconv.netFouOut.0", 3, 3, 512 + 256 + 2, 2)
        put_conv(f"{pre}.netUpconv.netThrOut.0", 3, 3, 256 + 128 + 2, 2)
        put_conv(f"{pre}.netUpconv.netTwoOut.0", 3, 3, 128 + 64 + 2, 2)

    params = uf.params_from_torch(sd)
    out = uf.unflow_forward(params, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()
