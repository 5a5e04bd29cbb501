"""Tests for the TPU-native RAFT flow estimator (flow/raft.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from maua_tpu.flow import raft
from maua_tpu.flow.models import get_flow_model

CFG = raft.TINY_RAFT


def test_forward_shapes_and_finite():
    params = raft.init_params(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(0)
    i1 = rs.rand(1, 32, 40, 3).astype(np.float32)
    i2 = rs.rand(1, 32, 40, 3).astype(np.float32)
    flow = raft.forward(params, jnp.asarray(i1), jnp.asarray(i2), CFG)
    assert flow.shape == (1, 32, 40, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_corr_pyramid_matches_numpy():
    rs = np.random.RandomState(1)
    f1 = rs.randn(2, 4, 5, 8).astype(np.float32)
    f2 = rs.randn(2, 4, 5, 8).astype(np.float32)
    pyr = raft._corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2)
    ref = np.einsum("bnd,bmd->bnm", f1.reshape(2, 20, 8), f2.reshape(2, 20, 8)) / np.sqrt(8)
    got = np.asarray(pyr[0]).reshape(2, 20, 20)
    assert np.abs(got - ref.reshape(2, 20, 20)).max() < 1e-5
    # level 1 = 2x2 average pool over the second grid
    lvl1 = np.asarray(pyr[1]).reshape(2, 20, 2, 2)
    ref1 = ref.reshape(2, 20, 4, 5)[:, :, :4, :4].reshape(2, 20, 2, 2, 2, 2).mean((3, 5))
    assert np.abs(lvl1 - ref1).max() < 1e-5


def test_lookup_integer_coords_exact():
    """Sampling the level-0 volume at integer displacements returns the
    exact correlation entries."""
    rs = np.random.RandomState(2)
    b, h, w, d = 1, 6, 6, 4
    f1 = rs.randn(b, h, w, d).astype(np.float32)
    f2 = rs.randn(b, h, w, d).astype(np.float32)
    pyr = raft._corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 1)
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([gx, gy], -1)[None])  # zero flow
    out = np.asarray(raft._lookup(pyr, coords, radius=1))  # (1, h, w, 9)
    corr = np.asarray(pyr[0]).reshape(h, w, h, w)
    # center tap (dx=0, dy=0) is corr at the same pixel
    center = out[0, :, :, 4]
    ref = np.stack([[corr[y, x, y, x] for x in range(w)] for y in range(h)])
    assert np.abs(center - ref).max() < 1e-5
    # dx=+1 tap
    right = out[0, :, : w - 1, 5]
    ref_r = np.stack([[corr[y, x, y, x + 1] for x in range(w - 1)] for y in range(h)])
    assert np.abs(right - ref_r).max() < 1e-5


def test_upsample_flow_convex():
    rs = np.random.RandomState(3)
    flow = rs.randn(1, 4, 4, 2).astype(np.float32)
    mask = rs.randn(1, 4, 4, 576).astype(np.float32)
    up = np.asarray(raft._upsample_flow(jnp.asarray(flow), jnp.asarray(mask)))
    assert up.shape == (1, 32, 32, 2)
    # convex combination of 8x-scaled neighbors: bounded by their extremes
    assert up.max() <= flow.max() * 8 + 1e-4
    assert up.min() >= flow.min() * 8 - 1e-4


def test_converter_roundtrip():
    """Synthetic torchvision raft_large-layout state dict -> pytree
    with the same structure as init_params."""
    rs = np.random.RandomState(4)
    cfg = CFG
    sd = {}

    def add(name, ci, co, k, norm=None, down=None):
        sd[f"{name}.weight"] = rs.randn(co, ci, k, k).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rs.randn(co).astype(np.float32) * 0.01

    def add_norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    d1, d2, d3 = cfg.feat_dims
    for base, out in (("feature_encoder", cfg.feat_out),
                      ("context_encoder", cfg.hidden_dim + cfg.context_dim)):
        add(f"{base}.convnormrelu.0", 3, d1, 7)
        add_norm(f"{base}.convnormrelu.1", d1)
        for layer, (ci, co) in (("layer1", (d1, d1)), ("layer2", (d1, d2)), ("layer3", (d2, d3))):
            for bi in range(2):
                bb = f"{base}.{layer}.{bi}"
                cin = ci if bi == 0 else co
                add(f"{bb}.convnormrelu1.0", cin, co, 3)
                add_norm(f"{bb}.convnormrelu1.1", co)
                add(f"{bb}.convnormrelu2.0", co, co, 3)
                add_norm(f"{bb}.convnormrelu2.1", co)
                if bi == 0 and ci != co:
                    add(f"{bb}.downsample.0", ci, co, 1)
                    add_norm(f"{bb}.downsample.1", co)
        add(f"{base}.conv", d3, out, 1)
    ncorr = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    add("update_block.motion_encoder.convcorr1.0", ncorr, 256, 1)
    add("update_block.motion_encoder.convcorr2.0", 256, 192, 3)
    add("update_block.motion_encoder.convflow1.0", 2, 128, 7)
    add("update_block.motion_encoder.convflow2.0", 128, 64, 3)
    add("update_block.motion_encoder.conv.0", 256, 126, 3)
    gin = cfg.hidden_dim + 128 + cfg.context_dim
    for g in ("convz", "convr", "convq"):
        sd[f"update_block.recurrent_block.convgru1.{g}.weight"] = rs.randn(cfg.hidden_dim, gin, 1, 5).astype(np.float32) * 0.01
        sd[f"update_block.recurrent_block.convgru1.{g}.bias"] = np.zeros(cfg.hidden_dim, np.float32)
        sd[f"update_block.recurrent_block.convgru2.{g}.weight"] = rs.randn(cfg.hidden_dim, gin, 5, 1).astype(np.float32) * 0.01
        sd[f"update_block.recurrent_block.convgru2.{g}.bias"] = np.zeros(cfg.hidden_dim, np.float32)
    add("update_block.flow_head.conv1", cfg.hidden_dim, 256, 3)
    add("update_block.flow_head.conv2", 256, 2, 3)
    add("mask_predictor.convrelu.0", cfg.hidden_dim, 256, 3)
    add("mask_predictor.conv", 256, 576, 1)

    params = raft.params_from_torch(sd, cfg)
    ref = raft.init_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(lambda a: a.shape, ref)
    out = raft.forward(params, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3)), cfg, iters=2)
    assert out.shape == (1, 16, 16, 2)


def test_ensemble_raft(monkeypatch):
    original = raft.raft_flow

    def tiny_raft_flow(a, b, params=None):
        return original(a, b, params=params, cfg=CFG)

    monkeypatch.setattr(raft, "raft_flow", tiny_raft_flow)
    model = get_flow_model(("raft",), allow_random=True)
    rs = np.random.RandomState(5)
    flow = model(rs.rand(24, 24, 3).astype(np.float32), rs.rand(24, 24, 3).astype(np.float32))
    assert flow.shape == (24, 24, 2)
    assert np.all(np.isfinite(flow))


def test_gru_input_channel_order(monkeypatch):
    """The GRU input must be [context, motion(, motion_global)] — the
    order the torchvision raft_large / zacjiang GMA checkpoints bake
    into their GRU conv weights (the converters copy those weights
    without permutation, so a swapped concat runs pretrained nets with
    motion channels where context is expected). Captures the scan-traced
    GRU input and pins its leading channels to the independently
    computed context features."""
    for gma in (False, True):
        params = raft.init_params(jax.random.PRNGKey(3), CFG, gma=gma)
        rs = np.random.RandomState(7)
        i1 = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
        i2 = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))

        captured = []
        orig = raft._sep_gru

        def capture(p, h, x):
            # x is a scan tracer; materialize it at run time
            jax.debug.callback(lambda a: captured.append(np.asarray(a)), x)
            return orig(p, h, x)

        monkeypatch.setattr(raft, "_sep_gru", capture)
        try:
            jax.block_until_ready(raft.forward(params, i1, i2, CFG, iters=1))
        finally:
            monkeypatch.setattr(raft, "_sep_gru", orig)

        cnet = raft._encoder(params["cnet"], i1 * 2.0 - 1.0)
        context = np.asarray(jax.nn.relu(cnet[..., CFG.hidden_dim:]))
        got = np.asarray(captured[0][..., : CFG.context_dim])
        assert np.abs(got - context).max() < 1e-5, f"gma={gma}"
        # motion features carry the current flow (zero at iter 1) as
        # their trailing 2 channels — pins motion right after context
        mot_tail = np.asarray(
            captured[0][..., CFG.context_dim + 126 : CFG.context_dim + 128])
        assert np.abs(mot_tail).max() < 1e-6, f"gma={gma}"


def test_gma_forward_shapes_and_finite():
    """GMA variant: context-attention aggregated motion features; the
    gin widens by 128 and the forward stays shape-correct."""
    params = raft.init_params(jax.random.PRNGKey(2), CFG, gma=True)
    assert params["gma"] is not None
    out = raft.forward(params, jnp.zeros((1, 24, 16, 3)), jnp.zeros((1, 24, 16, 3)), CFG, iters=2)
    assert out.shape == (1, 24, 16, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_gma_converter_roundtrip():
    """Synthetic princeton/GMA-layout state dict (fnet.*, cnet.*,
    update_block.{encoder,gru,flow_head,mask,aggregator}, att.to_qk,
    bias-free attention convs, module. prefixes) -> pytree matching
    init_params(gma=True) shapes; forward runs."""
    rs = np.random.RandomState(5)
    cfg = CFG
    sd = {}

    def add(name, ci, co, k1, k2=None, bias=True):
        k2 = k1 if k2 is None else k2
        sd[f"{name}.weight"] = rs.randn(co, ci, k1, k2).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rs.randn(co).astype(np.float32) * 0.01

    d1, d2, d3 = cfg.feat_dims
    for base, out in (("fnet", cfg.feat_out), ("cnet", cfg.hidden_dim + cfg.context_dim)):
        add(f"{base}.conv1", 3, d1, 7)
        for layer, (ci, co) in (("layer1", (d1, d1)), ("layer2", (d1, d2)), ("layer3", (d2, d3))):
            for bi in range(2):
                bb = f"{base}.{layer}.{bi}"
                cin = ci if bi == 0 else co
                add(f"{bb}.conv1", cin, co, 3)
                add(f"{bb}.conv2", co, co, 3)
                if bi == 0 and ci != co:
                    add(f"{bb}.downsample.0", ci, co, 1)
        add(f"{base}.conv2", d3, out, 1)
    ncorr = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    add("update_block.encoder.convc1", ncorr, 256, 1)
    add("update_block.encoder.convc2", 256, 192, 3)
    add("update_block.encoder.convf1", 2, 128, 7)
    add("update_block.encoder.convf2", 128, 64, 3)
    add("update_block.encoder.conv", 256, 126, 3)
    # GRU conv input = hidden ++ [motion(128), motion_global(128), context]
    gin = cfg.hidden_dim + 128 + 128 + cfg.context_dim
    for g in ("z", "r", "q"):
        add(f"update_block.gru.conv{g}1", gin, cfg.hidden_dim, 1, 5)
        add(f"update_block.gru.conv{g}2", gin, cfg.hidden_dim, 5, 1)
    add("update_block.flow_head.conv1", cfg.hidden_dim, 256, 3)
    add("update_block.flow_head.conv2", 256, 2, 3)
    add("update_block.mask.0", cfg.hidden_dim, 256, 3)
    add("update_block.mask.2", 256, 576, 1)
    add("att.to_qk", cfg.context_dim, 256, 1, bias=False)
    add("update_block.aggregator.to_v", 128, 128, 1, bias=False)
    sd["update_block.aggregator.gamma"] = np.zeros(1, np.float32)
    sd = {f"module.{k}": v for k, v in sd.items()}  # DataParallel prefixes

    params = raft.params_from_torch_gma(sd, cfg)
    out = raft.forward(params, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3)), cfg, iters=2)
    assert out.shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
