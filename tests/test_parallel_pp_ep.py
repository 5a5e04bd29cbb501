"""Pipeline parallelism (parallel/pipeline.py) and expert parallelism
(parallel/moe.py) on the 8-virtual-device CPU mesh: both sharded paths
must match their single-device references in forward AND gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from maua_tpu.autoregressive.transformer import ARConfig, forward, init_params
from maua_tpu.parallel.moe import MoEConfig, init_moe, moe_apply, moe_apply_ep
from maua_tpu.parallel.pipeline import (
    pipeline_forward,
    pipelined_apply,
    scan_layers,
    stack_stage_params,
)

CFG = ARConfig(
    width=32, layers=4, heads=4, image_rows=4, image_cols=4,
    text_length=8, vocab_size=64, text_vocab_size=64,
)


@pytest.fixture(scope="module")
def ar_setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, CFG.text_length + 16), 0, 64)
    return params, tokens


def _stage_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("stage",))


def test_pipeline_matches_sequential(ar_setup):
    params, tokens = ar_setup
    ref = np.asarray(forward(params, tokens, CFG))
    out = np.asarray(
        pipeline_forward(params, tokens, CFG, _stage_mesh(4), num_microbatches=4)
    )
    assert np.allclose(ref, out, atol=1e-4), np.abs(ref - out).max()


def test_pipeline_microbatch_count_free(ar_setup):
    # M=2 and M=8 schedules produce the same function output
    params, tokens = ar_setup
    ref = np.asarray(forward(params, tokens, CFG))
    for m in (2, 8):
        out = np.asarray(
            pipeline_forward(params, tokens, CFG, _stage_mesh(2), num_microbatches=m)
        )
        assert np.allclose(ref, out, atol=1e-4), (m, np.abs(ref - out).max())


def test_pipeline_grad_matches(ar_setup):
    params, tokens = ar_setup
    mesh = _stage_mesh(4)

    def loss_ref(p):
        return jnp.mean(forward(p, tokens, CFG) ** 2)

    def loss_pp(p):
        return jnp.mean(pipeline_forward(p, tokens, CFG, mesh, num_microbatches=4) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.grad(loss_pp)(params)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pp, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(flat_ref, flat_pp):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), np.abs(
            np.asarray(a) - np.asarray(b)
        ).max()


def test_pipeline_jit_and_remat(ar_setup):
    params, tokens = ar_setup
    mesh = _stage_mesh(4)
    ref = np.asarray(forward(params, tokens, CFG))
    fn = jax.jit(
        lambda p, t: pipeline_forward(p, t, CFG, mesh, num_microbatches=4, remat=True)
    )
    out = np.asarray(fn(params, tokens))
    assert np.allclose(ref, out, atol=1e-4)


def test_pipelined_apply_generic():
    # pipeline a plain stacked-MLP: 8 layers over 8 stages, identity check
    key = jax.random.PRNGKey(2)
    layers = [
        {"w": jax.random.normal(jax.random.fold_in(key, i), (16, 16)) * 0.2}
        for i in range(8)
    ]
    x = jax.random.normal(jax.random.fold_in(key, 99), (4, 16))
    ref = x
    for l in layers:
        ref = jnp.tanh(ref @ l["w"])
    mesh = Mesh(np.array(jax.devices()[:8]), ("pipe",))
    stacked = stack_stage_params(layers, 8)
    layer_fn = lambda l, h: jnp.tanh(h @ l["w"])
    out = pipelined_apply(
        mesh, "pipe", stacked, lambda p, h: scan_layers(layer_fn, p, h), x, 2
    )
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


MOE_CFG = MoEConfig(width=16, hidden=32, n_experts=8, top_k=2)


@pytest.fixture(scope="module")
def moe_setup():
    params = init_moe(jax.random.PRNGKey(3), MOE_CFG)
    x = jax.random.normal(jax.random.PRNGKey(4), (12, MOE_CFG.width))
    return params, x


def test_moe_ep_matches_dense(moe_setup):
    params, x = moe_setup
    ref, aux_ref = moe_apply(params, x, MOE_CFG)
    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))
    out, aux = moe_apply_ep(params, x, MOE_CFG, mesh)
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
    assert np.allclose(float(aux_ref), float(aux), atol=1e-5)


def test_moe_ep_with_data_sharding(moe_setup):
    params, x = moe_setup
    ref, aux_ref = moe_apply(params, x, MOE_CFG)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "expert"))
    out, aux = moe_apply_ep(params, x, MOE_CFG, mesh, data_axis="data")
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
    assert np.allclose(float(aux_ref), float(aux), atol=1e-5)


def test_moe_grad_matches(moe_setup):
    params, x = moe_setup
    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))

    def loss_dense(p):
        out, aux = moe_apply(p, x, MOE_CFG)
        return jnp.mean(out**2) + 0.01 * aux

    def loss_ep(p):
        out, aux = moe_apply_ep(p, x, MOE_CFG, mesh)
        return jnp.mean(out**2) + 0.01 * aux

    g_ref = jax.grad(loss_dense)(params)
    g_ep = jax.grad(loss_ep)(params)
    for k in g_ref:
        assert np.allclose(np.asarray(g_ref[k]), np.asarray(g_ep[k]), atol=1e-5), k


def test_moe_top1_routes_exclusively(moe_setup):
    params, x = moe_setup
    cfg1 = MoEConfig(width=16, hidden=32, n_experts=8, top_k=1)
    from maua_tpu.parallel.moe import router_gates

    gates, aux = router_gates(params, x, cfg1)
    gates = np.asarray(gates)
    assert np.allclose((gates > 0).sum(axis=1), 1)  # one expert per token
    assert np.allclose(gates.sum(axis=1), 1.0, atol=1e-6)
    assert float(aux) >= 1.0 - 1e-6  # n_e * sum f*p >= 1 (Cauchy-Schwarz at balance)
