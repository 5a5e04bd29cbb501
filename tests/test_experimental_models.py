"""Experimental GAN model families + the optimal-transport toolkit.

Covers `maua/GAN/training/models/experimental/{deepinvolutional,
equivariant}.py` and `experimental/optstyle/optimal_transport.py`
roles, plus the plugin-registry -> train-step wiring that makes every
`--model` choice actually train.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.gan import models_experimental as me
from maua_tpu.gan import training as tr
from maua_tpu.ops import transport as tp


# ------------------------------------------------------- transport
def test_random_rotation_so_n():
    r = tp.random_rotation(jax.random.PRNGKey(0), 5)
    assert np.allclose(np.asarray(r @ r.T), np.eye(5), atol=1e-5)
    assert np.isclose(float(jnp.linalg.det(r)), 1.0, atol=1e-5)


def test_cdf_match_matches_distribution():
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    b = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2.0 + 1.0
    m = np.asarray(tp.cdf_match(a, b))
    bs = np.asarray(b)
    # per-channel quartiles should track the source's
    for c in range(3):
        for q in (0.25, 0.5, 0.75):
            assert abs(np.quantile(m[..., c], q) - np.quantile(bs[..., c], q)) < 0.25


@pytest.mark.parametrize("mode", ["chol", "pca", "sym"])
def test_hist_match_covariance_modes(mode):
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3))
    b = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 48, 3)) @ jnp.array(
        [[1.5, 0.3, 0.0], [0.0, 0.7, 0.2], [0.1, 0.0, 1.1]]
    )
    m = np.asarray(tp.hist_match(a, b, mode=mode))
    cov_m = np.cov(m.reshape(-1, 3).T)
    cov_b = np.cov(np.asarray(b).reshape(-1, 3).T)
    assert np.abs(cov_m - cov_b).max() < 0.15, mode


def test_sliced_histogram_transport_converges():
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    b = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 1.5 + 2.0
    out = np.asarray(tp.sliced_histogram_transport(a, b, iters=6))
    assert abs(out.mean() - float(jnp.mean(b))) < 0.2
    assert abs(out.std() - float(jnp.std(b))) < 0.2


# ------------------------------------------------------- involution
def test_involution_g_d_shapes_and_grads():
    k = jax.random.PRNGKey(0)
    gp = me.init_involution_g(k, resolution=16, base=16)
    img = me.involution_g(gp, jax.random.normal(k, (2, 100)))
    assert img.shape == (2, 16, 16, 3)
    assert float(jnp.abs(img).max()) <= 1.0
    dp = me.init_involution_d(k, resolution=16, base=16)
    logits = me.involution_d(dp, img)
    assert logits.shape == (2,)
    g = jax.grad(lambda p: me.involution_d(dp, me.involution_g(p, jnp.zeros((1, 100)))).sum())(gp)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


# -------------------------------------------------------- steerable
def test_steerable_g_exact_equivariance():
    """G(z, r) == rot90^r(G(z, 0)) and flip analogously — the discrete
    ExtractRotation contract, exact instead of band-limited."""
    k = jax.random.PRNGKey(0)
    gp = me.init_steerable_g(k, resolution=16, depth=2, base=8)
    z = jax.random.normal(k, (2, 128))
    i0 = me.steerable_g(gp, z, 0)
    assert i0.shape == (2, 16, 16, 3)
    for r in (1, 2, 3):
        ir = me.steerable_g(gp, z, r)
        assert float(jnp.abs(ir - jnp.rot90(i0, r, axes=(1, 2))).max()) < 1e-4, r
    i_f = me.steerable_g(gp, z, 0, flip=True)
    assert float(jnp.abs(i_f - jnp.flip(i0, axis=2)).max()) < 1e-4


def test_steerable_d_exact_invariance():
    k = jax.random.PRNGKey(0)
    dp = me.init_steerable_d(k, depth=2, base=8)
    img = jax.random.normal(k, (2, 16, 16, 3))
    y = me.steerable_d(dp, img)
    for t in (lambda x: jnp.rot90(x, 1, axes=(1, 2)),
              lambda x: jnp.rot90(x, 2, axes=(1, 2)),
              lambda x: jnp.flip(x, axis=2),
              lambda x: jnp.flip(jnp.rot90(x, 1, axes=(1, 2)), axis=1)):
        assert float(jnp.abs(y - me.steerable_d(dp, t(img))).max()) < 1e-4


def test_d4_group_table():
    """Composition/inverse tables form a group of order 8."""
    for i in range(8):
        assert me._d4_compose(i, me._d4_inverse(i)) == 0
        assert me._d4_compose(0, i) == i and me._d4_compose(i, 0) == i
    # associativity spot check
    for i, j, k in [(1, 5, 3), (7, 2, 6), (4, 4, 1)]:
        assert me._d4_compose(me._d4_compose(i, j), k) == me._d4_compose(i, me._d4_compose(j, k))


# -------------------------------------------- generic training seam
@pytest.mark.parametrize("family,z_dim,res,base", [
    ("dcgan", 100, 16, 8), ("hypermixer", 64, 16, 8),
    ("involution", 100, 16, 8), ("steerable", 128, 16, 8),
])
def test_generic_families_train(family, z_dim, res, base):
    """Every plugin-registry model family runs the fused train step
    (the reference's reflection system promises this for any G/D
    combo, `__main__.py:136-144`)."""
    m = tr.GenericModel(family, res, z_dim=z_dim, base=base)
    t_cfg = tr.TrainConfig()
    state = tr.init_train_state(jax.random.PRNGKey(0), m, m, t_cfg)
    real = jax.random.uniform(jax.random.PRNGKey(1), (2, res, res, 3)) * 2 - 1
    state, metrics = tr.train_step(state, real, jax.random.PRNGKey(2), m, m, t_cfg)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert int(state["step"]) == 1
    fake = tr.generate(state["g_ema"], jnp.zeros((1, z_dim)), m)
    assert fake.shape == (1, res, res, 3)


def test_train_cli_builds_all_models():
    """`--model <name>` resolves to configs the harness accepts for
    every registered name (the round-1 tuples crashed at unpack)."""
    import argparse

    from maua_tpu.gan import train_cli

    for name, comp in train_cli.REGISTRY["models"].items():
        parser = argparse.ArgumentParser()
        parser.add_argument("--resolution", default=16, type=int)
        comp.add_model_specific_args(parser)
        args = parser.parse_args([])
        g_cfg, d_cfg = comp.build(args)
        assert hasattr(g_cfg, "z_dim"), name


# ---------------------------------------------------- rudalle api
def test_kandinsky_payload_and_decode():
    from maua_tpu.autoregressive import api

    payload = api.build_request_payload("a cat", top_k=10)
    assert payload["instances"][0]["top_k"] == 10
    # round-trip a tiny png through the base64 response decoder
    import base64
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (4, 4), (255, 0, 0)).save(buf, format="PNG")
    resp = {"images": [base64.b64encode(buf.getvalue()).decode("ascii")]}
    (img,) = list(api.decode_response(resp))
    assert img.size == (4, 4)
    with pytest.raises(RuntimeError, match="egress"):
        api.request_kandinsky("a cat", "http://example.com")


# ------------------------------------------------------ initial blur
def test_initial_blur_fades_with_step():
    """Blur is strong at step 0 and a no-op after the fade window
    (`training/augmentation/blur.py:24-35` schedule)."""
    img = jnp.zeros((1, 17, 17, 3)).at[0, 8, 8].set(1.0)
    early = tr.initial_blur(img, jnp.asarray(0), 32, init_sigma=4.0, fade_kimg=10.0)
    late = tr.initial_blur(img, jnp.asarray(10_000_000), 32, init_sigma=4.0, fade_kimg=10.0)
    assert float(early[0, 8, 8, 0]) < 0.2  # spread out
    assert float(late[0, 8, 8, 0]) > 0.95  # collapsed to a delta
    assert np.allclose(float(jnp.sum(early[..., 0])), 1.0, atol=1e-3)  # normalized


def test_train_step_with_blur():
    m = tr.GenericModel("dcgan", 16, z_dim=100, base=8)
    t_cfg = tr.TrainConfig(blur_init_sigma=2.0, blur_fade_kimg=1.0)
    state = tr.init_train_state(jax.random.PRNGKey(0), m, m, t_cfg)
    real = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 2 - 1
    state, metrics = tr.train_step(state, real, jax.random.PRNGKey(2), m, m, t_cfg)
    assert all(np.isfinite(float(v)) for v in metrics.values())
