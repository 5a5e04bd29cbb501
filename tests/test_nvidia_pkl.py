"""NVIDIA legacy ``.pkl`` loading (gan/load.py `_load_nvidia_pickle`
cascade, replacing `maua/GAN/load.py:130-164`).

The fixture reproduces exactly what stylegan2-ada-pytorch's
`pickle.dump({'G_ema': ...})` emits: every nn.Module reduces through
`torch_utils.persistence._reconstruct_persistent_obj(meta)` where meta
is a dnnlib.EasyDict (a dict subclass) whose `state` is the module's
raw __dict__ — tensors inside `_parameters`/`_buffers`, submodules
inside `_modules`. Neither torch_utils nor dnnlib is importable at
load time, so the tolerant unpickler's stubbing + module-walk is the
code under test."""

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maua_tpu.gan import load as gload  # noqa: E402
from maua_tpu.gan import stylegan2 as sg2  # noqa: E402


# ----------------------------------------------------------- fixture build
def _ada_state_dict(cfg, seed=0):
    """Flat ADA-style torch state dict with the exact key/shape layout
    of NVIDIA checkpoints (inverse of params_from_state_dict)."""
    params = sg2.init_params(jax.random.PRNGKey(seed), cfg)
    sd = {}
    for i in range(cfg.mapping_layers):
        p = params["mapping"][f"fc{i}"]
        sd[f"mapping.fc{i}.weight"] = np.asarray(p["w"]).T
        sd[f"mapping.fc{i}.bias"] = np.asarray(p["b"])
    sd["mapping.w_avg"] = np.asarray(params["mapping"]["w_avg"])

    def put_conv(prefix, p):
        sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1))
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}.affine.weight"] = np.asarray(p["affine"]["w"]).T
        sd[f"{prefix}.affine.bias"] = np.asarray(p["affine"]["b"])
        sd[f"{prefix}.noise_const"] = np.asarray(p["noise_const"])
        sd[f"{prefix}.noise_strength"] = np.asarray(p["noise_strength"])

    for res in cfg.block_resolutions:
        b = params["synthesis"][f"b{res}"]
        if res == 4:
            sd["synthesis.b4.const"] = np.transpose(np.asarray(b["const"]), (2, 0, 1))
        else:
            put_conv(f"synthesis.b{res}.conv0", b["conv0"])
        put_conv(f"synthesis.b{res}.conv1", b["conv1"])
        if "torgb" in b:
            t = b["torgb"]
            sd[f"synthesis.b{res}.torgb.weight"] = np.transpose(np.asarray(t["weight"]), (3, 2, 0, 1))
            sd[f"synthesis.b{res}.torgb.bias"] = np.asarray(t["bias"])
            sd[f"synthesis.b{res}.torgb.affine.weight"] = np.asarray(t["affine"]["w"]).T
            sd[f"synthesis.b{res}.torgb.affine.bias"] = np.asarray(t["affine"]["b"])
    return params, sd


class _Node(torch.nn.Module):
    pass


def _module_tree(sd):
    """Flat state dict -> nn.Module tree (parameters/buffers land in
    _parameters/_buffers, submodules in _modules — the topology the
    persistence pickle preserves)."""
    root = _Node()
    for key, val in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            if p not in node._modules:
                node.add_module(p, _Node())
            node = node._modules[p]
        t = torch.from_numpy(np.array(val, copy=True))
        if "noise_const" in key or key.endswith("w_avg") or key.endswith("const"):
            node.register_buffer(parts[-1], t)
        else:
            setattr(node, parts[-1], torch.nn.Parameter(t))
    return root


def _fake_nvidia_modules():
    """dump-side stand-ins for torch_utils.persistence / dnnlib —
    removed from sys.modules before loading so the tolerant unpickler
    has to stub them."""
    tu = types.ModuleType("torch_utils")
    pers = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(meta):  # pragma: no cover - dump-side ref only
        raise AssertionError("must never run: load side stubs this symbol")

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    tu.persistence = pers

    dnnlib = types.ModuleType("dnnlib")

    class EasyDict(dict):
        def __getattr__(self, k):
            return self[k]

        def __setattr__(self, k, v):
            self[k] = v

    EasyDict.__module__ = "dnnlib"
    EasyDict.__qualname__ = "EasyDict"
    dnnlib.EasyDict = EasyDict
    return {"torch_utils": tu, "torch_utils.persistence": pers, "dnnlib": dnnlib}


class _AdaPickler(pickle.Pickler):
    """Reduces nn.Modules exactly like persistence.persistent_class:
    (_reconstruct_persistent_obj, (EasyDict(type, version, module_src,
    class_name, state=module __dict__),))."""

    def __init__(self, f, mods):
        super().__init__(f, protocol=4)
        self._mods = mods

    def reducer_override(self, obj):
        if isinstance(obj, torch.nn.Module):
            EasyDict = self._mods["dnnlib"].EasyDict
            meta = EasyDict(
                type="class", version=6, module_src="# source stripped",
                class_name=type(obj).__name__, state=dict(obj.__dict__),
            )
            return (self._mods["torch_utils.persistence"]._reconstruct_persistent_obj, (meta,))
        return NotImplemented


def _write_ada_pkl(path, sd):
    mods = _fake_nvidia_modules()
    sys.modules.update(mods)
    try:
        g = _module_tree(sd)
        with open(path, "wb") as f:
            _AdaPickler(f, mods).dump(
                {"G": g, "D": None, "G_ema": g, "training_set_kwargs": None, "augment_pipe": None}
            )
    finally:
        for name in mods:
            sys.modules.pop(name, None)


# ------------------------------------------------------------------- tests
CFG = sg2.SG2Config(img_resolution=32, channel_base=1024, channel_max=64, num_fp16_res=0)


def test_nvidia_pkl_loads_and_matches_direct_path(tmp_path):
    params_ref, sd = _ada_state_dict(CFG)
    path = str(tmp_path / "network-snapshot-000000.pkl")
    _write_ada_pkl(path, sd)
    assert "torch_utils" not in sys.modules  # load side must stub

    params, cfg = gload.load_network(path)
    assert cfg.img_resolution == CFG.img_resolution
    assert cfg.channel_max == CFG.channel_max

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params_ref))
    assert len(flat_a) == len(flat_b)
    for path_k, leaf in flat_a:
        ref = flat_b[path_k]
        assert np.allclose(np.asarray(leaf), np.asarray(ref), atol=1e-6), path_k


def test_nvidia_pkl_renders(tmp_path):
    _, sd = _ada_state_dict(CFG, seed=3)
    path = str(tmp_path / "g.pkl")
    _write_ada_pkl(path, sd)
    params, cfg = gload.load_network(path)
    ws = sg2.mapping(params, jax.random.normal(jax.random.PRNGKey(0), (2, cfg.z_dim)), cfg)
    img = np.asarray(sg2.synthesis(params, ws, cfg, noise_mode="const"))
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(img).all()


def test_nvidia_pkl_raw_walk_extracts_every_tensor(tmp_path):
    _, sd = _ada_state_dict(CFG, seed=1)
    path = str(tmp_path / "g.pkl")
    _write_ada_pkl(path, sd)
    raw = gload._load_nvidia_pickle(path)
    assert set(raw.keys()) == set(sd.keys())
    for k in sd:
        assert np.allclose(raw[k].detach().numpy(), sd[k]), k


def test_tf_style_variables_pickle(tmp_path):
    """Original TF stylegan2 pkls carry a dnnlib.tflib.Network whose
    __setstate__ state holds a `variables` list — the stub must accept
    it without crashing (payload lands under the stub's state)."""
    mods = _fake_nvidia_modules()
    tflib = types.ModuleType("dnnlib.tflib")

    class Network:
        pass

    Network.__module__ = "dnnlib.tflib"
    Network.__qualname__ = "Network"
    tflib.Network = Network
    mods["dnnlib"].tflib = tflib
    sys.modules.update(mods)
    sys.modules["dnnlib.tflib"] = tflib
    try:
        net = Network()
        net.__dict__.update(
            {"name": "G_ema", "static_kwargs": {}, "variables": [("w", np.zeros(3))]}
        )
        path = str(tmp_path / "tf.pkl")
        with open(path, "wb") as f:
            pickle.dump({"G_ema": net}, f, protocol=4)
    finally:
        for name in list(mods) + ["dnnlib.tflib"]:
            sys.modules.pop(name, None)
    raw = gload._load_nvidia_pickle(path)  # must not raise
    assert isinstance(raw, dict)
