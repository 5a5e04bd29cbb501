"""Checkpoint loading & conversion: torch StyleGAN formats -> pytree.

Mirrors the tolerant multi-format cascade of the reference
(`maua/GAN/load.py`: rosinality->ADA remap :18-127, NVIDIA pickle
:130-164, plain .pt :167-189, cascade :192-207), producing this
package's functional param pytrees instead of torch modules.

Supported formats:
* ADA-style flat state dicts: ``mapping.fc{i}.*``, ``synthesis.b{res}.*``
* inference-style ModuleList dicts: ``mapping.fcs.{i}.*``, ``synthesis.bs.{i}.*``
* rosinality StyleGAN2 dicts (``g_ema`` with ``style.*/convs.*/to_rgbs.*``)
* NVIDIA legacy ``.pkl`` (persistence-pickled) via a tolerant unpickler

torch (CPU) is used only host-side for deserialization.
"""

from __future__ import annotations

import io

import pickle
import re
from typing import Dict, Optional, Tuple

import numpy as np

from .stylegan2 import SG2Config


# ------------------------------------------------------- deserialization
def _torch():
    import torch

    return torch


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load any supported checkpoint file into a flat {key: ndarray}."""
    torch = _torch()
    if str(path).endswith(".pkl"):
        sd = _load_nvidia_pickle(path)
    else:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = _extract_state_dict(obj)
    return {k: _to_numpy(v) for k, v in sd.items() if _is_tensorlike(v)}


def _is_tensorlike(v):
    import torch

    return isinstance(v, (torch.Tensor, np.ndarray))


def _to_numpy(v) -> np.ndarray:
    import torch

    if isinstance(v, torch.Tensor):
        return v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def _extract_state_dict(obj):
    """Find the generator state dict inside assorted container formats."""
    import torch

    if isinstance(obj, dict):
        for key in ("G_ema", "g_ema", "generator", "G", "state_dict"):
            if key in obj:
                inner = obj[key]
                if hasattr(inner, "state_dict"):
                    return inner.state_dict()
                if isinstance(inner, dict):
                    sd = dict(inner)
                    if "latent_avg" in obj:
                        sd["latent_avg"] = obj["latent_avg"]
                    return sd
        return obj
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    raise ValueError("unrecognized checkpoint container")


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that resolves NVIDIA persistence / dnnlib classes to
    dummy containers so the tensor payload can be read without the
    original source tree (replacement for `GAN/load.py:130-164`).

    stylegan2-ada(-pytorch) pickles every network class through
    `torch_utils.persistence`: each module reduces to
    `_reconstruct_persistent_obj(meta)` where meta is a dnnlib.EasyDict
    carrying the class source plus `state` = the module's raw __dict__
    (so tensors sit in `_parameters`/`_buffers` and submodules in
    `_modules`). We resolve that reconstructor to one that rebuilds a
    plain attribute container from `state`, and every other missing
    class to a dict-subclass stub (EasyDict is a dict subclass, so its
    SETITEMS opcodes need a real dict underneath)."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            if name == "_reconstruct_persistent_obj":
                return _reconstruct_persistent_obj
            return _make_stub(module, name)


_STUB_CACHE: Dict[Tuple[str, str], type] = {}


def _make_stub(module, name):
    key = (module, name)
    if key not in _STUB_CACHE:

        class Stub(dict):
            _module, _name = module, name

            def __init__(self, *a, **kw):
                super().__init__()

            def __setstate__(self, state):
                self.__dict__.update(state if isinstance(state, dict) else {"state": state})

        Stub.__name__ = name
        _STUB_CACHE[key] = Stub
    return _STUB_CACHE[key]


def _reconstruct_persistent_obj(meta):
    """Stand-in for torch_utils.persistence._reconstruct_persistent_obj:
    rebuild an attribute container from the pickled module state
    (ignoring the embedded source code)."""
    obj = _make_stub("torch_utils.persistence", "PersistentObj")()
    state = None
    if isinstance(meta, dict):
        state = meta.get("state")
    if state is None and hasattr(meta, "__dict__"):
        state = meta.__dict__.get("state")
    if isinstance(state, dict):
        obj.__dict__.update(state)
    elif meta is not None:
        obj.__dict__["meta"] = meta
    return obj


def _load_nvidia_pickle(path: str, key: str = "G_ema"):
    """Extract tensors for one network (`key`) from an NVIDIA legacy .pkl."""
    torch = _torch()
    with open(path, "rb") as f:
        data = f.read()
    obj = _TolerantUnpickler(io.BytesIO(data)).load()
    g = obj.get(key, obj) if isinstance(obj, dict) else obj
    # persistence-pickled modules carry their tensors in nested dicts;
    # reconstructed torch modules keep nn.Module internals verbatim —
    # state_dict naming comes from _parameters/_buffers/_modules
    sd = {}

    def walk(prefix, node, depth=0):
        if depth > 64:
            return
        if isinstance(node, torch.Tensor):
            sd[prefix.rstrip(".")] = node
            return
        d = getattr(node, "__dict__", None) or {}
        for sub in ("_parameters", "_buffers"):
            for k, v in (d.get(sub) or {}).items():
                if isinstance(v, torch.Tensor) and isinstance(k, str):
                    sd[prefix + k] = v
        for k, v in (d.get("_modules") or {}).items():
            if v is not None and isinstance(k, str):
                walk(prefix + k + ".", v, depth + 1)
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(k, str) and not k.startswith("_"):
                    walk(prefix + k + ".", v, depth + 1)
        for k, v in d.items():
            if isinstance(k, str) and not k.startswith("_"):
                walk(prefix + k + ".", v, depth + 1)

    if hasattr(g, "state_dict"):
        return g.state_dict()
    walk("", g)
    return sd


# -------------------------------------------------------- key normalize
def _normalize_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map inference-style ModuleList keys (fcs.{i} / bs.{i}) onto
    ADA-style names (fc{i} / b{res})."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"mapping\.fcs\.(\d+)\.", lambda m: f"mapping.fc{m.group(1)}.", k)
        k = re.sub(r"synthesis\.bs\.(\d+)\.", lambda m: f"synthesis.b{2 ** (2 + int(m.group(1)))}.", k)
        out[k] = v
    return out


def is_rosinality(sd: Dict[str, np.ndarray]) -> bool:
    return any(k.startswith("convs.") for k in sd) and any(k.startswith("style.") for k in sd)


def rosinality_to_ada(sd: Dict[str, np.ndarray], blur_scale: float = 4.0) -> Dict[str, np.ndarray]:
    """Rosinality-format key remap (`GAN/load.py:18-127`)."""
    out = {}
    out["synthesis.b4.const"] = sd["input.input"].squeeze(0)
    out["synthesis.b4.conv1.noise_const"] = sd["noises.noise_0"].squeeze(0).squeeze(0)
    out["synthesis.b4.conv1.weight"] = sd["conv1.conv.weight"].squeeze(0)
    out["synthesis.b4.conv1.bias"] = sd["conv1.activate.bias"]
    out["synthesis.b4.conv1.affine.weight"] = sd["conv1.conv.modulation.weight"]
    out["synthesis.b4.conv1.affine.bias"] = sd["conv1.conv.modulation.bias"]
    out["synthesis.b4.conv1.noise_strength"] = sd["conv1.noise.weight"].squeeze(0)
    out["synthesis.b4.torgb.weight"] = sd["to_rgb1.conv.weight"].squeeze(0)
    out["synthesis.b4.torgb.bias"] = sd["to_rgb1.bias"].reshape(-1)
    out["synthesis.b4.torgb.affine.weight"] = sd["to_rgb1.conv.modulation.weight"]
    out["synthesis.b4.torgb.affine.bias"] = sd["to_rgb1.conv.modulation.bias"]

    for key, val in sd.items():
        if key.startswith("style."):
            _, num, wb = key.split(".")
            out[f"mapping.fc{int(num) - 1}.{wb}"] = val
        elif key.startswith("noises.") and key != "noises.noise_0":
            n = int(key.split("_")[1])
            r = 2 ** (3 + (n - 1) // 2)
            out[f"synthesis.b{r}.conv{(n - 1) % 2}.noise_const"] = val.squeeze(0).squeeze(0)
        elif key.startswith("convs."):
            n = int(key.split(".")[1])
            r = 2 ** (3 + n // 2)
            ros = ".".join(key.split(".")[2:])
            tgt = f"synthesis.b{r}.conv{n % 2}"
            if ros == "conv.weight":
                out[f"{tgt}.weight"] = val.squeeze(0)
            elif ros == "activate.bias":
                out[f"{tgt}.bias"] = val
            elif ros == "conv.modulation.weight":
                out[f"{tgt}.affine.weight"] = val
            elif ros == "conv.modulation.bias":
                out[f"{tgt}.affine.bias"] = val
            elif ros == "noise.weight":
                out[f"{tgt}.noise_strength"] = val.squeeze(0)
        elif key.startswith("to_rgbs."):
            n = int(key.split(".")[1])
            r = 2 ** (3 + n)
            ros = ".".join(key.split(".")[2:])
            tgt = f"synthesis.b{r}.torgb"
            if ros == "conv.weight":
                out[f"{tgt}.weight"] = val.squeeze(0)
            elif ros == "bias":
                out[f"{tgt}.bias"] = val.reshape(-1)
            elif ros == "conv.modulation.weight":
                out[f"{tgt}.affine.weight"] = val
            elif ros == "conv.modulation.bias":
                out[f"{tgt}.affine.bias"] = val
    if "latent_avg" in sd:
        out["mapping.w_avg"] = sd["latent_avg"]
    return out


# ------------------------------------------------------------- to pytree
def infer_config(sd: Dict[str, np.ndarray], dtype: str = "float32") -> SG2Config:
    """Derive an SG2Config from a normalized ADA-style state dict."""
    resolutions = set()
    for k in sd:
        m = re.match(r"synthesis\.b(\d+)\.", k)
        if m:
            resolutions.add(int(m.group(1)))
    img_resolution = max(resolutions)
    n_map = 1 + max(int(m.group(1)) for k in sd if (m := re.match(r"mapping\.fc(\d+)\.", k)))
    w_dim = sd["synthesis.b4.conv1.affine.weight"].shape[1]
    z_dim = sd["mapping.fc0.weight"].shape[1]
    img_channels = sd[f"synthesis.b{img_resolution}.torgb.bias"].shape[0]
    # channel table from conv weights
    c4 = sd["synthesis.b4.conv1.weight"].shape[0]
    channel_max = c4
    # find first res where channels < channel_max to recover channel_base
    channel_base = 32768
    for res in sorted(resolutions):
        co = sd[f"synthesis.b{res}.conv1.weight"].shape[0]
        if co < channel_max:
            channel_base = co * res
            break
    arch = "resnet" if any(".skip." in k for k in sd) else "skip"
    return SG2Config(
        z_dim=z_dim,
        c_dim=0,
        w_dim=w_dim,
        img_resolution=img_resolution,
        img_channels=img_channels,
        channel_base=channel_base,
        channel_max=channel_max,
        architecture=arch,
        mapping_layers=n_map,
        dtype=dtype,
    )


def params_from_state_dict(sd: Dict[str, np.ndarray], cfg: Optional[SG2Config] = None):
    """ADA-style state dict -> functional param pytree.

    Layout changes: FC (out,in)->(in,out); conv (co,ci,kh,kw)->HWIO;
    const (C,H,W)->(H,W,C). Missing noise_strength defaults to 1
    (the reference inference net adds noise unscaled,
    `inference/stylegan2.py:235-246`)."""
    import jax.numpy as jnp

    sd = _normalize_keys(sd)
    if cfg is None:
        cfg = infer_config(sd)

    def fc(prefix):
        return {
            "w": jnp.asarray(sd[f"{prefix}.weight"].T),
            "b": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    mapping = {}
    for i in range(cfg.mapping_layers):
        mapping[f"fc{i}"] = fc(f"mapping.fc{i}")
    if cfg.c_dim > 0:
        mapping["embed"] = fc("mapping.embed")
    mapping["w_avg"] = jnp.asarray(sd.get("mapping.w_avg", np.zeros(cfg.w_dim, np.float32)))

    def conv_layer(prefix, res):
        p = {
            "affine": fc(f"{prefix}.affine"),
            "weight": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }
        if f"{prefix}.noise_const" in sd:
            p["noise_const"] = jnp.asarray(sd[f"{prefix}.noise_const"])
        else:
            p["noise_const"] = jnp.zeros((res, res), jnp.float32)
        strength = sd.get(f"{prefix}.noise_strength", np.ones((), np.float32))
        p["noise_strength"] = jnp.asarray(np.asarray(strength).reshape(()))
        return p

    synthesis = {}
    for res in cfg.block_resolutions:
        b = f"synthesis.b{res}"
        block = {}
        if res == 4:
            block["const"] = jnp.asarray(np.transpose(sd[f"{b}.const"], (1, 2, 0)))
        else:
            block["conv0"] = conv_layer(f"{b}.conv0", res)
            if f"{b}.skip.weight" in sd:
                block["skip"] = {"weight": jnp.asarray(np.transpose(sd[f"{b}.skip.weight"], (2, 3, 1, 0)))}
        block["conv1"] = conv_layer(f"{b}.conv1", res)
        if f"{b}.torgb.weight" in sd:
            block["torgb"] = {
                "affine": fc(f"{b}.torgb.affine"),
                "weight": jnp.asarray(np.transpose(sd[f"{b}.torgb.weight"], (2, 3, 1, 0))),
                "bias": jnp.asarray(sd[f"{b}.torgb.bias"]),
            }
        synthesis[f"b{res}"] = block
    return {"mapping": mapping, "synthesis": synthesis}


def load_network(path: str, dtype: str = "float32"):
    """Cascading tolerant loader (`GAN/load.py:192-207`).

    Returns (params, cfg)."""
    sd = load_torch_file(path)
    if is_rosinality(sd):
        sd = rosinality_to_ada(sd)
    sd = _normalize_keys(sd)
    if is_stylegan3(sd):
        cfg = infer_sg3_config(sd, dtype=dtype)
        return sg3_params_from_state_dict(sd, cfg), cfg
    cfg = infer_config(sd, dtype=dtype)
    return params_from_state_dict(sd, cfg), cfg


# ------------------------------------------------------------- StyleGAN3


def is_stylegan3(sd: Dict[str, np.ndarray]) -> bool:
    """Alias-free checkpoints carry the Fourier input + L{i}_{size}_{ch}
    layer names (NVIDIA SG3 module naming)."""
    return any(k.startswith(("synthesis.input.", "input.")) for k in sd) and any(
        ".freqs" in k or k == "synthesis.input.freqs" for k in sd
    )


def infer_sg3_config(sd: Dict[str, np.ndarray], dtype: str = "float32"):
    """Infer SG3Config from an alias-free state dict. Layer names
    `synthesis.L{i}_{size}_{channels}` give the count and output
    resolution; kernel size distinguishes the -T (3x3) and -R (1x1)
    configs."""
    import re

    from .stylegan3 import SG3Config

    layers = {}
    for k in sd:
        m = re.match(r"synthesis\.L(\d+)_(\d+)_(\d+)\.weight$", k)
        if m:
            layers[int(m.group(1))] = (int(m.group(2)), int(m.group(3)), sd[k])
    if not layers:
        raise ValueError("no synthesis.L* layers found — not an SG3 state dict")
    n = max(layers) + 1
    img_resolution = layers[max(layers)][0]
    conv_kernel = layers[0][2].shape[-1]
    z_dim = sd["mapping.fc0.weight"].shape[1]
    w_dim = sd["mapping.fc0.weight"].shape[0]
    mapping_layers = len([k for k in sd if re.match(r"mapping\.fc\d+\.weight$", k)])
    cmax = max(v[1] for v in layers.values())
    observed = [layers[i][1] for i in sorted(layers)]
    observed_sizes = [layers[i][0] for i in sorted(layers)]
    # search (channel_base, margin_size) whose layer plan reproduces
    # BOTH the observed channel counts and canvas sizes encoded in the
    # layer names (the -T/-R configs differ in channels; margin_size
    # sets every intermediate canvas)
    for cb in (32768, 65536, 16384, 8192, 4096, 2048, 1024, 512):
        for margin in (10, 4, 6, 8, 12, 16, 2):
            cand = SG3Config(
                z_dim=z_dim, w_dim=w_dim, img_resolution=img_resolution, num_layers=n,
                mapping_layers=mapping_layers, conv_kernel=conv_kernel,
                channel_base=cb, channel_max=cmax, margin_size=margin, dtype=dtype,
            )
            _, _, _, _, sizes_p, chans_p = cand.layer_plan()
            if [int(c) for c in chans_p[1:]] == observed and [int(s) for s in sizes_p[1:]] == observed_sizes:
                return cand
    raise ValueError(
        f"could not infer SG3 channel_base for observed channels {observed}; "
        "pass an explicit SG3Config to sg3_params_from_state_dict"
    )


def sg3_params_from_state_dict(sd: Dict[str, np.ndarray], cfg=None):
    """Alias-free state dict -> functional SG3 pytree
    (`gan/stylegan3.py init_params` layout; NVIDIA names: mapping.fc*,
    synthesis.input.*, synthesis.L{i}_{size}_{ch}.*)."""
    import re

    import jax.numpy as jnp

    sd = _normalize_keys(sd)
    if cfg is None:
        cfg = infer_sg3_config(sd)

    def fc(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T), "b": jnp.asarray(sd[f"{prefix}.bias"])}

    mapping = {}
    for i in range(cfg.mapping_layers):
        mapping[f"fc{i}"] = fc(f"mapping.fc{i}")
    mapping["w_avg"] = jnp.asarray(sd.get("mapping.w_avg", np.zeros(cfg.w_dim, np.float32)))

    inp = sd
    input_p = {
        "freqs": jnp.asarray(inp["synthesis.input.freqs"]),
        "phases": jnp.asarray(inp["synthesis.input.phases"]),
        "affine": fc("synthesis.input.affine"),
        # NVIDIA stores the 1x1 mixing conv as (co, ci) RAW and divides
        # by sqrt(channels) at runtime; our forward applies no gain, so
        # bake the division in here (init_params pre-bakes it the same
        # way)
        "weight": jnp.asarray(inp["synthesis.input.weight"].T[None, None]
                              / np.sqrt(inp["synthesis.input.weight"].shape[1])),
        "transform": jnp.asarray(inp.get("synthesis.input.transform", np.eye(3, dtype=np.float32))),
    }

    names = {}
    for k in sd:
        m = re.match(r"synthesis\.(L(\d+)_\d+_\d+)\.weight$", k)
        if m:
            names[int(m.group(2))] = m.group(1)
    layers = []
    for i in range(cfg.num_layers):
        p = f"synthesis.{names[i]}"
        layers.append({
            "affine": fc(f"{p}.affine"),
            "weight": jnp.asarray(np.transpose(sd[f"{p}.weight"], (2, 3, 1, 0))),
            "bias": jnp.asarray(sd[f"{p}.bias"]),
            "magnitude_ema": jnp.asarray(np.asarray(sd.get(f"{p}.magnitude_ema", np.ones((), np.float32))).reshape(())),
        })
    return {"mapping": mapping, "input": input_p, "layers": layers}


# --------------------------------------------------------- discriminator


def infer_d_config(sd: Dict[str, np.ndarray], dtype: str = "float32"):
    """Infer a D2Config from an ADA-style discriminator state dict
    (shapes only; role of `GAN/load.py` config inference for D)."""
    from .discriminator import D2Config

    res_list = sorted(
        {int(m.group(1)) for k in sd for m in [re.match(r"b(\d+)\.conv0\.weight$", k)] if m}
    )
    if not res_list:
        raise ValueError("state dict has no b{res}.conv0 keys - not an ADA discriminator")
    top = max(res_list)
    ch_in = {res: sd[f"b{res}.conv0.weight"].shape[1] for res in res_list}  # OIHW in-ch
    c4 = sd["b4.fc.weight"].shape[0]
    cmax = max(max(ch_in.values()), c4)
    uncapped = [ch_in[r] * r for r in res_list if ch_in[r] < cmax]
    channel_base = max(uncapped) if uncapped else cmax * top
    mbstd_num = int(sd["b4.conv.weight"].shape[1] - c4)
    img_channels = int(sd[f"b{top}.fromrgb.weight"].shape[1]) if f"b{top}.fromrgb.weight" in sd else 3
    return D2Config(
        img_resolution=top,
        img_channels=img_channels,
        channel_base=int(channel_base),
        channel_max=int(cmax),
        mbstd_num_channels=mbstd_num,
        dtype=dtype,
    )


def d_params_from_state_dict(sd: Dict[str, np.ndarray], cfg=None):
    """ADA discriminator state dict -> maua_tpu functional params.

    OIHW conv weights transpose to HWIO; the b4 epilogue FC input is
    re-permuted from torch's (C, H, W) flatten order to our NHWC
    (H, W, C) flatten order. Raw (unscaled) weights map 1:1 because
    both sides apply the 1/sqrt(fan_in) equalized-lr gain at runtime.
    """
    import jax.numpy as jnp

    cfg = cfg or infer_d_config(sd)

    def conv_w(k):
        return jnp.asarray(np.transpose(np.asarray(sd[k]), (2, 3, 1, 0)))

    top = cfg.img_resolution
    params = {
        "fromrgb": {
            "weight": conv_w(f"b{top}.fromrgb.weight"),
            "bias": jnp.asarray(sd[f"b{top}.fromrgb.bias"]),
        }
    }
    for res in cfg.block_resolutions:
        params[f"b{res}"] = {
            "conv0": {"weight": conv_w(f"b{res}.conv0.weight"), "bias": jnp.asarray(sd[f"b{res}.conv0.bias"])},
            "conv1": {"weight": conv_w(f"b{res}.conv1.weight"), "bias": jnp.asarray(sd[f"b{res}.conv1.bias"])},
            "skip": {"weight": conv_w(f"b{res}.skip.weight")},
        }
    c4 = cfg.channels(4)
    fc_w = np.asarray(sd["b4.fc.weight"])  # (co, c4*16) flattened (C, H, W)
    co = fc_w.shape[0]
    fc_w = fc_w.reshape(co, c4, 4, 4).transpose(0, 2, 3, 1).reshape(co, -1).T  # -> (16*c4 HWC, co)
    params["b4"] = {
        "conv": {"weight": conv_w("b4.conv.weight"), "bias": jnp.asarray(sd["b4.conv.bias"])},
        "fc": {"w": jnp.asarray(fc_w), "b": jnp.asarray(sd["b4.fc.bias"])},
        "out": {"w": jnp.asarray(np.asarray(sd["b4.out.weight"]).T), "b": jnp.asarray(sd["b4.out.bias"])},
    }
    return params


def load_discriminator(path: str, dtype: str = "float32"):
    """Load the discriminator from a StyleGAN training checkpoint
    (NVIDIA .pkl 'D' entry, a .pt dict with a 'd'/'D'/'discriminator'
    entry, or a bare ADA D state dict). Role of the reference's D load
    for DDLS langevin sampling (`GAN/sampling/langevin.py:26-63`).

    Returns (params, D2Config)."""
    torch = _torch()
    if str(path).endswith(".pkl"):
        sd = _load_nvidia_pickle(path, key="D")
    else:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = None
        if isinstance(obj, dict):
            for key in ("D", "d", "discriminator", "D_ema"):
                if key in obj:
                    inner = obj[key]
                    sd = inner.state_dict() if hasattr(inner, "state_dict") else dict(inner)
                    break
            if sd is None:
                sd = obj  # maybe already a bare D state dict
        elif hasattr(obj, "state_dict"):
            sd = obj.state_dict()
        else:
            raise ValueError(f"no discriminator found in {path}")
    sd = {k: _to_numpy(v) for k, v in sd.items() if _is_tensorlike(v)}
    if not any(k.startswith("b4.out") for k in sd):
        raise ValueError(f"no ADA-style discriminator state dict found in {path}")
    cfg = infer_d_config(sd, dtype=dtype)
    return d_params_from_state_dict(sd, cfg), cfg
