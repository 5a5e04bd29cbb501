"""Shared utilities: downloads, seeding, prompt parsing, tensor stats.

Re-designed equivalent of the reference's `maua/utility.py` (download
:68-85, fetch :88-91, seed_everything :57-61, parse_prompt :109-116,
info :14-54). Uses urllib instead of requests so the package has no
hard dependency beyond the baked-in stack.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import random
import shutil
import tarfile
import urllib.request
import zipfile

import numpy as np

MODELZOO = os.environ.get("MAUA_MODELZOO", os.path.join(os.getcwd(), "modelzoo"))
WORKSPACE = os.environ.get("MAUA_WORKSPACE", os.path.join(os.getcwd(), "workspace"))


def name(s: str) -> str:
    """Basename without extension (reference maua/utility.py:64-65)."""
    return s.split("/")[-1].split(".")[0]


def info(x, y=None, label=None):
    """Print min/mean/max/shape stats of one or two arrays."""
    x = np.asarray(x)
    parts = [] if label is None else [label]
    parts += [f"{x.min():.2f}", f"{float(x.mean()):.2f}", f"{x.max():.2f}", tuple(x.shape)]
    if y is not None:
        y = np.asarray(y)
        parts += [f"{y.min():.2f}", f"{float(y.mean()):.2f}", f"{y.max():.2f}", tuple(y.shape)]
    print(*parts)


def seed_everything(seed: int):
    """Seed python + numpy. Device randomness in JAX is explicit via
    jax.random keys; use `rng(seed)` for those."""
    random.seed(seed)
    np.random.seed(seed)


def rng(seed: int):
    import jax

    return jax.random.PRNGKey(seed)


def download(url: str, filename: str, timeout: float = 60.0) -> pathlib.Path:
    """HTTP download with progress (reference maua/utility.py:68-85)."""
    from tqdm.auto import tqdm

    path = pathlib.Path(filename).expanduser().resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    req = urllib.request.Request(
        url, headers={"User-Agent": "maua-tpu", "From": "https://github.com/maua-maua-maua/maua"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        total = int(r.headers.get("Content-Length", 0))
        desc = f"Downloading {filename}" + (" (unknown size)" if total == 0 else "")
        with tqdm.wrapattr(r, "read", total=total, desc=desc) as src, path.open("wb") as f:
            shutil.copyfileobj(src, f)
    return path


def fetch(path_or_url: str):
    """Open a local file or stream a URL (reference maua/utility.py:88-91)."""
    if not (path_or_url.startswith("http://") or path_or_url.startswith("https://")):
        return open(path_or_url, "rb")
    req = urllib.request.Request(path_or_url, headers={"User-Agent": "maua-tpu"})
    return urllib.request.urlopen(req)


def unzip(file: str, path: str):
    if file.endswith("tar.gz"):
        with tarfile.open(file, "r:gz") as tar:
            tar.extractall(path)
    elif file.endswith("tar"):
        with tarfile.open(file, "r:") as tar:
            tar.extractall(path)
    elif file.endswith("zip"):
        with zipfile.ZipFile(file) as zf:
            zf.extractall(path)


def parse_prompt(prompt: str):
    """Split ``"text:weight"`` (URL-aware) into (text, weight).

    Same contract as reference maua/utility.py:109-116."""
    if prompt.startswith("http://") or prompt.startswith("https://"):
        vals = prompt.rsplit(":", 2)
        vals = [vals[0] + ":" + vals[1], *vals[2:]]
    else:
        vals = prompt.rsplit(":", 1)
    vals = vals + ["", "1"][len(vals) :]
    return vals[0], float(vals[1])


def content_hash(*arrays, length: int = 16) -> str:
    """Stable content hash of arrays/strings for cache keys
    (equivalent of reference maua/ops/io.py:86-102)."""
    h = hashlib.blake2b(digest_size=length)
    for a in arrays:
        if isinstance(a, (str, bytes)):
            h.update(a.encode() if isinstance(a, str) else a)
        else:
            arr = np.asarray(a)
            h.update(str(arr.shape).encode())
            h.update(str(arr.dtype).encode())
            h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def parse_kwarg_list(items) -> dict:
    """Parse CLI kwarg lists into a dict. Accepts the reference's
    `key type value` triplets (`maua/style/image.py:121-135`, with a
    type-name whitelist instead of eval) and plain `key=value` pairs
    (values parsed as python literals when possible)."""
    import ast

    items = list(items or [])
    if not items:
        return {}
    if all("=" in it for it in items):
        out = {}
        for it in items:
            k, v = it.split("=", 1)
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
        return out
    if len(items) % 3 != 0:
        raise ValueError(f"kwarg list must be key=value pairs or 'key type value' triplets, got {items}")
    casts = {"str": str, "int": int, "float": float, "bool": lambda v: v.lower() not in ("false", "0", "")}
    out = {}
    for k, t, v in zip(items[::3], items[1::3], items[2::3]):
        if t not in casts:
            raise ValueError(f"unsupported kwarg type {t!r} (one of {sorted(casts)})")
        out[k] = casts[t](v)
    return out


def enable_compilation_cache(cache_dir=None) -> bool:
    """Persist XLA compilations across processes.

    Big-model jit compiles take minutes (SG3 1024 and the SD UNet run
    5-10 min on a 1-core TPU-VM host) and by default die with the
    process; the persistent cache turns warm restarts into seconds.
    Opt-in: set MAUA_COMPILE_CACHE=<dir> (the CLI entrypoint calls
    this automatically) or call directly. Returns False (no-op) when
    disabled or when the backend can't serialize executables — on CPU
    the AOT cache is host-machine-feature sensitive, which is why this
    is not default-on.
    """
    cache_dir = cache_dir or os.environ.get("MAUA_COMPILE_CACHE")
    if not cache_dir or str(cache_dir).strip().lower() in ("0", "false", "off", "no"):
        return False
    # boolean-style opt-in ("1", "true", ...) means "enable at the
    # default location", not "use ./1 as the cache directory"
    if str(cache_dir).strip().lower() in ("1", "true", "on", "yes"):
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "maua_tpu", "xla")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(str(cache_dir)))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception as e:  # backend without serialization support
        print(f"compilation cache unavailable ({e})")
        return False
