"""Autoregressive token transformer for text-to-image/video.

TPU-native stand-in for the reference's autoregressive wrappers
(`maua/autoregressive/`, SURVEY.md 2.11): ru-dalle / minDALLE /
CogVideo all wrap decoder-only transformers over VQ token grids (the
actual nets live in stripped submodules). This module provides the
shared machinery: a functional GPT-style decoder with 2D (row/col)
positional structure, KV-cached `lax.scan` sampling with
top-k/top-p/temperature, and tensor-parallel-friendly weight layouts
(attention heads and MLP features shard on the mesh `tensor` axis —
the pjit replacement for CogVideo's megatron TP,
`cog/video/generate.py:1250-1253`).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp



@dataclasses.dataclass(frozen=True)
class ARConfig:
    vocab_size: int = 8192  # image token codebook
    text_vocab_size: int = 16384
    text_length: int = 64
    image_rows: int = 16
    image_cols: int = 16
    width: int = 256
    layers: int = 4
    heads: int = 8
    dtype: str = "float32"
    max_frames: int = 8  # temporal positions for video token grids

    @property
    def image_length(self) -> int:
        return self.image_rows * self.image_cols

    @property
    def total_length(self) -> int:
        return self.text_length + self.image_length

    @property
    def total_vocab(self) -> int:
        return self.text_vocab_size + self.vocab_size


def init_params(key, cfg: ARConfig) -> Dict:
    keys = iter(jax.random.split(key, 16 + cfg.layers * 8))
    nk = lambda: next(keys)
    w = cfg.width
    p = {
        "tok_emb": jax.random.normal(nk(), (cfg.total_vocab, w)) * 0.02,
        "pos_emb": jax.random.normal(nk(), (cfg.total_length, w)) * 0.01,
        "row_emb": jax.random.normal(nk(), (cfg.image_rows, w)) * 0.01,
        "col_emb": jax.random.normal(nk(), (cfg.image_cols, w)) * 0.01,
        # temporal position of each video frame's token grid — the pjit
        # analog of CogVideo's per-frame position-id blocks
        # (`cog/video/infinite.py:68-77`)
        "frame_emb": jax.random.normal(nk(), (cfg.max_frames, w)) * 0.01,
        "ln_f": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "head": {"w": jax.random.normal(nk(), (w, cfg.total_vocab)) * 0.02},
        "blocks": [],
    }
    for _ in range(cfg.layers):
        p["blocks"].append({
            "ln1": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "qkv": {"w": jax.random.normal(nk(), (w, 3 * w)) * (1 / math.sqrt(w)), "b": jnp.zeros((3 * w,))},
            "proj": {"w": jax.random.normal(nk(), (w, w)) * (1 / math.sqrt(w)), "b": jnp.zeros((w,))},
            "ln2": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "fc1": {"w": jax.random.normal(nk(), (w, 4 * w)) * (1 / math.sqrt(w)), "b": jnp.zeros((4 * w,))},
            "fc2": {"w": jax.random.normal(nk(), (4 * w, w)) * (1 / math.sqrt(4 * w)), "b": jnp.zeros((w,))},
        })
    return p


def _ln(p, x):
    xf = x.astype(jnp.float32)
    out = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + 1e-5)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _positions(cfg: ARConfig, idx: jax.Array) -> jax.Array:
    """Combined position embedding lookup supporting the 2D image
    grid (ru-dalle style row/col factorization)."""
    return idx  # raw index; embedding composed in forward


def position_table(params: Dict, cfg: ARConfig, t: int, frame_ids: Optional[jax.Array] = None) -> jax.Array:
    """(T, width) positional embedding per global position — text
    absolute positions, image positions as (frame_emb +) row/col grid
    embeddings. Shared by the full forward and the KV-cached sampler."""
    if frame_ids is None:
        pos = params["pos_emb"][:t]
        img_idx = jnp.arange(t) - cfg.text_length
        in_img = img_idx >= 0
        rows = jnp.clip(img_idx // cfg.image_cols, 0, cfg.image_rows - 1)
        cols = jnp.clip(img_idx % cfg.image_cols, 0, cfg.image_cols - 1)
        return pos + jnp.where(in_img[:, None], params["row_emb"][rows] + params["col_emb"][cols], 0.0)
    frame_ids = jnp.asarray(frame_ids)
    in_img = frame_ids >= 0
    # in-frame offset: position within this frame's token grid
    img_pos = jnp.cumsum(in_img) - 1
    off = jnp.where(in_img, img_pos % cfg.image_length, 0)
    rows = jnp.clip(off // cfg.image_cols, 0, cfg.image_rows - 1)
    cols = jnp.clip(off % cfg.image_cols, 0, cfg.image_cols - 1)
    fe = params["frame_emb"][jnp.clip(frame_ids, 0, cfg.max_frames - 1)]
    text_pos = jnp.clip(jnp.arange(t), 0, cfg.text_length - 1)
    return jnp.where(
        in_img[:, None],
        fe + params["row_emb"][rows] + params["col_emb"][cols],
        params["pos_emb"][text_pos],
    )


def transformer_block(blk: Dict, x: jax.Array, cfg: ARConfig, mask: jax.Array) -> jax.Array:
    """One pre-LN causal block (attention + MLP) on x (B, T, width).

    Module-level so the pipeline-parallel path
    (`parallel/pipeline.py`) can stack per-stage block params and apply
    the identical computation per stage."""
    b, t = x.shape[:2]
    neg = jnp.asarray(-1e9, jnp.float32)
    h = _ln(blk["ln1"], x)
    qkv = h @ blk["qkv"]["w"] + blk["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = cfg.width // cfg.heads
    q = q.reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
    logits = jnp.where(mask[None, None], logits, neg)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    att = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, t, cfg.width)
    x = x + att @ blk["proj"]["w"] + blk["proj"]["b"]
    h = _ln(blk["ln2"], x)
    return x + jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"]) @ blk["fc2"]["w"] + blk["fc2"]["b"]


def forward(
    params: Dict,
    tokens: jax.Array,  # (B, T)
    cfg: ARConfig,
    mask: Optional[jax.Array] = None,  # (T, T) attention mask override
    frame_ids: Optional[jax.Array] = None,  # (T,) temporal frame per position, -1 = text
    remat: bool = False,  # gradient-checkpoint each block (finetuning)
) -> jax.Array:
    """Full-sequence logits (training / scoring path).

    `frame_ids` gives each position's temporal frame for multi-frame
    video sequences (text positions are -1): image positions are then
    embedded as frame_emb[f] + row/col within the frame's grid — the
    role of CogVideo's per-frame position-id blocks
    (`cog/video/generate.py:43-61`, `infinite.py:68-77`), which is what
    lets stage 2 present keyframes at temporal slots 0/2/4 and generate
    slots 1/3 in between."""
    b, t = tokens.shape
    x = params["tok_emb"][tokens] + position_table(params, cfg, t, frame_ids)[None]

    if mask is None:
        mask = jnp.tril(jnp.ones((t, t), bool))

    def block(blk, x):
        return transformer_block(blk, x, cfg, mask)

    if remat:
        # rematerialize each block's activations on the backward pass —
        # the jax.checkpoint analog of the reference's
        # checkpoint_sequential (`ru_dalle/finetune.py:259-261`)
        block = jax.checkpoint(block)
    for blk in params["blocks"]:
        x = block(blk, x)

    x = _ln(params["ln_f"], x)
    return x @ params["head"]["w"]


def kv_prefill(params: Dict, cfg: ARConfig, x: jax.Array, total: int):
    """Run the causal blocks over an embedded prefix x (B, n, width) in
    ONE pass, returning per-block K/V caches padded to `total`
    positions — the CogVideo mems-buffer role (`generate.py:117-151`).
    Shared by every cached sampler (`generate_tokens`,
    `video.filling_sequence`)."""
    b, n = x.shape[:2]
    heads, hd = cfg.heads, cfg.width // cfg.heads
    caches = []
    mask = jnp.tril(jnp.ones((n, n), bool))
    neg = jnp.asarray(-1e9, jnp.float32)
    for blk in params["blocks"]:
        h = _ln(blk["ln1"], x)
        qkv = h @ blk["qkv"]["w"] + blk["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        kh = k.reshape(b, n, heads, hd)
        vh = v.reshape(b, n, heads, hd)
        ck = jnp.zeros((b, total, heads, hd), x.dtype).at[:, :n].set(kh)
        cv = jnp.zeros((b, total, heads, hd), x.dtype).at[:, :n].set(vh)
        caches.append((ck, cv))
        qh = q.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
        lg = jnp.einsum("bhqd,bhkd->bhqk", qh, kh.transpose(0, 2, 1, 3),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
        lg = jnp.where(mask[None, None], lg, neg)
        probs = jax.nn.softmax(lg, -1).astype(x.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, vh.transpose(0, 2, 1, 3))
        att = att.transpose(0, 2, 1, 3).reshape(b, n, cfg.width)
        x = x + att @ blk["proj"]["w"] + blk["proj"]["b"]
        h = _ln(blk["ln2"], x)
        x = x + jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"]) @ blk["fc2"]["w"] + blk["fc2"]["b"]
    return caches


def kv_step(params: Dict, cfg: ARConfig, x: jax.Array, p, caches, total: int):
    """One cached decode step: x (B, width) is the embedded input at
    (traced) position p; each cache gains position p and attention
    reads one O(total) row. Returns (vocab logits, new caches)."""
    b = x.shape[0]
    heads, hd = cfg.heads, cfg.width // cfg.heads
    new_caches = []
    attend = (jnp.arange(total) <= p)[None, None, None, :]
    for blk, (ck, cv) in zip(params["blocks"], caches):
        h = _ln(blk["ln1"], x)
        qkv = h @ blk["qkv"]["w"] + blk["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ck = jax.lax.dynamic_update_slice(ck, k.reshape(b, 1, heads, hd), (0, p, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.reshape(b, 1, heads, hd), (0, p, 0, 0))
        new_caches.append((ck, cv))
        qh = q.reshape(b, heads, 1, hd)
        lg = jnp.einsum("bhqd,bhkd->bhqk", qh, ck.transpose(0, 2, 1, 3),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
        lg = jnp.where(attend, lg, -1e9)
        probs = jax.nn.softmax(lg, -1).astype(x.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, cv.transpose(0, 2, 1, 3)).reshape(b, cfg.width)
        x = x + att @ blk["proj"]["w"] + blk["proj"]["b"]
        h = _ln(blk["ln2"], x)
        x = x + jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"]) @ blk["fc2"]["w"] + blk["fc2"]["b"]
    return _ln(params["ln_f"], x) @ params["head"]["w"], new_caches


def _sample_logits(key, logits, temperature=1.0, top_k=0, top_p=0.0):
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, -1)
        cum = jnp.cumsum(probs, -1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate_tokens(
    params: Dict,
    text_tokens: jax.Array,  # (B, text_length)
    cfg: ARConfig,
    key,
    temperature: float = 1.0,
    top_k: int = 64,
    top_p: float = 0.0,
    n_image_tokens: Optional[int] = None,
    forced_tokens: Optional[jax.Array] = None,  # (B, n_img) image-vocab ids
    forced_mask: Optional[jax.Array] = None,  # (n_img,) bool: teacher-force
    cached: bool = True,
) -> jax.Array:
    """Sample image tokens autoregressively via lax.scan (the hot loop
    of ru-dalle/minDALLE generation, `ru_dalle/generate.py:41-121`).

    `forced_tokens`/`forced_mask` teacher-force known positions (the
    oversampled-decode overlap columns, `ru_dalle/generate.py:124-172`
    attention-mask role): forced positions keep their given token but
    still condition every later sample.

    The default KV-cached path prefills the text prefix once and pays
    one O(T)-attention step per token; cached=False recomputes the
    prefix per token (same tokens for the same key, O(T) more FLOPs)."""
    fn = _generate_kv if cached else _generate_scan
    return fn(params, text_tokens, cfg, key, temperature, top_k, top_p,
              n_image_tokens, forced_tokens, forced_mask)


@partial(jax.jit, static_argnames=("cfg", "temperature", "top_k", "top_p", "n_image_tokens"))
def _generate_kv(
    params: Dict,
    text_tokens: jax.Array,
    cfg: ARConfig,
    key,
    temperature: float = 1.0,
    top_k: int = 64,
    top_p: float = 0.0,
    n_image_tokens: Optional[int] = None,
    forced_tokens: Optional[jax.Array] = None,
    forced_mask: Optional[jax.Array] = None,
) -> jax.Array:
    n_img = n_image_tokens or cfg.image_length
    b = text_tokens.shape[0]
    total = cfg.text_length + n_img
    pos_tab = position_table(params, cfg, total)
    x0 = params["tok_emb"][text_tokens[:, : cfg.text_length - 1].astype(jnp.int32)]
    caches = kv_prefill(params, cfg, x0 + pos_tab[None, : cfg.text_length - 1], total)
    tokens0 = jnp.concatenate([text_tokens.astype(jnp.int32), jnp.zeros((b, n_img), jnp.int32)], axis=1)

    def step(carry, i):
        tokens, caches, k = carry
        k, sub = jax.random.split(k)
        p = cfg.text_length + i  # position being sampled
        prev = jnp.take(tokens, p - 1, axis=1)
        x = params["tok_emb"][prev] + pos_tab[p - 1]
        logits, caches = kv_step(params, cfg, x, p - 1, caches, total)
        nxt = _sample_logits(sub, logits[:, cfg.text_vocab_size:], temperature, top_k, top_p) + cfg.text_vocab_size
        if forced_tokens is not None and forced_mask is not None:
            nxt = jnp.where(forced_mask[i], forced_tokens[:, i] + cfg.text_vocab_size, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None].astype(jnp.int32), (0, p))
        return (tokens, caches, k), None

    (tokens, _, _), _ = jax.lax.scan(step, (tokens0, caches, key), jnp.arange(n_img))
    return tokens[:, cfg.text_length:] - cfg.text_vocab_size


@partial(jax.jit, static_argnames=("cfg", "temperature", "top_k", "top_p", "n_image_tokens"))
def _generate_scan(
    params: Dict,
    text_tokens: jax.Array,
    cfg: ARConfig,
    key,
    temperature: float = 1.0,
    top_k: int = 64,
    top_p: float = 0.0,
    n_image_tokens: Optional[int] = None,
    forced_tokens: Optional[jax.Array] = None,
    forced_mask: Optional[jax.Array] = None,
) -> jax.Array:
    n_img = n_image_tokens or cfg.image_length
    b = text_tokens.shape[0]
    total = cfg.text_length + n_img
    tokens0 = jnp.concatenate(
        [text_tokens, jnp.zeros((b, n_img), jnp.int32)], axis=1
    )

    def step(carry, i):
        tokens, k = carry
        k, sub = jax.random.split(k)
        logits = forward(params, tokens, cfg)
        step_logits = logits[:, cfg.text_length + i - 1, cfg.text_vocab_size:]
        nxt = _sample_logits(sub, step_logits, temperature, top_k, top_p) + cfg.text_vocab_size
        if forced_tokens is not None and forced_mask is not None:
            nxt = jnp.where(forced_mask[i], forced_tokens[:, i] + cfg.text_vocab_size, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None].astype(jnp.int32),
                                              (0, cfg.text_length + i))
        return (tokens, k), None

    (tokens, _), _ = jax.lax.scan(step, (tokens0, key), jnp.arange(n_img))
    return tokens[:, cfg.text_length:] - cfg.text_vocab_size


def tp_shardings(params: Dict, mesh):
    """NamedShardings for tensor parallelism: attention heads and MLP
    features shard on `tensor` (the pjit replacement for CogVideo's
    megatron mpu TP, SURVEY 2.14)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec(path_leaf):
        path, leaf = path_leaf
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "qkv" in names or "fc1" in names or "head" in names:
            return NamedSharding(mesh, P(None, "tensor"))
        if "proj" in names or "fc2" in names:
            return NamedSharding(mesh, P("tensor", None))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [spec(pl) if pl[1].ndim == 2 else NamedSharding(mesh, P()) for pl in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)
