"""BERT-style text encoder for GLID3XL conditioning.

Rebuild of the reference's `bert.encode([...])` conditioning path
(`maua/diffusion/processors/glid3xl.py:152-270`, whose `bert` is the
latent-diffusion BERTEmbedder: a WordPiece tokenizer + x-transformers
encoder producing a (B, 77, 1280) context). Components:

- `WordPieceTokenizer`: greedy longest-match-first WordPiece over a
  bert-base-uncased-style vocab.txt when available; with no vocab file
  (zero-egress env) a deterministic hash fallback keeps ids stable so
  the encoder remains testable offline.
- functional pre-LN transformer encoder (token emb + learned pos emb,
  self-attention + GELU FF blocks, final LN) — the BERTEmbedder
  architecture as jittable pytree functions.
- `params_from_torch`: converts the glid-3-xl / latent-diffusion
  bert checkpoint (x-transformers naming: `transformer.token_emb`,
  `transformer.pos_emb.emb`, `transformer.attn_layers.layers.{2i}.1.
  to_{q,k,v,out}`, `...{2i+1}.1.net...`, `transformer.norm`).
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BERTConfig:
    vocab_size: int = 30522
    max_len: int = 77
    width: int = 1280
    layers: int = 32
    heads: int = 8

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


# ------------------------------------------------------------ tokenizer
class WordPieceTokenizer:
    """Greedy WordPiece ('bert-base-uncased' style). Pass vocab_path
    to a vocab.txt for real checkpoints; otherwise token ids come from
    a stable hash into the vocab (offline-runnable, not
    checkpoint-faithful — documented fallback)."""

    PAD, UNK, CLS, SEP = 0, 100, 101, 102

    def __init__(self, vocab_path: Optional[str] = None, vocab_size: int = 30522):
        self.vocab: Optional[Dict[str, int]] = None
        self.vocab_size = vocab_size
        if vocab_path is not None:
            with open(vocab_path) as f:
                self.vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
            self.vocab_size = len(self.vocab)

    def _basic(self, text: str) -> List[str]:
        text = text.lower().strip()
        return re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text)

    def _wordpiece(self, word: str) -> List[str]:
        if self.vocab is None:
            return [word]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return ["[UNK]"]
            pieces.append(piece)
            start = end
        return pieces

    def _id(self, token: str) -> int:
        if self.vocab is not None:
            return self.vocab.get(token, self.UNK)
        h = int(hashlib.md5(token.encode()).hexdigest()[:8], 16)
        return 999 + h % (self.vocab_size - 1000)

    def __call__(self, text: str, max_len: int = 77) -> np.ndarray:
        toks = [self.CLS]
        for word in self._basic(text):
            toks.extend(self._id(p) for p in self._wordpiece(word))
        toks = toks[: max_len - 1] + [self.SEP]
        out = np.full(max_len, self.PAD, np.int32)
        out[: len(toks)] = toks
        return out


# ------------------------------------------------------------- encoder
def init_params(key, cfg: BERTConfig) -> Dict:
    keys = iter(jax.random.split(key, 8 + cfg.layers * 8))
    nk = lambda: next(keys)
    w = cfg.width
    p = {
        "token_emb": jax.random.normal(nk(), (cfg.vocab_size, w)) * 0.02,
        "pos_emb": jax.random.normal(nk(), (cfg.max_len, w)) * 0.01,
        "norm": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "blocks": [],
    }
    for _ in range(cfg.layers):
        p["blocks"].append({
            "ln1": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "q": {"w": jax.random.normal(nk(), (w, w)) / math.sqrt(w)},
            "k": {"w": jax.random.normal(nk(), (w, w)) / math.sqrt(w)},
            "v": {"w": jax.random.normal(nk(), (w, w)) / math.sqrt(w)},
            "out": {"w": jax.random.normal(nk(), (w, w)) / math.sqrt(w), "b": jnp.zeros((w,))},
            "ln2": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "fc1": {"w": jax.random.normal(nk(), (w, 4 * w)) / math.sqrt(w), "b": jnp.zeros((4 * w,))},
            "fc2": {"w": jax.random.normal(nk(), (4 * w, w)) / math.sqrt(4 * w), "b": jnp.zeros((w,))},
        })
    return p


def params_from_torch(sd, cfg: BERTConfig) -> Dict:
    """x-transformers TransformerWrapper state dict -> params. Handles
    the glid-3-xl bert.pt layout; FF first-linear key may be
    `net.0.proj` (GLU-less) or `net.0.0` depending on version."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    pre = "transformer." if any(k.startswith("transformer.") for k in sd) else ""

    def t(name):
        return jnp.asarray(sd[pre + name].T)

    def v(name):
        return jnp.asarray(sd[pre + name])

    def ln(name):
        return {"scale": v(f"{name}.weight"), "bias": v(f"{name}.bias")}

    p = {
        "token_emb": v("token_emb.weight"),
        "pos_emb": v("pos_emb.emb.weight")[: cfg.max_len],
        "norm": ln("norm"),
        "blocks": [],
    }
    for i in range(cfg.layers):
        a = f"attn_layers.layers.{2 * i}"
        f = f"attn_layers.layers.{2 * i + 1}"
        ff1 = None
        for cand in (f"{f}.1.net.0.proj", f"{f}.1.net.0.0", f"{f}.1.net.0"):
            if pre + cand + ".weight" in sd:
                ff1 = cand
                break
        if ff1 is None:
            raise KeyError(f"no FF input linear found for layer {i}")
        p["blocks"].append({
            "ln1": ln(f"{a}.0"),
            "q": {"w": t(f"{a}.1.to_q.weight")},
            "k": {"w": t(f"{a}.1.to_k.weight")},
            "v": {"w": t(f"{a}.1.to_v.weight")},
            "out": {"w": t(f"{a}.1.to_out.weight"), "b": v(f"{a}.1.to_out.bias")},
            "ln2": ln(f"{f}.0"),
            "fc1": {"w": t(f"{ff1}.weight"), "b": v(f"{ff1}.bias")},
            "fc2": {"w": t(f"{f}.1.net.2.weight"), "b": v(f"{f}.1.net.2.bias")},
        })
    return p


def _ln(p, x):
    xf = x.astype(jnp.float32)
    out = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + 1e-5)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def encode(params: Dict, tokens: jax.Array, cfg: BERTConfig) -> jax.Array:
    """tokens (B, max_len) -> context (B, max_len, width) — the
    `bert.encode` role (`glid3xl.py:243-246`)."""
    b, t = tokens.shape
    x = params["token_emb"][tokens] + params["pos_emb"][None, :t]
    for blk in params["blocks"]:
        h = _ln(blk["ln1"], x)
        q = (h @ blk["q"]["w"]).reshape(b, t, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = (h @ blk["k"]["w"]).reshape(b, t, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = (h @ blk["v"]["w"]).reshape(b, t, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(cfg.head_dim)
        att = jax.nn.softmax(att, -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(b, t, cfg.width)
        x = x + o @ blk["out"]["w"] + blk["out"]["b"]
        h = _ln(blk["ln2"], x)
        # exact (erf) GELU to match torch's default
        x = x + jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"], approximate=False) @ blk["fc2"]["w"] + blk["fc2"]["b"]
    return _ln(params["norm"], x)


class BERTEmbedder:
    """Tokenizer + encoder bundle (the LDM BERTEmbedder role)."""

    def __init__(self, cfg: Optional[BERTConfig] = None, params: Optional[Dict] = None,
                 vocab_path: Optional[str] = None, checkpoint: Optional[str] = None, key=None):
        self.cfg = cfg or BERTConfig()
        self.tokenizer = WordPieceTokenizer(vocab_path, self.cfg.vocab_size)
        if params is None and checkpoint is not None:
            import torch

            sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            params = params_from_torch({k: vv.numpy() for k, vv in sd.items()}, self.cfg)
        if params is None:
            params = init_params(key if key is not None else jax.random.PRNGKey(0), self.cfg)
        self.params = params
        self._encode = jax.jit(lambda p, toks: encode(p, toks, self.cfg))

    def __call__(self, texts: Sequence[str]) -> jax.Array:
        toks = jnp.asarray(np.stack([self.tokenizer(t, self.cfg.max_len) for t in texts]))
        return self._encode(self.params, toks)
