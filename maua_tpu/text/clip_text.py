"""CLIP text encoder (ViT-L/14 text tower), functional JAX + BPE
tokenizer.

Replaces the reference's FrozenCLIPEmbedder conditioning path (inside
the stripped stable_diffusion submodule, reached via
`stable.py:133-148`). The BPE tokenizer loads the standard
`bpe_simple_vocab_16e6.txt.gz` merges file when available
(MAUA_CLIP_BPE env var or modelzoo/); otherwise it falls back to a
deterministic hash tokenizer so the pipeline stays runnable without
downloads (zero-egress environments).
"""

from __future__ import annotations

import dataclasses
import gzip
import html
import math
import os
from functools import lru_cache
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.models.unet import _linear, _norm_init, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    context_length: int = 77
    dtype: str = "float32"


# ------------------------------------------------------------ tokenizer
@lru_cache()
def bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _find_bpe_file() -> Optional[str]:
    cand = [
        os.environ.get("MAUA_CLIP_BPE", ""),
        "modelzoo/bpe_simple_vocab_16e6.txt.gz",
        os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
    ]
    for c in cand:
        if c and os.path.exists(c):
            return c
    return None


class BPETokenizer:
    """OpenAI CLIP byte-pair tokenizer (standard algorithm)."""

    def __init__(self, bpe_path: str):
        import regex as re  # stdlib-adjacent; falls back handled by caller

        self.re = re
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word[:-1], word[1:]))
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word[:-1], word[1:]))
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text.strip())).lower()
        bpe_tokens = []
        for token in self.re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens


class HashTokenizer:
    """Deterministic fallback when no BPE vocab file is present: words
    hash into the vocab range. NOT compatible with pretrained
    checkpoints — documented stand-in for offline testing."""

    def __init__(self, vocab_size: int = 49408):
        self.vocab_size = vocab_size

    def encode(self, text: str) -> List[int]:
        import hashlib

        out = []
        for word in text.lower().split():
            h = int(hashlib.blake2b(word.encode(), digest_size=4).hexdigest(), 16)
            out.append(h % (self.vocab_size - 2))
        return out


_TOKENIZER = None


def get_tokenizer():
    global _TOKENIZER
    if _TOKENIZER is None:
        path = _find_bpe_file()
        if path is not None:
            try:
                _TOKENIZER = BPETokenizer(path)
            except Exception:
                _TOKENIZER = HashTokenizer()
        else:
            _TOKENIZER = HashTokenizer()
    return _TOKENIZER


SOT, EOT = 49406, 49407


def tokenize(texts, context_length: int = 77) -> np.ndarray:
    """texts -> (N, context_length) int32 with SOT/EOT framing."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    out = np.zeros((len(texts), context_length), np.int32)
    out[:, :] = 0
    for i, text in enumerate(texts):
        ids = [SOT] + tok.encode(text)[: context_length - 2] + [EOT]
        out[i, : len(ids)] = ids
        out[i, len(ids):] = EOT  # CLIP pads with EOT? (HF pads with eot for SD)
    return out


# ---------------------------------------------------------------- model
def init_params(key, cfg: CLIPTextConfig = CLIPTextConfig()) -> Dict:
    keys = iter(jax.random.split(key, 8 + cfg.layers * 8))
    nk = lambda: next(keys)
    w = cfg.width
    p = {
        "token_embedding": jax.random.normal(nk(), (cfg.vocab_size, w)) * 0.02,
        "positional_embedding": jax.random.normal(nk(), (cfg.context_length, w)) * 0.01,
        "ln_final": _norm_init(w),
        "blocks": [],
    }
    for _ in range(cfg.layers):
        p["blocks"].append(
            {
                "ln1": _norm_init(w),
                "q": _linear(nk(), w, w),
                "k": _linear(nk(), w, w),
                "v": _linear(nk(), w, w),
                "out": _linear(nk(), w, w),
                "ln2": _norm_init(w),
                "fc1": _linear(nk(), w, w * 4),
                "fc2": _linear(nk(), w * 4, w),
            }
        )
    return p


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def encode_text(params: Dict, tokens: jax.Array, cfg: CLIPTextConfig = CLIPTextConfig()) -> jax.Array:
    """tokens (N, L) -> last hidden states (N, L, width) — the SD
    conditioning tensor (FrozenCLIPEmbedder semantics)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["positional_embedding"][: x.shape[1]].astype(dtype)
    L = x.shape[1]
    mask = jnp.tril(jnp.ones((L, L), bool))
    neg = jnp.asarray(-1e9, jnp.float32)

    for blk in params["blocks"]:
        h = layer_norm(blk["ln1"], x)
        q = linear(blk["q"], h)
        k = linear(blk["k"], h)
        v = linear(blk["v"], h)
        n, l, w = q.shape
        heads = cfg.heads
        hd = w // heads
        q = q.reshape(n, l, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, l, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, l, heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        logits = jnp.where(mask[None, None], logits, neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        att = jnp.einsum("nhqk,nhkd->nhqd", probs, v).transpose(0, 2, 1, 3).reshape(n, l, w)
        x = x + linear(blk["out"], att)
        h = layer_norm(blk["ln2"], x)
        x = x + linear(blk["fc2"], _quick_gelu(linear(blk["fc1"], h)))

    return layer_norm(params["ln_final"], x).astype(jnp.float32)
