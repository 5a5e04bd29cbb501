"""CogVideo-grade autoregressive text-to-video: sequence-filling
sampler, two-stage (generate -> dyadic interpolate) pipeline, rolling
token window, and VQ decode to pixels.

Rebuild of the CogVideo first-party logic:
- `my_filling_sequence` (`cog/video/generate.py:182-547`): a sequence
  with -1 holes is filled left-to-right; given positions (text, BOI
  markers, conditioning frames) are teacher-forced, holes are sampled;
  an optional "guider" sequence with generic text runs in parallel and
  token-level CFG mixes `guider + (logits - guider) * alpha`
  (:488-491); frame-start inputs are replaced by <start_of_image>
  (:238-241, :529-535); the first frame uses a different sampling
  strategy than later frames (:492-495).
- stage 1 `process_stage1` (:548-731): text -> sequential keyframes.
- stage 2 `process_stage2` (:733-905): keyframe triples are presented
  at temporal slots 0/2/4 and the model fills slots 1/3; merged in
  temporal order, the frame rate doubles per round (duration /= 2).
- rolling window (`infinite.py:80-116`): past-frame conditioning is a
  sliding window of real frame token grids.
- megatron TP (`generate.py:1250-1253`) becomes pjit NamedShardings
  from `transformer.tp_shardings` over the mesh `tensor` axis.

Conditioning frames enter the context as IMAGE token embeddings with
temporal frame embeddings (`transformer.forward(frame_ids=...)`), not
as hashes into the text vocabulary.
"""

from __future__ import annotations
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import ARConfig, forward, kv_prefill, kv_step, position_table, tp_shardings


def boi_token(cfg: ARConfig) -> int:
    """Reserved <start_of_image> id: last text-vocab slot (the role of
    `tokenizer["<start_of_image>"]`, `generate.py:238`)."""
    return cfg.text_vocab_size - 1


def _sample_dynamic_k(key, logits, temperature, k):
    """Top-k sample where k may be a traced scalar (the reference picks
    strategy_cogview2 vs strategy_cogvideo per position,
    `generate.py:492-495`)."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    v = logits.shape[-1]
    srt = jnp.sort(logits, axis=-1)
    kth = jnp.take_along_axis(
        srt, jnp.full(logits.shape[:-1] + (1,), jnp.clip(v - k, 0, v - 1), jnp.int32), axis=-1
    )
    return jax.random.categorical(key, jnp.where(logits < kth, -jnp.inf, logits), axis=-1)


def build_video_sequence(
    cfg: ARConfig,
    text_tokens: np.ndarray,  # (B, text_length) text-vocab ids
    n_frames: int,
    given_frames: Optional[np.ndarray] = None,  # (B, n_given, L) image-vocab ids
    frame_order: Optional[np.ndarray] = None,  # (n_frames,) temporal id per slot
):
    """Build (seq, frame_ids, boi_mask): seq is (B, T) full-vocab ids
    with -1 holes to fill (`generate.py:585-587` seq layout), frame_ids
    gives each position's temporal frame (-1 = text), boi_mask marks
    frame-start positions whose INPUT embedding becomes
    <start_of_image> while the output token is kept (:238-241)."""
    b = text_tokens.shape[0]
    L = cfg.image_length
    t = cfg.text_length + n_frames * L
    seq = np.full((b, t), -1, np.int64)
    seq[:, : cfg.text_length] = text_tokens
    if given_frames is not None:
        for f in range(given_frames.shape[1]):
            s = cfg.text_length + f * L
            seq[:, s : s + L] = given_frames[:, f] + cfg.text_vocab_size

    order = np.arange(n_frames) if frame_order is None else np.asarray(frame_order)
    frame_ids = np.concatenate([np.full(cfg.text_length, -1), np.repeat(order, L)])
    boi_mask = np.zeros(t, bool)
    boi_mask[cfg.text_length + np.arange(n_frames) * L] = True
    return seq, frame_ids, boi_mask


@partial(
    jax.jit,
    static_argnames=("cfg", "context_length", "temperature", "guidance_alpha", "has_guider"),
)
def _fill(
    params: Dict,
    seq: jax.Array,  # (B, T) full-vocab, -1 holes
    frame_ids: jax.Array,  # (T,)
    boi_mask: jax.Array,  # (T,)
    top_ks: jax.Array,  # (T,) per-position top-k
    cfg: ARConfig,
    context_length: int,
    key,
    guider_seq: Optional[jax.Array],
    temperature: float,
    guidance_alpha: float,
    has_guider: bool,
):
    b, t = seq.shape
    boi = jnp.asarray(boi_token(cfg), seq.dtype)
    init = jnp.where(seq >= 0, seq, 0).astype(jnp.int32)
    g_init = None
    if has_guider:
        g_init = jnp.where(guider_seq >= 0, guider_seq, 0).astype(jnp.int32)

    def logits_at(tokens, p):
        inputs = jnp.where(boi_mask[None, :], boi, tokens)
        lg = forward(params, inputs, cfg, frame_ids=frame_ids)
        return jax.lax.dynamic_slice_in_dim(lg, p - 1, 1, axis=1)[:, 0]

    def step(carry, p):
        tokens, g_tokens, k = carry
        k, sub = jax.random.split(k)
        lg = logits_at(tokens, p)
        if has_guider:
            glg = logits_at(g_tokens, p)
            lg = glg + (lg - glg) * guidance_alpha  # token-level CFG (:488-491)
        # generation happens only in the image segment
        img_logits = lg[:, cfg.text_vocab_size :]
        kk = top_ks[p]
        sampled = _sample_dynamic_k(sub, img_logits, temperature, kk) + cfg.text_vocab_size
        given = jax.lax.dynamic_slice_in_dim(seq, p, 1, axis=1)[:, 0]
        nxt = jnp.where(given >= 0, given, sampled).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, p))
        if has_guider:
            g_tokens = jax.lax.dynamic_update_slice(g_tokens, nxt[:, None], (0, p))
        return (tokens, g_tokens, k), None

    (tokens, _, _), _ = jax.lax.scan(step, (init, g_init, key), jnp.arange(context_length, t))
    return tokens


@partial(
    jax.jit,
    static_argnames=("cfg", "context_length", "temperature", "guidance_alpha", "has_guider"),
)
def _fill_kv(
    params: Dict,
    seq: jax.Array,
    frame_ids: jax.Array,
    boi_mask: jax.Array,
    top_ks: jax.Array,
    cfg: ARConfig,
    context_length: int,
    key,
    guider_seq: Optional[jax.Array],
    temperature: float,
    guidance_alpha: float,
    has_guider: bool,
):
    """KV-cached sequence filling: prefill the given context with ONE
    full forward, then one O(T)-attention step per sampled token —
    O(T^2) total vs `_fill`'s O(T^3) recompute (the role of CogVideo's
    mems buffers, `generate.py:117-151`)."""
    b, t = seq.shape
    pos_tab = position_table(params, cfg, t, frame_ids)
    boi = jnp.asarray(boi_token(cfg), jnp.int32)
    tokens0 = jnp.where(seq >= 0, seq, 0).astype(jnp.int32)

    def prefill(tokens):
        """Cache k/v for positions [0, context_length - 1)."""
        n = context_length - 1
        inputs = jnp.where(boi_mask[None, :n], boi, tokens[:, :n])
        x = params["tok_emb"][inputs] + pos_tab[None, :n]
        return kv_prefill(params, cfg, x, t)

    def step_logits(tok, p, caches):
        """Logits at position p given token `tok` there; caches gain
        position p."""
        x = params["tok_emb"][tok] + pos_tab[p]
        return kv_step(params, cfg, x, p, caches, t)

    caches = prefill(tokens0)
    g_caches = None
    g_tokens0 = None
    if has_guider:
        g_tokens0 = jnp.where(guider_seq >= 0, guider_seq, 0).astype(jnp.int32)
        g_caches = prefill(g_tokens0)

    def step(carry, p):
        tokens, g_tokens, caches, g_caches, k = carry
        k, sub = jax.random.split(k)
        prev = jnp.where(boi_mask[p - 1], boi, jnp.take(tokens, p - 1, axis=1))
        lg, caches = step_logits(prev, p - 1, caches)
        if has_guider:
            # the guider stream keeps ITS text prefix — its input at
            # p-1 comes from the guider token row, not the main one
            g_prev = jnp.where(boi_mask[p - 1], boi, jnp.take(g_tokens, p - 1, axis=1))
            glg, g_caches = step_logits(g_prev, p - 1, g_caches)
            lg = glg + (lg - glg) * guidance_alpha
        img_logits = lg[:, cfg.text_vocab_size :]
        sampled = _sample_dynamic_k(sub, img_logits, temperature, top_ks[p]) + cfg.text_vocab_size
        given = jnp.take(seq, p, axis=1)
        nxt = jnp.where(given >= 0, given, sampled).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, p))
        if has_guider:
            g_tokens = jax.lax.dynamic_update_slice(g_tokens, nxt[:, None], (0, p))
        return (tokens, g_tokens, caches, g_caches, k), None

    (tokens, _, _, _, _), _ = jax.lax.scan(
        step, (tokens0, g_tokens0 if has_guider else tokens0, caches, g_caches, key),
        jnp.arange(context_length, t),
    )
    return tokens


def filling_sequence(
    params: Dict,
    seq: np.ndarray,
    frame_ids: np.ndarray,
    boi_mask: np.ndarray,
    cfg: ARConfig,
    key,
    guider_seq: Optional[np.ndarray] = None,
    guidance_alpha: float = 1.0,
    temperature: float = 1.0,
    top_k: int = 64,
    top_k_first_frame: Optional[int] = None,
    cached: bool = True,
):
    """Fill every -1 hole in `seq` left-to-right (the pjit
    `my_filling_sequence`, `generate.py:182-547`). Returns (B, T)
    full-vocab tokens. The default KV-cached path (`_fill_kv`) costs
    one O(T)-attention step per token; cached=False uses the
    recompute-the-prefix reference formulation (`_fill`) — both sample
    identical tokens given the same key."""
    seq = np.asarray(seq)
    context_length = int(np.min(np.argmax(np.concatenate(
        [seq < 0, np.ones((seq.shape[0], 1), bool)], axis=1), axis=1)))
    assert context_length > 0, "sequence needs at least one given token"
    # per-position strategy: first frame uses the cogview2 strategy's
    # top-k, later frames the cogvideo one (:492-495)
    tk1 = top_k if top_k_first_frame is None else top_k_first_frame
    top_ks = np.full(seq.shape[1], top_k, np.int32)
    top_ks[: cfg.text_length + cfg.image_length] = tk1
    fill = _fill_kv if cached else _fill
    return fill(
        params,
        jnp.asarray(seq),
        jnp.asarray(frame_ids),
        jnp.asarray(boi_mask),
        jnp.asarray(top_ks),
        cfg,
        context_length,
        key,
        None if guider_seq is None else jnp.asarray(guider_seq),
        float(temperature),
        float(guidance_alpha),
        guider_seq is not None,
    )


def _image_tokens(cfg: ARConfig, filled: jax.Array, n_frames: int) -> np.ndarray:
    """(B, T) full-vocab -> (n_frames, B, L) image-vocab local ids."""
    b = filled.shape[0]
    img = np.asarray(filled)[:, cfg.text_length :] - cfg.text_vocab_size
    return np.clip(img, 0, cfg.vocab_size - 1).reshape(b, n_frames, cfg.image_length).transpose(1, 0, 2)


def generate_video_tokens(
    params: Dict,
    text_tokens,
    cfg: ARConfig,
    n_frames: int,
    key=None,
    window: Optional[int] = None,
    guider_text_tokens=None,
    guidance_alpha: float = 1.0,
    temperature: float = 1.0,
    top_k: int = 64,
    top_k_first_frame: Optional[int] = None,
) -> np.ndarray:
    """Stage-1 frame-sequential generation with a rolling window
    (`process_stage1` :548-731 + `infinite.py:80-116`): fill up to
    `window` frames in one sequence, then slide — each new frame is
    sampled with the previous window-1 frames teacher-forced as real
    image-token context. Returns (n_frames, B, L) image-vocab ids."""
    key = key if key is not None else jax.random.PRNGKey(0)
    text_tokens = np.asarray(text_tokens)
    window = min(n_frames, cfg.max_frames) if window is None else min(window, cfg.max_frames)

    def fill(given, n_in_seq, k):
        seq, fids, boi = build_video_sequence(cfg, text_tokens, n_in_seq, given_frames=given)
        gseq = None
        if guider_text_tokens is not None:
            gseq = seq.copy()
            gseq[:, : cfg.text_length] = np.asarray(guider_text_tokens)
        filled = filling_sequence(
            params, seq, fids, boi, cfg, k, guider_seq=gseq, guidance_alpha=guidance_alpha,
            temperature=temperature, top_k=top_k, top_k_first_frame=top_k_first_frame,
        )
        return _image_tokens(cfg, filled, n_in_seq)

    key, sub = jax.random.split(key)
    frames = list(fill(None, window, sub))
    while len(frames) < n_frames:
        key, sub = jax.random.split(key)
        ctx = np.stack(frames[-(window - 1) :], axis=1)  # (B, window-1, L)
        out = fill(ctx, window, sub)
        frames.append(out[-1])
    return np.stack(frames[:n_frames])


def interpolate_frames(
    params: Dict,
    keyframes: np.ndarray,  # (K, B, L) image-vocab ids, K odd >= 3
    text_tokens,
    cfg: ARConfig,
    key=None,
    temperature: float = 1.0,
    top_k: int = 64,
) -> np.ndarray:
    """Stage-2 dyadic interpolation (`process_stage2` :733-905): each
    keyframe triple (f0, f1, f2) is presented at temporal slots 0/2/4
    of a 5-frame window via frame_ids, the model fills slots 3/4 (=
    temporal 1/3), and windows merge in temporal order
    (:888-903 output_tokens_merge). K frames -> 2K-1 frames."""
    key = key if key is not None else jax.random.PRNGKey(0)
    keyframes = np.asarray(keyframes)
    k_frames, b, L = keyframes.shape
    assert k_frames >= 3 and k_frames % 2 == 1, "need an odd number (>=3) of keyframes"
    assert cfg.max_frames >= 5, "stage 2 needs cfg.max_frames >= 5"
    text_tokens = np.asarray(text_tokens)
    order = np.array([0, 2, 4, 1, 3])  # seq slot -> temporal id (`infinite.py:68-77`)

    out = []
    n_windows = (k_frames - 1) // 2
    for i in range(n_windows):
        key, sub = jax.random.split(key)
        given = keyframes[2 * i : 2 * i + 3].transpose(1, 0, 2)  # (B, 3, L)
        seq, fids, boi = build_video_sequence(cfg, text_tokens, 5, given_frames=given, frame_order=order)
        filled = filling_sequence(params, seq, fids, boi, cfg, sub,
                                  temperature=temperature, top_k=top_k)
        slots = _image_tokens(cfg, filled, 5)  # (5, B, L) in slot order
        # temporal order: slot0 (t0), slot3 (t1), slot1 (t2), slot4 (t3);
        # slot2 (t4) is the next window's t0 except for the last window
        out.extend([slots[0], slots[3], slots[1], slots[4]])
    out.append(keyframes[-1])
    return np.stack(out)


def generate_video(
    params: Dict,
    text_tokens,
    cfg: ARConfig,
    vq_params: Dict,
    vq_cfg,
    n_keyframes: int = 3,
    interpolation_rounds: int = 1,
    key=None,
    guider_text_tokens=None,
    guidance_alpha: float = 1.0,
    temperature: float = 1.0,
    top_k: int = 64,
) -> np.ndarray:
    """Full two-stage text-to-video (`main` :1011-1190): stage-1
    keyframes -> stage-2 interpolation rounds (each doubles the frame
    rate, duration /= 2) -> VQ decode to uint8 frames
    (F, B, H, W, 3)."""
    from .vq import decode_video_tokens

    if interpolation_rounds > 0:
        assert n_keyframes >= 3 and n_keyframes % 2 == 1, (
            "stage-2 interpolation needs an odd number (>=3) of keyframes"
        )
    key = key if key is not None else jax.random.PRNGKey(0)
    key, k1 = jax.random.split(key)
    tokens = generate_video_tokens(
        params, text_tokens, cfg, n_keyframes, k1, guider_text_tokens=guider_text_tokens,
        guidance_alpha=guidance_alpha, temperature=temperature, top_k=top_k,
    )
    for _ in range(interpolation_rounds):
        key, k2 = jax.random.split(key)
        tokens = interpolate_frames(params, tokens, text_tokens, cfg, k2,
                                    temperature=temperature, top_k=top_k)
    imgs = decode_video_tokens(vq_params, jnp.asarray(tokens), vq_cfg, cfg.image_rows, cfg.image_cols)
    return np.asarray(jnp.round((imgs + 1.0) * 127.5).astype(jnp.uint8))


def _shard_params(params, mesh):
    shardings = tp_shardings(params, mesh)
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), params, shardings)


def sharded_generate(params, text_tokens, cfg: ARConfig, mesh, key=None, **kwargs):
    """Single-grid generation with TP-sharded params over a mesh (the
    pjit replacement for `mpu.initialize_model_parallel`,
    `cog/video/generate.py:1250-1253`); bit-identical to unsharded
    `transformer.generate_tokens`."""
    from .transformer import generate_tokens

    with mesh:
        return generate_tokens(_shard_params(params, mesh), jnp.asarray(text_tokens), cfg,
                               key if key is not None else jax.random.PRNGKey(0), **kwargs)


def sharded_generate_video(params, text_tokens, cfg: ARConfig, mesh, n_frames: int = 2, key=None, **kwargs):
    """Stage-1 video generation under TP sharding; bit-identical to the
    unsharded `generate_video_tokens`."""
    with mesh:
        return generate_video_tokens(
            _shard_params(params, mesh), text_tokens, cfg, n_frames,
            key if key is not None else jax.random.PRNGKey(0), **kwargs,
        )
