"""On-device DCT frame codec (maua_tpu/ops/framecodec.py): bitstream
round-trip exactness, rate, and the >=40 dB visually-lossless contract
vs the uncompressed I420 frame on real synthesis output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.ops import framecodec as fc
from maua_tpu.ops.video import rgb_to_yuv420


def _psnr(a, b, peak=255.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


def _test_frames(B=2, H=64, W=64, seed=0):
    """Structured content: smooth gradients + edges + texture noise."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    edges = 60.0 * ((xx.astype(int) // 16 + yy.astype(int) // 16) % 2)
    frames = []
    for b in range(B):
        noise = rs.randn(H, W, 3).astype(np.float32) * 6.0
        rgb = np.stack([base + 20 * b, 255 - base, edges + 60], axis=-1) + noise
        frames.append(np.clip(rgb, 0, 255).astype(np.uint8))
    return np.stack(frames)


def _sg2_frames(T=6, res=64, jitter=0.15):
    """Consecutive frames from the SG2 synthesis path (random init,
    shared noise buffers, jittered ws) — the production content class."""
    from maua_tpu.gan import stylegan2 as sg2

    cfg_g = sg2.SG2Config(img_resolution=res, channel_base=1024, channel_max=64, num_fp16_res=0)
    params = sg2.init_params(jax.random.PRNGKey(0), cfg_g)
    base = jax.random.normal(jax.random.PRNGKey(1), (1, cfg_g.num_ws, cfg_g.w_dim))
    frames = []
    for t in range(T):
        ws = base + jitter * jax.random.normal(jax.random.PRNGKey(10 + t), base.shape)
        img = sg2.synthesis(params, ws, cfg_g, noise_mode="const")
        frames.append(np.asarray(jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8))[0])
    return np.stack(frames)


def test_zigzag_is_permutation():
    assert sorted(fc._ZIGZAG.tolist()) == list(range(64))
    # classic zigzag prefix
    assert fc._ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_dct_orthonormal():
    D = fc._DCT
    assert np.abs(D @ D.T - np.eye(8)).max() < 1e-6


def test_plan_covers_all_live_positions():
    """Every live position's slot radices must multiply to >= its level
    count (so any value reconstructs exactly), word capacity must hold,
    and packing waste must stay under 1 bit per word (the radix-split
    guarantee)."""
    cfg = fc.default_config(32, 32)
    strip = cfg.strip_y
    assert strip == 4
    covered = {}
    for word in cfg.groups_y:
        prod = 1
        for idx, radix, prediv in word:
            covered[idx] = covered.get(idx, 1) * radix
            prod *= radix
        assert prod <= 2**32
    live = {b * 64 + i for b in range(strip) for i, l in enumerate(cfg.levels_y) if l > 1}
    assert set(covered) == live
    for idx, cap in covered.items():
        assert cap >= cfg.levels_y[idx % 64]
    # waste bound: total capacity within 1 bit/word of the information
    total_bits = strip * sum(np.log2(l) for l in cfg.levels_y if l > 1)
    assert cfg.words_y * 32 <= total_bits + len(cfg.groups_y) + 32


def test_pack_unpack_exact():
    """Device mixed-radix pack -> host unpack is the identity on the
    quantized values (the lossy step is quantization only), including
    positions split across words."""
    cfg = fc.default_config(32, 32)
    rs = np.random.RandomState(1)
    nb = cfg.n_blocks_y
    L = np.asarray(cfg.levels_y, np.int64)
    q = (rs.randint(0, 1 << 30, size=(2, nb, 64)) % L[None, None, :]).astype(np.int32)
    packed = np.asarray(fc._pack_device(jnp.asarray(q), cfg.levels_y, cfg.groups_y, cfg.strip_y))
    assert packed.shape == (2, (nb // cfg.strip_y) * cfg.words_y * 4)
    vals = fc._host_unpack(packed, nb, cfg.levels_y, cfg.groups_y, cfg.qstep_y, cfg.strip_y)
    expect = (q - (L - 1)[None, None, :] // 2) * cfg.qstep_y
    live = L > 1
    assert np.allclose(vals[:, :, live], expect[:, :, live].astype(np.float32))
    assert np.all(vals[:, :, ~live] == 0)


@pytest.mark.parametrize("calibrated", [False, True])
def test_roundtrip_psnr(calibrated):
    frames = _test_frames()
    cfg = fc.calibrate(frames) if calibrated else fc.default_config(64, 64)
    ref_i420 = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    packed = np.asarray(jax.jit(lambda x: fc.encode_frames(x, cfg))(jnp.asarray(frames)))
    assert packed.shape == (2, cfg.frame_bytes)
    dec = fc.decode_frames(packed, cfg)
    assert dec.shape == ref_i420.shape and dec.dtype == np.uint8
    psnr = _psnr(dec, ref_i420)
    assert psnr >= 40.0, psnr
    # and it must actually compress vs I420 (12 bits/pixel)
    assert cfg.bits_per_pixel < 9.0, cfg.bits_per_pixel


def test_dpcm_chunk_roundtrip_psnr_and_rate():
    """The production path: DPCM chunk on SG2 content. Every frame
    (not just the intra frame) must hold >=40 dB vs uncompressed I420,
    and the chunk rate must beat intra-only coding."""
    frames = _sg2_frames(T=6)
    codec = fc.calibrate_chunk(frames[:4])  # calibrate on a prefix
    intra, deltas = jax.jit(lambda x: fc.encode_chunk(x, codec))(jnp.asarray(frames))
    intra, deltas = np.asarray(intra), np.asarray(deltas)
    assert intra.shape == (codec.intra.frame_bytes,)
    assert deltas.shape == (codec.delta_bytes(6),)
    assert codec.frames_for_delta_bytes(deltas.size) == 6
    dec = fc.decode_chunk(intra, deltas, codec)
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    per_frame = [_psnr(dec[t], ref[t]) for t in range(6)]
    assert min(per_frame) >= 40.0, per_frame
    assert codec.delta_bytes(2) < codec.intra.frame_bytes
    assert codec.bits_per_pixel(6) < 12.0  # beats raw I420


def _blend_frames(T=7):
    """Linear crossfade between two structured images: chroma midpoints
    interpolate (nearly) exactly, the content class chroma_step=2 is
    built for."""
    a, b = _test_frames(B=2).astype(np.float32)
    ts = np.linspace(0.0, 1.0, T, dtype=np.float32)[:, None, None, None]
    return np.clip(np.round((1 - ts) * a + ts * b), 0, 255).astype(np.uint8)


def test_chroma_temporal_halving_roundtrip():
    """chroma_step="auto" must enable the chroma keyframe lattice on
    linearly-blending content (where midpoint interpolation is exact up
    to rounding), shrink the stream vs full-rate chroma, and still hold
    the >=40 dB contract on every frame — including interpolated ones."""
    frames = _blend_frames(T=7)
    full = fc.calibrate_chunk(frames[:4], chroma_step=1)
    half = fc.calibrate_chunk(frames[:4])  # auto
    assert half.chroma_step == 2
    assert half.chroma_keyframes(7) == [0, 2, 4, 6]
    assert half.delta_bytes(7) < full.delta_bytes(7)
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), half)
    dec = fc.decode_chunk(np.asarray(intra), np.asarray(deltas), half)
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    per_frame = [_psnr(dec[t], ref[t]) for t in range(7)]
    assert min(per_frame) >= 40.0, per_frame


def test_chroma_halving_auto_rejects_fast_chroma():
    """The auto gate must refuse temporal chroma subsampling when the
    measured interpolation error exceeds the quantizer's error budget
    (jittered SG2 frames move chroma too fast — forcing step=2 there
    would break the 40 dB contract)."""
    frames = _sg2_frames(T=4, jitter=0.05)
    codec = fc.calibrate_chunk(frames)
    assert codec.chroma_step == 1


def test_rgb_decode_path():
    frames = _test_frames(B=1)
    cfg = fc.calibrate(frames)
    packed = np.asarray(fc.encode_frames(jnp.asarray(frames), cfg))
    rgb = fc.decode_frames(packed, cfg, out="rgb")
    assert rgb.shape == frames.shape and rgb.dtype == np.uint8
    # chroma subsampling bounds RGB fidelity; just require closeness
    assert _psnr(rgb, frames) > 28.0


@pytest.mark.parametrize("chroma_step", [1, 2])
def test_native_chunk_decoder_matches_numpy(chroma_step):
    """The one-pass C++ chunk decoder (unpack + IDCT + DPCM accumulate
    + chroma keyframe interpolation + uint8 emit) must agree with the
    numpy cumsum path everywhere (float-associativity differences land
    within +-1 gray level)."""
    from maua_tpu import native
    from maua_tpu.ops import framecodec as fcmod

    if not native.available():
        pytest.skip("native lib unavailable")
    frames = _sg2_frames(T=5)
    codec = fc.calibrate_chunk(frames[:3], chroma_step=chroma_step)
    assert codec.chroma_step == chroma_step
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
    intra, deltas = np.asarray(intra), np.asarray(deltas)
    via_native = native.framecodec_decode_chunk_u8(intra, deltas, codec, 5)

    saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
    fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
    try:
        via_numpy = fc.decode_chunk(intra, deltas, codec)
    finally:
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved
    assert via_native.shape == via_numpy.shape
    diff = np.abs(via_native.astype(np.int32) - via_numpy.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_native_decoder_matches_numpy():
    from maua_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    frames = _test_frames()
    cfg = fc.calibrate(frames)
    packed = np.asarray(fc.encode_frames(jnp.asarray(frames), cfg))
    ny, nu, nv = native.framecodec_decode_planes(packed, cfg)
    sy = cfg.plane_bytes_y
    sc = cfg.plane_bytes_c
    py = fc._host_idct(fc._host_unpack(packed[:, :sy], cfg.n_blocks_y, cfg.levels_y,
                                       cfg.groups_y, cfg.qstep_y, cfg.strip_y), 64, 64)
    pu = fc._host_idct(fc._host_unpack(packed[:, sy:sy + sc], cfg.n_blocks_c, cfg.levels_c,
                                       cfg.groups_c, cfg.qstep_c, cfg.strip_c), 32, 32)
    assert np.abs(ny - py).max() < 1e-3
    assert np.abs(nu - pu).max() < 1e-3
    assert nv.shape == (2, 32, 32)


def test_unaligned_size_rejected():
    with pytest.raises(ValueError):
        fc.default_config(60, 64)


def test_dct_pipelined_frames_delivery():
    """pipelined_frames(pix_fmt="dct"): the production delivery path —
    per-batch DPCM chunks, self-calibrated, >=40 dB per frame, valid
    counts respected."""
    from maua_tpu.ops.video import pipelined_frames

    frames = _sg2_frames(T=8)

    def batches():
        yield jnp.asarray(frames[:3]), 3
        yield jnp.asarray(frames[3:6]), 3
        yield jnp.asarray(np.concatenate([frames[6:8], frames[7:8]])), 2  # padded tail

    out = list(pipelined_frames(batches(), "dct"))
    assert len(out) == 8
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    for t in range(8):
        assert out[t].shape == ref[t].shape
        assert _psnr(out[t], ref[t]) >= 40.0, t


def test_dct_pipelined_falls_back_on_unaligned():
    from maua_tpu.ops.video import pipelined_frames

    frames = _test_frames(B=2, H=24, W=24)  # even but not 16-aligned
    out = list(pipelined_frames(iter([(jnp.asarray(frames), 2)]), "dct"))
    assert len(out) == 2 and out[0].shape == (36, 24)


def test_fetch_parallel_matches_direct():
    from maua_tpu.ops.video import fetch_parallel

    x = jnp.arange(4 * 1024 * 512, dtype=jnp.int32).reshape(16, -1)
    assert np.array_equal(fetch_parallel(x, n_streams=4), np.asarray(x))
    # small arrays take the direct path
    y = jnp.ones((3, 4))
    assert np.array_equal(fetch_parallel(y), np.ones((3, 4)))


@pytest.mark.parametrize("chroma_step", [1, 2])
def test_simd_chunk_decoder_matches_scalar(chroma_step):
    """The AVX-512 chunk decoder (framecodec_simd.cpp) must agree with
    the scalar C++ kernel on a geometry where both planes take the
    vector path (128p: luma ns=64, chroma ns=16, both %16==0). Both
    compute the same f32 DPCM accumulation; only FMA association
    differs, so agreement is +-1 gray level at the rounding boundary."""
    import ctypes

    from maua_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    lib = native._lib()
    if not lib.framecodec_simd_available():
        pytest.skip("AVX-512 unavailable on this host")
    frames = _sg2_frames(T=5, res=128)
    codec = fc.calibrate_chunk(frames[:3], chroma_step=chroma_step)
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
    intra, deltas = np.asarray(intra), np.asarray(deltas)

    via_simd = native.framecodec_decode_chunk_u8(intra, deltas, codec, 5)

    # monkeypatch the simd entry to report "can't" so the scalar runs
    orig = lib.framecodec_simd_available
    try:
        lib.framecodec_simd_available = lambda: 0
        via_scalar = native.framecodec_decode_chunk_u8(intra, deltas, codec, 5)
    finally:
        lib.framecodec_simd_available = orig
    diff = np.abs(via_simd.astype(np.int32) - via_scalar.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def _heavy_tail_frames(T=6, H=128, W=128, p_jump=0.002, seed=0):
    """Smooth drift + sparse large jumps: the delta distribution is
    strongly peaked with rare outliers — exactly the content class
    escape coding (PFor-style, framecodec.py module docstring) wins on:
    the clipped plan must size every position's alphabet for the
    outliers, the escape plan ships them as exact int16 exceptions."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 128 + 70 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    frames = []
    for t in range(T):
        f = base[..., None] + 3.0 * t + rs.randn(H, W, 1) * 4
        f = f + (rs.rand(H, W, 1) < p_jump) * rs.randn(H, W, 1) * 120
        frames.append(np.clip(np.repeat(f, 3, -1) + rs.randn(H, W, 3) * 2,
                              0, 255).astype(np.uint8))
    return np.stack(frames)


def test_escape_coding_rate_and_roundtrip():
    """Escape-coded delta positions (even level counts + int16
    exception stream) must (a) actually engage on heavy-tailed content,
    (b) beat the clipped plan's rate, and (c) round-trip through the
    numpy decoder at full contract quality — escapes reconstruct the
    out-of-range deltas EXACTLY, so PSNR must not drop vs clipped."""
    frames = _heavy_tail_frames()
    esc = fc.calibrate_chunk(frames[:4], escape="force")
    clip = fc.calibrate_chunk(frames[:4], escape=False)
    assert esc.esc_cap_y > 0
    assert any(l % 2 == 0 and l > 1 for l in esc.delta.levels_y)
    T = frames.shape[0]
    assert esc.bits_per_pixel(T) < clip.bits_per_pixel(T)
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    psnrs = {}
    for name, codec in (("esc", esc), ("clip", clip)):
        intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
        intra, deltas = np.asarray(intra), np.asarray(deltas)
        assert deltas.shape == (codec.delta_bytes(T),)
        import maua_tpu.ops.framecodec as fcmod
        saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
        try:
            dec = fc.decode_chunk(intra, deltas, codec)
        finally:
            fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved
        psnrs[name] = min(_psnr(dec[t], ref[t]) for t in range(T))
    assert psnrs["esc"] >= 40.0, psnrs
    assert psnrs["esc"] >= psnrs["clip"] - 0.1, psnrs


def test_escape_native_decoder_parity():
    """Scalar C++ and (when available) AVX-512 chunk decoders must
    reproduce the numpy escape-substitution path bit-for-bit up to the
    usual +-1 float-association gray level — same exception stream walk
    order (frame, strip, block, position)."""
    from maua_tpu import native
    import maua_tpu.ops.framecodec as fcmod

    if not native.available():
        pytest.skip("native lib unavailable")
    frames = _heavy_tail_frames()
    codec = fc.calibrate_chunk(frames[:4], escape="force")
    assert codec.esc_cap_y > 0
    T = frames.shape[0]
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
    intra, deltas = np.asarray(intra), np.asarray(deltas)

    saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
    fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
    try:
        via_numpy = fc.decode_chunk(intra, deltas, codec)
    finally:
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved

    lib = native._lib()
    paths = [("dispatch", None)]
    if lib.framecodec_simd_available():
        paths.append(("scalar", 0))  # force the scalar kernel too
    for name, force in paths:
        orig = lib.framecodec_simd_available
        try:
            if force is not None:
                lib.framecodec_simd_available = lambda: force
            via_native = native.framecodec_decode_chunk_u8(intra, deltas, codec, T)
        finally:
            lib.framecodec_simd_available = orig
        diff = np.abs(via_native.astype(np.int32) - via_numpy.astype(np.int32))
        assert diff.max() <= 1, (name, diff.max())
        assert (diff > 0).mean() < 0.01, name


def test_escape_capacity_overflow_degrades_to_clip():
    """When a chunk produces more escapes than the calibrated capacity,
    the encoder must degrade the overflow (suffix) to the old clipped
    behavior — static shapes hold, decode stays consistent across numpy
    and native, and quality degrades gracefully instead of corrupting."""
    import dataclasses

    from maua_tpu import native
    import maua_tpu.ops.framecodec as fcmod

    frames = _heavy_tail_frames()
    codec = fc.calibrate_chunk(frames[:4], escape="force")
    assert codec.esc_cap_y > 8
    tiny = dataclasses.replace(codec, esc_cap_y=8)
    T = frames.shape[0]
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), tiny)
    intra, deltas = np.asarray(intra), np.asarray(deltas)
    assert deltas.shape == (tiny.delta_bytes(T),)
    saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
    fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
    try:
        via_numpy = fc.decode_chunk(intra, deltas, tiny)
    finally:
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    # clipped-overflow quality floor: still a usable frame, not garbage
    assert _psnr(via_numpy, ref) > 30.0
    if native.available():
        via_native = native.framecodec_decode_chunk_u8(intra, deltas, tiny, T)
        diff = np.abs(via_native.astype(np.int32) - via_numpy.astype(np.int32))
        assert diff.max() <= 1, diff.max()


def test_escape_overflow_selfcorrects_with_order2():
    """Squeezed escape capacity must degrade GRACEFULLY: the closed-loop
    encoder feeds every clip/drop error back into the next frame's
    delta, so per-frame error stays bounded instead of integrating into
    drift (order-2 positions would otherwise integrate a dropped escape
    twice — linearly growing distortion; measured pre-fix: a V-plane
    escape blowout walked PSNR 40.4 -> 31 dB across one chunk). Within
    a frame, order-2 escapes claim capacity ahead of order-1 ones.
    Also pins numpy/native agreement on an overflowing stream."""
    import dataclasses

    from maua_tpu import native
    import maua_tpu.ops.framecodec as fcmod

    # smooth morph (order-2 engages on the busy positions) + sparse
    # impulses the calibration window never sees (escapes everywhere)
    frames = _smooth_morph_frames(T=8, noise=1.0).copy()
    rs = np.random.RandomState(7)
    for t in range(2, 8):
        pts = rs.randint(0, 128, size=(40, 2))
        frames[t, pts[:, 0], pts[:, 1]] = rs.randint(0, 256, size=(40, 3))
    codec = fc.calibrate_chunk(frames[:5], escape="force", order2="force")
    assert codec.order2_y and any(codec.order2_y), "test content must engage order-2"
    assert codec.esc_cap_y > 8

    T = frames.shape[0]
    tiny = dataclasses.replace(codec, esc_cap_y=max(1, codec.esc_cap_y // 8),
                               esc_cap_c=max(1, codec.esc_cap_c // 8) if codec.esc_cap_c else 0)
    intra, deltas = map(np.asarray, fc.encode_chunk(jnp.asarray(frames), tiny))
    assert deltas.shape == (tiny.delta_bytes(T),)

    saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
    fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
    try:
        via_numpy = fc.decode_chunk(intra, deltas, tiny)
    finally:
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    assert _psnr(via_numpy, ref) > 30.0
    # bounded, not drifting: last-frame error comparable to early-frame
    # error (pre-fix the same squeeze integrated linearly per frame)
    err = via_numpy.astype(np.float64) - ref.astype(np.float64)
    mse = (err.reshape(T, -1) ** 2).mean(axis=1)
    assert mse[-1] <= 5.0 * np.median(mse[1:4]) + 1.0, mse.tolist()
    if native.available():
        via_native = native.framecodec_decode_chunk_u8(intra, deltas, tiny, T)
        diff = np.abs(via_native.astype(np.int32) - via_numpy.astype(np.int32))
        assert diff.max() <= 1, diff.max()


def _smooth_morph_frames(T=8, H=128, W=128, seed=0, noise=1.5):
    """Smoothstep crossfade between two structured images + small static
    texture: coefficients move nearly linearly in time, so SECOND
    differences are several times smaller than first differences — the
    content class the per-position order-2 prediction is built for
    (latent-interpolation renders, framecodec.py module docstring)."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    a = np.stack([128 + 90 * np.sin(xx / 7.0) * np.cos(yy / 11.0),
                  128 + 70 * np.cos(xx / 13.0), 128 + 50 * np.sin(yy / 9.0)], -1)
    b = np.stack([128 - 80 * np.cos(xx / 9.0), 128 + 85 * np.sin((xx + yy) / 15.0),
                  128 - 60 * np.cos(yy / 8.0)], -1)
    tex = rs.randn(H, W, 3).astype(np.float32) * noise
    ts = np.linspace(0.0, 1.0, T, dtype=np.float32)
    frames = []
    for t in ts:
        s = t * t * (3.0 - 2.0 * t)  # smoothstep easing
        frames.append(np.clip(np.round((1 - s) * a + s * b + tex), 0, 255).astype(np.uint8))
    return np.stack(frames)


def test_order2_engages_and_cuts_rate():
    """On smooth morph content the calibrator must pick order-2 at a
    meaningful share of the busy positions and the resulting plan must
    be strictly smaller than the order-1 plan."""
    frames = _smooth_morph_frames()
    o2 = fc.calibrate_chunk(frames[:6], escape="force", order2="force", chroma_step=1)
    o1 = fc.calibrate_chunk(frames[:6], escape="force", order2=False, chroma_step=1)
    assert o2.order2_y and sum(o2.order2_y) >= 2, o2.order2_y
    assert not o1.order2_y and not o1.order2_c
    T = frames.shape[0]
    assert o2.bits_per_pixel(T) < o1.bits_per_pixel(T), (
        o2.bits_per_pixel(T), o1.bits_per_pixel(T))


def test_order2_roundtrip_psnr():
    """Order-2 coding is exact in the integer domain (double cumulative
    sum), so every frame must still hold the >=40 dB contract through
    the numpy decoder."""
    import maua_tpu.ops.framecodec as fcmod

    frames = _smooth_morph_frames()
    codec = fc.calibrate_chunk(frames[:6], escape="force", order2="force", chroma_step=1)
    assert codec.order2_y
    T = frames.shape[0]
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
    intra, deltas = np.asarray(intra), np.asarray(deltas)
    assert deltas.shape == (codec.delta_bytes(T),)
    saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
    fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
    try:
        dec = fc.decode_chunk(intra, deltas, codec)
    finally:
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    per_frame = [_psnr(dec[t], ref[t]) for t in range(T)]
    assert min(per_frame) >= 40.0, per_frame


@pytest.mark.parametrize("chroma_step", [1, 2])
def test_order2_native_decoder_parity(chroma_step):
    """Scalar C++ and (when available) AVX-512 decoders must reproduce
    the numpy order-2 double-integration bit-for-bit up to the usual
    +-1 float-association gray level — including on the chroma keyframe
    lattice."""
    from maua_tpu import native
    import maua_tpu.ops.framecodec as fcmod

    if not native.available():
        pytest.skip("native lib unavailable")
    frames = _smooth_morph_frames()
    codec = fc.calibrate_chunk(frames[:6], escape="force", order2="force",
                               chroma_step=chroma_step)
    assert codec.order2_y
    T = frames.shape[0]
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
    intra, deltas = np.asarray(intra), np.asarray(deltas)

    saved = fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED
    fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = None, True
    try:
        via_numpy = fc.decode_chunk(intra, deltas, codec)
    finally:
        fcmod._NATIVE_CHUNK_FN, fcmod._NATIVE_CHUNK_CHECKED = saved

    lib = native._lib()
    paths = [("dispatch", None)]
    if lib.framecodec_simd_available():
        paths.append(("scalar", 0))
    for name, force in paths:
        orig = lib.framecodec_simd_available
        try:
            if force is not None:
                lib.framecodec_simd_available = lambda: force
            via_native = native.framecodec_decode_chunk_u8(intra, deltas, codec, T)
        finally:
            lib.framecodec_simd_available = orig
        diff = np.abs(via_native.astype(np.int32) - via_numpy.astype(np.int32))
        assert diff.max() <= 1, (name, diff.max())
        assert (diff > 0).mean() < 0.01, name


def test_order1_stream_unchanged_by_order2_fields():
    """A codec with empty order tuples must produce and decode the
    exact same stream as before the order-2 feature (back-compat: the
    field defaults must not perturb the order-1 path)."""
    frames = _sg2_frames(T=5)
    codec = fc.calibrate_chunk(frames[:4], order2=False)
    assert codec.order2_y == () and codec.order2_c == ()
    intra, deltas = fc.encode_chunk(jnp.asarray(frames), codec)
    dec = fc.decode_chunk(np.asarray(intra), np.asarray(deltas), codec)
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    assert min(_psnr(dec[t], ref[t]) for t in range(5)) >= 40.0


def test_device_calibration_matches_host_contract():
    """`calibrate_chunk_device` (on-device histogram statistics, ~400 KB
    fetched) must produce a codec equivalent to the host path: same
    geometry/chroma decision, comparable rate (exact-histogram escape
    sweeps and unclipped delta stats may shift individual levels), and
    the same round-trip quality on the content it calibrated on."""
    frames = _smooth_morph_frames(T=8, noise=2.0)
    host = fc.calibrate_chunk(frames, quality=1.1, escape="force", order2="auto")
    dev = fc.calibrate_chunk_device(jnp.asarray(frames), quality=1.1,
                                    escape="force", order2="auto")
    assert dev.intra.height == host.intra.height
    assert dev.chroma_step == host.chroma_step
    bpp_h, bpp_d = host.bits_per_pixel(8), dev.bits_per_pixel(8)
    assert abs(bpp_d - bpp_h) / bpp_h < 0.25, (bpp_h, bpp_d)

    intra, deltas = map(np.asarray, fc.encode_chunk(jnp.asarray(frames), dev))
    assert deltas.shape == (dev.delta_bytes(8),)
    out = fc.decode_chunk(intra, deltas, dev)
    ref = np.asarray(rgb_to_yuv420(jnp.asarray(frames)))
    p_dev = _psnr(out, ref)
    intra_h, deltas_h = map(np.asarray, fc.encode_chunk(jnp.asarray(frames), host))
    p_host = _psnr(fc.decode_chunk(intra_h, deltas_h, host), ref)
    assert p_dev > p_host - 1.0, (p_dev, p_host)
    assert p_dev > 38.0, p_dev
