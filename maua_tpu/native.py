"""ctypes bridge to the native C++ kernels, built on demand.

Rebuild of the reference's two native components (SURVEY.md 2.13):
efficient_quantile (torch ext, `efficient_quantile.cpp:8-206`) and
inverse_op_cython (`inverse_op_cython.pyx:19-67`), here as plain C ABI
shared objects compiled with g++ (-O3 -fopenmp) on first use, plus
jittable on-device equivalents (sort-based quantiles; lax.scan raster
back-substitution) for data living in HBM.
"""

from __future__ import annotations

import ctypes

import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_LIB = None
_BUILD_FAILED = False


def _build() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    if _BUILD_FAILED:
        return None
    so_path = _BUILD_DIR / "libmaua_native.so"
    srcs = [_NATIVE_DIR / "efficient_quantile.cpp", _NATIVE_DIR / "inverse_conv.cpp",
            _NATIVE_DIR / "framecodec.cpp", _NATIVE_DIR / "framecodec_simd.cpp"]
    if not so_path.exists() or any(s.stat().st_mtime > so_path.stat().st_mtime for s in srcs):
        _BUILD_DIR.mkdir(exist_ok=True)
        cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
               *[str(s) for s in srcs], "-o", str(so_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build failed ({e}); using jnp fallbacks")
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(str(so_path))
    lib.efficient_quantile_f32.restype = ctypes.c_int
    lib.efficient_quantile_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    lib.kthvalue_f32.restype = ctypes.c_float
    lib.kthvalue_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
    lib.inverse_conv_f32.restype = None
    lib.inverse_conv_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
    ]
    _i64p = ctypes.POINTER(ctypes.c_int64)
    lib.framecodec_decode_plane_f32.restype = ctypes.c_int
    lib.framecodec_decode_plane_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _i64p,
        ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    chunk_sig = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, _i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _i64p, ctypes.c_double,
        ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _i64p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        # escape-coded delta positions: per-(frame,strip) exception
        # stream offsets + exact int16 values (NULL = no escapes)
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int16),
        # per-position prediction-order flags (64 int64, 1 = order-2 /
        # second difference; NULL = all order-1)
        _i64p,
    ]
    lib.framecodec_decode_plane_chunk_u8.restype = ctypes.c_int
    lib.framecodec_decode_plane_chunk_u8.argtypes = chunk_sig
    # AVX-512 fast path (framecodec_simd.cpp): same contract; rc=2
    # means the geometry can't take the vector path (fall back scalar)
    lib.framecodec_decode_plane_chunk_u8_simd.restype = ctypes.c_int
    lib.framecodec_decode_plane_chunk_u8_simd.argtypes = chunk_sig
    lib.framecodec_simd_available.restype = ctypes.c_int
    lib.framecodec_simd_available.argtypes = []
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


def efficient_quantile(values, qs: Sequence[float], ignore_nan: bool = False) -> np.ndarray:
    """Multi-quantile of a huge host array via recursive partial
    sorting; numpy fallback when the native lib is unavailable."""
    arr = np.ascontiguousarray(np.asarray(values, np.float32).reshape(-1))
    q = np.ascontiguousarray(np.asarray(qs, np.float64).reshape(-1))
    lib = _lib()
    if lib is None:
        fn = np.nanquantile if ignore_nan else np.quantile
        return fn(arr, q).astype(np.float64)
    scratch = arr.copy()
    out = np.empty(len(q), np.float64)
    rc = lib.efficient_quantile_f32(
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), scratch.size,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), q.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), int(ignore_nan),
    )
    if rc != 0:
        raise ValueError(f"efficient_quantile failed with code {rc}")
    return out


def kthvalue(values, k: int) -> float:
    """kth smallest element (reference percentile rounding,
    `audioreactive/signal.py:41-53`)."""
    arr = np.ascontiguousarray(np.asarray(values, np.float32).reshape(-1)).copy()
    lib = _lib()
    if lib is None:
        return float(np.partition(arr, k - 1)[k - 1])
    return float(lib.kthvalue_f32(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), arr.size, int(k)))


def inverse_conv(z, w, is_upper: bool = False, dilation: int = 1) -> np.ndarray:
    """Invert an emerging (masked autoregressive) convolution on host
    (`inverse_op_cython.pyx:19-67`). z: (B, H, W, C), w: (K, K, C, C)."""
    z = np.ascontiguousarray(np.asarray(z, np.float32))
    w = np.ascontiguousarray(np.asarray(w, np.float32))
    b, h, ww, c = z.shape
    k = w.shape[0]
    lib = _lib()
    if lib is None:
        return _inverse_conv_py(z, w, is_upper, dilation)
    x = np.zeros_like(z)
    lib.inverse_conv_f32(
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, ww, c, k, int(is_upper), int(dilation),
    )
    return x


def _inverse_conv_py(z, w, is_upper, dilation):
    """Naive python fallback (`inverse_op_naive.py` role)."""
    b, height, width, channels = z.shape
    ksize = w.shape[0]
    kcenter = (ksize - 1) // 2
    x = np.zeros_like(z)
    c_range = range(channels - 1, -1, -1) if is_upper else range(channels)
    j_range = range(height) if is_upper else range(height - 1, -1, -1)
    i_range = range(width) if is_upper else range(width - 1, -1, -1)
    for bb in range(b):
        for j in j_range:
            for i in i_range:
                for c_out in c_range:
                    acc = 0.0
                    for c_in in range(channels):
                        for k in range(ksize):
                            for m in range(ksize):
                                if k == kcenter and m == kcenter and c_in == c_out:
                                    continue
                                j_ = j + (k - kcenter) * dilation
                                i_ = i + (m - kcenter) * dilation
                                if not (0 <= j_ < height and 0 <= i_ < width):
                                    continue
                                acc -= w[k, m, c_in, c_out] * x[bb, j_, i_, c_in]
                    x[bb, j, i, c_out] = (acc + z[bb, j, i, c_out]) / w[kcenter, kcenter, c_out, c_out]
    return x


def _codec_tables(levels, groups):
    """Slot tables for the C++ decoder: per-word prefix offsets plus
    flat (gidx, radix, prediv) slot arrays (framecodec._plan_words
    format — gidx indexes block_in_strip*64 + position; a split
    position's digits recombine as digit*prediv)."""
    nw = len(groups)
    lev = np.ascontiguousarray(np.asarray(levels, np.int64))
    off = np.zeros(nw + 1, np.int64)
    gidx, radix, prediv = [], [], []
    for gi, grp in enumerate(groups):
        for idx, r, pd in grp:
            gidx.append(idx)
            radix.append(r)
            prediv.append(pd)
        off[gi + 1] = len(gidx)
    mk = lambda a: np.ascontiguousarray(np.asarray(a if a else [1], np.int64))
    return nw, lev, off, mk(gidx), mk(radix), mk(prediv)


_I64P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
_U8P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _decode_plane(packed: np.ndarray, H: int, W: int, levels, groups, qstep: float,
                  strip: int) -> np.ndarray:
    """One plane of the DCT frame codec: packed (B, strips*nw*4) uint8
    -> centered f32 (B, H, W). Coefficient indices are row-major within
    the 8x8 block. See native/framecodec.cpp."""
    lib = _lib()
    assert lib is not None
    B = packed.shape[0]
    nw, lev, off, idx, rad, pdv = _codec_tables(levels, groups)
    out = np.empty((B, H, W), np.float32)
    packed = np.ascontiguousarray(packed)
    rc = lib.framecodec_decode_plane_f32(
        _U8P(packed), B, H, W, strip, nw, _I64P(off), _I64P(idx), _I64P(rad),
        _I64P(pdv), _I64P(lev), float(qstep),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"framecodec_decode_plane_f32 failed with code {rc}")
    return out


def framecodec_decode_chunk_u8(intra: np.ndarray, deltas, codec, n_frames: int) -> np.ndarray:
    """Full DPCM chunk decode straight into the I420 frame layout:
    intra (frame_bytes,) + flat deltas ([luma | u | v] sections, chroma
    on the codec's keyframe lattice) -> (T, 3H/2, W) uint8, one C++
    pass per plane (accumulation, chroma interpolation, rounding).
    Raises if the native lib is unavailable."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native lib unavailable")
    ci, cd = codec.intra, codec.delta
    H, W = ci.height, ci.width
    T = int(n_frames)
    intra = np.ascontiguousarray(np.asarray(intra, np.uint8).reshape(-1))
    flat = np.ascontiguousarray(
        np.zeros((0,), np.uint8) if deltas is None else np.asarray(deltas, np.uint8).reshape(-1))
    out = np.empty((T, 3 * H // 2, W), np.uint8)
    frame_stride = out.strides[0]

    ks_full = np.ascontiguousarray(np.arange(T, dtype=np.int64))
    ks_chroma = np.ascontiguousarray(np.asarray(codec.chroma_keyframes(T), np.int64))
    sy = (T - 1) * codec.luma_delta_bytes
    sc = (len(ks_chroma) - 1) * codec.chroma_delta_bytes

    # escape sections trail the base sections in [counts values] pairs
    # per plane (framecodec.encode_chunk layout); offsets per
    # (delta frame, strip) derive from the uint16 counts by prefix sum
    def esc_arrays(off, cbytes, vbytes):
        if vbytes == 0:
            return None, None, off
        counts = np.frombuffer(flat[off : off + cbytes].tobytes(), dtype="<u2").astype(np.int64)
        offs = np.ascontiguousarray(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32))
        vals = np.ascontiguousarray(flat[off + cbytes : off + cbytes + vbytes])
        return offs, vals, off + cbytes + vbytes

    ecy, evy = codec.esc_section_bytes(T - 1, "y")
    ecc, evc = codec.esc_section_bytes(len(ks_chroma) - 1, "c")
    eoff = sy + 2 * sc
    off_y, val_y, eoff = esc_arrays(eoff, ecy, evy)
    off_u, val_u, eoff = esc_arrays(eoff, ecc, evc)
    off_v, val_v, eoff = esc_arrays(eoff, ecc, evc)

    def ord_arr(flags):
        if not flags:
            return None
        return np.ascontiguousarray(np.asarray(flags, np.int64))

    o2y, o2c = ord_arr(getattr(codec, "order2_y", ())), ord_arr(getattr(codec, "order2_c", ()))
    plane_geom = [
        (H, W, 0, ci.plane_bytes_y, flat[:sy], ks_full, ci.strip_y,
         ci.levels_y, ci.groups_y, ci.qstep_y, cd.levels_y, cd.groups_y, cd.qstep_y,
         off_y, val_y, o2y),
        (H // 2, W // 2, H * W, ci.plane_bytes_c, flat[sy : sy + sc], ks_chroma, ci.strip_c,
         ci.levels_c, ci.groups_c, ci.qstep_c, cd.levels_c, cd.groups_c, cd.qstep_c,
         off_u, val_u, o2c),
        (H // 2, W // 2, H * W + H * W // 4, ci.plane_bytes_c, flat[sy + sc : sy + 2 * sc],
         ks_chroma, ci.strip_c,
         ci.levels_c, ci.groups_c, ci.qstep_c, cd.levels_c, cd.groups_c, cd.qstep_c,
         off_v, val_v, o2c),
    ]
    ioff = 0
    base = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    _I32P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    _I16P = lambda a: ctypes.cast(a.ctypes.data, ctypes.POINTER(ctypes.c_int16))
    for (ph, pw, out_off, isz, dsec, ks, strip, lev_i, grp_i, q_i, lev_d, grp_d, q_d,
         eoffs, evals, o2) in plane_geom:
        nw_i, li, oi, xi, ri, pi = _codec_tables(lev_i, grp_i)
        nw_d, ld, od, xd, rd, pd = _codec_tables(lev_d, grp_d)
        isec = np.ascontiguousarray(intra[ioff : ioff + isz])
        dsec = np.ascontiguousarray(dsec)
        dst = ctypes.cast(ctypes.addressof(base.contents) + out_off, ctypes.POINTER(ctypes.c_uint8))
        args = (
            _U8P(isec), _U8P(dsec), len(ks), _I64P(ks), ph, pw, strip,
            nw_i, _I64P(oi), _I64P(xi), _I64P(ri), _I64P(pi), _I64P(li), float(q_i),
            nw_d, _I64P(od), _I64P(xd), _I64P(rd), _I64P(pd), _I64P(ld), float(q_d),
            dst, frame_stride,
            None if eoffs is None else _I32P(eoffs),
            None if evals is None else _I16P(evals),
            None if o2 is None else _I64P(o2),
        )
        rc = 2
        if lib.framecodec_simd_available():
            rc = lib.framecodec_decode_plane_chunk_u8_simd(*args)
        if rc == 2:  # no AVX-512 / ragged strip count: scalar kernel
            rc = lib.framecodec_decode_plane_chunk_u8(*args)
        if rc != 0:
            raise ValueError(f"framecodec_decode_plane_chunk_u8 failed with code {rc}")
        ioff += isz
    return out


def framecodec_decode_planes(packed: np.ndarray, cfg):
    """(B, frame_bytes) uint8 -> centered f32 (y, u, v) planes via the
    C++ kernel; raises if the native lib is unavailable (the caller
    falls back to numpy)."""
    if _lib() is None:
        raise RuntimeError("native lib unavailable")
    B = packed.shape[0]
    H, W = cfg.height, cfg.width
    sy = cfg.plane_bytes_y
    sc = cfg.plane_bytes_c
    y = _decode_plane(packed[:, :sy], H, W, cfg.levels_y, cfg.groups_y, cfg.qstep_y,
                      cfg.strip_y)
    u = _decode_plane(packed[:, sy : sy + sc], H // 2, W // 2, cfg.levels_c, cfg.groups_c,
                      cfg.qstep_c, cfg.strip_c)
    v = _decode_plane(packed[:, sy + sc :], H // 2, W // 2, cfg.levels_c, cfg.groups_c,
                      cfg.qstep_c, cfg.strip_c)
    return y, u, v


# -------------------------------------------------- on-device variants
def quantile_device(values, qs):
    """Sort-based quantiles on device (for envelopes living in HBM) —
    the jnp counterpart of efficient_quantile (SURVEY 2.13#1)."""
    import jax.numpy as jnp

    return jnp.quantile(jnp.asarray(values).reshape(-1), jnp.asarray(qs))


def inverse_conv_device(z, w, is_upper: bool = False, dilation: int = 1):
    """lax.scan raster back-substitution on device. Inherently
    sequential per pixel — provided for completeness (SURVEY 2.13#2);
    prefer the host kernel for bulk work."""
    import jax
    import jax.numpy as jnp

    z = jnp.asarray(z)
    w = jnp.asarray(w)
    b, height, width, channels = z.shape
    ksize = w.shape[0]
    kcenter = (ksize - 1) // 2
    n = height * width

    order = jnp.arange(n) if is_upper else jnp.arange(n)[::-1]

    def body(x, flat_idx):
        j = flat_idx // width
        i = flat_idx % width
        # gather the kxk neighborhood (zero-padded)
        acc = jnp.zeros((b, channels), z.dtype)
        for k in range(ksize):
            for m in range(ksize):
                j_ = j + (k - kcenter) * dilation
                i_ = i + (m - kcenter) * dilation
                valid = (j_ >= 0) & (j_ < height) & (i_ >= 0) & (i_ < width)
                jc = jnp.clip(j_, 0, height - 1)
                ic = jnp.clip(i_, 0, width - 1)
                neigh = jnp.where(valid, x[:, jc, ic, :], 0.0)  # (B, C)
                wk = w[k, m]  # (C_in, C_out)
                if k == kcenter and m == kcenter:
                    wk = wk - jnp.diag(jnp.diag(wk))
                    # center tap: only same-pixel cross-channel terms,
                    # which are resolved channel-sequentially below
                acc = acc + neigh @ wk
        diag = jnp.diagonal(w[kcenter, kcenter])
        val = (z[:, j, i, :] - acc) / diag
        x = x.at[:, j, i, :].set(val)
        return x, None

    x0 = jnp.zeros_like(z)
    x, _ = jax.lax.scan(body, x0, order)
    return x
