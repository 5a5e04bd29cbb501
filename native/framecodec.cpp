// Host-side decoder for the on-device DCT frame codec
// (maua_tpu/ops/framecodec.py). The device packs quantized 8x8 DCT
// coefficients into mixed-radix uint32 words; this kernel unpacks,
// dequantizes and inverse-transforms one plane, OpenMP-parallel over
// blocks — the decode must keep up with the device->host fetch so the
// ffmpeg pipe (maua_tpu/ops/video.py) never stalls on it.
//
// Replaces the role of host-side swscale in the reference's rawvideo
// pipe (maua/ops/video.py:42-77); numpy fallback lives in
// framecodec._host_unpack/_host_idct.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// Exact unsigned division by a constant via multiply-shift (libdivide
// style): q = (w * M) >> s for all w < 2^32 when M = ceil(2^s / L),
// s = 32 + ceil(log2(L)). Hardware divides dominated the unpack loop
// (~1M divmods per 1024^2 frame); this makes them two multiplies.
struct MagicDiv {
  uint64_t M;
  int s;
  uint32_t L;
  void init(uint32_t l) {
    L = l;
    int lg = 0;
    while ((1u << lg) < l) ++lg;
    s = 32 + lg;
    M = ((static_cast<unsigned __int128>(1) << s) + l - 1) / l;
  }
  inline uint32_t divmod(uint32_t w, uint32_t* rem) const {
    uint32_t q = static_cast<uint32_t>(
        (static_cast<unsigned __int128>(w) * M) >> s);
    *rem = w - q * L;
    return q;
  }
};

struct DctTable {
  float D[8][8];  // orthonormal DCT-II matrix
  DctTable() {
    const double pi = 3.14159265358979323846;
    for (int k = 0; k < 8; ++k)
      for (int n = 0; n < 8; ++n) {
        double v = 0.5 * std::cos((2 * n + 1) * k * pi / 16.0);
        if (k == 0) v *= 1.0 / std::sqrt(2.0);
        D[k][n] = static_cast<float>(v);
      }
  }
};
const DctTable kDct;

}  // namespace

extern "C" {

// packed: (B, nb, nw) little-endian uint32 words as raw bytes.
// levels/zigzag: 64 entries. group_off: nw+1 prefix offsets into
// group_idx (live zigzag positions per word). out: (B, H, W) f32,
// centered samples (add 128 for display range).
int framecodec_decode_plane_f32(const uint8_t* packed, int64_t B, int64_t H,
                                int64_t W, int64_t nw, const int64_t* levels,
                                const int64_t* group_off,
                                const int64_t* group_idx,
                                const int64_t* zigzag, double qstep,
                                float* out) {
  if (H % 8 || W % 8) return 1;
  const int64_t bh = H / 8, bw = W / 8;
  const int64_t nb = bh * bw;
  const int64_t total = B * nb;

#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < total; ++t) {
    const int64_t b = t / nb, blk = t % nb;
    const int64_t by = blk / bw, bx = blk % bw;
    const uint8_t* src = packed + (t * nw) * 4;

    float coef[64];
    std::memset(coef, 0, sizeof(coef));
    for (int64_t w = 0; w < nw; ++w) {
      uint32_t word = static_cast<uint32_t>(src[w * 4]) |
                      (static_cast<uint32_t>(src[w * 4 + 1]) << 8) |
                      (static_cast<uint32_t>(src[w * 4 + 2]) << 16) |
                      (static_cast<uint32_t>(src[w * 4 + 3]) << 24);
      for (int64_t k = group_off[w]; k < group_off[w + 1]; ++k) {
        const int64_t i = group_idx[k];
        const uint32_t L = static_cast<uint32_t>(levels[i]);
        const int32_t v = static_cast<int32_t>(word % L);
        word /= L;
        coef[zigzag[i]] =
            static_cast<float>(v - static_cast<int32_t>((L - 1) / 2)) *
            static_cast<float>(qstep);
      }
    }

    // x = D^T X D (inverse of X = D x D^T)
    float tmp[8][8];
    for (int i = 0; i < 8; ++i)
      for (int j = 0; j < 8; ++j) {
        float acc = 0.f;
        for (int u = 0; u < 8; ++u) acc += kDct.D[u][i] * coef[u * 8 + j];
        tmp[i][j] = acc;
      }
    float* dst = out + (b * H + by * 8) * W + bx * 8;
    for (int i = 0; i < 8; ++i) {
      for (int j = 0; j < 8; ++j) {
        float acc = 0.f;
        for (int v = 0; v < 8; ++v) acc += tmp[i][v] * kDct.D[v][j];
        dst[i * W + j] = acc;
      }
    }
  }
  return 0;
}

// DPCM chunk decode for one plane, straight to uint8: the intra frame
// plus (nkf-1) delta frames accumulate per block entirely in
// registers/L1; coded frames land at `keyframes[k]` and frames between
// consecutive keyframes are linearly interpolated (temporal chroma
// subsampling — for full-rate planes pass keyframes = 0..T-1). Each
// emitted frame's samples are written as clip(round(acc + 128)) into
// the caller's frame-strided output (so the bytes land directly inside
// a (T, 3H/2, W) I420 array). One pass, no float arrays in memory.
extern "C" int framecodec_decode_plane_chunk_u8(
    const uint8_t* intra, const uint8_t* deltas, int64_t nkf,
    const int64_t* keyframes, int64_t H, int64_t W, int64_t nw_i,
    const int64_t* levels_i, const int64_t* goff_i, const int64_t* gidx_i,
    double qstep_i, int64_t nw_d, const int64_t* levels_d,
    const int64_t* goff_d, const int64_t* gidx_d, double qstep_d,
    uint8_t* out, int64_t frame_stride) {
  if (H % 8 || W % 8 || nkf < 1) return 1;
  const int64_t bh = H / 8, bw = W / 8;
  const int64_t nb = bh * bw;

  // precompute magic divisors + centered dequant scales per live slot
  const int64_t nlive_i = goff_i[nw_i], nlive_d = goff_d[nw_d];
  MagicDiv* mag_i = new MagicDiv[nlive_i > 0 ? nlive_i : 1];
  MagicDiv* mag_d = new MagicDiv[nlive_d > 0 ? nlive_d : 1];
  for (int64_t k = 0; k < nlive_i; ++k)
    mag_i[k].init(static_cast<uint32_t>(levels_i[gidx_i[k]]));
  for (int64_t k = 0; k < nlive_d; ++k)
    mag_d[k].init(static_cast<uint32_t>(levels_d[gidx_d[k]]));

#pragma omp parallel for schedule(static)
  for (int64_t blk = 0; blk < nb; ++blk) {
    const int64_t by = blk / bw, bx = blk % bw;
    float acc[64];
    float prev[64];

    auto unpack_idct = [&](const uint8_t* src, int64_t nw,
                           const int64_t* levels, const int64_t* goff,
                           const int64_t* gidx, const MagicDiv* mag,
                           float qstep, float* px, bool add) {
      float coef[64];
      std::memset(coef, 0, sizeof(coef));
      for (int64_t w = 0; w < nw; ++w) {
        uint32_t word = static_cast<uint32_t>(src[w * 4]) |
                        (static_cast<uint32_t>(src[w * 4 + 1]) << 8) |
                        (static_cast<uint32_t>(src[w * 4 + 2]) << 16) |
                        (static_cast<uint32_t>(src[w * 4 + 3]) << 24);
        for (int64_t k = goff[w]; k < goff[w + 1]; ++k) {
          const int64_t i = gidx[k];
          uint32_t v;
          word = mag[k].divmod(word, &v);
          coef[i] = static_cast<float>(
                        static_cast<int32_t>(v) -
                        static_cast<int32_t>((mag[k].L - 1) / 2)) * qstep;
        }
      }
      float tmp[8][8];
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 8; ++j) {
          float a = 0.f;
          for (int u = 0; u < 8; ++u) a += kDct.D[u][i] * coef[u * 8 + j];
          tmp[i][j] = a;
        }
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 8; ++j) {
          float a = 0.f;
          for (int v = 0; v < 8; ++v) a += tmp[i][v] * kDct.D[v][j];
          if (add)
            px[i * 8 + j] += a;
          else
            px[i * 8 + j] = a;
        }
    };

    auto emit = [&](int64_t t, const float* px) {
      uint8_t* dst = out + t * frame_stride + (by * 8) * W + bx * 8;
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 8; ++j) {
          float v = px[i * 8 + j] + 128.5f;
          v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
          dst[i * W + j] = static_cast<uint8_t>(v);
        }
    };

    unpack_idct(intra + blk * nw_i * 4, nw_i, levels_i, goff_i, gidx_i,
                mag_i, static_cast<float>(qstep_i), acc, false);
    emit(keyframes[0], acc);
    for (int64_t k = 1; k < nkf; ++k) {
      std::memcpy(prev, acc, sizeof(acc));
      const uint8_t* src = deltas + ((k - 1) * nb + blk) * nw_d * 4;
      unpack_idct(src, nw_d, levels_d, goff_d, gidx_d,
                  mag_d, static_cast<float>(qstep_d), acc, true);
      const int64_t a = keyframes[k - 1], b = keyframes[k];
      for (int64_t j = a + 1; j < b; ++j) {
        const float w = static_cast<float>(j - a) / static_cast<float>(b - a);
        float px[64];
        for (int i = 0; i < 64; ++i) px[i] = (1.f - w) * prev[i] + w * acc[i];
        emit(j, px);
      }
      emit(b, acc);
    }
  }
  delete[] mag_i;
  delete[] mag_d;
  return 0;
}

}  // extern "C"
