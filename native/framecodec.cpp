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

}  // extern "C"
