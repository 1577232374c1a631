// Native host-side ops for dexnerf_tpu.
//
// The reference's one native component is the torchsearchsorted CUDA/C++
// extension (reference requirements.txt:9, used by nerf_helpers.py:290).
// On TPU the device-side equivalent is the Pallas fused sample_pdf kernel;
// this library provides the HOST-side native path: batched right-bisect
// searchsorted (for CPU pipelines / offline cache tooling) and the hot parts
// of the host data pipeline (ray packing and random ray-batch gathering),
// which in the reference are Python loops in cache_dataset.py.
//
// Built as a plain shared library (no pybind11 in this image); consumed via
// ctypes from dexnerf_tpu.ops.native.

#include <cstdint>
#include <cstring>
#include <random>

extern "C" {

// Batched searchsorted, side="right": for each row b and query j,
// out[b, j] = number of entries in cdf[b, :] <= u[b, j].
// cdf: [B, M] ascending per row; u: [B, N]; out: [B, N] int32.
void searchsorted_right_f32(const float* cdf, const float* u, int32_t B,
                            int32_t M, int32_t N, int32_t* out) {
  for (int32_t b = 0; b < B; ++b) {
    const float* row = cdf + static_cast<int64_t>(b) * M;
    const float* q = u + static_cast<int64_t>(b) * N;
    int32_t* o = out + static_cast<int64_t>(b) * N;
    for (int32_t j = 0; j < N; ++j) {
      // branchless-ish binary search for upper bound
      int32_t lo = 0, hi = M;
      const float v = q[j];
      while (lo < hi) {
        const int32_t mid = (lo + hi) >> 1;
        if (row[mid] <= v) {
          lo = mid + 1;
        } else {
          hi = mid;
        }
      }
      o[j] = lo;
    }
  }
}

// Inverse-CDF linear interpolation given precomputed indices (the second
// half of sample_pdf): mirrors the clamped below/above gather + guarded
// lerp (reference nerf_helpers.py:291-303).
// cdf/bins: [B, M]; u: [B, N]; inds: [B, N]; out: [B, N].
void sample_pdf_interp_f32(const float* cdf, const float* bins, const float* u,
                           const int32_t* inds, int32_t B, int32_t M,
                           int32_t N, float* out) {
  for (int32_t b = 0; b < B; ++b) {
    const float* c = cdf + static_cast<int64_t>(b) * M;
    const float* z = bins + static_cast<int64_t>(b) * M;
    const float* q = u + static_cast<int64_t>(b) * N;
    const int32_t* id = inds + static_cast<int64_t>(b) * N;
    float* o = out + static_cast<int64_t>(b) * N;
    for (int32_t j = 0; j < N; ++j) {
      int32_t below = id[j] - 1;
      if (below < 0) below = 0;
      int32_t above = id[j];
      if (above > M - 1) above = M - 1;
      const float c0 = c[below], c1 = c[above];
      float denom = c1 - c0;
      if (denom < 1e-5f) denom = 1.0f;
      const float t = (q[j] - c0) / denom;
      o[j] = z[below] + t * (z[above] - z[below]);
    }
  }
}

// Pack per-pixel rays + rgb into flat [H*W, 12] rows:
// (origin xyz, direction xyz, viewdir xyz, rgb).
// ro/rd: [H*W, 3]; rgb: [H*W, 3]; out: [H*W, 12].
void pack_rays_f32(const float* ro, const float* rd, const float* rgb,
                   int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    float* row = out + i * 12;
    std::memcpy(row, ro + i * 3, 3 * sizeof(float));
    std::memcpy(row + 3, rd + i * 3, 3 * sizeof(float));
    const float dx = rd[i * 3], dy = rd[i * 3 + 1], dz = rd[i * 3 + 2];
    float inv = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
    row[6] = dx * inv;
    row[7] = dy * inv;
    row[8] = dz * inv;
    std::memcpy(row + 9, rgb + i * 3, 3 * sizeof(float));
  }
}

// Gather a random batch of packed rows (host-side batch assembly for
// pipelines that keep the ray store in host RAM). Deterministic in `seed`.
// store: [n, width]; out: [batch, width].
void gather_random_rows_f32(const float* store, int64_t n, int32_t width,
                            int64_t seed, int32_t batch, float* out) {
  std::mt19937_64 rng(static_cast<uint64_t>(seed));
  std::uniform_int_distribution<int64_t> dist(0, n - 1);
  for (int32_t i = 0; i < batch; ++i) {
    const int64_t idx = dist(rng);
    std::memcpy(out + static_cast<int64_t>(i) * width,
                store + idx * width, static_cast<size_t>(width) * sizeof(float));
  }
}

}  // extern "C"
