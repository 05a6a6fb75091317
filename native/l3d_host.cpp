// learning3d_tpu native host-preprocessing kernels.
//
// The device compute path is JAX/XLA/Pallas; this library accelerates the
// HOST side of the data pipeline (the role the reference's CUDA
// extensions play for its hot ops, and its DataLoader workers play for
// preprocessing): greedy farthest-point subsampling, brute-force kNN and
// jitter over float32 clouds, callable through a plain C ABI (ctypes).
//
// Build: g++ -O3 -march=native -shared -fPIC l3d_host.cpp -o libl3d_host.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <algorithm>
#include <vector>

extern "C" {

// Greedy farthest-point sampling over pts (n x 3), writing m indices.
// start_index < 0 means "derive a deterministic start from seed".
void l3d_fps(const float* pts, int32_t n, int32_t m, int32_t start_index,
             int32_t* out_idx) {
  std::vector<float> dist(n, std::numeric_limits<float>::max());
  int32_t cur = start_index >= 0 ? start_index : 0;
  for (int32_t i = 0; i < m; ++i) {
    out_idx[i] = cur;
    const float cx = pts[cur * 3 + 0];
    const float cy = pts[cur * 3 + 1];
    const float cz = pts[cur * 3 + 2];
    float best = -1.0f;
    int32_t best_j = 0;
    for (int32_t j = 0; j < n; ++j) {
      const float dx = pts[j * 3 + 0] - cx;
      const float dy = pts[j * 3 + 1] - cy;
      const float dz = pts[j * 3 + 2] - cz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[j]) dist[j] = d;
      if (dist[j] > best) {
        best = dist[j];
        best_j = j;
      }
    }
    cur = best_j;
  }
}

// Brute-force kNN: for each of q queries, the k nearest of pts (n x 3),
// nearest first. out_idx is q x k.
void l3d_knn(const float* pts, int32_t n, const float* queries, int32_t q,
             int32_t k, int32_t* out_idx) {
  std::vector<std::pair<float, int32_t>> cand(n);
  for (int32_t i = 0; i < q; ++i) {
    const float qx = queries[i * 3 + 0];
    const float qy = queries[i * 3 + 1];
    const float qz = queries[i * 3 + 2];
    for (int32_t j = 0; j < n; ++j) {
      const float dx = pts[j * 3 + 0] - qx;
      const float dy = pts[j * 3 + 1] - qy;
      const float dz = pts[j * 3 + 2] - qz;
      cand[j] = {dx * dx + dy * dy + dz * dz, j};
    }
    const int32_t kk = k < n ? k : n;
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    for (int32_t t = 0; t < kk; ++t) out_idx[i * k + t] = cand[t].second;
    for (int32_t t = kk; t < k; ++t) out_idx[i * k + t] = cand[kk - 1].second;
  }
}

// xorshift64* PRNG — deterministic, seedable, no libc rand state.
static inline uint64_t xorshift(uint64_t* s) {
  uint64_t x = *s;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  *s = x;
  return x * 0x2545F4914F6CDD1DULL;
}

static inline float uniform01(uint64_t* s) {
  return (xorshift(s) >> 40) * (1.0f / 16777216.0f);
}

// Clipped gaussian jitter (Box-Muller), matching the reference noise
// model: sigma scaled by a per-call uniform (dataloaders.py:63-67).
void l3d_jitter(float* pts, int32_t n3, float sigma, float clip,
                uint64_t seed) {
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
  const float scale = sigma * uniform01(&s);
  for (int32_t i = 0; i < n3; i += 2) {
    float u1 = uniform01(&s);
    float u2 = uniform01(&s);
    if (u1 < 1e-7f) u1 = 1e-7f;
    const float r = std::sqrt(-2.0f * std::log(u1));
    float g1 = r * std::cos(6.2831853f * u2) * scale;
    float g2 = r * std::sin(6.2831853f * u2) * scale;
    g1 = std::max(-clip, std::min(clip, g1));
    g2 = std::max(-clip, std::min(clip, g2));
    pts[i] += g1;
    if (i + 1 < n3) pts[i + 1] += g2;
  }
}

}  // extern "C"
