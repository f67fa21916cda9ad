// Host-side point-cloud preprocessing kernels (C extension, ctypes ABI).
//
// The TPU-native runtime keeps all *device* compute in XLA/Pallas; this library
// covers the CPU data-loader hot path that the reference delegated to native
// code elsewhere: greedy farthest-point sampling for offline dataset caching
// (datasets/ModelNetDataset.py:29-50 runs an O(N*S) pure-numpy loop per cloud),
// unit-sphere normalization, and kNN for CPU-side preprocessing. Compiled with
// -O3 -march=native -fopenmp by act_tpu.native at import time.

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Greedy FPS over a batch. pts: (B, N, 3) float32, out: (B, S) int64.
// Deterministic start at index 0 (matches the device kernel).
void fps_batch(const float* pts, int64_t B, int64_t N, int64_t S,
               int64_t* out, float* workspace /* B*N floats */) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t b = 0; b < B; ++b) {
    const float* p = pts + b * N * 3;
    int64_t* idx = out + b * S;
    float* dist = workspace + b * N;
    for (int64_t i = 0; i < N; ++i) dist[i] = FLT_MAX;
    int64_t last = 0;
    idx[0] = 0;
    for (int64_t s = 1; s < S; ++s) {
      const float lx = p[last * 3], ly = p[last * 3 + 1], lz = p[last * 3 + 2];
      float best = -1.0f;
      int64_t best_i = 0;
      for (int64_t i = 0; i < N; ++i) {
        const float dx = p[i * 3] - lx;
        const float dy = p[i * 3 + 1] - ly;
        const float dz = p[i * 3 + 2] - lz;
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < dist[i]) dist[i] = d;
        if (dist[i] > best) { best = dist[i]; best_i = i; }
      }
      idx[s] = best_i;
      last = best_i;
    }
  }
}

// Center to centroid + scale to unit sphere, in place. pts: (B, N, C>=3).
void normalize_batch(float* pts, int64_t B, int64_t N, int64_t C) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t b = 0; b < B; ++b) {
    float* p = pts + b * N * C;
    double cx = 0, cy = 0, cz = 0;
    for (int64_t i = 0; i < N; ++i) {
      cx += p[i * C];
      cy += p[i * C + 1];
      cz += p[i * C + 2];
    }
    cx /= N; cy /= N; cz /= N;
    float m2 = 0.0f;
    for (int64_t i = 0; i < N; ++i) {
      p[i * C] -= (float)cx;
      p[i * C + 1] -= (float)cy;
      p[i * C + 2] -= (float)cz;
      const float r2 = p[i * C] * p[i * C] + p[i * C + 1] * p[i * C + 1] +
                       p[i * C + 2] * p[i * C + 2];
      if (r2 > m2) m2 = r2;
    }
    const float inv = 1.0f / (sqrtf(m2) + 1e-12f);
    for (int64_t i = 0; i < N; ++i) {
      p[i * C] *= inv;
      p[i * C + 1] *= inv;
      p[i * C + 2] *= inv;
    }
  }
}

// Brute-force kNN: ref (B, N, 3), query (B, Q, 3) -> idx (B, Q, K) int64.
// Insertion into a small max-heap-free sorted buffer (K is small: 3..32).
void knn_batch(const float* ref, const float* query, int64_t B, int64_t N,
               int64_t Q, int64_t K, int64_t* out_idx, float* out_dist) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t b = 0; b < B; ++b) {
    const float* r = ref + b * N * 3;
    const float* q = query + b * Q * 3;
    for (int64_t j = 0; j < Q; ++j) {
      const float qx = q[j * 3], qy = q[j * 3 + 1], qz = q[j * 3 + 2];
      float* bd = out_dist + (b * Q + j) * K;
      int64_t* bi = out_idx + (b * Q + j) * K;
      for (int64_t k = 0; k < K; ++k) { bd[k] = FLT_MAX; bi[k] = 0; }
      for (int64_t i = 0; i < N; ++i) {
        const float dx = r[i * 3] - qx;
        const float dy = r[i * 3 + 1] - qy;
        const float dz = r[i * 3 + 2] - qz;
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < bd[K - 1]) {
          int64_t k = K - 1;
          while (k > 0 && bd[k - 1] > d) {
            bd[k] = bd[k - 1];
            bi[k] = bi[k - 1];
            --k;
          }
          bd[k] = d;
          bi[k] = i;
        }
      }
    }
  }
}

int num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
