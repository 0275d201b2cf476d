// Native host-side runtime helpers (C ABI, loaded via ctypes).
//
// ≙ the reference's host-side native surface: simple-knn's Morton-ordered
// 3-NN scale initialization (submodules/simple-knn/simple_knn.cu:45-70 —
// there a CUDA kernel; here a multithreaded CPU implementation, since on TPU
// this is a one-shot host-side preprocessing step) and the PLY parsing hot
// path that the reference delegates to the plyfile package.
//
// Build: g++ -O3 -march=native -shared -fPIC -o irgs_native.so irgs_native.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint64_t expand_bits(uint64_t v) {
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

inline uint64_t morton3d(float x, float y, float z) {
  // x,y,z normalized to [0,1]
  auto q = [](float f) {
    int v = (int)(f * 2097151.0f);  // 21 bits
    return (uint64_t)std::min(std::max(v, 0), (1 << 21) - 1);
  };
  return (expand_bits(q(x)) << 2) | (expand_bits(q(y)) << 1) | expand_bits(q(z));
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t chunk = (n + hw - 1) / hw;
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < hw; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Mean squared distance to the k nearest neighbors, approximated with a
// Morton-order window search (window w on each side), matching simple-knn's
// approach. points: [n,3] float32; out: [n] float32.
void mean_knn_dist2(const float* points, int64_t n, int k, int window,
                    float* out) {
  if (n == 0) return;
  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], points[3 * i + d]);
      hi[d] = std::max(hi[d], points[3 * i + d]);
    }
  float inv[3];
  for (int d = 0; d < 3; ++d) {
    float ext = hi[d] - lo[d];
    inv[d] = ext > 0 ? 1.0f / ext : 0.0f;
  }

  std::vector<std::pair<uint64_t, int64_t>> order(n);
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      const float* p = points + 3 * i;
      order[i] = {morton3d((p[0] - lo[0]) * inv[0], (p[1] - lo[1]) * inv[1],
                           (p[2] - lo[2]) * inv[2]),
                  i};
    }
  });
  std::sort(order.begin(), order.end());

  parallel_for(n, [&](int64_t a, int64_t b) {
    std::vector<float> best(k);
    for (int64_t r = a; r < b; ++r) {
      int64_t i = order[r].second;
      const float* p = points + 3 * i;
      for (int j = 0; j < k; ++j) best[j] = 1e30f;
      int64_t w0 = std::max<int64_t>(0, r - window);
      int64_t w1 = std::min<int64_t>(n, r + window + 1);
      for (int64_t s = w0; s < w1; ++s) {
        if (s == r) continue;
        const float* q = points + 3 * order[s].second;
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < best[k - 1]) {
          best[k - 1] = d2;
          for (int j = k - 1; j > 0 && best[j] < best[j - 1]; --j)
            std::swap(best[j], best[j - 1]);
        }
      }
      float acc = 0;
      for (int j = 0; j < k; ++j) acc += best[j];
      out[i] = acc / k;
    }
  });
}

// Deinterleave a binary-little-endian PLY vertex payload of `n` records with
// `n_fields` float32 properties into column-major [n_fields][n] output.
// (plyfile does this record-by-record in Python.)
void ply_deinterleave_f32(const uint8_t* payload, int64_t n, int n_fields,
                          float* out) {
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      const float* rec = (const float*)(payload + (int64_t)i * n_fields * 4);
      for (int f = 0; f < n_fields; ++f) out[(int64_t)f * n + i] = rec[f];
    }
  });
}

// Interleave column arrays into a binary PLY vertex payload (inverse of the
// above), used by save_ply on large models.
void ply_interleave_f32(const float* cols, int64_t n, int n_fields,
                        uint8_t* out) {
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      float* rec = (float*)(out + (int64_t)i * n_fields * 4);
      for (int f = 0; f < n_fields; ++f) rec[f] = cols[(int64_t)f * n + i];
    }
  });
}

}  // extern "C"
