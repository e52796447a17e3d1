// Permutohedral-lattice dense-CRF mean field (CPU, binary labels).
//
// A from-scratch implementation of high-dimensional Gaussian filtering on
// the permutohedral lattice (Adams, Baek, Davis 2010) plus the mean-field
// loop used by RCF's torchCRF extension. This is the host-side/native
// counterpart of rcf_tpu/ops/crf.py (which computes the same normalized
// Gaussian filter exactly via chunked attention on TPU): it provides an
// O(N) CPU path for post-processing without an accelerator and a second,
// algorithmically independent implementation for cross-validation.
//
// Semantics mirrored from the reference CUDA extension
// (tools/torchCRF/src/*.cu):
//   Q0 = softmax(-unary);  per iter: Q = softmax(-unary + sum_k w_k G_k(Q))
// where G is the lattice-approximated *normalized* Gaussian filter
// (homogeneous coordinate divided out at slice time) and the filter
// includes the self term.
//
// Exposed C API (ctypes-friendly):
//   rcf_crf_soft(rgb[H*W*3] u8, mask01[H*W] f32, H, W,
//                scomp_smooth, sxy_smooth, scomp_app, sxy_app, srgb,
//                iters, crf_scale, out[H*W] f32)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Hash for lattice keys (d int16 coordinates).
struct KeyHash {
  size_t operator()(const std::vector<short>& k) const {
    size_t h = 0;
    for (short v : k) h = h * 2531011u + static_cast<size_t>(v + 32768);
    return h;
  }
};

class PermutohedralLattice {
 public:
  PermutohedralLattice(const float* features, int n, int d)
      : n_(n), d_(d), offsets_(static_cast<size_t>(n) * (d + 1)),
        weights_(static_cast<size_t>(n) * (d + 1)) {
    // Scale factors so that the lattice spacing matches a unit Gaussian.
    std::vector<float> scale(d_);
    const float inv_std_dev = std::sqrt(2.0f / 3.0f) * (d_ + 1);
    for (int i = 0; i < d_; ++i)
      scale[i] = inv_std_dev / std::sqrt((float)((i + 1) * (i + 2)));

    std::vector<float> elevated(d_ + 1);
    std::vector<short> greedy(d_ + 1), rank(d_ + 1), key(d_);
    std::vector<float> barycentric(d_ + 2);
    std::unordered_map<std::vector<short>, int, KeyHash> table;
    table.reserve(static_cast<size_t>(n) * 2);

    for (int i = 0; i < n_; ++i) {
      const float* f = features + static_cast<size_t>(i) * d_;
      // Embed into the hyperplane sum(x)=0 (E matrix application).
      float sm = 0.f;
      for (int j = d_; j > 0; --j) {
        float cf = f[j - 1] * scale[j - 1];
        elevated[j] = sm - j * cf;
        sm += cf;
      }
      elevated[0] = sm;

      // Round to the nearest remainder-0 lattice point.
      const float down = 1.0f / (d_ + 1);
      int sum = 0;
      for (int j = 0; j <= d_; ++j) {
        float v = elevated[j] * down;
        int up = (int)std::ceil(v) * (d_ + 1);
        int dn = (int)std::floor(v) * (d_ + 1);
        greedy[j] = (short)((up - elevated[j] < elevated[j] - dn) ? up : dn);
        sum += greedy[j];
      }
      sum /= (d_ + 1);

      // Rank differential coordinates, fix the simplex.
      for (int j = 0; j <= d_; ++j) rank[j] = 0;
      for (int j = 0; j < d_; ++j)
        for (int k = j + 1; k <= d_; ++k) {
          if (elevated[j] - greedy[j] < elevated[k] - greedy[k]) rank[j]++;
          else rank[k]++;
        }
      if (sum > 0) {
        for (int j = 0; j <= d_; ++j) {
          if (rank[j] >= d_ + 1 - sum) { greedy[j] -= (short)(d_ + 1); rank[j] += (short)(sum - (d_ + 1)); }
          else rank[j] += (short)sum;
        }
      } else if (sum < 0) {
        for (int j = 0; j <= d_; ++j) {
          if (rank[j] < -sum) { greedy[j] += (short)(d_ + 1); rank[j] += (short)(sum + (d_ + 1)); }
          else rank[j] += (short)sum;
        }
      }

      // Barycentric coordinates.
      for (int j = 0; j <= d_ + 1; ++j) barycentric[j] = 0.f;
      for (int j = 0; j <= d_; ++j) {
        float delta = (elevated[j] - greedy[j]) * down;
        barycentric[d_ - rank[j]] += delta;
        barycentric[d_ + 1 - rank[j]] -= delta;
      }
      barycentric[0] += 1.0f + barycentric[d_ + 1];

      // Register the d+1 simplex vertices.
      for (int rem = 0; rem <= d_; ++rem) {
        for (int j = 0; j < d_; ++j)
          key[j] = (short)(greedy[j] + rem + (rank[j] > d_ - rem ? -(d_ + 1) : 0));
        auto it = table.find(key);
        int idx;
        if (it == table.end()) {
          idx = (int)lattice_keys_.size();
          table.emplace(key, idx);
          lattice_keys_.push_back(key);
        } else {
          idx = it->second;
        }
        offsets_[static_cast<size_t>(i) * (d_ + 1) + rem] = idx;
        weights_[static_cast<size_t>(i) * (d_ + 1) + rem] = barycentric[rem];
      }
    }
    m_ = (int)lattice_keys_.size();

    // Precompute blur neighbours along each lattice axis.
    blur_n1_.assign(static_cast<size_t>(m_) * (d_ + 1), -1);
    blur_n2_.assign(static_cast<size_t>(m_) * (d_ + 1), -1);
    std::vector<short> nk(d_);
    for (int axis = 0; axis <= d_; ++axis) {
      for (int v = 0; v < m_; ++v) {
        const std::vector<short>& k = lattice_keys_[v];
        for (int j = 0; j < d_; ++j) nk[j] = (short)(k[j] + 1);
        if (axis < d_) nk[axis] = (short)(k[axis] - d_);
        auto it = table.find(nk);
        blur_n1_[static_cast<size_t>(axis) * m_ + v] = (it == table.end()) ? -1 : it->second;
        for (int j = 0; j < d_; ++j) nk[j] = (short)(k[j] - 1);
        if (axis < d_) nk[axis] = (short)(k[axis] + d_);
        it = table.find(nk);
        blur_n2_[static_cast<size_t>(axis) * m_ + v] = (it == table.end()) ? -1 : it->second;
      }
    }
  }

  // Normalized Gaussian filter of `values` [n, vd] -> out [n, vd].
  void Filter(const float* values, float* out, int vd) const {
    const int vh = vd + 1;  // homogeneous channel appended
    std::vector<float> lat(static_cast<size_t>(m_) * vh, 0.f);
    std::vector<float> tmp(static_cast<size_t>(m_) * vh, 0.f);

    // Splat.
    for (int i = 0; i < n_; ++i) {
      for (int r = 0; r <= d_; ++r) {
        int idx = offsets_[static_cast<size_t>(i) * (d_ + 1) + r];
        float w = weights_[static_cast<size_t>(i) * (d_ + 1) + r];
        float* cell = lat.data() + static_cast<size_t>(idx) * vh;
        for (int c = 0; c < vd; ++c) cell[c] += w * values[static_cast<size_t>(i) * vd + c];
        cell[vd] += w;
      }
    }

    // Blur along each axis: v' = (n1 + 2 v + n2) / 2 (relative scaling
    // cancels in the normalized slice).
    for (int axis = 0; axis <= d_; ++axis) {
      for (int v = 0; v < m_; ++v) {
        const float* self = lat.data() + static_cast<size_t>(v) * vh;
        int i1 = blur_n1_[static_cast<size_t>(axis) * m_ + v];
        int i2 = blur_n2_[static_cast<size_t>(axis) * m_ + v];
        const float* p1 = (i1 >= 0) ? lat.data() + static_cast<size_t>(i1) * vh : nullptr;
        const float* p2 = (i2 >= 0) ? lat.data() + static_cast<size_t>(i2) * vh : nullptr;
        float* dst = tmp.data() + static_cast<size_t>(v) * vh;
        for (int c = 0; c < vh; ++c) {
          float acc = 2.f * self[c];
          if (p1) acc += p1[c];
          if (p2) acc += p2[c];
          dst[c] = acc * 0.5f;
        }
      }
      lat.swap(tmp);
    }

    // Slice with homogeneous normalization.
    for (int i = 0; i < n_; ++i) {
      float acc[16] = {0};  // vd <= 15 in practice (we use vd = 2)
      float wsum = 0.f;
      for (int r = 0; r <= d_; ++r) {
        int idx = offsets_[static_cast<size_t>(i) * (d_ + 1) + r];
        float w = weights_[static_cast<size_t>(i) * (d_ + 1) + r];
        const float* cell = lat.data() + static_cast<size_t>(idx) * vh;
        for (int c = 0; c < vd; ++c) acc[c] += w * cell[c];
        wsum += w * cell[vd];
      }
      float inv = (wsum > 0.f) ? 1.0f / wsum : 0.f;
      for (int c = 0; c < vd; ++c) out[static_cast<size_t>(i) * vd + c] = acc[c] * inv;
    }
  }

 private:
  int n_, d_, m_ = 0;
  std::vector<int> offsets_;
  std::vector<float> weights_;
  std::vector<std::vector<short>> lattice_keys_;
  std::vector<int> blur_n1_, blur_n2_;
};

void SoftmaxRows(const float* in, float* out, int n, float scale) {
  for (int i = 0; i < n; ++i) {
    float a = scale * in[i * 2], b = scale * in[i * 2 + 1];
    float mx = a > b ? a : b;
    float ea = std::exp(a - mx), eb = std::exp(b - mx);
    float s = ea + eb;
    out[i * 2] = ea / s;
    out[i * 2 + 1] = eb / s;
  }
}

}  // namespace

extern "C" {

// Binary soft-mask CRF. out: refined mask in {0, 1}.
void rcf_crf_soft(const uint8_t* rgb, const float* mask01, int h, int w,
                  float scomp_smooth, float sxy_smooth,
                  float scomp_app, float sxy_app, float srgb,
                  int iters, float crf_scale, float* out) {
  const int n = h * w;

  // Unary from the soft mask, with the reference's uint8 quantization
  // (models/crf_head.py:39-60).
  std::vector<float> unary(static_cast<size_t>(n) * 2);
  float umax = 0.f;
  std::vector<float> u8(n);
  for (int i = 0; i < n; ++i) {
    float v = mask01[i] * 255.0f / crf_scale;
    v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
    u8[i] = std::floor(v);
    if (u8[i] > umax) umax = u8[i];
  }
  for (int i = 0; i < n; ++i) {
    float u = u8[i] / (umax + 1e-8f);
    u = u < 1e-6f ? 1e-6f : (u > 1.f - 1e-6f ? 1.f - 1e-6f : u);
    unary[i * 2] = -std::log(1.f - u);
    unary[i * 2 + 1] = -std::log(u);
  }

  // Appearance lattice (x/sxy, y/sxy, rgb/srgb).
  std::vector<float> feat(static_cast<size_t>(n) * 5);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      size_t i = static_cast<size_t>(y) * w + x;
      feat[i * 5 + 0] = x / sxy_app;
      feat[i * 5 + 1] = y / sxy_app;
      feat[i * 5 + 2] = rgb[i * 3 + 0] / srgb;
      feat[i * 5 + 3] = rgb[i * 3 + 1] / srgb;
      feat[i * 5 + 4] = rgb[i * 3 + 2] / srgb;
    }
  PermutohedralLattice app(feat.data(), n, 5);

  PermutohedralLattice* smooth = nullptr;
  std::vector<float> sfeat;
  const bool use_smooth = scomp_smooth > 0.f && sxy_smooth > 0.f;
  if (use_smooth) {
    sfeat.resize(static_cast<size_t>(n) * 2);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        size_t i = static_cast<size_t>(y) * w + x;
        sfeat[i * 2 + 0] = x / sxy_smooth;
        sfeat[i * 2 + 1] = y / sxy_smooth;
      }
    smooth = new PermutohedralLattice(sfeat.data(), n, 2);
  }

  std::vector<float> q(static_cast<size_t>(n) * 2);
  std::vector<float> next(static_cast<size_t>(n) * 2);
  std::vector<float> filtered(static_cast<size_t>(n) * 2);
  SoftmaxRows(unary.data(), q.data(), n, -1.0f);

  for (int it = 0; it < iters; ++it) {
    for (int i = 0; i < 2 * n; ++i) next[i] = -unary[i];
    app.Filter(q.data(), filtered.data(), 2);
    for (int i = 0; i < 2 * n; ++i) next[i] += scomp_app * filtered[i];
    if (use_smooth) {
      smooth->Filter(q.data(), filtered.data(), 2);
      for (int i = 0; i < 2 * n; ++i) next[i] += scomp_smooth * filtered[i];
    }
    SoftmaxRows(next.data(), q.data(), n, 1.0f);
  }

  for (int i = 0; i < n; ++i) out[i] = q[i * 2 + 1] > q[i * 2] ? 1.0f : 0.0f;
  delete smooth;
}

}  // extern "C"
