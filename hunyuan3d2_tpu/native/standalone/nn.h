// Minimal tensor + NN ops for the standalone shape-inference driver.
//
// Counterpart of the reference's ggml-based runtime (project/ggml/src/*.h):
// same capability — a zero-Python checkpoint→mesh path — but written as
// plain C++ against a flat weight file instead of ggml graphs.
//
// Conventions match hunyuan3d2_tpu's JAX modules: Linear kernels are stored
// [in, out] (y = x @ w + b), LayerNorm/RMSNorm compute in fp32, attention is
// softmax(q·kᵀ/√d)·v per head.
#pragma once

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

namespace hy3d {

struct Tensor {
  std::vector<float> data;
  std::vector<int64_t> shape;

  int64_t numel() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
  int64_t dim(int i) const { return shape[i]; }
  float* ptr() { return data.data(); }
  const float* ptr() const { return data.data(); }
};

inline Tensor zeros(std::vector<int64_t> shape) {
  Tensor t;
  t.shape = std::move(shape);
  t.data.assign((size_t)t.numel(), 0.f);
  return t;
}

// y[M,N] = x[M,K] @ w[K,N] (+ b[N]); simple ikj loop, OpenMP over rows.
inline void gemm(const float* x, const float* w, const float* b, float* y,
                 int64_t M, int64_t K, int64_t N) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < M; ++i) {
    float* yi = y + i * N;
    if (b) {
      for (int64_t j = 0; j < N; ++j) yi[j] = b[j];
    } else {
      for (int64_t j = 0; j < N; ++j) yi[j] = 0.f;
    }
    const float* xi = x + i * K;
    for (int64_t k = 0; k < K; ++k) {
      float a = xi[k];
      if (a == 0.f) continue;
      const float* wk = w + k * N;
      for (int64_t j = 0; j < N; ++j) yi[j] += a * wk[j];
    }
  }
}

// x: [M, D] tokens. Linear with kernel [D, N].
inline Tensor linear(const Tensor& x, const Tensor& w, const Tensor* b) {
  int64_t D = x.shape.back();
  int64_t M = x.numel() / D;
  assert(w.shape[0] == D);
  int64_t N = w.shape[1];
  Tensor y;
  y.shape = x.shape;
  y.shape.back() = N;
  y.data.resize((size_t)(M * N));
  gemm(x.ptr(), w.ptr(), b ? b->ptr() : nullptr, y.ptr(), M, D, N);
  return y;
}

inline void layer_norm_(float* x, int64_t M, int64_t D, const float* scale,
                        const float* bias, float eps = 1e-6f) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < M; ++i) {
    float* xi = x + i * D;
    double mean = 0;
    for (int64_t d = 0; d < D; ++d) mean += xi[d];
    mean /= D;
    double var = 0;
    for (int64_t d = 0; d < D; ++d) {
      double c = xi[d] - mean;
      var += c * c;
    }
    var /= D;
    float inv = 1.f / std::sqrt((float)var + eps);
    for (int64_t d = 0; d < D; ++d) {
      float v = ((float)(xi[d] - mean)) * inv;
      if (scale) v *= scale[d];
      if (bias) v += bias[d];
      xi[d] = v;
    }
  }
}

inline Tensor layer_norm(const Tensor& x, const Tensor* scale,
                         const Tensor* bias, float eps = 1e-6f) {
  Tensor y = x;
  int64_t D = x.shape.back();
  layer_norm_(y.ptr(), y.numel() / D, D, scale ? scale->ptr() : nullptr,
              bias ? bias->ptr() : nullptr, eps);
  return y;
}

// RMSNorm over the last dim with a scale (DiT qk-norm).
inline void rms_norm_(float* x, int64_t M, int64_t D, const float* scale,
                      float eps = 1e-6f) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < M; ++i) {
    float* xi = x + i * D;
    double ss = 0;
    for (int64_t d = 0; d < D; ++d) ss += (double)xi[d] * xi[d];
    float inv = 1.f / std::sqrt((float)(ss / D) + eps);
    for (int64_t d = 0; d < D; ++d) xi[d] = xi[d] * inv * scale[d];
  }
}

inline void silu_(float* x, int64_t n) {
  for (int64_t i = 0; i < n; ++i) x[i] = x[i] / (1.f + std::exp(-x[i]));
}

inline void gelu_tanh_(float* x, int64_t n) {
  const float c = 0.7978845608028654f;  // sqrt(2/pi)
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i];
    x[i] = 0.5f * v * (1.f + std::tanh(c * (v + 0.044715f * v * v * v)));
  }
}

inline void gelu_exact_(float* x, int64_t n) {
  for (int64_t i = 0; i < n; ++i)
    x[i] = 0.5f * x[i] * (1.f + std::erf(x[i] * 0.7071067811865476f));
}

// Multi-head attention. q: [Lq, H*Dh], k/v: [Lk, H*Dh] laid out token-major
// with heads interleaved in the channel dim (token t, head h, dim d at
// offset t*(H*Dh) + h*Dh + d). Output [Lq, H*Dh].
inline Tensor attention(const Tensor& q, const Tensor& k, const Tensor& v,
                        int heads) {
  int64_t Lq = q.shape[0], Lk = k.shape[0];
  int64_t C = q.shape[1];
  int64_t Dh = C / heads;
  float scale = 1.f / std::sqrt((float)Dh);
  Tensor out = zeros({Lq, C});
#pragma omp parallel for schedule(static) collapse(2)
  for (int h = 0; h < heads; ++h) {
    for (int64_t i = 0; i < Lq; ++i) {
      const float* qi = q.ptr() + i * C + h * Dh;
      std::vector<float> logits((size_t)Lk);
      float mx = -1e30f;
      for (int64_t j = 0; j < Lk; ++j) {
        const float* kj = k.ptr() + j * C + h * Dh;
        float s = 0;
        for (int64_t d = 0; d < Dh; ++d) s += qi[d] * kj[d];
        s *= scale;
        logits[j] = s;
        if (s > mx) mx = s;
      }
      double denom = 0;
      for (int64_t j = 0; j < Lk; ++j) {
        logits[j] = std::exp(logits[j] - mx);
        denom += logits[j];
      }
      float inv = (float)(1.0 / denom);
      float* oi = out.ptr() + i * C + h * Dh;
      for (int64_t j = 0; j < Lk; ++j) {
        float w = logits[j] * inv;
        const float* vj = v.ptr() + j * C + h * Dh;
        for (int64_t d = 0; d < Dh; ++d) oi[d] += w * vj[d];
      }
    }
  }
  return out;
}

inline void add_(Tensor& a, const Tensor& b) {
  for (int64_t i = 0; i < a.numel(); ++i) a.data[i] += b.data[i];
}

// Golden tensor stats (the reference's todos.debug.output_var contract:
// size/min/max/mean per stage, SURVEY.md §4.2).
inline void stats(const char* name, const Tensor& t) {
  float mn = 1e30f, mx = -1e30f;
  double mean = 0;
  for (int64_t i = 0; i < t.numel(); ++i) {
    float v = t.data[i];
    if (v < mn) mn = v;
    if (v > mx) mx = v;
    mean += v;
  }
  mean /= std::max<int64_t>(t.numel(), 1);
  std::string sh;
  for (size_t i = 0; i < t.shape.size(); ++i)
    sh += (i ? "," : "") + std::to_string(t.shape[i]);
  std::printf("[stats] %-24s [%s] min: %.6f max: %.6f mean: %.6f\n", name,
              sh.c_str(), mn, mx, (float)mean);
  std::fflush(stdout);
}

}  // namespace hy3d
