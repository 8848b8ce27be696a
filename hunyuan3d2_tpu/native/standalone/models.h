// DINOv2 / Hunyuan3D-DiT / ShapeVAE forwards over the flat weight file.
//
// Counterpart of the reference ggml graphs (project/ggml/src/{dinov2,dit,
// shapevae}.h) built instead as plain loops over hunyuan3d2_tpu's parameter
// layout. Every math convention mirrors the JAX modules (and through them
// the reference):
//   * timestep embedding: [cos|sin], max_period 1000 (= time_factor), t×1000
//   * DiT adaLN order [shift,scale,gate], joint attn over [txt|img]
//   * fused qkv layout (K,H,D) on the channel axis; VAE blocks use the
//     per-head-interleaved (H, 3·Dh) layout with per-head q/k LayerNorm
//   * FourierEmbedder cat(x, sin(e), cos(e)), freqs 2^0..2^7 (no π)
#pragma once

#include "weights.h"

namespace hy3d {

// ---------------------------------------------------------------------------
// DINOv2 ViT
// ---------------------------------------------------------------------------
struct DinoConfig {
  int hidden, layers, heads, patch, image, swiglu_hidden, use_swiglu;
};

inline DinoConfig dino_config(const Weights& w) {
  const Tensor& c = w.get("cfg/dino");
  return {(int)c.data[0], (int)c.data[1], (int)c.data[2], (int)c.data[3],
          (int)c.data[4], (int)c.data[5], (int)c.data[6]};
}

// pixels: [S, S, 3] normalized. → tokens [1+N, hidden].
inline Tensor dino_forward(const Weights& w, const DinoConfig& cfg,
                           const Tensor& pixels) {
  int S = cfg.image, p = cfg.patch, g = S / p;
  int64_t npatch = (int64_t)g * g, C = cfg.hidden;
  // patchify, channel-major (c, py, px) per patch (dinov2.py _patchify)
  Tensor patches = zeros({npatch, (int64_t)3 * p * p});
  for (int gy = 0; gy < g; ++gy)
    for (int gx = 0; gx < g; ++gx) {
      float* dst = patches.ptr() + ((int64_t)gy * g + gx) * 3 * p * p;
      for (int c = 0; c < 3; ++c)
        for (int py = 0; py < p; ++py)
          for (int px = 0; px < p; ++px)
            dst[(c * p + py) * p + px] =
                pixels.ptr()[(((int64_t)gy * p + py) * S + gx * p + px) * 3 + c];
    }
  Tensor pb = w.get("dino/patch_proj/b");
  Tensor tokens = linear(patches, w.get("dino/patch_proj/w"), &pb);
  Tensor x = zeros({npatch + 1, C});
  std::memcpy(x.ptr(), w.get("dino/cls_token").ptr(), C * 4);
  std::memcpy(x.ptr() + C, tokens.ptr(), npatch * C * 4);
  const Tensor& pos = w.get("dino/pos_embed");
  for (int64_t i = 0; i < x.numel(); ++i) x.data[i] += pos.data[i];

  for (int l = 0; l < cfg.layers; ++l) {
    auto L = [&](const char* n) { return w.layer(std::string("dino/layers/") + n, l); };
    Tensor n1s = L("norm1_scale"), n1b = L("norm1_bias");
    Tensor h = x;
    layer_norm_(h.ptr(), h.shape[0], C, n1s.ptr(), n1b.ptr());
    Tensor qw = L("q/w"), qb = L("q/b"), kw = L("k/w"), kb = L("k/b");
    Tensor vw = L("v/w"), vb = L("v/b"), ow = L("out/w"), ob = L("out/b");
    Tensor q = linear(h, qw, &qb), k = linear(h, kw, &kb), v = linear(h, vw, &vb);
    Tensor attn = attention(q, k, v, cfg.heads);
    Tensor o = linear(attn, ow, &ob);
    Tensor ls1 = L("ls1");
    for (int64_t i = 0; i < x.shape[0]; ++i)
      for (int64_t d = 0; d < C; ++d)
        x.ptr()[i * C + d] += o.ptr()[i * C + d] * ls1.data[d];

    Tensor n2s = L("norm2_scale"), n2b = L("norm2_bias");
    h = x;
    layer_norm_(h.ptr(), h.shape[0], C, n2s.ptr(), n2b.ptr());
    Tensor fiw = L("ffn_in/w"), fib = L("ffn_in/b");
    Tensor fow = L("ffn_out/w"), fob = L("ffn_out/b");
    Tensor ff = linear(h, fiw, &fib);
    Tensor inner;
    if (cfg.use_swiglu) {
      int64_t half = ff.shape[1] / 2;
      inner = zeros({ff.shape[0], half});
      for (int64_t i = 0; i < ff.shape[0]; ++i)
        for (int64_t d = 0; d < half; ++d) {
          float a = ff.ptr()[i * ff.shape[1] + d];
          float b = ff.ptr()[i * ff.shape[1] + half + d];
          inner.ptr()[i * half + d] = a / (1.f + std::exp(-a)) * b;
        }
    } else {
      inner = ff;
      gelu_exact_(inner.ptr(), inner.numel());
    }
    Tensor out = linear(inner, fow, &fob);
    Tensor ls2 = L("ls2");
    for (int64_t i = 0; i < x.shape[0]; ++i)
      for (int64_t d = 0; d < C; ++d)
        x.ptr()[i * C + d] += out.ptr()[i * C + d] * ls2.data[d];
  }
  Tensor fs = w.get("dino/final_norm_scale"), fb = w.get("dino/final_norm_bias");
  layer_norm_(x.ptr(), x.shape[0], C, fs.ptr(), fb.ptr());
  return x;
}

// ---------------------------------------------------------------------------
// Hunyuan3D-DiT
// ---------------------------------------------------------------------------
struct DiTConfig {
  int in_ch, ctx, hidden, heads, depth, depth_single, guidance, mlp_hidden;
};

inline DiTConfig dit_config(const Weights& w) {
  const Tensor& c = w.get("cfg/dit");
  return {(int)c.data[0], (int)c.data[1], (int)c.data[2], (int)c.data[3],
          (int)c.data[4], (int)c.data[5], (int)c.data[6], (int)c.data[7]};
}

inline Tensor timestep_embedding(float t, int dim) {
  Tensor e = zeros({1, (int64_t)dim});
  int half = dim / 2;
  float tt = t * 1000.f;
  for (int i = 0; i < half; ++i) {
    // max_period == time_factor == 1000 (hunyuan3ddit.py:392 quirk)
    float freq = std::exp(-std::log(1000.f) * i / half);
    e.data[i] = std::cos(tt * freq);
    e.data[half + i] = std::sin(tt * freq);
  }
  return e;
}

inline Tensor mlp_embed(const Weights& w, const std::string& p, Tensor x) {
  Tensor b1 = w.get(p + "/in_layer/b");
  Tensor h = linear(x, w.get(p + "/in_layer/w"), &b1);
  silu_(h.ptr(), h.numel());
  Tensor b2 = w.get(p + "/out_layer/b");
  return linear(h, w.get(p + "/out_layer/w"), &b2);
}

// Split [L, 3C] fused qkv (layout (K,H,D)) into q/k/v [L, C] each.
inline void split_fused_qkv(const Tensor& qkv, Tensor& q, Tensor& k, Tensor& v) {
  int64_t L = qkv.shape[0], C = qkv.shape[1] / 3;
  q = zeros({L, C});
  k = zeros({L, C});
  v = zeros({L, C});
  for (int64_t i = 0; i < L; ++i) {
    std::memcpy(q.ptr() + i * C, qkv.ptr() + i * 3 * C, C * 4);
    std::memcpy(k.ptr() + i * C, qkv.ptr() + i * 3 * C + C, C * 4);
    std::memcpy(v.ptr() + i * C, qkv.ptr() + i * 3 * C + 2 * C, C * 4);
  }
}

// modulation: SiLU(vec) @ w + b → n chunks of [hidden]
inline std::vector<std::vector<float>> modulation(const Weights& w,
                                                  const Tensor& mw,
                                                  const Tensor& mb,
                                                  const Tensor& vec, int n) {
  Tensor sv = vec;
  silu_(sv.ptr(), sv.numel());
  Tensor out = linear(sv, mw, &mb);
  int64_t H = out.shape[1] / n;
  std::vector<std::vector<float>> chunks(n);
  for (int i = 0; i < n; ++i)
    chunks[i].assign(out.ptr() + i * H, out.ptr() + (i + 1) * H);
  return chunks;
}

inline void modulate_(Tensor& x, const std::vector<float>& shift,
                      const std::vector<float>& scale) {
  int64_t C = x.shape.back();
  for (int64_t i = 0; i < x.shape[0]; ++i)
    for (int64_t d = 0; d < C; ++d)
      x.ptr()[i * C + d] = (1.f + scale[d]) * x.ptr()[i * C + d] + shift[d];
}

inline void gated_add_(Tensor& x, const Tensor& y, const std::vector<float>& g) {
  int64_t C = x.shape.back();
  for (int64_t i = 0; i < x.shape[0]; ++i)
    for (int64_t d = 0; d < C; ++d)
      x.ptr()[i * C + d] += g[d] * y.ptr()[i * C + d];
}

// One denoise: x [L, in_ch], cond [Lc, ctx] → velocity [L, in_ch].
inline Tensor dit_forward(const Weights& w, const DiTConfig& cfg,
                          const Tensor& x_in, float t, const Tensor& cond_in,
                          float guidance) {
  int H = cfg.hidden, heads = cfg.heads, Dh = H / heads;
  Tensor lb = w.get("dit/latent_in/b");
  Tensor img = linear(x_in, w.get("dit/latent_in/w"), &lb);
  Tensor vec = mlp_embed(w, "dit/time_in", timestep_embedding(t, 256));
  if (cfg.guidance) {
    Tensor gv = mlp_embed(w, "dit/guidance_in",
                          timestep_embedding(guidance, 256));
    add_(vec, gv);
  }
  Tensor cb = w.get("dit/cond_in/b");
  Tensor txt = linear(cond_in, w.get("dit/cond_in/w"), &cb);

  for (int l = 0; l < cfg.depth; ++l) {
    auto L = [&](const char* n) {
      return w.layer(std::string("dit/double_blocks/") + n, l);
    };
    Tensor imw = L("img_mod/w"), imb = L("img_mod/b");
    Tensor tmw = L("txt_mod/w"), tmb = L("txt_mod/b");
    auto im = modulation(w, imw, imb, vec, 6);
    auto tm = modulation(w, tmw, tmb, vec, 6);

    Tensor imod = layer_norm(img, nullptr, nullptr);
    modulate_(imod, im[0], im[1]);
    Tensor iqkvw = L("img_qkv/w"), iqkvb = L("img_qkv/b");
    Tensor iqkv = linear(imod, iqkvw, &iqkvb);
    Tensor iq, ik, iv;
    split_fused_qkv(iqkv, iq, ik, iv);
    Tensor iqs = L("img_q_scale"), iks = L("img_k_scale");
    rms_norm_(iq.ptr(), iq.numel() / Dh, Dh, iqs.ptr());
    rms_norm_(ik.ptr(), ik.numel() / Dh, Dh, iks.ptr());

    Tensor tmod = layer_norm(txt, nullptr, nullptr);
    modulate_(tmod, tm[0], tm[1]);
    Tensor tqkvw = L("txt_qkv/w"), tqkvb = L("txt_qkv/b");
    Tensor tqkv = linear(tmod, tqkvw, &tqkvb);
    Tensor tq, tk, tv;
    split_fused_qkv(tqkv, tq, tk, tv);
    Tensor tqs = L("txt_q_scale"), tks = L("txt_k_scale");
    rms_norm_(tq.ptr(), tq.numel() / Dh, Dh, tqs.ptr());
    rms_norm_(tk.ptr(), tk.numel() / Dh, Dh, tks.ptr());

    // joint attention over [txt | img]
    int64_t Lt = txt.shape[0], Li = img.shape[0];
    Tensor q = zeros({Lt + Li, (int64_t)H}), k = q, v = q;
    std::memcpy(q.ptr(), tq.ptr(), Lt * H * 4);
    std::memcpy(q.ptr() + Lt * H, iq.ptr(), Li * H * 4);
    std::memcpy(k.ptr(), tk.ptr(), Lt * H * 4);
    std::memcpy(k.ptr() + Lt * H, ik.ptr(), Li * H * 4);
    std::memcpy(v.ptr(), tv.ptr(), Lt * H * 4);
    std::memcpy(v.ptr() + Lt * H, iv.ptr(), Li * H * 4);
    Tensor attn = attention(q, k, v, heads);
    Tensor tattn = zeros({Lt, (int64_t)H}), iattn = zeros({Li, (int64_t)H});
    std::memcpy(tattn.ptr(), attn.ptr(), Lt * H * 4);
    std::memcpy(iattn.ptr(), attn.ptr() + Lt * H, Li * H * 4);

    Tensor ipw = L("img_proj/w"), ipb = L("img_proj/b");
    gated_add_(img, linear(iattn, ipw, &ipb), im[2]);
    Tensor imod2 = layer_norm(img, nullptr, nullptr);
    modulate_(imod2, im[3], im[4]);
    Tensor imiw = L("img_mlp_in/w"), imib = L("img_mlp_in/b");
    Tensor imow = L("img_mlp_out/w"), imob = L("img_mlp_out/b");
    Tensor ih = linear(imod2, imiw, &imib);
    gelu_tanh_(ih.ptr(), ih.numel());
    gated_add_(img, linear(ih, imow, &imob), im[5]);

    Tensor tpw = L("txt_proj/w"), tpb = L("txt_proj/b");
    gated_add_(txt, linear(tattn, tpw, &tpb), tm[2]);
    Tensor tmod2 = layer_norm(txt, nullptr, nullptr);
    modulate_(tmod2, tm[3], tm[4]);
    Tensor tmiw = L("txt_mlp_in/w"), tmib = L("txt_mlp_in/b");
    Tensor tmow = L("txt_mlp_out/w"), tmob = L("txt_mlp_out/b");
    Tensor th = linear(tmod2, tmiw, &tmib);
    gelu_tanh_(th.ptr(), th.numel());
    gated_add_(txt, linear(th, tmow, &tmob), tm[5]);
  }

  // single-stream over [txt | img]
  int64_t Lt = txt.shape[0], Li = img.shape[0];
  Tensor xcat = zeros({Lt + Li, (int64_t)H});
  std::memcpy(xcat.ptr(), txt.ptr(), Lt * H * 4);
  std::memcpy(xcat.ptr() + Lt * H, img.ptr(), Li * H * 4);
  for (int l = 0; l < cfg.depth_single; ++l) {
    auto L = [&](const char* n) {
      return w.layer(std::string("dit/single_blocks/") + n, l);
    };
    Tensor mw = L("mod/w"), mb = L("mod/b");
    auto m = modulation(w, mw, mb, vec, 3);
    Tensor xm = layer_norm(xcat, nullptr, nullptr);
    modulate_(xm, m[0], m[1]);
    Tensor l1w = L("linear1/w"), l1b = L("linear1/b");
    Tensor h = linear(xm, l1w, &l1b);
    int64_t Lx = h.shape[0];
    Tensor qkv = zeros({Lx, (int64_t)3 * H});
    Tensor mlp = zeros({Lx, (int64_t)cfg.mlp_hidden});
    for (int64_t i = 0; i < Lx; ++i) {
      std::memcpy(qkv.ptr() + i * 3 * H, h.ptr() + i * h.shape[1], 3 * H * 4);
      std::memcpy(mlp.ptr() + i * cfg.mlp_hidden,
                  h.ptr() + i * h.shape[1] + 3 * H, cfg.mlp_hidden * 4);
    }
    Tensor q, k, v;
    split_fused_qkv(qkv, q, k, v);
    Tensor qs = L("q_scale"), ks = L("k_scale");
    rms_norm_(q.ptr(), q.numel() / Dh, Dh, qs.ptr());
    rms_norm_(k.ptr(), k.numel() / Dh, Dh, ks.ptr());
    Tensor attn = attention(q, k, v, heads);
    gelu_tanh_(mlp.ptr(), mlp.numel());
    Tensor cat2 = zeros({Lx, (int64_t)H + cfg.mlp_hidden});
    for (int64_t i = 0; i < Lx; ++i) {
      std::memcpy(cat2.ptr() + i * cat2.shape[1], attn.ptr() + i * H, H * 4);
      std::memcpy(cat2.ptr() + i * cat2.shape[1] + H,
                  mlp.ptr() + i * cfg.mlp_hidden, cfg.mlp_hidden * 4);
    }
    Tensor l2w = L("linear2/w"), l2b = L("linear2/b");
    gated_add_(xcat, linear(cat2, l2w, &l2b), m[2]);
  }
  Tensor latent = zeros({Li, (int64_t)H});
  std::memcpy(latent.ptr(), xcat.ptr() + Lt * H, Li * H * 4);

  Tensor aw = w.get("dit/final_layer/adaLN/w");
  Tensor ab = w.get("dit/final_layer/adaLN/b");
  auto fm = modulation(w, aw, ab, vec, 2);
  Tensor ln = layer_norm(latent, nullptr, nullptr);
  modulate_(ln, fm[0], fm[1]);
  Tensor fb = w.get("dit/final_layer/linear/b");
  return linear(ln, w.get("dit/final_layer/linear/w"), &fb);
}

// ---------------------------------------------------------------------------
// ShapeVAE
// ---------------------------------------------------------------------------
struct VAEConfig {
  int num_latents, embed_dim, width, heads, layers, num_freqs, include_pi;
  float scale_factor;
};

inline VAEConfig vae_config(const Weights& w) {
  const Tensor& c = w.get("cfg/vae");
  return {(int)c.data[0], (int)c.data[1], (int)c.data[2], (int)c.data[3],
          (int)c.data[4], (int)c.data[5], (int)c.data[6], c.data[7]};
}

// Split [L, H*(3Dh)] per-head-interleaved qkv into q/k/v [L, H*Dh].
inline void split_vae_qkv(const Tensor& qkv, int heads, Tensor& q, Tensor& k,
                          Tensor& v) {
  int64_t L = qkv.shape[0];
  int64_t Dh = qkv.shape[1] / (3 * heads);
  int64_t C = heads * Dh;
  q = zeros({L, C});
  k = zeros({L, C});
  v = zeros({L, C});
  for (int64_t i = 0; i < L; ++i)
    for (int h = 0; h < heads; ++h) {
      const float* src = qkv.ptr() + i * 3 * C + h * 3 * Dh;
      std::memcpy(q.ptr() + i * C + h * Dh, src, Dh * 4);
      std::memcpy(k.ptr() + i * C + h * Dh, src + Dh, Dh * 4);
      std::memcpy(v.ptr() + i * C + h * Dh, src + 2 * Dh, Dh * 4);
    }
}

// latents [L, embed] → hidden tokens [L, width]
inline Tensor vae_decode_latents(const Weights& w, const VAEConfig& cfg,
                                 Tensor latents) {
  for (auto& v : latents.data) v /= cfg.scale_factor;
  Tensor pb = w.get("vae/post_kl/b");
  Tensor x = linear(latents, w.get("vae/post_kl/w"), &pb);
  int H = cfg.width, heads = cfg.heads, Dh = H / heads;
  for (int l = 0; l < cfg.layers; ++l) {
    auto L = [&](const char* n) {
      return w.layer(std::string("vae/transformer/") + n, l);
    };
    Tensor n1s = L("ln_1_scale"), n1b = L("ln_1_bias");
    Tensor h = x;
    layer_norm_(h.ptr(), h.shape[0], H, n1s.ptr(), n1b.ptr());
    Tensor qkvw = L("c_qkv/w");
    Tensor qkv = linear(h, qkvw, nullptr);
    Tensor q, k, v;
    split_vae_qkv(qkv, heads, q, k, v);
    Tensor qs = L("q_norm_scale"), qb = L("q_norm_bias");
    Tensor ks = L("k_norm_scale"), kb = L("k_norm_bias");
    layer_norm_(q.ptr(), q.numel() / Dh, Dh, qs.ptr(), qb.ptr());
    layer_norm_(k.ptr(), k.numel() / Dh, Dh, ks.ptr(), kb.ptr());
    Tensor attn = attention(q, k, v, heads);
    Tensor pw = L("c_proj/w"), pbb = L("c_proj/b");
    add_(x, linear(attn, pw, &pbb));

    Tensor n2s = L("ln_2_scale"), n2b = L("ln_2_bias");
    h = x;
    layer_norm_(h.ptr(), h.shape[0], H, n2s.ptr(), n2b.ptr());
    Tensor fw = L("mlp_fc/w"), fbb = L("mlp_fc/b");
    Tensor ff = linear(h, fw, &fbb);
    gelu_exact_(ff.ptr(), ff.numel());
    Tensor ow = L("mlp_proj/w"), obb = L("mlp_proj/b");
    add_(x, linear(ff, ow, &obb));
  }
  return x;
}

struct GeoKV {
  Tensor k, v;  // [L, H*Dh] each, k already per-head layer-normed
};

inline GeoKV vae_compute_kv(const Weights& w, const VAEConfig& cfg,
                            const Tensor& hidden) {
  int H = cfg.width, heads = cfg.heads, Dh = H / heads;
  Tensor n2s = w.get("vae/geo_decoder/ln_2_scale");
  Tensor n2b = w.get("vae/geo_decoder/ln_2_bias");
  Tensor data = hidden;
  layer_norm_(data.ptr(), data.shape[0], H, n2s.ptr(), n2b.ptr());
  Tensor kv = linear(data, w.get("vae/geo_decoder/c_kv/w"), nullptr);
  int64_t L = kv.shape[0];
  GeoKV out;
  out.k = zeros({L, (int64_t)H});
  out.v = zeros({L, (int64_t)H});
  for (int64_t i = 0; i < L; ++i)
    for (int h = 0; h < heads; ++h) {
      const float* src = kv.ptr() + i * 2 * H + h * 2 * Dh;
      std::memcpy(out.k.ptr() + i * H + h * Dh, src, Dh * 4);
      std::memcpy(out.v.ptr() + i * H + h * Dh, src + Dh, Dh * 4);
    }
  Tensor ks = w.get("vae/geo_decoder/k_norm_scale");
  Tensor kb = w.get("vae/geo_decoder/k_norm_bias");
  layer_norm_(out.k.ptr(), out.k.numel() / Dh, Dh, ks.ptr(), kb.ptr());
  return out;
}

// queries [P, 3] in [-box, box] → occupancy logits [P]
inline std::vector<float> vae_decode_queries(const Weights& w,
                                             const VAEConfig& cfg,
                                             const GeoKV& kv,
                                             const float* queries, int64_t P) {
  int H = cfg.width, heads = cfg.heads, Dh = H / heads;
  int nf = cfg.num_freqs;
  int qdim = 3 * (2 * nf + 1);
  Tensor q_in = zeros({P, (int64_t)qdim});
  const float PI = 3.14159265358979323846f;
  for (int64_t i = 0; i < P; ++i) {
    float* dst = q_in.ptr() + i * qdim;
    const float* xyz = queries + i * 3;
    for (int c = 0; c < 3; ++c) dst[c] = xyz[c];
    for (int c = 0; c < 3; ++c)
      for (int f = 0; f < nf; ++f) {
        float freq = std::ldexp(1.f, f);
        if (cfg.include_pi) freq *= PI;
        float e = xyz[c] * freq;
        dst[3 + c * nf + f] = std::sin(e);
        dst[3 + 3 * nf + c * nf + f] = std::cos(e);
      }
  }
  Tensor qpb = w.get("vae/geo_decoder/query_proj/b");
  Tensor x = linear(q_in, w.get("vae/geo_decoder/query_proj/w"), &qpb);

  Tensor n1s = w.get("vae/geo_decoder/ln_1_scale");
  Tensor n1b = w.get("vae/geo_decoder/ln_1_bias");
  Tensor h = x;
  layer_norm_(h.ptr(), h.shape[0], H, n1s.ptr(), n1b.ptr());
  Tensor q = linear(h, w.get("vae/geo_decoder/c_q/w"), nullptr);
  Tensor qs = w.get("vae/geo_decoder/q_norm_scale");
  Tensor qb = w.get("vae/geo_decoder/q_norm_bias");
  layer_norm_(q.ptr(), q.numel() / Dh, Dh, qs.ptr(), qb.ptr());
  Tensor attn = attention(q, kv.k, kv.v, heads);
  Tensor pw = w.get("vae/geo_decoder/c_proj/w");
  Tensor pb2 = w.get("vae/geo_decoder/c_proj/b");
  add_(x, linear(attn, pw, &pb2));

  Tensor n3s = w.get("vae/geo_decoder/ln_3_scale");
  Tensor n3b = w.get("vae/geo_decoder/ln_3_bias");
  h = x;
  layer_norm_(h.ptr(), h.shape[0], H, n3s.ptr(), n3b.ptr());
  Tensor fb2 = w.get("vae/geo_decoder/mlp_fc/b");
  Tensor ff = linear(h, w.get("vae/geo_decoder/mlp_fc/w"), &fb2);
  gelu_exact_(ff.ptr(), ff.numel());
  Tensor ob2 = w.get("vae/geo_decoder/mlp_proj/b");
  add_(x, linear(ff, w.get("vae/geo_decoder/mlp_proj/w"), &ob2));

  Tensor ps = w.get("vae/geo_decoder/ln_post_scale");
  Tensor pbb = w.get("vae/geo_decoder/ln_post_bias");
  layer_norm_(x.ptr(), x.shape[0], H, ps.ptr(), pbb.ptr());
  Tensor ow = w.get("vae/geo_decoder/output_proj/w");
  Tensor obb = w.get("vae/geo_decoder/output_proj/b");
  Tensor occ = linear(x, ow, &obb);
  std::vector<float> out((size_t)P);
  for (int64_t i = 0; i < P; ++i) out[i] = occ.ptr()[i * occ.shape[1]];
  return out;
}

}  // namespace hy3d
