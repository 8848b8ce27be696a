// hy3d_infer — standalone zero-Python image→mesh inference driver.
//
// Counterpart of the reference ggml runtime (project/ggml/main.cpp:30-64 →
// src/image3d_shape.cpp:124-221): loads a converted checkpoint, runs
// DINOv2 → Hunyuan3D-DiT (CFG flow-match Euler) → ShapeVAE → SDF grid →
// surface nets, prints per-stage golden stats, writes an OBJ mesh.
//
//   ./hy3d_infer --weights model.hy3dw --image input.ppm --output mesh.obj \
//                [--mask alpha.pgm] [--steps 5] [--guidance 5.0]
//                [--octree 128] [--seed 0] [--latents init.f32]
//
// Image input is binary PPM (P6); the alpha mask (PGM P5) drives the
// recenter — without one, non-white pixels count as foreground.
#include <algorithm>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "models.h"

// from ../hy3dnative.cpp
extern "C" int32_t hy3d_surface_nets(const float* grid, int64_t R, float level,
                                     float* out_verts, int64_t verts_cap,
                                     int32_t* out_faces, int64_t faces_cap,
                                     int64_t* n_verts, int64_t* n_faces);

using hy3d::Tensor;

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;    // [h*w*3]
  std::vector<uint8_t> alpha;  // [h*w]
};

Image load_ppm(const std::string& path, const std::string& mask_path) {
  std::ifstream fh(path, std::ios::binary);
  if (!fh) throw std::runtime_error("cannot open " + path);
  std::string magic;
  int w, h, maxv;
  fh >> magic >> w >> h >> maxv;
  fh.get();
  if (magic != "P6" || maxv != 255)
    throw std::runtime_error("expect binary P6 PPM with maxval 255");
  Image im;
  im.w = w;
  im.h = h;
  im.rgb.resize((size_t)w * h * 3);
  fh.read((char*)im.rgb.data(), im.rgb.size());
  im.alpha.assign((size_t)w * h, 0);
  if (!mask_path.empty()) {
    std::ifstream mf(mask_path, std::ios::binary);
    std::string m2;
    int mw, mh, mm;
    mf >> m2 >> mw >> mh >> mm;
    mf.get();
    if (m2 != "P5" || mw != w || mh != h)
      throw std::runtime_error("mask must be P5 PGM of the same size");
    mf.read((char*)im.alpha.data(), im.alpha.size());
  } else {
    for (size_t p = 0; p < (size_t)w * h; ++p) {
      const uint8_t* c = &im.rgb[p * 3];
      im.alpha[p] = (c[0] > 250 && c[1] > 250 && c[2] > 250) ? 0 : 255;
    }
  }
  return im;
}

// Bilinear RGBA resize of a uint8 image region into a float buffer.
void resize_rgba(const uint8_t* rgb, const uint8_t* alpha, int sw, int sh,
                 int x0, int y0, int cw, int ch, float* out, int ow, int oh) {
  for (int oy = 0; oy < oh; ++oy)
    for (int ox = 0; ox < ow; ++ox) {
      float fy = (oy + 0.5f) * ch / oh - 0.5f + y0;
      float fx = (ox + 0.5f) * cw / ow - 0.5f + x0;
      int iy = (int)std::floor(fy), ix = (int)std::floor(fx);
      float dy = fy - iy, dx = fx - ix;
      float acc[4] = {0, 0, 0, 0};
      for (int ky = 0; ky < 2; ++ky)
        for (int kx = 0; kx < 2; ++kx) {
          int yy = std::clamp(iy + ky, 0, sh - 1);
          int xx = std::clamp(ix + kx, 0, sw - 1);
          float wgt = (ky ? dy : 1 - dy) * (kx ? dx : 1 - dx);
          const uint8_t* c = rgb + ((size_t)yy * sw + xx) * 3;
          acc[0] += wgt * c[0];
          acc[1] += wgt * c[1];
          acc[2] += wgt * c[2];
          acc[3] += wgt * alpha[(size_t)yy * sw + xx];
        }
      float* d = out + ((size_t)oy * ow + ox) * 4;
      for (int c = 0; c < 4; ++c) d[c] = acc[c] / 255.f;
    }
}

// Recenter by the alpha bbox to span (1−border) of a square canvas,
// composite on white (preprocessors.py:35-106), then DINO transform
// (resize→center-crop→ImageNet normalize, conditioner.py:80-89).
Tensor preprocess(const Image& im, int dino_size, float border = 0.15f) {
  int x0 = im.w, x1 = -1, y0 = im.h, y1 = -1;
  for (int y = 0; y < im.h; ++y)
    for (int x = 0; x < im.w; ++x)
      if (im.alpha[(size_t)y * im.w + x] > 0) {
        x0 = std::min(x0, x);
        x1 = std::max(x1, x);
        y0 = std::min(y0, y);
        y1 = std::max(y1, y);
      }
  if (x1 < 0) throw std::runtime_error("image is fully background");
  int cw = x1 - x0 + 1, ch = y1 - y0 + 1;
  const int canvas = 512;
  int desired = (int)(canvas * (1.f - border));
  float scale = (float)desired / std::max(cw, ch);
  int nw = std::max(1, (int)std::round(cw * scale));
  int nh = std::max(1, (int)std::round(ch * scale));
  std::vector<float> obj((size_t)nw * nh * 4);
  resize_rgba(im.rgb.data(), im.alpha.data(), im.w, im.h, x0, y0, cw, ch,
              obj.data(), nw, nh);
  // white-composited canvas in [0,1]
  std::vector<float> cvs((size_t)canvas * canvas * 3, 1.f);
  int oy = (canvas - nh) / 2, ox = (canvas - nw) / 2;
  for (int y = 0; y < nh; ++y)
    for (int x = 0; x < nw; ++x) {
      const float* s = &obj[((size_t)y * nw + x) * 4];
      float a = s[3];
      float* d = &cvs[(((size_t)y + oy) * canvas + x + ox) * 3];
      for (int c = 0; c < 3; ++c) d[c] = s[c] * a + (1.f - a);
    }
  // resize 512→dino_size (canvas is square: resize == crop-free)
  Tensor px = hy3d::zeros({dino_size, dino_size, 3});
  const float mean[3] = {0.485f, 0.456f, 0.406f};
  const float stdv[3] = {0.229f, 0.224f, 0.225f};
  for (int ody = 0; ody < dino_size; ++ody)
    for (int odx = 0; odx < dino_size; ++odx) {
      float fy = (ody + 0.5f) * canvas / dino_size - 0.5f;
      float fx = (odx + 0.5f) * canvas / dino_size - 0.5f;
      int iy = (int)std::floor(fy), ix = (int)std::floor(fx);
      float dy = fy - iy, dx = fx - ix;
      for (int c = 0; c < 3; ++c) {
        float acc = 0;
        for (int ky = 0; ky < 2; ++ky)
          for (int kx = 0; kx < 2; ++kx) {
            int yy = std::clamp(iy + ky, 0, canvas - 1);
            int xx = std::clamp(ix + kx, 0, canvas - 1);
            acc += (ky ? dy : 1 - dy) * (kx ? dx : 1 - dx) *
                   cvs[((size_t)yy * canvas + xx) * 3 + c];
          }
        px.ptr()[((size_t)ody * dino_size + odx) * 3 + c] =
            (acc - mean[c]) / stdv[c];
      }
    }
  return px;
}

std::string arg(int argc, char** argv, const std::string& name,
                const std::string& dflt = "") {
  for (int i = 1; i + 1 < argc; ++i)
    if (name == argv[i]) return argv[i + 1];
  return dflt;
}

}  // namespace

int main(int argc, char** argv) {
  std::string wpath = arg(argc, argv, "--weights");
  std::string ipath = arg(argc, argv, "--image");
  std::string opath = arg(argc, argv, "--output", "mesh.obj");
  std::string mpath = arg(argc, argv, "--mask");
  std::string lpath = arg(argc, argv, "--latents");
  int steps = std::stoi(arg(argc, argv, "--steps", "5"));
  float guidance = std::stof(arg(argc, argv, "--guidance", "5.0"));
  int octree = std::stoi(arg(argc, argv, "--octree", "128"));
  unsigned seed = (unsigned)std::stoul(arg(argc, argv, "--seed", "0"));
  if (wpath.empty() || ipath.empty()) {
    std::cerr << "usage: hy3d_infer --weights W --image I.ppm [--output O.obj]"
                 " [--mask M.pgm] [--steps N] [--guidance G] [--octree R]"
                 " [--seed S] [--latents init.f32]\n";
    return 2;
  }

  hy3d::Weights w = hy3d::load_weights(wpath);
  auto dcfg = hy3d::dino_config(w);
  auto mcfg = hy3d::dit_config(w);
  auto vcfg = hy3d::vae_config(w);
  std::printf("[cfg] dino %d/%dL dit %d/%d+%d vae %dx%d\n", dcfg.hidden,
              dcfg.layers, mcfg.hidden, mcfg.depth, mcfg.depth_single,
              vcfg.num_latents, vcfg.embed_dim);

  // stage 1: conditioner
  Image im = load_ppm(ipath, mpath);
  Tensor pixels = preprocess(im, dcfg.image);
  hy3d::stats("pixels", pixels);
  Tensor cond = hy3d::dino_forward(w, dcfg, pixels);
  hy3d::stats("cond", cond);
  Tensor uncond = hy3d::zeros(cond.shape);

  // stage 2: flow-match Euler sampling (pipelines.py:732 sigma convention)
  Tensor x = hy3d::zeros({(int64_t)vcfg.num_latents, (int64_t)vcfg.embed_dim});
  if (!lpath.empty()) {
    std::ifstream lf(lpath, std::ios::binary);
    lf.read((char*)x.ptr(), x.numel() * 4);
    if (!lf) throw std::runtime_error("bad latents file");
  } else {
    std::mt19937 rng(seed);
    std::normal_distribution<float> nd(0.f, 1.f);
    for (auto& v : x.data) v = nd(rng);
  }
  std::vector<float> sigmas(steps + 1);
  for (int i = 0; i < steps; ++i)
    sigmas[i] = steps > 1 ? (float)i / (steps - 1) : 0.f;
  sigmas[steps] = 1.f;
  bool do_cfg = guidance >= 0 && !mcfg.guidance;
  for (int i = 0; i < steps; ++i) {
    float s = sigmas[i], sn = sigmas[i + 1];
    Tensor vc = hy3d::dit_forward(w, mcfg, x, s, cond, guidance);
    if (do_cfg) {
      Tensor vu = hy3d::dit_forward(w, mcfg, x, s, uncond, guidance);
      for (int64_t j = 0; j < vc.numel(); ++j)
        vc.data[j] = vu.data[j] + guidance * (vc.data[j] - vu.data[j]);
    }
    for (int64_t j = 0; j < x.numel(); ++j) x.data[j] += (sn - s) * vc.data[j];
    std::printf("[step %d/%d] sigma %.4f -> %.4f\n", i + 1, steps, s, sn);
  }
  hy3d::stats("latents", x);

  // stage 3: VAE decode + hierarchical grid
  Tensor hidden = hy3d::vae_decode_latents(w, vcfg, x);
  hy3d::stats("vae_hidden", hidden);
  hy3d::GeoKV kv = hy3d::vae_compute_kv(w, vcfg, hidden);

  const float box = 1.01f;
  int R = octree + 1;
  int cf = 4;                        // coarse factor
  int Rc = octree / cf + 1;
  auto lattice = [&](int idx, int n) {
    return -box + 2.f * box * idx / (n - 1);
  };
  // coarse dense pass
  std::vector<float> cq((size_t)Rc * Rc * Rc * 3);
  for (int i = 0; i < Rc; ++i)
    for (int j = 0; j < Rc; ++j)
      for (int k = 0; k < Rc; ++k) {
        float* q = &cq[(((size_t)i * Rc + j) * Rc + k) * 3];
        q[0] = lattice(i, Rc);
        q[1] = lattice(j, Rc);
        q[2] = lattice(k, Rc);
      }
  std::vector<float> coarse =
      hy3d::vae_decode_queries(w, vcfg, kv, cq.data(), (int64_t)Rc * Rc * Rc);
  // near-surface coarse cells (sign change among 8 corners), dilated by 1
  auto cidx = [&](int i, int j, int k) { return ((size_t)i * Rc + j) * Rc + k; };
  std::vector<uint8_t> active((size_t)(Rc - 1) * (Rc - 1) * (Rc - 1), 0);
  auto aidx = [&](int i, int j, int k) {
    return ((size_t)i * (Rc - 1) + j) * (Rc - 1) + k;
  };
  for (int i = 0; i + 1 < Rc; ++i)
    for (int j = 0; j + 1 < Rc; ++j)
      for (int k = 0; k + 1 < Rc; ++k) {
        bool pos = false, neg = false;
        for (int d = 0; d < 8; ++d) {
          float v = coarse[cidx(i + (d & 1), j + ((d >> 1) & 1),
                                k + ((d >> 2) & 1))];
          (v > 0 ? pos : neg) = true;
        }
        if (pos && neg) active[aidx(i, j, k)] = 1;
      }
  std::vector<uint8_t> act2 = active;
  for (int i = 0; i + 1 < Rc; ++i)
    for (int j = 0; j + 1 < Rc; ++j)
      for (int k = 0; k + 1 < Rc; ++k) {
        if (!active[aidx(i, j, k)]) continue;
        for (int di = -1; di <= 1; ++di)
          for (int dj = -1; dj <= 1; ++dj)
            for (int dk = -1; dk <= 1; ++dk) {
              int ii = i + di, jj = j + dj, kk = k + dk;
              if (ii >= 0 && jj >= 0 && kk >= 0 && ii + 1 < Rc && jj + 1 < Rc &&
                  kk + 1 < Rc)
                act2[aidx(ii, jj, kk)] = 1;
            }
      }
  // fine grid: trilinear background fill + exact decode inside active cells
  std::vector<float> grid((size_t)R * R * R);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < R; ++i)
    for (int j = 0; j < R; ++j)
      for (int k = 0; k < R; ++k) {
        float fi = (float)i / cf, fj = (float)j / cf, fk = (float)k / cf;
        int ci = std::min((int)fi, Rc - 2), cj = std::min((int)fj, Rc - 2),
            ck = std::min((int)fk, Rc - 2);
        float di = fi - ci, dj = fj - cj, dk = fk - ck;
        float acc = 0;
        for (int d = 0; d < 8; ++d) {
          float wgt = ((d & 1) ? di : 1 - di) * (((d >> 1) & 1) ? dj : 1 - dj) *
                      (((d >> 2) & 1) ? dk : 1 - dk);
          acc += wgt * coarse[cidx(ci + (d & 1), cj + ((d >> 1) & 1),
                                   ck + ((d >> 2) & 1))];
        }
        grid[((size_t)i * R + j) * R + k] = acc;
      }
  std::vector<float> fq;
  std::vector<size_t> fidx;
  for (int i = 0; i < R; ++i)
    for (int j = 0; j < R; ++j)
      for (int k = 0; k < R; ++k) {
        int ci = std::min(i / cf, Rc - 2), cj = std::min(j / cf, Rc - 2),
            ck = std::min(k / cf, Rc - 2);
        if (!act2[aidx(ci, cj, ck)]) continue;
        fq.push_back(lattice(i, R));
        fq.push_back(lattice(j, R));
        fq.push_back(lattice(k, R));
        fidx.push_back(((size_t)i * R + j) * R + k);
      }
  std::printf("[grid] coarse %d^3, refined %zu / %zu points\n", Rc,
              fidx.size(), (size_t)R * R * R);
  const int64_t chunk = 65536;
  for (size_t s0 = 0; s0 < fidx.size(); s0 += chunk) {
    int64_t n = std::min((size_t)chunk, fidx.size() - s0);
    std::vector<float> vals =
        hy3d::vae_decode_queries(w, vcfg, kv, fq.data() + s0 * 3, n);
    for (int64_t t = 0; t < n; ++t) grid[fidx[s0 + t]] = vals[t];
  }
  {
    Tensor g;
    g.shape = {R, R, R};
    g.data = grid;
    hy3d::stats("grid_logits", g);
  }

  // stage 4: surface nets + rescale (volume/surface.py _finish)
  int64_t vcap = std::max<int64_t>(1 << 20, (int64_t)R * R * 24);
  int64_t fcap = vcap * 4;
  std::vector<float> verts((size_t)vcap * 3);
  std::vector<int32_t> faces((size_t)fcap * 3);
  int64_t nv = 0, nf = 0;
  int rc = hy3d_surface_nets(grid.data(), R, 0.f, verts.data(), vcap,
                             faces.data(), fcap, &nv, &nf);
  if (rc != 0) {
    std::cerr << "surface_nets capacity exceeded\n";
    return 1;
  }
  for (int64_t i = 0; i < nv * 3; ++i)
    verts[i] = verts[i] / (R - 1.f) * (2.f * box) - box;
  std::printf("[mesh] %lld verts, %lld faces\n", (long long)nv, (long long)nf);

  std::ofstream out(opath);
  for (int64_t i = 0; i < nv; ++i)
    out << "v " << verts[3 * i] << ' ' << verts[3 * i + 1] << ' '
        << verts[3 * i + 2] << '\n';
  for (int64_t i = 0; i < nf; ++i)
    out << "f " << faces[3 * i] + 1 << ' ' << faces[3 * i + 1] + 1 << ' '
        << faces[3 * i + 2] + 1 << '\n';
  std::printf("[done] wrote %s\n", opath.c_str());
  return 0;
}
