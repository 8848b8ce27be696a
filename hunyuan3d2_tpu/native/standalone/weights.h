// Flat weight-file reader (format written by scripts/export_native.py).
// Counterpart of the reference's gguf loading (image3d_shape.cpp:31).
#pragma once

#include <cstring>
#include <fstream>
#include <stdexcept>
#include <unordered_map>

#include "nn.h"

namespace hy3d {

struct Weights {
  std::unordered_map<std::string, Tensor> tensors;

  const Tensor& get(const std::string& name) const {
    auto it = tensors.find(name);
    if (it == tensors.end())
      throw std::runtime_error("missing tensor: " + name);
    return it->second;
  }
  bool has(const std::string& name) const {
    return tensors.count(name) != 0;
  }
  // Slice layer i from the leading (stacked lax.scan) axis.
  Tensor layer(const std::string& name, int64_t i) const {
    const Tensor& t = get(name);
    Tensor out;
    out.shape.assign(t.shape.begin() + 1, t.shape.end());
    int64_t n = out.numel();
    out.data.assign(t.ptr() + i * n, t.ptr() + (i + 1) * n);
    return out;
  }
};

inline Weights load_weights(const std::string& path) {
  std::ifstream fh(path, std::ios::binary);
  if (!fh) throw std::runtime_error("cannot open " + path);
  char magic[8];
  fh.read(magic, 8);
  if (std::memcmp(magic, "HY3DW001", 8) != 0)
    throw std::runtime_error("bad magic in " + path);
  int64_t count = 0;
  fh.read((char*)&count, 8);
  Weights w;
  for (int64_t t = 0; t < count; ++t) {
    int32_t name_len = 0;
    fh.read((char*)&name_len, 4);
    std::string name((size_t)name_len, '\0');
    fh.read(name.data(), name_len);
    int32_t dtype = 0, ndim = 0;
    fh.read((char*)&dtype, 4);
    fh.read((char*)&ndim, 4);
    if (dtype != 0) throw std::runtime_error("unsupported dtype");
    Tensor ten;
    ten.shape.resize(ndim);
    fh.read((char*)ten.shape.data(), 8 * ndim);
    ten.data.resize((size_t)ten.numel());
    fh.read((char*)ten.data.data(), 4 * ten.numel());
    w.tensors.emplace(std::move(name), std::move(ten));
  }
  if (!fh) throw std::runtime_error("truncated weight file " + path);
  return w;
}

}  // namespace hy3d
