// Native IO runtime for nerf_prv_tpu.
//
// TPU-native equivalent of the reference's C++ host-side plumbing: the PLY
// loaders (pcl::io::loadPLYFile at main.cpp:647), the white->alpha image
// conversion (Share_Data.hpp convertToAlpha), the first-win voxel filter
// that fed OctoMap (main.cpp:1014-1023) and the ready-file IPC protocol
// (main.cpp:1691-1701, train_server.py:8-14).  Keeps host-side data prep off
// the Python interpreter so TPU feeding never stalls on parsing.
//
// Exposed as a plain C ABI consumed through ctypes
// (nerf_prv_tpu/runtime/native.py).

#include <cctype>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Property {
  std::string name;
  int size = 0;       // bytes for binary
  bool is_float = false;
  bool is_double = false;
};

struct PlyFile {
  std::vector<double> xyz;    // 3 * n
  std::vector<uint8_t> rgb;   // 3 * n (may be empty)
  long n = 0;
  bool has_color = false;
};

int prop_size(const std::string& type) {
  if (type == "char" || type == "int8" || type == "uchar" || type == "uint8") return 1;
  if (type == "short" || type == "int16" || type == "ushort" || type == "uint16") return 2;
  if (type == "int" || type == "int32" || type == "uint" || type == "uint32") return 4;
  if (type == "float" || type == "float32") return 4;
  if (type == "double" || type == "float64") return 8;
  return 0;
}

double read_binary_value(const char* p, const Property& prop) {
  if (prop.is_float) {
    float v;
    std::memcpy(&v, p, 4);
    return v;
  }
  if (prop.is_double) {
    double v;
    std::memcpy(&v, p, 8);
    return v;
  }
  // integer types: the vertex properties we care about are uint8 colors
  switch (prop.size) {
    case 1: return static_cast<double>(*reinterpret_cast<const uint8_t*>(p));
    case 2: {
      uint16_t v;
      std::memcpy(&v, p, 2);
      return v;
    }
    case 4: {
      uint32_t v;
      std::memcpy(&v, p, 4);
      return v;
    }
    default: return 0.0;
  }
}

PlyFile* parse_ply(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f.is_open()) return nullptr;
  std::string line;
  bool binary = false;
  long n_vertex = 0;
  std::vector<Property> props;
  bool in_vertex = false;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line == "end_header") break;
    char word[64], a[64], b[64], c[64];
    if (std::sscanf(line.c_str(), "%63s", word) != 1) continue;
    if (std::strcmp(word, "format") == 0) {
      binary = line.find("binary_little_endian") != std::string::npos;
      if (line.find("binary_big_endian") != std::string::npos) return nullptr;
    } else if (std::strcmp(word, "element") == 0) {
      long cnt = 0;
      if (std::sscanf(line.c_str(), "%63s %63s %ld", word, a, &cnt) == 3) {
        in_vertex = std::strcmp(a, "vertex") == 0;
        if (in_vertex) n_vertex = cnt;
      }
    } else if (std::strcmp(word, "property") == 0 && in_vertex) {
      if (std::sscanf(line.c_str(), "%63s %63s %63s %63s", word, a, b, c) >= 3) {
        if (std::strcmp(a, "list") == 0) return nullptr;
        Property p;
        p.name = b;
        p.size = prop_size(a);
        p.is_float = std::strcmp(a, "float") == 0 || std::strcmp(a, "float32") == 0;
        p.is_double = std::strcmp(a, "double") == 0 || std::strcmp(a, "float64") == 0;
        if (p.size == 0) return nullptr;
        props.push_back(p);
      }
    }
  }

  int ix = -1, iy = -1, iz = -1, ir = -1, ig = -1, ib = -1;
  for (size_t i = 0; i < props.size(); i++) {
    const std::string& nm = props[i].name;
    if (nm == "x") ix = (int)i;
    else if (nm == "y") iy = (int)i;
    else if (nm == "z") iz = (int)i;
    else if (nm == "red" || nm == "r") ir = (int)i;
    else if (nm == "green" || nm == "g") ig = (int)i;
    else if (nm == "blue" || nm == "b") ib = (int)i;
  }
  if (ix < 0 || iy < 0 || iz < 0) return nullptr;
  bool has_color = ir >= 0 && ig >= 0 && ib >= 0;

  auto* out = new PlyFile();
  out->n = n_vertex;
  out->has_color = has_color;
  out->xyz.resize(3 * n_vertex);
  if (has_color) out->rgb.resize(3 * n_vertex);

  if (binary) {
    size_t stride = 0;
    std::vector<size_t> offsets(props.size());
    for (size_t i = 0; i < props.size(); i++) {
      offsets[i] = stride;
      stride += props[i].size;
    }
    std::vector<char> buf(stride * (size_t)n_vertex);
    f.read(buf.data(), (std::streamsize)buf.size());
    if ((size_t)f.gcount() < buf.size()) {
      delete out;
      return nullptr;
    }
    for (long k = 0; k < n_vertex; k++) {
      const char* row = buf.data() + stride * (size_t)k;
      out->xyz[3 * k + 0] = read_binary_value(row + offsets[ix], props[ix]);
      out->xyz[3 * k + 1] = read_binary_value(row + offsets[iy], props[iy]);
      out->xyz[3 * k + 2] = read_binary_value(row + offsets[iz], props[iz]);
      if (has_color) {
        out->rgb[3 * k + 0] = (uint8_t)read_binary_value(row + offsets[ir], props[ir]);
        out->rgb[3 * k + 1] = (uint8_t)read_binary_value(row + offsets[ig], props[ig]);
        out->rgb[3 * k + 2] = (uint8_t)read_binary_value(row + offsets[ib], props[ib]);
      }
    }
  } else {
    std::vector<double> vals(props.size());
    for (long k = 0; k < n_vertex; k++) {
      for (size_t i = 0; i < props.size(); i++) {
        if (!(f >> vals[i])) {
          delete out;
          return nullptr;
        }
      }
      out->xyz[3 * k + 0] = vals[ix];
      out->xyz[3 * k + 1] = vals[iy];
      out->xyz[3 * k + 2] = vals[iz];
      if (has_color) {
        out->rgb[3 * k + 0] = (uint8_t)vals[ir];
        out->rgb[3 * k + 1] = (uint8_t)vals[ig];
        out->rgb[3 * k + 2] = (uint8_t)vals[ib];
      }
    }
  }
  return out;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- PLY IO
void* prv_ply_open(const char* path) { return parse_ply(path); }

long prv_ply_count(void* handle) {
  return handle ? static_cast<PlyFile*>(handle)->n : -1;
}

int prv_ply_has_color(void* handle) {
  return handle && static_cast<PlyFile*>(handle)->has_color ? 1 : 0;
}

int prv_ply_read(void* handle, double* xyz_out, uint8_t* rgb_out) {
  if (!handle) return -1;
  auto* ply = static_cast<PlyFile*>(handle);
  std::memcpy(xyz_out, ply->xyz.data(), ply->xyz.size() * sizeof(double));
  if (ply->has_color && rgb_out) {
    std::memcpy(rgb_out, ply->rgb.data(), ply->rgb.size());
  }
  return 0;
}

void prv_ply_close(void* handle) { delete static_cast<PlyFile*>(handle); }

// ------------------------------------------------- first-win voxel filter
// Returns the number of kept points; keep_out[i] receives the indices of the
// first point landing in each occupied voxel, in input order
// (≙ the "only if voxel == NULL" OctoMap insertion, main.cpp:1014-1023).
long prv_voxel_first_win(const double* xyz, long n, double resolution,
                         long* keep_out) {
  std::unordered_map<uint64_t, char> seen;
  seen.reserve((size_t)n);
  long kept = 0;
  const double inv = 1.0 / resolution;
  const int64_t bias = 1LL << 20;  // exact packing for cells in +-2^20
  for (long i = 0; i < n; i++) {
    int64_t kx = (int64_t)std::floor(xyz[3 * i + 0] * inv) + bias;
    int64_t ky = (int64_t)std::floor(xyz[3 * i + 1] * inv) + bias;
    int64_t kz = (int64_t)std::floor(xyz[3 * i + 2] * inv) + bias;
    uint64_t key = ((uint64_t)kx << 42) | ((uint64_t)ky << 21) | (uint64_t)kz;
    auto it = seen.emplace(key, 1);
    if (it.second) keep_out[kept++] = i;
  }
  return kept;
}

// ----------------------------------------------------- white -> alpha op
// rgb: n*3 uint8 in, rgba: n*4 uint8 out; white pixels get alpha 0
// (≙ convertToAlpha, Share_Data.hpp).
void prv_white_to_alpha(const uint8_t* rgb, long n_pixels, uint8_t* rgba) {
  for (long i = 0; i < n_pixels; i++) {
    uint8_t r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    rgba[4 * i + 0] = r;
    rgba[4 * i + 1] = g;
    rgba[4 * i + 2] = b;
    rgba[4 * i + 3] = (r == 255 && g == 255 && b == 255) ? 0 : 255;
  }
}

// ------------------------------------------------------ ready-file IPC
// Poll for a file (≙ the ready_c++/ready_py handshake, main.cpp:1694-1701).
// Returns 0 when found, 1 on timeout (timeout_ms < 0 = wait forever).
int prv_poll_file(const char* path, int interval_ms, long timeout_ms) {
  auto start = std::chrono::steady_clock::now();
  while (true) {
    std::ifstream f(path);
    if (f.is_open()) return 0;
    if (timeout_ms >= 0) {
      auto el = std::chrono::duration_cast<std::chrono::milliseconds>(
                    std::chrono::steady_clock::now() - start)
                    .count();
      if (el >= timeout_ms) return 1;
    }
    std::this_thread::sleep_for(std::chrono::milliseconds(interval_ms));
  }
}

int prv_touch(const char* path) {
  std::ofstream f(path, std::ios::app);
  return f.is_open() ? 0 : -1;
}

int prv_remove(const char* path) { return std::remove(path); }

}  // extern "C"
