// Native rosbag v2.0 reader + grid_map_msgs/GridMap decoder — the fast data
// loader for map checkpoints (the reference checkpoints map state as rosbags,
// TraversabilityEstimation.cpp:125-152,318-329). Mirrors the pure-Python
// reader in traversability_estimation_tpu/utils/rosbag.py; supports chunks
// with compression 'none' (the shipped goldens) — compressed bags fall back
// to the Python reader.
//
// C ABI (ctypes): two-phase use —
//   te_bag_open(path)        -> handle (first GridMap message decoded)
//   te_bag_info(h, ...)      -> rows/cols/res/n_layers/name lengths
//   te_bag_layer(h, i, buf)  -> copy layer i (row-major rows x cols)
//   te_bag_close(h)

#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n, off = 0;
  bool ok = true;
  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v;
    std::memcpy(&v, p + off, 4);
    off += 4;
    return v;
  }
  uint16_t u16() {
    if (off + 2 > n) { ok = false; return 0; }
    uint16_t v;
    std::memcpy(&v, p + off, 2);
    off += 2;
    return v;
  }
  double f64() {
    if (off + 8 > n) { ok = false; return 0; }
    double v;
    std::memcpy(&v, p + off, 8);
    off += 8;
    return v;
  }
  std::string str() {
    uint32_t len = u32();
    if (!ok || off + len > n) { ok = false; return ""; }
    std::string s(reinterpret_cast<const char*>(p + off), len);
    off += len;
    return s;
  }
  void skip(size_t k) {
    if (off + k > n) ok = false;
    else off += k;
  }
};

std::unordered_map<std::string, std::string> parse_header(const uint8_t* p, size_t n) {
  std::unordered_map<std::string, std::string> out;
  size_t off = 0;
  while (off + 4 <= n) {
    uint32_t flen;
    std::memcpy(&flen, p + off, 4);
    off += 4;
    if (off + flen > n) break;
    const char* entry = reinterpret_cast<const char*>(p + off);
    const char* eq = static_cast<const char*>(memchr(entry, '=', flen));
    if (eq) out.emplace(std::string(entry, eq - entry),
                        std::string(eq + 1, entry + flen - (eq + 1)));
    off += flen;
  }
  return out;
}

struct GridMapData {
  int rows = 0, cols = 0;
  double resolution = 0, length_x = 0, length_y = 0;
  double pos_x = 0, pos_y = 0, pos_z = 0;
  std::string frame_id;
  std::vector<std::string> layer_names;
  std::vector<std::vector<float>> layers;  // row-major rows x cols
};

bool decode_grid_map(const uint8_t* raw, size_t n, GridMapData* out) {
  Reader r{raw, n};
  r.u32();  // seq
  r.u32();  // stamp sec
  r.u32();  // stamp nsec
  out->frame_id = r.str();
  out->resolution = r.f64();
  out->length_x = r.f64();
  out->length_y = r.f64();
  out->pos_x = r.f64();
  out->pos_y = r.f64();
  out->pos_z = r.f64();
  r.f64(); r.f64(); r.f64(); r.f64();  // orientation
  uint32_t n_layers = r.u32();
  for (uint32_t i = 0; i < n_layers && r.ok; ++i) out->layer_names.push_back(r.str());
  uint32_t n_basic = r.u32();
  for (uint32_t i = 0; i < n_basic && r.ok; ++i) r.str();
  uint32_t n_arrays = r.u32();
  for (uint32_t a = 0; a < n_arrays && r.ok; ++a) {
    uint32_t n_dims = r.u32();
    bool col_major = true;
    uint32_t d0 = 0, d1 = 0;
    for (uint32_t d = 0; d < n_dims && r.ok; ++d) {
      std::string label = r.str();
      uint32_t size = r.u32();
      r.u32();  // stride
      if (d == 0) { col_major = label.rfind("column", 0) == 0; d0 = size; }
      if (d == 1) d1 = size;
    }
    r.u32();  // data_offset
    uint32_t count = r.u32();
    if (!r.ok || r.off + 4ull * count > r.n) return false;
    const float* vals = reinterpret_cast<const float*>(r.p + r.off);
    r.skip(4ull * count);
    int rows = col_major ? (int)d1 : (int)d0;
    int cols = col_major ? (int)d0 : (int)d1;
    out->rows = rows;
    out->cols = cols;
    std::vector<float> mat((size_t)rows * cols);
    if (col_major) {
      for (int c = 0; c < cols; ++c)
        for (int rr = 0; rr < rows; ++rr)
          mat[(size_t)rr * cols + c] = vals[(size_t)c * rows + rr];
    } else {
      std::memcpy(mat.data(), vals, sizeof(float) * rows * cols);
    }
    out->layers.push_back(std::move(mat));
  }
  uint16_t outer = r.u16();
  uint16_t inner = r.u16();
  if (r.ok && (outer || inner)) {
    // undo circular-buffer start index
    for (auto& mat : out->layers) {
      std::vector<float> rolled(mat.size());
      for (int i = 0; i < out->rows; ++i)
        for (int j = 0; j < out->cols; ++j)
          rolled[(size_t)i * out->cols + j] =
              mat[(size_t)((i + outer) % out->rows) * out->cols +
                  (j + inner) % out->cols];
      mat.swap(rolled);
    }
  }
  return r.ok && !out->layers.empty();
}

bool scan_records(const uint8_t* p, size_t n, size_t off, GridMapData* out,
                  const std::unordered_map<int, std::string>* conn_types_in);

bool handle_record(const std::unordered_map<std::string, std::string>& hdr,
                   const uint8_t* data, size_t dlen, GridMapData* out,
                   std::unordered_map<int, std::string>* conn_types) {
  if (hdr.count("op") == 0 || hdr.at("op").empty()) return false;
  uint8_t op = (uint8_t)hdr.at("op")[0];
  if (op == 0x07) {  // connection
    if (hdr.count("conn")) {
      int id;
      std::memcpy(&id, hdr.at("conn").data(), 4);
      auto fields = parse_header(data, dlen);
      if (fields.count("type")) (*conn_types)[id] = fields["type"];
    }
  } else if (op == 0x02) {  // message data
    if (hdr.count("conn")) {
      int id;
      std::memcpy(&id, hdr.at("conn").data(), 4);
      auto it = conn_types->find(id);
      if (it != conn_types->end() &&
          it->second.find("GridMap") != std::string::npos) {
        if (decode_grid_map(data, dlen, out)) return true;
      }
    }
  } else if (op == 0x05) {  // chunk
    std::string comp = hdr.count("compression") ? hdr.at("compression") : "none";
    if (comp == "none") {
      if (scan_records(data, dlen, 0, out, nullptr)) return true;
    }
    // compressed chunks: unsupported here; Python reader handles them
  }
  return false;
}

std::unordered_map<int, std::string> g_conn_types;  // shared across chunks

bool scan_records(const uint8_t* p, size_t n, size_t off, GridMapData* out,
                  const std::unordered_map<int, std::string>*) {
  while (off + 8 <= n) {
    uint32_t hlen;
    std::memcpy(&hlen, p + off, 4);
    off += 4;
    if (off + hlen + 4 > n) break;
    auto hdr = parse_header(p + off, hlen);
    off += hlen;
    uint32_t dlen;
    std::memcpy(&dlen, p + off, 4);
    off += 4;
    if (off + dlen > n) break;
    if (handle_record(hdr, p + off, dlen, out, &g_conn_types)) return true;
    off += dlen;
  }
  return false;
}

}  // namespace

extern "C" {

void* te_bag_open(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  std::vector<uint8_t> blob((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  const char magic[] = "#ROSBAG V2.0\n";
  if (blob.size() < sizeof(magic) - 1 ||
      std::memcmp(blob.data(), magic, sizeof(magic) - 1) != 0)
    return nullptr;
  auto out = std::make_unique<GridMapData>();
  g_conn_types.clear();
  if (!scan_records(blob.data(), blob.size(), sizeof(magic) - 1, out.get(),
                    nullptr))
    return nullptr;
  return out.release();
}

void te_bag_info(void* h, int* rows, int* cols, double* resolution,
                 double* pos_xy, int* n_layers) {
  auto* g = static_cast<GridMapData*>(h);
  *rows = g->rows;
  *cols = g->cols;
  *resolution = g->resolution;
  pos_xy[0] = g->pos_x;
  pos_xy[1] = g->pos_y;
  *n_layers = (int)g->layer_names.size();
}

int te_bag_layer_name(void* h, int i, char* buf, int buflen) {
  auto* g = static_cast<GridMapData*>(h);
  if (i < 0 || i >= (int)g->layer_names.size()) return -1;
  const std::string& s = g->layer_names[i];
  int n = (int)s.size() < buflen - 1 ? (int)s.size() : buflen - 1;
  std::memcpy(buf, s.data(), n);
  buf[n] = 0;
  return n;
}

int te_bag_layer(void* h, int i, float* buf) {
  auto* g = static_cast<GridMapData*>(h);
  if (i < 0 || i >= (int)g->layers.size()) return -1;
  std::memcpy(buf, g->layers[i].data(), sizeof(float) * g->rows * g->cols);
  return 0;
}

void te_bag_close(void* h) { delete static_cast<GridMapData*>(h); }

}  // extern "C"
