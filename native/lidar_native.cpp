// Native IO runtime for the TPU lidar odometry engine.
//
// The reference delegates point-cloud IO to PCL (pcd_io) and live sensor
// decode to an external ROS velodyne driver (reference
// lidar_odometry_node.cpp:45-50 consumes ready-made PointCloud2 messages).
// This standalone framework carries its own native equivalents:
//
//  - a fast binary/ascii PCD parser (arbitrary field layouts with pad
//    columns, like the bundled fixture's `FIELDS rgb _ x y z _`),
//  - a VLP16 UDP packet decoder (1206-byte data packets -> XYZIRT points
//    with per-point azimuth-interpolated timestamps), so raw sensor logs
//    can be replayed without ROS,
//  - a paged scan-log reader for high-throughput bench/file replay.
//
// Exposed as a C ABI for ctypes; Python falls back to the NumPy
// implementations in lidar_odometry_demo_tpu/io when the library is not
// built.
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct PcdField {
  std::string name;
  char type;    // F / U / I
  int size;     // bytes
  int count;
};

struct PcdHeader {
  std::vector<PcdField> fields;
  long points = 0;
  std::string encoding;  // ascii | binary
  long data_offset = 0;
  int point_stride = 0;  // for binary
};

bool parse_header(FILE* f, PcdHeader* h) {
  char line[4096];
  std::vector<int> sizes, counts;
  std::vector<char> types;
  std::vector<std::string> names;
  while (fgets(line, sizeof(line), f)) {
    std::string s(line);
    if (s.empty() || s[0] == '#') continue;
    char key[64];
    if (sscanf(line, "%63s", key) != 1) continue;
    std::string k(key);
    const char* rest = line + k.size();
    if (k == "FIELDS") {
      char buf[128];
      int off = 0, n;
      while (sscanf(rest + off, "%127s%n", buf, &n) == 1) {
        names.emplace_back(buf);
        off += n;
      }
    } else if (k == "SIZE") {
      int v, off = 0, n;
      while (sscanf(rest + off, "%d%n", &v, &n) == 1) { sizes.push_back(v); off += n; }
    } else if (k == "TYPE") {
      char buf[8];
      int off = 0, n;
      while (sscanf(rest + off, "%7s%n", buf, &n) == 1) { types.push_back(buf[0]); off += n; }
    } else if (k == "COUNT") {
      int v, off = 0, n;
      while (sscanf(rest + off, "%d%n", &v, &n) == 1) { counts.push_back(v); off += n; }
    } else if (k == "POINTS") {
      sscanf(rest, "%ld", &h->points);
    } else if (k == "DATA") {
      char buf[32];
      if (sscanf(rest, "%31s", buf) == 1) h->encoding = buf;
      h->data_offset = ftell(f);
      break;
    }
  }
  if (names.empty() || sizes.size() != names.size() || types.size() != names.size())
    return false;
  if (counts.empty()) counts.assign(names.size(), 1);
  if (counts.size() != names.size()) return false;
  h->point_stride = 0;
  for (size_t i = 0; i < names.size(); i++) {
    h->fields.push_back({names[i], types[i], sizes[i], counts[i]});
    h->point_stride += sizes[i] * counts[i];
  }
  return h->points > 0 && !h->encoding.empty();
}

float read_field_as_float(const uint8_t* p, char type, int size) {
  switch (type) {
    case 'F':
      if (size == 4) { float v; memcpy(&v, p, 4); return v; }
      if (size == 8) { double v; memcpy(&v, p, 8); return (float)v; }
      break;
    case 'U': {
      uint64_t v = 0; memcpy(&v, p, size); return (float)v;
    }
    case 'I': {
      int64_t v = 0;
      switch (size) {
        case 1: { int8_t x; memcpy(&x, p, 1); v = x; break; }
        case 2: { int16_t x; memcpy(&x, p, 2); v = x; break; }
        case 4: { int32_t x; memcpy(&x, p, 4); v = x; break; }
        case 8: { memcpy(&v, p, 8); break; }
      }
      return (float)v;
    }
  }
  return 0.0f;
}

}  // namespace

extern "C" {

// Returns the number of points in the PCD (or -1 on error).
long ln_pcd_num_points(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  PcdHeader h;
  bool ok = parse_header(f, &h);
  fclose(f);
  return ok ? h.points : -1;
}

// Extracts up to 8 named fields as float32 columns into `out`
// (column-major: out[field][point]). `field_names` is a
// semicolon-separated list, e.g. "x;y;z;intensity;ring;time".
// Missing fields are zero-filled. Returns points read, or -1.
long ln_pcd_read(const char* path, const char* field_names, float* out,
                 long capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  PcdHeader h;
  if (!parse_header(f, &h)) { fclose(f); return -1; }
  long n = h.points < capacity ? h.points : capacity;

  // requested fields
  std::vector<std::string> want;
  {
    std::string s(field_names);
    size_t pos = 0;
    while (pos != std::string::npos && want.size() < 8) {
      size_t next = s.find(';', pos);
      want.push_back(s.substr(pos, next == std::string::npos ? next : next - pos));
      pos = next == std::string::npos ? next : next + 1;
    }
  }
  // map each wanted field to (byte offset, type, size) in the record
  struct Loc { int offset = -1; char type = 'F'; int size = 4; };
  std::vector<Loc> locs(want.size());
  {
    int off = 0;
    for (const auto& fld : h.fields) {
      for (size_t w = 0; w < want.size(); w++)
        if (fld.name == want[w]) locs[w] = {off, fld.type, fld.size};
      off += fld.size * fld.count;
    }
  }

  if (h.encoding == "binary") {
    std::vector<uint8_t> buf((size_t)h.point_stride * 4096);
    long done = 0;
    fseek(f, h.data_offset, SEEK_SET);
    while (done < n) {
      long chunk = std::min<long>(4096, n - done);
      size_t got = fread(buf.data(), h.point_stride, chunk, f);
      if ((long)got < chunk) chunk = (long)got;
      if (chunk <= 0) break;
      for (long i = 0; i < chunk; i++) {
        const uint8_t* rec = buf.data() + (size_t)i * h.point_stride;
        for (size_t w = 0; w < want.size(); w++) {
          float v = locs[w].offset >= 0
                        ? read_field_as_float(rec + locs[w].offset, locs[w].type, locs[w].size)
                        : 0.0f;
          out[w * capacity + done + i] = v;
        }
      }
      done += chunk;
    }
    fclose(f);
    return done;
  } else if (h.encoding == "ascii") {
    // column index of each wanted field in the ascii row
    std::vector<int> cols(want.size(), -1);
    {
      int col = 0;
      for (const auto& fld : h.fields) {
        for (size_t w = 0; w < want.size(); w++)
          if (fld.name == want[w]) cols[w] = col;
        col += fld.count;
      }
    }
    int total_cols = 0;
    for (const auto& fld : h.fields) total_cols += fld.count;
    std::vector<double> row(total_cols);
    long done = 0;
    while (done < n) {
      for (int c = 0; c < total_cols; c++)
        if (fscanf(f, "%lf", &row[c]) != 1) { fclose(f); return done; }
      for (size_t w = 0; w < want.size(); w++)
        out[w * capacity + done] = cols[w] >= 0 ? (float)row[cols[w]] : 0.0f;
      done++;
    }
    fclose(f);
    return done;
  }
  fclose(f);
  return -1;
}

// ---------------------------------------------------------------------------
// VLP16 data packet decode (1206 bytes: 12 blocks x [0xFFEE, azimuth_u16,
// 32 x (range_u16, intensity_u8)] + 4-byte timestamp + 2-byte factory).
// Dual sequences per block (two firings of the 16 lasers).
// ---------------------------------------------------------------------------

static const float kVlp16Elev[16] = {
    -15.f, 1.f, -13.f, 3.f, -11.f, 5.f, -9.f, 7.f,
    -7.f,  9.f, -5.f, 11.f, -3.f, 13.f, -1.f, 15.f};

// Decodes `num_packets` raw packets (1206 bytes each, concatenated) into
// XYZIRT float32 columns. Returns number of points written (<= capacity).
// Points with zero range are skipped.
long ln_vlp16_decode(const uint8_t* packets, long num_packets, float* out_xyz,
                     float* out_intensity, float* out_ring, float* out_time,
                     long capacity) {
  long n = 0;
  const double kRangeScale = 0.002;           // 2 mm units
  const double kFiringUs = 2.304e-6;          // per-channel firing time
  const double kSeqUs = 55.296e-6;            // per-sequence recharge
  for (long p = 0; p < num_packets; p++) {
    const uint8_t* pkt = packets + p * 1206;
    uint32_t stamp_us;
    memcpy(&stamp_us, pkt + 1200, 4);
    double t_pkt = stamp_us * 1e-6;
    // azimuth per block; interpolate for the second firing sequence
    for (int b = 0; b < 12; b++) {
      const uint8_t* blk = pkt + b * 100;
      if (!(blk[0] == 0xFF && blk[1] == 0xEE)) continue;
      uint16_t az_raw;
      memcpy(&az_raw, blk + 2, 2);
      double az0 = az_raw / 100.0;  // degrees
      // azimuth step to next block (wrap-aware); the last block reuses the
      // step measured from its predecessor (the velodyne driver's own
      // interpolation strategy) so the rate adapts to any spin speed
      // instead of assuming the 10 Hz dual-sequence default
      double az_step = 0.4;
      if (b + 1 < 12) {
        uint16_t az_next;
        memcpy(&az_next, pkt + (b + 1) * 100 + 2, 2);
        double d = (az_next - az_raw) / 100.0;
        if (d < 0) d += 360.0;
        az_step = d;
      } else if (b > 0) {
        uint16_t az_prev;
        memcpy(&az_prev, pkt + (b - 1) * 100 + 2, 2);
        double d = (az_raw - az_prev) / 100.0;
        if (d < 0) d += 360.0;
        az_step = d;
      }
      for (int seq = 0; seq < 2; seq++) {
        double az = az0 + az_step * 0.5 * seq;
        double az_rad = az * M_PI / 180.0;
        for (int ch = 0; ch < 16; ch++) {
          const uint8_t* rec = blk + 4 + (seq * 16 + ch) * 3;
          uint16_t range_raw;
          memcpy(&range_raw, rec, 2);
          if (range_raw == 0 || n >= capacity) continue;
          double r = range_raw * kRangeScale;
          double elev = kVlp16Elev[ch] * M_PI / 180.0;
          double cos_e = cos(elev);
          // Velodyne azimuth increases clockwise from +Y; convert to the
          // right-handed sensor frame used by the pipeline (x fwd, y left):
          double x = r * cos_e * sin(az_rad);
          double y = r * cos_e * cos(az_rad);
          double z = r * sin(elev);
          out_xyz[3 * n + 0] = (float)x;
          out_xyz[3 * n + 1] = (float)y;
          out_xyz[3 * n + 2] = (float)z;
          out_intensity[n] = (float)rec[2];
          // ring index by elevation order (-15 deg = ring 0). Channels
          // fire interleaved (kVlp16Elev): even channels are the lower
          // fan -15..-1 deg (ring = ch/2), odd channels the upper fan
          // +1..+15 deg (ring = 8 + (ch-1)/2) — the velodyne driver's
          // laser ordering.
          int ring = (ch % 2 == 0) ? (ch / 2) : (8 + (ch - 1) / 2);
          out_ring[n] = (float)ring;
          out_time[n] = (float)(t_pkt + ((b * 2 + seq) * kSeqUs) + ch * kFiringUs);
          n++;
        }
      }
    }
  }
  return n;
}

}  // extern "C"
