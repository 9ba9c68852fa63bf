// loamio: native I/O runtime for the TPU LOAM pipeline.
//
// Plays the role the ROS transport + velodyne driver stack plays for the
// reference implementation (rosbag storage, PointCloud2/Imu
// deserialization — reference common.h:52-76 + roscpp; raw-packet
// decoding — the velodyne_driver upstream of
// MultiScanRegistration::handleCloudMessage): a small C-ABI library the
// Python host calls through ctypes to turn offline sources (.bag
// recordings, .pcap captures) into flat float arrays ready for device
// upload. No ROS anywhere.
//
// Build: g++ -O2 -shared -fPIC -o libloamio.so loamio.cc [-lbz2]
//
// Supported:
//   * rosbag v2.0: uncompressed, bz2 (when bzlib.h is present) and lz4
//     chunks (LZ4 frame via dlopen of the system liblz4 — no dev
//     headers needed), sensor_msgs/PointCloud2 and sensor_msgs/Imu
//     messages; exact-topic connection binding with single-connection
//     type fallback.
//   * Velodyne PCAP: VLP-16 / HDL-32E / HDL-64E packets (1206-byte
//     payloads, model auto-detected), single- and dual-return framing
//     (dual keeps the strongest return per pair), azimuth-rollover
//     sweep segmentation, per-point relative time.
//   * PCD v0.7 binary write (x y z [intensity]).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <map>
#include <string>
#include <vector>

#if defined(__has_include)
#if __has_include(<bzlib.h>)
#include <bzlib.h>
#define LOAMIO_HAVE_BZ2 1
#endif
#endif

namespace {

// ---------------------------------------------------------------------------
// LZ4 frame decompression through dlopen (liblz4.so.1 ships without
// headers in this image; mirror of io/lz4f.py).
// ---------------------------------------------------------------------------
struct Lz4Api {
  void* handle = nullptr;
  unsigned (*isError)(size_t) = nullptr;
  size_t (*createCtx)(void**, unsigned) = nullptr;
  size_t (*freeCtx)(void*) = nullptr;
  size_t (*decompress)(void*, void*, size_t*, const void*, size_t*,
                       const void*) = nullptr;
  bool ok = false;
};

const Lz4Api& lz4_api() {
  static Lz4Api api = [] {
    Lz4Api a;
    for (const char* name : {"liblz4.so.1", "liblz4.so"}) {
      a.handle = dlopen(name, RTLD_NOW | RTLD_LOCAL);
      if (a.handle) break;
    }
    if (!a.handle) return a;
    a.isError = (unsigned (*)(size_t))dlsym(a.handle, "LZ4F_isError");
    a.createCtx = (size_t (*)(void**, unsigned))dlsym(
        a.handle, "LZ4F_createDecompressionContext");
    a.freeCtx = (size_t (*)(void*))dlsym(a.handle,
                                         "LZ4F_freeDecompressionContext");
    a.decompress = (size_t (*)(void*, void*, size_t*, const void*, size_t*,
                               const void*))dlsym(a.handle,
                                                  "LZ4F_decompress");
    a.ok = a.isError && a.createCtx && a.freeCtx && a.decompress;
    return a;
  }();
  return api;
}

bool lz4_frame_decompress(const uint8_t* src, size_t src_len,
                          size_t expected, std::vector<uint8_t>* out) {
  const Lz4Api& a = lz4_api();
  if (!a.ok) return false;
  void* ctx = nullptr;
  if (a.isError(a.createCtx(&ctx, 100))) return false;
  out->clear();
  out->reserve(expected ? expected : src_len * 3);
  std::vector<uint8_t> dst(expected ? expected : (size_t)(64 * 1024));
  size_t off = 0;
  bool good = true;
  while (off < src_len) {
    size_t ssz = src_len - off;
    size_t dsz = dst.size();
    size_t hint = a.decompress(ctx, dst.data(), &dsz, src + off, &ssz,
                               nullptr);
    if (a.isError(hint)) {
      good = false;
      break;
    }
    out->insert(out->end(), dst.data(), dst.data() + dsz);
    off += ssz;
    if (hint == 0 && ssz == 0) break;
  }
  a.freeCtx(ctx);
  return good;
}

// ---------------------------------------------------------------------------
// Little-endian readers
// ---------------------------------------------------------------------------
uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint16_t)p[0] | ((uint16_t)p[1] << 8));
}
float rd_f32(const uint8_t* p) {
  float v;
  std::memcpy(&v, p, 4);
  return v;
}
double rd_f64(const uint8_t* p) {
  double v;
  std::memcpy(&v, p, 8);
  return v;
}

// ---------------------------------------------------------------------------
// rosbag v2.0 parsing
// ---------------------------------------------------------------------------
struct Field {
  std::string name;
  std::vector<uint8_t> value;
};

bool parse_header_fields(const uint8_t* p, size_t len,
                         std::map<std::string, std::vector<uint8_t>>* out) {
  size_t off = 0;
  while (off + 4 <= len) {
    uint32_t flen = rd_u32(p + off);
    off += 4;
    if (off + flen > len) return false;
    const uint8_t* eq =
        (const uint8_t*)std::memchr(p + off, '=', flen);
    if (!eq) return false;
    std::string name((const char*)(p + off), (size_t)(eq - (p + off)));
    std::vector<uint8_t> value(eq + 1, p + off + flen);
    (*out)[name] = std::move(value);
    off += flen;
  }
  return off == len;
}

struct CloudMsg {
  double stamp;
  std::vector<float> xyz;  // interleaved
};

struct ImuMsg {
  double stamp;
  double vals[10];  // qx qy qz qw  ax ay az  gx gy gz
};

struct BagReader {
  FILE* f = nullptr;
  std::string cloud_topic, imu_topic;
  // pending decompressed chunk
  std::vector<uint8_t> chunk;
  size_t chunk_off = 0;
  bool in_chunk = false;
  // Single-connection stream binding: exact topic match wins; the
  // message-type fallback binds only while no exact match exists and
  // only to ONE connection (first seen). Mirrors io/rosbag.py.
  int64_t cloud_conn = -1, imu_conn = -1;
  bool cloud_exact = false, imu_exact = false;
  // current message
  int cur_kind = 0;
  CloudMsg cloud;
  ImuMsg imu;
  std::string error;
};

bool read_exact(FILE* f, void* buf, size_t n) {
  return std::fread(buf, 1, n, f) == n;
}

// Parse a std_msgs/Header, returns bytes consumed or 0 on error.
size_t parse_ros_header(const uint8_t* p, size_t len, double* stamp) {
  if (len < 12) return 0;
  uint32_t sec = rd_u32(p + 4), nsec = rd_u32(p + 8);
  *stamp = (double)sec + 1e-9 * (double)nsec;
  if (len < 16) return 0;
  uint32_t slen = rd_u32(p + 12);
  if (16 + slen > len) return 0;
  return 16 + slen;
}

bool parse_pointcloud2(const uint8_t* p, size_t len, CloudMsg* out) {
  double stamp = 0;
  size_t off = parse_ros_header(p, len, &stamp);
  if (!off) return false;
  if (off + 8 > len) return false;
  uint32_t height = rd_u32(p + off), width = rd_u32(p + off + 4);
  off += 8;
  if (off + 4 > len) return false;
  uint32_t nfields = rd_u32(p + off);
  off += 4;
  int off_x = -1, off_y = -1, off_z = -1;
  int dt_x = 0;
  for (uint32_t i = 0; i < nfields; i++) {
    if (off + 4 > len) return false;
    uint32_t slen = rd_u32(p + off);
    off += 4;
    if (off + slen + 13 > len) return false;
    std::string name((const char*)(p + off), slen);
    off += slen;
    uint32_t foffset = rd_u32(p + off);
    uint8_t datatype = p[off + 4];
    off += 9;  // offset u32 + datatype u8 + count u32
    if (name == "x") { off_x = (int)foffset; dt_x = datatype; }
    if (name == "y") off_y = (int)foffset;
    if (name == "z") off_z = (int)foffset;
  }
  if (off + 9 > len) return false;
  off += 1;  // is_bigendian
  uint32_t point_step = rd_u32(p + off);
  off += 8;  // point_step + row_step
  if (off + 4 > len) return false;
  uint32_t dlen = rd_u32(p + off);
  off += 4;
  if (off + dlen > len || off_x < 0 || off_y < 0 || off_z < 0 ||
      point_step == 0)
    return false;
  if (dt_x != 7) return false;  // FLOAT32 only
  size_t npts = (size_t)height * width;
  size_t avail = dlen / point_step;
  if (npts > avail) npts = avail;
  out->stamp = stamp;
  out->xyz.resize(npts * 3);
  const uint8_t* data = p + off;
  for (size_t i = 0; i < npts; i++) {
    const uint8_t* q = data + i * point_step;
    out->xyz[3 * i + 0] = rd_f32(q + off_x);
    out->xyz[3 * i + 1] = rd_f32(q + off_y);
    out->xyz[3 * i + 2] = rd_f32(q + off_z);
  }
  return true;
}

bool parse_imu(const uint8_t* p, size_t len, ImuMsg* out) {
  double stamp = 0;
  size_t off = parse_ros_header(p, len, &stamp);
  if (!off) return false;
  // orientation 4*f64, cov 9*f64, ang vel 3*f64, cov 9, lin acc 3, cov 9
  if (off + (4 + 9 + 3 + 9 + 3 + 9) * 8 > len) return false;
  out->stamp = stamp;
  for (int i = 0; i < 4; i++) out->vals[i] = rd_f64(p + off + 8 * i);
  size_t av = off + (4 + 9) * 8;
  for (int i = 0; i < 3; i++) out->vals[7 + i] = rd_f64(p + av + 8 * i);
  size_t la = av + (3 + 9) * 8;
  for (int i = 0; i < 3; i++) out->vals[4 + i] = rd_f64(p + la + 8 * i);
  return true;
}

// Handle one record (from file or decompressed chunk). Returns:
// 0 = continue scanning, 1 = message ready, -1 = error/eof.
int handle_record(BagReader* br,
                  std::map<std::string, std::vector<uint8_t>>& hdr,
                  const uint8_t* data, size_t dlen);

int next_from_buffer(BagReader* br) {
  while (br->chunk_off + 8 <= br->chunk.size()) {
    const uint8_t* base = br->chunk.data();
    uint32_t hlen = rd_u32(base + br->chunk_off);
    size_t ho = br->chunk_off + 4;
    if (ho + hlen + 4 > br->chunk.size()) break;
    uint32_t dlen = rd_u32(base + ho + hlen);
    size_t doff = ho + hlen + 4;
    if (doff + dlen > br->chunk.size()) break;
    std::map<std::string, std::vector<uint8_t>> hdr;
    if (!parse_header_fields(base + ho, hlen, &hdr)) {
      br->chunk_off = br->chunk.size();
      break;
    }
    br->chunk_off = doff + dlen;
    int r = handle_record(br, hdr, base + doff, dlen);
    if (r == 1) return 1;
  }
  br->in_chunk = false;
  br->chunk.clear();
  br->chunk_off = 0;
  return 0;
}

void register_connection(BagReader* br,
                         std::map<std::string, std::vector<uint8_t>>& hdr,
                         const uint8_t* data, size_t dlen) {
  uint32_t conn = rd_u32(hdr["conn"].data());
  std::string topic(hdr["topic"].begin(), hdr["topic"].end());
  // the data section is another header block with the msg type
  std::map<std::string, std::vector<uint8_t>> ch;
  parse_header_fields(data, dlen, &ch);
  std::string type(ch["type"].begin(), ch["type"].end());
  if (topic == br->cloud_topic) {
    br->cloud_conn = conn;
    br->cloud_exact = true;
  } else if (!br->cloud_exact && br->cloud_conn < 0 &&
             type == "sensor_msgs/PointCloud2") {
    br->cloud_conn = conn;
  }
  if (topic == br->imu_topic) {
    br->imu_conn = conn;
    br->imu_exact = true;
  } else if (!br->imu_exact && br->imu_conn < 0 &&
             type == "sensor_msgs/Imu") {
    br->imu_conn = conn;
  }
}

// Prescan pass (mirrors io/rosbag.py::_prescan_connections): register
// every connection record reachable without decompression — top-level
// records plus the contents of uncompressed chunks. `rosbag record`
// repeats all connection records at top level after the chunk section,
// so compressed bags are covered too. Leaves the file positioned after
// the magic line.
void prescan_connections(BagReader* br) {
  for (;;) {
    uint8_t lenbuf[4];
    if (!read_exact(br->f, lenbuf, 4)) break;  // EOF
    uint32_t hlen = rd_u32(lenbuf);
    std::vector<uint8_t> hbuf(hlen);
    if (!read_exact(br->f, hbuf.data(), hlen)) break;
    if (!read_exact(br->f, lenbuf, 4)) break;
    uint32_t dlen = rd_u32(lenbuf);
    std::map<std::string, std::vector<uint8_t>> hdr;
    bool parsed = parse_header_fields(hbuf.data(), hlen, &hdr);
    uint8_t op = 0;
    if (parsed && hdr.count("op") && !hdr["op"].empty()) op = hdr["op"][0];
    bool want_data = false;
    std::string comp;
    if (op == 0x07) {
      want_data = true;
    } else if (op == 0x05) {
      comp.assign(hdr["compression"].begin(), hdr["compression"].end());
      want_data = (comp == "none");
    }
    if (!want_data) {
      if (std::fseek(br->f, (long)dlen, SEEK_CUR) != 0) break;
      continue;
    }
    std::vector<uint8_t> dbuf(dlen);
    if (!read_exact(br->f, dbuf.data(), dlen)) break;
    if (op == 0x07) {
      register_connection(br, hdr, dbuf.data(), dlen);
    } else {
      // walk nested records of the uncompressed chunk
      size_t off = 0;
      while (off + 4 <= dbuf.size()) {
        uint32_t h2 = rd_u32(dbuf.data() + off);
        size_t ho = off + 4;
        if (ho + h2 + 4 > dbuf.size()) break;
        uint32_t d2 = rd_u32(dbuf.data() + ho + h2);
        size_t dof = ho + h2 + 4;
        if (dof + d2 > dbuf.size()) break;
        std::map<std::string, std::vector<uint8_t>> nh;
        if (parse_header_fields(dbuf.data() + ho, h2, &nh) &&
            nh.count("op") && !nh["op"].empty() && nh["op"][0] == 0x07) {
          register_connection(br, nh, dbuf.data() + dof, d2);
        }
        off = dof + d2;
      }
    }
  }
  std::fseek(br->f, 13, SEEK_SET);
}

int handle_record(BagReader* br,
                  std::map<std::string, std::vector<uint8_t>>& hdr,
                  const uint8_t* data, size_t dlen) {
  auto it = hdr.find("op");
  if (it == hdr.end() || it->second.empty()) return 0;
  uint8_t op = it->second[0];
  if (op == 0x07) {  // connection
    register_connection(br, hdr, data, dlen);
    return 0;
  }
  if (op == 0x02) {  // message data
    uint32_t conn = rd_u32(hdr["conn"].data());
    int kind = 0;
    if ((int64_t)conn == br->cloud_conn) kind = 1;
    else if ((int64_t)conn == br->imu_conn) kind = 2;
    if (kind == 1 && parse_pointcloud2(data, dlen, &br->cloud)) {
      br->cur_kind = 1;
      return 1;
    }
    if (kind == 2 && parse_imu(data, dlen, &br->imu)) {
      br->cur_kind = 2;
      return 1;
    }
    return 0;
  }
  if (op == 0x05) {  // chunk
    std::string comp(hdr["compression"].begin(), hdr["compression"].end());
    if (comp == "none") {
      br->chunk.assign(data, data + dlen);
    } else if (comp == "bz2") {
#ifdef LOAMIO_HAVE_BZ2
      uint32_t raw_size = rd_u32(hdr["size"].data());
      br->chunk.resize(raw_size);
      unsigned int out_len = raw_size;
      int rc = BZ2_bzBuffToBuffDecompress(
          (char*)br->chunk.data(), &out_len, (char*)data, (unsigned)dlen, 0,
          0);
      if (rc != BZ_OK) {
        br->error = "bz2 decompression failed";
        br->chunk.clear();
        return 0;
      }
      br->chunk.resize(out_len);
#else
      br->error = "bag uses bz2 chunks but libbz2 was not available";
      return 0;
#endif
    } else if (comp == "lz4") {
      uint32_t raw_size =
          hdr.count("size") ? rd_u32(hdr["size"].data()) : 0;
      if (!lz4_frame_decompress(data, dlen, raw_size, &br->chunk)) {
        br->error = lz4_api().ok ? "lz4 decompression failed"
                                 : "bag uses lz4 chunks but liblz4 was"
                                   " not available";
        br->chunk.clear();
        return 0;
      }
    } else {
      br->error = "unsupported chunk compression: " + comp;
      return 0;
    }
    br->chunk_off = 0;
    br->in_chunk = true;
    return next_from_buffer(br);
  }
  return 0;  // index/chunk-info/bag-header records are skipped
}

int bag_advance(BagReader* br) {
  if (br->in_chunk) {
    int r = next_from_buffer(br);
    if (r == 1) return 1;
  }
  for (;;) {
    uint8_t lenbuf[4];
    if (!read_exact(br->f, lenbuf, 4)) return 0;  // EOF
    uint32_t hlen = rd_u32(lenbuf);
    std::vector<uint8_t> hbuf(hlen);
    if (!read_exact(br->f, hbuf.data(), hlen)) return 0;
    if (!read_exact(br->f, lenbuf, 4)) return 0;
    uint32_t dlen = rd_u32(lenbuf);
    std::vector<uint8_t> dbuf(dlen);
    if (!read_exact(br->f, dbuf.data(), dlen)) return 0;
    std::map<std::string, std::vector<uint8_t>> hdr;
    if (!parse_header_fields(hbuf.data(), hlen, &hdr)) continue;
    int r = handle_record(br, hdr, dbuf.data(), dlen);
    if (r == 1) return 1;
  }
}

// ---------------------------------------------------------------------------
// Velodyne PCAP (VLP-16)
// ---------------------------------------------------------------------------
struct PcapReader {
  FILE* f = nullptr;
  bool swapped = false;
  int model = 0;  // PcapModel, auto-detected from the first payload
  // carry of points for the sweep being assembled
  std::vector<float> xyz;
  std::vector<float> rel;
  double sweep_start_az = -1.0;
  double prev_az = -1.0;
  std::string error;
};

const double kVlp16Elev[16] = {-15, 1, -13, 3, -11, 5, -9, 7,
                               -7,  9, -5,  11, -3, 13, -1, 15};

// HDL-32E interleaved elevation table (datasheet order).
const double kHdl32Elev[32] = {
    -30.67, -9.33, -29.33, -8.00, -28.00, -6.66, -26.66, -5.33,
    -25.33, -4.00, -24.00, -2.67, -22.67, -1.33, -21.33, 0.00,
    -20.00, 1.33,  -18.67, 2.67,  -17.33, 4.00,  -16.00, 5.33,
    -14.67, 6.67,  -13.33, 8.00,  -12.00, 9.33,  -10.67, 10.67};

// Nominal HDL-64E bank tables (no per-unit calibration available;
// evenly spaced like io/pcap.py — fine for ring binning).
double hdl64_upper_elev(int ch) { return 2.0 + ch * (-8.33 - 2.0) / 31.0; }
double hdl64_lower_elev(int ch) { return -8.83 + ch * (-24.33 + 8.83) / 31.0; }

// Sensor model ids (mirrors io/pcap.py::detect_model).
enum PcapModel { MODEL_UNKNOWN = 0, MODEL_VLP16, MODEL_HDL32, MODEL_HDL64 };

int detect_model(const uint8_t* p) {
  for (int b = 0; b < 12; b++) {
    if (rd_u16(p + b * 100) == 0xddff) return MODEL_HDL64;
  }
  uint8_t pid = p[1205];
  if (pid == 0x21) return MODEL_HDL32;
  return MODEL_VLP16;
}

uint32_t swap32(uint32_t v) {
  return ((v & 0xff) << 24) | ((v & 0xff00) << 8) | ((v >> 8) & 0xff00) |
         (v >> 24);
}

// Decode one 1206-byte data payload; appends points + azimuth fractions.
// Returns the azimuth (deg) of the first block.
inline void emit_point(double d, double el_deg, double az,
                       std::vector<float>* out_xyz,
                       std::vector<double>* out_az) {
  double az_rad = az * M_PI / 180.0;
  double el = el_deg * M_PI / 180.0;
  double ce = std::cos(el);
  // sensor frame: x forward, y left, z up; azimuth clockwise
  out_xyz->push_back((float)(d * ce * std::cos(az_rad)));
  out_xyz->push_back((float)(-d * ce * std::sin(az_rad)));
  out_xyz->push_back((float)(d * std::sin(el)));
  out_az->push_back(az);
}

void decode_packet(int model, const uint8_t* p, std::vector<float>* out_xyz,
                   std::vector<double>* out_az) {
  // Dual-return framing (factory byte 1204 == 0x39, VLP-16/HDL-32
  // manuals): blocks arrive as same-azimuth pairs (last, strongest);
  // keep the strongest-return block of each pair so downstream sweep
  // framing matches single-return captures.
  bool dual = (model == MODEL_VLP16 || model == MODEL_HDL32) &&
              p[1204] == 0x39;
  for (int b = 0; b < 12; b++) {
    if (dual && (b % 2) == 0) continue;
    const uint8_t* blk = p + b * 100;
    uint16_t flag = rd_u16(blk);
    if (flag != 0xeeff && flag != 0xddff) continue;
    double az0 = rd_u16(blk + 2) / 100.0;
    if (model == MODEL_VLP16) {
      // azimuth of the next distinct-azimuth block (for interpolation
      // of firing 2): +1 in single-return framing, +2 in dual
      int stride = dual ? 2 : 1;
      double az1 = az0;
      if (b + stride < 12) {
        az1 = rd_u16(p + (b + stride) * 100 + 2) / 100.0;
        if (az1 < az0) az1 += 360.0;
      } else {
        az1 = az0 + 0.4;  // nominal 2-firing advance at 600 rpm
      }
      for (int firing = 0; firing < 2; firing++) {
        double az = az0 + (az1 - az0) * 0.5 * firing;
        for (int ch = 0; ch < 16; ch++) {
          uint16_t raw = rd_u16(blk + 4 + (firing * 16 + ch) * 3);
          if (raw == 0) continue;
          emit_point(raw * 0.002, kVlp16Elev[ch], az, out_xyz, out_az);
        }
      }
    } else if (model == MODEL_HDL32) {
      for (int ch = 0; ch < 32; ch++) {
        uint16_t raw = rd_u16(blk + 4 + ch * 3);
        if (raw == 0) continue;
        emit_point(raw * 0.002, kHdl32Elev[ch], az0, out_xyz, out_az);
      }
    } else {  // HDL-64E: bank selected by the block flag
      for (int ch = 0; ch < 32; ch++) {
        uint16_t raw = rd_u16(blk + 4 + ch * 3);
        if (raw == 0) continue;
        double el = flag == 0xeeff ? hdl64_upper_elev(ch)
                                   : hdl64_lower_elev(ch);
        emit_point(raw * 0.002, el, az0, out_xyz, out_az);
      }
    }
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

void* loam_bag_open(const char* path, const char* cloud_topic,
                    const char* imu_topic) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char magic[13] = {0};
  if (std::fread(magic, 1, 13, f) != 13 ||
      std::strncmp(magic, "#ROSBAG V2.0", 12) != 0) {
    std::fclose(f);
    return nullptr;
  }
  BagReader* br = new BagReader();
  br->f = f;
  br->cloud_topic = cloud_topic ? cloud_topic : "";
  br->imu_topic = imu_topic ? imu_topic : "";
  prescan_connections(br);
  return br;
}

int loam_bag_next(void* h) {
  BagReader* br = (BagReader*)h;
  br->cur_kind = 0;
  int r = bag_advance(br);
  return r == 1 ? br->cur_kind : 0;
}

double loam_bag_stamp(void* h) {
  BagReader* br = (BagReader*)h;
  return br->cur_kind == 1 ? br->cloud.stamp : br->imu.stamp;
}

long loam_bag_cloud(void* h, float* out_xyz, long cap) {
  BagReader* br = (BagReader*)h;
  long n = (long)(br->cloud.xyz.size() / 3);
  if (n > cap) n = cap;
  std::memcpy(out_xyz, br->cloud.xyz.data(), (size_t)n * 3 * sizeof(float));
  return n;
}

void loam_bag_imu(void* h, double* out10) {
  BagReader* br = (BagReader*)h;
  std::memcpy(out10, br->imu.vals, 10 * sizeof(double));
}

const char* loam_bag_error(void* h) {
  return ((BagReader*)h)->error.c_str();
}

void loam_bag_close(void* h) {
  BagReader* br = (BagReader*)h;
  if (br->f) std::fclose(br->f);
  delete br;
}

void* loam_pcap_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint8_t gh[24];
  if (std::fread(gh, 1, 24, f) != 24) {
    std::fclose(f);
    return nullptr;
  }
  uint32_t magic = rd_u32(gh);
  bool swapped;
  if (magic == 0xa1b2c3d4)
    swapped = false;
  else if (magic == 0xd4c3b2a1)
    swapped = true;
  else {
    std::fclose(f);
    return nullptr;
  }
  PcapReader* pr = new PcapReader();
  pr->f = f;
  pr->swapped = swapped;
  return pr;
}

// Returns the number of points of a COMPLETED sweep (azimuth rollover),
// or 0 at EOF (flushing any partial sweep), or -1 on malformed input.
long loam_pcap_next_sweep(void* h, float* out_xyz, float* out_rel,
                          long cap) {
  PcapReader* pr = (PcapReader*)h;
  std::vector<float> pkt_xyz;
  std::vector<double> pkt_az;
  for (;;) {
    uint8_t ph[16];
    if (std::fread(ph, 1, 16, pr->f) != 16) {
      // EOF: flush remaining points as the final sweep
      long n = (long)(pr->xyz.size() / 3);
      if (n == 0) return 0;
      if (n > cap) n = cap;
      std::memcpy(out_xyz, pr->xyz.data(), (size_t)n * 3 * sizeof(float));
      std::memcpy(out_rel, pr->rel.data(), (size_t)n * sizeof(float));
      pr->xyz.clear();
      pr->rel.clear();
      return n;
    }
    uint32_t incl = rd_u32(ph + 8);
    if (pr->swapped) incl = swap32(incl);
    std::vector<uint8_t> data(incl);
    if (std::fread(data.data(), 1, incl, pr->f) != incl) return -1;
    // strip ethernet(14)+ip(20)+udp(8) = 42-byte header
    if (incl < 42 + 1206) continue;
    const uint8_t* payload = data.data() + 42;
    if (pr->model == MODEL_UNKNOWN) pr->model = detect_model(payload);
    pkt_xyz.clear();
    pkt_az.clear();
    decode_packet(pr->model, payload, &pkt_xyz, &pkt_az);

    for (size_t i = 0; i < pkt_az.size(); i++) {
      double az = pkt_az[i];
      if (pr->sweep_start_az < 0) pr->sweep_start_az = az;
      bool rollover = pr->prev_az >= 0 && az + 1e-9 < pr->prev_az - 180.0;
      if (rollover) {
        long n = (long)(pr->xyz.size() / 3);
        if (n > cap) n = cap;
        std::memcpy(out_xyz, pr->xyz.data(), (size_t)n * 3 * sizeof(float));
        std::memcpy(out_rel, pr->rel.data(), (size_t)n * sizeof(float));
        pr->xyz.clear();
        pr->rel.clear();
        pr->sweep_start_az = az;
        pr->prev_az = az;
        // keep remainder of this packet for the next sweep
        for (size_t j = i; j < pkt_az.size(); j++) {
          pr->xyz.push_back(pkt_xyz[3 * j]);
          pr->xyz.push_back(pkt_xyz[3 * j + 1]);
          pr->xyz.push_back(pkt_xyz[3 * j + 2]);
          double rel = (pkt_az[j] - pr->sweep_start_az) / 360.0;
          pr->rel.push_back((float)rel);
        }
        return n;
      }
      pr->prev_az = az;
      pr->xyz.push_back(pkt_xyz[3 * i]);
      pr->xyz.push_back(pkt_xyz[3 * i + 1]);
      pr->xyz.push_back(pkt_xyz[3 * i + 2]);
      double rel = az - pr->sweep_start_az;
      if (rel < 0) rel += 360.0;
      pr->rel.push_back((float)(rel / 360.0));
    }
  }
}

void loam_pcap_close(void* h) {
  PcapReader* pr = (PcapReader*)h;
  if (pr->f) std::fclose(pr->f);
  delete pr;
}

int loam_native_version() { return 1; }

}  // extern "C"
