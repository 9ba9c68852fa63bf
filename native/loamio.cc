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
//   * rosbag v2.0: uncompressed and bz2 chunks (lz4 chunks are
//     reported as unsupported), sensor_msgs/PointCloud2 and
//     sensor_msgs/Imu messages, topic- or type-matched.
//   * Velodyne PCAP: VLP-16 single-return packets (1206-byte payloads),
//     azimuth-rollover sweep segmentation, per-point relative time.
//   * PCD v0.7 binary write (x y z [intensity]).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
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
  std::map<uint32_t, int> conn_kind;  // 1=cloud, 2=imu, 0=other
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

int handle_record(BagReader* br,
                  std::map<std::string, std::vector<uint8_t>>& hdr,
                  const uint8_t* data, size_t dlen) {
  auto it = hdr.find("op");
  if (it == hdr.end() || it->second.empty()) return 0;
  uint8_t op = it->second[0];
  if (op == 0x07) {  // connection
    uint32_t conn = rd_u32(hdr["conn"].data());
    std::string topic(hdr["topic"].begin(), hdr["topic"].end());
    // the data section is another header block with the msg type
    std::map<std::string, std::vector<uint8_t>> ch;
    parse_header_fields(data, dlen, &ch);
    std::string type(ch["type"].begin(), ch["type"].end());
    int kind = 0;
    if (topic == br->cloud_topic || type == "sensor_msgs/PointCloud2")
      kind = 1;
    else if (topic == br->imu_topic || type == "sensor_msgs/Imu")
      kind = 2;
    br->conn_kind[conn] = kind;
    return 0;
  }
  if (op == 0x02) {  // message data
    uint32_t conn = rd_u32(hdr["conn"].data());
    int kind = br->conn_kind.count(conn) ? br->conn_kind[conn] : 0;
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
  // carry of points for the sweep being assembled
  std::vector<float> xyz;
  std::vector<float> rel;
  double sweep_start_az = -1.0;
  double prev_az = -1.0;
  std::string error;
};

const double kVlp16Elev[16] = {-15, 1, -13, 3, -11, 5, -9, 7,
                               -7,  9, -5,  11, -3, 13, -1, 15};

uint32_t swap32(uint32_t v) {
  return ((v & 0xff) << 24) | ((v & 0xff00) << 8) | ((v >> 8) & 0xff00) |
         (v >> 24);
}

// Decode one 1206-byte data payload; appends points + azimuth fractions.
// Returns the azimuth (deg) of the first block.
void decode_vlp16(PcapReader* pr, const uint8_t* p,
                  std::vector<float>* out_xyz, std::vector<double>* out_az) {
  for (int b = 0; b < 12; b++) {
    const uint8_t* blk = p + b * 100;
    if (rd_u16(blk) != 0xeeff) continue;
    double az0 = rd_u16(blk + 2) / 100.0;
    // azimuth of the next block (for interpolation of firing 2)
    double az1 = az0;
    if (b + 1 < 12) {
      az1 = rd_u16(p + (b + 1) * 100 + 2) / 100.0;
      if (az1 < az0) az1 += 360.0;
    } else {
      az1 = az0 + 0.4;  // nominal 2-firing advance at 600 rpm
    }
    for (int firing = 0; firing < 2; firing++) {
      double az = az0 + (az1 - az0) * 0.5 * firing;
      double az_rad = az * M_PI / 180.0;
      for (int ch = 0; ch < 16; ch++) {
        const uint8_t* rec = blk + 4 + (firing * 16 + ch) * 3;
        uint16_t raw = rd_u16(rec);
        if (raw == 0) continue;
        double d = raw * 0.002;
        double el = kVlp16Elev[ch] * M_PI / 180.0;
        double ce = std::cos(el);
        // sensor frame: x forward, y left, z up; azimuth clockwise
        out_xyz->push_back((float)(d * ce * std::cos(az_rad)));
        out_xyz->push_back((float)(-d * ce * std::sin(az_rad)));
        out_xyz->push_back((float)(d * std::sin(el)));
        out_az->push_back(az);
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
    pkt_xyz.clear();
    pkt_az.clear();
    decode_vlp16(pr, payload, &pkt_xyz, &pkt_az);

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
