// segtpu native IO: minimal grayscale TIFF decoder + threaded batch decode.
//
// The host-side stage of the input pipeline (file → uint8 array) is the one
// part that cannot run on the TPU. The reference leans on OpenCV's C++ core
// through Python (`cv2.imread`, dataset.py:46); this is segtpu's native
// equivalent: a dependency-free strip-TIFF reader plus a pthread pool for
// batch decode, exposed through a C ABI consumed via ctypes
// (segtpu/data/native.py). Unsupported TIFF variants return an error and the
// Python layer falls back to PIL.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  bool little;
  bool ok = true;

  uint16_t u16(size_t off) const {
    if (off + 2 > n) return 0;
    return little ? (uint16_t)(p[off] | p[off + 1] << 8)
                  : (uint16_t)(p[off] << 8 | p[off + 1]);
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > n) return 0;
    return little ? ((uint32_t)p[off] | (uint32_t)p[off + 1] << 8 |
                     (uint32_t)p[off + 2] << 16 | (uint32_t)p[off + 3] << 24)
                  : ((uint32_t)p[off] << 24 | (uint32_t)p[off + 1] << 16 |
                     (uint32_t)p[off + 2] << 8 | (uint32_t)p[off + 3]);
  }
};

struct Entry {
  uint16_t tag, type;
  uint32_t count, value_off;
};

// Read one IFD entry's integer values (SHORT or LONG arrays).
static bool read_values(const Reader& r, const Entry& e, size_t entry_off,
                        std::vector<uint32_t>* out) {
  size_t elem = (e.type == 3) ? 2 : (e.type == 4) ? 4 : 0;
  if (!elem) return false;
  size_t total = elem * e.count;
  size_t base = (total <= 4) ? entry_off + 8 : e.value_off;
  out->resize(e.count);
  for (uint32_t i = 0; i < e.count; i++) {
    (*out)[i] = (e.type == 3) ? r.u16(base + i * 2) : r.u32(base + i * 4);
  }
  return true;
}

// Decode an 8-bit (or 16-bit, downshifted) grayscale strip TIFF.
// Returns 0 on success; fills *w/*h and writes into out (capacity cap).
static int decode_tiff_gray(const uint8_t* buf, size_t len, uint8_t* out,
                            size_t cap, int32_t* w, int32_t* h) {
  if (len < 8) return -1;
  Reader r{buf, len, buf[0] == 'I'};
  if (!((buf[0] == 'I' && buf[1] == 'I') || (buf[0] == 'M' && buf[1] == 'M')))
    return -2;
  if (r.u16(2) != 42) return -2;
  size_t ifd = r.u32(4);
  if (ifd + 2 > len) return -3;
  uint16_t n_entries = r.u16(ifd);

  uint32_t width = 0, height = 0, bits = 1, comp = 1, spp = 1;
  uint32_t rows_per_strip = 0xFFFFFFFF;
  std::vector<uint32_t> offsets, counts;

  for (uint16_t i = 0; i < n_entries; i++) {
    size_t eo = ifd + 2 + i * 12;
    Entry e{r.u16(eo), r.u16(eo + 2), r.u32(eo + 4), r.u32(eo + 8)};
    std::vector<uint32_t> vals;
    switch (e.tag) {
      case 256: read_values(r, e, eo, &vals); if (!vals.empty()) width = vals[0]; break;
      case 257: read_values(r, e, eo, &vals); if (!vals.empty()) height = vals[0]; break;
      case 258: read_values(r, e, eo, &vals); if (!vals.empty()) bits = vals[0]; break;
      case 259: read_values(r, e, eo, &vals); if (!vals.empty()) comp = vals[0]; break;
      case 273: read_values(r, e, eo, &offsets); break;
      case 277: read_values(r, e, eo, &vals); if (!vals.empty()) spp = vals[0]; break;
      case 278: read_values(r, e, eo, &vals); if (!vals.empty()) rows_per_strip = vals[0]; break;
      case 279: read_values(r, e, eo, &counts); break;
      default: break;
    }
  }
  if (!width || !height || offsets.empty()) return -4;
  if (comp != 1) return -5;                 // only uncompressed strips
  if (spp != 1) return -6;                  // grayscale only
  if (bits != 8 && bits != 16) return -7;
  size_t need = (size_t)width * height;
  if (need > cap) return -8;

  size_t bytes_per_px = bits / 8;
  size_t row_bytes = (size_t)width * bytes_per_px;
  size_t written_rows = 0;
  for (size_t s = 0; s < offsets.size() && written_rows < height; s++) {
    size_t off = offsets[s];
    size_t strip_rows = rows_per_strip == 0xFFFFFFFF
                            ? height
                            : rows_per_strip;
    size_t rows = std::min<size_t>(strip_rows, height - written_rows);
    size_t strip_bytes = rows * row_bytes;
    if (s < counts.size() && counts[s] < strip_bytes)
      strip_bytes = counts[s];
    if (off + strip_bytes > len) return -9;
    if (bits == 8) {
      memcpy(out + written_rows * width, buf + off, strip_bytes);
    } else {
      const uint8_t* sp = buf + off;
      uint8_t* dp = out + written_rows * width;
      size_t px = strip_bytes / 2;
      for (size_t k = 0; k < px; k++) {
        uint16_t v = r.little ? (uint16_t)(sp[2 * k] | sp[2 * k + 1] << 8)
                              : (uint16_t)(sp[2 * k] << 8 | sp[2 * k + 1]);
        dp[k] = (uint8_t)(v >> 8);
      }
    }
    written_rows += rows;
  }
  *w = (int32_t)width;
  *h = (int32_t)height;
  return 0;
}

static int decode_file(const char* path, uint8_t* out, size_t cap,
                       int32_t* w, int32_t* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz > 0 ? (size_t)sz : 0);
  if (sz > 0 && fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -101;
  }
  fclose(f);
  return decode_tiff_gray(buf.data(), buf.size(), out, cap, w, h);
}

}  // namespace

extern "C" {

// Single-file decode. Returns 0 on success (see codes above).
int segtpu_decode_gray(const char* path, uint8_t* out, int64_t cap,
                       int32_t* w, int32_t* h) {
  return decode_file(path, out, (size_t)cap, w, h);
}

// Batch decode with a thread pool. paths: array of C strings; every image
// must fit (cap per image). Fills dims[2*i]=h, dims[2*i+1]=w and
// status[i] per image; out is a contiguous (n, cap) byte region.
void segtpu_decode_batch(const char** paths, int32_t n, uint8_t* out,
                         int64_t cap, int32_t* dims, int32_t* status,
                         int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::atomic<int32_t>* next = new std::atomic<int32_t>(0);
  auto work = [&]() {
    for (;;) {
      int32_t i = next->fetch_add(1);
      if (i >= n) break;
      int32_t w = 0, h = 0;
      status[i] = decode_file(paths[i], out + (int64_t)i * cap, (size_t)cap,
                              &w, &h);
      dims[2 * i] = h;
      dims[2 * i + 1] = w;
    }
  };
  int32_t workers = std::min(n_threads, n);
  for (int32_t t = 0; t < workers; t++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  delete next;
}

}  // extern "C"
