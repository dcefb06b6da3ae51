// scenecache: native runtime for the input pipeline.
//
// The reference pipeline re-opens and re-inflates zip-compressed scene
// archives (data.npz) on every sample and does per-frame crop/resize in
// Python (data/realestate10k_dataio.py:237-456).  On a small host feeding a
// TPU that is the input bottleneck.  This module provides:
//
//   - a flat, mmap-able scene cache format: fixed-size uint8 frames plus a
//     timestamp table (converted once from the npz archives);
//   - zero-copy frame access via mmap;
//   - fused center-crop + bilinear-resize + [-1,1] float conversion in C++,
//     writing straight into caller-provided buffers (no Python allocs).
//
// Exposed as a C ABI consumed through ctypes (coponerf_tpu/data/fast_loader.py).
//
// Cache layout (little endian):
//   magic  u64  = 0x53434E4543414348 ("SCNECACH")
//   n      u64  number of frames
//   h, w   u64  frame height/width (channels fixed at 3, uint8)
//   ts     i64[n] frame timestamps (sorted)
//   data   u8 [n*h*w*3]

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x53434E4543414348ULL;

struct Header {
  uint64_t magic;
  uint64_t n;
  uint64_t h;
  uint64_t w;
};

struct Cache {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  const int64_t* ts = nullptr;
  const uint8_t* frames = nullptr;
};

inline const uint8_t* frame_ptr(const Cache* c, uint64_t i) {
  return c->frames + i * (c->hdr.h * c->hdr.w * 3);
}

}  // namespace

extern "C" {

void* scenecache_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 ||
      static_cast<uint64_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* c = new Cache();
  c->fd = fd;
  c->base = static_cast<const uint8_t*>(base);
  c->size = st.st_size;
  std::memcpy(&c->hdr, c->base, sizeof(Header));
  // reject bad magic AND truncated/corrupt files: frame accessors index into
  // the mmap assuming the full ts-table + frame payload is present, so a
  // short file would SIGBUS instead of failing cleanly.
  const uint64_t need =
      sizeof(Header) + c->hdr.n * sizeof(int64_t) + c->hdr.n * c->hdr.h * c->hdr.w * 3;
  if (c->hdr.magic != kMagic || c->hdr.n == 0 || c->hdr.h == 0 ||
      c->hdr.w == 0 || c->hdr.n > (1ULL << 32) ||
      c->hdr.h * c->hdr.w > (1ULL << 32) ||
      static_cast<uint64_t>(st.st_size) < need) {
    munmap(base, st.st_size);
    ::close(fd);
    delete c;
    return nullptr;
  }
  c->ts = reinterpret_cast<const int64_t*>(c->base + sizeof(Header));
  c->frames = c->base + sizeof(Header) + c->hdr.n * sizeof(int64_t);
  return c;
}

void scenecache_close(void* handle) {
  auto* c = static_cast<Cache*>(handle);
  if (!c) return;
  munmap(const_cast<uint8_t*>(c->base), c->size);
  ::close(c->fd);
  delete c;
}

int64_t scenecache_num_frames(void* handle) {
  return static_cast<Cache*>(handle)->hdr.n;
}

void scenecache_shape(void* handle, int64_t* h, int64_t* w) {
  auto* c = static_cast<Cache*>(handle);
  *h = c->hdr.h;
  *w = c->hdr.w;
}

void scenecache_timestamps(void* handle, int64_t* out) {
  auto* c = static_cast<Cache*>(handle);
  std::memcpy(out, c->ts, c->hdr.n * sizeof(int64_t));
}

// Raw uint8 frame copy (h*w*3 bytes).
int scenecache_get_frame(void* handle, int64_t i, uint8_t* out) {
  auto* c = static_cast<Cache*>(handle);
  if (i < 0 || static_cast<uint64_t>(i) >= c->hdr.n) return -1;
  std::memcpy(out, frame_ptr(c, i), c->hdr.h * c->hdr.w * 3);
  return 0;
}

// Fused: center square crop -> bilinear resize to (out_size, out_size) ->
// float32 in [-1, 1].  Matches cv2.INTER_LINEAR's half-pixel convention.
int scenecache_load_processed(void* handle, int64_t i, int64_t out_size,
                              float* out) {
  auto* c = static_cast<Cache*>(handle);
  if (i < 0 || static_cast<uint64_t>(i) >= c->hdr.n) return -1;
  const int64_t H = c->hdr.h, W = c->hdr.w;
  const int64_t dim = H < W ? H : W;
  const int64_t y_off = H / 2 - dim / 2;
  const int64_t x_off = W / 2 - dim / 2;
  const uint8_t* src = frame_ptr(c, i);

  const double scale = static_cast<double>(dim) / out_size;
  for (int64_t oy = 0; oy < out_size; ++oy) {
    double sy = (oy + 0.5) * scale - 0.5;
    if (sy < 0) sy = 0;
    int64_t y0 = static_cast<int64_t>(sy);
    if (y0 > dim - 1) y0 = dim - 1;
    int64_t y1 = y0 + 1 < dim ? y0 + 1 : dim - 1;
    const float wy = static_cast<float>(sy - y0);
    const uint8_t* row0 = src + ((y_off + y0) * W + x_off) * 3;
    const uint8_t* row1 = src + ((y_off + y1) * W + x_off) * 3;
    float* orow = out + oy * out_size * 3;
    for (int64_t ox = 0; ox < out_size; ++ox) {
      double sx = (ox + 0.5) * scale - 0.5;
      if (sx < 0) sx = 0;
      int64_t x0 = static_cast<int64_t>(sx);
      if (x0 > dim - 1) x0 = dim - 1;
      int64_t x1 = x0 + 1 < dim ? x0 + 1 : dim - 1;
      const float wx = static_cast<float>(sx - x0);
      for (int ch = 0; ch < 3; ++ch) {
        const float top = row0[x0 * 3 + ch] * (1.f - wx) + row0[x1 * 3 + ch] * wx;
        const float bot = row1[x0 * 3 + ch] * (1.f - wx) + row1[x1 * 3 + ch] * wx;
        const float v = top * (1.f - wy) + bot * wy;
        orow[ox * 3 + ch] = v / 127.5f - 1.f;
      }
    }
  }
  return 0;
}

// Writer: create a cache file from contiguous frame data.
int scenecache_write(const char* path, const int64_t* timestamps,
                     const uint8_t* frames, int64_t n, int64_t h, int64_t w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  Header hdr{kMagic, static_cast<uint64_t>(n), static_cast<uint64_t>(h),
             static_cast<uint64_t>(w)};
  int ok = 1;
  ok &= std::fwrite(&hdr, sizeof(hdr), 1, f) == 1;
  ok &= std::fwrite(timestamps, sizeof(int64_t), n, f) == static_cast<size_t>(n);
  const size_t bytes = static_cast<size_t>(n) * h * w * 3;
  ok &= std::fwrite(frames, 1, bytes, f) == bytes;
  std::fclose(f);
  return ok ? 0 : -1;
}

}  // extern "C"
