// Native data-path for UPFlow-TPU: fast PNG decode + image preprocessing.
//
// The TPU-side compute is JAX/XLA/Pallas; this library is the host-side
// native runtime component (the analog of the reference's native layer,
// which used a CUDA extension for compute and torch DataLoader workers for
// IO).  Exposed via a plain C ABI consumed from Python with ctypes
// (pybind11 is not available in this environment).
//
// Functions:
//   un_decode_png       - PNG -> interleaved pixels (8/16-bit, 1/2/3/4 ch)
//   un_decode_flow_png  - KITTI 16-bit flow PNG -> float32 flow + u8 valid
//   un_preprocess_image - uint8 RGB -> float32 UnFlow-normalized (+flip)
//   un_crop_f32         - HWC float32 crop
//
// Build: make -C native   (produces libupflow_native.so)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <zlib.h>

extern "C" {

struct PngInfo {
  uint32_t width;
  uint32_t height;
  uint32_t channels;
  uint32_t bitdepth;
};

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// Parse IHDR + concatenated IDAT; returns 0 on success.
int parse_png(const uint8_t* data, size_t size, PngInfo* info,
              std::vector<uint8_t>* inflated) {
  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (size < 8 || memcmp(data, kSig, 8) != 0) return -1;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  uint32_t w = 0, h = 0;
  uint8_t depth = 0, color = 0, interlace = 0;
  while (pos + 12 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) return -2;
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return -3;
      w = be32(body);
      h = be32(body + 4);
      depth = body[8];
      color = body[9];
      interlace = body[12];
      if (interlace != 0) return -4;  // no interlace support
      if (depth != 8 && depth != 16) return -5;
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  uint32_t nch;
  switch (color) {
    case 0: nch = 1; break;
    case 2: nch = 3; break;
    case 4: nch = 2; break;
    case 6: nch = 4; break;
    default: return -6;  // palette not supported
  }
  info->width = w;
  info->height = h;
  info->channels = nch;
  info->bitdepth = depth;

  size_t stride = size_t(w) * nch * (depth / 8);
  inflated->resize((stride + 1) * h);
  uLongf out_len = inflated->size();
  if (uncompress(inflated->data(), &out_len, idat.data(), idat.size()) != Z_OK)
    return -7;
  if (out_len != inflated->size()) return -8;
  return 0;
}

// Reverse PNG scanline filters in place into `out` (row-major, no filter
// bytes).  bpp = bytes per pixel.
void unfilter(const uint8_t* raw, uint8_t* out, uint32_t h, size_t stride,
              size_t bpp) {
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t f = raw[y * (stride + 1)];
    const uint8_t* src = raw + y * (stride + 1) + 1;
    uint8_t* dst = out + y * stride;
    switch (f) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:  // sub
        memcpy(dst, src, bpp);
        for (size_t x = bpp; x < stride; ++x)
          dst[x] = uint8_t(src[x] + dst[x - bpp]);
        break;
      case 2:  // up
        if (prev) {
          for (size_t x = 0; x < stride; ++x)
            dst[x] = uint8_t(src[x] + prev[x]);
        } else {
          memcpy(dst, src, stride);
        }
        break;
      case 3:  // average
        for (size_t x = 0; x < stride; ++x) {
          int left = x >= bpp ? dst[x - bpp] : 0;
          int up = prev ? prev[x] : 0;
          dst[x] = uint8_t(src[x] + ((left + up) >> 1));
        }
        break;
      case 4:  // paeth
        for (size_t x = 0; x < stride; ++x) {
          int left = x >= bpp ? dst[x - bpp] : 0;
          int up = prev ? prev[x] : 0;
          int ul = (prev && x >= bpp) ? prev[x - bpp] : 0;
          dst[x] = uint8_t(src[x] + paeth(left, up, ul));
        }
        break;
      default:
        memset(dst, 0, stride);
    }
    prev = dst;
  }
}

}  // namespace

// Returns 0 on success and fills info; call with out=nullptr to query size
// first (out_size receives required byte count), then again with a buffer.
// Output: interleaved HWC; 16-bit output is native-endian uint16.
int un_decode_png(const uint8_t* data, size_t size, PngInfo* info,
                  uint8_t* out, size_t out_capacity) {
  std::vector<uint8_t> raw;
  int rc = parse_png(data, size, info, &raw);
  if (rc != 0) return rc;
  size_t bpp = info->channels * (info->bitdepth / 8);
  size_t stride = size_t(info->width) * bpp;
  size_t need = stride * info->height;
  if (out == nullptr) return 0;
  if (out_capacity < need) return -9;
  unfilter(raw.data(), out, info->height, stride, bpp);
  if (info->bitdepth == 16) {
    // big-endian -> native-endian uint16 in place
    size_t n = need / 2;
    for (size_t i = 0; i < n; ++i) {
      uint8_t hi = out[2 * i], lo = out[2 * i + 1];
      reinterpret_cast<uint16_t*>(out)[i] = uint16_t((hi << 8) | lo);
    }
  }
  return 0;
}

// KITTI flow PNG (16-bit RGB): flow[h*w*2] float32, valid[h*w] uint8.
// flow = (u16 - 2^15) / 64 (kitti_dataset.py:141-144 semantics).
int un_decode_flow_png(const uint8_t* data, size_t size, PngInfo* info,
                       float* flow, uint8_t* valid) {
  std::vector<uint8_t> raw;
  int rc = parse_png(data, size, info, &raw);
  if (rc != 0) return rc;
  if (info->bitdepth != 16 || info->channels != 3) return -10;
  size_t stride = size_t(info->width) * 6;
  std::vector<uint8_t> px(stride * info->height);
  unfilter(raw.data(), px.data(), info->height, stride, 6);
  size_t n = size_t(info->width) * info->height;
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* p = px.data() + i * 6;
    uint16_t u = uint16_t((p[0] << 8) | p[1]);
    uint16_t v = uint16_t((p[2] << 8) | p[3]);
    uint16_t m = uint16_t((p[4] << 8) | p[5]);
    flow[2 * i] = (float(u) - 32768.0f) / 64.0f;
    flow[2 * i + 1] = (float(v) - 32768.0f) / 64.0f;
    valid[i] = uint8_t(m != 0 ? m : 0);
  }
  return 0;
}

// uint8 RGB HWC -> float32 HWC, UnFlow normalization
// (img - mean) * 0.0039216, optional horizontal flip
// (kitti_dataset.py:45-54 semantics).
void un_preprocess_image(const uint8_t* img, int h, int w, int flip,
                         float* out) {
  static const float kMean[3] = {104.920005f, 110.1753f, 114.785955f};
  const float kScale = 0.0039216f;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int sx = flip ? (w - 1 - x) : x;
      const uint8_t* p = img + (size_t(y) * w + sx) * 3;
      float* q = out + (size_t(y) * w + x) * 3;
      q[0] = (float(p[0]) - kMean[0]) * kScale;
      q[1] = (float(p[1]) - kMean[1]) * kScale;
      q[2] = (float(p[2]) - kMean[2]) * kScale;
    }
  }
}

void un_crop_f32(const float* img, int h, int w, int c, int y0, int x0,
                 int ch, int cw, float* out) {
  (void)h;
  for (int y = 0; y < ch; ++y) {
    memcpy(out + size_t(y) * cw * c,
           img + (size_t(y0 + y) * w + x0) * c,
           size_t(cw) * c * sizeof(float));
  }
}

}  // extern "C"
