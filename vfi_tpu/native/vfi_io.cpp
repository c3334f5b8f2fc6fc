// vfi_io — native data-loader core for vfi_tpu.
//
// The reference reaches native code for image decode through PIL's C
// decoders inside its Dataset (reference src/utils/data_utils.py:46-48);
// this is the framework-owned equivalent: a self-contained PNG decoder
// (zlib inflate + scanline unfilter) fused with the first stages of the
// training preprocess (crop + horizontal flip + [0,1] float conversion +
// optional ImageNet normalization) so the host never materializes the
// intermediate uint8 image.
//
// Exposed as a C ABI consumed via ctypes (vfi_tpu/native/__init__.py);
// no pybind11 dependency. Build: vfi_tpu/native/build.py (g++ -O3 -shared).
//
// Supported PNG subset: 8-bit RGB/RGBA/gray/gray-alpha and paletted images,
// non-interlaced (covers the Middlebury PNGs and cv2/PIL-written training
// data). Returns <0 error codes otherwise; the Python wrapper falls back to
// PIL.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <zlib.h>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
};

inline uint8_t paeth(int a, int b, int c) {
  int pv = a + b - c;
  int pa = abs(pv - a), pb = abs(pv - b), pc = abs(pv - c);
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

}  // namespace

extern "C" {

// Parse width/height/channels without decoding. Returns 0 on success.
int vfi_png_info(const uint8_t* data, size_t size, int* w, int* h, int* c) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 33 || memcmp(data, magic, 8) != 0) return -1;
  Reader r{data, size, 8};
  uint32_t len = r.u32();
  uint32_t type = r.u32();
  if (!r.ok || len != 13 || type != 0x49484452 /*IHDR*/) return -2;
  *w = int(r.u32());
  *h = int(r.u32());
  uint8_t bit_depth = data[r.off];
  uint8_t color_type = data[r.off + 1];
  uint8_t interlace = data[r.off + 4];
  if (bit_depth != 8 || interlace != 0) return -3;
  switch (color_type) {
    case 0: *c = 1; break;  // gray
    case 2: *c = 3; break;  // rgb
    case 3: *c = 3; break;  // palette -> rgb
    case 4: *c = 2; break;  // gray+alpha
    case 6: *c = 4; break;  // rgba
    default: return -4;
  }
  return 0;
}

// Decode an 8-bit non-interlaced PNG into out (h*w*3, RGB, uint8).
// Gray/alpha sources are expanded/dropped to RGB. Returns 0 on success.
int vfi_png_decode_rgb(const uint8_t* data, size_t size, uint8_t* out,
                       int out_w, int out_h) {
  int w, h, c_out_probe;
  int rc = vfi_png_info(data, size, &w, &h, &c_out_probe);
  if (rc != 0) return rc;
  if (w != out_w || h != out_h) return -5;

  uint8_t color_type = data[8 + 8 + 9];
  int src_c;
  switch (color_type) {
    case 0: src_c = 1; break;
    case 2: src_c = 3; break;
    case 3: src_c = 1; break;  // palette indices
    case 4: src_c = 2; break;
    case 6: src_c = 4; break;
    default: return -4;
  }

  // Collect IDAT payload + PLTE.
  uint8_t palette[256 * 3];
  bool has_palette = false;
  size_t idat_cap = size;  // compressed payload can't exceed file size
  uint8_t* idat = (uint8_t*)malloc(idat_cap);
  size_t idat_len = 0;
  Reader r{data, size, 8};
  while (r.ok && r.off + 8 <= size) {
    uint32_t len = r.u32();
    uint32_t type = r.u32();
    if (!r.ok || r.off + len + 4 > size) break;
    if (type == 0x49444154 /*IDAT*/) {
      memcpy(idat + idat_len, data + r.off, len);
      idat_len += len;
    } else if (type == 0x504C5445 /*PLTE*/ && len <= sizeof(palette)) {
      memcpy(palette, data + r.off, len);
      has_palette = true;
    } else if (type == 0x49454E44 /*IEND*/) {
      break;
    }
    r.off += len + 4;  // skip data + crc
  }

  const size_t stride = size_t(w) * src_c;
  const size_t raw_len = (stride + 1) * size_t(h);
  uint8_t* raw = (uint8_t*)malloc(raw_len);
  uLongf dest_len = raw_len;
  int zrc = uncompress(raw, &dest_len, idat, idat_len);
  free(idat);
  if (zrc != Z_OK || dest_len != raw_len) { free(raw); return -6; }

  // Unfilter scanlines in place (into `prev`/`cur` rows of a plane buffer).
  uint8_t* plane = (uint8_t*)malloc(stride * size_t(h));
  const int bpp = src_c;
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* srow = src + 1;
    uint8_t* drow = plane + size_t(y) * stride;
    const uint8_t* prow = y > 0 ? plane + size_t(y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        memcpy(drow, srow, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          drow[i] = uint8_t(srow[i] + (i >= size_t(bpp) ? drow[i - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i)
          drow[i] = uint8_t(srow[i] + (prow ? prow[i] : 0));
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? drow[i - bpp] : 0;
          int b = prow ? prow[i] : 0;
          drow[i] = uint8_t(srow[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? drow[i - bpp] : 0;
          int b = prow ? prow[i] : 0;
          int cc = (prow && i >= size_t(bpp)) ? prow[i - bpp] : 0;
          drow[i] = uint8_t(srow[i] + paeth(a, b, cc));
        }
        break;
      default:
        free(raw); free(plane);
        return -7;
    }
  }
  free(raw);

  // Expand to RGB.
  const size_t npix = size_t(w) * h;
  for (size_t i = 0; i < npix; ++i) {
    const uint8_t* s = plane + i * src_c;
    uint8_t* d = out + i * 3;
    switch (color_type) {
      case 0: case 4: d[0] = d[1] = d[2] = s[0]; break;
      case 2: case 6: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; break;
      case 3: {
        if (!has_palette) { free(plane); return -8; }
        const uint8_t* pal = palette + size_t(s[0]) * 3;
        d[0] = pal[0]; d[1] = pal[1]; d[2] = pal[2];
        break;
      }
    }
  }
  free(plane);
  return 0;
}

// Fused preprocess: crop a (crop_h, crop_w) window at (top, left) out of an
// RGB uint8 image, optional horizontal flip, convert to float32 in [0,1],
// optionally ImageNet-normalize. out: crop_h*crop_w*3 float32 NHWC-single.
void vfi_crop_flip_normalize(const uint8_t* img, int w, int /*h*/,
                             int top, int left, int crop_h, int crop_w,
                             int hflip, int imagenet_norm, float* out) {
  static const float kMean[3] = {0.485f, 0.456f, 0.406f};
  static const float kStd[3] = {0.229f, 0.224f, 0.225f};
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* srow = img + (size_t(top + y) * w + left) * 3;
    float* drow = out + size_t(y) * crop_w * 3;
    for (int x = 0; x < crop_w; ++x) {
      int sx = hflip ? (crop_w - 1 - x) : x;
      const uint8_t* s = srow + size_t(sx) * 3;
      float* d = drow + size_t(x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float v = float(s[ch]) * inv255;
        d[ch] = imagenet_norm ? (v - kMean[ch]) / kStd[ch] : v;
      }
    }
  }
}

}  // extern "C"
