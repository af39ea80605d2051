// Native image preprocessing for the data pipeline.
//
// The reference delegates decode/resize to PIL inside 12 torch DataLoader
// worker processes (dataset/dataloader.py:63-87).  This library is the
// framework's native equivalent: libjpeg/libpng decode plus a fused
// bilinear-resize-and-normalise, exposed as a C ABI consumed via ctypes
// (two_stage_object_detection_tpu/data/native.py).  Single-pass, cache
// friendly, no Python in the inner loop.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links libjpeg + libpng)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cmath>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG byte buffer to RGB u8.  Returns malloc'd buffer (caller
// frees via free_buffer) or nullptr; writes decoded height/width to h/w and
// the ORIGINAL image dims to full_h/full_w (equal unless scaled).
//
// When min_h/min_w > 0, uses libjpeg's DCT-domain scaled decode: the largest
// power-of-two denominator that keeps the decoded image >= (min_h, min_w) is
// selected, so a 2400x2400 source headed for a 600x600 model input is
// decoded directly at 600x600 — ~4-8x less IDCT + colour-convert work on the
// host (the reference decodes full-res in PIL and resizes after,
// dataset/dataloader.py:33-40).  The DCT downscale is a proper lowpass, and
// the remaining <2x factor still goes through the antialiased resize below.
static uint8_t* decode_jpeg_impl(const uint8_t* data, size_t len,
                                 int* h, int* w, int* full_h, int* full_w,
                                 int min_h, int min_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  uint8_t* out = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    free(out);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  *full_h = cinfo.image_height;
  *full_w = cinfo.image_width;
  if (min_h > 0 && min_w > 0) {
    unsigned denom = 1;
    while (denom < 8 &&
           cinfo.image_height >= 2 * denom * unsigned(min_h) &&
           cinfo.image_width >= 2 * denom * unsigned(min_w)) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  size_t stride = size_t(*w) * 3;
  out = static_cast<uint8_t*>(malloc(stride * size_t(*h)));
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

uint8_t* decode_jpeg(const uint8_t* data, size_t len, int* h, int* w) {
  int fh, fw;
  return decode_jpeg_impl(data, len, h, w, &fh, &fw, 0, 0);
}

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

static void png_read_fn(png_structp png, png_bytep dst, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "png: read past end");
  }
  memcpy(dst, s->data + s->pos, n);
  s->pos += n;
}

// Decode a PNG byte buffer to RGB u8 (alpha stripped, palette expanded).
uint8_t* decode_png(const uint8_t* data, size_t len, int* h, int* w) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return nullptr;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return nullptr;
  png_infop info = png_create_info_struct(png);
  uint8_t* out = nullptr;
  png_bytep* rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    free(rows);
    free(out);
    return nullptr;
  }
  PngReadState st{data, len, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);                // palette/gray -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  size_t stride = size_t(*w) * 3;
  out = static_cast<uint8_t*>(malloc(stride * size_t(*h)));
  rows = static_cast<png_bytep*>(malloc(sizeof(png_bytep) * size_t(*h)));
  for (int y = 0; y < *h; ++y) rows[y] = out + stride * size_t(y);
  png_read_image(png, rows);
  png_destroy_read_struct(&png, &info, nullptr);
  free(rows);
  return out;
}

// Dispatch on magic bytes.
uint8_t* decode_image(const uint8_t* data, size_t len, int* h, int* w) {
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8) {
    return decode_jpeg(data, len, h, w);
  }
  if (len >= 8 && data[0] == 0x89 && data[1] == 'P') {
    return decode_png(data, len, h, w);
  }
  return nullptr;
}

void free_buffer(uint8_t* p) { free(p); }

// ------------------------------------------------------- resize/normalise

// Separable antialiased triangle (bilinear) resize, PIL-equivalent: the
// filter support scales with the downsampling ratio, so downscales average
// over the full source footprint instead of point-sampling (torchvision v2
// Resize(antialias=True) semantics, which the reference's transform uses).
struct FilterTable {
  int* xmin;      // [dsize] first source index
  int* xcount;    // [dsize] number of taps
  float* weights; // [dsize * max_taps]
  int max_taps;
};

static FilterTable build_triangle_table(int ssize, int dsize) {
  const double scale = double(ssize) / double(dsize);
  const double fscale = scale > 1.0 ? scale : 1.0;
  const double support = 1.0 * fscale;
  int max_taps = int(support * 2 + 2);
  FilterTable t;
  t.xmin = static_cast<int*>(malloc(sizeof(int) * dsize));
  t.xcount = static_cast<int*>(malloc(sizeof(int) * dsize));
  t.weights = static_cast<float*>(malloc(sizeof(float) * size_t(dsize) * max_taps));
  t.max_taps = max_taps;
  for (int x = 0; x < dsize; ++x) {
    double center = (x + 0.5) * scale;
    int lo = int(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = int(center + support + 0.5);
    if (hi > ssize) hi = ssize;
    int n = hi - lo;
    float* w = t.weights + size_t(x) * max_taps;
    double total = 0.0;
    for (int i = 0; i < n; ++i) {
      double arg = (lo + i + 0.5 - center) / fscale;
      double v = arg < 0 ? -arg : arg;
      double tri = v < 1.0 ? 1.0 - v : 0.0;
      w[i] = float(tri);
      total += tri;
    }
    for (int i = 0; i < n; ++i) w[i] = total > 0 ? float(w[i] / total) : 0.0f;
    t.xmin[x] = lo;
    t.xcount[x] = n;
  }
  return t;
}

static void free_table(FilterTable& t) {
  free(t.xmin);
  free(t.xcount);
  free(t.weights);
}

void resize_bilinear_normalize(const uint8_t* src, int sh, int sw,
                               float* dst, int dh, int dw) {
  FilterTable tx = build_triangle_table(sw, dw);
  FilterTable ty = build_triangle_table(sh, dh);

  // horizontal pass: [sh, sw] u8 -> [sh, dw] f32 (normalised)
  float* tmp = static_cast<float*>(malloc(sizeof(float) * size_t(sh) * dw * 3));
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    float* out = tmp + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = tx.weights + size_t(x) * tx.max_taps;
      int lo = tx.xmin[x], n = tx.xcount[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = row + size_t(lo + i) * 3;
        acc0 += w[i] * p[0];
        acc1 += w[i] * p[1];
        acc2 += w[i] * p[2];
      }
      out[x * 3 + 0] = acc0 * (1.0f / 255.0f);
      out[x * 3 + 1] = acc1 * (1.0f / 255.0f);
      out[x * 3 + 2] = acc2 * (1.0f / 255.0f);
    }
  }

  // vertical pass: [sh, dw] -> [dh, dw]
  for (int y = 0; y < dh; ++y) {
    const float* w = ty.weights + size_t(y) * ty.max_taps;
    int lo = ty.xmin[y], n = ty.xcount[y];
    float* out = dst + size_t(y) * dw * 3;
    memset(out, 0, sizeof(float) * size_t(dw) * 3);
    for (int i = 0; i < n; ++i) {
      const float* row = tmp + size_t(lo + i) * dw * 3;
      float wi = w[i];
      for (int x = 0; x < dw * 3; ++x) out[x] += wi * row[x];
    }
  }

  free(tmp);
  free_table(tx);
  free_table(ty);
}

// Fused: decode bytes -> bilinear resize -> normalised float32 HWC.
// Writes original dims to oh/ow (for box rescaling).  Returns 0 on success.
// JPEG sources much larger than the target are decoded DCT-scaled (see
// decode_jpeg_impl) — the resize then covers only the residual <2x factor.
int decode_resize_normalize(const uint8_t* data, size_t len,
                            float* dst, int dh, int dw, int* oh, int* ow) {
  int h = 0, w = 0, fh = 0, fw = 0;
  uint8_t* rgb;
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8) {
    rgb = decode_jpeg_impl(data, len, &h, &w, &fh, &fw, dh, dw);
  } else {
    rgb = decode_image(data, len, &h, &w);
    fh = h;
    fw = w;
  }
  if (!rgb) return -1;
  resize_bilinear_normalize(rgb, h, w, dst, dh, dw);
  free(rgb);
  *oh = fh;   // original dims: box rescale is target/original
  *ow = fw;
  return 0;
}

// Same separable triangle resize for float32 HWC input (values preserved,
// no renormalisation) — used mid-augmentation-chain.
void resize_f32(const float* src, int sh, int sw,
                float* dst, int dh, int dw) {
  FilterTable tx = build_triangle_table(sw, dw);
  FilterTable ty = build_triangle_table(sh, dh);
  float* tmp = static_cast<float*>(malloc(sizeof(float) * size_t(sh) * dw * 3));
  for (int y = 0; y < sh; ++y) {
    const float* row = src + size_t(y) * sw * 3;
    float* out = tmp + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = tx.weights + size_t(x) * tx.max_taps;
      int lo = tx.xmin[x], n = tx.xcount[x];
      float a0 = 0, a1 = 0, a2 = 0;
      for (int i = 0; i < n; ++i) {
        const float* p = row + size_t(lo + i) * 3;
        a0 += w[i] * p[0];
        a1 += w[i] * p[1];
        a2 += w[i] * p[2];
      }
      out[x * 3] = a0;
      out[x * 3 + 1] = a1;
      out[x * 3 + 2] = a2;
    }
  }
  for (int y = 0; y < dh; ++y) {
    const float* w = ty.weights + size_t(y) * ty.max_taps;
    int lo = ty.xmin[y], n = ty.xcount[y];
    float* out = dst + size_t(y) * dw * 3;
    memset(out, 0, sizeof(float) * size_t(dw) * 3);
    for (int i = 0; i < n; ++i) {
      const float* row = tmp + size_t(lo + i) * dw * 3;
      float wi = w[i];
      for (int x = 0; x < dw * 3; ++x) out[x] += wi * row[x];
    }
  }
  free(tmp);
  free_table(tx);
  free_table(ty);
}

// Decode into a caller-provided buffer.  Returns 0 on success, -1 on decode
// failure, -2 if the buffer is too small (dims are still written, so the
// caller can grow and retry).
int decode_into(const uint8_t* data, size_t len, uint8_t* dst,
                size_t capacity, int* h, int* w) {
  uint8_t* rgb = decode_image(data, len, h, w);
  if (!rgb) return -1;
  size_t need = size_t(*h) * size_t(*w) * 3;
  if (need > capacity) {
    free(rgb);
    return -2;
  }
  memcpy(dst, rgb, need);
  free(rgb);
  return 0;
}

// Pack RGB u8 HWC into the serving yuv420 wire layout (serving.py
// rgb_to_yuv420): rows 0..h are full-res BT.601 luma, rows h..h+h/2 hold
// the 2x2 box-averaged chroma planes side by side (Cb | Cr), bias 128.
// ~10x the 1-core numpy pack; h and w must be even (validated in Python).
void rgb_to_yuv420_u8(const uint8_t* rgb, int h, int w, uint8_t* out) {
  uint8_t* yp = out;
  uint8_t* up = out + size_t(h) * w;
  uint8_t* vp = up + w / 2;
  for (int y = 0; y < h; y += 2) {
    const uint8_t* r0 = rgb + size_t(y) * w * 3;
    const uint8_t* r1 = r0 + size_t(w) * 3;
    uint8_t* y0 = yp + size_t(y) * w;
    uint8_t* y1 = y0 + w;
    uint8_t* urow = up + size_t(y / 2) * w;   // row stride of the chroma
    uint8_t* vrow = vp + size_t(y / 2) * w;   // block is w (U and V split it)
    for (int x = 0; x < w; x += 2) {
      float usum = 0.f, vsum = 0.f;
      const uint8_t* px[4] = {r0 + x * 3, r0 + (x + 1) * 3,
                              r1 + x * 3, r1 + (x + 1) * 3};
      uint8_t* yd[4] = {y0 + x, y0 + x + 1, y1 + x, y1 + x + 1};
      for (int k = 0; k < 4; ++k) {
        float R = px[k][0], G = px[k][1], B = px[k][2];
        float Y = 0.299f * R + 0.587f * G + 0.114f * B;
        usum += -0.168736f * R - 0.331264f * G + 0.5f * B;
        vsum += 0.5f * R - 0.418688f * G - 0.081312f * B;
        float yr = std::rintf(Y);
        *yd[k] = (uint8_t)(yr < 0.f ? 0.f : (yr > 255.f ? 255.f : yr));
      }
      float u = std::rintf(usum * 0.25f + 128.f);
      float v = std::rintf(vsum * 0.25f + 128.f);
      urow[x / 2] = (uint8_t)(u < 0.f ? 0.f : (u > 255.f ? 255.f : u));
      vrow[x / 2] = (uint8_t)(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
    }
  }
}

// Horizontal flip in place on float32 HWC.
void hflip_f32(float* img, int h, int w) {
  for (int y = 0; y < h; ++y) {
    float* row = img + size_t(y) * w * 3;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < 3; ++c) {
        float t = row[x * 3 + c];
        row[x * 3 + c] = row[(w - 1 - x) * 3 + c];
        row[(w - 1 - x) * 3 + c] = t;
      }
    }
  }
}

}  // extern "C"
