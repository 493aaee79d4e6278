// mdspre — native host-side image preprocessing for mds_tpu.
//
// TPU-native replacement for the reference's GPU input pipelines: the DALI
// graph (reference: lib/get_dataloader.py:490-733 — nvJPEG decode, fused
// random-resized-crop/flip/jitter, label LUT) and the CVCUDA stack
// (lib/cvCudaDataset.py, cvCudaPreprocess.py, cvCudaDataLoader.py — batch
// JPEG decode + normalize + reformat with prefetch rings). On TPU the device
// should spend its cycles on the model, so decode+augment runs on host CPU in
// native code; normalization stays fused into the XLA graph.
//
// Exposed C ABI (ctypes):
//   mdspre_decode_jpeg / mdspre_decode_png     — file → RGB u8 / gray u8
//   mdspre_resize_bilinear_u8 / resize_nearest_u8
//   mdspre_fused_augment — scale-resize + pad + crop + hflip + brightness/
//       contrast LUTs + saturation matmul + label LUT, one pass, both maps
//       (semantics of lib/transform_cv2.py:14-127 + the ToTensor LUT remap)
//
// Build: make -C cpp   (g++ -O3 -shared; links libjpeg, libpng)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {

// ----------------------------------------------------------------- decoding
struct mdspre_error_mgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void mdspre_jpeg_error_exit(j_common_ptr cinfo) {
  mdspre_error_mgr* err = reinterpret_cast<mdspre_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to RGB u8. Returns 0 on success; fills h/w; caller
// provides out buffer of capacity cap (bytes). If out==nullptr just probes.
int mdspre_decode_jpeg(const uint8_t* data, int64_t size, uint8_t* out,
                       int64_t cap, int32_t* h, int32_t* w) {
  jpeg_decompress_struct cinfo;
  mdspre_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = mdspre_jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  if (!out) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  int64_t need = (int64_t)(*h) * (*w) * 3;
  if (cap < need) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (int64_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct PngReadState {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + (int64_t)n > s->size) {
    png_error(png, "eof");
  }
  memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

// Decode PNG to `channels` (1=gray labels, 3=RGB). Returns 0 on success.
int mdspre_decode_png(const uint8_t* data, int64_t size, uint8_t* out,
                      int64_t cap, int32_t* h, int32_t* w, int32_t channels) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  PngReadState st{data, size, 0};
  png_set_read_fn(png, &st, png_mem_read);
  png_read_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (channels == 3) {
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
  } else {
    if (color & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);
  if (!out) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  int64_t rowbytes = (int64_t)(*w) * channels;
  if (cap < rowbytes * (*h)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  for (int32_t y = 0; y < *h; y++) {
    png_bytep row = out + (int64_t)y * rowbytes;
    png_read_row(png, row, nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ----------------------------------------------------------------- resizing
// Bilinear u8 resize, half-pixel convention (matches PIL/jax.image).
void mdspre_resize_bilinear_u8(const uint8_t* src, int32_t sh, int32_t sw,
                               int32_t c, uint8_t* dst, int32_t dh,
                               int32_t dw) {
  const float ys = (float)sh / dh, xs = (float)sw / dw;
  for (int32_t y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * ys - 0.5f;
    int32_t y0 = (int32_t)floorf(fy);
    float wy = fy - y0;
    int32_t y0c = std::min(std::max(y0, 0), sh - 1);
    int32_t y1c = std::min(y0 + 1 < 0 ? 0 : y0 + 1, sh - 1);
    if (fy < 0) wy = 0.f;
    for (int32_t x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * xs - 0.5f;
      int32_t x0 = (int32_t)floorf(fx);
      float wx = fx - x0;
      int32_t x0c = std::min(std::max(x0, 0), sw - 1);
      int32_t x1c = std::min(x0 + 1 < 0 ? 0 : x0 + 1, sw - 1);
      if (fx < 0) wx = 0.f;
      for (int32_t ch = 0; ch < c; ch++) {
        float p00 = src[((int64_t)y0c * sw + x0c) * c + ch];
        float p01 = src[((int64_t)y0c * sw + x1c) * c + ch];
        float p10 = src[((int64_t)y1c * sw + x0c) * c + ch];
        float p11 = src[((int64_t)y1c * sw + x1c) * c + ch];
        float top = p00 * (1 - wx) + p01 * wx;
        float bot = p10 * (1 - wx) + p11 * wx;
        float v = top * (1 - wy) + bot * wy;
        dst[((int64_t)y * dw + x) * c + ch] = (uint8_t)std::min(
            std::max((int)lrintf(v), 0), 255);
      }
    }
  }
}

// Nearest u8 resize, half-pixel (exact for label maps).
void mdspre_resize_nearest_u8(const uint8_t* src, int32_t sh, int32_t sw,
                              int32_t c, uint8_t* dst, int32_t dh, int32_t dw) {
  const float ys = (float)sh / dh, xs = (float)sw / dw;
  for (int32_t y = 0; y < dh; y++) {
    int32_t sy = std::min((int32_t)((y + 0.5f) * ys), sh - 1);
    for (int32_t x = 0; x < dw; x++) {
      int32_t sx = std::min((int32_t)((x + 0.5f) * xs), sw - 1);
      memcpy(dst + ((int64_t)y * dw + x) * c,
             src + ((int64_t)sy * sw + sx) * c, c);
    }
  }
}

// ------------------------------------------------------------ fused augment
// One-pass train augmentation of an (image, label) pair
// (lib/transform_cv2.py semantics):
//   1. scale-resize to (rh, rw) — bilinear im / nearest lb;
//   2. pad both sides by pad_h/pad_w (im: 0, lb: 255);
//   3. crop crop_h×crop_w at (off_y, off_x);
//   4. optional horizontal flip;
//   5. brightness LUT (i·b), contrast LUT (74 + (i−74)·c), saturation matmul;
//   6. label LUT (256-entry id→trainId).
// All randomness is host-side: the caller draws the parameters.
void mdspre_fused_augment(
    const uint8_t* im, const uint8_t* lb, int32_t h, int32_t w,
    int32_t rh, int32_t rw, int32_t pad_h, int32_t pad_w,
    int32_t off_y, int32_t off_x, int32_t crop_h, int32_t crop_w,
    int32_t flip, float brightness, float contrast, float saturation,
    const uint8_t* lb_lut, uint8_t* out_im, uint8_t* out_lb) {
  // combined brightness+contrast LUT
  uint8_t lut[256];
  for (int i = 0; i < 256; i++) {
    float v = i * brightness;
    v = v > 255.f ? 255.f : (v < 0.f ? 0.f : v);
    v = 74.f + ((float)(uint8_t)v - 74.f) * contrast;
    lut[i] = (uint8_t)std::min(std::max((int)v, 0), 255);
  }
  // saturation in 15-bit fixed point (exact identity at saturation=1)
  const float m00 = (1 + 2 * saturation) / 3.f, m01 = (1 - saturation) / 3.f;
  const int32_t m00q = (int32_t)lrintf(m00 * 32768.f);
  const int32_t m01q = (int32_t)lrintf(m01 * 32768.f);

  // Per-output-column source tables (hoisted out of the row loop): the
  // column→source-x mapping, clamps and blend weights are row-invariant, so
  // compute them once instead of per pixel — together with the 15-bit
  // fixed-point blends below this is ~4× the old per-pixel float version.
  const float ys = (float)h / rh, xs = (float)w / rw;
  int32_t* sxv = (int32_t*)malloc((size_t)crop_w * 4 * sizeof(int32_t));
  int32_t* x0v = sxv + crop_w;
  int32_t* x1v = x0v + crop_w;
  int32_t* wxv = x1v + crop_w;  // 0..32768
  for (int32_t ox = 0; ox < crop_w; ox++) {
    int32_t ix = flip ? (crop_w - 1 - ox) : ox;
    int32_t rx = off_x + ix - pad_w;
    if (rx < 0 || rx >= rw) {
      sxv[ox] = -1;
      continue;
    }
    sxv[ox] = std::min((int32_t)((rx + 0.5f) * xs), w - 1);
    float fx = (rx + 0.5f) * xs - 0.5f;
    int32_t x0 = (int32_t)floorf(fx);
    float wx = fx - x0;
    if (fx < 0) wx = 0.f;
    x0v[ox] = std::min(std::max(x0, 0), w - 1);
    x1v[ox] = std::min(std::max(x0 + 1, 0), w - 1);
    wxv[ox] = (int32_t)lrintf(wx * 32768.f);
  }

  for (int32_t oy = 0; oy < crop_h; oy++) {
    uint8_t* orow_im = out_im + (int64_t)oy * crop_w * 3;
    uint8_t* orow_lb = out_lb + (int64_t)oy * crop_w;
    int32_t ry = off_y + oy - pad_h;
    if (ry < 0 || ry >= rh) {
      memset(orow_im, 0, (size_t)crop_w * 3);
      memset(orow_lb, 255, (size_t)crop_w);
      continue;
    }
    int32_t sy = std::min((int32_t)((ry + 0.5f) * ys), h - 1);
    const uint8_t* lrow = lb + (int64_t)sy * w;
    float fy = (ry + 0.5f) * ys - 0.5f;
    int32_t y0 = (int32_t)floorf(fy);
    float wy = fy - y0;
    if (fy < 0) wy = 0.f;
    const uint8_t* row0 = im + (int64_t)std::min(std::max(y0, 0), h - 1) * w * 3;
    const uint8_t* row1 =
        im + (int64_t)std::min(std::max(y0 + 1, 0), h - 1) * w * 3;
    const int32_t wyq = (int32_t)lrintf(wy * 32768.f);
    for (int32_t ox = 0; ox < crop_w; ox++) {
      if (sxv[ox] < 0) {
        orow_im[ox * 3] = orow_im[ox * 3 + 1] = orow_im[ox * 3 + 2] = 0;
        orow_lb[ox] = 255;
        continue;
      }
      orow_lb[ox] = lb_lut[lrow[sxv[ox]]];
      const int64_t i0 = (int64_t)x0v[ox] * 3, i1 = (int64_t)x1v[ox] * 3;
      const int32_t wxq = wxv[ox];
      int32_t rgb[3];
      for (int ch = 0; ch < 3; ch++) {
        // a + (b-a)*w with round-to-nearest; exact endpoints at w∈{0,32768}
        int32_t t0 = (int32_t)row0[i0 + ch];
        t0 += (((int32_t)row0[i1 + ch] - t0) * wxq + 16384) >> 15;
        int32_t t1 = (int32_t)row1[i0 + ch];
        t1 += (((int32_t)row1[i1 + ch] - t1) * wxq + 16384) >> 15;
        rgb[ch] = lut[t0 + (((t1 - t0) * wyq + 16384) >> 15)];
      }
      // saturation matmul: out = M·rgb, M = ((1+2s, 1−s, 1−s)/3 …);
      // truncation (not rounding) matches the numpy uint8 cast
      const int32_t sum = rgb[0] + rgb[1] + rgb[2];
      for (int ch = 0; ch < 3; ch++) {
        int32_t v = (rgb[ch] * m00q + (sum - rgb[ch]) * m01q) >> 15;
        orow_im[ox * 3 + ch] = (uint8_t)std::min(std::max(v, 0), 255);
      }
    }
  }
  free(sxv);
}

}  // extern "C"
