// Native data-pipeline runtime for gaussianavatars_tpu.
//
// The reference feeds its trainer through torch DataLoader worker *processes*
// whose decode path is C (libjpeg/libpng inside PIL) — `scene/__init__.py:
// 31-67`, `train.py:116-124`. This library is the equivalent native runtime
// for the TPU host: multi-threaded image decode (PNG via libpng, JPEG via
// libjpeg), alpha compositing onto a background colour, bilinear resize, and
// float32 HWC output ready for jax.device_put. Exposed through a plain C ABI
// consumed with ctypes (no pybind11 dependency).
//
// Build: see native/Makefile (g++ -O3 -shared, links png/jpeg/z/pthread).

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<unsigned char> data;  // 8-bit, interleaved
};

// ---------------------------------------------------------------- PNG ----
bool decode_png(FILE* f, Image* out) {
  // Declared before setjmp: a longjmp from libpng must not jump over the
  // construction of objects with destructors (UB; in practice a leak on
  // corrupt images).
  std::vector<png_bytep> rows;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->w = static_cast<int>(w);
  out->h = static_cast<int>(h);
  out->channels = channels;
  out->data.resize(static_cast<size_t>(w) * h * channels);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + static_cast<size_t>(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// --------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        out->data.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[4] = {0};
  size_t got = std::fread(magic, 1, 4, f);
  std::rewind(f);
  bool ok = false;
  if (got == 4 && magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  }
  std::fclose(f);
  return ok;
}

// ---------------------------------------------------- composite+resize ----
// Bilinear sample of the composited (alpha-over-bg) source at (sx, sy).
inline void sample(const Image& im, const float bg[3], float sx, float sy,
                   float* rgb) {
  int x0 = std::max(0, std::min(im.w - 1, static_cast<int>(sx)));
  int y0 = std::max(0, std::min(im.h - 1, static_cast<int>(sy)));
  int x1 = std::min(im.w - 1, x0 + 1);
  int y1 = std::min(im.h - 1, y0 + 1);
  float fx = sx - x0, fy = sy - y0;
  const int c = im.channels;
  auto px = [&](int x, int y, float* v) {
    const unsigned char* p =
        im.data.data() + (static_cast<size_t>(y) * im.w + x) * c;
    float a = (c == 4) ? p[3] / 255.0f : 1.0f;
    for (int k = 0; k < 3; ++k)
      v[k] = (p[k] / 255.0f) * a + bg[k] * (1.0f - a);
  };
  float v00[3], v10[3], v01[3], v11[3];
  px(x0, y0, v00);
  px(x1, y0, v10);
  px(x0, y1, v01);
  px(x1, y1, v11);
  for (int k = 0; k < 3; ++k) {
    float top = v00[k] * (1 - fx) + v10[k] * fx;
    float bot = v01[k] * (1 - fx) + v11[k] * fx;
    rgb[k] = top * (1 - fy) + bot * fy;
  }
}

int decode_one(const char* path, int tw, int th, const float bg[3],
               float* out) {
  Image im;
  if (!decode_file(path, &im)) return -1;
  if (im.channels != 3 && im.channels != 4) return -2;
  const float sx_scale = static_cast<float>(im.w) / tw;
  const float sy_scale = static_cast<float>(im.h) / th;
  for (int y = 0; y < th; ++y) {
    for (int x = 0; x < tw; ++x) {
      float sx = (x + 0.5f) * sx_scale - 0.5f;
      float sy = (y + 0.5f) * sy_scale - 0.5f;
      sample(im, bg, sx, sy, out + (static_cast<size_t>(y) * tw + x) * 3);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode one image to float32 HWC [th, tw, 3], alpha-composited onto bg.
// Returns 0 on success.
int gsav_decode_image(const char* path, int tw, int th, const float* bg,
                      float* out) {
  return decode_one(path, tw, th, bg, out);
}

// Decode n images in parallel with a transient thread pool.
// paths: array of C strings; out: [n, th, tw, 3] float32.
// Returns number of failures.
int gsav_decode_batch(const char** paths, int n, int tw, int th,
                      const float* bg, float* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next(0), failures(0);
  const size_t stride = static_cast<size_t>(tw) * th * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (decode_one(paths[i], tw, th, bg, out + stride * i) != 0)
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

// Probe image dimensions without full decode. Returns 0 on success.
int gsav_image_size(const char* path, int* w, int* h) {
  Image im;
  // PNG: header-only read would need separate plumbing; full decode is
  // acceptable here (used once per camera at dataset load).
  if (!decode_file(path, &im)) return -1;
  *w = im.w;
  *h = im.h;
  return 0;
}

}  // extern "C"
