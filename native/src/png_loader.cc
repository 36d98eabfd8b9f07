// Multithreaded grayscale PNG batch loader for the data pipeline.
//
// Native runtime counterpart of the reference's per-image cv2.imread loop
// (reference utils/utils_image.py:145-157): decodes a whole testset into a
// preallocated float32 [0,1] batch with a worker pool, applying the modcrop
// the pipeline needs (reference utils_image.py:495-508).

#include <png.h>
#include <csetjmp>
#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct GrayImage {
  int h = 0, w = 0;
  std::vector<uint8_t> pixels;  // row-major
};

// Decode one PNG as 8-bit grayscale. Returns false on failure.
bool decode_png_gray(const char* path, GrayImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  // Normalize everything to 8-bit grayscale (BT.601 luma for color inputs,
  // matching cv2.imread(path, 0)).
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE) {
    png_set_rgb_to_gray_fixed(png, 1 /*error_action: silent*/, 29900, 58700);
  }
  png_read_update_info(png, info);

  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->pixels.resize(static_cast<size_t>(h) * w);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 r = 0; r < h; ++r) rows[r] = out->pixels.data() + r * w;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// Decode an uncompressed BMP (8-bit palette or 24/32-bit) as grayscale —
// the reference "testsets/*.png" files are actually BMPs (cv2.imread
// dispatches on magic bytes, not extension; so do we).
bool decode_bmp_gray(const char* path, GrayImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  std::fseek(fp, 0, SEEK_END);
  long sz = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  bool ok = std::fread(buf.data(), 1, sz, fp) == static_cast<size_t>(sz);
  std::fclose(fp);
  if (!ok || sz < 54 || buf[0] != 'B' || buf[1] != 'M') return false;

  auto rd32 = [&](size_t off) {
    uint32_t v;
    std::memcpy(&v, buf.data() + off, 4);
    return v;
  };
  auto rd16 = [&](size_t off) {
    uint16_t v;
    std::memcpy(&v, buf.data() + off, 2);
    return v;
  };
  uint32_t data_off = rd32(10);
  uint32_t hdr = rd32(14);
  if (hdr < 40) return false;
  int32_t w = static_cast<int32_t>(rd32(18));
  int32_t h = static_cast<int32_t>(rd32(22));
  uint16_t bpp = rd16(28);
  uint32_t comp = rd32(30);
  if (comp != 0 || w <= 0) return false;
  bool flip = h > 0;  // bottom-up rows when height positive
  int ah = std::abs(h);

  const uint8_t* pal = buf.data() + 14 + hdr;  // BGRA palette entries
  size_t row_stride = ((static_cast<size_t>(w) * bpp + 31) / 32) * 4;
  if (data_off + row_stride * ah > static_cast<size_t>(sz)) return false;
  // 8-bpp path dereferences up to 256 palette entries — bound them too
  if (bpp == 8 && 14 + hdr + 256 * 4 > static_cast<size_t>(sz)) return false;

  out->h = ah;
  out->w = w;
  out->pixels.resize(static_cast<size_t>(ah) * w);
  for (int r = 0; r < ah; ++r) {
    const uint8_t* row = buf.data() + data_off + row_stride * (flip ? ah - 1 - r : r);
    uint8_t* dst = out->pixels.data() + static_cast<size_t>(r) * w;
    if (bpp == 8) {
      for (int c = 0; c < w; ++c) {
        const uint8_t* e = pal + 4 * row[c];
        // BT.601 luma on the palette BGR (identity for gray palettes)
        dst[c] = static_cast<uint8_t>(
            (299 * e[2] + 587 * e[1] + 114 * e[0] + 500) / 1000);
      }
    } else if (bpp == 24 || bpp == 32) {
      int step = bpp / 8;
      for (int c = 0; c < w; ++c) {
        const uint8_t* e = row + static_cast<size_t>(c) * step;
        dst[c] = static_cast<uint8_t>(
            (299 * e[2] + 587 * e[1] + 114 * e[0] + 500) / 1000);
      }
    } else {
      return false;
    }
  }
  return true;
}

// Decode a JPEG as 8-bit grayscale via libjpeg.
bool decode_jpeg_gray(const char* path, GrayImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr ci) { longjmp(*static_cast<jmp_buf*>(ci->client_data), 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->pixels.resize(static_cast<size_t>(out->h) * out->w);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->pixels.data() +
                   static_cast<size_t>(cinfo.output_scanline) * out->w;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

// Dispatch on magic bytes like cv2.imread does.
bool decode_image_gray(const char* path, GrayImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  uint8_t magic[2] = {0, 0};
  size_t got = std::fread(magic, 1, 2, fp);
  std::fclose(fp);
  if (got != 2) return false;
  if (magic[0] == 'B' && magic[1] == 'M') return decode_bmp_gray(path, out);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg_gray(path, out);
  return decode_png_gray(path, out);
}

}  // namespace

extern "C" {

// Query dimensions after modcrop. Decodes pixels only for formats whose
// header parse is not separable here; PNG reads the header only.
int pnp_png_dims(const char* path, int modcrop, int* h, int* w) {
  int ih = 0, iw = 0;
  FILE* probe = std::fopen(path, "rb");
  if (!probe) return -1;
  uint8_t magic[2] = {0, 0};
  size_t got = std::fread(magic, 1, 2, probe);
  std::fclose(probe);
  if (got != 2) return -1;
  if (magic[0] == 0x89 && magic[1] == 'P') {
    // PNG: header-only read (no pixel decode)
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info || setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      std::fclose(fp);
      return -1;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    ih = static_cast<int>(png_get_image_height(png, info));
    iw = static_cast<int>(png_get_image_width(png, info));
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
  } else {
    GrayImage img;
    if (!decode_image_gray(path, &img)) return -1;
    ih = img.h;
    iw = img.w;
  }
  int m = modcrop > 0 ? modcrop : 1;
  *h = ih - ih % m;
  *w = iw - iw % m;
  return 0;
}

// Decode a batch of same-size PNGs into out[n, h, w] float32 [0,1] and
// out_uint[n, h, w] float32 on the 0-255 scale (both optional: pass null).
// All images must match (h, w) after modcrop. Returns 0 on success, else
// the (1-based) index of the first failing path.
int pnp_load_png_batch(const char** paths, int n, int h, int w, int modcrop,
                       float* out01, float* out255, int n_threads) {
  std::atomic<int> failed{0};
  int workers = n_threads > 0 ? n_threads
                              : static_cast<int>(std::thread::hardware_concurrency());
  if (workers <= 0) workers = 4;
  if (workers > n) workers = n;

  auto work = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      if (failed.load(std::memory_order_relaxed)) return;
      GrayImage img;
      if (!decode_image_gray(paths[i], &img)) {
        failed.store(i + 1);
        return;
      }
      int m = modcrop > 0 ? modcrop : 1;
      int ch = img.h - img.h % m, cw = img.w - img.w % m;
      if (ch != h || cw != w) {
        failed.store(i + 1);
        return;
      }
      size_t base = static_cast<size_t>(i) * h * w;
      for (int r = 0; r < h; ++r) {
        const uint8_t* src = img.pixels.data() + static_cast<size_t>(r) * img.w;
        for (int c = 0; c < w; ++c) {
          float v = static_cast<float>(src[c]);
          if (out01) out01[base + static_cast<size_t>(r) * w + c] = v / 255.0f;
          if (out255) out255[base + static_cast<size_t>(r) * w + c] = v;
        }
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(work, t, workers);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
