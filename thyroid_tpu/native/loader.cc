// Native host-side image decode + threaded batch loader.
//
// The reference delegates decode to tifffile/cv2/PIL inside torch DataLoader
// worker *processes* (reference: src/data/dataset.py:488-506, :636-643).
// Here decode is a C++ thread pool inside the main process — no fork, no
// pickle, no GIL on the decode path — feeding the device-resident pipeline
// (thyroid_tpu/data/pipeline.py) with a single contiguous uint16 block.
//
// Supported: PNG (8/16-bit, gray/RGB/RGBA via libpng, 16-bit network byte
// order handled) and PGM P5 (8/16-bit). 8-bit values are upscaled ×257 to
// the uint16 scale (reference: dataset.py:525-529); RGB collapses to
// luminance-free channel mean (matching cv2 grayscale conversion closely
// enough for microscopy captures, which are single-channel at source).
//
// C ABI (ctypes):
//   int decode_image_u16(const char* path, uint16_t* out, int out_h, int out_w);
//   int decode_batch_u16(const char** paths, int n, uint16_t* out,
//                        int out_h, int out_w, int n_threads);
//   int image_size(const char* path, int* h, int* w);
// Return 0 on success, negative error codes otherwise.

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrShape = -3;
constexpr int kErrPng = -4;

struct Image {
  int h = 0, w = 0, channels = 0, bit_depth = 0;
  std::vector<uint16_t> data;  // interleaved, native endian
};

bool has_suffix(const std::string& s, const std::string& suf) {
  return s.size() >= suf.size() &&
         s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

int decode_png(const char* path, Image* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return kErrFormat;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return kErrPng;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (img->bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (img->bit_depth == 16) png_set_swap(png);  // PNG is big-endian on disk
  png_read_update_info(png, info);

  img->channels = png_get_channels(png, info);
  img->bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw(rowbytes * img->h);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; ++y) rows[y] = raw.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  img->data.resize(static_cast<size_t>(img->h) * img->w);
  const int c = img->channels;
  for (int y = 0; y < img->h; ++y) {
    for (int x = 0; x < img->w; ++x) {
      uint32_t acc = 0;
      for (int ch = 0; ch < c; ++ch) {
        if (img->bit_depth == 16) {
          const uint16_t* px =
              reinterpret_cast<const uint16_t*>(raw.data() + y * rowbytes);
          acc += px[x * c + ch];
        } else {
          acc += static_cast<uint16_t>(raw[y * rowbytes + x * c + ch]) * 257;
        }
      }
      img->data[static_cast<size_t>(y) * img->w + x] =
          static_cast<uint16_t>(acc / c);
    }
  }
  return 0;
}

int decode_pgm(const char* path, Image* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  char magic[3] = {0};
  int w = 0, h = 0, maxval = 0;
  if (std::fscanf(fp, "%2s %d %d %d", magic, &w, &h, &maxval) != 4 ||
      std::strcmp(magic, "P5") != 0) {
    std::fclose(fp);
    return kErrFormat;
  }
  std::fgetc(fp);  // single whitespace after header
  img->w = w;
  img->h = h;
  img->channels = 1;
  img->data.resize(static_cast<size_t>(w) * h);
  if (maxval > 255) {
    std::vector<uint8_t> raw(static_cast<size_t>(w) * h * 2);
    if (std::fread(raw.data(), 1, raw.size(), fp) != raw.size()) {
      std::fclose(fp);
      return kErrFormat;
    }
    for (size_t i = 0; i < img->data.size(); ++i)
      img->data[i] = (static_cast<uint16_t>(raw[2 * i]) << 8) | raw[2 * i + 1];
  } else {
    std::vector<uint8_t> raw(static_cast<size_t>(w) * h);
    if (std::fread(raw.data(), 1, raw.size(), fp) != raw.size()) {
      std::fclose(fp);
      return kErrFormat;
    }
    for (size_t i = 0; i < img->data.size(); ++i)
      img->data[i] = static_cast<uint16_t>(raw[i]) * 257;
  }
  std::fclose(fp);
  return 0;
}

int decode_any(const char* path, Image* img) {
  std::string p(path);
  if (has_suffix(p, ".pgm") || has_suffix(p, ".PGM")) return decode_pgm(path, img);
  return decode_png(path, img);
}

}  // namespace

extern "C" {

int image_size(const char* path, int* h, int* w) {
  Image img;
  int rc = decode_any(path, &img);
  if (rc != 0) return rc;
  *h = img.h;
  *w = img.w;
  return 0;
}

int decode_image_u16(const char* path, uint16_t* out, int out_h, int out_w) {
  Image img;
  int rc = decode_any(path, &img);
  if (rc != 0) return rc;
  if (img.h != out_h || img.w != out_w) return kErrShape;
  std::memcpy(out, img.data.data(),
              static_cast<size_t>(out_h) * out_w * sizeof(uint16_t));
  return 0;
}

int decode_batch_u16(const char** paths, int n, uint16_t* out, int out_h,
                     int out_w, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  const size_t stride = static_cast<size_t>(out_h) * out_w;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      int rc = decode_image_u16(paths[i], out + stride * i, out_h, out_w);
      if (rc != 0) err.store(rc);
    }
  };
  std::vector<std::thread> pool;
  int k = std::min(n_threads, n);
  pool.reserve(k);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return err.load();
}

}  // extern "C"
