// Native host-side image decode + threaded batch loader.
//
// The reference delegates decode to tifffile/cv2/PIL inside torch DataLoader
// worker *processes* (reference: src/data/dataset.py:488-506, :636-643).
// Here decode is a C++ thread pool inside the main process — no fork, no
// pickle, no GIL on the decode path — feeding the device-resident pipeline
// (thyroid_tpu/data/pipeline.py) with a single contiguous uint16 block.
//
// Supported: PNG (8/16-bit, gray/RGB/RGBA via libpng, 16-bit network byte
// order handled), classic TIFF (uncompressed strips, II/MM, 8/16-bit,
// 1 or 3 samples — the corpus's primary format), and PGM P5 (8/16-bit).
// RGB collapses to BT.601 luminance with cv2's exact fixed-point
// coefficients (R*19596 + G*38470 + B*7470 + 2^15) >> 16 — the same rounding
// cv2.cvtColor(RGB2GRAY) applies — at native bit depth; 8-bit values are
// then upscaled ×257 to the uint16 scale (reference: dataset.py:525-529),
// matching the Python chain's cvtColor-before-upscale order bit-for-bit.
// The corpus itself is single-channel at source.
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

// cv2 5.x's fixed-point BT.601 luminance: coefficients round(w * 2^16)
// normalized to sum exactly 2^16 (19596 + 38470 + 7470), round-half-up.
// Verified bit-exact against cv2.cvtColor(RGB2GRAY) for full random 8U and
// 16U planes (tests/unit/test_native_loader.py).
inline uint16_t bt601_gray(uint32_t r, uint32_t g, uint32_t b) {
  return static_cast<uint16_t>(
      (static_cast<uint64_t>(r) * 19596u + static_cast<uint64_t>(g) * 38470u +
       static_cast<uint64_t>(b) * 7470u + (1u << 15)) >> 16);
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
      // Gray-convert at NATIVE depth, then upscale 8→16 — mirrors the
      // Python chain (dataset.py decode_image: cvtColor before *257), whose
      // rounding differs from weighting pre-scaled values.
      uint32_t px[4] = {0, 0, 0, 0};
      for (int ch = 0; ch < c && ch < 4; ++ch) {
        if (img->bit_depth == 16) {
          const uint16_t* rp =
              reinterpret_cast<const uint16_t*>(raw.data() + y * rowbytes);
          px[ch] = rp[x * c + ch];
        } else {
          px[ch] = raw[y * rowbytes + x * c + ch];
        }
      }
      uint32_t v = (c >= 3) ? bt601_gray(px[0], px[1], px[2]) : px[0];
      if (img->bit_depth != 16) v *= 257;
      img->data[static_cast<size_t>(y) * img->w + x] =
          static_cast<uint16_t>(v);
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

// --- Classic TIFF (the corpus's PRIMARY format: 512×512 uint16 grayscale,
// reference src/data/dataset.py:490 decodes via tifffile first). Scope:
// first IFD, uncompressed strips, chunky planar layout, 8/16-bit unsigned,
// 1 or 3 samples/pixel, both byte orders. Anything else returns kErrFormat
// and the Python tifffile/PIL fallback chain takes over (the binding treats
// any nonzero rc as "use the Python path").
struct TiffReader {
  const uint8_t* p;
  size_t size;
  bool big_endian;

  uint16_t u16(size_t off) const {
    if (off + 2 > size) return 0;
    return big_endian ? (uint16_t)((p[off] << 8) | p[off + 1])
                      : (uint16_t)((p[off + 1] << 8) | p[off]);
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > size) return 0;
    return big_endian ? ((uint32_t)p[off] << 24) | ((uint32_t)p[off + 1] << 16) |
                            ((uint32_t)p[off + 2] << 8) | p[off + 3]
                      : ((uint32_t)p[off + 3] << 24) | ((uint32_t)p[off + 2] << 16) |
                            ((uint32_t)p[off + 1] << 8) | p[off];
  }
};

struct TiffTag {
  uint16_t id = 0, type = 0;
  uint32_t count = 0;
  size_t value_off = 0;  // offset of the inline value field (4 bytes)
};

// Read entry i of a SHORT(3)/LONG(4) tag value array.
uint32_t tiff_tag_entry(const TiffReader& r, const TiffTag& t, uint32_t i) {
  const size_t esz = (t.type == 3) ? 2 : 4;
  size_t base = t.value_off;
  if (t.count * esz > 4) base = r.u32(t.value_off);  // out-of-line values
  return (t.type == 3) ? r.u16(base + i * esz) : r.u32(base + i * esz);
}

int decode_tiff(const char* path, Image* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  std::fseek(fp, 0, SEEK_END);
  long fsize = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  if (fsize < 8) { std::fclose(fp); return kErrFormat; }
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  if (std::fread(buf.data(), 1, buf.size(), fp) != buf.size()) {
    std::fclose(fp);
    return kErrFormat;
  }
  std::fclose(fp);

  TiffReader r{buf.data(), buf.size(), false};
  if (buf[0] == 'M' && buf[1] == 'M') r.big_endian = true;
  else if (!(buf[0] == 'I' && buf[1] == 'I')) return kErrFormat;
  if (r.u16(2) != 42) return kErrFormat;  // classic TIFF only (no BigTIFF)

  size_t ifd = r.u32(4);
  if (ifd + 2 > r.size) return kErrFormat;
  const uint16_t n_entries = r.u16(ifd);

  uint32_t width = 0, height = 0, compression = 1, spp = 1, rows_per_strip = 0;
  uint32_t planar = 1, sample_format = 1;
  std::vector<uint32_t> bits, strip_offsets, strip_counts;
  for (uint16_t e = 0; e < n_entries; ++e) {
    size_t off = ifd + 2 + e * 12u;
    if (off + 12 > r.size) return kErrFormat;
    TiffTag t{r.u16(off), r.u16(off + 2), r.u32(off + 4), off + 8};
    if (t.type != 3 && t.type != 4) continue;  // only SHORT/LONG matter here
    switch (t.id) {
      case 256: width = tiff_tag_entry(r, t, 0); break;
      case 257: height = tiff_tag_entry(r, t, 0); break;
      case 258:
        for (uint32_t i = 0; i < t.count; ++i)
          bits.push_back(tiff_tag_entry(r, t, i));
        break;
      case 259: compression = tiff_tag_entry(r, t, 0); break;
      case 273:
        for (uint32_t i = 0; i < t.count; ++i)
          strip_offsets.push_back(tiff_tag_entry(r, t, i));
        break;
      case 277: spp = tiff_tag_entry(r, t, 0); break;
      case 278: rows_per_strip = tiff_tag_entry(r, t, 0); break;
      case 279:
        for (uint32_t i = 0; i < t.count; ++i)
          strip_counts.push_back(tiff_tag_entry(r, t, i));
        break;
      case 284: planar = tiff_tag_entry(r, t, 0); break;
      case 339: sample_format = tiff_tag_entry(r, t, 0); break;
      default: break;
    }
  }

  if (width == 0 || height == 0 || strip_offsets.empty()) return kErrFormat;
  if (compression != 1 || planar != 1 || sample_format != 1) return kErrFormat;
  if (spp != 1 && spp != 3) return kErrFormat;
  uint32_t depth = bits.empty() ? 8 : bits[0];
  for (uint32_t b : bits)
    if (b != depth) return kErrFormat;
  if (depth != 8 && depth != 16) return kErrFormat;
  if (rows_per_strip == 0) rows_per_strip = height;
  if (strip_counts.size() != strip_offsets.size()) {
    // StripByteCounts is technically required; tolerate its absence for a
    // single full-image strip
    if (strip_offsets.size() != 1) return kErrFormat;
    strip_counts.assign(1, width * height * spp * (depth / 8));
  }

  const size_t bytes_per_px = spp * (depth / 8);
  const size_t row_bytes = static_cast<size_t>(width) * bytes_per_px;
  std::vector<uint8_t> raw(static_cast<size_t>(height) * row_bytes);
  uint32_t row = 0;
  for (size_t s = 0; s < strip_offsets.size() && row < height; ++s) {
    uint32_t rows_here = std::min<uint32_t>(rows_per_strip, height - row);
    size_t want = rows_here * row_bytes;
    if (strip_counts[s] < want) want = strip_counts[s];
    if (strip_offsets[s] + want > r.size) return kErrFormat;
    std::memcpy(raw.data() + static_cast<size_t>(row) * row_bytes,
                buf.data() + strip_offsets[s], want);
    row += rows_here;
  }
  if (row < height) return kErrFormat;

  img->h = static_cast<int>(height);
  img->w = static_cast<int>(width);
  img->channels = static_cast<int>(spp);
  img->bit_depth = static_cast<int>(depth);
  img->data.resize(static_cast<size_t>(height) * width);
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* rp = raw.data() + static_cast<size_t>(y) * row_bytes;
    for (uint32_t x = 0; x < width; ++x) {
      // Same ordering rule as decode_png: gray at native depth, then *257.
      uint32_t px[3] = {0, 0, 0};
      for (uint32_t ch = 0; ch < spp && ch < 3; ++ch) {
        if (depth == 16) {
          size_t o = (static_cast<size_t>(x) * spp + ch) * 2;
          px[ch] = r.big_endian ? (uint16_t)((rp[o] << 8) | rp[o + 1])
                                : (uint16_t)((rp[o + 1] << 8) | rp[o]);
        } else {
          px[ch] = rp[x * spp + ch];
        }
      }
      uint32_t v = (spp == 3) ? bt601_gray(px[0], px[1], px[2]) : px[0];
      if (depth != 16) v *= 257;
      img->data[static_cast<size_t>(y) * width + x] =
          static_cast<uint16_t>(v);
    }
  }
  return 0;
}

int decode_any(const char* path, Image* img) {
  std::string p(path);
  if (has_suffix(p, ".pgm") || has_suffix(p, ".PGM")) return decode_pgm(path, img);
  if (has_suffix(p, ".tif") || has_suffix(p, ".TIF") ||
      has_suffix(p, ".tiff") || has_suffix(p, ".TIFF"))
    return decode_tiff(path, img);
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
