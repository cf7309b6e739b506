// Native ingest runtime: threaded JPEG/PNG decode + alpha flatten + pad-to-square +
// antialiased separable resize into fixed-size uint8 RGB batch buffers.
//
// Replaces the Python hot path of the reference's decode pipeline
// (tagging.py:100-120,234-252: PIL decode, white-background flatten, center pad,
// resize) for deployments where host decode would otherwise bottleneck the TPU at
// 100+ images/sec. Exposed through a plain C ABI consumed via ctypes
// (data/native_ingest.py); built by runtime/build.sh with g++ against the system
// libjpeg/libpng.
//
// PNG decode has two paths: a fast one (own chunk parse + libdeflate
// whole-buffer inflate + own defilter, ~1.5x libpng on this host — PNG is
// the worst-case ingest corpus, ARCHITECTURE §6) for the common
// non-interlaced 8-bit formats, byte-identical to libpng and falling back to
// it for everything else; AIIS_NO_FAST_PNG=1 forces libpng.
//
// Resampling replicates PIL's convolution resampling EXACTLY (Pillow
// src/libImaging/Resample.c, 8-bit path): the same coefficient windows,
// the same int32 fixed-point quantization (PRECISION_BITS = 32-8-2), the
// same uint8 horizontal-pass intermediate, and the same clip8 rounding;
// alpha flatten replicates Pillow's paste-with-mask BLEND/MULDIV255. With
// both libraries on libjpeg62/libpng16, the full-decode output is
// bit-identical to data/ingest.load_rgb_square (pinned by
// tests/test_native_ingest.py), so the native pool is safe for golden runs.
// The white pad border is never materialized: pad rows/columns enter the
// convolution as virtual 255-samples, which is arithmetically identical to
// Pillow resizing the padded canvas but skips the canvas allocation and the
// horizontal pass over pad rows.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

// AIIS_FORCE_NO_LIBDEFLATE: set by build.sh when its include+link probe
// fails, so a header-present/library-absent host still links (the fast PNG
// path is simply compiled out and libpng handles everything).
#if defined(__has_include) && !defined(AIIS_FORCE_NO_LIBDEFLATE)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define AIIS_HAVE_LIBDEFLATE 1
#endif
#endif

#if defined(__AVX2__)
#include <immintrin.h>
#elif defined(__SSE4_1__)
#include <smmintrin.h>
#endif

namespace {

struct ImageU8 {
  // Pixels are ALWAYS 4 bytes (RGBX / RGBA): the fourth lane makes every
  // per-pixel loop a clean 4-lane SIMD block (the Pillow-SIMD layout),
  // libjpeg-turbo fills it for free (JCS_EXT_RGBX) and libpng via
  // png_set_filler. `has_alpha` marks a meaningful A lane (composite onto
  // white); otherwise the lane is junk and only lanes 0..2 ever reach the
  // output.
  int w = 0, h = 0;
  bool has_alpha = false;
  std::vector<uint8_t> data;  // row-major, 4 bytes/pixel
};

// Decompression-bomb guard, mirroring PIL's MAX_IMAGE_PIXELS error threshold
// (2x 89,478,485): a malformed header claiming absurd dimensions must fail the
// image, not attempt a multi-GB allocation that aborts or OOM-kills the
// process mid-run.
constexpr uint64_t kMaxPixels = 178956970ull;

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, ImageU8* out, int min_dim) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_RGBX;  // 4-byte pixels straight from turbo
#else
  cinfo.out_color_space = JCS_RGB;
#endif
  if (min_dim > 0) {
    // DCT-domain scaled decode (libjpeg scale_num/8): pick the smallest M/8
    // that keeps the LONG side >= min_dim, so the downstream antialiased
    // resize remains a downscale. Content scales uniformly in both axes and
    // the short side is white-padded downstream, so min_dim only constrains
    // the long side. Skips most of the IDCT + scanline work for large photos.
    long full = std::max<long>(cinfo.image_width, cinfo.image_height);
    unsigned int m = 8;
    for (unsigned int cand = 1; cand <= 8; ++cand) {
      if ((full * cand + 7) / 8 >= min_dim) { m = cand; break; }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  if (uint64_t(cinfo.output_width) * cinfo.output_height > kMaxPixels) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->has_alpha = false;
  out->data.resize(size_t(out->w) * out->h * 4);
#ifdef JCS_EXTENSIONS
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 4;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
#else
  std::vector<uint8_t> row3(size_t(out->w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* r3 = row3.data();
    uint8_t* r4 = out->data.data() + size_t(cinfo.output_scanline) * out->w * 4;
    jpeg_read_scanlines(&cinfo, &r3, 1);
    for (int x = 0; x < out->w; ++x) {
      r4[4 * x] = r3[3 * x];
      r4[4 * x + 1] = r3[3 * x + 1];
      r4[4 * x + 2] = r3[3 * x + 2];
    }
  }
#endif
  // Decline progressive files whose scan script never completed (a stray
  // mid-stream EOI — e.g. one corrupted SOS marker byte — legally ends the
  // image early; both libjpeg and Pillow then render from partial
  // coefficients, but their partial-progressive paths differ by ±1-2 LSB,
  // found by the corruption fuzz). coef_bits tracks the successive-
  // approximation state per coefficient: a COMPLETE progression leaves every
  // entry at Al=0, so anything else (-1 = never coded, >0 = unrefined) means
  // partial data — decline and let PIL be the arbiter. Complete progressive
  // decodes are unaffected (bit-exact vs PIL, pinned by tests).
  bool incomplete_progression = false;
  if (cinfo.progressive_mode && cinfo.coef_bits) {
    for (int ci = 0; ci < cinfo.num_components; ++ci)
      for (int k = 0; k < DCTSIZE2; ++k)
        if (cinfo.coef_bits[ci][k] != 0) incomplete_progression = true;
  }
  jpeg_finish_decompress(&cinfo);
  if (incomplete_progression) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  // Pillow fails a decode that produced ANY corrupt-data warning
  // ("broken data stream when reading image file" on num_warnings > 0 unless
  // LOAD_TRUNCATED_IMAGES) — plain libjpeg instead pads truncated scans with
  // blank rows and carries on. Returning such pixels would TAG a file the
  // PIL-loader pipeline (and the reference, tagging.py:245-252) skips, so a
  // warned decode declines to PIL, which then applies its own policy
  // (including the user's LOAD_TRUNCATED_IMAGES opt-in).
  const bool warned = cinfo.err->num_warnings > 0;
  jpeg_destroy_decompress(&cinfo);
  return !warned;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

bool decode_png(FILE* f, ImageU8* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  // Declared BEFORE setjmp: a libpng error longjmps back here, and jumping
  // over the construction of an object with a non-trivial destructor is UB
  // (and in practice leaked the row-pointer array on every corrupt PNG).
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  // NOTE: chunk-CRC verification stays ON. Skipping it (PNG_CRC_QUIET_USE)
  // measures ~11% faster, but the critical-chunk action also covers
  // PLTE/tRNS/IHDR, which zlib's adler check does NOT protect — a corrupt
  // palette would then decode to silently wrong colors where PIL (and the
  // decline→PIL-fallback contract) rejects the file. No API granularity
  // exists to skip only IDAT CRCs, so correctness wins.
  //
  // Ancillary CRC errors HARD-FAIL instead of libpng's default warn+discard:
  // Pillow rejects a file whose pre-IDAT chunks (tRNS, pHYs, tEXt, unknown —
  // anything it walks during open()) carry a bad CRC, so decoding it here
  // would tag a file the PIL pipeline skips (found by the corruption
  // differential fuzz). Failing declines to PIL, which stays the arbiter.
  // Post-IDAT chunks are never read on this path (no png_read_end), matching
  // Pillow's load(), which ignores post-IDAT CRCs (incl. IEND).
  png_set_crc_action(png, PNG_CRC_DEFAULT, PNG_CRC_ERROR_QUIT);
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (uint64_t(w) * h > kMaxPixels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }

  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth == 16) {
    // PIL decodes 16-bit gray PNG to mode "I" and convert("RGB") CLAMPS the
    // 16-bit value to 0..255 instead of taking the high byte — a quirk not
    // worth replicating natively. Decline; the PIL fallback keeps parity.
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  if (bit_depth == 16) png_set_strip_16(png);  // high byte, = PIL's ;16B unpack
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  // NOTE: tRNS chunks are deliberately NOT expanded to alpha. PIL opens
  // P/L/RGB+tRNS images in their base mode and flatten_to_rgb's
  // convert("RGB") drops the transparency info, so the pipeline (and the
  // reference, tagging.py:100-113) never composites tRNS pixels onto white.
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  bool has_alpha = color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
                   color_type == PNG_COLOR_TYPE_GRAY_ALPHA;
  if (!has_alpha)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);  // 4-byte RGBX rows
  png_read_update_info(png, info);

  if (png_get_channels(png, info) != 4) {  // defensive: should be unreachable
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  out->w = int(w);
  out->h = int(h);
  out->has_alpha = has_alpha;
  out->data.resize(size_t(w) * h * 4);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

#ifdef AIIS_HAVE_LIBDEFLATE
// ---------------------------------------------------------------------------
// Fast PNG path: own chunk parse + libdeflate one-shot inflate + own defilter.
//
// libpng inflates IDAT through zlib's streaming inflate; libdeflate's
// whole-buffer decoder is ~2-3x faster, and PNG is the worst-case host-ingest
// corpus (no DCT-domain shortcut — ARCHITECTURE §6). This path handles the
// common non-interlaced 8-bit formats and produces BYTE-IDENTICAL pixels to
// the libpng path (same defilter math, same expansion rules, same tRNS-drop
// semantics); anything else — 16-bit, sub-8-bit, Adam7, out-of-range palette
// indexes, CRC/stream errors — returns false and the caller falls back to
// decode_png, so failure behavior is exactly the old path's. Chunk CRCs of
// every consumed chunk are verified (the round-4 decision: critical-chunk
// CRCs guard PLTE/IHDR, which the zlib adler check does not cover).
// ---------------------------------------------------------------------------

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

bool decode_png_fast(const uint8_t* buf, size_t n, ImageU8* out) {
  if (n < 8 + 25) return false;
  size_t off = 8;  // signature checked by the caller
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color = -1, interlace = 0;
  const uint8_t* plte = nullptr;
  uint32_t plte_entries = 0;
  std::vector<std::pair<const uint8_t*, size_t>> idat;
  size_t idat_total = 0;
  bool saw_ihdr = false, saw_iend = false;

  while (off + 12 <= n && !saw_iend) {
    const uint32_t len = be32(buf + off);
    if (len > 0x7fffffff || off + 12 + size_t(len) > n) return false;
    const uint8_t* type = buf + off + 4;
    const uint8_t* data = buf + off + 8;
    const uint32_t crc = be32(data + len);
    auto check_crc = [&]() {
      return libdeflate_crc32(0, type, size_t(len) + 4) == crc;
    };
    if (!memcmp(type, "IHDR", 4)) {
      // spec: IHDR must be the FIRST chunk, exactly once — a file violating
      // that is rejected by libpng/PIL, so the fast path must not decode it
      if (off != 8 || saw_ihdr || len != 13 || !check_crc()) return false;
      w = be32(data); h = be32(data + 4);
      bit_depth = data[8]; color = data[9];
      if (data[10] != 0 || data[11] != 0) return false;  // compression/filter
      interlace = data[12];
      saw_ihdr = true;
    } else if (!saw_ihdr) {
      return false;  // any chunk before IHDR: malformed, let libpng reject
    } else if (!memcmp(type, "PLTE", 4)) {
      // spec: at most one PLTE, and it must precede IDAT — libpng hard-errors
      // on both violations, so the fast path must not be laxer
      if (!check_crc() || len % 3 || plte || !idat.empty()) return false;
      plte = data; plte_entries = len / 3;
    } else if (!memcmp(type, "IDAT", 4)) {
      // spec: IDAT chunks must be consecutive; libpng errors on a resumed
      // IDAT run ("Too many IDATs found"), so a gap rejects here too
      if (!check_crc() || (!idat.empty() && idat.back().first +
                           idat.back().second + 12 != data))
        return false;
      idat.emplace_back(data, len);
      idat_total += len;
    } else if (!memcmp(type, "IEND", 4)) {
      // consumed (terminates the parse), so its CRC is verified like every
      // other consumed chunk; libpng/PIL also reject a corrupt IEND CRC
      if (len != 0 || !check_crc()) return false;
      saw_iend = true;
    }
    else {
      // ancillary chunks (incl. tRNS) are skipped DATA-wise — the pipeline
      // drops PNG transparency for non-alpha color types exactly like PIL
      // (see the decode_png tRNS note) — but their CRCs are still verified:
      // Pillow rejects any pre-IDAT chunk with a bad CRC, so accepting one
      // here would decode a file the PIL pipeline skips. Post-IDAT ancillary
      // corruption (which Pillow ignores) declines to the libpng path, which
      // never reads past the image data and decodes it like Pillow does.
      if (!check_crc()) return false;
    }
    off += 12 + size_t(len);
  }
  if (!saw_ihdr || !saw_iend || idat.empty()) return false;
  if (bit_depth != 8 || interlace != 0) return false;
  if (w == 0 || h == 0 || uint64_t(w) * h > kMaxPixels) return false;
  int bpp;
  switch (color) {
    case 0: bpp = 1; break;             // gray
    case 2: bpp = 3; break;             // RGB
    case 3: bpp = 1; if (!plte) return false; break;  // palette
    case 4: bpp = 2; break;             // gray+alpha
    case 6: bpp = 4; break;             // RGBA
    default: return false;
  }

  const size_t rowbytes = size_t(w) * bpp;
  const size_t stride = rowbytes + 1;  // +1 filter byte
  std::vector<uint8_t> raw(stride * h);
  std::vector<uint8_t> zbuf;
  const uint8_t* zdata;
  if (idat.size() == 1) {
    zdata = idat[0].first;
  } else {
    zbuf.reserve(idat_total);
    for (auto& s : idat) zbuf.insert(zbuf.end(), s.first, s.first + s.second);
    zdata = zbuf.data();
  }
  thread_local libdeflate_decompressor* dec = libdeflate_alloc_decompressor();
  if (!dec) return false;
  size_t actual = 0;
  if (libdeflate_zlib_decompress(dec, zdata, idat_total, raw.data(),
                                 raw.size(), &actual) != LIBDEFLATE_SUCCESS ||
      actual != raw.size())
    return false;

  // defilter in place (PNG spec filters; byte-exact integer math)
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + size_t(y) * stride + 1;
    const uint8_t* prev = y ? row - stride : nullptr;
    switch (raw[size_t(y) * stride]) {
      case 0: break;
      case 1:  // Sub
        for (size_t i = bpp; i < rowbytes; ++i) row[i] += row[i - bpp];
        break;
      case 2:  // Up
        if (prev) for (size_t i = 0; i < rowbytes; ++i) row[i] += prev[i];
        break;
      case 3:  // Average
        if (prev) {
          for (size_t i = 0; i < size_t(bpp) && i < rowbytes; ++i)
            row[i] += prev[i] >> 1;
          for (size_t i = bpp; i < rowbytes; ++i)
            row[i] += uint8_t((row[i - bpp] + prev[i]) >> 1);
        } else {
          for (size_t i = bpp; i < rowbytes; ++i) row[i] += row[i - bpp] >> 1;
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < rowbytes; ++i) {
          const int a = i >= size_t(bpp) ? row[i - bpp] : 0;
          const int b = prev ? prev[i] : 0;
          const int c = (prev && i >= size_t(bpp)) ? prev[i - bpp] : 0;
          const int p = a + b - c;
          const int pa = std::abs(p - a), pb = std::abs(p - b),
                    pc = std::abs(p - c);
          row[i] += uint8_t((pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c));
        }
        break;
      default:
        return false;  // invalid filter id: let libpng produce the error
    }
  }

  // expand to the pipeline's RGBX layout
  out->w = int(w);
  out->h = int(h);
  out->has_alpha = (color == 4 || color == 6);
  out->data.resize(size_t(w) * h * 4);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * stride + 1;
    uint8_t* dst = out->data.data() + size_t(y) * w * 4;
    switch (color) {
      case 0:
        for (uint32_t x = 0; x < w; ++x) {
          const uint8_t g = src[x];
          dst[4 * x] = g; dst[4 * x + 1] = g; dst[4 * x + 2] = g;
          dst[4 * x + 3] = 0xFF;
        }
        break;
      case 2:
        for (uint32_t x = 0; x < w; ++x) {
          dst[4 * x] = src[3 * x]; dst[4 * x + 1] = src[3 * x + 1];
          dst[4 * x + 2] = src[3 * x + 2]; dst[4 * x + 3] = 0xFF;
        }
        break;
      case 3:
        for (uint32_t x = 0; x < w; ++x) {
          const uint32_t idx = src[x];
          if (idx >= plte_entries) return false;  // libpng decides these
          dst[4 * x] = plte[3 * idx]; dst[4 * x + 1] = plte[3 * idx + 1];
          dst[4 * x + 2] = plte[3 * idx + 2]; dst[4 * x + 3] = 0xFF;
        }
        break;
      case 4:
        for (uint32_t x = 0; x < w; ++x) {
          const uint8_t g = src[2 * x];
          dst[4 * x] = g; dst[4 * x + 1] = g; dst[4 * x + 2] = g;
          dst[4 * x + 3] = src[2 * x + 1];
        }
        break;
      case 6:
        memcpy(dst, src, size_t(w) * 4);
        break;
    }
  }
  return true;
}
#endif  // AIIS_HAVE_LIBDEFLATE

bool decode_file(const char* path, ImageU8* out, int min_dim) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, out, min_dim);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
#ifdef AIIS_HAVE_LIBDEFLATE
    // fast path: slurp + libdeflate inflate + own defilter; byte-identical
    // for the formats it accepts, everything else falls through to libpng.
    // AIIS_NO_FAST_PNG=1 forces the libpng path (A/B + safety hatch).
    static const bool fast_png_disabled = [] {
      const char* v = getenv("AIIS_NO_FAST_PNG");
      return v && v[0] == '1';
    }();
    if (!fast_png_disabled && fseek(f, 0, SEEK_END) == 0) {
      const long fsz = ftell(f);
      if (fsz > 8 && uint64_t(fsz) <= (uint64_t(kMaxPixels) * 8 + (1 << 20))) {
        std::vector<uint8_t> buf(static_cast<size_t>(fsz));
        rewind(f);
        if (fread(buf.data(), 1, buf.size(), f) == buf.size())
          ok = decode_png_fast(buf.data(), buf.size(), out);
      }
      rewind(f);
    }
    if (!ok)
#endif
      ok = decode_png(f, out);  // libpng has no scaled decode
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Flatten alpha onto white (tagging.py:100-113 semantics, bit-exact to PIL's
// Image.paste(img, mask=alpha): Pillow Paste.c fill_mask_L BLEND/MULDIV255)
// ---------------------------------------------------------------------------

inline uint32_t muldiv255(uint32_t a, uint32_t b) {
  uint32_t t = a * b + 128u;
  return (t + (t >> 8)) >> 8;
}

void flatten_onto_white(ImageU8* img) {
  if (!img->has_alpha) return;
  uint8_t* p = img->data.data();
  size_t n = size_t(img->w) * img->h;
  for (size_t i = 0; i < n; ++i, p += 4) {
    uint32_t a = p[3];
    uint32_t bg = muldiv255(255u, 255u - a);  // white background share
    p[0] = uint8_t(bg + muldiv255(p[0], a));
    p[1] = uint8_t(bg + muldiv255(p[1], a));
    p[2] = uint8_t(bg + muldiv255(p[2], a));
  }
  img->has_alpha = false;
}

// ---------------------------------------------------------------------------
// Separable antialiased resize, bit-exact to Pillow's Resample.c 8-bit path:
// identical coefficient windows, int32 fixed-point coefficients
// (PRECISION_BITS), a uint8 intermediate between the passes, and clip8.
// The center pad-to-square is folded in virtually: out-of-content taps read
// the constant 255 instead of a materialized white canvas — integer
// arithmetic distributes, so the result is bit-identical to resizing the
// padded image while skipping the canvas and the pad-row horizontal pass.
// ---------------------------------------------------------------------------

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow Resample.c PRECISION_BITS
constexpr int kHalf = 1 << (kPrecisionBits - 1);

inline uint8_t clip8(int in) {  // Pillow's clip8, including its rounding
  if (in >= (1 << kPrecisionBits << 8)) return 255;
  if (in <= 0) return 0;
  return uint8_t(in >> kPrecisionBits);
}

struct Filter {
  double support;
  double (*fn)(double);
};

double triangle(double x) {  // Pillow bilinear_filter
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double keys_cubic(double x) {  // Pillow bicubic_filter, a = -0.5
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precomputed 1-D resampling plan for one axis (Pillow precompute_coeffs +
// normalize_coeffs_8bpc, including the C-cast truncations).
struct Plan {
  std::vector<int> bounds;    // per out px: start, count
  std::vector<int32_t> k;     // row-major fixed-point weights, padded to ksize
  std::vector<int32_t> ksum;  // per out px: sum of its weights (white taps)
  int ksize;
};

Plan make_plan(int in_size, int out_size, const Filter& filt) {
  Plan plan;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = filt.support * filterscale;
  plan.ksize = int(std::ceil(support)) * 2 + 1;
  plan.bounds.resize(size_t(out_size) * 2);
  std::vector<double> prek(size_t(out_size) * plan.ksize, 0.0);
  double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* kd = prek.data() + size_t(xx) * plan.ksize;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double wv = filt.fn((x + xmin - center + 0.5) * ss);
      kd[x] = wv;
      ww += wv;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) kd[x] /= ww;
    plan.bounds[2 * xx] = xmin;
    plan.bounds[2 * xx + 1] = xmax;
  }
  plan.k.resize(prek.size());
  for (size_t i = 0; i < prek.size(); ++i)
    plan.k[i] = prek[i] < 0 ? int32_t(-0.5 + prek[i] * (1 << kPrecisionBits))
                            : int32_t(0.5 + prek[i] * (1 << kPrecisionBits));
  plan.ksum.resize(out_size);
  for (int xx = 0; xx < out_size; ++xx) {
    int32_t s = 0;
    for (int i = 0; i < plan.bounds[2 * xx + 1]; ++i)
      s += plan.k[size_t(xx) * plan.ksize + i];
    plan.ksum[xx] = s;
  }
  return plan;
}

// Resize a virtual (canvas_w, canvas_h) white canvas holding `img` at offset
// (off_x, off_y) down/up to (size, size) RGB uint8 (3 bytes/px — the X lane
// is dropped on emit). canvas == img for the no-pad path; canvas = max(w,h)
// square for the tagger's pad-to-square path. Both passes run 4 lanes wide
// over the RGBX pixels so -O3 auto-vectorizes them; the vertical pass is a
// row-wide saxpy. The per-channel arithmetic is unchanged from Pillow's, so
// the lane restructuring cannot move a single output bit.
void resize_canvas_rgb(const ImageU8& img, int canvas_w, int canvas_h,
                       int off_x, int off_y, int size, bool bilinear,
                       uint8_t* out) {
  const int w = img.w, h = img.h;
  if (canvas_w == size && canvas_h == size) {
    // identity resize: PIL returns a plain copy of the padded canvas
    std::memset(out, 255, size_t(size) * size * 3);
    for (int y = 0; y < h; ++y) {
      const uint8_t* p = img.data.data() + size_t(y) * w * 4;
      uint8_t* o = out + (size_t(y + off_y) * size + off_x) * 3;
      for (int x = 0; x < w; ++x, p += 4, o += 3) {
        o[0] = p[0];
        o[1] = p[1];
        o[2] = p[2];
      }
    }
    return;
  }
  Filter filt = bilinear ? Filter{1.0, triangle} : Filter{2.0, keys_cubic};
  Plan px = make_plan(canvas_w, size, filt);
  Plan py = make_plan(canvas_h, size, filt);

  // Horizontal pass over content rows only -> uint8 RGBX intermediate.
  std::vector<uint8_t> tmp(size_t(h) * size * 4);
  // What an all-white canvas row resolves to through this pass (used for the
  // virtual pad rows in the vertical pass). All channels equal.
  std::vector<uint8_t> white_row(size);
  if (off_y > 0 || off_y + h < canvas_h)
    for (int xx = 0; xx < size; ++xx)
      white_row[xx] = clip8(kHalf + 255 * px.ksum[xx]);

  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * w * 4;
    uint8_t* trow = tmp.data() + size_t(y) * size * 4;
    for (int xx = 0; xx < size; ++xx) {
      const int32_t* k = px.k.data() + size_t(xx) * px.ksize;
      int xmin = px.bounds[2 * xx], n = px.bounds[2 * xx + 1];
      int ss0 = kHalf, ss1 = kHalf, ss2 = kHalf, ss3 = kHalf;
      if (xmin >= off_x && xmin + n <= off_x + w) {
        // fast path: the whole window lies inside the content
        const uint8_t* p = row + size_t(xmin - off_x) * 4;
#if defined(__AVX2__)
        // two taps per iteration: 8 pixel bytes widen to 8 int32 lanes, the
        // two coefficients broadcast 4x each via one permute. The across-tap
        // reduction gcc picks on its own is strided and slower.
        const __m256i kidx = _mm256_setr_epi32(0, 0, 0, 0, 1, 1, 1, 1);
        __m256i vacc2 = _mm256_setzero_si256();
        int i = 0;
        for (; i + 1 < n; i += 2, p += 8) {
          __m256i pix = _mm256_cvtepu8_epi32(
              _mm_loadl_epi64(reinterpret_cast<const __m128i*>(p)));
          __m256i kk = _mm256_permutevar8x32_epi32(
              _mm256_castsi128_si256(
                  _mm_loadl_epi64(reinterpret_cast<const __m128i*>(k + i))),
              kidx);
          vacc2 = _mm256_add_epi32(vacc2, _mm256_mullo_epi32(pix, kk));
        }
        __m128i vacc = _mm_add_epi32(_mm256_castsi256_si128(vacc2),
                                     _mm256_extracti128_si256(vacc2, 1));
        vacc = _mm_add_epi32(vacc, _mm_set1_epi32(kHalf));
        if (i < n) {  // odd tail tap
          __m128i pix = _mm_cvtepu8_epi32(
              _mm_cvtsi32_si128(*reinterpret_cast<const int*>(p)));
          vacc = _mm_add_epi32(vacc, _mm_mullo_epi32(pix, _mm_set1_epi32(k[i])));
        }
        alignas(16) int32_t lanes[4];
        _mm_store_si128(reinterpret_cast<__m128i*>(lanes), vacc);
        ss0 = lanes[0];
        ss1 = lanes[1];
        ss2 = lanes[2];
        ss3 = lanes[3];
#elif defined(__SSE4_1__)
        // one (load, widen, mul, add) per tap covers all 4 lanes
        __m128i vacc = _mm_set1_epi32(kHalf);
        for (int i = 0; i < n; ++i, p += 4) {
          __m128i pix = _mm_cvtepu8_epi32(
              _mm_cvtsi32_si128(*reinterpret_cast<const int*>(p)));
          vacc = _mm_add_epi32(vacc, _mm_mullo_epi32(pix, _mm_set1_epi32(k[i])));
        }
        alignas(16) int32_t lanes[4];
        _mm_store_si128(reinterpret_cast<__m128i*>(lanes), vacc);
        ss0 = lanes[0];
        ss1 = lanes[1];
        ss2 = lanes[2];
        ss3 = lanes[3];
#else
        for (int i = 0; i < n; ++i, p += 4) {
          int32_t kv = k[i];
          ss0 += p[0] * kv;
          ss1 += p[1] * kv;
          ss2 += p[2] * kv;
          ss3 += p[3] * kv;
        }
#endif
      } else {
        // window crosses the virtual white border
        for (int i = 0; i < n; ++i) {
          int x = xmin + i - off_x;
          int32_t kv = k[i];
          if (x >= 0 && x < w) {
            const uint8_t* p = row + size_t(x) * 4;
            ss0 += p[0] * kv;
            ss1 += p[1] * kv;
            ss2 += p[2] * kv;
          } else {
            int add = 255 * kv;
            ss0 += add;
            ss1 += add;
            ss2 += add;
          }
        }
      }
      trow[4 * xx] = clip8(ss0);
      trow[4 * xx + 1] = clip8(ss1);
      trow[4 * xx + 2] = clip8(ss2);
      trow[4 * xx + 3] = clip8(ss3);  // junk lane, never emitted
    }
  }

  // Vertical pass as a row-wide saxpy over the RGBX intermediate; virtual pad
  // rows contribute white_row[xx] * (their total weight) to the init.
  std::vector<int32_t> acc(size_t(size) * 4);
  for (int yy = 0; yy < size; ++yy) {
    const int32_t* k = py.k.data() + size_t(yy) * py.ksize;
    int ymin = py.bounds[2 * yy], n = py.bounds[2 * yy + 1];
    uint8_t* orow = out + size_t(yy) * size * 3;
    int32_t kwhite = 0;  // total weight of taps outside the content rows
    for (int i = 0; i < n; ++i) {
      int y = ymin + i;
      if (y < off_y || y >= off_y + h) kwhite += k[i];
    }
    if (kwhite) {
      for (int xx = 0; xx < size; ++xx) {
        int32_t base = kHalf + int32_t(white_row[xx]) * kwhite;
        acc[4 * xx] = acc[4 * xx + 1] = acc[4 * xx + 2] = acc[4 * xx + 3] = base;
      }
    } else {
      std::fill(acc.begin(), acc.end(), kHalf);
    }
    int c0 = std::max(ymin, off_y), c1 = std::min(ymin + n, off_y + h);
    for (int y = c0; y < c1; ++y) {
      const uint8_t* trow = tmp.data() + size_t(y - off_y) * size * 4;
      int32_t kv = k[y - ymin];
      for (int j = 0; j < size * 4; ++j) acc[j] += trow[j] * kv;
    }
    for (int xx = 0; xx < size; ++xx) {
      orow[3 * xx] = clip8(acc[4 * xx]);
      orow[3 * xx + 1] = clip8(acc[4 * xx + 1]);
      orow[3 * xx + 2] = clip8(acc[4 * xx + 2]);
    }
  }
}

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int workers) : stop_(false) {
    for (int i = 0; i < workers; ++i)
      threads_.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void submit(std::function<void()> task) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> threads_;
  bool stop_;
};

int decode_one(const char* path, int size, int pad_to_square, int bilinear,
               int scaled_decode, uint8_t* out) {
  // noexcept to the caller: an exception escaping a pool worker (or the C
  // ABI into ctypes) would std::terminate the whole Python process; the
  // pipeline's contract is per-image skip-and-continue.
  try {
    ImageU8 raw;
    if (!decode_file(path, &raw, scaled_decode ? size : 0) || raw.w <= 0 || raw.h <= 0)
      return 0;
    flatten_onto_white(&raw);
    if (pad_to_square) {
      int dim = std::max(raw.w, raw.h);
      resize_canvas_rgb(raw, dim, dim, (dim - raw.w) / 2, (dim - raw.h) / 2,
                        size, bilinear != 0, out);
    } else {
      resize_canvas_rgb(raw, raw.w, raw.h, 0, 0, size, bilinear != 0, out);
    }
    return 1;
  } catch (...) {
    return 0;
  }
}

}  // namespace

extern "C" {

// Bumped on every C-ABI change; the Python binding refuses (and rebuilds) a
// .so whose version doesn't match, so a stale build can never be called with
// a mismatched signature.
int aiis_abi_version() { return 2; }

// Decode one image into out[size*size*3]. Returns 1 on success.
// scaled_decode != 0 enables libjpeg DCT-domain scaling toward `size`.
int aiis_decode_resize(const char* path, int size, int pad_to_square, int bilinear,
                       int scaled_decode, uint8_t* out) {
  return decode_one(path, size, pad_to_square, bilinear, scaled_decode, out);
}

void* aiis_pool_create(int workers) {
  // a zero-thread pool would hang decode_batch forever on its completion wait
  return new Pool(std::max(1, workers));
}

void aiis_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Decode n images in parallel into out[n*size*size*3]; ok_flags[i] set to 1/0.
void aiis_pool_decode_batch(void* pool_ptr, const char** paths, int n, int size,
                            int pad_to_square, int bilinear, int scaled_decode,
                            uint8_t* out, int* ok_flags) {
  if (n <= 0) return;
  Pool* pool = static_cast<Pool*>(pool_ptr);
  // done/mu/cv protocol: `done` is only set and notified while holding `mu`, so the
  // waiter cannot observe done==true (and destroy these stack locals) until the last
  // worker has finished touching them — a bare counter + notify would race with a
  // spurious wakeup destroying the condvar under the worker.
  std::mutex mu;
  std::condition_variable cv;
  bool done = false;
  std::atomic<int> remaining(n);
  size_t stride = size_t(size) * size * 3;
  for (int i = 0; i < n; ++i) {
    pool->submit([&, i] {
      ok_flags[i] = decode_one(paths[i], size, pad_to_square, bilinear,
                               scaled_decode, out + stride * i);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        done = true;
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done; });
}

}  // extern "C"
