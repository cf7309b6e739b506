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
// Resampling follows the same structure as PIL's convolution resampling (separable
// kernel, support scaled by the downscale ratio for antialiasing): bilinear =
// triangle filter, bicubic = Keys cubic a=-0.5. Outputs match PIL within rounding on
// natural images; the Python loader stays the default for bit-parity runs (QUIRKS.md).

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

namespace {

struct ImageU8 {
  int w = 0, h = 0, channels = 0;  // channels: 3 (RGB) or 4 (RGBA)
  std::vector<uint8_t> data;       // row-major, interleaved
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
  cinfo.out_color_space = JCS_RGB;
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
  out->channels = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
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
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (uint64_t(w) * h > kMaxPixels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->w = int(w);
  out->h = int(h);
  out->channels = channels;
  out->data.resize(size_t(w) * h * channels);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

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
    ok = decode_png(f, out);  // libpng has no scaled decode
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Flatten alpha onto white + center pad-to-square with white
// (tagging.py:100-120 semantics)
// ---------------------------------------------------------------------------

ImageU8 flatten_and_pad(ImageU8&& img, bool pad_to_square) {
  ImageU8 rgb;
  rgb.channels = 3;
  rgb.w = img.w;
  rgb.h = img.h;
  if (img.channels == 3) {
    // already RGB: steal the buffer — a resize + copy here cost two extra
    // full-frame passes per image on the hot path
    rgb.data = std::move(img.data);
  } else {
    rgb.data.resize(size_t(img.w) * img.h * 3);
    const uint8_t* src = img.data.data();
    uint8_t* dst = rgb.data.data();
    size_t n = size_t(img.w) * img.h;
    for (size_t i = 0; i < n; ++i) {
      uint32_t a = src[4 * i + 3];
      // composite over white: c*a + 255*(1-a), in 0..255 fixed point
      for (int c = 0; c < 3; ++c) {
        uint32_t v = src[4 * i + c] * a + 255u * (255u - a);
        dst[3 * i + c] = uint8_t((v + 127) / 255);
      }
    }
  }
  if (!pad_to_square || img.w == img.h) return rgb;

  int dim = std::max(img.w, img.h);
  ImageU8 padded;
  padded.channels = 3;
  padded.w = dim;
  padded.h = dim;
  padded.data.assign(size_t(dim) * dim * 3, 255);  // white canvas
  int pad_left = (dim - img.w) / 2;
  int pad_top = (dim - img.h) / 2;
  for (int y = 0; y < img.h; ++y) {
    std::memcpy(
        padded.data.data() + (size_t(y + pad_top) * dim + pad_left) * 3,
        rgb.data.data() + size_t(y) * img.w * 3, size_t(img.w) * 3);
  }
  return padded;
}

// ---------------------------------------------------------------------------
// Separable antialiased resize (PIL-style convolution resampling)
// ---------------------------------------------------------------------------

struct Filter {
  double support;
  double (*fn)(double);
};

double triangle(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double keys_cubic(double x) {  // a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precomputed 1-D resampling plan for one axis.
struct Plan {
  std::vector<int> starts;
  std::vector<int> sizes;
  std::vector<double> weights;  // row-major, padded to ksize
  int ksize;
};

Plan make_plan(int in_size, int out_size, const Filter& filt) {
  Plan plan;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = filt.support * filterscale;
  plan.ksize = int(std::ceil(support)) * 2 + 1;
  plan.starts.resize(out_size);
  plan.sizes.resize(out_size);
  plan.weights.assign(size_t(out_size) * plan.ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double wsum = 0.0;
    double* w = plan.weights.data() + size_t(xx) * plan.ksize;
    for (int x = xmin; x < xmax; ++x) {
      w[x - xmin] = filt.fn((x - center + 0.5) / filterscale);
      wsum += w[x - xmin];
    }
    if (wsum != 0.0)
      for (int i = 0; i < xmax - xmin; ++i) w[i] /= wsum;
    plan.starts[xx] = xmin;
    plan.sizes[xx] = xmax - xmin;
  }
  return plan;
}

uint8_t clip8(double v) {
  return uint8_t(std::min(255.0, std::max(0.0, v + 0.5)));
}

// Resize RGB uint8 (h_in, w_in) -> (size, size).
void resize_rgb(const ImageU8& img, int size, bool bilinear, uint8_t* out) {
  Filter filt = bilinear ? Filter{1.0, triangle} : Filter{2.0, keys_cubic};
  Plan px = make_plan(img.w, size, filt);
  Plan py = make_plan(img.h, size, filt);

  // horizontal pass into double buffer (h_in, size, 3)
  std::vector<double> tmp(size_t(img.h) * size * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
    double* trow = tmp.data() + size_t(y) * size * 3;
    for (int xx = 0; xx < size; ++xx) {
      const double* w = px.weights.data() + size_t(xx) * px.ksize;
      int start = px.starts[xx], n = px.sizes[xx];
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = row + size_t(start + i) * 3;
        acc[0] += w[i] * p[0];
        acc[1] += w[i] * p[1];
        acc[2] += w[i] * p[2];
      }
      trow[3 * xx] = acc[0];
      trow[3 * xx + 1] = acc[1];
      trow[3 * xx + 2] = acc[2];
    }
  }
  // vertical pass
  for (int yy = 0; yy < size; ++yy) {
    const double* w = py.weights.data() + size_t(yy) * py.ksize;
    int start = py.starts[yy], n = py.sizes[yy];
    uint8_t* orow = out + size_t(yy) * size * 3;
    for (int xx = 0; xx < size; ++xx) {
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const double* p = tmp.data() + (size_t(start + i) * size + xx) * 3;
        acc[0] += w[i] * p[0];
        acc[1] += w[i] * p[1];
        acc[2] += w[i] * p[2];
      }
      orow[3 * xx] = clip8(acc[0]);
      orow[3 * xx + 1] = clip8(acc[1]);
      orow[3 * xx + 2] = clip8(acc[2]);
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
    ImageU8 prepared = flatten_and_pad(std::move(raw), pad_to_square != 0);
    resize_rgb(prepared, size, bilinear != 0, out);
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
