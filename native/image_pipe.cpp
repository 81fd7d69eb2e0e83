// hybrid_diffusion_tpu native data-path core.
//
// The reference's input pipeline is albumentations Resize(256,256) +
// ToTensorV2 inside torch DataLoader worker processes (utils/utils.py:
// 317-325, rotinas.py:593-605). Python-process workers are the wrong
// model for a TPU host: the hot loop here is a C++ thread pool that
// resizes a whole batch of decoded frames into one contiguous uint8
// NHWC buffer in a single call — no per-image Python dispatch, no numpy
// temporaries, no GIL between images.
//
// Exposed C ABI (consumed via ctypes from
// hybrid_diffusion_tpu/data/native.py):
//   hdt_resize_u8        one image, bilinear (half-pixel centers,
//                        cv2 INTER_LINEAR convention) or nearest
//   hdt_batch_resize_u8  N images -> contiguous (N,S,S,C) batch, threaded
//   hdt_bgr_to_rgb_u8    channel swap in place
//   hdt_decode_info      JPEG/PNG header probe -> (h, w)
//   hdt_decode_u8        JPEG/PNG bytes -> RGB8 buffer (libjpeg/libpng)
//   hdt_batch_decode_resize_u8  N encoded blobs -> one (N,S,S,3) batch,
//                        decode+resize fused per worker thread
//   hdt_version
//
// Build: make -C native   (g++ -O3 -shared -fPIC, std::thread; links
// -ljpeg -lpng when the dev headers are present).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__has_include)
#if __has_include(<jpeglib.h>)
#define HDT_HAS_JPEG 1
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#endif
#if __has_include(<png.h>)
#define HDT_HAS_PNG 1
#include <png.h>
#endif
#endif

extern "C" {

int hdt_version() { return 11; }

// Bilinear resize, uint8, C channels, half-pixel-center source mapping.
static void resize_bilinear_one(const uint8_t* src, int h, int w, int c,
                                uint8_t* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = std::min(std::max(y0, 0), h - 1);
    y1 = std::min(std::max(y1, 0), h - 1);
    const uint8_t* row0 = src + static_cast<size_t>(y0) * w * c;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * w * c;
    uint8_t* out = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = std::min(std::max(x0, 0), w - 1);
      x1 = std::min(std::max(x1, 0), w - 1);
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int ch = 0; ch < c; ++ch) {
        float v = w00 * row0[x0 * c + ch] + w01 * row0[x1 * c + ch] +
                  w10 * row1[x0 * c + ch] + w11 * row1[x1 * c + ch];
        out[x * c + ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

static void resize_nearest_one(const uint8_t* src, int h, int w, int c,
                               uint8_t* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    int yy = std::min(static_cast<int>(y * sy), h - 1);
    const uint8_t* row = src + static_cast<size_t>(yy) * w * c;
    uint8_t* out = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      int xx = std::min(static_cast<int>(x * sx), w - 1);
      std::memcpy(out + static_cast<size_t>(x) * c,
                  row + static_cast<size_t>(xx) * c, c);
    }
  }
}

// mode: 0 = bilinear, 1 = nearest.
void hdt_resize_u8(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                   int oh, int ow, int mode) {
  if (h == oh && w == ow) {
    std::memcpy(dst, src, static_cast<size_t>(h) * w * c);
    return;
  }
  if (mode == 1)
    resize_nearest_one(src, h, w, c, dst, oh, ow);
  else
    resize_bilinear_one(src, h, w, c, dst, oh, ow);
}

// Resize n images (srcs[i] is (hs[i], ws[i], c)) into one contiguous
// (n, oh, ow, c) buffer using `threads` std::threads over an atomic
// work queue. threads <= 0 → hardware_concurrency.
void hdt_batch_resize_u8(const uint8_t* const* srcs, const int* hs,
                         const int* ws, int n, int c, uint8_t* dst,
                         int oh, int ow, int mode, int threads) {
  if (threads <= 0)
    threads = static_cast<int>(std::thread::hardware_concurrency());
  threads = std::max(1, std::min(threads, n));
  const size_t stride = static_cast<size_t>(oh) * ow * c;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
      hdt_resize_u8(srcs[i], hs[i], ws[i], c, dst + stride * i, oh, ow, mode);
  };
  if (threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

void hdt_bgr_to_rgb_u8(uint8_t* data, int64_t pixels) {
  for (int64_t i = 0; i < pixels; ++i) std::swap(data[i * 3], data[i * 3 + 2]);
}

// ---------------------------------------------------------------- decode

#ifdef HDT_HAS_JPEG
namespace {
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};
void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}
}  // namespace

// Decode JPEG bytes to RGB8. dst may be null (probe mode). Returns 0 on
// success and fills *h, *w; -1 on decode error.
static int decode_jpeg(const uint8_t* bytes, int64_t len, uint8_t* dst,
                       int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(bytes),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  if (!dst) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = dst + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}
#endif

#ifdef HDT_HAS_PNG
// Decode PNG bytes to RGB8 via the libpng simplified API.
static int decode_png(const uint8_t* bytes, int64_t len, uint8_t* dst,
                      int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, bytes,
                                        static_cast<size_t>(len)))
    return -1;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  if (!dst) {
    png_image_free(&image);
    return 0;
  }
  image.format = PNG_FORMAT_RGB;
  if (!png_image_finish_read(&image, nullptr, dst, 0, nullptr)) {
    png_image_free(&image);
    return -1;
  }
  return 0;
}
#endif

static int is_png(const uint8_t* b, int64_t len) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
  return len >= 8 && std::memcmp(b, sig, 8) == 0;
}
static int is_jpeg(const uint8_t* b, int64_t len) {
  return len >= 2 && b[0] == 0xff && b[1] == 0xd8;
}

// Probe encoded bytes: fills (h, w); returns 0 ok, -1 unsupported/corrupt.
int hdt_decode_info(const uint8_t* bytes, int64_t len, int* h, int* w) {
#ifdef HDT_HAS_PNG
  if (is_png(bytes, len)) return decode_png(bytes, len, nullptr, h, w);
#endif
#ifdef HDT_HAS_JPEG
  if (is_jpeg(bytes, len)) return decode_jpeg(bytes, len, nullptr, h, w);
#endif
  (void)bytes; (void)len; (void)h; (void)w;
  return -1;
}

// Decode into caller-allocated (h, w, 3) RGB8 buffer (sized via
// hdt_decode_info). Returns 0 ok, -1 error.
int hdt_decode_u8(const uint8_t* bytes, int64_t len, uint8_t* dst, int h,
                  int w) {
  int dh = 0, dw = 0;
#ifdef HDT_HAS_PNG
  if (is_png(bytes, len)) {
    int rc = decode_png(bytes, len, dst, &dh, &dw);
    return (rc == 0 && dh == h && dw == w) ? 0 : -1;
  }
#endif
#ifdef HDT_HAS_JPEG
  if (is_jpeg(bytes, len)) {
    int rc = decode_jpeg(bytes, len, dst, &dh, &dw);
    return (rc == 0 && dh == h && dw == w) ? 0 : -1;
  }
#endif
  (void)dst; (void)h; (void)w; (void)dh; (void)dw;
  return -1;
}

// Decode n encoded blobs and resize each into one contiguous
// (n, oh, ow, 3) RGB8 batch — the whole file→tensor hot path in one call,
// fused per worker thread (scratch decode buffer reused across a worker's
// images). rcs[i] = 0 ok, -1 decode failure (slot left zeroed).
void hdt_batch_decode_resize_u8(const uint8_t* const* blobs,
                                const int64_t* lens, int n, uint8_t* dst,
                                int oh, int ow, int mode, int threads,
                                int* rcs) {
  if (threads <= 0)
    threads = static_cast<int>(std::thread::hardware_concurrency());
  threads = std::max(1, std::min(threads, n));
  const size_t stride = static_cast<size_t>(oh) * ow * 3;
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* out = dst + stride * i;
      int h = 0, w = 0;
      if (hdt_decode_info(blobs[i], lens[i], &h, &w) != 0) {
        std::memset(out, 0, stride);
        rcs[i] = -1;
        continue;
      }
      if (h == oh && w == ow) {  // decode straight into the output slot
        rcs[i] = hdt_decode_u8(blobs[i], lens[i], out, h, w);
        if (rcs[i] != 0) std::memset(out, 0, stride);
        continue;
      }
      scratch.resize(static_cast<size_t>(h) * w * 3);
      if (hdt_decode_u8(blobs[i], lens[i], scratch.data(), h, w) != 0) {
        std::memset(out, 0, stride);
        rcs[i] = -1;
        continue;
      }
      hdt_resize_u8(scratch.data(), h, w, 3, out, oh, ow, mode);
      rcs[i] = 0;
    }
  };
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// 1 if compiled with JPEG/PNG decode support.
int hdt_decode_supported() {
#if defined(HDT_HAS_JPEG) || defined(HDT_HAS_PNG)
  return 1;
#else
  return 0;
#endif
}

}  // extern "C"
