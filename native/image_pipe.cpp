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
//   hdt_version
//
// Build: make -C native   (g++ -O3 -shared -fPIC, std::thread only).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

int hdt_version() { return 10; }

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

}  // extern "C"
