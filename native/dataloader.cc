// Native batch-assembly stage of the input pipeline.
//
// The host-side inner loop of DataPipeline — gathering sampled images from the
// dataset array, applying horizontal-flip augmentation, and assembling a
// contiguous batch buffer — is pure memory movement that Python/numpy executes
// through several temporaries. This library does it in one multithreaded pass
// (the device then handles resize/normalize, where that work belongs).
//
// Built by native/Makefile into libssp_dataloader.so; bound via ctypes
// (ssp_x_vit_tpu/data/native_loader.py). No Python.h dependency.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// data:    [num_images, h, w, c] uint8 dataset array
// indices: [n] int64 sample indices into data
// flips:   [n] uint8 (1 = horizontal flip) or nullptr
// out:     [n, h, w, c] uint8 batch buffer
void gather_batch_u8(const uint8_t* data, const int64_t* indices,
                     const uint8_t* flips, int64_t n, int64_t h, int64_t w,
                     int64_t c, uint8_t* out, int num_threads) {
  const int64_t img = h * w * c;
  const int64_t row = w * c;

  auto work = [&](int64_t start, int64_t end) {
    for (int64_t i = start; i < end; ++i) {
      const uint8_t* src = data + indices[i] * img;
      uint8_t* dst = out + i * img;
      if (flips != nullptr && flips[i]) {
        // reverse the w axis, keeping channels contiguous
        for (int64_t y = 0; y < h; ++y) {
          const uint8_t* srow = src + y * row;
          uint8_t* drow = dst + y * row;
          for (int64_t x = 0; x < w; ++x) {
            std::memcpy(drow + x * c, srow + (w - 1 - x) * c, c);
          }
        }
      } else {
        std::memcpy(dst, src, img);
      }
    }
  };

  if (num_threads <= 1 || n < 2) {
    work(0, n);
    return;
  }
  int nt = num_threads < n ? num_threads : static_cast<int>(n);
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t s = t * chunk;
    int64_t e = s + chunk < n ? s + chunk : n;
    if (s >= e) break;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

// uint8 [n,h,w,c] -> float32 normalized (x/255 - mean)/std, multithreaded.
// Used when the host must feed normalized floats directly (CPU-only runs).
void normalize_batch_f32(const uint8_t* in, int64_t count, const float* mean,
                         const float* std_, int64_t c, float* out,
                         int num_threads) {
  std::vector<float> scale(c), shift(c);
  for (int64_t k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * std_[k]);
    shift[k] = -mean[k] / std_[k];
  }
  auto work = [&](int64_t start, int64_t end) {
    for (int64_t i = start; i < end; ++i) {
      int64_t k = i % c;
      out[i] = static_cast<float>(in[i]) * scale[k] + shift[k];
    }
  };
  if (num_threads <= 1) {
    work(0, count);
    return;
  }
  int nt = num_threads;
  std::vector<std::thread> threads;
  int64_t chunk = (count + nt - 1) / nt;
  chunk -= chunk % c;  // keep channel phase aligned per chunk
  if (chunk <= 0) chunk = count;
  for (int t = 0; t < nt; ++t) {
    int64_t s = t * chunk;
    if (s >= count) break;
    int64_t e = s + chunk < count ? s + chunk : count;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
