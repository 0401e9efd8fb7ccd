// Separable bilinear lip-crop sampler — host twin of the TPU kernel
// avsl_tpu/kernels/warp.py:sample_separable.
//
// Role: the minimal-bytes production pipeline runs face/mouth detection and
// the similarity warp ON THE HOST next to the media decoder and uploads only
// the 96x96 (or 88x88) mouth crops to the TPU — ~2 MB/segment instead of
// ~25 MB of full frames — so ingest throughput survives a throttled
// host<->device link. This is the reference's division of labor too (dlib +
// skimage warp on the CPU feeding the GPU, reference
// preprocess/video_process.py:305-490), rebuilt as a threaded C++ kernel
// instead of per-frame Python.
//
// Semantics match the device kernel exactly: per-tap masking (a bilinear tap
// contributes iff its integer index lies in [0, n); coordinates in (-1, 0)
// and (n-1, n) keep their single in-bounds partial contribution), float32
// accumulation, output = wy0*wx0*f[y0,x0] + wy0*wx1*f[y0,x1] +
// wy1*wx0*f[y1,x0] + wy1*wx1*f[y1,x1] — the 2x2-tap specialization of the
// banded-matmul form Wy @ F @ Wx^T.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline void sample_frame_f32(const uint8_t* frame, int h, int w,
                             const float* ys, const float* xs, int c,
                             float* out) {
  // Precompute per-axis taps once per frame (ys/xs are per-frame rows).
  std::vector<int> yi0(c), yi1(c), xi0(c), xi1(c);
  std::vector<float> wy0(c), wy1(c), wx0(c), wx1(c);
  for (int i = 0; i < c; ++i) {
    const float y = ys[i];
    const float fy = std::floor(y);
    const int y0 = static_cast<int>(fy);
    const float t = y - fy;
    const bool v0 = y0 >= 0 && y0 < h;
    const bool v1 = y0 + 1 >= 0 && y0 + 1 < h;
    yi0[i] = v0 ? y0 : 0;
    yi1[i] = v1 ? y0 + 1 : 0;
    wy0[i] = v0 ? 1.0f - t : 0.0f;
    wy1[i] = v1 ? t : 0.0f;
  }
  for (int j = 0; j < c; ++j) {
    const float x = xs[j];
    const float fx = std::floor(x);
    const int x0 = static_cast<int>(fx);
    const float t = x - fx;
    const bool v0 = x0 >= 0 && x0 < w;
    const bool v1 = x0 + 1 >= 0 && x0 + 1 < w;
    xi0[j] = v0 ? x0 : 0;
    xi1[j] = v1 ? x0 + 1 : 0;
    wx0[j] = v0 ? 1.0f - t : 0.0f;
    wx1[j] = v1 ? t : 0.0f;
  }
  // Row-interpolate the two needed source rows into a c-wide buffer, then
  // column-interpolate — the separable order keeps the inner loop over the
  // source row contiguous in memory.
  std::vector<float> rowbuf(c);
  for (int i = 0; i < c; ++i) {
    const uint8_t* r0 = frame + static_cast<size_t>(yi0[i]) * w;
    const uint8_t* r1 = frame + static_cast<size_t>(yi1[i]) * w;
    const float a = wy0[i], b = wy1[i];
    for (int j = 0; j < c; ++j) {
      const float top = a * (wx0[j] * r0[xi0[j]] + wx1[j] * r0[xi1[j]]);
      const float bot = b * (wx0[j] * r1[xi0[j]] + wx1[j] * r1[xi1[j]]);
      rowbuf[j] = top + bot;
    }
    std::memcpy(out + static_cast<size_t>(i) * c, rowbuf.data(),
                sizeof(float) * c);
  }
}

template <typename OutT, typename Convert>
void run_batch(const uint8_t* frames, int64_t n, int h, int w,
               const float* ys, const float* xs, int c, OutT* out,
               int n_threads, Convert convert) {
  n_threads = std::max(1, n_threads);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<float> buf(static_cast<size_t>(c) * c);
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      sample_frame_f32(frames + i * static_cast<int64_t>(h) * w, h, w,
                       ys + i * c, xs + i * c, c, buf.data());
      OutT* dst = out + i * static_cast<int64_t>(c) * c;
      for (size_t k = 0; k < buf.size(); ++k) dst[k] = convert(buf[k]);
    }
  };
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// frames [n, h, w] uint8, ys/xs [n, c] float32 -> out [n, c, c] float32.
// Bit-matches kernels/warp.sample_separable (per-tap masking, f32 math).
void avsl_sample_separable_f32(const uint8_t* frames, int64_t n, int h,
                               int w, const float* ys, const float* xs,
                               int c, float* out, int n_threads) {
  run_batch(frames, n, h, w, ys, xs, c, out, n_threads,
            [](float v) { return v; });
}

// uint8 output: clip to [0, 255] then truncate — the exact conversion the
// dataset writer applies (data/lip_roi.extract_lip_clip: np.clip(...)
// .astype(np.uint8)), so host-produced crops match stored-dataset crops.
void avsl_sample_separable_u8(const uint8_t* frames, int64_t n, int h,
                              int w, const float* ys, const float* xs,
                              int c, uint8_t* out, int n_threads) {
  run_batch(frames, n, h, w, ys, xs, c, out, n_threads, [](float v) {
    return static_cast<uint8_t>(std::min(std::max(v, 0.0f), 255.0f));
  });
}

}  // extern "C"
