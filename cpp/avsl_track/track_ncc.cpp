// Anchored parallel NCC mouth tracker — native host twin of
// avsl_tpu/data/track_host.py:ncc_track_clip_parallel_np (itself the host
// twin of the device kernel kernels/track.py:ncc_track_clip_parallel).
//
// Role: the minimal-bytes ingest pipeline tracks the mouth ON THE HOST next
// to the media decoder and uploads only warped 96x96/88x88 crops (the
// reference's CPU dlib division of labor, reference
// preprocess/video_process.py:305-490 + utils/lips_cropping.py:35-39,
// rebuilt as batched C++ instead of per-frame Python). One call covers the
// whole batch with the GIL released: spatial ::ds downsample, per-frame
// zero-mean NCC score maps (cv::matchTemplate TM_CCOEFF_NORMED — the exact
// statistic the numpy/cv2 twin uses, so trajectories agree to the argmax
// tie), square-NMS top-k peaks, temporally-coherent Viterbi peak selection,
// and linear interpolation of strided frames back to the full clip.
//
// Every numeric choice mirrors track_host.py line by line (template/window
// origin clamping, first-occurrence argmax/argmin tie-breaks, the 1e6
// Viterbi big-cost, score values read from the UNSUPPRESSED map) so the
// parity tests can pin native == numpy exactly.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

namespace {

// clips[b, t, ::ds, ::ds][y0:y0+n, x0:x0+n] -> float32 [n, n] (region given
// in DOWNSAMPLED coordinates; point sampling == numpy ::ds slicing).
void slice_ds_f32(const uint8_t* frame, int W, int ds, int y0, int x0,
                  int ny, int nx, float* out) {
  for (int r = 0; r < ny; ++r) {
    const uint8_t* src = frame + static_cast<size_t>((y0 + r) * ds) * W;
    float* dst = out + static_cast<size_t>(r) * nx;
    for (int c = 0; c < nx; ++c) dst[c] = src[(x0 + c) * ds];
  }
}

// Top-k local maxima with square non-max suppression of side 2*suppress+1.
// Mirrors track_host._topk_peaks: first-occurrence argmax, values read from
// the original (unsuppressed) map, missing peaks repeat the best one.
// rc is an interleaved [k, 2] (row, col) block.
void topk_peaks(const float* score, int hh, int ww, int k, int suppress,
                int64_t* rc, float* vals) {
  std::vector<float> s(score, score + static_cast<size_t>(hh) * ww);
  const float ninf = -std::numeric_limits<float>::infinity();
  for (int i = 0; i < k; ++i) {
    int best = 0;
    float bv = s[0];
    for (int j = 1; j < hh * ww; ++j)
      if (s[j] > bv) { bv = s[j]; best = j; }
    const int r = best / ww, c = best % ww;
    if (i > 0 && !std::isfinite(s[best])) {
      for (int j = i; j < k; ++j) {
        rc[j * 2] = rc[0]; rc[j * 2 + 1] = rc[1]; vals[j] = vals[0];
      }
      return;
    }
    rc[i * 2] = r; rc[i * 2 + 1] = c;
    vals[i] = score[static_cast<size_t>(r) * ww + c];
    const int r0 = std::max(0, r - suppress), r1 = std::min(hh, r + suppress + 1);
    const int c0 = std::max(0, c - suppress), c1 = std::min(ww, c + suppress + 1);
    for (int rr = r0; rr < r1; ++rr)
      for (int cc = c0; cc < c1; ++cc) s[static_cast<size_t>(rr) * ww + cc] = ninf;
  }
}

// Temporally-coherent peak selection; port of track_host._viterbi_peaks.
// peaks [T, K, 2] (row, col), vals [T, K] -> choice [T].
void viterbi_peaks(const int64_t* peaks, const float* vals, int t_len, int k,
                   int anchor_i, float motion_lambda, int stride,
                   int64_t* choice) {
  // Arithmetic mirrors the numpy twin's dtype flow exactly: cost is stored
  // float32, but each transition total is computed in float64 (numpy
  // upcasts float32 cost + float64 distance), so near-tie argmins agree.
  const double lam = static_cast<double>(motion_lambda) / std::max(stride, 1);
  const float big = 1e6f;
  std::vector<float> cost(static_cast<size_t>(t_len) * k, 0.0f);
  std::vector<int64_t> back(static_cast<size_t>(t_len) * k, 0);
  for (int j = 0; j < k; ++j)
    cost[static_cast<size_t>(anchor_i) * k + j] =
        j == 0 ? -vals[static_cast<size_t>(anchor_i) * k] : big;

  auto sweep = [&](int from, int to, int step) {
    int p = anchor_i;
    for (int t = from; t != to; t += step) {
      const int64_t* pt = peaks + static_cast<size_t>(t) * k * 2;
      const int64_t* pp = peaks + static_cast<size_t>(p) * k * 2;
      for (int a = 0; a < k; ++a) {
        int64_t bi = 0;
        double bc = std::numeric_limits<double>::infinity();
        for (int b = 0; b < k; ++b) {
          const double dr = static_cast<double>(pt[a * 2] - pp[b * 2]);
          const double dc = static_cast<double>(pt[a * 2 + 1] - pp[b * 2 + 1]);
          const double tot =
              static_cast<double>(cost[static_cast<size_t>(p) * k + b]) +
              lam * std::sqrt(dr * dr + dc * dc);
          if (tot < bc) { bc = tot; bi = b; }
        }
        back[static_cast<size_t>(t) * k + a] = bi;
        cost[static_cast<size_t>(t) * k + a] = static_cast<float>(
            bc - vals[static_cast<size_t>(t) * k + a]);
      }
      p = t;
    }
  };
  sweep(anchor_i + 1, t_len, 1);
  sweep(anchor_i - 1, -1, -1);

  std::fill(choice, choice + t_len, 0);
  auto argmin_row = [&](int t) {
    int64_t bi = 0;
    float bc = cost[static_cast<size_t>(t) * k];
    for (int j = 1; j < k; ++j)
      if (cost[static_cast<size_t>(t) * k + j] < bc) {
        bc = cost[static_cast<size_t>(t) * k + j];
        bi = j;
      }
    return bi;
  };
  if (anchor_i + 1 < t_len) {
    choice[t_len - 1] = argmin_row(t_len - 1);
    for (int t = t_len - 2; t > anchor_i; --t)
      choice[t] = back[static_cast<size_t>(t + 1) * k + choice[t + 1]];
  }
  if (anchor_i > 0) {
    choice[0] = argmin_row(0);
    for (int t = 1; t < anchor_i; ++t)
      choice[t] = back[static_cast<size_t>(t - 1) * k + choice[t - 1]];
  }
}

// One clip: full tracking pipeline at downsampled scale. Returns 0 on
// success, nonzero when the geometry leaves no valid search window (the
// Python twin would raise; callers fall back per clip).
int track_one_clip(const uint8_t* clip, int T, int H, int W, int ds,
                   float anchor_x, float anchor_y, int anchor,
                   int template_size, int search, int stride, int top_k,
                   float motion_lambda, float* out /* [T, 2] (x, y) */) {
  const int h = (H + ds - 1) / ds, w = (W + ds - 1) / ds;
  const int ts = template_size;
  const int half = ts / 2;
  search = std::min(search, (std::min(h, w) - ts - 2) / 2);
  if (search < 1 || ts < 2 || h < ts || w < ts) return 1;

  const float px =
      std::min(std::max(anchor_x, static_cast<float>(half)),
               static_cast<float>(w - half - 1));
  const float py =
      std::min(std::max(anchor_y, static_cast<float>(half)),
               static_cast<float>(h - half - 1));
  const int x0 = static_cast<int>(px - half);
  const int y0 = static_cast<int>(py - half);

  const size_t frame_sz = static_cast<size_t>(H) * W;
  std::vector<float> tmpl(static_cast<size_t>(ts) * ts);
  slice_ds_f32(clip + static_cast<size_t>(anchor) * frame_sz, W, ds, y0, x0,
               ts, ts, tmpl.data());

  const int win = ts + 2 * search;
  const int wx = std::min(std::max(static_cast<int>(px - half - search), 0),
                          w - win);
  const int wy = std::min(std::max(static_cast<int>(py - half - search), 0),
                          h - win);

  std::vector<int> idxs;
  for (int t = 0; t < T; t += std::max(stride, 1)) idxs.push_back(t);
  if (idxs.back() != T - 1) idxs.push_back(T - 1);
  const int nt = static_cast<int>(idxs.size());
  int anchor_i = 0;
  for (int i = 1; i < nt; ++i)
    if (std::abs(idxs[i] - anchor) < std::abs(idxs[anchor_i] - anchor))
      anchor_i = i;

  const int s = win - ts + 1;
  const cv::Mat tmpl_m(ts, ts, CV_32F, tmpl.data());
  std::vector<float> winbuf(static_cast<size_t>(win) * win);
  std::vector<int64_t> peaks(static_cast<size_t>(nt) * top_k * 2);
  std::vector<float> vals(static_cast<size_t>(nt) * top_k);
  cv::Mat score;
  for (int i = 0; i < nt; ++i) {
    slice_ds_f32(clip + static_cast<size_t>(idxs[i]) * frame_sz, W, ds, wy,
                 wx, win, win, winbuf.data());
    const cv::Mat win_m(win, win, CV_32F, winbuf.data());
    cv::matchTemplate(win_m, tmpl_m, score, cv::TM_CCOEFF_NORMED);
    if (top_k <= 1) {
      const float* sc = score.ptr<float>();
      int best = 0;
      float bv = sc[0];
      for (int j = 1; j < s * s; ++j)
        if (sc[j] > bv) { bv = sc[j]; best = j; }
      peaks[static_cast<size_t>(i) * 2] = best / s;
      peaks[static_cast<size_t>(i) * 2 + 1] = best % s;
    } else {
      topk_peaks(score.ptr<float>(), s, s, top_k, half,
                 peaks.data() + static_cast<size_t>(i) * top_k * 2,
                 vals.data() + static_cast<size_t>(i) * top_k);
    }
  }

  std::vector<float> pos(static_cast<size_t>(nt) * 2);  // (x, y)
  if (top_k <= 1) {
    for (int i = 0; i < nt; ++i) {
      pos[static_cast<size_t>(i) * 2] =
          static_cast<float>(wx + half + peaks[static_cast<size_t>(i) * 2 + 1]);
      pos[static_cast<size_t>(i) * 2 + 1] =
          static_cast<float>(wy + half + peaks[static_cast<size_t>(i) * 2]);
    }
  } else {
    std::vector<int64_t> choice(nt);
    viterbi_peaks(peaks.data(), vals.data(), nt, top_k, anchor_i,
                  motion_lambda, stride, choice.data());
    for (int i = 0; i < nt; ++i) {
      const int64_t* pk =
          peaks.data() + (static_cast<size_t>(i) * top_k + choice[i]) * 2;
      pos[static_cast<size_t>(i) * 2] = static_cast<float>(wx + half + pk[1]);
      pos[static_cast<size_t>(i) * 2 + 1] =
          static_cast<float>(wy + half + pk[0]);
    }
  }

  if (nt == T) {
    std::memcpy(out, pos.data(), sizeof(float) * static_cast<size_t>(T) * 2);
    return 0;
  }
  // np.interp over the strided indices (idxs is sorted, covers [0, T-1])
  int seg = 0;
  for (int t = 0; t < T; ++t) {
    while (seg + 1 < nt && idxs[seg + 1] < t) ++seg;
    if (t <= idxs[0]) {
      out[t * 2] = pos[0];
      out[t * 2 + 1] = pos[1];
    } else if (t >= idxs[nt - 1]) {
      out[t * 2] = pos[static_cast<size_t>(nt - 1) * 2];
      out[t * 2 + 1] = pos[static_cast<size_t>(nt - 1) * 2 + 1];
    } else {
      const float a = static_cast<float>(t - idxs[seg]) /
                      static_cast<float>(idxs[seg + 1] - idxs[seg]);
      for (int d = 0; d < 2; ++d)
        out[t * 2 + d] = pos[static_cast<size_t>(seg) * 2 + d] +
                         a * (pos[static_cast<size_t>(seg + 1) * 2 + d] -
                              pos[static_cast<size_t>(seg) * 2 + d]);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// clips [B, T, H, W] uint8 (FULL resolution); anchor_pos [B, 2] (x, y) at
// the ::ds-downsampled scale; out_traj [B, T, 2] (x, y), downsampled scale.
// ok [B] uint8: 1 = tracked, 0 = geometry invalid (caller falls back).
// Threaded over clips with an atomic work queue (GIL released by ctypes).
void avsl_track_ncc_batch(const uint8_t* clips, int B, int T, int H, int W,
                          int ds, const float* anchor_pos, int anchor,
                          int template_size, int search, int stride,
                          int top_k, float motion_lambda, int n_threads,
                          float* out_traj, uint8_t* ok) {
  // cv::matchTemplate would otherwise parallel_for internally — the outer
  // clip-level pool owns the cores.
  cv::setNumThreads(1);
  n_threads = std::max(1, std::min(n_threads, B));
  std::atomic<int> next(0);
  const size_t clip_sz = static_cast<size_t>(T) * H * W;
  auto worker = [&]() {
    for (;;) {
      const int b = next.fetch_add(1);
      if (b >= B) break;
      const int rc = track_one_clip(
          clips + static_cast<size_t>(b) * clip_sz, T, H, W, ds,
          anchor_pos[b * 2], anchor_pos[b * 2 + 1], anchor, template_size,
          search, stride, top_k, motion_lambda,
          out_traj + static_cast<size_t>(b) * T * 2);
      ok[b] = rc == 0 ? 1 : 0;
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

}  // extern "C"
