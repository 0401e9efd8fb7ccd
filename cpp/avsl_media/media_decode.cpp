// avsl_media: native media runtime for the AVSL-TPU framework.
//
// TPU-native equivalent of the reference pipeline's ffmpeg/decord/OpenCV
// dependency surface (video_process.py, hf_video_utils.py in the reference
// repo): batch video decode straight into caller-provided staging buffers
// that the Python side hands to jax.device_put, plus audio decode with
// sample-rate conversion. A small thread pool decodes many segments
// concurrently so the host never gates the TPU (the reference used a
// multiprocessing.Pool of Python workers for the same purpose).
//
// Exposed as a plain C API (consumed from Python via ctypes — no pybind11
// in this environment).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

namespace {

struct VideoResult {
  int frames = 0;   // frames written
  int width = 0;
  int height = 0;
  double fps = 0.0;
  int err = 0;      // 0 ok, negative libav error, positive avsl error
};

constexpr int kErrOpen = 1;
constexpr int kErrNoStream = 2;
constexpr int kErrDecoder = 3;

// Decode up to max_frames grayscale frames of `path` into out
// (uint8, frame-major, each frame out_w*out_h). If out_w/out_h are 0 the
// native size is used (and must fit buffer_capacity_bytes).
VideoResult decode_video_gray(const char* path, uint8_t* out,
                              int64_t buffer_capacity_bytes, int max_frames,
                              int out_w, int out_h, double start_sec,
                              double end_sec) {
  VideoResult res;
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    res.err = kErrOpen;
    return res;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    res.err = kErrNoStream;
    return res;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vstream < 0) {
    avformat_close_input(&fmt);
    res.err = kErrNoStream;
    return res;
  }
  AVStream* stream = fmt->streams[vstream];
  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  ctx->thread_count = 1;  // parallelism comes from the segment-level pool
  if (!codec || avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    res.err = kErrDecoder;
    return res;
  }

  AVRational fr = stream->avg_frame_rate;
  res.fps = (fr.den > 0) ? av_q2d(fr) : 25.0;
  int w = (out_w > 0) ? out_w : ctx->width;
  int h = (out_h > 0) ? out_h : ctx->height;
  res.width = w;
  res.height = h;

  if (start_sec > 0.0) {
    int64_t ts = av_rescale_q((int64_t)(start_sec * AV_TIME_BASE),
                              AVRational{1, AV_TIME_BASE}, stream->time_base);
    av_seek_frame(fmt, vstream, ts, AVSEEK_FLAG_BACKWARD);
  }

  SwsContext* sws = sws_getContext(ctx->width, ctx->height, ctx->pix_fmt, w, h,
                                   AV_PIX_FMT_GRAY8, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  if (!sws) {  // corrupt stream params (pix_fmt NONE / zero dims): report,
               // don't segfault a pool thread with sws_scale(nullptr,...)
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    res.err = kErrDecoder;
    return res;
  }
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  const int64_t frame_bytes = (int64_t)w * h;
  int64_t decoded_frames = 0;  // index-based timing for pts-less streams

  auto emit = [&](AVFrame* f) -> bool {
    if (res.frames >= max_frames) return false;
    if ((int64_t)(res.frames + 1) * frame_bytes > buffer_capacity_bytes)
      return false;
    double t = (f->pts != AV_NOPTS_VALUE)
                   ? f->pts * av_q2d(stream->time_base)
                   : (res.fps > 0 ? (double)decoded_frames / res.fps : -1.0);
    if (t >= 0 && start_sec > 0 && t < start_sec) {
      decoded_frames++;  // pts-less fallback counts every decoded frame
      return true;       // skip
    }
    if (t >= 0 && end_sec > 0 && t >= end_sec) return false;
    decoded_frames++;
    uint8_t* dst[1] = {out + (int64_t)res.frames * frame_bytes};
    int dst_stride[1] = {w};
    sws_scale(sws, f->data, f->linesize, 0, ctx->height, dst, dst_stride);
    res.frames++;
    return true;
  };

  bool done = false;
  while (!done && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vstream) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (avcodec_receive_frame(ctx, frame) >= 0) {
          if (!emit(frame)) {
            done = true;
            break;
          }
        }
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {  // flush
    avcodec_send_packet(ctx, nullptr);
    while (avcodec_receive_frame(ctx, frame) >= 0) {
      if (!emit(frame)) break;
    }
  }

  av_packet_free(&pkt);
  av_frame_free(&frame);
  sws_freeContext(sws);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return res;
}

struct AudioResult {
  int64_t samples = 0;
  int sample_rate = 0;
  int err = 0;
};

// Decode the (first) audio stream to mono float32 at target_sr (0 = native).
AudioResult decode_audio_f32(const char* path, float* out,
                             int64_t max_samples, int target_sr) {
  AudioResult res;
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    res.err = kErrOpen;
    return res;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    res.err = kErrNoStream;
    return res;
  }
  int astream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (astream < 0) {
    avformat_close_input(&fmt);
    res.err = kErrNoStream;
    return res;
  }
  AVStream* stream = fmt->streams[astream];
  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  if (!codec || avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    res.err = kErrDecoder;
    return res;
  }

  int out_sr = (target_sr > 0) ? target_sr : ctx->sample_rate;
  res.sample_rate = out_sr;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  int swr_rc = swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, out_sr,
                                   &ctx->ch_layout, ctx->sample_fmt,
                                   ctx->sample_rate, 0, nullptr);
  if (swr_rc < 0 || !swr || swr_init(swr) < 0) {
    // unsupported/unset channel layout: report instead of returning
    // silent empty audio (or dereferencing a null resampler)
    if (swr) swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    res.err = kErrDecoder;
    return res;
  }

  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  std::vector<float> tmp;

  auto emit = [&](AVFrame* f) {
    int max_out = swr_get_out_samples(swr, f ? f->nb_samples : 0);
    if (max_out <= 0) max_out = 4096;
    tmp.resize((size_t)max_out);
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(tmp.data())};
    int n = swr_convert(swr, outp, max_out,
                        f ? const_cast<const uint8_t**>(f->data) : nullptr,
                        f ? f->nb_samples : 0);
    if (n > 0) {
      int64_t take = std::min<int64_t>(n, max_samples - res.samples);
      std::memcpy(out + res.samples, tmp.data(), (size_t)take * sizeof(float));
      res.samples += take;
    }
  };

  while (res.samples < max_samples && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == astream) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (avcodec_receive_frame(ctx, frame) >= 0) emit(frame);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(ctx, nullptr);
  while (avcodec_receive_frame(ctx, frame) >= 0) emit(frame);
  emit(nullptr);  // flush resampler

  av_packet_free(&pkt);
  av_frame_free(&frame);
  swr_free(&swr);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return res;
}

// ---------------------------------------------------------------------------
// Thread pool for batch decode
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

// ---- single video -------------------------------------------------------
// Returns frames decoded (>=0) or -err. Outputs w/h/fps via pointers.
int avsl_decode_video_gray(const char* path, uint8_t* out,
                           int64_t buffer_capacity_bytes, int max_frames,
                           int out_w, int out_h, double start_sec,
                           double end_sec, int* width, int* height,
                           double* fps) {
  VideoResult r = decode_video_gray(path, out, buffer_capacity_bytes,
                                    max_frames, out_w, out_h, start_sec,
                                    end_sec);
  if (width) *width = r.width;
  if (height) *height = r.height;
  if (fps) *fps = r.fps;
  return r.err ? -r.err : r.frames;
}

// ---- single audio -------------------------------------------------------
// Returns samples decoded (>=0) or -err; sample rate via pointer.
int64_t avsl_decode_audio_f32(const char* path, float* out,
                              int64_t max_samples, int target_sr,
                              int* sample_rate) {
  AudioResult r = decode_audio_f32(path, out, max_samples, target_sr);
  if (sample_rate) *sample_rate = r.sample_rate;
  return r.err ? -(int64_t)r.err : r.samples;
}

// ---- batch video (thread pool) -----------------------------------------
// Decodes n videos concurrently. Buffers are slices of one staging arena:
// video i writes to out + i*stride_bytes. frames_out[i] receives the frame
// count (or -err). All videos are scaled to out_w x out_h.
void avsl_decode_video_batch(const char** paths, int n, uint8_t* out,
                             int64_t stride_bytes, int max_frames, int out_w,
                             int out_h, int* frames_out, int num_threads) {
  ThreadPool pool(num_threads > 0 ? num_threads
                                  : (int)std::thread::hardware_concurrency());
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < n; ++i) {
    pool.submit([&, i] {
      VideoResult r =
          decode_video_gray(paths[i], out + (int64_t)i * stride_bytes,
                            stride_bytes, max_frames, out_w, out_h, 0.0, 0.0);
      frames_out[i] = r.err ? -r.err : r.frames;
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
}

// ---- batch audio (thread pool) -----------------------------------------
void avsl_decode_audio_batch(const char** paths, int n, float* out,
                             int64_t stride_samples, int target_sr,
                             int64_t* samples_out, int num_threads) {
  ThreadPool pool(num_threads > 0 ? num_threads
                                  : (int)std::thread::hardware_concurrency());
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < n; ++i) {
    pool.submit([&, i] {
      AudioResult r = decode_audio_f32(paths[i], out + (int64_t)i * stride_samples,
                                       stride_samples, target_sr);
      samples_out[i] = r.err ? -(int64_t)r.err : r.samples;
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
}

int avsl_media_version() { return 1; }

}  // extern "C"
