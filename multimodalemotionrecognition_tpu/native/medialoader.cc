// Native media decoder: libavformat/libavcodec/swresample/swscale.
//
// First-party C++ replacement for the reference's native media path —
// ffmpeg *subprocess* audio extraction (backend/app/preprocess.py:354-383)
// and OpenCV's decode loop (src/data/ravdess.py:306-357) — as an in-process
// library: one demux pass, no fork/exec, no temp files, output written
// directly into caller-provided numpy buffers.
//
// C ABI (see medialoader.py):
//   ml_decode_audio(path, target_rate, **out, *n)   f32 mono @ target_rate
//   ml_decode_video(path, indices, n, w, h, out)    RGB24 frames, bilinear
//   ml_probe(path, *frames, *fps, *duration, *has_audio)
//   ml_free(ptr)
//
// Build: python -m multimodalemotionrecognition_tpu.native.build

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;

  ~Demux() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path, AVMediaType type) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream_index = av_find_best_stream(fmt, type, -1, -1, &codec, 0);
    if (stream_index < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream_index]->codecpar) < 0)
      return -5;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }
};

}  // namespace

extern "C" {

void ml_free(void* p) { free(p); }

int ml_probe(const char* path, long long* out_frames, double* out_fps,
             double* out_duration, int* out_has_audio) {
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  *out_frames = 0;
  *out_fps = 0.0;
  *out_duration = 0.0;
  *out_has_audio = 0;
  if (rc == 0) {
    AVStream* st = d.fmt->streams[d.stream_index];
    AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
    *out_fps = fr.den ? av_q2d(fr) : 0.0;
    if (d.fmt->duration > 0)
      *out_duration = static_cast<double>(d.fmt->duration) / AV_TIME_BASE;
    long long n = st->nb_frames;
    if (n <= 0 && *out_fps > 0 && *out_duration > 0)
      n = static_cast<long long>(*out_duration * *out_fps + 0.5);
    *out_frames = n;
    for (unsigned i = 0; i < d.fmt->nb_streams; ++i)
      if (d.fmt->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_AUDIO)
        *out_has_audio = 1;
    return 0;
  }
  // Audio-only containers still probe fine.
  Demux a;
  if (a.open(path, AVMEDIA_TYPE_AUDIO) == 0) {
    *out_has_audio = 1;
    if (a.fmt->duration > 0)
      *out_duration = static_cast<double>(a.fmt->duration) / AV_TIME_BASE;
    return 0;
  }
  return rc;
}

int ml_decode_audio(const char* path, int target_rate, float** out,
                    long long* out_n) {
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_AUDIO);
  if (rc != 0) return rc;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (d.dec->ch_layout.nb_channels > 0) {
    av_channel_layout_copy(&in_layout, &d.dec->ch_layout);
  } else {
    av_channel_layout_default(&in_layout, 2);
  }
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, target_rate,
                          &in_layout, d.dec->sample_fmt, d.dec->sample_rate,
                          0, nullptr) < 0)
    return -10;
  if (swr_init(swr) < 0) {
    swr_free(&swr);
    return -11;
  }

  std::vector<float> samples;
  samples.reserve(static_cast<size_t>(target_rate) * 4);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<float> chunk;

  auto drain_frame = [&](AVFrame* f) {
    int max_out = swr_get_out_samples(swr, f ? f->nb_samples : 0);
    if (max_out <= 0) max_out = 4096;
    chunk.resize(static_cast<size_t>(max_out));
    uint8_t* outbuf = reinterpret_cast<uint8_t*>(chunk.data());
    int got = swr_convert(swr, &outbuf, max_out,
                          f ? const_cast<const uint8_t**>(f->data) : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) samples.insert(samples.end(), chunk.begin(), chunk.begin() + got);
  };

  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) {
      if (avcodec_send_packet(d.dec, pkt) >= 0) {
        while (avcodec_receive_frame(d.dec, frame) >= 0) drain_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d.dec, nullptr);  // flush decoder
  while (avcodec_receive_frame(d.dec, frame) >= 0) drain_frame(frame);
  drain_frame(nullptr);  // flush resampler

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  av_channel_layout_uninit(&in_layout);

  *out_n = static_cast<long long>(samples.size());
  *out = static_cast<float*>(malloc(samples.size() * sizeof(float)));
  if (!*out) return -12;
  memcpy(*out, samples.data(), samples.size() * sizeof(float));
  return 0;
}

int ml_decode_video(const char* path, const long long* indices, int n_indices,
                    int out_w, int out_h, unsigned char* out) {
  if (n_indices <= 0) return 0;
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  long long current = 0;
  int next_slot = 0;  // indices are sorted ascending
  const size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;

  auto handle_frame = [&](AVFrame* f) {
    while (next_slot < n_indices && indices[next_slot] == current) {
      if (!sws) {
        sws = sws_getContext(f->width, f->height,
                             static_cast<AVPixelFormat>(f->format), out_w,
                             out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                             nullptr, nullptr);
      }
      uint8_t* dst[1] = {out + static_cast<size_t>(next_slot) * frame_bytes};
      int dst_stride[1] = {out_w * 3};
      sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
      ++next_slot;
    }
    ++current;
  };

  while (next_slot < n_indices && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) {
      if (avcodec_send_packet(d.dec, pkt) >= 0) {
        while (avcodec_receive_frame(d.dec, frame) >= 0) handle_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  if (next_slot < n_indices) {
    avcodec_send_packet(d.dec, nullptr);
    while (avcodec_receive_frame(d.dec, frame) >= 0) handle_frame(frame);
  }

  // Short video: replicate the last decoded frame (reference pads by
  // repeating the final frame, src/data/ravdess.py:361-362).
  if (next_slot > 0) {
    while (next_slot < n_indices) {
      memcpy(out + static_cast<size_t>(next_slot) * frame_bytes,
             out + static_cast<size_t>(next_slot - 1) * frame_bytes,
             frame_bytes);
      ++next_slot;
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (sws) sws_freeContext(sws);
  return next_slot == n_indices ? 0 : -20;
}

}  // extern "C"
