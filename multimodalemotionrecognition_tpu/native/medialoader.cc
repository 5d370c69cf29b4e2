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
//   ml_decode_video_crop(path, indices, n, cx, cy, cw, ch, out_w, out_h, out)
//       decode at NATIVE resolution, crop rect in source pixels (cw<=0 =
//       full frame), then bilinear-resize -> the face-crop pipeline stays
//       intact (the plain ml_decode_video resizes before a crop could run)
//   ml_probe(path, *frames, *fps, *duration, *has_audio)
//   ml_probe_video(path, *frames, *fps, *duration, *w, *h, *has_audio)
//   ml_encode_av(path, frames, n, w, h, fps, audio, n_samples, rate)
//       mux RGB24 frames + f32 mono audio into .mp4 (h264+aac) or
//       .webm (vp8+opus) — the test/bench asset generator the repo needs
//       because cv2.VideoWriter cannot write audio tracks
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

  int open(const char* path, AVMediaType type, bool fast = false) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream_index = av_find_best_stream(fmt, type, -1, -1, &codec, 0);
    if (stream_index < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream_index]->codecpar) < 0)
      return -5;
    dec->thread_count = 0;  // auto: frame-threaded decode scales with cores
    if (fast) {
      // Sampled-frame extraction tolerates non-spec-exact decode: skipping
      // the h264 in-loop deblocking filter cuts ~25% of decode time with
      // imperceptible pixel drift at 112px model input.
      dec->skip_loop_filter = AVDISCARD_ALL;
      dec->flags2 |= AV_CODEC_FLAG2_FAST;
    }
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

int ml_probe_video(const char* path, long long* out_frames, double* out_fps,
                   double* out_duration, int* out_w, int* out_h,
                   int* out_has_audio) {
  // Single demux pass (ml_probe opens the container up to twice; audio-only
  // uploads were paying 3x avformat_find_stream_info).
  *out_frames = 0;
  *out_fps = 0.0;
  *out_duration = 0.0;
  *out_w = 0;
  *out_h = 0;
  *out_has_audio = 0;
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  if (fmt->duration > 0)
    *out_duration = static_cast<double>(fmt->duration) / AV_TIME_BASE;
  int video_index = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                        nullptr, 0);
  for (unsigned i = 0; i < fmt->nb_streams; ++i)
    if (fmt->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_AUDIO)
      *out_has_audio = 1;
  if (video_index >= 0) {
    AVStream* st = fmt->streams[video_index];
    *out_w = st->codecpar->width;
    *out_h = st->codecpar->height;
    AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
    *out_fps = fr.den ? av_q2d(fr) : 0.0;
    long long n = st->nb_frames;
    if (n <= 0 && *out_fps > 0 && *out_duration > 0)
      n = static_cast<long long>(*out_duration * *out_fps + 0.5);
    *out_frames = n;
  }
  avformat_close_input(&fmt);
  return 0;
}

int ml_decode_video_crop(const char* path, const long long* indices,
                         int n_indices, int crop_x, int crop_y, int crop_w,
                         int crop_h, int out_w, int out_h, unsigned char* out) {
  if (n_indices <= 0) return 0;
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO, /*fast=*/true);
  if (rc != 0) return rc;

  SwsContext* to_rgb = nullptr;   // native fmt -> RGB24 at native size
  SwsContext* resize = nullptr;   // cropped RGB24 -> out size
  std::vector<unsigned char> rgb_full;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  long long current = 0;
  int next_slot = 0;  // indices are sorted ascending
  const size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;

  auto handle_frame = [&](AVFrame* f) {
    if (next_slot < n_indices && indices[next_slot] == current) {
      const int w = f->width, h = f->height;
      if (!to_rgb) {
        to_rgb = sws_getContext(w, h, static_cast<AVPixelFormat>(f->format),
                                w, h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                nullptr, nullptr);
        rgb_full.resize(static_cast<size_t>(w) * h * 3);
      }
      uint8_t* full_dst[1] = {rgb_full.data()};
      int full_stride[1] = {w * 3};
      sws_scale(to_rgb, f->data, f->linesize, 0, h, full_dst, full_stride);

      // Crop rect clipped to the frame; cw<=0 selects the full frame.
      int cx = crop_w > 0 ? crop_x : 0;
      int cy = crop_w > 0 ? crop_y : 0;
      int cw = crop_w > 0 ? crop_w : w;
      int ch = crop_w > 0 ? crop_h : h;
      if (cx < 0) cx = 0;
      if (cy < 0) cy = 0;
      if (cx + cw > w) cw = w - cx;
      if (cy + ch > h) ch = h - cy;
      if (cw <= 0 || ch <= 0) { cx = cy = 0; cw = w; ch = h; }

      if (!resize) {
        resize = sws_getContext(cw, ch, AV_PIX_FMT_RGB24, out_w, out_h,
                                AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                nullptr, nullptr);
      }
      const uint8_t* crop_src[1] = {
          rgb_full.data() + static_cast<size_t>(cy) * w * 3 +
          static_cast<size_t>(cx) * 3};
      int crop_stride[1] = {w * 3};

      while (next_slot < n_indices && indices[next_slot] == current) {
        uint8_t* dst[1] = {out + static_cast<size_t>(next_slot) * frame_bytes};
        int dst_stride[1] = {out_w * 3};
        sws_scale(resize, crop_src, crop_stride, 0, ch, dst, dst_stride);
        ++next_slot;
      }
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
  if (next_slot > 0) {  // short video: repeat last frame (reference behavior)
    while (next_slot < n_indices) {
      memcpy(out + static_cast<size_t>(next_slot) * frame_bytes,
             out + static_cast<size_t>(next_slot - 1) * frame_bytes,
             frame_bytes);
      ++next_slot;
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (to_rgb) sws_freeContext(to_rgb);
  if (resize) sws_freeContext(resize);
  return next_slot == n_indices ? 0 : -20;
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

namespace {

// One encoder stream (video or audio) with its packet-writing loop.
struct EncStream {
  AVStream* st = nullptr;
  AVCodecContext* enc = nullptr;

  ~EncStream() {
    if (enc) avcodec_free_context(&enc);
  }

  int write_frames(AVFormatContext* ofmt, AVFrame* frame) {
    // frame == nullptr flushes the encoder.
    if (avcodec_send_frame(enc, frame) < 0) return -1;
    AVPacket* pkt = av_packet_alloc();
    int rc = 0;
    while (true) {
      int r = avcodec_receive_packet(enc, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) { rc = -2; break; }
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(ofmt, pkt) < 0) { rc = -3; break; }
    }
    av_packet_free(&pkt);
    return rc;
  }
};

bool ends_with(const char* s, const char* suffix) {
  size_t ls = strlen(s), lf = strlen(suffix);
  return ls >= lf && strcmp(s + ls - lf, suffix) == 0;
}

}  // namespace

extern "C" {

int ml_encode_av(const char* path, const unsigned char* frames, int n_frames,
                 int w, int h, double fps, const float* audio,
                 long long n_samples, int sample_rate) {
  const bool webm = ends_with(path, ".webm");
  const char* vname = webm ? "libvpx" : "libx264";
  const char* aname = webm ? "libopus" : "aac";

  AVFormatContext* ofmt = nullptr;
  if (avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path) < 0 || !ofmt)
    return -30;

  EncStream v, a;
  SwsContext* sws = nullptr;
  SwrContext* swr = nullptr;
  AVFrame* vframe = nullptr;
  AVFrame* aframe = nullptr;
  int rc = 0;

  auto fail = [&](int code) {
    if (sws) sws_freeContext(sws);
    if (swr) swr_free(&swr);
    if (vframe) av_frame_free(&vframe);
    if (aframe) av_frame_free(&aframe);
    if (ofmt && !(ofmt->oformat->flags & AVFMT_NOFILE) && ofmt->pb)
      avio_closep(&ofmt->pb);
    avformat_free_context(ofmt);
    return code;
  };

  // ---- video stream (RGB24 -> yuv420p) ----
  if (n_frames > 0) {
    const AVCodec* vc = avcodec_find_encoder_by_name(vname);
    if (!vc) return fail(-31);
    v.st = avformat_new_stream(ofmt, nullptr);
    v.enc = avcodec_alloc_context3(vc);
    if (!v.st || !v.enc) return fail(-32);
    v.enc->width = w;
    v.enc->height = h;
    v.enc->pix_fmt = AV_PIX_FMT_YUV420P;
    v.enc->time_base = AVRational{1000, static_cast<int>(fps * 1000 + 0.5)};
    v.enc->bit_rate = 2'000'000;
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
      v.enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    AVDictionary* opts = nullptr;
    if (!webm) av_dict_set(&opts, "preset", "veryfast", 0);
    int r = avcodec_open2(v.enc, vc, &opts);
    av_dict_free(&opts);
    if (r < 0) return fail(-33);
    if (avcodec_parameters_from_context(v.st->codecpar, v.enc) < 0)
      return fail(-34);
    v.st->time_base = v.enc->time_base;
  }

  // ---- audio stream (f32 mono -> encoder sample format) ----
  if (n_samples > 0) {
    const AVCodec* ac = avcodec_find_encoder_by_name(aname);
    if (!ac) return fail(-35);
    a.st = avformat_new_stream(ofmt, nullptr);
    a.enc = avcodec_alloc_context3(ac);
    if (!a.st || !a.enc) return fail(-36);
    a.enc->sample_rate = sample_rate;
    av_channel_layout_default(&a.enc->ch_layout, 1);
    a.enc->sample_fmt =
        ac->sample_fmts ? ac->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
    a.enc->time_base = AVRational{1, sample_rate};
    a.enc->bit_rate = 96'000;
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
      a.enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(a.enc, ac, nullptr) < 0) return fail(-37);
    if (avcodec_parameters_from_context(a.st->codecpar, a.enc) < 0)
      return fail(-38);
    a.st->time_base = a.enc->time_base;

    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    if (swr_alloc_set_opts2(&swr, &a.enc->ch_layout, a.enc->sample_fmt,
                            a.enc->sample_rate, &mono, AV_SAMPLE_FMT_FLT,
                            sample_rate, 0, nullptr) < 0 ||
        swr_init(swr) < 0)
      return fail(-39);
  }

  if (!(ofmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE) < 0)
    return fail(-40);
  if (avformat_write_header(ofmt, nullptr) < 0) return fail(-41);

  // ---- encode video frames ----
  if (n_frames > 0) {
    sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
    vframe = av_frame_alloc();
    vframe->format = AV_PIX_FMT_YUV420P;
    vframe->width = w;
    vframe->height = h;
    if (av_frame_get_buffer(vframe, 0) < 0) return fail(-42);
    const size_t fbytes = static_cast<size_t>(w) * h * 3;
    for (int i = 0; i < n_frames; ++i) {
      av_frame_make_writable(vframe);
      const uint8_t* src[1] = {frames + i * fbytes};
      int stride[1] = {w * 3};
      sws_scale(sws, src, stride, 0, h, vframe->data, vframe->linesize);
      vframe->pts = i;  // time_base is 1000/(fps*1000) = one tick per frame
      if (v.write_frames(ofmt, vframe) != 0) return fail(-43);
    }
    if (v.write_frames(ofmt, nullptr) != 0) return fail(-44);
  }

  // ---- encode audio in encoder-sized chunks ----
  if (n_samples > 0) {
    const int chunk = a.enc->frame_size > 0 ? a.enc->frame_size : 1024;
    aframe = av_frame_alloc();
    aframe->format = a.enc->sample_fmt;
    av_channel_layout_copy(&aframe->ch_layout, &a.enc->ch_layout);
    aframe->sample_rate = a.enc->sample_rate;
    aframe->nb_samples = chunk;
    if (av_frame_get_buffer(aframe, 0) < 0) return fail(-45);
    long long pos = 0;
    int64_t pts = 0;
    std::vector<float> padded(static_cast<size_t>(chunk));
    while (pos < n_samples) {
      av_frame_make_writable(aframe);
      int take = static_cast<int>(
          n_samples - pos < chunk ? n_samples - pos : chunk);
      memcpy(padded.data(), audio + pos, take * sizeof(float));
      if (take < chunk)
        memset(padded.data() + take, 0, (chunk - take) * sizeof(float));
      const uint8_t* in[1] = {reinterpret_cast<const uint8_t*>(padded.data())};
      int got = swr_convert(swr, aframe->data, chunk, in, chunk);
      if (got < 0) return fail(-46);
      aframe->nb_samples = got;
      aframe->pts = pts;
      pts += got;
      if (a.write_frames(ofmt, aframe) != 0) return fail(-47);
      pos += take;
    }
    if (a.write_frames(ofmt, nullptr) != 0) return fail(-48);
  }

  if (av_write_trailer(ofmt) < 0) return fail(-49);
  if (sws) sws_freeContext(sws);
  if (swr) swr_free(&swr);
  if (vframe) av_frame_free(&vframe);
  if (aframe) av_frame_free(&aframe);
  if (!(ofmt->oformat->flags & AVFMT_NOFILE) && ofmt->pb)
    avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return 0;
}

}  // extern "C"
