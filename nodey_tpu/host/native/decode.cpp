// Full-file audio decode: demux + decode + normalize to interleaved f32.
//
// TPU-era counterpart of the reference's per-file decode fiber
// (reference: src/processor/audio-io.cpp:86-226): same libavformat/libavcodec
// pipeline, but the result is one contiguous pinned buffer ready for
// host->HBM transfer instead of a stream of AVFrames through a fiber channel.
// pts gaps become zero-filled spans here, which is where the reference's
// export path would synthesize silence (audio-io.cpp:666-694).

#include "nodey_host.h"

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/samplefmt.h>
}

namespace {

void set_err(char* errbuf, int len, const char* msg) {
  if (errbuf && len > 0) {
    std::snprintf(errbuf, static_cast<size_t>(len), "%s", msg);
  }
}

// Normalization scales match nodey_tpu.core.stream.FMT_SCALE: power-of-two
// divisors so integer PCM round-trips exactly through float32.
template <typename T>
float norm(T v);
template <>
float norm<int16_t>(int16_t v) { return static_cast<float>(v) / 32768.0f; }
template <>
float norm<int32_t>(int32_t v) {
  return static_cast<float>(static_cast<double>(v) / 2147483648.0);
}
template <>
float norm<float>(float v) { return v; }
template <>
float norm<uint8_t>(uint8_t v) {
  return (static_cast<float>(v) - 128.0f) / 128.0f;
}
template <>
float norm<double>(double v) { return static_cast<float>(v); }

template <typename T>
void append_interleaved(std::vector<float>& dst, const AVFrame* f, int ch) {
  const T* src = reinterpret_cast<const T*>(f->data[0]);
  const int64_t n = static_cast<int64_t>(f->nb_samples) * ch;
  for (int64_t i = 0; i < n; ++i) dst.push_back(norm<T>(src[i]));
}

template <typename T>
void append_planar(std::vector<float>& dst, const AVFrame* f, int ch) {
  for (int i = 0; i < f->nb_samples; ++i) {
    for (int c = 0; c < ch; ++c) {
      const T* src = reinterpret_cast<const T*>(f->data[c]);
      dst.push_back(norm<T>(src[i]));
    }
  }
}

// Returns the origin-format tag, or -1 for unsupported formats.
int fmt_tag(AVSampleFormat fmt) {
  switch (fmt) {
    case AV_SAMPLE_FMT_S16:
    case AV_SAMPLE_FMT_S16P:
      return NA_FMT_S16;
    case AV_SAMPLE_FMT_S32:
    case AV_SAMPLE_FMT_S32P:
      return NA_FMT_S32;
    default:
      return NA_FMT_FLT;
  }
}

bool append_frame(std::vector<float>& pcm, const AVFrame* f, int ch,
                  char* errbuf, int errlen) {
  switch (static_cast<AVSampleFormat>(f->format)) {
    case AV_SAMPLE_FMT_FLT:  append_interleaved<float>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_FLTP: append_planar<float>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_S16:  append_interleaved<int16_t>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_S16P: append_planar<int16_t>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_S32:  append_interleaved<int32_t>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_S32P: append_planar<int32_t>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_U8:   append_interleaved<uint8_t>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_U8P:  append_planar<uint8_t>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_DBL:  append_interleaved<double>(pcm, f, ch); return true;
    case AV_SAMPLE_FMT_DBLP: append_planar<double>(pcm, f, ch); return true;
    default:
      set_err(errbuf, errlen, "unsupported sample format");
      return false;
  }
}

}  // namespace

extern "C" int na_decode_file(const char* path, na_decoded* out, char* errbuf,
                              int errbuf_len) {
  av_log_set_level(AV_LOG_QUIET);
  std::memset(out, 0, sizeof(*out));

  AVFormatContext* fmt_ctx = nullptr;
  if (avformat_open_input(&fmt_ctx, path, nullptr, nullptr) < 0) {
    set_err(errbuf, errbuf_len, "Failed to open input file");
    return -1;
  }
  struct FmtGuard {
    AVFormatContext** p;
    ~FmtGuard() { avformat_close_input(p); }
  } fmt_guard{&fmt_ctx};

  if (avformat_find_stream_info(fmt_ctx, nullptr) < 0) {
    set_err(errbuf, errbuf_len, "Failed to find stream info");
    return -1;
  }

  const int stream_idx =
      av_find_best_stream(fmt_ctx, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (stream_idx < 0) {
    set_err(errbuf, errbuf_len, "No audio stream found");
    return -1;
  }
  AVStream* stream = fmt_ctx->streams[stream_idx];

  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  if (!codec) {
    set_err(errbuf, errbuf_len, "No decoder for codec");
    return -1;
  }
  AVCodecContext* codec_ctx = avcodec_alloc_context3(codec);
  if (!codec_ctx) {
    set_err(errbuf, errbuf_len, "Failed to allocate codec context");
    return -1;
  }
  struct CodecGuard {
    AVCodecContext** p;
    ~CodecGuard() { avcodec_free_context(p); }
  } codec_guard{&codec_ctx};

  if (avcodec_parameters_to_context(codec_ctx, stream->codecpar) < 0 ||
      avcodec_open2(codec_ctx, codec, nullptr) < 0) {
    set_err(errbuf, errbuf_len, "Failed to open decoder");
    return -1;
  }

  std::vector<float> pcm;
  int channels = 0;
  int sample_rate = 0;
  int tag = NA_FMT_FLT;
  bool first = true;
  int64_t pts0_us = 0;
  const double tb = av_q2d(stream->time_base);

  AVPacket* packet = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  struct PktGuard {
    AVPacket** pkt;
    AVFrame** frm;
    ~PktGuard() {
      av_packet_free(pkt);
      av_frame_free(frm);
    }
  } pkt_guard{&packet, &frame};

  auto handle_frame = [&](const AVFrame* f) -> bool {
    if (first) {
      first = false;
      channels = f->ch_layout.nb_channels;
      sample_rate = f->sample_rate;
      tag = fmt_tag(static_cast<AVSampleFormat>(f->format));
      if (f->pts != AV_NOPTS_VALUE) {
        pts0_us = static_cast<int64_t>(f->pts * tb * 1e6);
      }
    }
    if (f->ch_layout.nb_channels != channels || f->sample_rate != sample_rate) {
      set_err(errbuf, errbuf_len, "Stream changed format mid-file");
      return false;
    }
    // Gap fill: if this frame's pts lands beyond the samples written so far,
    // zero-fill the difference (>= 10 ms, mirroring the tolerance implicit in
    // the reference's silence_time handling, audio-io.cpp:833-843).
    if (f->pts != AV_NOPTS_VALUE) {
      const double t = f->pts * tb - static_cast<double>(pts0_us) / 1e6;
      const int64_t written = static_cast<int64_t>(pcm.size()) / channels;
      const int64_t expect =
          static_cast<int64_t>(t * sample_rate + 0.5);
      if (expect > written + sample_rate / 100) {
        pcm.resize(pcm.size() +
                       static_cast<size_t>((expect - written) * channels),
                   0.0f);
      }
    }
    return append_frame(pcm, f, channels, errbuf, errbuf_len);
  };

  auto drain = [&](bool flush) -> int {
    if (flush) avcodec_send_packet(codec_ctx, nullptr);
    while (true) {
      const int r = avcodec_receive_frame(codec_ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) {
        set_err(errbuf, errbuf_len, "Decode error");
        return -1;
      }
      if (!handle_frame(frame)) return -1;
    }
  };

  while (av_read_frame(fmt_ctx, packet) >= 0) {
    if (packet->stream_index == stream_idx) {
      if (avcodec_send_packet(codec_ctx, packet) == 0) {
        if (drain(false) < 0) {
          av_packet_unref(packet);
          return -1;
        }
      }
    }
    av_packet_unref(packet);
  }
  if (drain(true) < 0) return -1;

  if (first) {
    set_err(errbuf, errbuf_len, "File contains no audio frames");
    return -1;
  }

  const int64_t num_samples = static_cast<int64_t>(pcm.size()) / channels;
  float* data = static_cast<float*>(
      std::malloc(pcm.size() * sizeof(float) + sizeof(float)));
  if (!data) {
    set_err(errbuf, errbuf_len, "Out of memory");
    return -1;
  }
  std::memcpy(data, pcm.data(), pcm.size() * sizeof(float));

  out->sample_rate = sample_rate;
  out->channels = channels;
  out->fmt = tag;
  out->num_samples = num_samples;
  out->pts0_us = pts0_us;
  out->data = data;
  return 0;
}

extern "C" void na_free_decoded(na_decoded* d) {
  if (d && d->data) {
    std::free(d->data);
    d->data = nullptr;
  }
}
