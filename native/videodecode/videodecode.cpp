// Native video decoder: exact [start, end]-second range decode over libav.
//
// Role: the TPU-native replacement for the torchvision `video_reader` C++
// backend the reference hard-requires (reference datasets/reader_fns.py:23,
// base_video_dataset.py:38) and the OpenCV fps/duration probe
// (common/utils.py:193-208). One context per open file; contexts are not
// thread-safe, use one per worker thread.
//
// C ABI for ctypes. Frames come out as packed RGB24 (T, H, W, 3) with
// per-frame presentation timestamps in seconds.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdio>
#include <cstring>
#include <string>

namespace {
thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }
}  // namespace

extern "C" {

struct VDContext {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_idx = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  double duration = 0.0;
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  AVPacket* pkt = nullptr;
};

const char* vd_last_error() { return g_last_error.c_str(); }

void vd_close(VDContext* ctx) {
  if (!ctx) return;
  if (ctx->sws) sws_freeContext(ctx->sws);
  if (ctx->frame) av_frame_free(&ctx->frame);
  if (ctx->rgb) av_frame_free(&ctx->rgb);
  if (ctx->pkt) av_packet_free(&ctx->pkt);
  if (ctx->codec) avcodec_free_context(&ctx->codec);
  if (ctx->fmt) avformat_close_input(&ctx->fmt);
  delete ctx;
}

VDContext* vd_open(const char* path) {
  auto* ctx = new VDContext();
  if (avformat_open_input(&ctx->fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    vd_close(ctx);
    return nullptr;
  }
  if (avformat_find_stream_info(ctx->fmt, nullptr) < 0) {
    set_error("no stream info");
    vd_close(ctx);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  ctx->stream_idx =
      av_find_best_stream(ctx->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (ctx->stream_idx < 0 || !dec) {
    set_error("no video stream / decoder");
    vd_close(ctx);
    return nullptr;
  }
  AVStream* st = ctx->fmt->streams[ctx->stream_idx];
  ctx->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(ctx->codec, st->codecpar);
  ctx->codec->thread_count = 0;  // auto threads
  if (avcodec_open2(ctx->codec, dec, nullptr) < 0) {
    set_error("cannot open codec");
    vd_close(ctx);
    return nullptr;
  }
  ctx->width = ctx->codec->width;
  ctx->height = ctx->codec->height;
  AVRational fr = av_guess_frame_rate(ctx->fmt, st, nullptr);
  ctx->fps = fr.den > 0 ? av_q2d(fr) : 0.0;
  if (st->duration > 0) {
    ctx->duration = st->duration * av_q2d(st->time_base);
  } else if (ctx->fmt->duration > 0) {
    ctx->duration = ctx->fmt->duration / (double)AV_TIME_BASE;
  }
  ctx->frame = av_frame_alloc();
  ctx->rgb = av_frame_alloc();
  ctx->pkt = av_packet_alloc();
  ctx->sws = sws_getContext(ctx->width, ctx->height, ctx->codec->pix_fmt,
                            ctx->width, ctx->height, AV_PIX_FMT_RGB24,
                            SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!ctx->sws) {
    set_error("cannot create scaler");
    vd_close(ctx);
    return nullptr;
  }
  return ctx;
}

double vd_fps(VDContext* ctx) { return ctx ? ctx->fps : 0.0; }
double vd_duration(VDContext* ctx) { return ctx ? ctx->duration : 0.0; }
int vd_width(VDContext* ctx) { return ctx ? ctx->width : 0; }
int vd_height(VDContext* ctx) { return ctx ? ctx->height : 0; }

// Decode frames whose pts lies in [start_sec, end_sec] (inclusive, like
// torchvision.io.read_video). Returns the number of frames written, or -1.
int vd_read_range(VDContext* ctx, double start_sec, double end_sec,
                  unsigned char* out, double* out_pts, int max_frames) {
  if (!ctx) return -1;
  AVStream* st = ctx->fmt->streams[ctx->stream_idx];
  const double tb = av_q2d(st->time_base);
  const int64_t seek_target = (int64_t)(start_sec / tb);
  // Seek to the nearest keyframe at/before start, then decode forward.
  if (av_seek_frame(ctx->fmt, ctx->stream_idx, seek_target,
                    AVSEEK_FLAG_BACKWARD) < 0) {
    // some containers fail to seek to 0; rewind manually
    av_seek_frame(ctx->fmt, ctx->stream_idx, 0, AVSEEK_FLAG_BYTE);
  }
  avcodec_flush_buffers(ctx->codec);
  const size_t frame_bytes = (size_t)ctx->width * ctx->height * 3;
  int count = 0;
  bool done = false;
  const double eps = 1e-6;
  while (!done && av_read_frame(ctx->fmt, ctx->pkt) >= 0) {
    if (ctx->pkt->stream_index != ctx->stream_idx) {
      av_packet_unref(ctx->pkt);
      continue;
    }
    if (avcodec_send_packet(ctx->codec, ctx->pkt) < 0) {
      av_packet_unref(ctx->pkt);
      continue;
    }
    av_packet_unref(ctx->pkt);
    while (avcodec_receive_frame(ctx->codec, ctx->frame) == 0) {
      const int64_t pts = ctx->frame->best_effort_timestamp;
      const double sec = pts == AV_NOPTS_VALUE ? 0.0 : pts * tb;
      if (sec > end_sec + eps) {
        done = true;
        break;
      }
      if (sec + eps < start_sec) continue;
      if (count >= max_frames) {
        done = true;
        break;
      }
      uint8_t* dst[1] = {out + (size_t)count * frame_bytes};
      int dst_linesize[1] = {ctx->width * 3};
      sws_scale(ctx->sws, ctx->frame->data, ctx->frame->linesize, 0,
                ctx->height, dst, dst_linesize);
      if (out_pts) out_pts[count] = sec;
      ++count;
    }
  }
  // flush decoder for trailing frames
  if (!done) {
    avcodec_send_packet(ctx->codec, nullptr);
    while (count < max_frames &&
           avcodec_receive_frame(ctx->codec, ctx->frame) == 0) {
      const int64_t pts = ctx->frame->best_effort_timestamp;
      const double sec = pts == AV_NOPTS_VALUE ? 0.0 : pts * tb;
      if (sec > end_sec + eps) break;
      if (sec + eps < start_sec) continue;
      uint8_t* dst[1] = {out + (size_t)count * frame_bytes};
      int dst_linesize[1] = {ctx->width * 3};
      sws_scale(ctx->sws, ctx->frame->data, ctx->frame->linesize, 0,
                ctx->height, dst, dst_linesize);
      if (out_pts) out_pts[count] = sec;
      ++count;
    }
  }
  return count;
}

// Stream-copy remux with transformed timestamps (+ optional rotation
// metadata): emulates variable-frame-rate sources where pts !=
// frame_idx/fps, and rotated phone captures, without an encoder in the
// environment. new_pts_sec = sec * pts_scale + pts_quad * sec^2
// (monotonic for pts_scale > 0, pts_quad >= 0). Used by the decoder
// fault-matrix tests; also a building block for dataset re-timing tools.
int vd_remux(const char* in_path, const char* out_path, double pts_scale,
             double pts_quad, int rotation_deg) {
  AVFormatContext* in = nullptr;
  AVFormatContext* out = nullptr;
  AVPacket* pkt = nullptr;
  int ret = -1;
  do {
    if (avformat_open_input(&in, in_path, nullptr, nullptr) < 0) {
      set_error(std::string("remux: cannot open ") + in_path);
      break;
    }
    if (avformat_find_stream_info(in, nullptr) < 0) {
      set_error("remux: no stream info");
      break;
    }
    const int vidx =
        av_find_best_stream(in, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (vidx < 0) {
      set_error("remux: no video stream");
      break;
    }
    if (avformat_alloc_output_context2(&out, nullptr, nullptr, out_path) <
            0 || !out) {
      set_error("remux: cannot allocate output");
      break;
    }
    AVStream* os = avformat_new_stream(out, nullptr);
    if (!os ||
        avcodec_parameters_copy(os->codecpar, in->streams[vidx]->codecpar) <
            0) {
      set_error("remux: cannot copy codec params");
      break;
    }
    os->codecpar->codec_tag = 0;
    os->time_base = in->streams[vidx]->time_base;
    if (rotation_deg) {
      // mov/mp4 rotation convention (the muxer writes a display matrix)
      av_dict_set_int(&os->metadata, "rotate", rotation_deg, 0);
    }
    if (!(out->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0) {
      set_error("remux: cannot open output file");
      break;
    }
    if (avformat_write_header(out, nullptr) < 0) {
      set_error("remux: cannot write header");
      break;
    }
    pkt = av_packet_alloc();
    const AVRational itb = in->streams[vidx]->time_base;
    const AVRational otb = out->streams[0]->time_base;
    bool failed = false;
    while (av_read_frame(in, pkt) >= 0) {
      if (pkt->stream_index != vidx) {
        av_packet_unref(pkt);
        continue;
      }
      auto xform = [&](int64_t ts) -> int64_t {
        if (ts == AV_NOPTS_VALUE) return ts;
        const double sec = ts * av_q2d(itb);
        const double ns = sec * pts_scale + pts_quad * sec * sec;
        return (int64_t)llround(ns / av_q2d(itb));
      };
      pkt->pts = xform(pkt->pts);
      pkt->dts = xform(pkt->dts);
      pkt->duration = 0;  // let readers derive durations from pts deltas
      pkt->stream_index = 0;
      av_packet_rescale_ts(pkt, itb, otb);
      if (av_interleaved_write_frame(out, pkt) < 0) {
        set_error("remux: write frame failed");
        failed = true;
        break;
      }
    }
    av_write_trailer(out);
    if (!failed) ret = 0;
  } while (false);
  if (pkt) av_packet_free(&pkt);
  if (out) {
    if (!(out->oformat->flags & AVFMT_NOFILE) && out->pb)
      avio_closep(&out->pb);
    avformat_free_context(out);
  }
  if (in) avformat_close_input(&in);
  return ret;
}

}  // extern "C"
