// Native video decode service (C++ / FFmpeg).
//
// TPU-native replacement for the reference's PyAV decode path
// (slowfast/datasets/decoder.py:186-370): exact PTS-window selective
// decode (keyframe seek + forward decode + drop-before-window, not the
// codec-dependent cv2 CAP_PROP_POS_FRAMES frame seek), in-memory decode
// from a bytes buffer (custom AVIOContext), multi-window single-pass
// sweep (several clips decoded in ONE packet sweep — the reference's
// multi-clip single-pass, decoder.py:79-183 + 228-370), and decode-time
// short-side resize via swscale (DATA.DECODING_SHORT_SIZE semantics).
//
// Exposed as a small C ABI consumed via ctypes (no pybind11 in the image).
// Frames are returned as packed RGB24 (N,H,W,3) plus the stream frame
// index of each kept frame, so the Python side can do the reference's
// linspace temporal sampling exactly.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <utility>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

namespace {

struct MemCtx {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemCtx* m = static_cast<MemCtx*>(opaque);
  int64_t left = m->size - m->pos;
  if (left <= 0) return AVERROR_EOF;
  int n = static_cast<int>(left < buf_size ? left : buf_size);
  memcpy(buf, m->data + m->pos, n);
  m->pos += n;
  return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemCtx* m = static_cast<MemCtx*>(opaque);
  if (whence == AVSEEK_SIZE) return m->size;
  whence &= ~AVSEEK_FORCE;
  int64_t pos = offset;
  if (whence == SEEK_CUR) pos = m->pos + offset;
  else if (whence == SEEK_END) pos = m->size + offset;
  if (pos < 0 || pos > m->size) return -1;
  m->pos = pos;
  return pos;
}

}  // namespace

extern "C" {

// Result of a decode call; freed with svd_result_free.
struct SvdResult {
  int n;                // frames kept
  int w, h;             // output frame size (post-resize)
  double fps;           // stream average frame rate
  int64_t nb_frames;    // estimated total frames in the stream
  uint8_t* data;        // (n, h, w, 3) RGB24
  int64_t* frame_idx;   // stream frame index of each kept frame
};

void svd_result_free(SvdResult* r) {
  if (!r) return;
  free(r->data);
  free(r->frame_idx);
  free(r);
}

uint8_t* svd_result_data(SvdResult* r) { return r->data; }
int64_t* svd_result_index(SvdResult* r) { return r->frame_idx; }
int svd_result_n(SvdResult* r) { return r->n; }
int svd_result_w(SvdResult* r) { return r->w; }
int svd_result_h(SvdResult* r) { return r->h; }
double svd_result_fps(SvdResult* r) { return r->fps; }
int64_t svd_result_nb_frames(SvdResult* r) { return r->nb_frames; }

// Decode `n_windows` [start,end] frame-index windows (2*n_windows doubles)
// in a single packet sweep. n_windows == 0 decodes the whole video.
// Exactly one of `mem` (with mem_size) or `path` must be set.
// short_side > 0 resizes so min(h,w) == short_side (only shrinks, matching
// the reference's decode-time max_spatial_scale, UNLESS a fused crop is
// active — see below — where up-scale jitter sizes are honored too).
//
// wanted/n_wanted (may be null/0): sorted unique target frame indices.
// Only the FIRST decoded frame at-or-after each target is emitted —
// exactly the python-side linspace selection (decoder._sample_positions:
// searchsorted of floor(targets) over kept indices), so the sws_scale +
// memcpy cost of frames the sampler would drop is never paid.
//
// crop_w/crop_h > 0 fuse the train-time random crop INTO the scale: the
// output is exactly (crop_w, crop_h) per frame, produced by one
// sws_scale from the matching source sub-rectangle (chroma-aligned).
// crop_fx/crop_fy in [0,1] place the crop within the valid range of the
// SCALED image, matching the host path's uniform crop draw. Unsupported
// pixel formats or undersized frames fall back to the plain scale path
// (the caller detects via the result dims and crops on host).
// err: 0 ok; negative AVERROR or small positive internal code.
SvdResult* svd_decode2(const uint8_t* mem, int64_t mem_size, const char* path,
                       const double* windows, int n_windows, int short_side,
                       const int64_t* wanted, int n_wanted,
                       int crop_w, int crop_h, double crop_fx, double crop_fy,
                       int* err) {
  *err = 0;
  AVFormatContext* fmt = avformat_alloc_context();
  AVIOContext* avio = nullptr;
  MemCtx mctx{mem, mem_size, 0};
  uint8_t* avio_buf = nullptr;
  if (mem != nullptr) {
    const int kBuf = 1 << 16;
    avio_buf = static_cast<uint8_t*>(av_malloc(kBuf));
    avio = avio_alloc_context(avio_buf, kBuf, 0, &mctx, mem_read, nullptr,
                              mem_seek);
    fmt->pb = avio;
    fmt->flags |= AVFMT_FLAG_CUSTOM_IO;
  }
  auto fail = [&](int code) -> SvdResult* {
    *err = code;
    if (fmt) avformat_close_input(&fmt);
    if (avio) {
      av_freep(&avio->buffer);
      avio_context_free(&avio);
    }
    return nullptr;
  };

  int rc = avformat_open_input(&fmt, mem ? nullptr : path, nullptr, nullptr);
  if (rc < 0) { // avformat_open_input frees fmt on failure
    fmt = nullptr;
    return fail(rc);
  }
  if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) return fail(rc);

  int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vs < 0) return fail(vs);
  AVStream* st = fmt->streams[vs];

  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) return fail(1);
  AVCodecContext* cc = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(cc, st->codecpar);
  cc->thread_count = 0;  // auto
  if ((rc = avcodec_open2(cc, dec, nullptr)) < 0) {
    avcodec_free_context(&cc);
    return fail(rc);
  }

  AVRational fr = av_guess_frame_rate(fmt, st, nullptr);
  double fps = (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 30.0;
  double tb = av_q2d(st->time_base);
  int64_t start_time = (st->start_time == AV_NOPTS_VALUE) ? 0 : st->start_time;
  int64_t nb_frames = st->nb_frames;
  if (nb_frames <= 0 && st->duration != AV_NOPTS_VALUE)
    nb_frames = llround(st->duration * tb * fps);
  if (nb_frames <= 0 && fmt->duration != AV_NOPTS_VALUE)
    nb_frames = llround(fmt->duration / (double)AV_TIME_BASE * fps);

  // Window bounds in integer frame indices; merged + sorted so the sweep
  // can skip-seek across large gaps between windows instead of decoding
  // through them.
  int64_t min_f = 0, max_f = INT64_MAX;
  std::vector<std::pair<int64_t, int64_t>> wins;
  if (n_windows > 0) {
    std::vector<std::pair<int64_t, int64_t>> raw;
    for (int i = 0; i < n_windows; i++) {
      int64_t s = (int64_t)floor(windows[2 * i]);
      int64_t e = (int64_t)ceil(windows[2 * i + 1]);
      if (s < 0) s = 0;
      raw.emplace_back(s, e);
    }
    std::sort(raw.begin(), raw.end());
    for (auto& w : raw) {
      if (!wins.empty() && w.first <= wins.back().second + 1) {
        if (w.second > wins.back().second) wins.back().second = w.second;
      } else {
        wins.push_back(w);
      }
    }
    min_f = wins.front().first;
    max_f = wins.back().second;
    // Exact seek: jump to the keyframe at-or-before the window start, then
    // decode forward and drop frames before the window (PyAV-seek
    // semantics, reference decoder.py:186-225).
    int64_t target_pts = start_time + (int64_t)llround(min_f / fps / tb);
    av_seek_frame(fmt, vs, target_pts, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(cc);
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  SwsContext* sws = nullptr;
  int out_w = -1, out_h = -1, sws_in_w = -1, sws_in_h = -1;
  int sws_in_fmt = -1;

  // Frames are written by sws_scale DIRECTLY into the final result buffer:
  // host memcpy bandwidth is the bottleneck on small loader hosts, so no
  // intermediate staging vector (each extra copy of a (N,H,W,3) buffer is
  // pure loss).
  uint8_t* out = nullptr;
  size_t out_cap = 0, out_len = 0;
  std::vector<int64_t> idxs;
  bool done = false;
  bool oom = false;
  size_t cur_win = 0;
  int wptr = 0;  // next un-emitted entry of `wanted`
  // Fused-crop state, resolved on the first decoded frame.
  bool crop_active = false;
  int src_x = 0, src_y = 0, src_w = -1, src_h = -1;
  int sub_x = 0, sub_y = 0;
  int64_t want_seek = -1;
  int64_t last_seek_target = min_f;
  // Gap (frames) beyond which re-seeking beats decoding through; ~1 GOP
  // at typical web-video keyframe intervals.
  const int64_t kSeekGap = 16;
  // Last in-window frame dropped by the `wanted` filter: if the window
  // closes (or the stream ends) with targets still pending — nb_frames
  // overestimated the decodable count, or rounding placed a target past
  // the last in-window frame — this frame is emitted so the host-side
  // clip-to-last-kept selection duplicates it, matching the legacy
  // full-window decode. av_frame_clone is refcounted (no pixel copy).
  AVFrame* held = nullptr;
  int64_t held_idx = -1;

  // Crop source rectangle for the current input dims (chroma-aligned,
  // in-bounds). Called at crop activation and again if the stream changes
  // resolution mid-decode (the output stays (crop_w, crop_h); a frame too
  // small to cover the crop falls back to reading the whole frame).
  auto compute_crop_rect = [&](const AVFrame* f) {
    int short_in = f->width < f->height ? f->width : f->height;
    double sc = (double)short_side / short_in;  // up-scales too
    int scaled_w = (int)lround(f->width * sc);
    int scaled_h = (int)lround(f->height * sc);
    if (scaled_w < crop_w || scaled_h < crop_h) {
      src_x = 0; src_y = 0; src_w = f->width; src_h = f->height;
      return;
    }
    double inv = 1.0 / sc;
    int cx_s = (int)lround(crop_fx * (scaled_w - crop_w));
    int cy_s = (int)lround(crop_fy * (scaled_h - crop_h));
    src_x = ((int)lround(cx_s * inv)) & ~((1 << sub_x) - 1);
    src_y = ((int)lround(cy_s * inv)) & ~((1 << sub_y) - 1);
    src_w = (int)lround(crop_w * inv);
    src_h = (int)lround(crop_h * inv);
    if (src_w < 1) src_w = 1;
    if (src_h < 1) src_h = 1;
    if (src_w > f->width) src_w = f->width;
    if (src_h > f->height) src_h = f->height;
    // Boundary clamps must preserve the chroma alignment applied above
    // (an unaligned offset skews chroma sampling at right/bottom-edge
    // crops); & ~mask rounds down, so the rectangle stays in bounds.
    if (src_x + src_w > f->width)
      src_x = (f->width - src_w) & ~((1 << sub_x) - 1);
    if (src_y + src_h > f->height)
      src_y = (f->height - src_h) & ~((1 << sub_y) - 1);
    if (src_x < 0) src_x = 0;
    if (src_y < 0) src_y = 0;
  };

  auto emit = [&](AVFrame* f, int64_t fidx) {
    if (out_w < 0) {
      // Fused crop: one sws_scale from the source sub-rectangle straight
      // to (crop_w, crop_h). Only 8-bit planar YUV / gray (the universal
      // web-video formats); anything else falls back to the plain path.
      if (crop_w > 0 && crop_h > 0 && short_side > 0) {
        const AVPixFmtDescriptor* d =
            av_pix_fmt_desc_get((AVPixelFormat)f->format);
        bool fmt_ok =
            d != nullptr && d->nb_components <= 3 && d->comp[0].depth == 8 &&
            !(d->flags & (AV_PIX_FMT_FLAG_RGB | AV_PIX_FMT_FLAG_BITSTREAM |
                          AV_PIX_FMT_FLAG_PAL | AV_PIX_FMT_FLAG_HWACCEL)) &&
            (d->nb_components == 1 || (d->flags & AV_PIX_FMT_FLAG_PLANAR));
        if (fmt_ok) {
          int short_in = f->width < f->height ? f->width : f->height;
          double sc = (double)short_side / short_in;  // up-scales too
          int scaled_w = (int)lround(f->width * sc);
          int scaled_h = (int)lround(f->height * sc);
          if (scaled_w >= crop_w && scaled_h >= crop_h) {
            sub_x = d->log2_chroma_w;
            sub_y = d->log2_chroma_h;
            crop_active = true;
            out_w = crop_w;
            out_h = crop_h;
            compute_crop_rect(f);
          }
        }
      }
      if (!crop_active) {
        out_w = f->width;
        out_h = f->height;
        if (short_side > 0) {
          int short_in = f->width < f->height ? f->width : f->height;
          if (short_in > short_side) {
            double sc = (double)short_side / short_in;
            out_w = (int)lround(f->width * sc);
            out_h = (int)lround(f->height * sc);
          }
        }
      }
    }
    if (!sws || f->width != sws_in_w || f->height != sws_in_h ||
        f->format != sws_in_fmt) {
      if (sws) {
        sws_freeContext(sws);
        // Mid-stream resolution change: the source rectangle computed for
        // the first frame's dims may read out of bounds on the new dims —
        // recompute it before rebuilding the scaler.
        if (crop_active) compute_crop_rect(f);
      }
      sws = sws_getContext(crop_active ? src_w : f->width,
                           crop_active ? src_h : f->height,
                           (AVPixelFormat)f->format,
                           out_w, out_h, AV_PIX_FMT_RGB24,
                           SWS_FAST_BILINEAR, nullptr,
                           nullptr, nullptr);
      sws_in_w = f->width;
      sws_in_h = f->height;
      sws_in_fmt = f->format;
    }
    size_t frame_bytes = (size_t)out_w * out_h * 3;
    if (out == nullptr && !oom) {
      // Allocate the expected total up front; growth would copy.
      int64_t expect = 0;
      if (n_wanted > 0)
        expect = n_wanted;
      else if (n_windows > 0)
        for (auto& w : wins) expect += w.second - w.first + 1;
      else
        expect = nb_frames > 0 ? nb_frames : 64;
      out_cap = (size_t)(expect + 8) * frame_bytes;
      out = static_cast<uint8_t*>(malloc(out_cap));
      if (out == nullptr) { oom = true; done = true; return; }
      idxs.reserve(expect + 8);
    }
    if (oom) { done = true; return; }
    if (out_len + frame_bytes > out_cap) {
      out_cap = (out_cap * 3) / 2 + frame_bytes;
      uint8_t* grown = static_cast<uint8_t*>(realloc(out, out_cap));
      if (grown == nullptr) {
        // keep `out` so cleanup frees it; surface a catchable error
        oom = true;
        done = true;
        return;
      }
      out = grown;
    }
    uint8_t* dst[1] = {out + out_len};
    int dst_ls[1] = {out_w * 3};
    if (crop_active) {
      // Offset each plane pointer to the (chroma-aligned) crop origin;
      // linesizes are unchanged, sws reads src_h rows of src_w pixels.
      const uint8_t* src_data[4] = {nullptr, nullptr, nullptr, nullptr};
      for (int p = 0; p < 4; p++) {
        if (f->data[p] == nullptr) continue;
        int px = p == 1 || p == 2 ? src_x >> sub_x : src_x;
        int py = p == 1 || p == 2 ? src_y >> sub_y : src_y;
        src_data[p] = f->data[p] + (ptrdiff_t)py * f->linesize[p] + px;
      }
      sws_scale(sws, src_data, f->linesize, 0, src_h, dst, dst_ls);
    } else {
      sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_ls);
    }
    out_len += frame_bytes;
    idxs.push_back(fidx);
  };

  auto drop_held = [&]() {
    if (held) av_frame_free(&held);
    held_idx = -1;
  };

  // A window closed (or the stream ended) with wanted targets <= win_end
  // still un-emitted: emit the held last in-window frame (the legacy path
  // would have decoded it and the host selection would duplicate it).
  auto flush_held = [&](int64_t win_end) {
    if (held == nullptr || wptr >= n_wanted || wanted[wptr] > win_end)
      return;
    if (idxs.empty() || held_idx > idxs.back()) emit(held, held_idx);
    while (wptr < n_wanted && wanted[wptr] <= win_end) wptr++;
  };

  auto handle_frame = [&](AVFrame* f) {
    int64_t pts = f->best_effort_timestamp;
    if (pts == AV_NOPTS_VALUE) pts = f->pts;
    int64_t fidx;
    if (pts == AV_NOPTS_VALUE) {
      fidx = idxs.empty() ? 0 : idxs.back() + 1;
    } else {
      fidx = llround((pts - start_time) * tb * fps);
    }
    if (n_windows > 0) {
      if (fidx > max_f) {
        flush_held(max_f);
        done = true;
        return;
      }
      while (cur_win < wins.size() && fidx > wins[cur_win].second) {
        flush_held(wins[cur_win].second);
        drop_held();
        cur_win++;
      }
      if (cur_win >= wins.size()) { done = true; return; }
      if (fidx < wins[cur_win].first) {
        // One skip-seek per window: if the keyframe lands further than the
        // gap threshold before the window, decode through rather than
        // re-seeking to the same keyframe forever.
        if (wins[cur_win].first - fidx > kSeekGap &&
            wins[cur_win].first != last_seek_target)
          want_seek = wins[cur_win].first;
        return;
      }
    }
    // A skip-seek can land on a keyframe before frames already emitted;
    // kept indices must stay strictly increasing.
    if (!idxs.empty() && fidx <= idxs.back()) return;
    if (n_wanted > 0) {
      if (wptr >= n_wanted) { done = true; return; }
      if (fidx < wanted[wptr]) {
        // The sampler would drop this frame — but hold a reference: it
        // becomes the clip tail if no at-or-after frame ever arrives.
        if (held) av_frame_free(&held);
        held = av_frame_clone(f);
        held_idx = held ? fidx : -1;
        return;
      }
      // Emit once; a frame can satisfy several targets (dropped frames),
      // which the python side re-expands into duplicates.
      while (wptr < n_wanted && wanted[wptr] <= fidx) wptr++;
    }
    emit(f, fidx);
  };

  while (!done && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vs) {
      if (avcodec_send_packet(cc, pkt) >= 0) {
        while (avcodec_receive_frame(cc, frm) >= 0 && !done) handle_frame(frm);
      }
    }
    av_packet_unref(pkt);
    if (want_seek >= 0 && !done) {
      int64_t tpts = start_time + (int64_t)llround(want_seek / fps / tb);
      av_seek_frame(fmt, vs, tpts, AVSEEK_FLAG_BACKWARD);
      avcodec_flush_buffers(cc);
      last_seek_target = want_seek;
      want_seek = -1;
    }
  }
  if (!done) {  // drain
    avcodec_send_packet(cc, nullptr);
    while (avcodec_receive_frame(cc, frm) >= 0 && !done) handle_frame(frm);
  }
  // Stream exhausted with targets still pending (container nb_frames
  // overestimated the decodable count): emit the held last in-window frame.
  if (n_wanted > 0 && wptr < n_wanted)
    flush_held(n_windows > 0
                   ? (cur_win < wins.size() ? wins[cur_win].second : max_f)
                   : INT64_MAX);
  drop_held();

  if (sws) sws_freeContext(sws);
  av_frame_free(&frm);
  av_packet_free(&pkt);
  avcodec_free_context(&cc);
  avformat_close_input(&fmt);
  if (avio) {
    av_freep(&avio->buffer);
    avio_context_free(&avio);
  }

  if (idxs.empty() || oom) {
    free(out);
    *err = oom ? 3 : 2;
    return nullptr;
  }

  SvdResult* r = static_cast<SvdResult*>(malloc(sizeof(SvdResult)));
  int64_t* fidx_buf =
      static_cast<int64_t*>(malloc(idxs.size() * sizeof(int64_t)));
  if (r == nullptr || fidx_buf == nullptr) {
    free(out);
    free(r);
    free(fidx_buf);
    *err = 3;
    return nullptr;
  }
  r->n = (int)idxs.size();
  r->w = out_w;
  r->h = out_h;
  r->fps = fps;
  r->nb_frames = nb_frames > 0 ? nb_frames : (int64_t)idxs.size();
  r->data = out;  // ownership transferred; no copy
  r->frame_idx = fidx_buf;
  memcpy(r->frame_idx, idxs.data(), idxs.size() * sizeof(int64_t));
  return r;
}

// Back-compat entry point: full-window emit, no fused crop.
SvdResult* svd_decode(const uint8_t* mem, int64_t mem_size, const char* path,
                      const double* windows, int n_windows, int short_side,
                      int* err) {
  return svd_decode2(mem, mem_size, path, windows, n_windows, short_side,
                     nullptr, 0, 0, 0, 0.0, 0.0, err);
}

// Probe stream metadata without decoding frames.
int svd_probe(const uint8_t* mem, int64_t mem_size, const char* path,
              double* fps, int64_t* nb_frames, int* w, int* h) {
  int err = 0;
  AVFormatContext* fmt = avformat_alloc_context();
  AVIOContext* avio = nullptr;
  MemCtx mctx{mem, mem_size, 0};
  if (mem != nullptr) {
    const int kBuf = 1 << 16;
    uint8_t* buf = static_cast<uint8_t*>(av_malloc(kBuf));
    avio = avio_alloc_context(buf, kBuf, 0, &mctx, mem_read, nullptr, mem_seek);
    fmt->pb = avio;
    fmt->flags |= AVFMT_FLAG_CUSTOM_IO;
  }
  int rc = avformat_open_input(&fmt, mem ? nullptr : path, nullptr, nullptr);
  if (rc < 0) {
    if (avio) {
      av_freep(&avio->buffer);
      avio_context_free(&avio);
    }
    return rc;
  }
  rc = avformat_find_stream_info(fmt, nullptr);
  int vs = rc < 0 ? rc : av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                             nullptr, 0);
  if (vs >= 0) {
    AVStream* st = fmt->streams[vs];
    AVRational fr = av_guess_frame_rate(fmt, st, nullptr);
    *fps = (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 30.0;
    double tb = av_q2d(st->time_base);
    int64_t n = st->nb_frames;
    if (n <= 0 && st->duration != AV_NOPTS_VALUE)
      n = llround(st->duration * tb * (*fps));
    if (n <= 0 && fmt->duration != AV_NOPTS_VALUE)
      n = llround(fmt->duration / (double)AV_TIME_BASE * (*fps));
    *nb_frames = n;
    *w = st->codecpar->width;
    *h = st->codecpar->height;
  } else {
    err = vs;
  }
  avformat_close_input(&fmt);
  if (avio) {
    av_freep(&avio->buffer);
    avio_context_free(&avio);
  }
  return err;
}

}  // extern "C"
