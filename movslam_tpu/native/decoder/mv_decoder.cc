// mv_decoder: H.264 motion-vector harvesting decoder (C ABI for ctypes).
//
// Native equivalent of the reference's VideoDecoder
// (/root/reference/src/VideoDecoder.cc): opens a file / MPEG-TS / tcp://
// stream with motion-vector export enabled, maintains a lookahead queue, and
// converts per-macroblock motion vectors into
//   - per-hop deltas (dst - src) / (ref + 1),
//   - clamped inclusive source rectangles (what the reference stamped into
//     its per-pixel `mvi` index image — the TPU side replaces that with a
//     batched point-in-rect join),
//   - destination keypoint blocks with back-pointers (dIndx),
//   - frame MV coverage.
//
// Note: stock FFmpeg's AVMotionVector carries no reference-frame index (the
// reference patches FFmpeg to add `int32_t ref`,
// /root/reference/ffmpeg-ref-patch.patch:122-129). Against an unpatched
// libavcodec every MV is treated as ref=0 (exact for streams encoded with
// ref=1, e.g. the TartanAir mono operating point). The hop-decomposition
// loop is kept so a patched FFmpeg only needs MV_REF_FIELD defined.
//
// Build: see build.sh (g++ -shared, links libavformat/avcodec/avutil/swscale).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/motion_vector.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

constexpr int kMaxMvs = 4096;
constexpr int kMaxKps = 2048;

struct QueuedFrame {
  int32_t frame_no = 0;
  int32_t ft = 1;  // 0=I, 1=P, 2=B
  double timestamp = 0.0;
  float coverage = 0.f;
  std::vector<uint8_t> gray;
  std::vector<float> mv_delta;   // n_mvs * 2
  std::vector<float> mv_rect;    // n_mvs * 4 (x0, y0, x1, y1 inclusive)
  std::vector<int32_t> mv_dindx; // n_mvs
  std::vector<float> kps_rect;   // n_kps * 4 (x, y, w, h)
  int32_t n_mvs = 0;
  int32_t n_kps = 0;

  void add_kp(float x, float y, float w, float h, int32_t* out_idx) {
    *out_idx = -1;
    if (n_kps >= kMaxKps) return;
    kps_rect.insert(kps_rect.end(), {x, y, w, h});
    *out_idx = n_kps++;
  }
  void add_mv(float dx, float dy, float x0, float y0, float x1, float y1,
              int32_t dindx) {
    if (n_mvs >= kMaxMvs) return;
    mv_delta.insert(mv_delta.end(), {dx, dy});
    mv_rect.insert(mv_rect.end(), {x0, y0, x1, y1});
    mv_dindx.push_back(dindx);
    ++n_mvs;
  }
};

}  // namespace

extern "C" {

// Flat frame view handed to Python; buffers owned by the decoder and valid
// until the next mvdec_next / mvdec_close call.
typedef struct {
  int32_t width, height, frame_no, ft;
  double timestamp;
  float coverage;
  const uint8_t* gray;
  int32_t n_mvs, n_kps;
  const float* mv_delta;
  const float* mv_rect;
  const int32_t* mv_dindx;
  const float* kps_rect;
} MvFrameView;

struct MvDecoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVPacket* packet = nullptr;
  AVFrame* frame = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int width = 0, height = 0;
  double fps = 30.0;
  int frames = 0;
  size_t qlen = 12;
  bool eof = false;
  std::deque<std::unique_ptr<QueuedFrame>> queue;
  std::unique_ptr<QueuedFrame> current;  // last popped (buffers alive)
  MvFrameView view{};
  char err[256] = {0};
};

static void set_err(MvDecoder* d, const char* msg) {
  snprintf(d->err, sizeof(d->err), "%s", msg);
}

MvDecoder* mvdec_open(const char* url, int qlen) {
  auto d = new MvDecoder();
  d->qlen = qlen > 0 ? (size_t)qlen : 12;
  avformat_network_init();

  if (avformat_open_input(&d->fmt, url, nullptr, nullptr) < 0) {
    set_err(d, "failed to open input");
    return d;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    set_err(d, "failed to find stream info");
    return d;
  }
  const AVCodec* dec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_index < 0 || !dec) {
    set_err(d, "no video stream");
    return d;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  // Export motion vectors from the decoder (VideoDecoder.cc:52).
  AVDictionary* opts = nullptr;
  av_dict_set(&opts, "flags2", "+export_mvs", 0);
  if (avcodec_open2(d->codec, dec, &opts) < 0) {
    set_err(d, "failed to open codec");
    av_dict_free(&opts);
    return d;
  }
  av_dict_free(&opts);
  d->width = d->codec->width;
  d->height = d->codec->height;
  if (st->avg_frame_rate.den > 0)
    d->fps = av_q2d(st->avg_frame_rate);
  d->packet = av_packet_alloc();
  d->frame = av_frame_alloc();
  return d;
}

const char* mvdec_error(MvDecoder* d) { return d->err[0] ? d->err : nullptr; }
int mvdec_width(MvDecoder* d) { return d->width; }
int mvdec_height(MvDecoder* d) { return d->height; }
double mvdec_fps(MvDecoder* d) { return d->fps; }

static void to_gray(MvDecoder* d, AVFrame* f, std::vector<uint8_t>& out) {
  out.resize((size_t)d->width * d->height);
  d->sws = sws_getCachedContext(d->sws, f->width, f->height,
                                (AVPixelFormat)f->format, d->width, d->height,
                                AV_PIX_FMT_GRAY8, SWS_BILINEAR, nullptr,
                                nullptr, nullptr);
  uint8_t* dst[1] = {out.data()};
  int dst_stride[1] = {d->width};
  sws_scale(d->sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
}

// Convert one decoded AVFrame's MV side data into chain records distributed
// over the lookahead queue (VideoDecoder.cc:194-350 semantics).
static void process_frame(MvDecoder* d, AVFrame* f) {
  auto qf = std::make_unique<QueuedFrame>();
  qf->frame_no = ++d->frames;
  qf->ft = (f->pict_type == AV_PICTURE_TYPE_I) ? 0 : 1;
  qf->timestamp =
      f->pts != AV_NOPTS_VALUE
          ? f->pts * av_q2d(d->fmt->streams[d->stream_index]->time_base)
          : (d->frames - 1) / d->fps;
  to_gray(d, f, qf->gray);

  AVFrameSideData* sd =
      av_frame_get_side_data(f, AV_FRAME_DATA_MOTION_VECTORS);
  if (sd) {
    const int n = sd->size / sizeof(AVMotionVector);
    const auto* mvs = (const AVMotionVector*)sd->data;
    float coverage = 0.f;
    const float W = d->width, H = d->height;

    for (int i = 0; i < n; ++i) {
      const AVMotionVector& mv = mvs[i];
      // Stock FFmpeg: no ref field; single-hop (see file header).
      const int ref = 0;
      if (mv.source > 0) continue;  // B-frame forward refs: not used
                                    // (examples encode bframes=0)

      const float mb_w = mv.w, mb_h = mv.h;
      const float half_w = mb_w / 2, half_h = mb_h / 2;
      float dx = (float)(mv.dst_x - mv.src_x) / (ref + 1);
      float dy = (float)(mv.dst_y - mv.src_y) / (ref + 1);

      // Destination block, dropped when bottom/right out of range
      // (VideoDecoder.cc:236-241).
      float dst_x = mv.dst_x, dst_y = mv.dst_y;
      float d_x0 = dst_x - half_w, d_y0 = dst_y - half_h;
      if (d_x0 < 0) d_x0 = 0;
      if (d_y0 < 0) d_y0 = 0;
      if (dst_x + half_w >= W || dst_y + half_h >= H) continue;

      int32_t dindx = -1;
      qf->add_kp(d_x0, d_y0, mb_w, mb_h, &dindx);

      // Per-hop source rectangles assigned backwards over the queue
      // (VideoDecoder.cc:287-346). With ref=0 this is one record on the
      // current frame.
      for (int j = ref + 1; j > 0; --j) {
        float src_x = mv.dst_x - dx * j;
        float src_y = mv.dst_y - dy * j;
        float s_x0 = src_x - half_w, s_y0 = src_y - half_h;
        if (s_x0 < 0) s_x0 = 0;
        if (s_y0 < 0) s_y0 = 0;
        float s_x1 = src_x + half_w, s_y1 = src_y + half_h;
        if (s_x1 >= W) s_x1 = W - 1;
        if (s_y1 >= H) s_y1 = H - 1;

        QueuedFrame* target;
        if (j == 1) {
          target = qf.get();
        } else {
          size_t qi = d->queue.size() - (size_t)(j - 1);
          if (qi >= d->queue.size()) continue;
          target = d->queue[qi].get();
        }
        target->add_mv(dx, dy, s_x0, s_y0, s_x1, s_y1, j == 1 ? dindx : -1);
      }
      coverage += mb_w * mb_h;
    }
    qf->coverage = coverage / (W * H);
  }
  d->queue.push_back(std::move(qf));
}

// Pull decoded frames until the lookahead queue is full or EOF, then pop the
// oldest (VideoDecoder.cc:161-370). Returns nullptr at end of stream.
const MvFrameView* mvdec_next(MvDecoder* d) {
  if (!d->codec) return nullptr;
  while (!d->eof && d->queue.size() < d->qlen) {
    int r = av_read_frame(d->fmt, d->packet);
    if (r < 0) {
      // flush
      avcodec_send_packet(d->codec, nullptr);
      while (avcodec_receive_frame(d->codec, d->frame) >= 0)
        process_frame(d, d->frame);
      d->eof = true;
      break;
    }
    if (d->packet->stream_index == d->stream_index) {
      if (avcodec_send_packet(d->codec, d->packet) >= 0) {
        while (avcodec_receive_frame(d->codec, d->frame) >= 0)
          process_frame(d, d->frame);
      }
    }
    av_packet_unref(d->packet);
  }
  if (d->queue.empty()) return nullptr;
  d->current = std::move(d->queue.front());
  d->queue.pop_front();

  QueuedFrame* q = d->current.get();
  d->view = MvFrameView{
      d->width,
      d->height,
      q->frame_no,
      q->ft,
      q->timestamp,
      q->coverage,
      q->gray.data(),
      q->n_mvs,
      q->n_kps,
      q->mv_delta.data(),
      q->mv_rect.data(),
      q->mv_dindx.data(),
      q->kps_rect.data(),
  };
  return &d->view;
}

void mvdec_close(MvDecoder* d) {
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->packet) av_packet_free(&d->packet);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // extern "C"
