// CPU reference-baseline harness: measures the per-frame cost of the
// reference framework's FRONT-END hot loop on this host, on the exact
// synthetic MV stream the TPU bench runs (io/synthetic.py, exported by
// tools/run_baseline.py).
//
// The reference itself cannot be built in this image (g2o / Sophus /
// Pangolin / boost are absent and there is no network), so this harness
// re-executes the same per-frame WORK with the same algorithms — and, for
// the dominant solver, the SAME library call the reference makes:
//
//   - track propagation (MOVExtractor.cc:249-335 path d): per live track,
//     mvi pixel lookup (<=4 candidate MVs), 256-bit EXPRESS descriptor
//     computed at each candidate position (16x16 crop, |px - center| >
//     threshold), Hamming <= 40 acceptance — scalar C++ exactly like the
//     reference's per-crop loops;
//   - new-track seeding (path f): EXPRESS detector (prefilter + diagonal
//     slice tournament, EXPRESS.h:117-192) on unclaimed MV destination
//     blocks;
//   - PoseOptimization (Optimizer.cc:397-459): cv::solvePnPRansac with
//     USAC_MAGSAC and the TartanAir.yaml parameters — the identical OpenCV
//     entry point, run twice per frame (reference-KF solve + local-map
//     solve, Tracking.cc:796-814 / :890-945);
//   - SearchLocalPoints frustum gating (Tracking.cc:1109-1158): project +
//     bounds + distance checks over the local map;
//   - LocalBundleAdjustment cost (Optimizer.cc:461-841): 10 Levenberg
//     iterations of a robust-Huber Schur solver at the reference's local
//     problem size (g2o is absent; the Schur-complement LM implemented here
//     is the same linear algebra g2o's BlockSolver_6_3 + CSparse performs,
//     measured separately and NOT counted into track ms — the reference
//     runs LBA on the mapper thread, outside its results.txt timing).
//
// Timing protocol matches mono_video_tartan.cc:73-93 / results.txt: the
// mean per-frame TrackMonocular wall time, with decode-side work (mvi
// stamping — VideoDecoder.cc:330-345 runs inside NextImage) excluded.
//
// Build: tools/build_baseline_cpu.sh. Input: the binary workload written by
// tools/run_baseline.py. Output: one JSON line with mean_track_ms,
// effective fps, and lba_ms_per_iter.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include <opencv2/calib3d.hpp>
#include <opencv2/core.hpp>

namespace {

constexpr int B = 16;          // macroblock
constexpr int NSL = 2 * B - 1; // 31 diagonals per orientation
constexpr int ROUNDS = 8;      // required streak (25% of 31, EXPRESS.h)
constexpr int PRECHECK = 32;   // 12.5% of 256 extreme pixels
constexpr int HAM_MAX = 40;    // acceptance (MOVExtractor.cc:316)

struct Workload {
  int n_frames = 0, W = 0, H = 0;
  std::vector<std::vector<uint8_t>> gray;
  std::vector<std::vector<float>> mv;   // n*7: dx,dy,x0,y0,x1,y1,dindx
  std::vector<std::vector<float>> kps;  // n*4: x,y,w,h
  std::vector<std::array<double, 12>> gt;  // R(9) + t(3) camera-from-world
  std::vector<std::array<double, 3>> pts;  // world points
  double fx, fy, cx, cy;
};

bool load(const char* path, Workload& w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  int32_t hdr[3];
  if (fread(hdr, 4, 3, f) != 3) return false;
  w.n_frames = hdr[0];
  w.H = hdr[1];
  w.W = hdr[2];
  double cam[4];
  if (fread(cam, 8, 4, f) != 4) return false;
  w.fx = cam[0]; w.fy = cam[1]; w.cx = cam[2]; w.cy = cam[3];
  int32_t n_pts;
  if (fread(&n_pts, 4, 1, f) != 1) return false;
  w.pts.resize(n_pts);
  for (auto& p : w.pts)
    if (fread(p.data(), 8, 3, f) != 3) return false;
  w.gray.resize(w.n_frames);
  w.mv.resize(w.n_frames);
  w.kps.resize(w.n_frames);
  w.gt.resize(w.n_frames);
  for (int k = 0; k < w.n_frames; ++k) {
    if (fread(w.gt[k].data(), 8, 12, f) != 12) return false;
    w.gray[k].resize((size_t)w.W * w.H);
    if (fread(w.gray[k].data(), 1, w.gray[k].size(), f) != w.gray[k].size())
      return false;
    int32_t nmv, nkp;
    if (fread(&nmv, 4, 1, f) != 1) return false;
    w.mv[k].resize((size_t)nmv * 7);
    if (nmv && fread(w.mv[k].data(), 4, w.mv[k].size(), f) != w.mv[k].size())
      return false;
    if (fread(&nkp, 4, 1, f) != 1) return false;
    w.kps[k].resize((size_t)nkp * 4);
    if (nkp && fread(w.kps[k].data(), 4, w.kps[k].size(), f) != w.kps[k].size())
      return false;
  }
  fclose(f);
  return true;
}

// --- EXPRESS (scalar, per-crop — the reference's own compute shape) --------
using Desc = std::array<uint32_t, 8>;

inline float center_of(const uint8_t* img, int Wd, int x0, int y0) {
  float s = img[(y0 + 7) * Wd + x0 + 7] + img[(y0 + 7) * Wd + x0 + 8] +
            img[(y0 + 8) * Wd + x0 + 7] + img[(y0 + 8) * Wd + x0 + 8];
  return std::floor(s / 4.f);
}

// extreme mask + packed descriptor; returns number of extreme pixels.
inline int compute_desc(const uint8_t* img, int Wd, int Hd, int cx, int cy,
                        float thr, Desc& d) {
  int x0 = cx - 8, y0 = cy - 8;
  if (x0 < 0) x0 = 0;
  if (y0 < 0) y0 = 0;
  if (x0 > Wd - B) x0 = Wd - B;
  if (y0 > Hd - B) y0 = Hd - B;
  float c = center_of(img, Wd, x0, y0);
  d.fill(0);
  int n_ex = 0;
  for (int r = 0; r < B; ++r) {
    const uint8_t* row = img + (y0 + r) * Wd + x0;
    for (int q = 0; q < B; ++q) {
      float p = row[q];
      if (p < c - thr || p > c + thr) {
        int bit = r * B + q;
        d[bit >> 5] |= 1u << (bit & 31);
        ++n_ex;
      }
    }
  }
  return n_ex;
}

inline int hamming(const Desc& a, const Desc& b) {
  int h = 0;
  for (int i = 0; i < 8; ++i) h += __builtin_popcount(a[i] ^ b[i]);
  return h;
}

// diagonal slice tournament (EXPRESS.h:117-192 semantics).
bool express_pass(const Desc& d, int n_ex) {
  if (n_ex < PRECHECK) return false;
  for (int orient = 0; orient < 2; ++orient) {
    int win_streak = 0, loss_streak = 0;
    bool ok_win = false, ok_loss = false;
    for (int s = 0; s < NSL; ++s) {
      int len = 0, ex = 0;
      for (int r = 0; r < B; ++r) {
        int q = orient == 0 ? r + s - (B - 1) : s - r;
        if (q < 0 || q >= B) continue;
        ++len;
        int bit = r * B + q;
        ex += (d[bit >> 5] >> (bit & 31)) & 1;
      }
      bool win = 2 * ex >= len;
      win_streak = win ? win_streak + 1 : 0;
      loss_streak = win ? 0 : loss_streak + 1;
      ok_win |= win_streak >= ROUNDS;
      ok_loss |= loss_streak >= ROUNDS;
    }
    if (ok_win && ok_loss) return true;
  }
  return false;
}

struct Track {
  float x, y;
  Desc d;
  int age;
};

// mvi: per-pixel <=4 MV-record slots (VideoDecoder.cc:330-345). Built on the
// DECODE side in the reference — excluded from track timing.
struct Mvi {
  std::vector<int32_t> idx;  // H*W*4
  int W, H;
  void build(const Workload& w, int k) {
    W = w.W;
    H = w.H;
    idx.assign((size_t)W * H * 4, -1);
    const auto& mv = w.mv[k];
    int n = mv.size() / 7;
    for (int i = 0; i < n; ++i) {
      int x0 = (int)mv[i * 7 + 2], y0 = (int)mv[i * 7 + 3];
      int x1 = (int)mv[i * 7 + 4], y1 = (int)mv[i * 7 + 5];
      for (int y = std::max(0, y0); y <= std::min(H - 1, y1); ++y)
        for (int x = std::max(0, x0); x <= std::min(W - 1, x1); ++x) {
          int32_t* s = &idx[((size_t)y * W + x) * 4];
          for (int j = 0; j < 4; ++j)
            if (s[j] < 0) {
              s[j] = i;
              break;
            }
        }
    }
  }
};

}  // namespace

int main(int argc, char** argv) {
  const char* in = argc > 1 ? argv[1] : "/tmp/baseline_workload.bin";
  float thr = 25.f;  // MOVExtractor threshold (TartanAir.yaml)
  int pnp_iters = 100, warm = 8;
  double reproj = 5.0, conf = 0.98;  // Optimizer section, TartanAir.yaml

  Workload w;
  if (!load(in, w)) {
    fprintf(stderr, "failed to load %s (run tools/run_baseline.py)\n", in);
    return 1;
  }

  cv::Mat K = (cv::Mat_<double>(3, 3) << w.fx, 0, w.cx, 0, w.fy, w.cy, 0, 0, 1);
  std::mt19937 rng(12345);
  std::normal_distribution<double> px_noise(0.0, 0.5);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  // Cold start: dense-grid EXPRESS detection on frame 0 (path b).
  std::vector<Track> tracks;
  {
    const uint8_t* img = w.gray[0].data();
    for (int cy = 8; cy < w.H - 8; cy += B)
      for (int cx = 8; cx < w.W - 8; cx += B) {
        Desc d;
        int n_ex = compute_desc(img, w.W, w.H, cx, cy, thr, d);
        if (express_pass(d, n_ex))
          tracks.push_back({(float)cx, (float)cy, d, 0});
      }
  }

  Mvi mvi;
  double total_ms = 0, lba_ms_total = 0;
  int timed_frames = 0, lba_runs = 0, total_tracks = 0;
  double pnp_ms = 0, prop_ms = 0;

  for (int k = 1; k < w.n_frames; ++k) {
    mvi.build(w, k);  // decode-side (NextImage) — untimed
    const uint8_t* img = w.gray[k].data();

    auto t0 = std::chrono::steady_clock::now();

    // --- path (d): MV track propagation -------------------------------
    std::vector<char> claimed_kp(w.kps[k].size() / 4, 0);
    size_t kept = 0;
    for (auto& t : tracks) {
      int xi = (int)t.x, yi = (int)t.y;
      if (xi < 0 || yi < 0 || xi >= w.W || yi >= w.H) continue;
      const int32_t* s = &mvi.idx[((size_t)yi * w.W + xi) * 4];
      int best = HAM_MAX + 1, best_i = -1;
      float bx = 0, by = 0;
      Desc bd;
      for (int j = 0; j < 4 && s[j] >= 0; ++j) {
        const float* m = &w.mv[k][(size_t)s[j] * 7];
        float nx = t.x + m[0], ny = t.y + m[1];
        if (nx < 8 || ny < 8 || nx >= w.W - 8 || ny >= w.H - 8) continue;
        Desc d;
        compute_desc(img, w.W, w.H, (int)nx, (int)ny, thr, d);
        int h = hamming(t.d, d);
        if (h < best) {
          best = h;
          best_i = s[j];
          bx = nx;
          by = ny;
          bd = d;
        }
      }
      if (best_i >= 0 && best <= HAM_MAX) {
        t.x = bx;
        t.y = by;
        t.d = bd;
        ++t.age;
        // claim the destination block this chain record terminates at
        // (MOVExtractor.cc:380-416: path f seeds only UNCLAIMED blocks)
        int di = (int)w.mv[k][(size_t)best_i * 7 + 6];
        if (di >= 0 && di < (int)claimed_kp.size()) claimed_kp[di] = 1;
        tracks[kept++] = t;
      }
    }
    tracks.resize(kept);
    auto t1 = std::chrono::steady_clock::now();

    // --- path (f): new tracks from unclaimed destination blocks --------
    int n_kp = w.kps[k].size() / 4;
    for (int i = 0; i < n_kp; ++i) {
      if (claimed_kp[i]) continue;
      float x = w.kps[k][i * 4] + w.kps[k][i * 4 + 2] * 0.5f;
      float y = w.kps[k][i * 4 + 1] + w.kps[k][i * 4 + 3] * 0.5f;
      if (x < 8 || y < 8 || x >= w.W - 8 || y >= w.H - 8) continue;
      Desc d;
      int n_ex = compute_desc(img, w.W, w.H, (int)x, (int)y, thr, d);
      if (express_pass(d, n_ex)) tracks.push_back({x, y, d, 0});
    }

    // --- PoseOptimization x2 (cv::solvePnPRansac, USAC_MAGSAC) ---------
    // Problem built from the stream's ground truth at the frame's real
    // match count: GT points projected through the GT pose + 0.5 px noise,
    // 25% gross outliers — the workload shape Tracking.cc feeds it.
    const auto& G = w.gt[k];
    cv::Matx33d R(G[0], G[1], G[2], G[3], G[4], G[5], G[6], G[7], G[8]);
    cv::Vec3d t(G[9], G[10], G[11]);
    // Matches are tracks WITH map points: the reference's steady state on
    // this stream associates a few hundred to ~1k (bounded by the visible
    // local map, Tracking.cc:890-945), not every live track.
    int n_match = std::min<int>((int)tracks.size() / 2, 1000);
    auto run_pnp = [&](int n) {
      std::vector<cv::Point3d> obj;
      std::vector<cv::Point2d> imgp;
      obj.reserve(n);
      imgp.reserve(n);
      int np = w.pts.size();
      for (int i = 0; i < n; ++i) {
        const auto& P = w.pts[(i * 2654435761u) % np];
        cv::Vec3d pw(P[0], P[1], P[2]);
        cv::Vec3d pc = R * pw + t;
        if (pc[2] < 0.5) continue;
        double u = w.fx * pc[0] / pc[2] + w.cx + px_noise(rng);
        double v = w.fy * pc[1] / pc[2] + w.cy + px_noise(rng);
        if (uni(rng) < 0.25) {  // gross outlier
          u = uni(rng) * w.W;
          v = uni(rng) * w.H;
        }
        obj.emplace_back(pw[0], pw[1], pw[2]);
        imgp.emplace_back(u, v);
      }
      if ((int)obj.size() < 6) return;
      cv::Mat rvec, tvec, inl;
      cv::solvePnPRansac(obj, imgp, K, cv::noArray(), rvec, tvec, false,
                         pnp_iters, (float)reproj, conf, inl,
                         cv::USAC_MAGSAC);
    };
    auto t2 = std::chrono::steady_clock::now();
    run_pnp(n_match);            // TrackReferenceKeyFrame solve
    run_pnp(std::min(n_match * 3 / 2, 1500));  // TrackLocalMap solve
    auto t3 = std::chrono::steady_clock::now();

    // --- SearchLocalPoints frustum gating ------------------------------
    int n_local = std::min<int>((int)w.pts.size() * 2, 1200);
    volatile int in_frustum = 0;
    for (int i = 0; i < n_local; ++i) {
      const auto& P = w.pts[i % w.pts.size()];
      cv::Vec3d pc = R * cv::Vec3d(P[0], P[1], P[2]) + t;
      if (pc[2] < 0.1) continue;
      double u = w.fx * pc[0] / pc[2] + w.cx;
      double v = w.fy * pc[1] / pc[2] + w.cy;
      double dist = cv::norm(pc);
      if (u >= 0 && u < w.W && v >= 0 && v < w.H && dist > 0.2 && dist < 80)
        ++in_frustum;
    }

    auto t4 = std::chrono::steady_clock::now();
    if (k >= warm) {
      total_ms += std::chrono::duration<double, std::milli>(t4 - t0).count();
      prop_ms += std::chrono::duration<double, std::milli>(t1 - t0).count();
      pnp_ms += std::chrono::duration<double, std::milli>(t3 - t2).count();
      ++timed_frames;
      total_tracks += tracks.size();
    }
  }

  // --- LocalBundleAdjustment cost (measured separately; mapper thread) ---
  // Reference local problem (Optimizer.cc:463-523 at steady state on this
  // stream): ~16 optimizable KFs, ~1200 points, ~5 obs/point. 10 LM
  // iterations of robust-Huber Schur (BlockSolver_6_3 linear algebra).
  {
    int Kf = 16, P = 1200, opf = 5;
    std::vector<std::array<double, 6>> kf_pose(Kf, {0, 0, 0, 0, 0, 0});
    std::vector<cv::Vec3d> pw(P);
    for (int i = 0; i < P; ++i) {
      const auto& q = w.pts[i % w.pts.size()];
      pw[i] = {q[0] + uni(rng) * 0.05, q[1], q[2]};
    }
    for (int rep = 0; rep < 3; ++rep) {
      auto t0 = std::chrono::steady_clock::now();
      for (int it = 0; it < 10; ++it) {
        // H blocks: Hpp (6Kx6K dense via Schur), Hll (3x3 per point)
        cv::Mat Hcc = cv::Mat::zeros(6 * Kf, 6 * Kf, CV_64F);
        cv::Mat bc = cv::Mat::zeros(6 * Kf, 1, CV_64F);
        std::vector<cv::Matx33d> Hll(P, cv::Matx33d::zeros());
        std::vector<cv::Vec3d> bl(P, {0, 0, 0});
        std::vector<std::vector<std::pair<int, cv::Matx<double, 6, 3>>>> Hcl(
            Kf);
        for (int i = 0; i < P; ++i) {
          for (int o = 0; o < opf; ++o) {
            int kf = (i + o) % Kf;
            // projective Jacobians at the current linearization point
            cv::Vec3d pc = pw[i] + cv::Vec3d(kf_pose[kf][3], kf_pose[kf][4],
                                             kf_pose[kf][5]);
            double z = std::max(pc[2], 0.5), iz = 1.0 / z, iz2 = iz * iz;
            cv::Matx<double, 2, 3> Jl(w.fx * iz, 0, -w.fx * pc[0] * iz2, 0,
                                      w.fy * iz, -w.fy * pc[1] * iz2);
            cv::Matx<double, 2, 6> Jc;
            for (int a = 0; a < 2; ++a)
              for (int b2 = 0; b2 < 3; ++b2) {
                Jc(a, b2 + 3) = Jl(a, b2);
                Jc(a, b2) = Jl(a, (b2 + 1) % 3) * pc[(b2 + 2) % 3];
              }
            cv::Vec2d r2(px_noise(rng), px_noise(rng));
            double chi2 = r2.dot(r2), hw = chi2 > 5.0 ? sqrt(5.0 / chi2) : 1.0;
            cv::Matx66d Hc = (Jc.t() * Jc) * hw;
            cv::Matx33d Hl = (Jl.t() * Jl) * hw;
            for (int a = 0; a < 6; ++a)
              for (int b2 = 0; b2 < 6; ++b2)
                Hcc.at<double>(kf * 6 + a, kf * 6 + b2) += Hc(a, b2);
            Hll[i] += Hl;
            cv::Vec<double, 6> g = Jc.t() * r2 * hw;
            for (int a = 0; a < 6; ++a) bc.at<double>(kf * 6 + a) += g[a];
            bl[i] += Jl.t() * r2 * hw;
            Hcl[kf].push_back({i, Jc.t() * Jl * hw});
          }
        }
        // Schur: Hcc -= Hcl Hll^-1 Hlc ; bc -= Hcl Hll^-1 bl
        std::vector<cv::Matx33d> Hinv(P);
        for (int i = 0; i < P; ++i)
          Hinv[i] = (Hll[i] + cv::Matx33d::eye() * 1e-3).inv();
        for (int kf = 0; kf < Kf; ++kf)
          for (auto& [i, W63] : Hcl[kf]) {
            cv::Matx66d D = W63 * Hinv[i] * W63.t();
            for (int a = 0; a < 6; ++a)
              for (int b2 = 0; b2 < 6; ++b2)
                Hcc.at<double>(kf * 6 + a, kf * 6 + b2) -= D(a, b2);
            cv::Vec<double, 6> d2 = W63 * (Hinv[i] * bl[i]);
            for (int a = 0; a < 6; ++a) bc.at<double>(kf * 6 + a) -= d2[a];
          }
        for (int a = 0; a < 6 * Kf; ++a) Hcc.at<double>(a, a) += 1e-3;
        cv::Mat dx;
        cv::solve(Hcc, bc, dx, cv::DECOMP_CHOLESKY);
        for (int kf = 0; kf < Kf; ++kf)
          for (int a = 0; a < 6; ++a)
            kf_pose[kf][a] -= 0.5 * dx.at<double>(kf * 6 + a);
        // landmark backsubstitution
        for (int i = 0; i < P; ++i) {
          cv::Vec3d di = Hinv[i] * bl[i];
          pw[i] -= 0.1 * di;
        }
      }
      lba_ms_total +=
          std::chrono::duration<double, std::milli>(
              std::chrono::steady_clock::now() - t0)
              .count();
      ++lba_runs;
    }
  }

  double mean_ms = total_ms / std::max(timed_frames, 1);
  double lba_ms = lba_ms_total / std::max(lba_runs, 1);
  printf(
      "{\"mean_track_ms\": %.3f, \"fps\": %.2f, \"prop_ms\": %.3f, "
      "\"pnp_ms\": %.3f, \"lba_ms\": %.2f, \"lba_ms_per_iter\": %.3f, "
      "\"frames\": %d, \"mean_tracks\": %.0f}\n",
      mean_ms, 1000.0 / mean_ms, prop_ms / std::max(timed_frames, 1),
      pnp_ms / std::max(timed_frames, 1), lba_ms, lba_ms / 10.0,
      timed_frames, (double)total_tracks / std::max(timed_frames, 1));
  return 0;
}
