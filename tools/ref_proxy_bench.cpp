// Measured CPU baseline proxy for the reference SVO pipeline.
//
// The reference (amin-abouee/semi-direct-visual-odometry) cannot be compiled
// in this image: its REQUIRED dependencies Eigen3, Sophus, g2o and
// nlohmann_json (src/CMakeLists.txt:10-14) are not installed and the
// environment has no package installation or network egress. This program is
// the sanctioned fallback (BASELINE.md action item): it reproduces the
// reference's dominant per-frame op mix, single-threaded, with the same
// algorithmic structure and the same per-frame capacities as bench.py, so its
// frames/sec is a measured stand-in for the reference's steady-state
// throughput on this machine's CPU.
//
// Per-frame work replicated (reference citations):
//  1. dual pyramid build: gradient magnitude (Simd::AbsGradientSaturatedSum,
//     src/image_pyramid.cpp:36-52) + 3x pyrDown of both images (5x5 Gaussian,
//     2x decimate) — scalar loops, as the reference's Simd library does per
//     pixel (we do not use OpenCV so the build needs zero external deps).
//  2. sparse image alignment (src/image_alignment.cpp:25-380): 256 features,
//     4 pyramid levels; per level: per-feature 5x5-patch inverse-compositional
//     Jacobians via bilinear interpolation (:128-192), then LM iterations with
//     a residual pass (reproject + bilinear, :310-370), Tukey weights with
//     nth_element median/MAD (src/optimizer.cpp:485-514), 6x6 normal-equation
//     Cholesky solve (:279-306), SE3 exp update (:372-380).
//  3. feature alignment (src/feature_alignment.cpp:25-205): 150 matches,
//     3-param (u, v, illumination) LM on gradient patches, 10 iterations.
//  4. depth-filter updates (src/depth_estimator.cpp:192-357): 512 filters,
//     epipolar ZSSD walk (16 steps, 7x7 zero-mean SAD, src/algorithm.cpp:
//     396-551) + closed-form Gaussian×Beta fusion (:311-340).
//
// Build & run:  g++ -O3 -march=native -std=c++17 -o /tmp/ref_proxy \
//                   tools/ref_proxy_bench.cpp && /tmp/ref_proxy
// Prints one JSON line {"metric": "cpu_proxy_fps", ...}.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using std::size_t;

static constexpr int W0 = 1241, H0 = 376;  // KITTI geometry
static constexpr int LEVELS = 4;
static constexpr int N_FEATS = 256;
static constexpr int PATCH = 5, PA = PATCH * PATCH;
static constexpr int N_MATCHES = 150;
static constexpr int N_FILTERS = 512;
static constexpr int EPI_STEPS = 16;
static constexpr int FPATCH = 7, FPA = FPATCH * FPATCH;
static constexpr double FX = 721.5377, FY = 721.5377, CX = 609.5593, CY = 172.854;

struct Image {
  int w = 0, h = 0;
  std::vector<float> d;
  void init(int ww, int hh) { w = ww; h = hh; d.assign((size_t)w * h, 0.f); }
  float at(int x, int y) const { return d[(size_t)y * w + x]; }
  float& at(int x, int y) { return d[(size_t)y * w + x]; }
};

// bilinear interpolation, the reference's per-pixel primitive
// (src/algorithm.cpp:874-905)
static inline float interp(const Image& im, double x, double y) {
  int x0 = (int)x, y0 = (int)y;
  double wx = x - x0, wy = y - y0;
  const float* p = &im.d[(size_t)y0 * im.w + x0];
  return (float)((1 - wy) * ((1 - wx) * p[0] + wx * p[1]) +
                 wy * ((1 - wx) * p[im.w] + wx * p[im.w + 1]));
}

// gradient magnitude (Simd::AbsGradientSaturatedSum semantics)
static void gradient_mag(const Image& in, Image& out) {
  out.init(in.w, in.h);
  for (int y = 1; y < in.h - 1; ++y)
    for (int x = 1; x < in.w - 1; ++x) {
      float g = std::fabs(in.at(x + 1, y) - in.at(x - 1, y)) +
                std::fabs(in.at(x, y + 1) - in.at(x, y - 1));
      out.at(x, y) = std::min(g, 255.f);
    }
}

// 5x5 Gaussian blur + 2x decimation (cv::pyrDown semantics)
static void pyr_down(const Image& in, Image& out) {
  static const float k[5] = {1 / 16.f, 4 / 16.f, 6 / 16.f, 4 / 16.f, 1 / 16.f};
  Image tmp;
  tmp.init(in.w, in.h);
  for (int y = 0; y < in.h; ++y)
    for (int x = 0; x < in.w; ++x) {
      float s = 0;
      for (int i = -2; i <= 2; ++i) {
        int xx = std::clamp(x + i, 0, in.w - 1);
        s += k[i + 2] * in.at(xx, y);
      }
      tmp.at(x, y) = s;
    }
  out.init((in.w + 1) / 2, (in.h + 1) / 2);
  for (int y = 0; y < out.h; ++y)
    for (int x = 0; x < out.w; ++x) {
      float s = 0;
      for (int i = -2; i <= 2; ++i) {
        int yy = std::clamp(2 * y + i, 0, in.h - 1);
        s += k[i + 2] * tmp.at(std::min(2 * x, in.w - 1), yy);
      }
      out.at(x, y) = s;
    }
}

// --- minimal SE3 (the Sophus surface the reference touches) ---------------
struct SE3 {
  double R[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double t[3] = {0, 0, 0};
  void apply(const double p[3], double o[3]) const {
    for (int i = 0; i < 3; ++i)
      o[i] = R[3 * i] * p[0] + R[3 * i + 1] * p[1] + R[3 * i + 2] * p[2] + t[i];
  }
};

static SE3 se3_exp(const double x[6]) {  // [rho, phi]
  SE3 T;
  double th = std::sqrt(x[3] * x[3] + x[4] * x[4] + x[5] * x[5]);
  double a[3] = {x[3], x[4], x[5]};
  double K[9] = {0, -a[2], a[1], a[2], 0, -a[0], -a[1], a[0], 0};
  double s = th < 1e-9 ? 1.0 : std::sin(th) / th;
  double c = th < 1e-9 ? 0.5 : (1 - std::cos(th)) / (th * th);
  double v = th < 1e-9 ? 1.0 / 6 : (th - std::sin(th)) / (th * th * th);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double k2 = 0;
      for (int m = 0; m < 3; ++m) k2 += K[3 * i + m] * K[3 * m + j];
      T.R[3 * i + j] = (i == j) + s * K[3 * i + j] + c * k2;
      double Vij = (i == j) + c * K[3 * i + j] + v * k2;
      T.t[i] += Vij * x[j];
    }
  return T;
}

static SE3 compose(const SE3& A, const SE3& B) {  // A*B
  SE3 C;
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int m = 0; m < 3; ++m) s += A.R[3 * i + m] * B.R[3 * m + j];
      C.R[3 * i + j] = s;
    }
    C.t[i] = A.R[3 * i] * B.t[0] + A.R[3 * i + 1] * B.t[1] + A.R[3 * i + 2] * B.t[2] + A.t[i];
  }
  return C;
}

// 6x6 Cholesky solve (the LDLT at src/optimizer.cpp:306)
static bool solve6(double H[36], double g[6], double dx[6]) {
  double L[36] = {0};
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = H[6 * i + j];
      for (int k = 0; k < j; ++k) s -= L[6 * i + k] * L[6 * j + k];
      if (i == j) {
        if (s <= 0) return false;
        L[6 * i + j] = std::sqrt(s);
      } else
        L[6 * i + j] = s / L[6 * j + j];
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = g[i];
    for (int k = 0; k < i; ++k) s -= L[6 * i + k] * y[k];
    y[i] = s / L[6 * i + i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= L[6 * k + i] * dx[k];
    dx[i] = s / L[6 * i + i];
  }
  return true;
}

// sigma = 1.4826 * MAD via nth_element (src/optimizer.cpp:485-514)
static double mad_sigma(std::vector<double>& r) {
  size_t n = r.size();
  if (!n) return 1.0;
  std::nth_element(r.begin(), r.begin() + n / 2, r.end());
  double med = r[n / 2];
  for (auto& v : r) v = std::fabs(v - med);
  std::nth_element(r.begin(), r.begin() + n / 2, r.end());
  return 1.4826 * r[n / 2];
}

int main() {
  std::mt19937 rng(0);
  std::uniform_real_distribution<float> U(0.f, 255.f);
  std::uniform_real_distribution<double> Ux(30.0, W0 - 30.0), Uy(30.0, H0 - 30.0);

  // synthetic textured frame pair (smooth texture so LM does real work)
  Image ref, cur;
  ref.init(W0, H0);
  cur.init(W0, H0);
  for (int y = 0; y < H0; ++y)
    for (int x = 0; x < W0; ++x) {
      float v = 127.f + 60.f * std::sin(x * 0.05f) * std::cos(y * 0.07f) +
                30.f * std::sin((x + 2 * y) * 0.013f);
      ref.at(x, y) = v;
      cur.at(x, y) = 127.f + 60.f * std::sin((x - 1.3f) * 0.05f) * std::cos((y + 0.7f) * 0.07f) +
                     30.f * std::sin((x - 1.3f + 2 * (y + 0.7f)) * 0.013f);
    }

  // features + 3D points on a fronto-parallel plane at z=15
  double uv[N_FEATS][2], pts[N_FEATS][3];
  for (int i = 0; i < N_FEATS; ++i) {
    uv[i][0] = Ux(rng);
    uv[i][1] = Uy(rng);
    double z = 15.0;
    pts[i][0] = (uv[i][0] - CX) / FX * z;
    pts[i][1] = (uv[i][1] - CY) / FY * z;
    pts[i][2] = z;
  }

  // the ref frame's pyramid already exists when a new frame arrives
  // (System::addImage builds exactly one new Frame) — hoist it out
  Image rimgs[LEVELS], rgrads[LEVELS];
  rimgs[0] = ref;
  gradient_mag(rimgs[0], rgrads[0]);
  for (int l = 1; l < LEVELS; ++l) {
    pyr_down(rimgs[l - 1], rimgs[l]);
    pyr_down(rgrads[l - 1], rgrads[l]);
  }

  const int REPS = 30;
  auto t0 = std::chrono::steady_clock::now();
  double sink = 0;
  for (int rep = 0; rep < REPS; ++rep) {
    // --- 1. pyramid build (one new frame per addImage) --------------------
    Image imgs[LEVELS], grads[LEVELS];
    imgs[0] = cur;
    gradient_mag(imgs[0], grads[0]);
    for (int l = 1; l < LEVELS; ++l) {
      pyr_down(imgs[l - 1], imgs[l]);
      pyr_down(grads[l - 1], grads[l]);
    }

    // --- 2. sparse image alignment ---------------------------------------
    SE3 T;  // identity init (constant-velocity seed in the reference)
    for (int lvl = LEVELS - 1; lvl >= 0; --lvl) {
      double scale = 1.0 / (1 << lvl);
      const Image& R = rimgs[lvl];
      const Image& C = imgs[lvl];
      // per-feature patch + 6-dof jacobians (computeJacobianSingleFeature)
      static float patches[N_FEATS][PA];
      static double J[N_FEATS][PA][6];
      static bool vis[N_FEATS];
      for (int i = 0; i < N_FEATS; ++i) {
        double u = uv[i][0] * scale, v = uv[i][1] * scale;
        vis[i] = u > 4 && v > 4 && u < R.w - 5 && v < R.h - 5;
        if (!vis[i]) continue;
        double X = pts[i][0], Y = pts[i][1], Z = pts[i][2], iz = 1 / Z;
        double fxs = FX * scale, fys = FY * scale;
        double ju[6] = {fxs * iz, 0, -fxs * X * iz * iz, -fxs * X * Y * iz * iz,
                        fxs * (1 + X * X * iz * iz), -fxs * Y * iz};
        double jv[6] = {0, fys * iz, -fys * Y * iz * iz, -fys * (1 + Y * Y * iz * iz),
                        fys * X * Y * iz * iz, fys * X * iz};
        int k = 0;
        for (int dy = -2; dy <= 2; ++dy)
          for (int dx = -2; dx <= 2; ++dx, ++k) {
            double x = u + dx, y = v + dy;
            patches[i][k] = interp(R, x, y);
            // 5 interpolations per pixel as the reference does (:179-184)
            double gx = 0.5 * (interp(R, x + 1, y) - interp(R, x - 1, y));
            double gy = 0.5 * (interp(R, x, y + 1) - interp(R, x, y - 1));
            for (int m = 0; m < 6; ++m) J[i][k][m] = gx * ju[m] + gy * jv[m];
          }
      }
      for (int it = 0; it < 10; ++it) {  // LM iterations per level
        static double res[N_FEATS][PA];
        std::vector<double> all;
        all.reserve(N_FEATS * PA);
        for (int i = 0; i < N_FEATS; ++i) {
          if (!vis[i]) continue;
          double pc[3];
          T.apply(pts[i], pc);
          if (pc[2] < 1e-6) { continue; }
          double u = (FX * pc[0] / pc[2] + CX) * scale, v = (FY * pc[1] / pc[2] + CY) * scale;
          if (!(u > 4 && v > 4 && u < C.w - 5 && v < C.h - 5)) continue;
          int k = 0;
          for (int dy = -2; dy <= 2; ++dy)
            for (int dx = -2; dx <= 2; ++dx, ++k) {
              res[i][k] = interp(C, u + dx, v + dy) - patches[i][k];
              all.push_back(res[i][k]);
            }
        }
        double sigma = std::max(mad_sigma(all), 1e-6), cth = 4.6851 * sigma;
        double H[36] = {0}, g[6] = {0};
        for (int i = 0; i < N_FEATS; ++i) {
          if (!vis[i]) continue;
          for (int k = 0; k < PA; ++k) {
            double r = res[i][k], ar = std::fabs(r);
            double w = ar <= cth ? (1 - r * r / (cth * cth)) * (1 - r * r / (cth * cth)) : 0;
            for (int a = 0; a < 6; ++a) {
              g[a] += w * J[i][k][a] * r;
              for (int b = a; b < 6; ++b) H[6 * a + b] += w * J[i][k][a] * J[i][k][b];
            }
          }
        }
        for (int a = 0; a < 6; ++a)
          for (int b = 0; b < a; ++b) H[6 * a + b] = H[6 * b + a];
        for (int a = 0; a < 6; ++a) H[7 * a] *= 1.01;  // LM damping
        double dx6[6], nx[6];
        if (!solve6(H, g, dx6)) break;
        for (int a = 0; a < 6; ++a) nx[a] = -dx6[a];
        T = compose(T, se3_exp(nx));  // T <- T*exp(-dx) (:372-380)
      }
    }
    sink += T.t[0];

    // --- 3. feature alignment (150 matches, 3-param LM) -------------------
    for (int i = 0; i < N_MATCHES; ++i) {
      double ru = uv[i][0], rv = uv[i][1];
      float rp[PA];
      double Jf[PA][3];
      int k = 0;
      for (int dy = -2; dy <= 2; ++dy)
        for (int dx = -2; dx <= 2; ++dx, ++k) {
          rp[k] = interp(rgrads[0], ru + dx, rv + dy);
          Jf[k][0] = 0.5 * (interp(rgrads[0], ru + dx + 1, rv + dy) -
                            interp(rgrads[0], ru + dx - 1, rv + dy));
          Jf[k][1] = 0.5 * (interp(rgrads[0], ru + dx, rv + dy + 1) -
                            interp(rgrads[0], ru + dx, rv + dy - 1));
          Jf[k][2] = 1;
        }
      double p[3] = {ru + 1.0, rv - 0.5, 0};
      for (int it = 0; it < 10; ++it) {
        if (!(p[0] > 4 && p[1] > 4 && p[0] < W0 - 5 && p[1] < H0 - 5)) break;
        double Hf[9] = {0}, gf[3] = {0};
        int k2 = 0;
        for (int dy = -2; dy <= 2; ++dy)
          for (int dx = -2; dx <= 2; ++dx, ++k2) {
            double r = -(interp(grads[0], p[0] + dx, p[1] + dy) - rp[k2] + p[2]);
            for (int a = 0; a < 3; ++a) {
              gf[a] += Jf[k2][a] * r;
              for (int b = 0; b < 3; ++b) Hf[3 * a + b] += Jf[k2][a] * Jf[k2][b];
            }
          }
        for (int a = 0; a < 3; ++a) Hf[4 * a] *= 1.01;
        // 3x3 cofactor solve
        double det = Hf[0] * (Hf[4] * Hf[8] - Hf[5] * Hf[7]) -
                     Hf[1] * (Hf[3] * Hf[8] - Hf[5] * Hf[6]) +
                     Hf[2] * (Hf[3] * Hf[7] - Hf[4] * Hf[6]);
        if (std::fabs(det) < 1e-12) break;
        double inv[9] = {
            (Hf[4] * Hf[8] - Hf[5] * Hf[7]) / det, (Hf[2] * Hf[7] - Hf[1] * Hf[8]) / det,
            (Hf[1] * Hf[5] - Hf[2] * Hf[4]) / det, (Hf[5] * Hf[6] - Hf[3] * Hf[8]) / det,
            (Hf[0] * Hf[8] - Hf[2] * Hf[6]) / det, (Hf[2] * Hf[3] - Hf[0] * Hf[5]) / det,
            (Hf[3] * Hf[7] - Hf[4] * Hf[6]) / det, (Hf[1] * Hf[6] - Hf[0] * Hf[7]) / det,
            (Hf[0] * Hf[4] - Hf[1] * Hf[3]) / det};
        for (int a = 0; a < 3; ++a)
          p[a] += inv[3 * a] * gf[0] + inv[3 * a + 1] * gf[1] + inv[3 * a + 2] * gf[2];
      }
      sink += p[0];
    }

    // --- 4. depth-filter epipolar updates ---------------------------------
    static double fuv[N_FILTERS][2], fmu[N_FILTERS], fvar[N_FILTERS], fa[N_FILTERS], fb[N_FILTERS];
    static bool finit = false;
    if (!finit) {
      for (int i = 0; i < N_FILTERS; ++i) {
        fuv[i][0] = Ux(rng);
        fuv[i][1] = Uy(rng);
        fmu[i] = 1.0 / 15.0;
        fvar[i] = 0.01;
        fa[i] = fb[i] = 10.0;
      }
      finit = true;
    }
    SE3 Trel;
    Trel.t[0] = 0.3;
    Trel.t[2] = 0.5;
    for (int i = 0; i < N_FILTERS; ++i) {
      // reference patch (affine-warp neighborhood, getAffineWarp + apply)
      float rp[FPA];
      double rmean = 0;
      int k = 0;
      for (int dy = -3; dy <= 3; ++dy)
        for (int dx = -3; dx <= 3; ++dx, ++k) {
          rp[k] = interp(ref, fuv[i][0] + dx, fuv[i][1] + dy);
          rmean += rp[k];
        }
      rmean /= FPA;
      // epipolar segment between mu±sigma projections
      double sig = std::sqrt(fvar[i]);
      double dmin = 1.0 / (fmu[i] + sig), dmax = 1.0 / std::max(fmu[i] - sig, 1e-4);
      double bx = (fuv[i][0] - CX) / FX, by = (fuv[i][1] - CY) / FY;
      double nb = std::sqrt(bx * bx + by * by + 1);
      double bear[3] = {bx / nb, by / nb, 1 / nb};
      double pA[3] = {bear[0] * dmin, bear[1] * dmin, bear[2] * dmin}, cA[3];
      double pB[3] = {bear[0] * dmax, bear[1] * dmax, bear[2] * dmax}, cB[3];
      Trel.apply(pA, cA);
      Trel.apply(pB, cB);
      double uA = FX * cA[0] / cA[2] + CX, vA = FY * cA[1] / cA[2] + CY;
      double uB = FX * cB[0] / cB[2] + CX, vB = FY * cB[1] / cB[2] + CY;
      double best = 1e30, bu = uA, bv = vA;
      for (int s = 0; s < EPI_STEPS; ++s) {  // ZSSD walk (:412-551)
        double tt = (s + 0.5) / EPI_STEPS;
        double u = uA + tt * (uB - uA), v = vA + tt * (vB - vA);
        if (!(u > 4 && v > 4 && u < W0 - 5 && v < H0 - 5)) continue;
        double cmean = 0;
        float cp[FPA];
        int k2 = 0;
        for (int dy = -3; dy <= 3; ++dy)
          for (int dx = -3; dx <= 3; ++dx, ++k2) {
            cp[k2] = interp(cur, u + dx, v + dy);
            cmean += cp[k2];
          }
        cmean /= FPA;
        double sc = 0;
        for (int m = 0; m < FPA; ++m) sc += std::fabs((rp[m] - rmean) - (cp[m] - cmean));
        if (sc < best) { best = sc; bu = u; bv = v; }
      }
      // triangulate + Gaussian×Beta fusion (closed form, :311-340)
      double x = 1.0 / std::clamp(0.5 * (dmin + dmax), 1e-4, 1e4);
      double tau2 = 0.01;
      double s2 = 1.0 / (1.0 / fvar[i] + 1.0 / tau2);
      double m = s2 * (fmu[i] / fvar[i] + x / tau2);
      double C1 = fa[i] / (fa[i] + fb[i]) *
                  std::exp(-(x - fmu[i]) * (x - fmu[i]) / (2 * (fvar[i] + tau2))) /
                  std::sqrt(2 * M_PI * (fvar[i] + tau2));
      double C2 = fb[i] / (fa[i] + fb[i]) * 0.5;
      double nc = C1 + C2;
      C1 /= nc;
      C2 /= nc;
      double f = C1 * (fa[i] + 1) / (fa[i] + fb[i] + 1) + C2 * fa[i] / (fa[i] + fb[i] + 1);
      double e = C1 * (fa[i] + 1) * (fa[i] + 2) / ((fa[i] + fb[i] + 1) * (fa[i] + fb[i] + 2)) +
                 C2 * fa[i] * (fa[i] + 1) / ((fa[i] + fb[i] + 1) * (fa[i] + fb[i] + 2));
      double mu_n = C1 * m + C2 * fmu[i];
      fvar[i] = std::max(C1 * (s2 + m * m) + C2 * (fvar[i] + fmu[i] * fmu[i]) - mu_n * mu_n, 1e-10);
      fmu[i] = mu_n;
      fa[i] = (e - f) / std::max(f - e / std::max(f, 1e-9), 1e-9);
      fb[i] = fa[i] * (1 - f) / std::max(f, 1e-9);
      sink += bu + bv;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count() / REPS;
  std::printf(
      "{\"metric\": \"cpu_proxy_fps\", \"value\": %.2f, \"unit\": \"frames/sec\", "
      "\"sink\": %.1f}\n",
      1.0 / dt, sink);
  return 0;
}
