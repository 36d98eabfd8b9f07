// Native C++ BM3D core — the CPU counterpart of the TPU Pallas/JAX path.
//
// The reference's only native component is its prebuilt BM3D libraries
// (bm3d_thr.so / bm3d_wie.so, interface bm3d307/bm3d/bm3d_py.h:4-16). This
// is a from-scratch reimplementation of the same two-stage algorithm with
// the same profile constants as priors/bm3d/core.py (block size 8, step 3,
// stacks 16/32, search window 39, bior1.5/DCT 2-D + Haar stack transforms,
// Kaiser beta=2 aggregation), multithreaded over reference-block rows.
// It serves as the host-side fallback/oracle; numerical behavior matches
// the JAX implementation (same math, same conventions).

#include <algorithm>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBS = 8;          // block size
constexpr int kStep = 3;        // reference-block stride
constexpr int kSearch = 39;     // search window (pixels)
constexpr int kNCand = kSearch - kBS + 1;  // 32 candidate offsets per dim
constexpr int kOffLo = -(kNCand / 2 - 1);  // -15..16
constexpr double kTauHT = 3000.0 * 2.0 * (kBS * kBS) / (255.0 * 255.0);
constexpr double kTauWIE = 400.0 * 2.0 * (kBS * kBS) / (255.0 * 255.0);
constexpr double kLambdaThr = 3.0;
constexpr double kLambda2D = 2.0;
constexpr double kMu2 = 0.4;

// ---------------- transforms ----------------

// Periodized one-level analysis: c[k] = sum_t f[t] x[(2k+1-t) mod m]
void analysis_step(const std::vector<double>& x, const double* lo,
                   const double* hi, int flen, std::vector<double>* ca,
                   std::vector<double>* cd) {
  int m = x.size();
  ca->assign(m / 2, 0.0);
  cd->assign(m / 2, 0.0);
  for (int k = 0; k < m / 2; ++k)
    for (int t = 0; t < flen; ++t) {
      int idx = ((2 * k + 1 - t) % m + m) % m;
      (*ca)[k] += lo[t] * x[idx];
      (*cd)[k] += hi[t] * x[idx];
    }
}

// Full wavedec matrix (n x n), rows [cA_L, cD_L, ..., cD_1].
void wavelet_matrix(int n, const double* lo, const double* hi, int flen,
                    std::vector<double>* w) {
  w->assign((size_t)n * n, 0.0);
  for (int i = 0; i < n; ++i) {
    std::vector<double> col(n, 0.0);
    col[i] = 1.0;
    std::vector<std::vector<double>> details;
    std::vector<double> ca = col, cd;
    int levels = 0;
    for (int m = n; m > 1; m /= 2) ++levels;
    for (int l = 0; l < levels; ++l) {
      std::vector<double> na, nd;
      analysis_step(ca, lo, hi, flen, &na, &nd);
      details.push_back(nd);
      ca = na;
    }
    int row = 0;
    (*w)[(size_t)row * n + i] = ca[0];
    ++row;
    for (int l = (int)details.size() - 1; l >= 0; --l)
      for (double v : details[l]) (*w)[(size_t)(row++) * n + i] = v;
  }
}

void dct_matrix(int n, std::vector<double>* m) {
  m->assign((size_t)n * n, 0.0);
  for (int k = 0; k < n; ++k)
    for (int t = 0; t < n; ++t)
      (*m)[(size_t)k * n + t] =
          std::cos(M_PI * k * (2 * t + 1) / (2.0 * n)) *
          (k == 0 ? std::sqrt(1.0 / n) : std::sqrt(2.0 / n));
}

// Gauss-Jordan inverse (small matrices).
bool invert(const std::vector<double>& a_in, int n, std::vector<double>* out) {
  std::vector<double> a = a_in;
  out->assign((size_t)n * n, 0.0);
  for (int i = 0; i < n; ++i) (*out)[(size_t)i * n + i] = 1.0;
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int r = col + 1; r < n; ++r)
      if (std::fabs(a[(size_t)r * n + col]) > std::fabs(a[(size_t)piv * n + col]))
        piv = r;
    if (std::fabs(a[(size_t)piv * n + col]) < 1e-14) return false;
    if (piv != col)
      for (int c = 0; c < n; ++c) {
        std::swap(a[(size_t)piv * n + c], a[(size_t)col * n + c]);
        std::swap((*out)[(size_t)piv * n + c], (*out)[(size_t)col * n + c]);
      }
    double d = a[(size_t)col * n + col];
    for (int c = 0; c < n; ++c) {
      a[(size_t)col * n + c] /= d;
      (*out)[(size_t)col * n + c] /= d;
    }
    for (int r = 0; r < n; ++r) {
      if (r == col) continue;
      double f = a[(size_t)r * n + col];
      for (int c = 0; c < n; ++c) {
        a[(size_t)r * n + c] -= f * a[(size_t)col * n + c];
        (*out)[(size_t)r * n + c] -= f * (*out)[(size_t)col * n + c];
      }
    }
  }
  return true;
}

struct Transforms {
  std::vector<double> t2f, t2i;          // 8x8 2-D transform pair
  std::vector<std::vector<double>> hf;   // haar fwd per log2 size
  std::vector<std::vector<double>> hi;   // haar inv (transpose)
};

void build_transforms(bool bior, int max_stack, Transforms* tr) {
  if (bior) {
    // The 8x8 bior1.5 analysis matrix is the MATLAB-compatibility table
    // the reference hardcodes (bm3d307/bm3d/__init__.py:491-504) and its
    // C binaries consume — spec constants, matched exactly by the JAX
    // path (priors/bm3d/transforms.py, round 4). The generated
    // wavelet_matrix() differs by a within-subband row permutation and a
    // ~2.9% coarse-row scale and stays in use for other sizes.
    static const double kBior8[64] = {
        0.343550200747110,  0.343550200747110,  0.343550200747110,
        0.343550200747110,  0.343550200747110,  0.343550200747110,
        0.343550200747110,  0.343550200747110,
        -0.225454819240296, -0.461645582253923, -0.461645582253923,
        -0.225454819240296, 0.225454819240296,  0.461645582253923,
        0.461645582253923,  0.225454819240296,
        0.569359398342840,  0.402347308162280,  -0.402347308162280,
        -0.569359398342840, -0.083506045090280, 0.083506045090280,
        -0.083506045090280, 0.083506045090280,
        -0.083506045090280, 0.083506045090280,  -0.083506045090280,
        0.083506045090280,  0.569359398342840,  0.402347308162280,
        -0.402347308162280, -0.569359398342840,
        0.707106781186550,  -0.707106781186550, 0, 0, 0, 0, 0, 0,
        0, 0, 0.707106781186550, -0.707106781186550, 0, 0, 0, 0,
        0, 0, 0, 0, 0.707106781186550, -0.707106781186550, 0, 0,
        0, 0, 0, 0, 0, 0, 0.707106781186550, -0.707106781186550};
    tr->t2f.assign(kBior8, kBior8 + 64);
  } else {
    dct_matrix(kBS, &tr->t2f);
  }
  invert(tr->t2f, kBS, &tr->t2i);

  const double hlo[2] = {0.7071067811865476, 0.7071067811865476};
  const double hhi[2] = {-0.7071067811865476, 0.7071067811865476};
  tr->hf.clear();
  tr->hi.clear();
  for (int s = 1; s <= max_stack; s *= 2) {
    std::vector<double> f;
    if (s == 1)
      f = {1.0};
    else
      wavelet_matrix(s, hlo, hhi, 2, &f);
    std::vector<double> inv;
    invert(f, s, &inv);
    tr->hf.push_back(f);
    tr->hi.push_back(inv);
  }
}

void kaiser8(double w[kBS][kBS]) {
  // Kaiser beta=2 length-8 (matches np.kaiser(8, 2.0)).
  auto bessel_i0 = [](double x) {
    double s = 1.0, t = 1.0;
    for (int k = 1; k < 25; ++k) {
      t *= (x / (2.0 * k)) * (x / (2.0 * k));
      s += t;
    }
    return s;
  };
  double k1[kBS];
  double denom = bessel_i0(2.0);
  for (int i = 0; i < kBS; ++i) {
    double r = 2.0 * i / (kBS - 1.0) - 1.0;
    k1[i] = bessel_i0(2.0 * std::sqrt(1.0 - r * r)) / denom;
  }
  for (int i = 0; i < kBS; ++i)
    for (int j = 0; j < kBS; ++j) w[i][j] = k1[i] * k1[j];
}

// 2-D transform of the 8x8 block at (r, c): out = T * B * T^T (row-major).
void t2d_block(const float* img, int w, int r, int c,
               const std::vector<double>& t, double out[kBS * kBS]) {
  double tmp[kBS][kBS];
  for (int i = 0; i < kBS; ++i)
    for (int j = 0; j < kBS; ++j) {
      double s = 0;
      for (int k = 0; k < kBS; ++k)
        s += t[(size_t)i * kBS + k] * img[(size_t)(r + k) * w + (c + j)];
      tmp[i][j] = s;
    }
  for (int i = 0; i < kBS; ++i)
    for (int j = 0; j < kBS; ++j) {
      double s = 0;
      for (int k = 0; k < kBS; ++k) s += tmp[i][k] * t[(size_t)j * kBS + k];
      out[i * kBS + j] = s;
    }
}

void it2d_block(const double in[kBS * kBS], const std::vector<double>& ti,
                double out[kBS * kBS]) {
  double tmp[kBS][kBS];
  for (int i = 0; i < kBS; ++i)
    for (int j = 0; j < kBS; ++j) {
      double s = 0;
      for (int k = 0; k < kBS; ++k) s += ti[(size_t)i * kBS + k] * in[k * kBS + j];
      tmp[i][j] = s;
    }
  for (int i = 0; i < kBS; ++i)
    for (int j = 0; j < kBS; ++j) {
      double s = 0;
      for (int k = 0; k < kBS; ++k) s += tmp[i][k] * ti[(size_t)j * kBS + k];
      out[i * kBS + j] = s;
    }
}

struct Match {
  double d;
  int r, c;
};

// Candidates for reference block (ri, ci) within the search window.
void block_match(const float* match_img, const double* pre, int nh, int nw,
                 int w, int ri, int ci, int k_max, double tau,
                 std::vector<Match>* top, int* count_pow2) {
  std::vector<Match> cands;
  cands.reserve(kNCand * kNCand);
  for (int oi = kOffLo; oi < kOffLo + kNCand; ++oi) {
    int r = ri + oi;
    if (r < 0 || r >= nh) continue;
    for (int oj = kOffLo; oj < kOffLo + kNCand; ++oj) {
      int c = ci + oj;
      if (c < 0 || c >= nw) continue;
      double d = 0;
      if (pre) {
        const double* a = pre + ((size_t)ri * nw + ci) * kBS * kBS;
        const double* b = pre + ((size_t)r * nw + c) * kBS * kBS;
        for (int t = 0; t < kBS * kBS; ++t) {
          double e = a[t] - b[t];
          d += e * e;
        }
      } else {
        for (int br = 0; br < kBS; ++br)
          for (int bc = 0; bc < kBS; ++bc) {
            double e = match_img[(size_t)(ri + br) * w + (ci + bc)] -
                       match_img[(size_t)(r + br) * w + (c + bc)];
            d += e * e;
          }
      }
      cands.push_back({d, r, c});
    }
  }
  int k = std::min<int>(k_max, cands.size());
  std::partial_sort(cands.begin(), cands.begin() + k, cands.end(),
                    [](const Match& a, const Match& b) { return a.d < b.d; });
  top->assign(cands.begin(), cands.begin() + k);
  int cnt = 0;
  for (int i = 0; i < k; ++i)
    if ((*top)[i].d <= tau) ++cnt;
  cnt = std::max(cnt, 1);
  int p2 = 1;
  while (p2 * 2 <= cnt) p2 *= 2;
  *count_pow2 = std::min(p2, k_max);
}

std::vector<int> ref_grid(int n) {
  std::vector<int> g;
  for (int i = 0; i < n; i += kStep) g.push_back(i);
  if (g.back() != n - 1) g.push_back(n - 1);
  return g;
}

// Shared stage driver. mode 0 = HT, 1 = Wiener.
void run_stage(const float* z, const float* pilot, int h, int w, double sigma,
               int mode, int n_threads, float* out) {
  int nh = h - kBS + 1, nw = w - kBS + 1;
  int k_max = mode == 0 ? 16 : 32;
  double tau = mode == 0 ? kTauHT : kTauWIE;
  Transforms tr;
  build_transforms(mode == 0 /*bior for HT, dct for wiener*/, k_max, &tr);

  double win[kBS][kBS];
  kaiser8(win);

  // Precompute 2-D transforms of all blocks (z and pilot when Wiener).
  std::vector<double> t2z((size_t)nh * nw * kBS * kBS);
  std::vector<double> t2p;
  const float* match_img = mode == 0 ? z : pilot;
  for (int r = 0; r < nh; ++r)
    for (int c = 0; c < nw; ++c)
      t2d_block(z, w, r, c, tr.t2f, &t2z[((size_t)r * nw + c) * kBS * kBS]);
  if (mode == 1) {
    t2p.resize((size_t)nh * nw * kBS * kBS);
    for (int r = 0; r < nh; ++r)
      for (int c = 0; c < nw; ++c)
        t2d_block(pilot, w, r, c, tr.t2f, &t2p[((size_t)r * nw + c) * kBS * kBS]);
  }

  // Coarse prefilter features for high-sigma HT matching.
  const double* pre = nullptr;
  std::vector<double> prebuf;
  if (mode == 0 && sigma > 40.0 / 255.0) {
    prebuf = t2z;
    double thr = kLambda2D * sigma;
    for (auto& v : prebuf)
      if (std::fabs(v) < thr) v = 0.0;
    pre = prebuf.data();
  }

  auto gr = ref_grid(nh);
  auto gc = ref_grid(nw);
  double sigma_eff = mode == 0 ? sigma : sigma * std::sqrt(kMu2);

  int workers = n_threads > 0 ? n_threads
                              : (int)std::thread::hardware_concurrency();
  if (workers <= 0) workers = 4;
  std::vector<std::vector<double>> nums(workers), dens(workers);

  auto work = [&](int tid) {
    auto& num = nums[tid];
    auto& den = dens[tid];
    num.assign((size_t)h * w, 0.0);
    den.assign((size_t)h * w, 0.0);
    std::vector<Match> top;
    std::vector<double> stackz(k_max * kBS * kBS), stackp, c3(k_max * kBS * kBS),
        c3p;
    if (mode == 1) {
      stackp.resize(k_max * kBS * kBS);
      c3p.resize(k_max * kBS * kBS);
    }
    for (size_t gi = tid; gi < gr.size() * gc.size(); gi += workers) {
      int ri = gr[gi / gc.size()];
      int ci = gc[gi % gc.size()];
      int cnt;
      block_match(match_img, pre, nh, nw, w, ri, ci, k_max, tau, &top, &cnt);
      int s = cnt;
      int lvl = 0;
      while ((1 << lvl) < s) ++lvl;
      const auto& hf = tr.hf[lvl];
      const auto& hinv = tr.hi[lvl];

      for (int t = 0; t < s; ++t)
        std::memcpy(&stackz[(size_t)t * kBS * kBS],
                    &t2z[((size_t)top[t].r * nw + top[t].c) * kBS * kBS],
                    sizeof(double) * kBS * kBS);
      if (mode == 1)
        for (int t = 0; t < s; ++t)
          std::memcpy(&stackp[(size_t)t * kBS * kBS],
                      &t2p[((size_t)top[t].r * nw + top[t].c) * kBS * kBS],
                      sizeof(double) * kBS * kBS);

      // Haar along the stack.
      for (int coef = 0; coef < kBS * kBS; ++coef) {
        for (int a = 0; a < s; ++a) {
          double sz = 0, sp = 0;
          for (int b = 0; b < s; ++b) {
            sz += hf[(size_t)a * s + b] * stackz[(size_t)b * kBS * kBS + coef];
            if (mode == 1)
              sp += hf[(size_t)a * s + b] * stackp[(size_t)b * kBS * kBS + coef];
          }
          c3[(size_t)a * kBS * kBS + coef] = sz;
          if (mode == 1) c3p[(size_t)a * kBS * kBS + coef] = sp;
        }
      }

      double weight;
      if (mode == 0) {
        double thr = kLambdaThr * sigma;
        int nnz = 0;
        for (int t = 0; t < s * kBS * kBS; ++t) {
          if (std::fabs(c3[t]) > thr)
            ++nnz;
          else
            c3[t] = 0.0;
        }
        weight = 1.0 / (sigma * sigma * std::max(nnz, 1));
      } else {
        double swsum = 0.0;
        double s2 = sigma_eff * sigma_eff;
        for (int t = 0; t < s * kBS * kBS; ++t) {
          double p2v = c3p[t] * c3p[t];
          double wv = p2v / (p2v + s2);
          c3[t] *= wv;
          swsum += wv * wv;
        }
        weight = 1.0 / (s2 * std::max(swsum, 1e-10));
      }

      // Inverse Haar + inverse 2-D + aggregate.
      for (int t = 0; t < s; ++t) {
        double blk[kBS * kBS], sp[kBS * kBS];
        for (int coef = 0; coef < kBS * kBS; ++coef) {
          double v = 0;
          for (int a = 0; a < s; ++a)
            v += hinv[(size_t)t * s + a] * c3[(size_t)a * kBS * kBS + coef];
          blk[coef] = v;
        }
        it2d_block(blk, tr.t2i, sp);
        int br = top[t].r, bc = top[t].c;
        for (int i = 0; i < kBS; ++i)
          for (int j = 0; j < kBS; ++j) {
            double kw = win[i][j] * weight;
            num[(size_t)(br + i) * w + (bc + j)] += kw * sp[i * kBS + j];
            den[(size_t)(br + i) * w + (bc + j)] += kw;
          }
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();

  for (size_t i = 0; i < (size_t)h * w; ++i) {
    double n = 0, d = 0;
    for (int t = 0; t < workers; ++t) {
      n += nums[t][i];
      d += dens[t][i];
    }
    out[i] = (float)(d > 1e-10 ? n / d : z[i]);
  }
}

}  // namespace

extern "C" {

// Two-stage BM3D for white noise. stages: 0 = HT only, 1 = HT + Wiener.
// Returns 0 on success.
int pnp_bm3d(const float* z, int h, int w, float sigma, int stages,
             int n_threads, float* out) {
  if (h < kSearch || w < kSearch) return -1;
  std::vector<float> basic((size_t)h * w);
  run_stage(z, nullptr, h, w, sigma, 0, n_threads, basic.data());
  if (stages == 0) {
    std::memcpy(out, basic.data(), sizeof(float) * (size_t)h * w);
    return 0;
  }
  run_stage(z, basic.data(), h, w, sigma, 1, n_threads, out);
  return 0;
}

}  // extern "C"
