// Native PSNR / MATLAB-SSIM / relative-error metrics.
//
// Mirrors reference utils/utils_image.py:543-636 exactly (border shave,
// 11x11 sigma=1.5 Gaussian valid-window SSIM on the [0,255] scale) — a
// C++ oracle for the JAX metrics and a fast path for host-side scoring.

#include <cmath>
#include <limits>
#include <cstddef>
#include <vector>

namespace {

void gaussian_window(double w[11][11]) {
  double k[11];
  double s = 0.0;
  for (int i = 0; i < 11; ++i) {
    double x = i - 5.0;
    k[i] = std::exp(-x * x / (2.0 * 1.5 * 1.5));
    s += k[i];
  }
  for (int i = 0; i < 11; ++i) k[i] /= s;
  for (int i = 0; i < 11; ++i)
    for (int j = 0; j < 11; ++j) w[i][j] = k[i] * k[j];
}

}  // namespace

extern "C" {

double pnp_psnr(const double* a, const double* b, int h, int w, int border) {
  double mse = 0.0;
  int count = 0;
  for (int r = border; r < h - border; ++r)
    for (int c = border; c < w - border; ++c) {
      double d = a[(size_t)r * w + c] - b[(size_t)r * w + c];
      mse += d * d;
      ++count;
    }
  if (count == 0) return 0.0;  // degenerate border: no pixels to score
  mse /= count;
  // identical images: reference returns float('inf')
  if (mse == 0.0) return std::numeric_limits<double>::infinity();
  return 20.0 * std::log10(255.0 / std::sqrt(mse));
}

double pnp_re(const double* a, const double* b, int h, int w, int border) {
  double num = 0.0, den = 0.0;
  for (int r = border; r < h - border; ++r)
    for (int c = border; c < w - border; ++c) {
      double d = b[(size_t)r * w + c] - a[(size_t)r * w + c];
      num += d * d;
      den += b[(size_t)r * w + c] * b[(size_t)r * w + c];
    }
  return std::sqrt(num) / std::sqrt(den);
}

double pnp_ssim(const double* a, const double* b, int h, int w, int border) {
  const double c1 = (0.01 * 255) * (0.01 * 255);
  const double c2 = (0.03 * 255) * (0.03 * 255);
  double win[11][11];
  gaussian_window(win);

  int h0 = border, h1 = h - border, w0 = border, w1 = w - border;
  int vh = (h1 - h0) - 10, vw = (w1 - w0) - 10;
  if (vh <= 0 || vw <= 0) return 0.0;

  double acc = 0.0;
  for (int r = 0; r < vh; ++r) {
    for (int c = 0; c < vw; ++c) {
      double mu1 = 0, mu2 = 0, s1 = 0, s2 = 0, s12 = 0;
      for (int i = 0; i < 11; ++i)
        for (int j = 0; j < 11; ++j) {
          double x = a[(size_t)(h0 + r + i) * w + (w0 + c + j)];
          double y = b[(size_t)(h0 + r + i) * w + (w0 + c + j)];
          double k = win[i][j];
          mu1 += k * x;
          mu2 += k * y;
          s1 += k * x * x;
          s2 += k * y * y;
          s12 += k * x * y;
        }
      s1 -= mu1 * mu1;
      s2 -= mu2 * mu2;
      s12 -= mu1 * mu2;
      acc += ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
             ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2));
    }
  }
  return acc / (static_cast<double>(vh) * vw);
}

}  // extern "C"
