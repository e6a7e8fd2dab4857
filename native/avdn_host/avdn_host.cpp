// avdn_host — native host-side image preprocessing for avdn_tpu.
//
// Plays the role OpenCV's C++ core plays in the reference data path
// (src/env.py:217-231): square-pixel area resampling of map tiles and
// GT-attention circle rasterisation. Exposed through a C ABI consumed via
// ctypes (avdn_tpu/data/native.py); built by native/Makefile.
//
// area_resize_u8 implements INTER_AREA semantics: each destination pixel
// averages the exact (fractional) source-pixel coverage of its footprint.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// src: (sh, sw, ch) uint8 row-major; dst: (dh, dw, ch).
void area_resize_u8(const uint8_t* src, int sh, int sw, int ch,
                    uint8_t* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;

  // Precompute horizontal coverage spans: for each dst column, the list of
  // (src column, weight) pairs.
  struct Span {
    int begin;
    int count;
  };
  std::vector<Span> xspan(dw);
  std::vector<double> xw;  // flattened weights
  std::vector<int> xi;     // flattened indices
  for (int dx = 0; dx < dw; ++dx) {
    double x0 = dx * sx;
    double x1 = std::min(x0 + sx, static_cast<double>(sw));
    int ix0 = static_cast<int>(x0);
    int ix1 = std::min(static_cast<int>(std::ceil(x1)), sw);
    xspan[dx].begin = static_cast<int>(xw.size());
    for (int x = ix0; x < ix1; ++x) {
      double cover = std::min<double>(x + 1, x1) - std::max<double>(x, x0);
      if (cover <= 0) continue;
      xi.push_back(x);
      xw.push_back(cover);
    }
    xspan[dx].count = static_cast<int>(xw.size()) - xspan[dx].begin;
  }

  std::vector<double> row_acc(static_cast<size_t>(dw) * ch);
  std::vector<double> col_acc(static_cast<size_t>(dw) * ch);

  for (int dy = 0; dy < dh; ++dy) {
    double y0 = dy * sy;
    double y1 = std::min(y0 + sy, static_cast<double>(sh));
    int iy0 = static_cast<int>(y0);
    int iy1 = std::min(static_cast<int>(std::ceil(y1)), sh);
    std::fill(col_acc.begin(), col_acc.end(), 0.0);
    double total_h = 0.0;
    for (int y = iy0; y < iy1; ++y) {
      double cover_y = std::min<double>(y + 1, y1) - std::max<double>(y, y0);
      if (cover_y <= 0) continue;
      total_h += cover_y;
      const uint8_t* srow = src + (static_cast<size_t>(y) * sw) * ch;
      // horizontal pass for this source row
      std::fill(row_acc.begin(), row_acc.end(), 0.0);
      for (int dx = 0; dx < dw; ++dx) {
        double* out = &row_acc[static_cast<size_t>(dx) * ch];
        for (int k = 0; k < xspan[dx].count; ++k) {
          int idx = xspan[dx].begin + k;
          const uint8_t* px = srow + static_cast<size_t>(xi[idx]) * ch;
          double w = xw[idx];
          for (int c = 0; c < ch; ++c) out[c] += w * px[c];
        }
      }
      for (size_t j = 0; j < col_acc.size(); ++j)
        col_acc[j] += cover_y * row_acc[j];
    }
    uint8_t* drow = dst + (static_cast<size_t>(dy) * dw) * ch;
    for (int dx = 0; dx < dw; ++dx) {
      double norm_x = 0.0;
      for (int k = 0; k < xspan[dx].count; ++k)
        norm_x += xw[xspan[dx].begin + k];
      double inv = 1.0 / (total_h * norm_x);
      const double* acc = &col_acc[static_cast<size_t>(dx) * ch];
      for (int c = 0; c < ch; ++c) {
        double v = acc[c] * inv;
        drow[static_cast<size_t>(dx) * ch + c] =
            static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5));
      }
    }
  }
}

// In-place channel reversal (BGR <-> RGB).
void swap_rb_u8(uint8_t* img, int h, int w) {
  size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    std::swap(img[i * 3], img[i * 3 + 2]);
  }
}

// Filled-circle rasterisation into a single-channel uint8 mask (value 255).
// circles: n x 3 floats (cx, cy, radius) in pixel coords.
void fill_circles_u8(uint8_t* img, int h, int w, const float* circles, int n) {
  for (int i = 0; i < n; ++i) {
    float cx = circles[i * 3], cy = circles[i * 3 + 1], r = circles[i * 3 + 2];
    if (r <= 0) continue;
    int y0 = std::max(0, static_cast<int>(cy - r - 1));
    int y1 = std::min(h - 1, static_cast<int>(cy + r + 1));
    int x0 = std::max(0, static_cast<int>(cx - r - 1));
    int x1 = std::min(w - 1, static_cast<int>(cx + r + 1));
    float r2 = r * r;
    for (int y = y0; y <= y1; ++y) {
      for (int x = x0; x <= x1; ++x) {
        float dx = x - cx, dy = y - cy;
        if (dx * dx + dy * dy <= r2)
          img[static_cast<size_t>(y) * w + x] = 255;
      }
    }
  }
}

}  // extern "C"
