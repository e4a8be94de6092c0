// ROIAlign forward, CPU reference implementation (original non-aligned
// variant: no -0.5 offset, roi sizes clamped to >= 1, the -1/H out-of-bounds
// rule). Plays the role of csrc/cpu/ROIAlign_cpu.cpp as the numerics oracle
// for the MXU matmul formulation. HWC layout.

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

inline void bilinear_add(const float* feat, int h, int w, int c, float y,
                         float x, float weight, float* acc) {
  if (y < -1.0f || y > h || x < -1.0f || x > w) return;
  y = std::max(y, 0.0f);
  x = std::max(x, 0.0f);
  int y_lo = static_cast<int>(y);
  int x_lo = static_cast<int>(x);
  int y_hi, x_hi;
  if (y_lo >= h - 1) {
    y_hi = y_lo = h - 1;
    y = static_cast<float>(y_lo);
  } else {
    y_hi = y_lo + 1;
  }
  if (x_lo >= w - 1) {
    x_hi = x_lo = w - 1;
    x = static_cast<float>(x_lo);
  } else {
    x_hi = x_lo + 1;
  }
  float ly = y - y_lo, lx = x - x_lo;
  float hy = 1.0f - ly, hx = 1.0f - lx;
  const float w1 = hy * hx * weight, w2 = hy * lx * weight;
  const float w3 = ly * hx * weight, w4 = ly * lx * weight;
  const float* p1 = feat + (y_lo * w + x_lo) * c;
  const float* p2 = feat + (y_lo * w + x_hi) * c;
  const float* p3 = feat + (y_hi * w + x_lo) * c;
  const float* p4 = feat + (y_hi * w + x_hi) * c;
  for (int k = 0; k < c; ++k)
    acc[k] += w1 * p1[k] + w2 * p2[k] + w3 * p3[k] + w4 * p4[k];
}

}  // namespace

extern "C" {

// feat: [h, w, c]; rois: [n, 4] xyxy image coords; out: [n, pooled, pooled, c]
void roi_align_cpu(const float* feat, int h, int w, int c, const float* rois,
                   int64_t n, float scale, int pooled, int sampling_ratio,
                   float* out) {
  for (int64_t r = 0; r < n; ++r) {
    const float* roi = rois + 4 * r;
    float sw = roi[0] * scale, sh = roi[1] * scale;
    float rw = std::max(roi[2] * scale - sw, 1.0f);
    float rh = std::max(roi[3] * scale - sh, 1.0f);
    float bw = rw / pooled, bh = rh / pooled;
    int gh = sampling_ratio > 0 ? sampling_ratio
                                : static_cast<int>(std::ceil(rh / pooled));
    int gw = sampling_ratio > 0 ? sampling_ratio
                                : static_cast<int>(std::ceil(rw / pooled));
    const float inv = 1.0f / (gh * gw);
    for (int ph = 0; ph < pooled; ++ph) {
      for (int pw_ = 0; pw_ < pooled; ++pw_) {
        float* acc = out + ((r * pooled + ph) * pooled + pw_) * c;
        std::fill(acc, acc + c, 0.0f);
        for (int iy = 0; iy < gh; ++iy) {
          float y = sh + ph * bh + (iy + 0.5f) * bh / gh;
          for (int ix = 0; ix < gw; ++ix) {
            float x = sw + pw_ * bw + (ix + 0.5f) * bw / gw;
            bilinear_add(feat, h, w, c, y, x, inv, acc);
          }
        }
      }
    }
  }
}

}  // extern "C"
