// Greedy NMS, CPU reference implementation.
//
// Plays the role of the reference's csrc/cpu/nms_cpu.cpp: the numerics
// oracle for the TPU (XLA fixpoint) NMS and the host-side NMS used when
// merging TTA / multi-pass detections. Exposed via a plain C ABI and loaded
// with ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// boxes: [n, 4] xyxy; keep: [n] out (1 = kept). legacy: +1 pixel widths.
void nms_cpu(const float* boxes, const float* scores, int64_t n, float thresh,
             int legacy, uint8_t* keep) {
  const float off = legacy ? 1.0f : 0.0f;
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> suppressed(n, 0);
  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    areas[i] = (b[2] - b[0] + off) * (b[3] - b[1] + off);
    keep[i] = 0;
  }
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep[i] = 1;
    const float* bi = boxes + 4 * i;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      float iw = std::min(bi[2], bj[2]) - std::max(bi[0], bj[0]) + off;
      float ih = std::min(bi[3], bj[3]) - std::max(bi[1], bj[1]) + off;
      if (iw <= 0 || ih <= 0) continue;
      float inter = iw * ih;
      float iou = inter / (areas[i] + areas[j] - inter);
      if (iou > thresh) suppressed[j] = 1;
    }
  }
}

// Per-class NMS via label matching (used for TTA merge).
void nms_per_class_cpu(const float* boxes, const float* scores,
                       const int32_t* labels, int64_t n, float thresh,
                       int legacy, uint8_t* keep) {
  const float off = legacy ? 1.0f : 0.0f;
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> suppressed(n, 0);
  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    areas[i] = (b[2] - b[0] + off) * (b[3] - b[1] + off);
    keep[i] = 0;
  }
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep[i] = 1;
    const float* bi = boxes + 4 * i;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (suppressed[j] || labels[j] != labels[i]) continue;
      const float* bj = boxes + 4 * j;
      float iw = std::min(bi[2], bj[2]) - std::max(bi[0], bj[0]) + off;
      float ih = std::min(bi[3], bj[3]) - std::max(bi[1], bj[1]) + off;
      if (iw <= 0 || ih <= 0) continue;
      float inter = iw * ih;
      float iou = inter / (areas[i] + areas[j] - inter);
      if (iou > thresh) suppressed[j] = 1;
    }
  }
}

}  // extern "C"
