// Fused host-side image preparation: bilinear resize + channel-order /
// normalization + canvas padding in ONE pass over the output.
//
// The reference's host pipeline chains PIL/cv2 resize -> to-tensor ->
// normalize -> pad (data/transforms/transforms.py), touching the image four
// times; on few-core TPU hosts that chain can bottleneck the input pipeline.
// This kernel writes each output pixel exactly once. C ABI, loaded via
// ctypes (da_detect_tpu/native).

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// src: uint8 HWC BGR (cv2 layout) [sh, sw, 3]
// dst: float32 [ch, cw, 3] canvas (zero outside the resized region)
// rh, rw: resized size; bgr255: Caffe2 convention (keep BGR, 0-255) else
// RGB/255; mean/std: per-channel (in the OUTPUT channel order); hflip
// mirrors horizontally.
void prep_image(const uint8_t* src, int sh, int sw, float* dst, int ch_h,
                int ch_w, int rh, int rw, int bgr255, const float* mean,
                const float* stddev, int hflip) {
  std::memset(dst, 0, sizeof(float) * ch_h * ch_w * 3);
  const float sy = rh > 1 ? static_cast<float>(sh) / rh : 1.0f;
  const float sx = rw > 1 ? static_cast<float>(sw) / rw : 1.0f;
  const float inv_std[3] = {1.0f / stddev[0], 1.0f / stddev[1],
                            1.0f / stddev[2]};
  for (int y = 0; y < rh; ++y) {
    // cv2-compatible half-pixel source mapping
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(fy, 0.0f);
    int y0 = std::min(static_cast<int>(fy), sh - 1);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    float* out_row = dst + y * ch_w * 3;
    for (int x = 0; x < rw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(fx, 0.0f);
      int x0 = std::min(static_cast<int>(fx), sw - 1);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * sw + x0) * 3;
      const uint8_t* p01 = src + (y0 * sw + x1) * 3;
      const uint8_t* p10 = src + (y1 * sw + x0) * 3;
      const uint8_t* p11 = src + (y1 * sw + x1) * 3;
      int ox = hflip ? (rw - 1 - x) : x;
      float* out = out_row + ox * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c])
                  + wy * ((1 - wx) * p10[c] + wx * p11[c]);
        // output channel order: keep BGR for the Caffe2 convention,
        // reverse to RGB (and scale to 0-1) otherwise
        int oc = bgr255 ? c : 2 - c;
        float scaled = bgr255 ? v : v / 255.0f;
        out[oc] = (scaled - mean[oc]) * inv_std[oc];
      }
    }
  }
}

}  // extern "C"
