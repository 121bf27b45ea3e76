// Exact chessboard (DIST_C, 3x3 mask) distance transform — native host path.
//
// Matches cv::distanceTransform(src, dst, DIST_C, 3) as used by the
// depth-normal template extractor (reference linemod/linemod.cpp:763):
// distance from each nonzero pixel to the nearest zero pixel under the
// Chebyshev metric.  Two-pass sequential chamfer; runs on the host during
// (offline) training only.

#include <algorithm>
#include <cstdint>
#include <limits>

extern "C" {

// nonzero: (h, w) uint8 (0 = background / source set, else foreground).
// out: (h, w) float32 distances.
void fealess_chamfer_chessboard(const uint8_t* nonzero, int h, int w,
                                float* out) {
  const float kInf = std::numeric_limits<float>::max() * 0.5f;
  // forward pass: top-left to bottom-right
  for (int r = 0; r < h; ++r) {
    for (int c = 0; c < w; ++c) {
      float d = nonzero[r * w + c] ? kInf : 0.0f;
      if (d > 0.0f) {
        if (r > 0) {
          d = std::min(d, out[(r - 1) * w + c] + 1.0f);
          if (c > 0) d = std::min(d, out[(r - 1) * w + c - 1] + 1.0f);
          if (c + 1 < w) d = std::min(d, out[(r - 1) * w + c + 1] + 1.0f);
        }
        if (c > 0) d = std::min(d, out[r * w + c - 1] + 1.0f);
      }
      out[r * w + c] = d;
    }
  }
  // backward pass: bottom-right to top-left
  for (int r = h - 1; r >= 0; --r) {
    for (int c = w - 1; c >= 0; --c) {
      float d = out[r * w + c];
      if (d > 0.0f) {
        if (r + 1 < h) {
          d = std::min(d, out[(r + 1) * w + c] + 1.0f);
          if (c > 0) d = std::min(d, out[(r + 1) * w + c - 1] + 1.0f);
          if (c + 1 < w) d = std::min(d, out[(r + 1) * w + c + 1] + 1.0f);
        }
        if (c + 1 < w) d = std::min(d, out[r * w + c + 1] + 1.0f);
        out[r * w + c] = d;
      }
    }
  }
}

}  // extern "C"
