// ep_tpu native input fast path.
//
// The reference delegates all image preprocessing to torchvision's C
// kernels; this is our equivalent native layer for the host-side input
// pipeline: fused uint8→float32 normalization (one pass instead of numpy's
// divide/subtract/divide broadcast chain) and a separable bicubic resize
// with crop fused into the horizontal pass (RandomResizedCrop's
// resize-from-box, util/crop.py semantics). Built as a plain shared library
// and loaded via ctypes — no Python C-API coupling.
//
// Build: make -C native      (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// out[i] = (in[i]/255 - mean[c]) / std[c], HWC layout, c = i % 3
void normalize_u8_to_f32(const uint8_t* in, float* out, int64_t n_pixels,
                         const float* mean, const float* std_) {
  // precompute per-channel scale/bias: out = in * s[c] + b[c]
  float s[3], b[3];
  for (int c = 0; c < 3; ++c) {
    s[c] = 1.0f / (255.0f * std_[c]);
    b[c] = -mean[c] / std_[c];
  }
  int64_t n = n_pixels * 3;
  int64_t i = 0;
  for (; i + 3 <= n; i += 3) {
    out[i + 0] = in[i + 0] * s[0] + b[0];
    out[i + 1] = in[i + 1] * s[1] + b[1];
    out[i + 2] = in[i + 2] * s[2] + b[2];
  }
}

// horizontal flip, HWC uint8
void hflip_u8(const uint8_t* in, uint8_t* out, int h, int w) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = in + (int64_t)y * w * 3;
    uint8_t* orow = out + (int64_t)y * w * 3;
    for (int x = 0; x < w; ++x) {
      const uint8_t* p = row + (int64_t)(w - 1 - x) * 3;
      orow[x * 3 + 0] = p[0];
      orow[x * 3 + 1] = p[1];
      orow[x * 3 + 2] = p[2];
    }
  }
}

namespace {

// Catmull-Rom-style cubic kernel with a = -0.5 (PIL/torch "bicubic")
inline float cubic(float x) {
  const float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct Taps {
  int first;
  int n;
  const float* w;  // points into the shared weight buffer
};

// Antialiased sampling (PIL ImagingResample semantics): when downscaling the
// cubic kernel's support is stretched by the scale factor, so every source
// pixel in the box contributes — this is what torchvision's PIL-backed
// bicubic resize does, and what the reference's transforms inherit.
void make_taps(std::vector<Taps>& taps, std::vector<float>& wbuf, float lo,
               float len, int out, int src_size) {
  taps.resize(out);
  float scale = len / out;
  float filterscale = std::max(scale, 1.0f);
  float support = 2.0f * filterscale;  // cubic kernel radius × scale
  int max_taps = (int)std::ceil(support) * 2 + 2;
  wbuf.assign((size_t)out * max_taps, 0.0f);
  for (int o = 0; o < out; ++o) {
    float center = lo + (o + 0.5f) * scale;
    int xmin = std::max(0, (int)(center - support + 0.5f));
    int xmax = std::min(src_size, (int)(center + support + 0.5f));
    int n = xmax - xmin;
    float* w = &wbuf[(size_t)o * max_taps];
    float sum = 0.0f;
    for (int k = 0; k < n; ++k) {
      float wk = cubic((xmin + k + 0.5f - center) / filterscale);
      w[k] = wk;
      sum += wk;
    }
    if (sum != 0.0f)
      for (int k = 0; k < n; ++k) w[k] /= sum;
    taps[o].first = xmin;
    taps[o].n = n;
    taps[o].w = w;
  }
}

}  // namespace

// Bicubic resize of crop box (top, left, bh, bw) of an (h, w, 3) uint8 image
// to (oh, ow, 3) uint8 — the crop is folded into the tap positions, so
// RandomResizedCrop = one call.
void resize_bicubic_crop_u8(const uint8_t* in, int h, int w, float top,
                            float left, float bh, float bw, uint8_t* out,
                            int oh, int ow) {
  std::vector<Taps> xt, yt;
  std::vector<float> xw, yw;
  make_taps(xt, xw, left, bw, ow, w);
  make_taps(yt, yw, top, bh, oh, h);

  // horizontal pass into a float intermediate restricted to the rows the
  // vertical pass will touch
  int y_lo = h, y_hi = 0;
  for (int o = 0; o < oh; ++o) {
    y_lo = std::min(y_lo, yt[o].first);
    y_hi = std::max(y_hi, yt[o].first + yt[o].n - 1);
  }
  int rows = y_hi - y_lo + 1;
  std::vector<float> tmp((int64_t)rows * ow * 3);
  for (int y = 0; y < rows; ++y) {
    const uint8_t* row = in + (int64_t)(y + y_lo) * w * 3;
    float* trow = &tmp[(int64_t)y * ow * 3];
    for (int x = 0; x < ow; ++x) {
      const Taps& t = xt[x];
      float acc0 = 0.0f, acc1 = 0.0f, acc2 = 0.0f;
      const uint8_t* p = row + (int64_t)t.first * 3;
      for (int k = 0; k < t.n; ++k) {
        float wk = t.w[k];
        acc0 += wk * p[k * 3 + 0];
        acc1 += wk * p[k * 3 + 1];
        acc2 += wk * p[k * 3 + 2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass
  for (int y = 0; y < oh; ++y) {
    const Taps& t = yt[y];
    uint8_t* orow = out + (int64_t)y * ow * 3;
    for (int x = 0; x < ow * 3; ++x) {
      float acc = 0.0f;
      for (int k = 0; k < t.n; ++k)
        acc += t.w[k] * tmp[(int64_t)(t.first + k - y_lo) * ow * 3 + x];
      orow[x] = (uint8_t)std::clamp((int)std::lround(acc), 0, 255);
    }
  }
}

}  // extern "C"
