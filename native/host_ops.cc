// Native host-side preprocessing kernels for the data pipeline.
//
// The reference delegates its hot per-item label preprocessing to native
// code inside OpenCV / torch (cv2.distanceTransform + boundary maps run for
// 13-17 channels per item: celebahqedge_dataset.py:88-103,
// deepfashion_dataset.py:158-168; torch's DataLoader worker pool is C++).
// This library provides the same primitives as a dependency-free C shared
// object consumed through ctypes (cocosnet_tpu/data/native.py), with
// cv2/numpy fallbacks when it isn't built.
//
// Build: make -C native   (produces libcocosnet_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Exact L1 (cityblock) distance transform of the zero-set of `edge`
// (nonzero pixels are sources, matching cv2.distanceTransform(255-edge*255,
// DIST_L1, 3): distance to the nearest nonzero edge pixel). Two-pass
// chamfer with orthogonal cost 1 / diagonal cost 2 == exact L1.
// Output is clip(dist/3, 0, 255) as uint8 — the map the datasets store.
void distance_transform_l1_u8(const uint8_t* edge, int h, int w,
                              uint8_t* out) {
  const int32_t INF = 1 << 29;
  std::vector<int32_t> d(static_cast<size_t>(h) * w);
  for (int i = 0; i < h * w; ++i) d[i] = edge[i] ? 0 : INF;

  // forward pass (top-left -> bottom-right)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int32_t v = d[y * w + x];
      if (x > 0) v = std::min(v, d[y * w + x - 1] + 1);
      if (y > 0) {
        v = std::min(v, d[(y - 1) * w + x] + 1);
        if (x > 0) v = std::min(v, d[(y - 1) * w + x - 1] + 2);
        if (x + 1 < w) v = std::min(v, d[(y - 1) * w + x + 1] + 2);
      }
      d[y * w + x] = v;
    }
  }
  // backward pass (bottom-right -> top-left)
  for (int y = h - 1; y >= 0; --y) {
    for (int x = w - 1; x >= 0; --x) {
      int32_t v = d[y * w + x];
      if (x + 1 < w) v = std::min(v, d[y * w + x + 1] + 1);
      if (y + 1 < h) {
        v = std::min(v, d[(y + 1) * w + x] + 1);
        if (x + 1 < w) v = std::min(v, d[(y + 1) * w + x + 1] + 2);
        if (x > 0) v = std::min(v, d[(y + 1) * w + x - 1] + 2);
      }
      d[y * w + x] = v;
    }
  }
  for (int i = 0; i < h * w; ++i) {
    int32_t scaled = d[i] / 3;
    out[i] = static_cast<uint8_t>(std::min(scaled, 255));
  }
}

// Inter-region boundary map (celebahqedge_dataset.py:69-74): marks both
// pixels of every horizontally/vertically adjacent pair whose labels differ.
// OR-accumulates into `edge` (uint8 0/1), like the reference's |= updates.
void mask_edges_u8(uint8_t* edge, const uint8_t* labels, int h, int w) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = labels + y * w;
    uint8_t* erow = edge + y * w;
    for (int x = 0; x + 1 < w; ++x) {
      if (row[x] != row[x + 1]) {
        erow[x] = 1;
        erow[x + 1] = 1;
      }
    }
  }
  for (int y = 0; y + 1 < h; ++y) {
    const uint8_t* row0 = labels + y * w;
    const uint8_t* row1 = labels + (y + 1) * w;
    uint8_t* e0 = edge + y * w;
    uint8_t* e1 = edge + (y + 1) * w;
    for (int x = 0; x < w; ++x) {
      if (row0[x] != row1[x]) {
        e0[x] = 1;
        e1[x] = 1;
      }
    }
  }
}

// uint8 HWC image -> float32 HWC in [-1, 1] ((x/255 - .5)/.5), the
// ToTensor+Normalize tail of every image transform (base_dataset.py:77-82).
void normalize_u8_to_f32(const uint8_t* src, int n, float* dst) {
  constexpr float kScale = 2.0f / 255.0f;
  for (int i = 0; i < n; ++i) dst[i] = src[i] * kScale - 1.0f;
}

// Nearest-neighbour resize of a single uint8 plane with the torch/PIL
// 'nearest' index map src = floor(dst * in/out) (matches
// ops/image.py::resize_nearest on host).
void resize_nearest_u8(const uint8_t* src, int sh, int sw,
                       uint8_t* dst, int dh, int dw) {
  std::vector<int> xmap(dw);
  for (int x = 0; x < dw; ++x) {
    int sx = static_cast<int>(static_cast<int64_t>(x) * sw / dw);
    xmap[x] = std::min(sx, sw - 1);
  }
  for (int y = 0; y < dh; ++y) {
    int sy = std::min(static_cast<int>(static_cast<int64_t>(y) * sh / dh),
                      sh - 1);
    const uint8_t* srow = src + static_cast<size_t>(sy) * sw;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw;
    for (int x = 0; x < dw; ++x) drow[x] = srow[xmap[x]];
  }
}

// Canny edge detection of a uint8 grayscale plane, mirroring
// cocosnet_tpu/data/edges.py::canny (itself skimage-default Canny: sigma=1
// border-corrected gaussian -> sobel -> quantized non-max suppression ->
// hysteresis). Same double-precision op order as the Python/scipy path so
// results agree to within threshold-tie pixels. Output: uint8 0/1.
void canny_u8(const uint8_t* gray, int h, int w, float sigma,
              float low, float high, uint8_t* out) {
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<double> img(n);
  for (size_t i = 0; i < n; ++i) img[i] = gray[i] / 255.0;

  // --- gaussian smoothing, mode="constant", truncate=4.0 (scipy default),
  // with border support correction (smooth an all-ones mask identically)
  const int radius = static_cast<int>(4.0 * sigma + 0.5);
  std::vector<double> kern(2 * radius + 1);
  double ksum = 0.0;
  for (int i = -radius; i <= radius; ++i) {
    kern[i + radius] = std::exp(-0.5 * (i * i) / (sigma * sigma));
    ksum += kern[i + radius];
  }
  for (double& k : kern) k /= ksum;

  auto conv1d = [&](const std::vector<double>& src, bool horizontal) {
    std::vector<double> dst(n, 0.0);
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        double acc = 0.0;
        for (int t = -radius; t <= radius; ++t) {
          int yy = y, xx = x;
          if (horizontal) xx += t; else yy += t;
          if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;  // constant 0
          acc += kern[t + radius] * src[static_cast<size_t>(yy) * w + xx];
        }
        dst[static_cast<size_t>(y) * w + x] = acc;
      }
    }
    return dst;
  };
  std::vector<double> sm = conv1d(conv1d(img, true), false);
  std::vector<double> ones(n, 1.0);
  std::vector<double> support = conv1d(conv1d(ones, true), false);
  for (size_t i = 0; i < n; ++i)
    sm[i] /= std::max(support[i], 1e-12);

  // --- sobel, mode="reflect" ((d c b a | a b c d): clamp-and-mirror)
  auto ref = [&](int v, int lim) {
    if (v < 0) v = -v - 1;
    if (v >= lim) v = 2 * lim - v - 1;
    return v;
  };
  auto at = [&](int y, int x) {
    return sm[static_cast<size_t>(ref(y, h)) * w + ref(x, w)];
  };
  std::vector<double> gx(n), gy(n), mag(n);
  double mag_max = 0.0;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // scipy ndi.sobel(axis=1): smooth [1,2,1] over rows, diff [-1,0,1]
      // over cols (sign matches scipy's correlate convention; magnitude is
      // sign-invariant so only |g| matters downstream)
      double dx = (at(y - 1, x + 1) + 2 * at(y, x + 1) + at(y + 1, x + 1))
                - (at(y - 1, x - 1) + 2 * at(y, x - 1) + at(y + 1, x - 1));
      double dy = (at(y + 1, x - 1) + 2 * at(y + 1, x) + at(y + 1, x + 1))
                - (at(y - 1, x - 1) + 2 * at(y - 1, x) + at(y - 1, x + 1));
      size_t i = static_cast<size_t>(y) * w + x;
      gx[i] = dx;
      gy[i] = dy;
      mag[i] = std::hypot(dx, dy);
      mag_max = std::max(mag_max, mag[i]);
    }
  }
  std::memset(out, 0, n);
  if (mag_max == 0.0) return;

  // --- quantized-direction non-max suppression (data/edges.py:56-71)
  std::vector<double> nms(n, 0.0);
  const double kPi = 3.14159265358979323846;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      size_t i = static_cast<size_t>(y) * w + x;
      double angle = std::atan2(gy[i], gx[i]) * 180.0 / kPi;
      angle = std::fmod(std::fmod(angle, 180.0) + 180.0, 180.0);
      int quant = (static_cast<int>(std::floor((angle + 22.5) / 45.0)) % 4);
      auto padded = [&](int yy, int xx) {
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) return 0.0;  // zero pad
        return mag[static_cast<size_t>(yy) * w + xx];
      };
      double n1, n2;
      switch (quant) {
        case 0: n1 = padded(y, x + 1);     n2 = padded(y, x - 1);     break;
        case 1: n1 = padded(y - 1, x + 1); n2 = padded(y + 1, x - 1); break;
        case 2: n1 = padded(y - 1, x);     n2 = padded(y + 1, x);     break;
        default: n1 = padded(y - 1, x - 1); n2 = padded(y + 1, x + 1); break;
      }
      if (mag[i] >= n1 && mag[i] >= n2) nms[i] = mag[i];
    }
  }

  // --- hysteresis: BFS from strong pixels through weak (8-connected),
  // equivalent to edges.py's connected-component keep
  std::vector<uint8_t> weak(n), visited(n, 0);
  std::vector<size_t> stack;
  for (size_t i = 0; i < n; ++i) {
    weak[i] = nms[i] >= low;
    if (nms[i] >= high && !visited[i]) {
      visited[i] = 1;
      stack.push_back(i);
    }
  }
  while (!stack.empty()) {
    size_t i = stack.back();
    stack.pop_back();
    out[i] = 1;
    int y = static_cast<int>(i / w), x = static_cast<int>(i % w);
    for (int dy2 = -1; dy2 <= 1; ++dy2) {
      for (int dx2 = -1; dx2 <= 1; ++dx2) {
        int yy = y + dy2, xx = x + dx2;
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        size_t j = static_cast<size_t>(yy) * w + xx;
        if (!visited[j] && weak[j]) {
          visited[j] = 1;
          stack.push_back(j);
        }
      }
    }
  }
}

}  // extern "C"
