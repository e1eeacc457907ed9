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

}  // extern "C"
