// Native host-side ops (C++, ctypes ABI).
//
// TPU-native framework's host runtime helpers — the counterparts of the
// reference's native code that does NOT belong on the TPU:
//
//  - render_ball: z-buffered ball-splat point renderer
//    (capability of pointnet2_tensorflow/utils/render_balls_so.cpp:1-58,
//    re-designed: painter's z-order loop with per-ball disc rasterization).
//  - three_nn_cpu: brute-force 3-NN with double accumulation
//    (capability of tf_ops/interpolation_3d/tf_interpolate.cpp:60-103) —
//    used as a host-side oracle/fast path for eval stitching.
//  - ball_query_cpu: first-k-in-order radius query
//    (capability of tf_ops/grouping/tf_grouping_g.cu:3-36) — host-side oracle.
//  - grid_chunk_assign: assigns each point to its 1.5 m grid cell and counts
//    cell membership — the O(N) inner loop of the full-scene chunker
//    (complete_scene_loader.py:31-44) for large scenes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libnative_ops.so native_ops.cpp
// (driven by build.py; no external deps).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Z-buffered ball splatting.  points: (n,3) float (already projected to
// screen space: x,y in pixels, z depth), colors: (n,3) uint8, image:
// (h,w,3) uint8 (pre-filled with background), zbuf: (h,w) float workspace
// (caller passes +inf-filled).  radius: splat radius in pixels.
void render_ball(int h, int w, unsigned char* image, float* zbuf,
                 int n, const float* points, const unsigned char* colors,
                 int radius) {
  for (int i = 0; i < n; ++i) {
    float x = points[i * 3 + 0];
    float y = points[i * 3 + 1];
    float z = points[i * 3 + 2];
    int xi = (int)std::lround(x);
    int yi = (int)std::lround(y);
    for (int dy = -radius; dy <= radius; ++dy) {
      for (int dx = -radius; dx <= radius; ++dx) {
        if (dx * dx + dy * dy > radius * radius) continue;
        int px = xi + dx, py = yi + dy;
        if (px < 0 || px >= w || py < 0 || py >= h) continue;
        // Spherical bump so overlapping balls intersect like spheres.
        float dz = std::sqrt((float)(radius * radius - dx * dx - dy * dy));
        float zz = z - dz;
        int idx = py * w + px;
        if (zz < zbuf[idx]) {
          zbuf[idx] = zz;
          image[idx * 3 + 0] = colors[i * 3 + 0];
          image[idx * 3 + 1] = colors[i * 3 + 1];
          image[idx * 3 + 2] = colors[i * 3 + 2];
        }
      }
    }
  }
}

// 3 nearest neighbors (squared L2, double accumulation like the reference's
// CPU kernel).  xyz1: (b,n,3) unknown, xyz2: (b,m,3) known.
// dist: (b,n,3) float out, idx: (b,n,3) int32 out.
void three_nn_cpu(int b, int n, int m, const float* xyz1, const float* xyz2,
                  float* dist, int32_t* idx) {
  for (int bi = 0; bi < b; ++bi) {
    const float* p1 = xyz1 + (size_t)bi * n * 3;
    const float* p2 = xyz2 + (size_t)bi * m * 3;
    float* d = dist + (size_t)bi * n * 3;
    int32_t* id = idx + (size_t)bi * n * 3;
    for (int i = 0; i < n; ++i) {
      double x1 = p1[i * 3], y1 = p1[i * 3 + 1], z1 = p1[i * 3 + 2];
      double best1 = 1e40, best2 = 1e40, best3 = 1e40;
      int besti1 = 0, besti2 = 0, besti3 = 0;
      for (int j = 0; j < m; ++j) {
        double x2 = p2[j * 3], y2 = p2[j * 3 + 1], z2 = p2[j * 3 + 2];
        double dd = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) +
                    (z2 - z1) * (z2 - z1);
        if (dd < best1) {
          best3 = best2; besti3 = besti2;
          best2 = best1; besti2 = besti1;
          best1 = dd; besti1 = j;
        } else if (dd < best2) {
          best3 = best2; besti3 = besti2;
          best2 = dd; besti2 = j;
        } else if (dd < best3) {
          best3 = dd; besti3 = j;
        }
      }
      d[i * 3] = (float)best1; d[i * 3 + 1] = (float)best2; d[i * 3 + 2] = (float)best3;
      id[i * 3] = besti1; id[i * 3 + 1] = besti2; id[i * 3 + 2] = besti3;
    }
  }
}

// First-nsample-in-order ball query (reference semantics: d = max(euclid,
// 1e-20) < radius, pad all slots with first hit).
void ball_query_cpu(int b, int n, int m, float radius, int nsample,
                    const float* xyz, const float* centers,
                    int32_t* idx, int32_t* cnt) {
  float r = radius;
  for (int bi = 0; bi < b; ++bi) {
    const float* p = xyz + (size_t)bi * n * 3;
    const float* c = centers + (size_t)bi * m * 3;
    for (int j = 0; j < m; ++j) {
      int32_t* out = idx + ((size_t)bi * m + j) * nsample;
      int count = 0;
      float x2 = c[j * 3], y2 = c[j * 3 + 1], z2 = c[j * 3 + 2];
      for (int k = 0; k < n && count < nsample; ++k) {
        float dx = x2 - p[k * 3], dy = y2 - p[k * 3 + 1], dz = z2 - p[k * 3 + 2];
        float d = std::max(std::sqrt(dx * dx + dy * dy + dz * dz), 1e-20f);
        if (d < r) {
          if (count == 0)
            for (int l = 0; l < nsample; ++l) out[l] = k;
          out[count++] = k;
        }
      }
      if (count == 0) for (int l = 0; l < nsample; ++l) out[l] = 0;
      cnt[(size_t)bi * m + j] = count;
    }
  }
}

// Grid-cell assignment for the full-scene chunker: cell = floor((xy-min)/1.5)
// with the 0.2 m context margin handled by emitting up to 4 (cell, point)
// pairs per point.  Returns number of pairs written.  pairs: (capacity, 2)
// int64 [cell_id, point_id].
int64_t grid_chunk_assign(int64_t n, const float* points,
                          float min_x, float min_y, int ncell_x, int ncell_y,
                          float cell, float margin,
                          int64_t capacity, int64_t* pairs) {
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    float x = points[i * 3] - min_x;
    float y = points[i * 3 + 1] - min_y;
    int cx_lo = (int)std::floor((x - margin) / cell);
    int cx_hi = (int)std::floor((x + margin) / cell);
    int cy_lo = (int)std::floor((y - margin) / cell);
    int cy_hi = (int)std::floor((y + margin) / cell);
    for (int cx = cx_lo; cx <= cx_hi; ++cx) {
      if (cx < 0 || cx >= ncell_x) continue;
      for (int cy = cy_lo; cy <= cy_hi; ++cy) {
        if (cy < 0 || cy >= ncell_y) continue;
        if (w < capacity) {
          pairs[w * 2] = (int64_t)cx * ncell_y + cy;
          pairs[w * 2 + 1] = i;
        }
        ++w;
      }
    }
  }
  return w;
}

}  // extern "C"
