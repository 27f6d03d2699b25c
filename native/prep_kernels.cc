// Host-side data-preparation kernels (C shared library).
//
// The reference's input pipeline leans on native code for its hot
// host-side loops: torch DataLoader C++ workers, numba-jitted box math
// (mmdet3d/core/bbox/box_np_ops.py), and the per-sample python
// rasterizers (tools/create_range_images.py:66-120,
// tools/create_elevation.py:60-78, pipelines/loading.py:88-104).  This
// library provides the TPU rebuild's equivalents as tight C loops,
// exposed over a plain C ABI consumed via ctypes
// (efficient_multimodal_perception_tpu/data/native.py), with numpy
// fallbacks when the library is absent.
//
// Build: see native/Makefile (cc -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Spherical range projection with nearest-point-wins z-buffer.
// points: (n, stride) float32, xyz in the first 3 columns.
// Outputs: range_image (h*w), range_points (h*w*3), zero-initialized by
// the caller.  Matches create_range_images.py:66-120 bit-for-bit
// (far-to-near sort then overwrite == nearest wins; ties resolved by
// sort order are irrelevant for equal depths).
void range_projection(const float* points, int64_t n, int64_t stride,
                      int32_t h, int32_t w, float fov_up_deg,
                      float fov_down_deg, float self_radius,
                      float* range_image, float* range_points) {
  const double fov_up = fov_up_deg / 180.0 * M_PI;
  const double fov_down = fov_down_deg / 180.0 * M_PI;
  const double fov = std::fabs(fov_down) + std::fabs(fov_up);

  std::memset(range_image, 0, sizeof(float) * h * w);
  std::memset(range_points, 0, sizeof(float) * h * w * 3);

  // depth buffer: keep the nearest point per pixel (equivalent to the
  // reference's descending-depth sort + last write).
  std::vector<float> best(static_cast<size_t>(h) * w, 1e30f);
  for (int64_t i = 0; i < n; ++i) {
    const float x = points[i * stride + 0];
    const float y = points[i * stride + 1];
    const float z = points[i * stride + 2];
    if (self_radius > 0 && std::fabs(x) < self_radius &&
        std::fabs(y) < self_radius) {
      continue;
    }
    const double depth = std::sqrt(double(x) * x + double(y) * y +
                                   double(z) * z);
    const double yaw = std::atan2(double(x), double(y));
    const double pitch = std::asin(double(z) / (depth + 1e-8));
    int32_t px = int32_t(std::floor(0.5 * (yaw / M_PI + 1.0) * w));
    int32_t py = int32_t(
        std::floor((1.0 - (pitch + std::fabs(fov_down)) / fov) * h));
    px = std::min(std::max(px, 0), w - 1);
    py = std::min(std::max(py, 0), h - 1);
    const size_t pix = static_cast<size_t>(py) * w + px;
    if (depth < best[pix]) {
      best[pix] = float(depth);
      range_image[pix] = float(depth);
      range_points[pix * 3 + 0] = x;
      range_points[pix * 3 + 1] = y;
      range_points[pix * 3 + 2] = z;
    }
  }
}

// Occupancy densify + 16->5 class remap (pipelines/loading.py:88-104).
// sparse: (n, 4) int32 rows (x, y, z, label16).  out: (200*200*16) int32
// zero-initialized by the caller.  remap: 17-entry int32 LUT.
void occ_densify(const int32_t* sparse, int64_t n, const int32_t* remap,
                 int32_t x_dim, int32_t y_dim, int32_t z_dim,
                 int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t x = sparse[i * 4 + 0];
    const int32_t y = sparse[i * 4 + 1];
    const int32_t z = sparse[i * 4 + 2];
    const int32_t l = sparse[i * 4 + 3];
    if (x < 0 || x >= x_dim || y < 0 || y >= y_dim || z < 0 || z >= z_dim)
      continue;
    const int32_t m = (l >= 0 && l <= 16) ? remap[l] : 0;
    out[(static_cast<size_t>(x) * y_dim + y) * z_dim + z] = m;
  }
}

// BEV max-height rasterization (tools/create_elevation.py:60-78).
// points: (n, stride) float32.  elev/mask: (nx*ny) float32/float32,
// zero-initialized by caller.
void elevation_raster(const float* points, int64_t n, int64_t stride,
                      float x0, float y0, float z0, float x1, float y1,
                      float z1, float voxel, float self_radius, float eps,
                      int32_t nx, int32_t ny, float* elev, float* mask) {
  std::vector<float> best(static_cast<size_t>(nx) * ny, -1e30f);
  for (int64_t i = 0; i < n; ++i) {
    const float x = points[i * stride + 0];
    const float y = points[i * stride + 1];
    const float z = points[i * stride + 2];
    if (self_radius > 0 && std::fabs(x) < self_radius &&
        std::fabs(y) < self_radius)
      continue;
    if (!(x > x0 + eps && y > y0 + eps && z > z0 + eps && x < x1 - eps &&
          y < y1 - eps && z < z1 - eps))
      continue;
    const int32_t ix = int32_t(std::floor((x - x0) / voxel));
    const int32_t iy = int32_t(std::floor((y - y0) / voxel));
    if (ix < 0 || ix >= nx || iy < 0 || iy >= ny) continue;
    const size_t cell = static_cast<size_t>(ix) * ny + iy;
    if (z > best[cell]) {
      best[cell] = z;
      elev[cell] = z;
      mask[cell] = 1.0f;
    }
  }
}

// Pad/crop a ragged point set into a fixed budget with validity mask,
// optionally filtering to a range (the static-shape batching hot loop).
// Returns the number of valid rows written.
int64_t pack_points(const float* points, int64_t n, int64_t dim,
                    int64_t budget, float* out, uint8_t* valid) {
  const int64_t m = std::min(n, budget);
  std::memcpy(out, points, sizeof(float) * m * dim);
  if (m < budget)
    std::memset(out + m * dim, 0, sizeof(float) * (budget - m) * dim);
  for (int64_t i = 0; i < budget; ++i) valid[i] = i < m;
  return m;
}

}  // extern "C"
