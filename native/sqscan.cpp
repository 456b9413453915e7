// sqscan — from-source replacement for the reference's pre-built
// `data/scanner` ELF (SURVEY.md §2.2: sq class N1, ray-cast renderer N2,
// BMP writer N5). The reference ships only the binary; this reimplements
// the verified black-box behavior:
//
//   CLI: sqscan out.bmp a1 a2 a3 e1 e2 px py pz r11 r12 ... r33
//   -> 256x256 24-bit grayscale BMP, orthographic view along -z,
//      col = world x, row counted from the image bottom = world y,
//      pixel value = floor(max surface z along the ray), background 0.
//
// Also exported as a C ABI (sq_render_depth / sq_render_batch) so the
// Python framework can drive bulk host-side data generation through
// ctypes with zero process-spawn overhead (the reference forked one C++
// process per image, gen_rand_rot.py:14-33).
//
// Algorithm: superquadrics with e1,e2 in (0,2] are convex, so the
// inside interval along a -z ray is contiguous: sweep z slabs from far
// to near for the first inside hit, then bisect the surface crossing.
// Same algorithm as sqtpu.ops.render.render_depth_hard (the two are
// cross-checked in tests/test_native.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct SQ {
  double a[3];   // sizes, world units
  double e[2];   // shape exponents
  double t[3];   // position, world units
  double R[9];   // row-major rotation matrix (SQ orientation)
};

// Inside-outside function F(p_world)^e1, torch-convention exponent chain
// with the +1e-4 zero guards on squared coordinates (classes.py:168-184).
// Units: callers pass world coords; normalization happens via a[].
inline double field(const SQ& s, double wx, double wy, double wz) {
  const double px = wx - s.t[0], py = wy - s.t[1], pz = wz - s.t[2];
  // local = R^T (world - t)
  const double lx = s.R[0] * px + s.R[3] * py + s.R[6] * pz;
  const double ly = s.R[1] * px + s.R[4] * py + s.R[7] * pz;
  const double lz = s.R[2] * px + s.R[5] * py + s.R[8] * pz;
  double x2 = (lx / s.a[0]) * (lx / s.a[0]);
  double y2 = (ly / s.a[1]) * (ly / s.a[1]);
  double z2 = (lz / s.a[2]) * (lz / s.a[2]);
  if (x2 == 0.0) x2 += 1e-4;
  if (y2 == 0.0) y2 += 1e-4;
  if (z2 == 0.0) z2 += 1e-4;
  const double A = std::pow(x2, 1.0 / s.e[1]);
  const double B = std::pow(y2, 1.0 / s.e[1]);
  const double C = std::pow(z2, 1.0 / s.e[0]);
  const double E = std::pow(A + B, s.e[1] / s.e[0]);
  return std::pow(E + C, s.e[0]);
}

// Max-z surface crossing for the ray through (x, y); negative if no hit.
inline double ray_max_z(const SQ& s, double x, double y, int n_sweep,
                        int n_bisect, double z_max) {
  const double step = z_max / (n_sweep - 1);
  double lo = -1.0;
  for (int k = n_sweep - 1; k >= 0; --k) {
    const double z = k * step;
    if (field(s, x, y, z) <= 1.0) {
      lo = z;
      break;
    }
  }
  if (lo < 0.0) return -1.0;
  double hi = lo + step;
  for (int i = 0; i < n_bisect; ++i) {
    const double mid = 0.5 * (lo + hi);
    if (field(s, x, y, mid) <= 1.0)
      lo = mid;
    else
      hi = mid;
  }
  return lo;
}

}  // namespace

extern "C" {

// Render one depth map. params = [a1 a2 a3 e1 e2 px py pz r11..r33]
// (world units, the CLI layout). out is size*size bytes, row 0 = image
// TOP (cv2 convention; world y = size-1-row).
void sq_render_depth(const double* params, uint8_t* out, int size,
                     int n_sweep, int n_bisect) {
  SQ s;
  std::memcpy(s.a, params, 3 * sizeof(double));
  std::memcpy(s.e, params + 3, 2 * sizeof(double));
  std::memcpy(s.t, params + 5, 3 * sizeof(double));
  std::memcpy(s.R, params + 8, 9 * sizeof(double));
  const double z_max = 255.0;
  const double scale = 255.0 / (size - 1);
#pragma omp parallel for schedule(static)
  for (int row = 0; row < size; ++row) {
    const double y = (size - 1 - row) * scale;
    for (int col = 0; col < size; ++col) {
      const double x = col * scale;
      const double z = ray_max_z(s, x, y, n_sweep, n_bisect, z_max);
      out[row * size + col] =
          z < 0.0 ? 0 : static_cast<uint8_t>(std::floor(z));
    }
  }
}

// Bulk renderer: n images from (n, 17) world-unit param rows.
void sq_render_batch(const double* params, uint8_t* out, int n, int size,
                     int n_sweep, int n_bisect) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    // serial inner render (outer loop already saturates cores)
    SQ s;
    const double* p = params + i * 17;
    std::memcpy(s.a, p, 3 * sizeof(double));
    std::memcpy(s.e, p + 3, 2 * sizeof(double));
    std::memcpy(s.t, p + 5, 3 * sizeof(double));
    std::memcpy(s.R, p + 8, 9 * sizeof(double));
    uint8_t* img = out + static_cast<long>(i) * size * size;
    const double scale = 255.0 / (size - 1);
    for (int row = 0; row < size; ++row) {
      const double y = (size - 1 - row) * scale;
      for (int col = 0; col < size; ++col) {
        const double z =
            ray_max_z(s, col * scale, y, n_sweep, n_bisect, 255.0);
        img[row * size + col] =
            z < 0.0 ? 0 : static_cast<uint8_t>(std::floor(z));
      }
    }
  }
}

// 24-bit grayscale BMP, scanner-identical layout (196,662 B for 256^2).
int sq_write_bmp(const char* path, const uint8_t* img, int w, int h) {
  const int row_bytes = (w * 3 + 3) & ~3;
  const int data_size = row_bytes * h;
  const int file_size = 54 + data_size;
  uint8_t header[54] = {0};
  header[0] = 'B';
  header[1] = 'M';
  std::memcpy(header + 2, &file_size, 4);
  header[10] = 54;
  const int info_size = 40, planes = 1, bpp = 24;
  std::memcpy(header + 14, &info_size, 4);
  std::memcpy(header + 18, &w, 4);
  std::memcpy(header + 22, &h, 4);
  std::memcpy(header + 26, &planes, 2);
  std::memcpy(header + 28, &bpp, 2);
  std::memcpy(header + 34, &data_size, 4);
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fwrite(header, 1, 54, f);
  std::vector<uint8_t> row(row_bytes, 0);
  for (int r = h - 1; r >= 0; --r) {  // bottom-up
    for (int c = 0; c < w; ++c) {
      const uint8_t v = img[r * w + c];
      row[c * 3] = v;
      row[c * 3 + 1] = v;
      row[c * 3 + 2] = v;
    }
    std::fwrite(row.data(), 1, row_bytes, f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"

#ifdef SQSCAN_MAIN
int main(int argc, char** argv) {
  if (argc != 19) {
    std::fprintf(stderr,
                 "usage: %s out.bmp a1 a2 a3 e1 e2 px py pz "
                 "r11 r12 r13 r21 r22 r23 r31 r32 r33\n",
                 argv[0]);
    return 1;
  }
  double params[17];
  for (int i = 0; i < 17; ++i) params[i] = std::atof(argv[i + 2]);
  const int size = 256;
  std::vector<uint8_t> img(size * size);
  sq_render_depth(params, img.data(), size, size, 30);
  return sq_write_bmp(argv[1], img.data(), size, size);
}
#endif
