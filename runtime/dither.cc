// Native dataset-generation kernels.
//
// TPU-native counterpart of the reference's four Numba @njit kernels in
// dataset_generator/quantize.py (the reference's only "custom kernels",
// SURVEY §2). The vectorizable kernels (checkerboard, ordered/Bayer) also
// have JAX implementations for on-device batching; serpentine error
// diffusion is inherently sequential per pixel, so it lives here as real
// native code, loaded via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC dither.cc -o libdither.so
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Index of the closest palette colour (squared-Euclidean RGB).
// Counterpart of quantize.py:64-81.
int closest_color_index(const double* pixel, const double* palette, int n) {
  double best = 1e300;
  int best_i = 0;
  for (int i = 0; i < n; ++i) {
    const double dr = pixel[0] - palette[3 * i];
    const double dg = pixel[1] - palette[3 * i + 1];
    const double db = pixel[2] - palette[3 * i + 2];
    const double d = dr * dr + dg * dg + db * db;
    if (d < best) {
      best = d;
      best_i = i;
    }
  }
  return best_i;
}

// Serpentine error-diffusion dithering onto a palette, in place.
// img: (h, w, 3) float64. palette: (n_pal, 3) float64.
// Diffusion map given as parallel arrays (dx, dy, weight).
// Semantics mirror quantize.py:84-134: snake rows with mirrored dx on odd
// rows, diffusion only to strictly-future pixels, clamp to [0,255] after
// each deposit.
void error_diffusion(double* img, int h, int w, const double* palette,
                     int n_pal, const int* dxs, const int* dys,
                     const double* wgts, int n_diff) {
  if (n_pal <= 0) return;  // empty palette: nothing to map onto
  for (int y = 0; y < h; ++y) {
    const bool forward = (y % 2 == 0);
    for (int step = 0; step < w; ++step) {
      const int x = forward ? step : (w - 1 - step);
      double* px = img + (static_cast<int64_t>(y) * w + x) * 3;
      const int ci = closest_color_index(px, palette, n_pal);
      const double* c = palette + 3 * ci;
      const double er = px[0] - c[0];
      const double eg = px[1] - c[1];
      const double eb = px[2] - c[2];
      px[0] = c[0];
      px[1] = c[1];
      px[2] = c[2];
      if (er == 0.0 && eg == 0.0 && eb == 0.0) continue;
      for (int k = 0; k < n_diff; ++k) {
        const int edx = forward ? dxs[k] : -dxs[k];
        const int nx = x + edx;
        const int ny = y + dys[k];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        const bool future =
            (ny > y) || (ny == y && ((forward && nx > x) || (!forward && nx < x)));
        if (!future) continue;
        double* q = img + (static_cast<int64_t>(ny) * w + nx) * 3;
        const double wgt = wgts[k];
        for (int ch = 0; ch < 3; ++ch) {
          const double e = (ch == 0 ? er : (ch == 1 ? eg : eb));
          double v = q[ch] + e * wgt;
          if (v < 0.0) v = 0.0;
          if (v > 255.0) v = 255.0;
          q[ch] = v;
        }
      }
    }
  }
}

// Checkerboard two-nearest-colour dithering (quantize.py:136-229).
// in: (h,w,3) float64; pal_f: (n,3) float64; pal_u8: (n,3) uint8;
// out: (h,w,3) uint8.
void checkerboard(const double* img, int h, int w, const double* pal_f,
                  const uint8_t* pal_u8, int n_pal, uint8_t* out) {
  if (n_pal <= 0) {
    std::memset(out, 0, static_cast<size_t>(h) * w * 3);
    return;
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const double* px = img + (static_cast<int64_t>(y) * w + x) * 3;
      double best1 = 1e300, best2 = 1e300;
      int i1 = 0, i2 = 0;
      for (int i = 0; i < n_pal; ++i) {
        const double dr = px[0] - pal_f[3 * i];
        const double dg = px[1] - pal_f[3 * i + 1];
        const double db = px[2] - pal_f[3 * i + 2];
        const double d = dr * dr + dg * dg + db * db;
        if (d < best1) {
          best2 = best1;
          i2 = i1;
          best1 = d;
          i1 = i;
        } else if (d < best2) {
          best2 = d;
          i2 = i;
        }
      }
      int chosen;
      if (best1 == 0.0 || n_pal == 1)
        chosen = i1;
      else
        chosen = ((x + y) % 2 == 0) ? i1 : i2;
      uint8_t* o = out + (static_cast<int64_t>(y) * w + x) * 3;
      o[0] = pal_u8[3 * chosen];
      o[1] = pal_u8[3 * chosen + 1];
      o[2] = pal_u8[3 * chosen + 2];
    }
  }
}

}  // extern "C"
