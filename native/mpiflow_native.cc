// mpiflow_native: host-side native runtime for mpiflow-tpu.
//
// Components (clean-room, interface-compatible with the reference's native
// pieces where applicable):
//   * flo_write / flo_encode : Middlebury .flo serialization (the hot host
//     path of dataset generation writes one .flo per sample; this avoids
//     the Python-level interleave + two buffer copies).
//   * forward_warp_zbuffer   : z-buffered forward splat with the exact
//     valid/collision semantics of the reference's C extension
//     (external/forward_warping/warping.c) -- used as a CPU oracle for the
//     TPU kernel and as a host fallback.
//   * ppm_write              : raw PPM image dump (debug sink that needs no
//     external codecs).
//
// Build: make -C native   (g++ -O3 -fPIC -shared)
// Python bindings: mpiflow_tpu/io/native.py (ctypes).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- .flo IO
// layout: "PIEH" tag float 202021.25, int32 W, int32 H, row-major
// interleaved float32 (u, v) pairs. Little-endian.
int flo_encode(const float* uv /* [h*w*2] (u,v) interleaved */, int h, int w,
               unsigned char* out /* [12 + h*w*8] */) {
  const float tag = 202021.25f;
  std::memcpy(out, &tag, 4);
  std::memcpy(out + 4, &w, 4);
  std::memcpy(out + 8, &h, 4);
  std::memcpy(out + 12, uv, static_cast<size_t>(h) * w * 2 * sizeof(float));
  return 12 + h * w * 8;
}

int flo_write(const char* path, const float* uv, int h, int w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const float tag = 202021.25f;
  bool ok = std::fwrite(&tag, 4, 1, f) == 1 && std::fwrite(&w, 4, 1, f) == 1 &&
            std::fwrite(&h, 4, 1, f) == 1 &&
            std::fwrite(uv, sizeof(float), static_cast<size_t>(h) * w * 2,
                        f) == static_cast<size_t>(h) * w * 2;
  std::fclose(f);
  return ok ? 0 : -2;
}

int flo_read(const char* path, float* uv, int max_elems, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  float tag;
  if (std::fread(&tag, 4, 1, f) != 1 || tag != 202021.25f) {
    std::fclose(f);
    return -2;
  }
  if (std::fread(w, 4, 1, f) != 1 || std::fread(h, 4, 1, f) != 1) {
    std::fclose(f);
    return -3;
  }
  const long n = static_cast<long>(*h) * (*w) * 2;
  if (n > max_elems) {
    std::fclose(f);
    return -4;
  }
  const bool ok = std::fread(uv, sizeof(float), n, f) == static_cast<size_t>(n);
  std::fclose(f);
  return ok ? 0 : -5;
}

// -------------------------------------------------------- forward warping
// Raster-order z-buffer splat; semantics identical to the reference
// extension: per target, rgb is written when the writer's z is below the
// PREVIOUS writer's z; valid = any writer; collision = exactly one writer.
// warped layout: [h, w, 5] u8 = (r, g, b, valid, collision).
void forward_warp_zbuffer(const unsigned char* src /* [h*w*3] */,
                          const int64_t* idx, const int64_t* idy,
                          const float* z, unsigned char* warped, int h,
                          int w) {
  std::vector<float> last_z(static_cast<size_t>(h) * w, 1000.0f);
  std::memset(warped, 0, static_cast<size_t>(h) * w * 5);
  for (long p = 0; p < static_cast<long>(h) * w; ++p) {
    const long x = idx[p];
    const long y = idy[p];
    const long t = y * w + x;
    if (z[p] < last_z[t]) {
      warped[t * 5 + 0] = src[p * 3 + 0];
      warped[t * 5 + 1] = src[p * 3 + 1];
      warped[t * 5 + 2] = src[p * 3 + 2];
    }
    warped[t * 5 + 3] = 1;
    warped[t * 5 + 4] = (last_z[t] == 1000.0f) ? 1 : 0;
    last_z[t] = z[p];
  }
}

// Min-z variant (production semantics): the nearest writer wins.
void forward_warp_minz(const unsigned char* src, const int64_t* idx,
                       const int64_t* idy, const float* z,
                       unsigned char* warped, int h, int w) {
  std::vector<float> best(static_cast<size_t>(h) * w, 1e30f);
  std::vector<int32_t> count(static_cast<size_t>(h) * w, 0);
  std::memset(warped, 0, static_cast<size_t>(h) * w * 5);
  for (long p = 0; p < static_cast<long>(h) * w; ++p) {
    const long t = idy[p] * w + idx[p];
    ++count[t];
    if (z[p] < best[t]) {
      best[t] = z[p];
      warped[t * 5 + 0] = src[p * 3 + 0];
      warped[t * 5 + 1] = src[p * 3 + 1];
      warped[t * 5 + 2] = src[p * 3 + 2];
    }
  }
  for (long t = 0; t < static_cast<long>(h) * w; ++t) {
    warped[t * 5 + 3] = count[t] > 0;
    warped[t * 5 + 4] = count[t] == 1;
  }
}

// ---------------------------------------------------------------- PPM IO
int ppm_write(const char* path, const unsigned char* rgb, int h, int w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "P6\n%d %d\n255\n", w, h);
  const bool ok = std::fwrite(rgb, 1, static_cast<size_t>(h) * w * 3, f) ==
                  static_cast<size_t>(h) * w * 3;
  std::fclose(f);
  return ok ? 0 : -2;
}

}  // extern "C"
