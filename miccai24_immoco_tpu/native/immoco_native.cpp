// immoco_native: host data-plane kernels for the TPU framework.
//
// The reference's host pipeline is pure Python (SURVEY.md §2: h5 slicing,
// RSS combine, run-length grouping, KB tables, torch-pickle corpora).  This
// library supplies native equivalents for the pieces that run per-volume /
// per-slice on the host while the TPU is busy:
//
//   - rss_combine_crop: multi-coil complex slice -> center crop + RSS
//     (separate Re/Im, the reference data_utils.py:60-75 convention)
//   - run_length_groups: corrupted-column indicators -> 1-based group ids
//     (motion_utils.py:56-109 semantics)
//   - ugly_number / kb_table: 2/3/5-smooth sizes + Kaiser-Bessel kernel
//     tables (pytorch_nufft nufft.py:78-137)
//   - packfile: a dependency-free binary corpus format (header + raw
//     complex64 slices) with O(1) random slice reads via pread — the
//     data-loader replacement for zlib-compressed npz when streaming
//     training batches.
//
// C ABI only (ctypes-wrapped from Python; no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC -o libimmoco_native.so immoco_native.cpp -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------- RSS combine
// re/im: (coils, h, w) row-major; out_re/out_im: (crop, crop).
// RSS applied separately to Re and Im (reference quirk, data_utils.py:60-75).
void rss_combine_crop(const float* re, const float* im, int coils, int h,
                      int w, int crop, float* out_re, float* out_im) {
  const int cy = h / 2 - crop / 2;
  const int cx = w / 2 - crop / 2;
  const long plane = (long)h * w;
  int nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;
  if (nthreads > crop) nthreads = crop;
  std::vector<std::thread> workers;
  auto body = [&](int row0, int row1) {
    for (int y = row0; y < row1; ++y) {
      const long src_row = (long)(cy + y) * w + cx;
      for (int x = 0; x < crop; ++x) {
        float acc_re = 0.f, acc_im = 0.f;
        for (int c = 0; c < coils; ++c) {
          const float vr = re[c * plane + src_row + x];
          const float vi = im[c * plane + src_row + x];
          acc_re += vr * vr;
          acc_im += vi * vi;
        }
        out_re[(long)y * crop + x] = std::sqrt(acc_re);
        out_im[(long)y * crop + x] = std::sqrt(acc_im);
      }
    }
  };
  const int rows_per = (crop + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int r0 = t * rows_per;
    int r1 = r0 + rows_per < crop ? r0 + rows_per : crop;
    if (r0 >= r1) break;
    workers.emplace_back(body, r0, r1);
  }
  for (auto& th : workers) th.join();
}

// ------------------------------------------------------------- run-length ids
// ind: (w,) 0/1; out: (w,) 0 for clean, k for k-th contiguous run.
// Returns the number of groups.
int run_length_groups(const uint8_t* ind, int w, int32_t* out) {
  int count = 0;
  int prev = 0;
  for (int i = 0; i < w; ++i) {
    if (ind[i]) {
      if (!prev) ++count;
      out[i] = count;
    } else {
      out[i] = 0;
    }
    prev = ind[i] != 0;
  }
  return count;
}

// ---------------------------------------------------------------- ugly number
long ugly_number(long n) {
  if (n <= 1) return n;
  std::vector<long> ugly{1};
  size_t i2 = 0, i3 = 0, i5 = 0;
  for (;;) {
    long nxt = ugly[i2] * 2;
    if (ugly[i3] * 3 < nxt) nxt = ugly[i3] * 3;
    if (ugly[i5] * 5 < nxt) nxt = ugly[i5] * 5;
    if (nxt >= n) return nxt;
    ugly.push_back(nxt);
    if (nxt == ugly[i2] * 2) ++i2;
    if (nxt == ugly[i3] * 3) ++i3;
    if (nxt == ugly[i5] * 5) ++i5;
  }
}

// ------------------------------------------------------------------- KB table
// Modified Bessel I0 via the series (converges fast for the beta range used).
static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  const double hx = x / 2.0;
  for (int k = 1; k < 64; ++k) {
    term *= (hx / k) * (hx / k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

void kb_table(int n, double width, double beta, float* out) {
  for (int i = 0; i < n; ++i) {
    const double x = (double)i / n;
    out[i] = (float)(bessel_i0(beta * std::sqrt(1.0 - x * x)) / width);
  }
}

// ------------------------------------------------------------------- packfile
// Layout: magic "IMCO" | uint32 version | int64 n | int32 h | int32 w |
//         int32 channels | payload: n records of h*w*channels float32.
struct PackHeader {
  char magic[4];
  uint32_t version;
  int64_t n;
  int32_t h, w, channels;
};

int pack_write(const char* path, const float* data, int64_t n, int32_t h,
               int32_t w, int32_t channels) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  PackHeader hdr{{'I', 'M', 'C', 'O'}, 1u, n, h, w, channels};
  if (std::fwrite(&hdr, sizeof(hdr), 1, f) != 1) { std::fclose(f); return -2; }
  const size_t per = (size_t)h * w * channels;
  if (std::fwrite(data, sizeof(float), per * (size_t)n, f) != per * (size_t)n) {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);
  return 0;
}

int64_t pack_read_header(const char* path, int32_t* h, int32_t* w,
                         int32_t* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  PackHeader hdr;
  if (std::fread(&hdr, sizeof(hdr), 1, f) != 1 ||
      std::memcmp(hdr.magic, "IMCO", 4) != 0) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  *h = hdr.h;
  *w = hdr.w;
  *channels = hdr.channels;
  return hdr.n;
}

// Reads `count` slices starting at `idx` into out. Returns 0 on success.
int pack_read_slices(const char* path, int64_t idx, int64_t count,
                     float* out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  PackHeader hdr;
  if (::pread(fd, &hdr, sizeof(hdr), 0) != (ssize_t)sizeof(hdr) ||
      std::memcmp(hdr.magic, "IMCO", 4) != 0) {
    ::close(fd);
    return -2;
  }
  if (idx < 0 || idx + count > hdr.n) {
    ::close(fd);
    return -3;
  }
  const size_t per_bytes = (size_t)hdr.h * hdr.w * hdr.channels * sizeof(float);
  const off_t off = (off_t)sizeof(hdr) + (off_t)idx * per_bytes;
  size_t want = per_bytes * (size_t)count;
  size_t got = 0;
  while (got < want) {
    ssize_t r = ::pread(fd, (char*)out + got, want - got, off + got);
    if (r <= 0) {
      ::close(fd);
      return -4;
    }
    got += (size_t)r;
  }
  ::close(fd);
  return 0;
}

}  // extern "C"
