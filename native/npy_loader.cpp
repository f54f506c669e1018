// Native data-loading tier: threaded .npy reader + padded-batch assembler.
//
// The reference leans on torch.utils.data.DataLoader worker processes
// (reference: src/train.py:553,581 num_workers) to hide file I/O and
// host-side collation. The TPU-native equivalent is this C++ assembler: it
// parses .npy headers directly (v1.0/2.0, C-order), reads float32 feature
// matrices on a thread pool, and writes them zero-padded straight into a
// caller-provided (B, T_pad, F) buffer — one pass, no intermediate Python
// objects. Bound via ctypes in data/native_loader.py.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal .npy header parse: returns element count info for a 2-D f4 array.
// On success fills rows/cols and data offset; returns 0. Nonzero = error.
int parse_npy_header_f32_2d(FILE* f, int64_t* rows, int64_t* cols,
                            int64_t* data_offset) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return 1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return 2;
  const int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char hl[2];
    if (fread(hl, 1, 2, f) != 2) return 3;
    header_len = hl[0] | (hl[1] << 8);
    *data_offset = 10 + header_len;
  } else {
    unsigned char hl[4];
    if (fread(hl, 1, 4, f) != 4) return 3;
    header_len = hl[0] | (hl[1] << 8) | (hl[2] << 16) | (hl[3] << 24);
    *data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(header.data(), 1, header_len, f) != header_len) return 4;
  if (header.find("'<f4'") == std::string::npos &&
      header.find("'|f4'") == std::string::npos)
    return 5;  // only float32 supported
  if (header.find("'fortran_order': True") != std::string::npos) return 6;
  const size_t sh = header.find("'shape':");
  if (sh == std::string::npos) return 7;
  const size_t lp = header.find('(', sh);
  const size_t rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) return 7;
  std::string dims = header.substr(lp + 1, rp - lp - 1);
  long long r = 0, c = 0;
  if (sscanf(dims.c_str(), "%lld , %lld", &r, &c) != 2 &&
      sscanf(dims.c_str(), "%lld, %lld", &r, &c) != 2)
    return 8;
  *rows = r;
  *cols = c;
  return 0;
}

}  // namespace

extern "C" {

// Read one 2-D float32 .npy into out (rows*cols floats). Returns rows read,
// or -errcode on failure. rows is capped at max_rows.
int64_t read_npy_f32(const char* path, float* out, int64_t max_rows,
                     int64_t expect_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  int64_t rows, cols, off;
  const int rc = parse_npy_header_f32_2d(f, &rows, &cols, &off);
  if (rc != 0) {
    fclose(f);
    return -rc;
  }
  if (expect_cols > 0 && cols != expect_cols) {
    fclose(f);
    return -9;
  }
  const int64_t n = std::min(rows, max_rows);
  if (fseek(f, static_cast<long>(off), SEEK_SET) != 0) {
    fclose(f);
    return -10;
  }
  const size_t want = static_cast<size_t>(n) * cols;
  const size_t got = fread(out, sizeof(float), want, f);
  fclose(f);
  return got == want ? n : -11;
}

// Assemble a zero-padded batch: for each of `batch` paths, read the .npy and
// write into out[b] at (b * t_pad * cols); store true lengths in lengths[b]
// (clamped to t_pad). paths: concatenated NUL-terminated strings.
// Returns 0 on success, or the first nonzero error code.
int assemble_batch_f32(const char* paths_blob, const int64_t* path_offsets,
                       int32_t batch, int64_t t_pad, int64_t cols, float* out,
                       int32_t* lengths, int32_t n_threads) {
  std::vector<int> errors(batch, 0);
  if (n_threads <= 0) {
    n_threads = static_cast<int>(
        std::max(1u, std::thread::hardware_concurrency()));
  }
  n_threads = std::min<int32_t>(n_threads, batch);

  auto work = [&](int start, int stop) {
    for (int b = start; b < stop; ++b) {
      const char* path = paths_blob + path_offsets[b];
      float* dst = out + static_cast<int64_t>(b) * t_pad * cols;
      memset(dst, 0, sizeof(float) * t_pad * cols);
      const int64_t n = read_npy_f32(path, dst, t_pad, cols);
      if (n < 0) {
        errors[b] = static_cast<int>(-n);
        lengths[b] = 0;
      } else {
        lengths[b] = static_cast<int32_t>(n);
      }
    }
  };

  if (n_threads <= 1) {
    work(0, batch);
  } else {
    std::vector<std::thread> threads;
    const int chunk = (batch + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      const int start = t * chunk;
      const int stop = std::min<int>(start + chunk, batch);
      if (start >= stop) break;
      threads.emplace_back(work, start, stop);
    }
    for (auto& th : threads) th.join();
  }
  for (int b = 0; b < batch; ++b)
    if (errors[b] != 0) return errors[b];
  return 0;
}

}  // extern "C"
