// Native host-IO runtime for fetal_t2mapping_tpu.
//
// The TPU compute path is JAX/Pallas; this library is the host-side
// data-loader layer the reference delegates to external C++ binaries for
// (dcm2niix ingest, SimpleITK NIfTI IO — reference utils/dcm_utils.py:259-312,
// run_t2mapping.py:374-377). Hot paths:
//   * gzip-transparent file reads (zlib inflate) — one echo stack is 3-8
//     .nii.gz volumes; decompression dominates host load time;
//   * a std::thread pool batch loader so a whole stack inflates in parallel;
//   * gzip writes (map/derivative outputs);
//   * a threaded DICOM Part-10 validity probe (132-byte magic check) for
//     directory walks over thousands of files.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Every function returns 0 on success / negative errno-style codes; buffers
// are malloc'd here and released with ft2_free.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

static const char kVersion[] = "ft2io 1.0";

const char* ft2_version() { return kVersion; }

void ft2_free(uint8_t* p) { free(p); }

// ---------------------------------------------------------------- reading
// gz-transparent read: zlib's gzread inflates gzip members and passes raw
// bytes through for uncompressed files, so one path serves .nii and .nii.gz.
static int read_file_impl(const char* path, uint8_t** out, uint64_t* len) {
  *out = nullptr;
  *len = 0;
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  (void)gzbuffer(f, 1 << 20);

  uint64_t cap = 1 << 22;  // 4 MiB start; doubles as needed
  uint8_t* buf = static_cast<uint8_t*>(malloc(cap));
  if (!buf) { gzclose(f); return -2; }
  uint64_t total = 0;
  for (;;) {
    if (total == cap) {
      cap *= 2;
      uint8_t* nb = static_cast<uint8_t*>(realloc(buf, cap));
      if (!nb) { free(buf); gzclose(f); return -2; }
      buf = nb;
    }
    unsigned chunk = static_cast<unsigned>(
        cap - total > (1u << 30) ? (1u << 30) : cap - total);
    int n = gzread(f, buf + total, chunk);
    if (n < 0) { free(buf); gzclose(f); return -3; }
    if (n == 0) break;
    total += static_cast<uint64_t>(n);
  }
  gzclose(f);
  *out = buf;
  *len = total;
  return 0;
}

int ft2_read_file(const char* path, uint8_t** out, uint64_t* len) {
  return read_file_impl(path, out, len);
}

// Thread-pool batch read: atomically claim indices until the list drains.
int ft2_read_batch(const char** paths, int32_t n, uint8_t** outs,
                   uint64_t* lens, int32_t* errs, int32_t n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      errs[i] = read_file_impl(paths[i], &outs[i], &lens[i]);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(static_cast<size_t>(n_threads));
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  int32_t bad = 0;
  for (int32_t i = 0; i < n; ++i)
    if (errs[i] != 0) ++bad;
  return bad;
}

// ---------------------------------------------------------------- writing
// level >= 0: gzip at that level; level < 0: raw write.
int ft2_write_file(const char* path, const uint8_t* buf, uint64_t len,
                   int32_t level) {
  if (level < 0) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    size_t w = fwrite(buf, 1, len, f);
    int rc = fclose(f);  // buffered flush can fail here (e.g. ENOSPC)
    return (w == len && rc == 0) ? 0 : -4;
  }
  char mode[8];
  snprintf(mode, sizeof mode, "wb%d", level > 9 ? 9 : level);
  gzFile f = gzopen(path, mode);
  if (!f) return -1;
  (void)gzbuffer(f, 1 << 20);
  uint64_t done = 0;
  while (done < len) {
    unsigned chunk = static_cast<unsigned>(
        len - done > (1u << 30) ? (1u << 30) : len - done);
    int w = gzwrite(f, buf + done, chunk);
    if (w <= 0) { gzclose(f); return -4; }
    done += static_cast<uint64_t>(w);
  }
  return gzclose(f) == Z_OK ? 0 : -4;
}

// ------------------------------------------------------------ DICOM probe
// Part-10 files carry "DICM" at offset 128. The reference validates DICOM
// candidates by fully parsing each file (utils/dcm_utils.py:54-65) — a
// directory walk over thousands of files reads gigabytes; this probe reads
// 132 bytes. is_dcm[i]: 1 = Part-10 DICOM, 0 = not, -1 = unreadable.
static void probe_one(const char* path, int32_t* flag) {
  FILE* f = fopen(path, "rb");
  if (!f) { *flag = -1; return; }
  uint8_t hdr[132];
  size_t n = fread(hdr, 1, sizeof hdr, f);
  fclose(f);
  *flag = (n == sizeof hdr && memcmp(hdr + 128, "DICM", 4) == 0) ? 1 : 0;
}

int ft2_dicom_probe_batch(const char** paths, int32_t n, int32_t* is_dcm,
                          int32_t n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      probe_one(paths[i], &is_dcm[i]);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(static_cast<size_t>(n_threads));
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
