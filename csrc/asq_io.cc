// asq_io: native checkpoint I/O for autosmoothquant_tpu.
//
// The TPU-native counterpart of the reference's native runtime layer
// (ref: csrc/int8gemm/* — there the native code was the GEMM, which this
// framework replaces with Pallas/XLA; what still deserves native code on a
// TPU host is the I/O path). Large quantized checkpoints (GBs of int8
// weights + scales) load through:
//   - mmap of the safetensors/npz container
//   - multithreaded eager copy into page-aligned destination buffers
//     (beating single-threaded lazy page-fault reads on cold page cache)
//
// C ABI, consumed from Python via ctypes (pybind11 is not available in this
// toolchain; see convert/fast_loader.py).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>
#include <atomic>

namespace {

struct Handle {
  int fd = -1;
  void* base = nullptr;
  int64_t size = 0;
};

// Copy [src, src+n) to dst with `nthreads` workers, splitting on 64 MiB
// chunks so threads stay load-balanced on NUMA/page-cache misses.
void parallel_copy(void* dst, const void* src, int64_t n, int nthreads) {
  if (nthreads <= 1 || n < (16 << 20)) {
    std::memcpy(dst, src, static_cast<size_t>(n));
    return;
  }
  const int64_t kChunk = 64 << 20;
  std::atomic<int64_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int64_t off = next.fetch_add(kChunk);
      if (off >= n) break;
      int64_t len = std::min(kChunk, n - off);
      std::memcpy(static_cast<char*>(dst) + off,
                  static_cast<const char*>(src) + off,
                  static_cast<size_t>(len));
    }
  };
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  for (int i = 0; i < nthreads; ++i) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Open + mmap a file. Returns nullptr on failure.
void* asq_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                      MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(base, static_cast<size_t>(st.st_size), MADV_SEQUENTIAL);
  auto* h = new Handle{fd, base, st.st_size};
  return h;
}

int64_t asq_size(void* handle) {
  return handle ? static_cast<Handle*>(handle)->size : -1;
}

// Raw pointer into the mapping (for zero-copy header parsing in Python).
const void* asq_data(void* handle) {
  return handle ? static_cast<Handle*>(handle)->base : nullptr;
}

// Copy [off, off+n) of the file into dst using `nthreads` threads.
// Returns 0 on success, -1 on range error.
int asq_read(void* handle, int64_t off, int64_t n, void* dst, int nthreads) {
  if (!handle) return -1;
  auto* h = static_cast<Handle*>(handle);
  if (off < 0 || n < 0 || off + n > h->size) return -1;
  parallel_copy(dst, static_cast<const char*>(h->base) + off, n, nthreads);
  return 0;
}

// Prefault the page range (readahead into page cache) with threads; useful
// before handing the mapping to a zero-copy consumer.
void asq_prefault(void* handle, int64_t off, int64_t n, int nthreads) {
  if (!handle) return;
  auto* h = static_cast<Handle*>(handle);
  if (off < 0 || n <= 0 || off + n > h->size) return;
  const char* base = static_cast<const char*>(h->base) + off;
  const int64_t kPage = 4096;
  std::atomic<int64_t> next{0};
  std::atomic<uint64_t> sink{0};
  const int64_t kChunk = 32 << 20;
  auto worker = [&]() {
    uint64_t acc = 0;
    for (;;) {
      int64_t o = next.fetch_add(kChunk);
      if (o >= n) break;
      int64_t len = std::min(kChunk, n - o);
      for (int64_t p = 0; p < len; p += kPage)
        acc += static_cast<uint8_t>(base[o + p]);
    }
    sink.fetch_add(acc);
  };
  std::vector<std::thread> ts;
  int nt = nthreads > 0 ? nthreads : 4;
  for (int i = 0; i < nt; ++i) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

void asq_close(void* handle) {
  if (!handle) return;
  auto* h = static_cast<Handle*>(handle);
  ::munmap(h->base, static_cast<size_t>(h->size));
  ::close(h->fd);
  delete h;
}

}  // extern "C"
