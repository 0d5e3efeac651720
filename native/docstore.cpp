// Native document store: mmap-backed jsonl line index.
//
// The reference's data-source processes read whole corpus files into RAM
// and keep them as Python line lists (ragroute/data_source.py:143-183:
// `file.read().strip().split("\n")` cached per source). For pubmed-scale
// corpora that is tens of GB of Python strings. This store instead mmaps
// the file, scans it once to build a packed uint64 offset index, and
// serves doc payloads as zero-copy pointers into the mapping; the OS page
// cache does the caching.
//
// C ABI (used from Python via ctypes, see
// ragroute_tpu/index/native_store.py):
//   void*    ds_open(const char* path)
//   int64_t  ds_count(void* h)
//   const char* ds_get(void* h, int64_t idx, int64_t* len_out)
//   void     ds_close(void* h)
//
// Build: g++ -O3 -shared -fPIC -o libdocstore.so docstore.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct DocStore {
  int fd = -1;
  const char* data = nullptr;
  size_t size = 0;
  std::vector<uint64_t> offsets;  // line start offsets; sentinel at end
};

}  // namespace

extern "C" {

void* ds_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    ::close(fd);
    return nullptr;
  }
  void* map = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(map, st.st_size, MADV_SEQUENTIAL);

  auto* ds = new DocStore();
  ds->fd = fd;
  ds->data = static_cast<const char*>(map);
  ds->size = static_cast<size_t>(st.st_size);

  // One sequential scan for newlines. memchr is vectorized by libc.
  ds->offsets.reserve(ds->size / 256 + 16);
  ds->offsets.push_back(0);
  const char* p = ds->data;
  const char* end = ds->data + ds->size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (nl == nullptr) break;
    if (nl + 1 < end) ds->offsets.push_back(nl + 1 - ds->data);
    p = nl + 1;
  }
  ds->offsets.push_back(ds->size);  // sentinel
  ::madvise(map, st.st_size, MADV_RANDOM);  // serving is random access
  return ds;
}

int64_t ds_count(void* h) {
  if (h == nullptr) return -1;
  auto* ds = static_cast<DocStore*>(h);
  return static_cast<int64_t>(ds->offsets.size()) - 1;
}

const char* ds_get(void* h, int64_t idx, int64_t* len_out) {
  if (h == nullptr) return nullptr;
  auto* ds = static_cast<DocStore*>(h);
  int64_t n = static_cast<int64_t>(ds->offsets.size()) - 1;
  if (idx < 0 || idx >= n) {
    if (len_out) *len_out = 0;
    return nullptr;
  }
  uint64_t start = ds->offsets[idx];
  uint64_t stop = ds->offsets[idx + 1];
  // strip the trailing newline (and \r for CRLF files)
  while (stop > start &&
         (ds->data[stop - 1] == '\n' || ds->data[stop - 1] == '\r')) {
    --stop;
  }
  if (len_out) *len_out = static_cast<int64_t>(stop - start);
  return ds->data + start;
}

// Fill out[i] with the byte length of line i (newline-stripped) for
// i in [0, n). Lets the serving layer build response-size tables with one
// call instead of one ctypes round trip per document.
int64_t ds_lengths(void* h, int32_t* out, int64_t n) {
  if (h == nullptr || out == nullptr) return -1;
  auto* ds = static_cast<DocStore*>(h);
  int64_t count = static_cast<int64_t>(ds->offsets.size()) - 1;
  if (n > count) n = count;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t start = ds->offsets[i];
    uint64_t stop = ds->offsets[i + 1];
    while (stop > start &&
           (ds->data[stop - 1] == '\n' || ds->data[stop - 1] == '\r')) {
      --stop;
    }
    out[i] = static_cast<int32_t>(stop - start);
  }
  return n;
}

void ds_close(void* h) {
  if (h == nullptr) return;
  auto* ds = static_cast<DocStore*>(h);
  if (ds->data != nullptr) {
    ::munmap(const_cast<char*>(ds->data), ds->size);
  }
  if (ds->fd >= 0) ::close(ds->fd);
  delete ds;
}

}  // extern "C"
