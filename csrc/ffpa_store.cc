// FFPA-TPU native runtime support: file-locked atomic artifact store.
//
// TPU-native replacement for the reference's native-code runtime layer.
// The reference guards its persisted artifacts (AOT kernel cache, tuned
// config JSONs) with fcntl file locks from Python
// (reference: cute/utils/cache_utils.py:3-12) and rewrites config files
// non-atomically (triton/_persistent_autotune.py:393). Here the concurrency
// discipline lives in C++ (exposed via ctypes, ffpa_attn_tpu/utils/native.py)
// so every process — autotune workers, multi-host training jobs — shares one
// crash-safe implementation:
//
//   * ffpa_store_lock / unlock: advisory exclusive flock on <path>.lock,
//     blocking with a timeout.
//   * ffpa_store_write_atomic: write-to-temp + fsync + rename, so readers
//     never observe a torn JSON even across NFS-ish filesystems.
//   * ffpa_store_read: locked read returning a malloc'd buffer.
//
// Build: cc -O2 -shared -fPIC -o libffpa_store.so ffpa_store.cc
// (driven by ffpa_attn_tpu/utils/native.py:build_native, make -C csrc).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>

#include <fcntl.h>
#include <sys/file.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Returns a lock fd >= 0 on success, -1 on failure/timeout.
int ffpa_store_lock(const char* path, int timeout_ms) {
  std::string lock_path = std::string(path) + ".lock";
  int fd = ::open(lock_path.c_str(), O_CREAT | O_RDWR, 0644);
  if (fd < 0) return -1;
  const int step_ms = 10;
  int waited = 0;
  while (true) {
    if (::flock(fd, LOCK_EX | LOCK_NB) == 0) return fd;
    if (errno != EWOULDBLOCK && errno != EINTR) break;
    if (timeout_ms >= 0 && waited >= timeout_ms) break;
    struct timespec ts = {0, step_ms * 1000000L};
    ::nanosleep(&ts, nullptr);
    waited += step_ms;
  }
  ::close(fd);
  return -1;
}

int ffpa_store_unlock(int fd) {
  if (fd < 0) return -1;
  ::flock(fd, LOCK_UN);
  return ::close(fd);
}

// Atomic write: temp file in the same directory + fsync + rename.
// Returns 0 on success.
int ffpa_store_write_atomic(const char* path, const char* data,
                            int64_t size) {
  std::string tmp = std::string(path) + ".tmp.XXXXXX";
  std::string tmp_buf(tmp);
  int fd = ::mkstemp(tmp_buf.data());
  if (fd < 0) return -1;
  const char* p = data;
  int64_t remaining = size;
  while (remaining > 0) {
    ssize_t n = ::write(fd, p, static_cast<size_t>(remaining));
    if (n < 0) {
      if (errno == EINTR) continue;
      ::close(fd);
      ::unlink(tmp_buf.c_str());
      return -2;
    }
    p += n;
    remaining -= n;
  }
  if (::fsync(fd) != 0) {
    ::close(fd);
    ::unlink(tmp_buf.c_str());
    return -3;
  }
  ::close(fd);
  if (::rename(tmp_buf.c_str(), path) != 0) {
    ::unlink(tmp_buf.c_str());
    return -4;
  }
  return 0;
}

// Locked read. On success returns 0 and sets *out/*out_size to a malloc'd
// buffer the caller frees with ffpa_store_free. Missing file => -1.
int ffpa_store_read(const char* path, char** out, int64_t* out_size) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    ::close(fd);
    return -2;
  }
  int64_t size = static_cast<int64_t>(st.st_size);
  char* buf = static_cast<char*>(::malloc(static_cast<size_t>(size) + 1));
  if (buf == nullptr) {
    ::close(fd);
    return -3;
  }
  int64_t off = 0;
  while (off < size) {
    ssize_t n = ::read(fd, buf + off, static_cast<size_t>(size - off));
    if (n < 0) {
      if (errno == EINTR) continue;
      ::free(buf);
      ::close(fd);
      return -4;
    }
    if (n == 0) break;
    off += n;
  }
  ::close(fd);
  buf[off] = '\0';
  *out = buf;
  *out_size = off;
  return 0;
}

void ffpa_store_free(char* buf) { ::free(buf); }

int ffpa_store_version() { return 1; }

}  // extern "C"
