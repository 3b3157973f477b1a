// trajlog: buffered length-prefixed record log (C++ core of the event-log
// runtime).
//
// The reference's trajectory logging rides protobuf's C++ serializer through
// the protobuf wheel (event_log.py, SURVEY.md §2.2 native-component table).
// This is the rebuild's native IO runtime: an append-only stream of
// [u32 length | payload] records with a magic header, userspace write
// buffering sized for multi-MB pixel episodes, and a streaming reader.  The
// Python side (cartpoleplusplus_tpu/utils/native.py) binds via ctypes and
// keeps a pure-Python fallback with the identical wire format.
//
// Wire format (little endian):
//   file      := magic(u32 = 0x54524A4C 'TRJL') record*
//   record    := length(u32) payload(bytes)
//
// Concurrency: one handle per thread; no locking inside.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

constexpr uint32_t kMagic = 0x54524A4Cu;  // "TRJL"
constexpr size_t kBufCap = 4u << 20;      // 4 MiB write buffer

struct Writer {
  FILE* f = nullptr;
  uint8_t* buf = nullptr;
  size_t len = 0;
};

struct Reader {
  FILE* f = nullptr;
  uint32_t pending = 0;      // length of the peeked record
  bool has_pending = false;  // (zero-length records are legal)
};

bool flush_buf(Writer* w) {
  if (w->len == 0) return true;
  size_t n = fwrite(w->buf, 1, w->len, w->f);
  if (n != w->len) return false;
  w->len = 0;
  return true;
}

bool buf_append(Writer* w, const void* data, size_t n) {
  if (w->len + n > kBufCap) {
    if (!flush_buf(w)) return false;
    if (n >= kBufCap) {  // oversized payload: write through
      return fwrite(data, 1, n, w->f) == n;
    }
  }
  memcpy(w->buf + w->len, data, n);
  w->len += n;
  return true;
}

}  // namespace

extern "C" {

// ---- writer ----------------------------------------------------------

void* tl_open(const char* path) {
  FILE* f = fopen(path, "ab");
  if (!f) return nullptr;
  auto* w = new Writer();
  w->f = f;
  w->buf = static_cast<uint8_t*>(malloc(kBufCap));
  if (!w->buf) {
    fclose(f);
    delete w;
    return nullptr;
  }
  // Write the magic only for a fresh file.
  fseek(f, 0, SEEK_END);
  if (ftell(f) == 0) {
    uint32_t m = kMagic;
    buf_append(w, &m, sizeof m);
  }
  return w;
}

int tl_write(void* handle, const uint8_t* data, uint64_t n) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  uint32_t len32 = static_cast<uint32_t>(n);
  if (len32 != n) return -2;  // >4GB record
  if (!buf_append(w, &len32, sizeof len32)) return -3;
  if (!buf_append(w, data, n)) return -3;
  return 0;
}

int tl_flush(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  if (!flush_buf(w)) return -3;
  return fflush(w->f) == 0 ? 0 : -3;
}

void tl_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return;
  flush_buf(w);
  fclose(w->f);
  free(w->buf);
  delete w;
}

// ---- reader ----------------------------------------------------------

void* tl_reader_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t m = 0;
  if (fread(&m, 1, sizeof m, f) != sizeof m || m != kMagic) {
    fclose(f);
    return nullptr;
  }
  auto* r = new Reader();
  r->f = f;
  return r;
}

// Returns the next record's length (>= 0), -9 on clean EOF, other negatives
// on error.  Zero-length records are legal.
int64_t tl_next_len(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r || !r->f) return -1;
  if (r->has_pending) return r->pending;
  uint32_t len = 0;
  size_t n = fread(&len, 1, sizeof len, r->f);
  if (n == 0) return -9;           // EOF
  if (n != sizeof len) return -4;  // truncated header
  r->pending = len;
  r->has_pending = true;
  return len;
}

// Reads the pending record into buf (must be >= its length). Returns the
// number of bytes read, negative on error.
int64_t tl_read(void* handle, uint8_t* buf, uint64_t cap) {
  auto* r = static_cast<Reader*>(handle);
  if (!r || !r->f || !r->has_pending) return -1;
  if (cap < r->pending) return -5;
  size_t n = fread(buf, 1, r->pending, r->f);
  if (n != r->pending) return -4;
  r->has_pending = false;
  r->pending = 0;
  return static_cast<int64_t>(n);
}

void tl_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r) return;
  fclose(r->f);
  delete r;
}

// ---- index / integrity scan ------------------------------------------

// One buffered pass over the whole file: validates the framing end-to-end
// and collects the byte offset of every record header.  Returns the record
// count (>= 0); writes up to `cap` offsets into `offsets`.  Negative on
// error: -1 open/magic failure, -4 truncated record (the tail after the
// last whole record is corrupt — e.g. a crashed writer), -3 io error.
// Two-call pattern from Python: first cap=0 for the count, then sized.
int64_t tl_scan(const char* path, uint64_t* offsets, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint32_t m = 0;
  if (fread(&m, 1, sizeof m, f) != sizeof m || m != kMagic) {
    fclose(f);
    return -1;
  }
  if (fseek(f, 0, SEEK_END) != 0) {
    fclose(f);
    return -3;
  }
  long end = ftell(f);
  if (end < 0) {
    fclose(f);
    return -3;
  }
  const uint64_t size = static_cast<uint64_t>(end);
  int64_t count = 0;
  uint64_t off = sizeof m;
  while (off < size) {
    if (size - off < sizeof(uint32_t)) {
      fclose(f);
      return -4;  // truncated header
    }
    if (fseek(f, static_cast<long>(off), SEEK_SET) != 0) {
      fclose(f);
      return -3;
    }
    uint32_t len = 0;
    if (fread(&len, 1, sizeof len, f) != sizeof len) {
      fclose(f);
      return -4;
    }
    if (size - off - sizeof len < len) {
      fclose(f);
      return -4;  // truncated payload (crashed writer tail)
    }
    if (offsets && count < cap) offsets[count] = off;
    off += sizeof len + static_cast<uint64_t>(len);
    ++count;
  }
  fclose(f);
  return count;
}

// Read the single record whose header starts at `off` (from tl_scan).
// Returns payload length, or negative on error; copies min(len, cap) bytes.
int64_t tl_read_at(const char* path, uint64_t off, uint8_t* buf,
                   uint64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, static_cast<long>(off), SEEK_SET) != 0) {
    fclose(f);
    return -3;
  }
  uint32_t len = 0;
  if (fread(&len, 1, sizeof len, f) != sizeof len) {
    fclose(f);
    return -4;
  }
  uint64_t want = len < cap ? len : cap;
  if (fread(buf, 1, want, f) != want) {
    fclose(f);
    return -4;
  }
  fclose(f);
  return static_cast<int64_t>(len);
}

}  // extern "C"
