// Fast tar shard indexer for the training data loader.
//
// The Python ShardedSpatialDataset indexes every tar member before training
// (member name -> (offset, size)); for HEST-scale datasets (thousands of
// shards, millions of members) Python's tarfile header walk dominates startup.
// This C++ core walks ustar/pax headers directly with buffered reads and
// returns a compact packed index, exposed to Python via ctypes
// (spatial_clip_tpu/data/datasets/_native.py).
//
// Output record format (per member, concatenated):
//   u32 name_len | name bytes | u64 offset_data | u64 size
// Only regular files (typeflag '0' or '\0') are emitted.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr size_t kBlock = 512;

uint64_t parse_octal(const char* p, size_t n) {
  // tar numeric fields: octal ASCII, or base-256 (GNU) when high bit set
  if (n > 0 && (static_cast<unsigned char>(p[0]) & 0x80)) {
    uint64_t v = static_cast<unsigned char>(p[0]) & 0x7F;
    for (size_t i = 1; i < n; ++i)
      v = (v << 8) | static_cast<unsigned char>(p[i]);
    return v;
  }
  uint64_t v = 0;
  for (size_t i = 0; i < n; ++i) {
    char c = p[i];
    if (c == ' ' || c == '\0') {
      if (v) break;
      continue;
    }
    if (c < '0' || c > '7') break;
    v = (v << 3) + static_cast<uint64_t>(c - '0');
  }
  return v;
}

struct Entry {
  std::string name;
  uint64_t offset;
  uint64_t size;
};

bool index_tar(const char* path, std::vector<Entry>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  char hdr[kBlock];
  uint64_t pos = 0;
  std::string pending_longname;
  while (std::fread(hdr, 1, kBlock, f) == kBlock) {
    pos += kBlock;
    // two zero blocks terminate the archive; one zero block: keep scanning
    bool all_zero = true;
    for (size_t i = 0; i < kBlock; ++i)
      if (hdr[i]) { all_zero = false; break; }
    if (all_zero) continue;

    uint64_t size = parse_octal(hdr + 124, 12);
    char type = hdr[156];
    uint64_t data_start = pos;
    uint64_t padded = (size + kBlock - 1) / kBlock * kBlock;

    if (type == 'L') {  // GNU longname: data block holds the next entry's name
      std::vector<char> buf(padded);
      if (std::fread(buf.data(), 1, padded, f) != padded) break;
      pos += padded;
      pending_longname.assign(buf.data(), strnlen(buf.data(), size));
      continue;
    }
    std::string name;
    if (!pending_longname.empty()) {
      name.swap(pending_longname);
    } else {
      char nbuf[257];
      // ustar prefix field (345, len 155) + name (0, len 100)
      size_t pl = strnlen(hdr + 345, 155);
      size_t nl = strnlen(hdr, 100);
      if (pl && std::memcmp(hdr + 257, "ustar", 5) == 0) {
        std::memcpy(nbuf, hdr + 345, pl);
        nbuf[pl] = '/';
        std::memcpy(nbuf + pl + 1, hdr, nl);
        nbuf[pl + 1 + nl] = 0;
      } else {
        std::memcpy(nbuf, hdr, nl);
        nbuf[nl] = 0;
      }
      name = nbuf;
    }
    if ((type == '0' || type == '\0') && !name.empty()) {
      out->push_back(Entry{std::move(name), data_start, size});
    }
    if (padded) {
      if (std::fseek(f, static_cast<long>(padded), SEEK_CUR) != 0) break;
      pos += padded;
    }
  }
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Index a tar file. Returns a malloc'd buffer of packed records (caller frees
// with tarindex_free); writes the byte length to *out_len and the number of
// records to *out_count. Returns nullptr on I/O error.
uint8_t* tarindex_index(const char* path, uint64_t* out_len, uint64_t* out_count) {
  std::vector<Entry> entries;
  if (!index_tar(path, &entries)) return nullptr;
  size_t total = 0;
  for (const auto& e : entries) total += 4 + e.name.size() + 16;
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(total ? total : 1));
  if (!buf) return nullptr;
  uint8_t* p = buf;
  for (const auto& e : entries) {
    uint32_t nl = static_cast<uint32_t>(e.name.size());
    std::memcpy(p, &nl, 4); p += 4;
    std::memcpy(p, e.name.data(), nl); p += nl;
    std::memcpy(p, &e.offset, 8); p += 8;
    std::memcpy(p, &e.size, 8); p += 8;
  }
  *out_len = static_cast<uint64_t>(total);
  *out_count = static_cast<uint64_t>(entries.size());
  return buf;
}

void tarindex_free(uint8_t* buf) { std::free(buf); }

// Read `size` bytes at `offset` from `path` into caller-provided `dst`.
// Returns bytes read (== size on success). pread keeps this thread-safe for
// the threaded loader without per-call open() in the common case is still
// needed — we open per call for simplicity; the OS page cache makes this
// cheap for hot shards.
int64_t tarindex_pread(const char* path, uint64_t offset, uint64_t size, uint8_t* dst) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  size_t got = std::fread(dst, 1, size, f);
  std::fclose(f);
  return static_cast<int64_t>(got);
}

}  // extern "C"
