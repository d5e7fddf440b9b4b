// mhla_data: native data-plane for the TPU training framework.
//
// The reference framework's input pipelines are pure Python (HF datasets
// token packing — legacy/training/flame/data.py; zip-sharded video datasets
// — diffusion/data/sana_video_data.py). Feeding a TPU at full rate makes the
// host data plane the bottleneck, so the hot loops live here:
//
//   - token packing: scatter variable-length document token streams into
//     fixed-length training rows (the flame token-buffer semantics)
//   - zip shard reading: central-directory parsing + member extraction
//     (STORED and DEFLATE via zlib) for Sana-style .zip media shards
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Token packing
// ---------------------------------------------------------------------------

// Pack a concatenated token stream into fixed-length rows.
//   tokens:    [n_tokens] int32 concatenated documents
//   n_tokens:  total tokens
//   seq_len:   row length
//   out:       [max_rows * seq_len] int32 output buffer
//   max_rows:  output capacity
// Returns the number of complete rows written; the remainder count is
// written to *leftover (callers carry those tokens into the next call).
int64_t mhla_pack_tokens(const int32_t* tokens, int64_t n_tokens,
                         int64_t seq_len, int32_t* out, int64_t max_rows,
                         int64_t* leftover) {
  int64_t rows = n_tokens / seq_len;
  if (rows > max_rows) rows = max_rows;
  std::memcpy(out, tokens, static_cast<size_t>(rows * seq_len) * sizeof(int32_t));
  *leftover = n_tokens - rows * seq_len;
  return rows;
}

// Pack documents given per-document offsets, emitting rows. The resume
// cursor is (next_doc, next_pos-within-doc) plus the partial row buffer
// (carry, always < seq_len tokens), so packing is exactly resumable even
// when stopping mid-document.
int64_t mhla_pack_documents(const int32_t* tokens, const int64_t* doc_offsets,
                            int64_t n_docs, int64_t seq_len, int32_t* out,
                            int64_t max_rows, int64_t* next_doc,
                            int64_t* next_pos, int32_t* carry,
                            int64_t carry_len, int64_t* carry_out_len) {
  int64_t rows = 0;
  int64_t fill = carry_len;  // tokens currently in the row buffer
  std::vector<int32_t> buf(static_cast<size_t>(seq_len));
  if (carry_len > 0) std::memcpy(buf.data(), carry, carry_len * sizeof(int32_t));

  int64_t d = *next_doc;
  int64_t pos = d < n_docs ? doc_offsets[d] + *next_pos : 0;
  while (d < n_docs) {
    int64_t end = doc_offsets[d + 1];
    while (pos < end) {
      int64_t take = seq_len - fill;
      if (take > end - pos) take = end - pos;
      std::memcpy(buf.data() + fill, tokens + pos, take * sizeof(int32_t));
      fill += take;
      pos += take;
      if (fill == seq_len) {
        std::memcpy(out + rows * seq_len, buf.data(), seq_len * sizeof(int32_t));
        ++rows;
        fill = 0;
        if (rows == max_rows) {
          *next_doc = d;
          *next_pos = pos - doc_offsets[d];
          *carry_out_len = 0;
          return rows;
        }
      }
    }
    ++d;
    if (d < n_docs) pos = doc_offsets[d];
  }
  std::memcpy(carry, buf.data(), fill * sizeof(int32_t));
  *carry_out_len = fill;
  *next_doc = n_docs;
  *next_pos = 0;
  return rows;
}

// ---------------------------------------------------------------------------
// ZIP shard reader (central directory + stored/deflate members)
// ---------------------------------------------------------------------------

struct ZipEntry {
  std::string name;
  uint64_t header_offset;
  uint64_t comp_size;
  uint64_t uncomp_size;
  uint16_t method;  // 0 stored, 8 deflate
};

struct ZipIndex {
  FILE* f;
  std::vector<ZipEntry> entries;
};

static uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
static uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

void* mhla_zip_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  // find End Of Central Directory (EOCD): scan last 64KB for signature
  long scan = size < 65557 ? size : 65557;
  std::vector<uint8_t> tail(static_cast<size_t>(scan));
  std::fseek(f, size - scan, SEEK_SET);
  if (std::fread(tail.data(), 1, scan, f) != (size_t)scan) {
    std::fclose(f);
    return nullptr;
  }
  long eocd = -1;
  for (long i = scan - 22; i >= 0; --i) {
    if (rd32(tail.data() + i) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) {
    std::fclose(f);
    return nullptr;
  }
  uint16_t n_entries = rd16(tail.data() + eocd + 10);
  uint32_t cd_size = rd32(tail.data() + eocd + 12);
  uint32_t cd_offset = rd32(tail.data() + eocd + 16);

  std::vector<uint8_t> cd(cd_size);
  std::fseek(f, cd_offset, SEEK_SET);
  if (std::fread(cd.data(), 1, cd_size, f) != cd_size) {
    std::fclose(f);
    return nullptr;
  }

  auto* idx = new ZipIndex{f, {}};
  size_t p = 0;
  for (int i = 0; i < n_entries && p + 46 <= cd.size(); ++i) {
    if (rd32(cd.data() + p) != 0x02014b50) break;
    ZipEntry e;
    e.method = rd16(cd.data() + p + 10);
    e.comp_size = rd32(cd.data() + p + 20);
    e.uncomp_size = rd32(cd.data() + p + 24);
    uint16_t name_len = rd16(cd.data() + p + 28);
    uint16_t extra_len = rd16(cd.data() + p + 30);
    uint16_t comment_len = rd16(cd.data() + p + 32);
    e.header_offset = rd32(cd.data() + p + 42);
    e.name.assign(reinterpret_cast<const char*>(cd.data() + p + 46), name_len);
    idx->entries.push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return idx;
}

int64_t mhla_zip_num_entries(void* handle) {
  return static_cast<ZipIndex*>(handle)->entries.size();
}

// Write entry i's name into buf (cap n); returns name length.
int64_t mhla_zip_entry_name(void* handle, int64_t i, char* buf, int64_t n) {
  auto& e = static_cast<ZipIndex*>(handle)->entries[i];
  int64_t len = static_cast<int64_t>(e.name.size());
  int64_t cp = len < n ? len : n;
  std::memcpy(buf, e.name.data(), cp);
  return len;
}

int64_t mhla_zip_entry_size(void* handle, int64_t i) {
  return static_cast<ZipIndex*>(handle)->entries[i].uncomp_size;
}

// Extract entry i into out (must hold uncomp_size). Returns bytes written,
// -1 on error.
int64_t mhla_zip_read(void* handle, int64_t i, uint8_t* out, int64_t out_cap) {
  auto* idx = static_cast<ZipIndex*>(handle);
  auto& e = idx->entries[i];
  if ((int64_t)e.uncomp_size > out_cap) return -1;

  // local header: re-read name/extra lengths (may differ from CD)
  uint8_t lh[30];
  std::fseek(idx->f, (long)e.header_offset, SEEK_SET);
  if (std::fread(lh, 1, 30, idx->f) != 30 || rd32(lh) != 0x04034b50) return -1;
  uint16_t name_len = rd16(lh + 26), extra_len = rd16(lh + 28);
  std::fseek(idx->f, (long)(e.header_offset + 30 + name_len + extra_len),
             SEEK_SET);

  std::vector<uint8_t> comp(e.comp_size);
  if (std::fread(comp.data(), 1, e.comp_size, idx->f) != e.comp_size) return -1;

  if (e.method == 0) {  // stored
    std::memcpy(out, comp.data(), e.uncomp_size);
    return (int64_t)e.uncomp_size;
  }
  if (e.method == 8) {  // deflate
    z_stream zs{};
    if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return -1;
    zs.next_in = comp.data();
    zs.avail_in = (uInt)e.comp_size;
    zs.next_out = out;
    zs.avail_out = (uInt)e.uncomp_size;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END ? (int64_t)e.uncomp_size : -1;
  }
  return -1;
}

void mhla_zip_close(void* handle) {
  auto* idx = static_cast<ZipIndex*>(handle);
  std::fclose(idx->f);
  delete idx;
}

// ---------------------------------------------------------------------------
// Tar shard reading (webdataset-style .tar shards; reference vendored the
// wids tar reader — diffusion/data/wids/wids_tar.py builds a pickle index
// then seeks. Here: one sequential header scan at open (ustar + GNU
// longname), then O(1) pread-style member reads.)
// ---------------------------------------------------------------------------

struct TarEntry {
  std::string name;
  uint64_t offset;  // payload offset
  uint64_t size;
};

struct TarIndex {
  FILE* f;
  std::vector<TarEntry> entries;
};

static uint64_t tar_octal(const char* p, size_t n) {
  // GNU base-256 extension: high bit of first byte set
  if (n && (static_cast<unsigned char>(p[0]) & 0x80)) {
    uint64_t v = static_cast<unsigned char>(p[0]) & 0x7f;
    for (size_t i = 1; i < n; ++i)
      v = (v << 8) | static_cast<unsigned char>(p[i]);
    return v;
  }
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] < '0' || p[i] > '7') continue;
    v = (v << 3) | static_cast<uint64_t>(p[i] - '0');
  }
  return v;
}

void* mhla_tar_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* idx = new TarIndex;
  idx->f = f;
  char hdr[512];
  uint64_t pos = 0;
  std::string longname;   // GNU 'L' pending name
  std::string paxname;    // PAX 'x' pending path= record
  while (std::fread(hdr, 1, 512, f) == 512) {
    pos += 512;
    bool empty = true;
    for (int i = 0; i < 512; ++i)
      if (hdr[i]) { empty = false; break; }
    if (empty) break;  // end-of-archive marker
    uint64_t size = tar_octal(hdr + 124, 12);
    char type = hdr[156];
    uint64_t padded = (size + 511) & ~uint64_t(511);
    if (type == 'L') {  // GNU long name: payload is the next header's name
      std::vector<char> buf(size + 1, 0);
      if (std::fread(buf.data(), 1, size, f) != size) break;
      longname.assign(buf.data());
      std::fseek(f, static_cast<long>(pos + padded), SEEK_SET);
      pos += padded;
      continue;
    }
    if (type == 'x') {  // PAX extended header (Python tarfile default):
      // payload is "LEN key=value\n" records; 'path' overrides the name
      std::vector<char> buf(size, 0);
      if (std::fread(buf.data(), 1, size, f) != size) break;
      size_t off = 0;
      while (off < size) {
        size_t sp = off;
        while (sp < size && buf[sp] != ' ') ++sp;
        if (sp >= size) break;
        uint64_t reclen = std::strtoull(std::string(buf.data() + off, sp - off).c_str(), nullptr, 10);
        if (reclen == 0 || off + reclen > size) break;
        std::string rec(buf.data() + sp + 1, off + reclen - sp - 2);  // strip '\n'
        if (rec.compare(0, 5, "path=") == 0) paxname = rec.substr(5);
        off += reclen;
      }
      std::fseek(f, static_cast<long>(pos + padded), SEEK_SET);
      pos += padded;
      continue;
    }
    if (type == 'g') {  // PAX global header: skip payload, keep pending names
      std::fseek(f, static_cast<long>(pos + padded), SEEK_SET);
      pos += padded;
      continue;
    }
    if (type == '0' || type == '\0') {
      std::string name;
      if (!paxname.empty()) {
        name.swap(paxname);
        longname.clear();
      } else if (!longname.empty()) {
        name.swap(longname);
      } else {
        char nbuf[257] = {0};
        // ustar prefix field extends the 100-byte name
        if (std::memcmp(hdr + 257, "ustar", 5) == 0 && hdr[345]) {
          std::memcpy(nbuf, hdr + 345, 155);
          size_t l = std::strlen(nbuf);
          nbuf[l] = '/';
          std::memcpy(nbuf + l + 1, hdr, 100);
        } else {
          std::memcpy(nbuf, hdr, 100);
        }
        name = nbuf;
      }
      idx->entries.push_back({std::move(name), pos, size});
    } else if (type != 'K') {
      // any real (non-file) member consumes pending names; a GNU 'K'
      // long-linkname record between 'L' and its file header does not
      longname.clear();
      paxname.clear();
    }
    std::fseek(f, static_cast<long>(pos + padded), SEEK_SET);
    pos += padded;
  }
  return idx;
}

int64_t mhla_tar_num_entries(void* handle) {
  return static_cast<int64_t>(static_cast<TarIndex*>(handle)->entries.size());
}

int64_t mhla_tar_entry_name(void* handle, int64_t i, char* buf, int64_t n) {
  auto* idx = static_cast<TarIndex*>(handle);
  if (i < 0 || i >= (int64_t)idx->entries.size()) return -1;
  const std::string& s = idx->entries[i].name;
  int64_t len = static_cast<int64_t>(s.size());
  if (buf && n > 0) {
    int64_t c = len < n - 1 ? len : n - 1;
    std::memcpy(buf, s.data(), c);
    buf[c] = 0;
  }
  return len;
}

int64_t mhla_tar_entry_size(void* handle, int64_t i) {
  auto* idx = static_cast<TarIndex*>(handle);
  if (i < 0 || i >= (int64_t)idx->entries.size()) return -1;
  return static_cast<int64_t>(idx->entries[i].size);
}

int64_t mhla_tar_read(void* handle, int64_t i, uint8_t* out, int64_t out_cap) {
  auto* idx = static_cast<TarIndex*>(handle);
  if (i < 0 || i >= (int64_t)idx->entries.size()) return -1;
  const TarEntry& e = idx->entries[i];
  if (out_cap < (int64_t)e.size) return -1;
  std::fseek(idx->f, static_cast<long>(e.offset), SEEK_SET);
  if (std::fread(out, 1, e.size, idx->f) != e.size) return -1;
  return static_cast<int64_t>(e.size);
}

void mhla_tar_close(void* handle) {
  auto* idx = static_cast<TarIndex*>(handle);
  std::fclose(idx->f);
  delete idx;
}

}  // extern "C"
