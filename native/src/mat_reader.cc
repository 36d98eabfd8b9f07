// Minimal MATLAB v5 .mat reader for the reference data assets.
//
// Native counterpart of the scipy.io.loadmat calls that load the sampling
// masks and the fixed noise realization (reference 【1】ADMM_L1.py:177-186).
// Supports: Level-5 MAT files, miCOMPRESSED (zlib) elements, numeric 2-D
// real or complex matrices in any of the common storage types. Data is
// returned row-major as double.

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t miINT8 = 1, miUINT8 = 2, miINT16 = 3, miUINT16 = 4,
                   miINT32 = 5, miUINT32 = 6, miSINGLE = 7, miDOUBLE = 9,
                   miINT64 = 12, miUINT64 = 13, miMATRIX = 14,
                   miCOMPRESSED = 15;

struct Var {
  std::string name;
  int rows = 0, cols = 0;
  bool complex_ = false;
  std::vector<double> re, im;  // column-major as stored
};

struct Cursor {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok() const { return off <= n; }
};

uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

// Read data of the given mi type into doubles.
bool read_numeric(const uint8_t* p, size_t nbytes, uint32_t type,
                  std::vector<double>* out) {
  auto fill = [&](auto cast_one, size_t elem) {
    size_t cnt = nbytes / elem;
    out->resize(cnt);
    for (size_t i = 0; i < cnt; ++i) (*out)[i] = cast_one(p + i * elem);
  };
  switch (type) {
    case miINT8:
      fill([](const uint8_t* q) { return (double)(int8_t)q[0]; }, 1);
      return true;
    case miUINT8:
      fill([](const uint8_t* q) { return (double)q[0]; }, 1);
      return true;
    case miINT16:
      fill([](const uint8_t* q) { int16_t v; std::memcpy(&v, q, 2); return (double)v; }, 2);
      return true;
    case miUINT16:
      fill([](const uint8_t* q) { uint16_t v; std::memcpy(&v, q, 2); return (double)v; }, 2);
      return true;
    case miINT32:
      fill([](const uint8_t* q) { int32_t v; std::memcpy(&v, q, 4); return (double)v; }, 4);
      return true;
    case miUINT32:
      fill([](const uint8_t* q) { uint32_t v; std::memcpy(&v, q, 4); return (double)v; }, 4);
      return true;
    case miSINGLE:
      fill([](const uint8_t* q) { float v; std::memcpy(&v, q, 4); return (double)v; }, 4);
      return true;
    case miDOUBLE:
      fill([](const uint8_t* q) { double v; std::memcpy(&v, q, 8); return v; }, 8);
      return true;
    case miINT64:
      fill([](const uint8_t* q) { int64_t v; std::memcpy(&v, q, 8); return (double)v; }, 8);
      return true;
    case miUINT64:
      fill([](const uint8_t* q) { uint64_t v; std::memcpy(&v, q, 8); return (double)v; }, 8);
      return true;
    default:
      return false;
  }
}

// Read one sub/element tag; handles the small-element format. Returns
// pointers into the buffer; advances cur past padded data.
bool next_element(Cursor* cur, uint32_t* type, const uint8_t** data,
                  size_t* nbytes) {
  if (cur->off + 8 > cur->n) return false;
  uint32_t tag = rd32(cur->p + cur->off);
  if (tag & 0xFFFF0000u) {  // small element: nbytes in upper 16 bits
    *type = tag & 0xFFFFu;
    *nbytes = tag >> 16;
    *data = cur->p + cur->off + 4;
    cur->off += 8;  // 4-byte tag + 4 bytes data area
    return true;
  }
  *type = tag;
  *nbytes = rd32(cur->p + cur->off + 4);
  *data = cur->p + cur->off + 8;
  size_t padded = (*nbytes + 7) & ~size_t(7);
  cur->off += 8 + padded;
  return cur->off <= cur->n + 8;
}

bool parse_matrix(const uint8_t* p, size_t n, Var* var) {
  Cursor cur{p, n};
  uint32_t type;
  const uint8_t* data;
  size_t nbytes;

  // Array flags
  if (!next_element(&cur, &type, &data, &nbytes) || type != miUINT32) return false;
  uint32_t flags = rd32(data);
  var->complex_ = (flags & 0x0800) != 0;
  uint32_t cls = flags & 0xFF;
  if (cls < 6 || cls > 15) return false;  // numeric classes only

  // Dimensions
  if (!next_element(&cur, &type, &data, &nbytes) || type != miINT32) return false;
  if (nbytes < 8) return false;
  int32_t r, c;
  std::memcpy(&r, data, 4);
  std::memcpy(&c, data + 4, 4);
  if (nbytes > 8) {  // only 2-D supported
    for (size_t k = 8; k < nbytes; k += 4) {
      int32_t extra;
      std::memcpy(&extra, data + k, 4);
      if (extra != 1) return false;
    }
  }
  var->rows = r;
  var->cols = c;

  // Name
  if (!next_element(&cur, &type, &data, &nbytes) || type != miINT8) return false;
  var->name.assign(reinterpret_cast<const char*>(data), nbytes);

  // Real part
  if (!next_element(&cur, &type, &data, &nbytes)) return false;
  if (!read_numeric(data, nbytes, type, &var->re)) return false;

  if (var->complex_) {
    if (!next_element(&cur, &type, &data, &nbytes)) return false;
    if (!read_numeric(data, nbytes, type, &var->im)) return false;
  }
  return true;
}

bool load_mat(const char* path, std::vector<Var>* vars) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  std::fseek(fp, 0, SEEK_END);
  long sz = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (std::fread(buf.data(), 1, sz, fp) != static_cast<size_t>(sz)) {
    std::fclose(fp);
    return false;
  }
  std::fclose(fp);
  if (sz < 136 || std::memcmp(buf.data(), "MATL", 4) != 0) return false;

  size_t off = 128;  // header
  while (off + 8 <= static_cast<size_t>(sz)) {
    uint32_t type = rd32(buf.data() + off);
    uint32_t nbytes = rd32(buf.data() + off + 4);
    const uint8_t* data = buf.data() + off + 8;
    if (type == miCOMPRESSED) {
      // inflate; decompressed holds one miMATRIX element (tag + body)
      std::vector<uint8_t> dec;
      dec.resize(nbytes * 8 + 1024);
      uLongf dlen = dec.size();
      while (uncompress(dec.data(), &dlen, data, nbytes) == Z_BUF_ERROR) {
        dec.resize(dec.size() * 2);
        dlen = dec.size();
      }
      if (dlen >= 8 && rd32(dec.data()) == miMATRIX) {
        Var v;
        if (parse_matrix(dec.data() + 8, dlen - 8, &v)) vars->push_back(std::move(v));
      }
    } else if (type == miMATRIX) {
      Var v;
      if (parse_matrix(data, nbytes, &v)) vars->push_back(std::move(v));
    }
    // miCOMPRESSED elements are NOT 8-padded (MAT v5 spec); others are.
    size_t adv = type == miCOMPRESSED
                     ? static_cast<size_t>(nbytes)
                     : ((static_cast<size_t>(nbytes) + 7) & ~size_t(7));
    off += 8 + adv;
  }
  return true;
}

}  // namespace

extern "C" {

// Query a variable: returns 0 and fills rows/cols/is_complex, or -1.
int pnp_mat_var_info(const char* path, const char* name, int* rows, int* cols,
                     int* is_complex) {
  std::vector<Var> vars;
  if (!load_mat(path, &vars)) return -1;
  for (const auto& v : vars) {
    if (v.name == name) {
      *rows = v.rows;
      *cols = v.cols;
      *is_complex = v.complex_ ? 1 : 0;
      return 0;
    }
  }
  return -1;
}

// Read a variable into row-major double buffers (im may be null for real
// data). Buffers must hold rows*cols doubles. Returns 0 on success.
int pnp_mat_read_var(const char* path, const char* name, double* re,
                     double* im) {
  std::vector<Var> vars;
  if (!load_mat(path, &vars)) return -1;
  for (const auto& v : vars) {
    if (v.name != name) continue;
    if (v.re.size() < static_cast<size_t>(v.rows) * v.cols) return -2;
    for (int c = 0; c < v.cols; ++c)
      for (int r = 0; r < v.rows; ++r)
        re[static_cast<size_t>(r) * v.cols + c] =
            v.re[static_cast<size_t>(c) * v.rows + r];
    if (v.complex_ && im) {
      if (v.im.size() < static_cast<size_t>(v.rows) * v.cols) return -2;
      for (int c = 0; c < v.cols; ++c)
        for (int r = 0; r < v.rows; ++r)
          im[static_cast<size_t>(r) * v.cols + c] =
              v.im[static_cast<size_t>(c) * v.rows + r];
    }
    return 0;
  }
  return -1;
}

}  // extern "C"
