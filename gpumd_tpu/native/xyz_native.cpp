// Native extended-XYZ row parser / writer.
//
// TPU-native analog of the reference's host-side C++ model reader
// (ref: src/model/read_xyz.cu:163-330): the Python front end parses the
// two header lines (count + Properties spec) and delegates the O(N)
// token work — the actual hot loop at million-atom model files — to
// this translation unit via ctypes.  No Python object churn per token.
//
// Build: g++ -O3 -march=native -shared -fPIC xyz_native.cpp -o libxyz_native.so
// (driven lazily by gpumd_tpu/native/__init__.py; Python fallback if the
// toolchain is unavailable).

#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// skip whitespace, return pointer to next token start (or end)
inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
    ++p;
  return p;
}

inline const char* token_end(const char* p, const char* end) {
  while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n')
    ++p;
  return p;
}

} // namespace

extern "C" {

// In-memory variant: parse rows straight from a caller-held buffer.
// Returns number of rows parsed (== n_rows on success) or -1.
long xyz_parse_mem(const char* buf, long len, long n_rows, int n_cols,
                   int species_col, char* species_out, double* numeric_out) {
  const char* p = buf;
  const char* end = buf + len;
  long ni = 0;
  for (long r = 0; r < n_rows; ++r) {
    for (int c = 0; c < n_cols; ++c) {
      p = skip_ws(p, end);
      if (p >= end) return -1;
      const char* te = token_end(p, end);
      if (c == species_col) {
        long l = te - p;
        if (l > 15) l = 15;
        char* dst = species_out + r * 16;
        memcpy(dst, p, l);
        memset(dst + l, 0, 16 - l);
      } else {
        char* endp = nullptr;
        numeric_out[ni++] = strtod(p, &endp);
        if (endp == p) return -1;
      }
      p = te;
    }
  }
  return n_rows;
}

// Parse `n_rows` whitespace-separated rows of `n_cols` columns starting at
// byte `offset` of `path`.  The column `species_col` (or -1) is copied as a
// NUL-padded 15-char string into species_out (n_rows * 16 bytes); every
// other column is strtod'd into numeric_out row-major
// (n_rows * (n_cols - has_species)).
// Returns the byte offset just past the last parsed row, or -1 on error.
long xyz_parse_rows(const char* path, long offset, long n_rows, int n_cols,
                    int species_col, char* species_out, double* numeric_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  if (offset < 0 || offset > fsize) {
    fclose(f);
    return -1;
  }
  long cap = fsize - offset;
  char* buf = (char*)malloc(cap + 1);
  if (!buf) {
    fclose(f);
    return -1;
  }
  fseek(f, offset, SEEK_SET);
  long got = (long)fread(buf, 1, cap, f);
  fclose(f);
  buf[got] = '\0';

  const char* p = buf;
  const char* end = buf + got;
  const int n_num = n_cols - (species_col >= 0 ? 1 : 0);
  long ni = 0;
  for (long r = 0; r < n_rows; ++r) {
    for (int c = 0; c < n_cols; ++c) {
      p = skip_ws(p, end);
      if (p >= end) {
        free(buf);
        return -1; // truncated file
      }
      const char* te = token_end(p, end);
      if (c == species_col) {
        long len = te - p;
        if (len > 15) len = 15;
        char* dst = species_out + r * 16;
        memcpy(dst, p, len);
        memset(dst + len, 0, 16 - len);
      } else {
        char* endp = nullptr;
        numeric_out[ni++] = strtod(p, &endp);
        if (endp == p) {
          free(buf);
          return -1; // not a number
        }
      }
      p = te;
    }
  }
  (void)n_num;
  long consumed = p - buf;
  free(buf);
  return offset + consumed;
}

// Append `n_rows` formatted rows: species (16-byte entries) followed by
// n_cols numeric columns ("%.8g", space-separated).  Returns 0 on success.
int xyz_write_rows(const char* path, int append, const char* header,
                   long n_rows, const char* species, int n_cols,
                   const double* numeric) {
  FILE* f = fopen(path, append ? "ab" : "wb");
  if (!f) return -1;
  if (header && header[0]) fputs(header, f);
  char line[512];
  for (long r = 0; r < n_rows; ++r) {
    int pos = snprintf(line, sizeof line, "%s", species + r * 16);
    for (int c = 0; c < n_cols; ++c) {
      pos += snprintf(line + pos, sizeof line - pos, " %.15g",
                      numeric[r * n_cols + c]);
      if (pos >= (int)sizeof line - 32) break;
    }
    line[pos++] = '\n';
    fwrite(line, 1, pos, f);
  }
  fclose(f);
  return 0;
}

} // extern "C"
