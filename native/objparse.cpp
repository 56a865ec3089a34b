// Fast Wavefront OBJ parser (native backend for raytpu.io.obj).
//
// The tinyobjloader-speed analog (the reference vendors a 3.3k-line C++
// parser, include/tiny_obj_loader.h, used at src/main.cpp:51-63): positions
// + normals + fan-triangulated faces, vertex_index-first semantics matching
// raytpu/io/obj.py exactly. Exposed via a C ABI for ctypes.
//
// Build: make -C native  (produces libraytpu_native.so)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ParseResult {
  std::vector<float> positions;  // 3 * V
  std::vector<float> vn;         // 3 * VN (file order)
  std::vector<int32_t> tri_v;    // 3 * T vertex indices
  std::vector<int32_t> tri_vn;   // 3 * T normal indices (-1 if absent)
  char error[256];
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// strtof without locale overhead for the common case
inline const char* parse_float(const char* p, const char* end, float* out) {
  char* q;
  *out = strtof(p, &q);
  (void)end;
  return q;
}

inline const char* parse_int(const char* p, const char* end, long* out) {
  char* q;
  *out = strtol(p, &q, 10);
  (void)end;
  return q;
}

inline int resolve_index(long raw, size_t count) {
  if (raw > 0) return static_cast<int>(raw - 1);
  return static_cast<int>(static_cast<long>(count) + raw);
}

bool parse_buffer(const char* buf, size_t len, ParseResult* r) {
  const char* p = buf;
  const char* end = buf + len;
  std::vector<int> corner_v;
  std::vector<int> corner_vn;
  while (p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (p[0] == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      float x, y, z;
      p = parse_float(p + 2, end, &x);
      p = parse_float(p, end, &y);
      p = parse_float(p, end, &z);
      r->positions.push_back(x);
      r->positions.push_back(y);
      r->positions.push_back(z);
    } else if (p[0] == 'v' && p + 2 < end && p[1] == 'n' &&
               (p[2] == ' ' || p[2] == '\t')) {
      float x, y, z;
      p = parse_float(p + 3, end, &x);
      p = parse_float(p, end, &y);
      p = parse_float(p, end, &z);
      r->vn.push_back(x);
      r->vn.push_back(y);
      r->vn.push_back(z);
    } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      corner_v.clear();
      corner_vn.clear();
      p += 2;
      while (p < end && *p != '\n' && *p != '#') {
        p = skip_ws(p, end);
        if (p >= end || *p == '\n' || *p == '\r' || *p == '#') break;
        long vi_raw;
        const char* q = parse_int(p, end, &vi_raw);
        if (q == p) break;  // no progress: malformed token
        p = q;
        int ni = -1;
        if (p < end && *p == '/') {
          ++p;  // texcoord slot
          if (p < end && *p != '/') {
            long t;
            p = parse_int(p, end, &t);  // texcoord index: ignored
          }
          if (p < end && *p == '/') {
            ++p;
            long ni_raw;
            q = parse_int(p, end, &ni_raw);
            if (q != p) {
              ni = resolve_index(ni_raw, r->vn.size() / 3);
              p = q;
            }
          }
        }
        int vi = resolve_index(vi_raw, r->positions.size() / 3);
        corner_v.push_back(vi);
        corner_vn.push_back(ni);
      }
      // fan triangulation (matches raytpu/io/obj.py + tinyobjloader default)
      for (size_t k = 1; k + 1 < corner_v.size(); ++k) {
        r->tri_v.push_back(corner_v[0]);
        r->tri_v.push_back(corner_v[k]);
        r->tri_v.push_back(corner_v[k + 1]);
        r->tri_vn.push_back(corner_vn[0]);
        r->tri_vn.push_back(corner_vn[k]);
        r->tri_vn.push_back(corner_vn[k + 1]);
      }
    }
    p = next_line(p, end);
  }
  // index validation (same contract as the Python parser)
  const long vcount = static_cast<long>(r->positions.size() / 3);
  for (int32_t idx : r->tri_v) {
    if (idx < 0 || idx >= vcount) {
      snprintf(r->error, sizeof(r->error),
               "face references vertex index %d but file declares only %ld "
               "vertices",
               idx + 1, vcount);
      return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Opaque handle API: parse → query pointers → free.
void* obj_parse_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size));
  if (size > 0 && fread(buf.data(), 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    fclose(f);
    return nullptr;
  }
  fclose(f);
  auto* r = new ParseResult();
  r->error[0] = '\0';
  if (!parse_buffer(buf.data(), buf.size(), r)) {
    // keep handle alive so the caller can read the error, but flag it
    return r;
  }
  return r;
}

const char* obj_error(void* handle) {
  auto* r = static_cast<ParseResult*>(handle);
  return r->error;
}

int64_t obj_num_vertices(void* h) {
  return static_cast<ParseResult*>(h)->positions.size() / 3;
}
int64_t obj_num_normals(void* h) {
  return static_cast<ParseResult*>(h)->vn.size() / 3;
}
int64_t obj_num_triangles(void* h) {
  return static_cast<ParseResult*>(h)->tri_v.size() / 3;
}
const float* obj_positions(void* h) {
  return static_cast<ParseResult*>(h)->positions.data();
}
const float* obj_normals(void* h) {
  return static_cast<ParseResult*>(h)->vn.data();
}
const int32_t* obj_tri_v(void* h) {
  return static_cast<ParseResult*>(h)->tri_v.data();
}
const int32_t* obj_tri_vn(void* h) {
  return static_cast<ParseResult*>(h)->tri_vn.data();
}
void obj_free(void* h) { delete static_cast<ParseResult*>(h); }

}  // extern "C"
