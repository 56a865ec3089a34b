// Baseline JPEG decoder (native backend for raytpu.io — the stb_image
// analog; the reference vendors a 7.9k-line decoder, include/stb_image.h,
// used for skybox faces at src/main.cpp:2064-2079).
//
// Scope: baseline sequential DCT, Huffman entropy coding, 8-bit, grayscale
// or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart markers. No
// progressive, arithmetic coding, or CMYK — callers fall back to PIL for
// those (raytpu/io/native.py verifies against PIL in tests).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Huff {
  // canonical Huffman: code lengths 1..16
  uint8_t counts[17] = {0};
  uint8_t symbols[256] = {0};
  int32_t mincode[17];
  int32_t maxcode[18];
  int32_t valptr[17];

  void build() {
    int32_t code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      valptr[l] = k;
      mincode[l] = code;
      code += counts[l];
      k += counts[l];
      maxcode[l] = code - 1;
      code <<= 1;
    }
    maxcode[17] = 0x7FFFFFFF;
  }
};

struct Component {
  int id = 0, h = 1, v = 1, tq = 0, td = 0, ta = 0;
  int dc_pred = 0;
};

struct Decoder {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  char error[128] = {0};

  int width = 0, height = 0, ncomp = 0;
  uint16_t qt[4][64] = {};
  Huff hdc[4], hac[4];
  Component comp[3];
  int hmax = 1, vmax = 1;
  int restart_interval = 0;

  // bit reader
  uint32_t bitbuf = 0;
  int bitcnt = 0;
  bool marker_hit = false;

  bool fail(const char* msg) {
    if (!error[0]) snprintf(error, sizeof(error), "%s", msg);
    return false;
  }

  int byte() { return pos < size ? data[pos++] : -1; }

  int bit() {
    if (bitcnt == 0) {
      int b = byte();
      if (b < 0) return -1;
      if (b == 0xFF) {
        int b2 = byte();
        if (b2 != 0) {  // a real marker (e.g. RST/EOI) — stop bits
          pos -= 2;
          marker_hit = true;
          return -1;
        }
      }
      bitbuf = static_cast<uint32_t>(b);
      bitcnt = 8;
    }
    bitcnt--;
    return (bitbuf >> bitcnt) & 1;
  }

  int bits(int n) {
    int v = 0;
    for (int i = 0; i < n; ++i) {
      int b = bit();
      if (b < 0) return -1;
      v = (v << 1) | b;
    }
    return v;
  }

  int huff_decode(const Huff& h) {
    int code = 0;
    for (int l = 1; l <= 16; ++l) {
      int b = bit();
      if (b < 0) return -1;
      code = (code << 1) | b;
      if (code <= h.maxcode[l]) {
        int idx = h.valptr[l] + code - h.mincode[l];
        if (idx < 0 || idx > 255) return -1;  // corrupt table/stream
        return h.symbols[idx];
      }
    }
    return -1;
  }

  static int extend(int v, int t) {
    return (t && v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
  }
};

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// simple separable float IDCT (correctness-first; decode is setup-time only)
void idct8(float* b, int stride) {
  static float c[8][8];
  static bool init = false;
  if (!init) {
    for (int u = 0; u < 8; ++u)
      for (int x = 0; x < 8; ++x)
        c[u][x] = (u == 0 ? 0.353553390593f : 0.5f) *
                  std::cos((2 * x + 1) * u * 3.14159265358979323846f / 16.0f);
    init = true;
  }
  float tmp[8];
  for (int r = 0; r < 8; ++r) {
    float* row = b + r * stride;
    for (int x = 0; x < 8; ++x) {
      float s = 0;
      for (int u = 0; u < 8; ++u) s += c[u][x] * row[u];
      tmp[x] = s;
    }
    memcpy(row, tmp, sizeof(tmp));
  }
  for (int col = 0; col < 8; ++col) {
    for (int x = 0; x < 8; ++x) {
      float s = 0;
      for (int u = 0; u < 8; ++u) s += c[u][x] * b[u * stride + col];
      tmp[x] = s;
    }
    for (int x = 0; x < 8; ++x) b[x * stride + col] = tmp[x];
  }
}

struct Image {
  int width = 0, height = 0;
  std::vector<uint8_t> rgb;
  char error[128] = {0};
};

bool decode(Decoder& d, Image& out) {
  if (d.size < 4 || d.data[0] != 0xFF || d.data[1] != 0xD8)
    return d.fail("not a JPEG (no SOI)");
  d.pos = 2;

  bool got_sof = false, got_sos = false;
  while (d.pos + 4 <= d.size) {
    if (d.data[d.pos] != 0xFF) return d.fail("marker sync lost");
    int m = d.data[d.pos + 1];
    d.pos += 2;
    if (m == 0xD9) break;  // EOI
    if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;  // standalone
    int len = (d.data[d.pos] << 8) | d.data[d.pos + 1];
    size_t seg_end = d.pos + len;
    if (len < 2 || seg_end > d.size)
      return d.fail("truncated segment");
    d.pos += 2;
    switch (m) {
      case 0xC0:  // SOF0 baseline
      case 0xC1: {
        int prec = d.data[d.pos];
        if (prec != 8) return d.fail("only 8-bit supported");
        d.height = (d.data[d.pos + 1] << 8) | d.data[d.pos + 2];
        d.width = (d.data[d.pos + 3] << 8) | d.data[d.pos + 4];
        d.ncomp = d.data[d.pos + 5];
        if (d.ncomp != 1 && d.ncomp != 3)
          return d.fail("only 1 or 3 components");
        if (d.pos + 6 + 3 * static_cast<size_t>(d.ncomp) > seg_end)
          return d.fail("truncated SOF");
        for (int i = 0; i < d.ncomp; ++i) {
          const uint8_t* p = d.data + d.pos + 6 + 3 * i;
          d.comp[i].id = p[0];
          d.comp[i].h = p[1] >> 4;
          d.comp[i].v = p[1] & 15;
          d.comp[i].tq = p[2];
          if (d.comp[i].tq > 3) return d.fail("bad SOF quant table id");
          if (d.comp[i].h < 1 || d.comp[i].h > 4 || d.comp[i].v < 1 ||
              d.comp[i].v > 4)
            return d.fail("bad sampling factors");
          if (d.comp[i].h > d.hmax) d.hmax = d.comp[i].h;
          if (d.comp[i].v > d.vmax) d.vmax = d.comp[i].v;
        }
        got_sof = true;
        break;
      }
      case 0xC2:
        return d.fail("progressive JPEG not supported (PIL fallback)");
      case 0xC4: {  // DHT
        size_t p = d.pos;
        while (p < seg_end) {
          if (p + 17 > seg_end) return d.fail("truncated huffman table");
          int tc = d.data[p] >> 4, th = d.data[p] & 15;
          if (th > 3) return d.fail("bad huffman table id");
          Huff& h = tc ? d.hac[th] : d.hdc[th];
          int total = 0;
          for (int l = 1; l <= 16; ++l) {
            h.counts[l] = d.data[p + l];
            total += h.counts[l];
          }
          if (total > 256 || p + 17 + total > seg_end)
            return d.fail("bad huffman table");
          memcpy(h.symbols, d.data + p + 17, total);
          h.build();
          p += 17 + total;
        }
        break;
      }
      case 0xDB: {  // DQT
        size_t p = d.pos;
        while (p < seg_end) {
          int pq = d.data[p] >> 4, tq = d.data[p] & 15;
          if (tq > 3) return d.fail("bad quant table id");
          if (p + 1 + (pq ? 128 : 64) > seg_end)
            return d.fail("truncated quant table");
          p += 1;
          for (int i = 0; i < 64; ++i) {
            d.qt[tq][i] =
                pq ? ((d.data[p] << 8) | d.data[p + 1]) : d.data[p];
            p += pq ? 2 : 1;
          }
        }
        break;
      }
      case 0xDD:  // DRI
        d.restart_interval = (d.data[d.pos] << 8) | d.data[d.pos + 1];
        break;
      case 0xDA: {  // SOS
        int ns = d.data[d.pos];
        if (d.pos + 1 + 2 * static_cast<size_t>(ns) > seg_end)
          return d.fail("truncated SOS");
        for (int i = 0; i < ns; ++i) {
          int cid = d.data[d.pos + 1 + 2 * i];
          int tt = d.data[d.pos + 2 + 2 * i];
          if ((tt >> 4) > 3 || (tt & 15) > 3)
            return d.fail("bad SOS huffman table id");
          for (int c = 0; c < d.ncomp; ++c) {
            if (d.comp[c].id == cid) {
              d.comp[c].td = tt >> 4;
              d.comp[c].ta = tt & 15;
            }
          }
        }
        d.pos = seg_end;
        got_sos = true;
        break;
      }
      default:
        break;  // APPn/COM etc: skip
    }
    if (!got_sos) d.pos = seg_end;
    if (got_sos) break;
  }
  if (!got_sof || !got_sos) return d.fail("missing SOF/SOS");

  const int mcu_w = d.hmax * 8, mcu_h = d.vmax * 8;
  const int mcus_x = (d.width + mcu_w - 1) / mcu_w;
  const int mcus_y = (d.height + mcu_h - 1) / mcu_h;

  // per-component planes at full MCU-padded resolution
  std::vector<std::vector<uint8_t>> planes(d.ncomp);
  std::vector<int> pw(d.ncomp), ph(d.ncomp);
  for (int c = 0; c < d.ncomp; ++c) {
    pw[c] = mcus_x * d.comp[c].h * 8;
    ph[c] = mcus_y * d.comp[c].v * 8;
    planes[c].assign(static_cast<size_t>(pw[c]) * ph[c], 0);
  }

  float block[64];
  int mcu_count = 0;
  for (int my = 0; my < mcus_y; ++my) {
    for (int mx = 0; mx < mcus_x; ++mx) {
      if (d.restart_interval && mcu_count && mcu_count % d.restart_interval == 0) {
        // resync at RSTn marker
        d.bitcnt = 0;
        d.marker_hit = false;
        while (d.pos + 1 < d.size &&
               !(d.data[d.pos] == 0xFF && d.data[d.pos + 1] >= 0xD0 &&
                 d.data[d.pos + 1] <= 0xD7))
          d.pos++;
        if (d.pos + 1 < d.size) d.pos += 2;
        for (int c = 0; c < d.ncomp; ++c) d.comp[c].dc_pred = 0;
      }
      mcu_count++;
      for (int c = 0; c < d.ncomp; ++c) {
        Component& cc = d.comp[c];
        for (int by = 0; by < cc.v; ++by) {
          for (int bx = 0; bx < cc.h; ++bx) {
            // --- decode one 8x8 block ---
            int t = d.huff_decode(d.hdc[cc.td]);
            if (t < 0) return d.fail("huffman error (DC)");
            int diff = t ? d.bits(t) : 0;
            if (diff < 0 && t) return d.fail("bitstream error (DC)");
            cc.dc_pred += Decoder::extend(diff, t);
            int coeff[64] = {0};
            coeff[0] = cc.dc_pred;
            for (int k = 1; k < 64;) {
              int rs = d.huff_decode(d.hac[cc.ta]);
              if (rs < 0) return d.fail("huffman error (AC)");
              int r = rs >> 4, s = rs & 15;
              if (s == 0) {
                if (r != 15) break;  // EOB
                k += 16;
                continue;
              }
              k += r;
              if (k > 63) return d.fail("AC index overflow");
              int v = d.bits(s);
              if (v < 0) return d.fail("bitstream error (AC)");
              coeff[k++] = Decoder::extend(v, s);
            }
            const uint16_t* q = d.qt[cc.tq];
            for (int k = 0; k < 64; ++k)
              block[kZigzag[k]] = static_cast<float>(coeff[k]) * q[k];
            idct8(block, 8);
            // store block
            int ox = (mx * cc.h + bx) * 8;
            int oy = (my * cc.v + by) * 8;
            uint8_t* plane = planes[c].data();
            for (int y = 0; y < 8; ++y) {
              for (int x = 0; x < 8; ++x) {
                float v = block[y * 8 + x] + 128.0f;
                int iv = static_cast<int>(v + 0.5f);
                if (iv < 0) iv = 0;
                if (iv > 255) iv = 255;
                plane[static_cast<size_t>(oy + y) * pw[c] + ox + x] =
                    static_cast<uint8_t>(iv);
              }
            }
          }
        }
      }
    }
  }

  // --- upsample + color convert ---
  out.width = d.width;
  out.height = d.height;
  out.rgb.resize(static_cast<size_t>(d.width) * d.height * 3);
  for (int y = 0; y < d.height; ++y) {
    for (int x = 0; x < d.width; ++x) {
      uint8_t* px = out.rgb.data() + (static_cast<size_t>(y) * d.width + x) * 3;
      if (d.ncomp == 1) {
        uint8_t g = planes[0][static_cast<size_t>(y) * pw[0] + x];
        px[0] = px[1] = px[2] = g;
        continue;
      }
      auto sample = [&](int c) -> int {
        int sx = x * d.comp[c].h / d.hmax;
        int sy = y * d.comp[c].v / d.vmax;
        return planes[c][static_cast<size_t>(sy) * pw[c] + sx];
      };
      float Y = sample(0);
      float Cb = sample(1) - 128.0f;
      float Cr = sample(2) - 128.0f;
      int r = static_cast<int>(Y + 1.402f * Cr + 0.5f);
      int g = static_cast<int>(Y - 0.344136f * Cb - 0.714136f * Cr + 0.5f);
      int b = static_cast<int>(Y + 1.772f * Cb + 0.5f);
      px[0] = static_cast<uint8_t>(r < 0 ? 0 : r > 255 ? 255 : r);
      px[1] = static_cast<uint8_t>(g < 0 ? 0 : g > 255 ? 255 : g);
      px[2] = static_cast<uint8_t>(b < 0 ? 0 : b > 255 ? 255 : b);
    }
  }
  return true;
}

}  // namespace

extern "C" {

void* jpeg_decode_file(const char* path) {
  FILE* f = fopen(path, "rb");
  auto* img = new Image();
  if (!f) {
    snprintf(img->error, sizeof(img->error), "cannot open file");
    return img;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  if (sz > 0 && fread(buf.data(), 1, static_cast<size_t>(sz), f) !=
                    static_cast<size_t>(sz)) {
    fclose(f);
    snprintf(img->error, sizeof(img->error), "read error");
    return img;
  }
  fclose(f);
  Decoder d;
  d.data = buf.data();
  d.size = buf.size();
  if (!decode(d, *img)) {
    snprintf(img->error, sizeof(img->error), "%s", d.error);
  }
  return img;
}

const char* jpeg_error(void* h) { return static_cast<Image*>(h)->error; }
int32_t jpeg_width(void* h) { return static_cast<Image*>(h)->width; }
int32_t jpeg_height(void* h) { return static_cast<Image*>(h)->height; }
const uint8_t* jpeg_rgb(void* h) { return static_cast<Image*>(h)->rgb.data(); }
void jpeg_free(void* h) { delete static_cast<Image*>(h); }

}  // extern "C"
