// Native preprocessing library: WRT dictionary transform + filetype detection.
//
// Capability parity with the reference's C++ preprocessing layer
// (src/preprocess/dictionary.cpp: word->codeword transform with
// capitalization escapes; src/preprocess/preprocessor.cpp:112-289: content
// detection).  This is a new scheme, not a port: codeword space and escape
// bytes are defined below and are part of THIS format.
//
// Codeword space (text transform):
//   0x80-0xBF           : 1-byte codes, word ids 0..63
//   0xC0-0xEF, b2       : 2-byte codes, ids 64..64+48*256-1
//   0xF0-0xFE, b2, b3   : 3-byte codes, ids up to ~1M
//   ESC  = 0x04         : next byte is a literal >= 0x80 (or an escape byte)
//   CAP  = 0x05         : next word has its first letter capitalized
//   UPR  = 0x06         : next word is all-caps
// Build: g++ -O2 -shared -fPIC -o libpreproc.so preproc.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint8_t ESC = 0x04, CAP = 0x05, UPR = 0x06;
constexpr int N1 = 64, N2 = 48 * 256;

struct Dict {
  std::vector<std::string> words;                 // id -> word (lowercase)
  std::unordered_map<std::string, int32_t> ids;   // word -> id
};

std::string lower(const std::string& w) {
  std::string r = w;
  for (auto& c : r)
    if (c >= 'A' && c <= 'Z') c += 32;
  return r;
}

void emit_code(std::vector<uint8_t>& out, int32_t id) {
  if (id < N1) {
    out.push_back(0x80 + id);
  } else if (id < N1 + N2) {
    int32_t v = id - N1;
    out.push_back(0xC0 + (v >> 8));
    out.push_back(v & 0xFF);
  } else {
    int32_t v = id - N1 - N2;
    out.push_back(0xF0 + (v >> 16));
    out.push_back((v >> 8) & 0xFF);
    out.push_back(v & 0xFF);
  }
}

}  // namespace

extern "C" {

void* wrt_load_dict(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* d = new Dict();
  char buf[512];
  while (fgets(buf, sizeof buf, f)) {
    size_t n = strlen(buf);
    while (n && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) --n;
    if (!n) continue;
    std::string w(buf, n);
    if (d->ids.count(w)) continue;
    d->ids.emplace(w, (int32_t)d->words.size());
    d->words.push_back(w);
  }
  fclose(f);
  return d;
}

void wrt_free_dict(void* h) { delete static_cast<Dict*>(h); }
int32_t wrt_dict_size(void* h) {
  return (int32_t)static_cast<Dict*>(h)->words.size();
}

// Encode: returns output length, or -1 if out_cap too small.
int64_t wrt_encode(void* h, const uint8_t* in, int64_t n, uint8_t* out,
                   int64_t cap) {
  Dict* d = static_cast<Dict*>(h);
  std::vector<uint8_t> o;
  o.reserve(n);
  int64_t i = 0;
  while (i < n) {
    uint8_t c = in[i];
    bool alpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
    if (alpha) {
      int64_t j = i;
      while (j < n && (((in[j] | 32) >= 'a') && ((in[j] | 32) <= 'z'))) ++j;
      std::string w((const char*)in + i, j - i);
      std::string lw = lower(w);
      auto it = d->ids.find(lw);
      bool first_up = (w[0] >= 'A' && w[0] <= 'Z');
      bool rest_lower = true, rest_upper = true;
      for (size_t k = 1; k < w.size(); ++k) {
        if (w[k] >= 'A' && w[k] <= 'Z') rest_lower = false;
        else rest_upper = false;
      }
      bool is_lower = (w == lw);
      bool is_cap = first_up && rest_lower;
      bool is_upper = first_up && rest_upper && w.size() > 1;
      if (it != d->ids.end() && (is_lower || is_cap || is_upper)) {
        if (is_upper) o.push_back(UPR);
        else if (is_cap) o.push_back(CAP);
        emit_code(o, it->second);
      } else {
        for (char ch : w) o.push_back((uint8_t)ch);
      }
      i = j;
    } else if (c >= 0x80 || c == ESC || c == CAP || c == UPR) {
      o.push_back(ESC);
      o.push_back(c);
      ++i;
    } else {
      o.push_back(c);
      ++i;
    }
  }
  if ((int64_t)o.size() > cap) return -1;
  memcpy(out, o.data(), o.size());
  return (int64_t)o.size();
}

int64_t wrt_decode(void* h, const uint8_t* in, int64_t n, uint8_t* out,
                   int64_t cap) {
  Dict* d = static_cast<Dict*>(h);
  std::vector<uint8_t> o;
  o.reserve(n * 3);
  int64_t i = 0;
  int capmode = 0;  // 0 none, 1 capitalize, 2 upper
  while (i < n) {
    uint8_t c = in[i];
    if (c == ESC && i + 1 < n) {
      o.push_back(in[i + 1]);
      i += 2;
      capmode = 0;
      continue;
    }
    if (c == CAP) { capmode = 1; ++i; continue; }
    if (c == UPR) { capmode = 2; ++i; continue; }
    if (c < 0x80) {
      o.push_back(c);
      ++i;
      capmode = 0;
      continue;
    }
    int32_t id;
    if (c < 0xC0) {
      id = c - 0x80;
      i += 1;
    } else if (c < 0xF0) {
      if (i + 1 >= n) { o.push_back(c); ++i; continue; }
      id = N1 + (((int32_t)(c - 0xC0)) << 8 | in[i + 1]);
      i += 2;
    } else {
      if (i + 2 >= n) { o.push_back(c); ++i; continue; }
      id = N1 + N2 + (((int32_t)(c - 0xF0)) << 16 | (int32_t)in[i + 1] << 8 |
                      in[i + 2]);
      i += 3;
    }
    if (id < 0 || id >= (int32_t)d->words.size()) { capmode = 0; continue; }
    std::string w = d->words[id];
    if (capmode == 1 && w[0] >= 'a' && w[0] <= 'z') w[0] -= 32;
    if (capmode == 2)
      for (auto& ch : w)
        if (ch >= 'a' && ch <= 'z') ch -= 32;
    capmode = 0;
    for (char ch : w) o.push_back((uint8_t)ch);
  }
  if ((int64_t)o.size() > cap) return -1;
  memcpy(out, o.data(), o.size());
  return (int64_t)o.size();
}

// Filetype detection over fixed-size chunks (cf. preprocessor.cpp:146-175
// TEXT detection): returns per-chunk type, 0=binary, 1=text.
void detect_chunks(const uint8_t* in, int64_t n, int64_t chunk,
                   uint8_t* types) {
  int64_t nc = (n + chunk - 1) / chunk;
  for (int64_t c = 0; c < nc; ++c) {
    int64_t lo = c * chunk, hi = lo + chunk < n ? lo + chunk : n;
    int64_t printable = 0;
    for (int64_t i = lo; i < hi; ++i) {
      uint8_t b = in[i];
      if (b == 9 || b == 10 || b == 13 || (b >= 32 && b < 127)) ++printable;
    }
    types[c] = (printable * 100 >= (hi - lo) * 90) ? 1 : 0;
  }
}

}  // extern "C"

// ---------------------------------------------------------------- EXE x86
// E8/E9 (call/jmp rel32) + 0F 8x (jcc rel32) absolutization, capability
// parity with encode_exe (preprocessor.cpp:377-441; same invariance
// idea, own byte layout).  The transform condition -- top operand byte
// in {0x00, 0xFF} -- is INVARIANT under the transform itself: the
// target address a = rel + next_insn_pos is reduced mod 2^25 and
// sign-extended, so its top byte is again 0x00/0xFF, and the inverse
// (a - pos mod 2^25, sign-extend) restores rel exactly for any position
// (no 16 MB segment limit, no |rel|~2^24 edge asymmetry: encode and
// decode always agree on WHICH operands were transformed).  Encode
// scans backward and decode forward, so overlapping matches compose
// LIFO and invert exactly.  Middle bytes are XOR 0xB0 (decorrelates
// the mostly-0x00/0xFF halo for the models).
static inline int exe_cond(const uint8_t* p, int64_t j, int64_t n) {
  if (j + 4 >= n) return 0;
  if (p[j + 4] != 0x00 && p[j + 4] != 0xFF) return 0;
  return p[j] == 0xE8 || p[j] == 0xE9 ||
         (j >= 1 && p[j - 1] == 0x0F && (p[j] & 0xF0) == 0x80);
}

static inline int32_t sext25(int64_t v) {
  v &= 0x1FFFFFF;
  return (int32_t)(v & 0x1000000 ? v - 0x2000000 : v);
}

extern "C" {

int64_t exe_encode(const uint8_t* in, int64_t n, uint8_t* out, int64_t cap) {
  if (cap < n) return -1;
  memcpy(out, in, n);
  for (int64_t j = n - 5; j >= 0; --j) {
    if (exe_cond(out, j, n)) {
      int64_t rel = (int64_t)out[j + 1] | (int64_t)out[j + 2] << 8 |
                    (int64_t)out[j + 3] << 16 | (int64_t)out[j + 4] << 24;
      int32_t a = sext25(rel + j + 5);
      out[j + 1] = (uint8_t)(a & 0xFF) ^ 0xB0;
      out[j + 2] = (uint8_t)((a >> 8) & 0xFF) ^ 0xB0;
      out[j + 3] = (uint8_t)((a >> 16) & 0xFF) ^ 0xB0;
      out[j + 4] = (uint8_t)((a >> 24) & 0xFF);
    }
  }
  return n;
}

int64_t exe_decode(const uint8_t* in, int64_t n, uint8_t* out, int64_t cap) {
  if (cap < n) return -1;
  memcpy(out, in, n);
  for (int64_t j = 0; j + 4 < n; ++j) {
    if (exe_cond(out, j, n)) {
      int64_t a = (int64_t)(out[j + 1] ^ 0xB0) |
                  (int64_t)(out[j + 2] ^ 0xB0) << 8 |
                  (int64_t)(out[j + 3] ^ 0xB0) << 16 |
                  (int64_t)out[j + 4] << 24;
      int32_t rel = sext25(a - j - 5);
      out[j + 1] = (uint8_t)(rel & 0xFF);
      out[j + 2] = (uint8_t)((rel >> 8) & 0xFF);
      out[j + 3] = (uint8_t)((rel >> 16) & 0xFF);
      out[j + 4] = (uint8_t)((rel >> 24) & 0xFF);
    }
  }
  return n;
}

// E8/E9 density probe for detection (cf. preprocessor.cpp:126-143)
int64_t exe_score(const uint8_t* in, int64_t n) {
  int64_t score = 0;
  for (int64_t i = 0; i + 4 < n; ++i) {
    if (in[i] == 0xE8 || in[i] == 0xE9) {
      int32_t y;
      memcpy(&y, in + i + 1, 4);
      if (y > -(1 << 22) && y < (1 << 22)) ++score;
    }
  }
  return score;
}

}  // extern "C"
