// Host-side native kernels for furusato_recommend_tpu.
//
// Occupies the architectural slot of the reference's native dependencies
// (SURVEY.md §2.6): python-Levenshtein's C core (used by the product ID dedup,
// /root/reference/preprocessing/product/product_id_info.py:157-193), the PyG
// C++ neighbor sampler, and the C++ CSV/text parsing inside pandas. Exposed via
// ctypes (no pybind11 in this image); see
// furusato_recommend_tpu/preprocessing/native.py for the Python bindings and
// pure-Python fallbacks.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfurusato_native.so furusato_native.cpp

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// Levenshtein ratio with python-Levenshtein semantics: indel cost 1,
// substitution cost 2; ratio = (la + lb - dist) / (la + lb).
// Operates on unicode codepoints (uint32) so multi-byte Japanese text is
// compared per character, like the reference's Levenshtein.ratio on str.
double lev_ratio(const uint32_t* a, int32_t la, const uint32_t* b, int32_t lb) {
  if (la == 0 && lb == 0) return 1.0;
  std::vector<int32_t> prev(lb + 1), cur(lb + 1);
  for (int32_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int32_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (int32_t j = 1; j <= lb; ++j) {
      const int32_t sub = prev[j - 1] + (ca == b[j - 1] ? 0 : 2);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  const double total = static_cast<double>(la) + static_cast<double>(lb);
  return (total - static_cast<double>(prev[lb])) / total;
}

// Batched ratio over consecutive pairs — the access pattern of the reference's
// product-ID dedup loop (it compares name[i] with name[i+1]).
// codepoints: concatenated codepoint buffer; offsets: [n+1] row boundaries.
// out: [n-1] ratios of (row i, row i+1).
void lev_ratio_consecutive(const uint32_t* codepoints, const int64_t* offsets,
                           int64_t n, double* out) {
  for (int64_t i = 0; i + 1 < n; ++i) {
    const uint32_t* a = codepoints + offsets[i];
    const uint32_t* b = codepoints + offsets[i + 1];
    out[i] = lev_ratio(a, static_cast<int32_t>(offsets[i + 1] - offsets[i]), b,
                       static_cast<int32_t>(offsets[i + 2] - offsets[i + 1]));
  }
}

// Adjacency-list text parsing: counts then fills COO pairs for
// "uid item1 item2 ..." lines (the reference dataloader's Python hot loop,
// /root/reference/dataloader.py:93-124). Returns number of pairs written, or
// -1 if out_cap is too small. Two-pass usage: call with out_cap=0 to size.
int64_t parse_adjacency(const char* buf, int64_t len, int64_t* out_u,
                        int64_t* out_i, int64_t out_cap) {
  int64_t n = 0;
  int64_t pos = 0;
  while (pos < len) {
    // parse uid
    while (pos < len && (buf[pos] == ' ' || buf[pos] == '\r')) ++pos;
    if (pos >= len) break;
    if (buf[pos] == '\n') { ++pos; continue; }
    int64_t uid = 0;
    bool have = false;
    while (pos < len && buf[pos] >= '0' && buf[pos] <= '9') {
      uid = uid * 10 + (buf[pos] - '0');
      ++pos; have = true;
    }
    if (!have) { while (pos < len && buf[pos] != '\n') ++pos; continue; }
    // parse items until newline
    while (pos < len && buf[pos] != '\n') {
      while (pos < len && (buf[pos] == ' ' || buf[pos] == '\r')) ++pos;
      if (pos >= len || buf[pos] == '\n') break;
      int64_t item = 0;
      bool ihave = false;
      while (pos < len && buf[pos] >= '0' && buf[pos] <= '9') {
        item = item * 10 + (buf[pos] - '0');
        ++pos; ihave = true;
      }
      if (ihave) {
        if (out_cap > 0) {
          if (n >= out_cap) return -1;
          out_u[n] = uid;
          out_i[n] = item;
        }
        ++n;
      } else {
        ++pos;  // skip junk byte
      }
    }
  }
  return n;
}

// CPU fallback BPR sampler (reference-equivalent rejection sampling,
// /root/reference/negative_sample.py:98-134) over a CSR adjacency with
// row-sorted indices. Useful for host-side pipelines and as a parity oracle.
void bpr_sample(const int64_t* indptr, const int64_t* indices, int64_t n_users,
                int64_t m_items, int64_t n_samples, uint64_t seed,
                int64_t* out_u, int64_t* out_p, int64_t* out_n) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int64_t> du(0, n_users - 1);
  std::uniform_int_distribution<int64_t> di(0, m_items - 1);
  for (int64_t s = 0; s < n_samples; ++s) {
    int64_t u, deg;
    do {
      u = du(rng);
      deg = indptr[u + 1] - indptr[u];
    } while (deg == 0);
    const int64_t* row = indices + indptr[u];
    int64_t p = row[rng() % deg];
    int64_t neg;
    while (true) {
      neg = di(rng);
      if (!std::binary_search(row, row + deg, neg)) break;
    }
    out_u[s] = u;
    out_p[s] = p;
    out_n[s] = neg;
  }
}

// Partial-key cuckoo set build (ops/cuckoo.py). Slot math MUST match the
// murmur3-fmix32 mixing in ops/cuckoo.py exactly — the device membership test
// recomputes h1/h2 from the same fingerprints.
static inline uint32_t fmix32(uint32_t h) {
  h ^= h >> 16;
  h *= 0x85EBCA6Bu;
  h ^= h >> 13;
  h *= 0xC2B2AE35u;
  h ^= h >> 16;
  return h;
}

static inline uint64_t cuckoo_h1(uint32_t fp, uint64_t mask) {
  return fmix32(fp ^ 0xC2B2AE3Du) & mask;
}

static inline uint64_t cuckoo_alt(uint64_t slot, uint32_t fp, uint64_t mask) {
  return slot ^ (fmix32(fp ^ 0x165667B1u) & mask);
}

// fps: [n] non-zero fingerprints; tab: [size] zero-initialized (0 = empty),
// size a power of two. Returns the number of keys that could not be placed
// within max_kicks evictions (caller grows the table and retries on > 0).
int64_t cuckoo_build(const uint32_t* fps, int64_t n, uint32_t* tab,
                     int64_t size, int64_t max_kicks) {
  const uint64_t mask = (uint64_t)size - 1;
  int64_t failed = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t fp = fps[i];
    uint64_t s1 = cuckoo_h1(fp, mask);
    if (tab[s1] == fp) continue;  // set semantics: dedup
    uint64_t s2 = cuckoo_alt(s1, fp, mask);
    if (tab[s2] == fp) continue;
    if (tab[s1] == 0) { tab[s1] = fp; continue; }
    if (tab[s2] == 0) { tab[s2] = fp; continue; }
    // evict: random-walk starting at s1
    uint32_t cur = fp;
    uint64_t slot = s1;
    bool placed = false;
    for (int64_t k = 0; k < max_kicks; ++k) {
      uint32_t tmp = tab[slot];
      tab[slot] = cur;
      cur = tmp;
      slot = cuckoo_alt(slot, cur, mask);
      if (tab[slot] == 0 || tab[slot] == cur) {
        tab[slot] = cur;
        placed = true;
        break;
      }
    }
    if (!placed) ++failed;  // cur is dropped; caller retries with bigger table
  }
  return failed;
}

}  // extern "C"
