// Native host runtime for phyngsc_tpu (ctypes-loaded).
//
// The reference spends its host cycles in OpenMP byte scans over the read
// buffer (record indexing, phyNGSC.cpp:254-331) and in Huffman tree builds
// (huffman.cpp:18-85). These are the host-side hot loops of the TPU pipeline
// too — everything else runs on device — so they get native implementations:
//
//   phyngsc_index_records  — newline-structured record span scan (C3)
//   phyngsc_gather         — padded (R, W) matrix gather for device batching
//   phyngsc_huffman_lengths— batched length-limited Huffman (C8 host side)
//
// Build: make -C native   (g++ -O3 -fopenmp -shared). Python falls back to
// numpy implementations when the library is absent.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns number of complete 4-line records found, or -(1+record_idx) on a
// validation failure at record_idx. Buffer must start at a record start.
int64_t phyngsc_index_records(const uint8_t *buf, int64_t n,
                              int64_t *title_start, int64_t *title_end,
                              int64_t *seq_start, int64_t *seq_end,
                              int64_t *qual_start, int64_t *qual_end,
                              int64_t max_records, int validate) {
  int64_t count = 0;
  const uint8_t *p = buf;
  const uint8_t *end = buf + n;
  while (p < end && count < max_records) {
    const uint8_t *t0 = p;
    const uint8_t *t1 = (const uint8_t *)memchr(t0, '\n', end - t0);
    if (!t1) break;
    const uint8_t *s0 = t1 + 1;
    const uint8_t *s1 = (const uint8_t *)memchr(s0, '\n', end - s0);
    if (!s1) break;
    const uint8_t *p0 = s1 + 1;
    const uint8_t *p1 = (const uint8_t *)memchr(p0, '\n', end - p0);
    if (!p1) break;
    const uint8_t *q0 = p1 + 1;
    const uint8_t *q1 = (const uint8_t *)memchr(q0, '\n', end - q0);
    if (!q1) break;
    if (validate) {
      if (*t0 != '@') return -(1 + count);
      if (p1 - p0 != 1 || *p0 != '+') return -(1 + count);
      if (q1 - q0 != s1 - s0) return -(1 + count);
    }
    title_start[count] = t0 - buf;
    title_end[count] = t1 - buf;
    seq_start[count] = s0 - buf;
    seq_end[count] = s1 - buf;
    qual_start[count] = q0 - buf;
    qual_end[count] = q1 - buf;
    ++count;
    p = q1 + 1;
  }
  return count;
}

// out must be R*W bytes, zero-filled by callee for the padding.
void phyngsc_gather(const uint8_t *buf, int64_t n, const int64_t *starts,
                    const int32_t *lens, int64_t R, int64_t W, uint8_t *out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < R; ++r) {
    uint8_t *dst = out + r * W;
    int64_t len = lens[r];
    if (len > W) len = W;
    int64_t s = starts[r];
    if (s < 0 || s + len > n) len = 0;
    if (len > 0) memcpy(dst, buf + s, (size_t)len);
    if (len < W) memset(dst + len, 0, (size_t)(W - len));
  }
}

namespace {

// Single-tree length-limited Huffman (sort + two-queue merge + Kraft repair).
void huffman_one(const int64_t *hist, int32_t A, int32_t max_len,
                 uint8_t *lens, int32_t *singleton) {
  std::vector<int> present;
  present.reserve(A);
  for (int32_t s = 0; s < A; ++s) {
    lens[s] = 0;
    if (hist[s] > 0) present.push_back(s);
  }
  *singleton = -1;
  const int n = (int)present.size();
  if (n == 0) return;
  if (n == 1) {  // zero-bit singleton code
    *singleton = present[0];
    return;
  }
  // sort symbols by (freq, symbol) — stable tiebreak like the host builder
  std::sort(present.begin(), present.end(), [&](int a, int b) {
    return hist[a] != hist[b] ? hist[a] < hist[b] : a < b;
  });
  // two-queue merge: leaves (sorted) + internal nodes (produced sorted)
  std::vector<int64_t> leaf_w(n), node_w;
  std::vector<int> parent(2 * n - 1, -1);
  node_w.reserve(n - 1);
  for (int i = 0; i < n; ++i) leaf_w[i] = hist[present[i]];
  int li = 0;
  size_t ni = 0;
  auto take = [&]() -> int {
    // returns node id: leaves are [0, n), internals [n, 2n-1)
    bool use_leaf;
    if (li >= n) use_leaf = false;
    else if (ni >= node_w.size()) use_leaf = true;
    else use_leaf = leaf_w[li] <= node_w[ni];
    if (use_leaf) return li++;
    return n + (int)(ni++);
  };
  for (int k = 0; k < n - 1; ++k) {
    int a = take();
    int b = take();
    int64_t w = (a < n ? leaf_w[a] : node_w[a - n]) +
                (b < n ? leaf_w[b] : node_w[b - n]);
    int id = n + (int)node_w.size();
    node_w.push_back(w);
    parent[a] = id;
    parent[b] = id;
  }
  std::vector<uint8_t> depth(n, 0);
  for (int i = 0; i < n; ++i) {
    int d = 0, v = i;
    while (parent[v] != -1) {
      v = parent[v];
      ++d;
    }
    depth[i] = (uint8_t)(d > 255 ? 255 : d);
  }
  // clamp + Kraft repair (lengthen cheapest, then shorten most frequent)
  std::vector<int> dlen(n);
  for (int i = 0; i < n; ++i) dlen[i] = std::min<int>(depth[i], max_len);
  const int64_t target = (int64_t)1 << max_len;
  int64_t kraft = 0;
  for (int i = 0; i < n; ++i) kraft += target >> dlen[i];
  // present[] is frequency-ascending: lengthen from the front
  while (kraft > target) {
    bool moved = false;
    for (int i = 0; i < n && kraft > target; ++i) {
      if (dlen[i] < max_len) {
        kraft -= target >> (dlen[i] + 1);
        ++dlen[i];
        moved = true;
      }
    }
    if (!moved) break;  // unreachable for n <= 2^max_len
  }
  bool changed = true;
  while (changed && kraft < target) {
    changed = false;
    for (int i = n - 1; i >= 0; --i) {  // most frequent first
      while (dlen[i] > 1 && kraft + (target >> dlen[i]) <= target) {
        kraft += target >> dlen[i];
        --dlen[i];
        changed = true;
      }
    }
  }
  for (int i = 0; i < n; ++i) lens[present[i]] = (uint8_t)dlen[i];
}

}  // namespace

void phyngsc_huffman_lengths(const int64_t *hist, int32_t K, int32_t A,
                             int32_t max_len, uint8_t *lens,
                             int32_t *singletons) {
#pragma omp parallel for schedule(static)
  for (int32_t k = 0; k < K; ++k) {
    huffman_one(hist + (int64_t)k * A, A, max_len, lens + (int64_t)k * A,
                &singletons[k]);
  }
}

// Single-pass title scan: separator positions/chars plus per-field canonical
// numeric parse (<= 18 digits, no leading zero unless "0"). Replaces the
// tokenize + per-field digit loops of the title model (models/title.py) —
// the dominant host cost after everything else moved to device.
// sep_tab: 256-entry 0/1 separator table. Field f of record r spans
// [prev_sep+1, sep_pos[r,f]).
void phyngsc_title_scan(const uint8_t *titles, const int32_t *tlens,
                        int64_t R, int64_t TL, const uint8_t *sep_tab,
                        int32_t max_seps,
                        int32_t *nsep,        // (R,)
                        int32_t *sep_pos,     // (R, max_seps)
                        uint8_t *sep_chars,   // (R, max_seps)
                        int64_t *values,      // (R, max_seps+1)
                        uint8_t *numeric_ok   // (R, max_seps+1)
) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < R; ++r) {
    const uint8_t *t = titles + r * TL;
    const int32_t n = tlens[r];
    int32_t ns = 0;
    int32_t field = 0;
    int64_t val = 0;
    int32_t digits = 0;
    bool all_digits = true;
    bool leading_zero = false;
    int64_t *v = values + r * (max_seps + 1);
    uint8_t *ok = numeric_ok + r * (max_seps + 1);
    auto close_field = [&]() {
      if (field <= max_seps) {
        bool good = all_digits && digits >= 1 && digits <= 18 &&
                    !(leading_zero && digits > 1);
        v[field] = good ? val : 0;
        ok[field] = good ? 1 : 0;
      }
      val = 0;
      digits = 0;
      all_digits = true;
      leading_zero = false;
      ++field;
    };
    for (int32_t i = 0; i < n; ++i) {
      uint8_t c = t[i];
      if (sep_tab[c]) {
        close_field();
        if (ns < max_seps) {
          sep_pos[r * max_seps + ns] = i;
          sep_chars[r * max_seps + ns] = c;
        }
        ++ns;
      } else if (c >= '0' && c <= '9') {
        if (digits == 0 && c == '0') leading_zero = true;
        if (digits < 19) val = val * 10 + (c - '0');
        ++digits;
      } else {
        all_digits = false;
      }
    }
    close_field();
    nsep[r] = ns;
  }
}

}  // extern "C"
