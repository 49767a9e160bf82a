// kf2vec native ingest library.
//
// Host-side replacements for the reference's external native tools
// (Jellyfish's reader/counter, seqtk/seqkit byte passes): base encoding,
// one-pass FASTA parsing+encoding, and a multithreaded rolling canonical
// k-mer counter used as the CPU fallback when no accelerator is attached
// (the TPU path is the Pallas histogram kernel).
//
// Build: make (g++ -O3 -shared). Loaded via ctypes from lib.py; pure-numpy
// fallbacks exist for every entry point.

#include <atomic>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__BMI2__)
#include <immintrin.h>
#endif

namespace {

uint8_t LUT[256];
uint8_t REV8[256];  // reverse the four 2-bit groups within a byte

struct LutInit {
  LutInit() {
    memset(LUT, 4, sizeof(LUT));
    LUT['A'] = LUT['a'] = 0;
    LUT['C'] = LUT['c'] = 1;
    LUT['G'] = LUT['g'] = 2;
    LUT['T'] = LUT['t'] = 3;
    for (int v = 0; v < 256; ++v)
      REV8[v] = (uint8_t)(((v & 3) << 6) | ((v & 12) << 2) | ((v & 48) >> 2) |
                          ((v & 192) >> 6));
  }
} lut_init;

// Count canonical k-mers in codes[lo .. hi+k-1), adding into hist.
// Windows containing an invalid base (>=4) are skipped.
void count_range(const uint8_t* codes, int64_t n, int k, int64_t lo, int64_t hi,
                 int64_t* hist) {
  const uint64_t mask = (2 * k < 64) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int rc_shift = 2 * (k - 1);
  uint64_t fwd = 0, rc = 0;
  int64_t valid_run = 0;  // consecutive valid bases ending at current pos
  // warm up with the k-1 bases before the first window's last base
  for (int64_t i = lo; i < hi + k - 1 && i < n; ++i) {
    uint8_t b = codes[i];
    if (b >= 4) {
      valid_run = 0;
      fwd = 0;
      rc = 0;
      continue;
    }
    fwd = ((fwd << 2) | b) & mask;
    rc = (rc >> 2) | ((uint64_t)(3 - b) << rc_shift);
    ++valid_run;
    if (valid_run >= k && i - (int64_t)k + 1 >= lo) {
      uint64_t canon = fwd < rc ? fwd : rc;
      ++hist[canon];
    }
  }
}

// ---- fast path: forward-only little-endian counting + canonical fold ----
//
// Counting min(fwd, revcomp) per window needs ~13 uops/base in the rolling
// loop. Instead count each window under a BIJECTIVE relabeling — the
// little-endian code c2 = sum_j base_j << 2j (earliest base in the lowest
// bits) — which is a direct bit-slice of the 2-bit-packed stream, then fold
// the 4^k histogram once per call: the window's standard forward code is
// pairrev(c2) and its reverse-complement code is ~c2 & mask, so
// canon[min(pairrev(c2), ~c2 & mask)] += hist2[c2]. Halves per-window work
// (measured 485 -> ~1200 MB/s/core at k=7 with 1% N).

// Count windows ENDING at base index e in [e_lo, e_hi) into hist2 (4^k
// uint32 bins, little-endian codes). Warms up run/T from the k-1 preceding
// bases, so any [e_lo, e_hi) partition over threads counts each window once.
void count_le_range(const uint8_t* codes, int64_t n, int k, int64_t e_lo,
                    int64_t e_hi, uint32_t* hist2) {
  const uint64_t mask = (1ULL << (2 * k)) - 1;
  const int top = 2 * (k - 1);
  uint64_t T = 0;
  int64_t run = 0;
  for (int64_t i = e_lo - k + 1 < 0 ? 0 : e_lo - k + 1; i < e_lo; ++i) {
    uint8_t b = codes[i];
    run = b < 4 ? run + 1 : 0;
    T = (T >> 2) | ((uint64_t)(b & 3) << top);
  }
  int64_t e = e_lo;
#if defined(__BMI2__)
  // 8 windows per iteration: one 8-byte load, one pext, eight slice+adds
  for (; e + 8 <= e_hi; e += 8) {
    uint64_t v;
    memcpy(&v, codes + e, 8);
    if (v & 0xFCFCFCFCFCFCFCFCULL) {
      for (int u = 0; u < 8; ++u) {
        uint8_t b = codes[e + u];
        run = b < 4 ? run + 1 : 0;
        T = (T >> 2) | ((uint64_t)(b & 3) << top);
        hist2[T] += (run >= k);
      }
      continue;
    }
    uint64_t packed = _pext_u64(v, 0x0303030303030303ULL);
    // bit buffer: [T = last k bases (window ending at e-1)] ++ 8 new bases;
    // the window ending at e+u is bits [2(u+1), 2(u+1)+2k) — fits 64 bits
    // for k <= 24 (dense counting is capped far below that)
    uint64_t buf = T | (packed << (2 * k));
    if (run >= k - 1) {
      for (int u = 0; u < 8; ++u) ++hist2[(buf >> (2 * (u + 1))) & mask];
    } else {
      int64_t r0 = run;
      for (int u = 0; u < 8; ++u)
        hist2[(buf >> (2 * (u + 1))) & mask] += (r0 + 1 + u >= k);
    }
    run += 8;
    T = (buf >> 16) & mask;
  }
#endif
  for (; e < e_hi; ++e) {
    uint8_t b = codes[e];
    run = b < 4 ? run + 1 : 0;
    T = (T >> 2) | ((uint64_t)(b & 3) << top);
    hist2[T] += (run >= k);
  }
}

// pairrev: reverse the k 2-bit groups of a 2k-bit word (byte LUT + shifts)
inline uint64_t pairrev(uint64_t c2, int k) {
  uint64_t r = 0;
  int bits = 2 * k;
  int nbytes = (bits + 7) / 8;
  for (int j = 0; j < nbytes; ++j)
    r = (r << 8) | REV8[(c2 >> (8 * j)) & 0xFF];
  // r now has the reversal of nbytes*8 bits; drop the pad
  return r >> (8 * nbytes - bits);
}

// ---- radix-partitioned counting for large k (k >= 12) ----
//
// At k >= 12 the LE histogram no longer fits caches (64 MiB per thread at
// k=12, 256 MiB at k=13): every window update is a cache miss, and the old
// code dropped to a single-threaded rolling loop at k=13. Instead: pass A
// streams windows into 256 per-thread buckets keyed by the top 8 bits of
// the LE code (sequential writes, bucket tails cache-resident); pass B
// builds each bucket's dense sub-histogram (256 KiB at k=12, 1 MiB at k=13
// — cache-resident), folds it to canonical bins, and adds into the shared
// histogram with relaxed atomics (the two LE preimages of one canonical bin
// generally live in different buckets). Both passes parallelize; the stream
// is processed in segments so buffered codes stay bounded.

// Emit LE window codes ending in [e_lo, e_hi) into bufs[code >> shift]
// (same scan structure as count_le_range; k <= 16 so codes fit uint32).
void emit_le_range(const uint8_t* codes, int64_t n, int k, int64_t e_lo,
                   int64_t e_hi, int bucket_shift,
                   std::vector<uint32_t>* bufs) {
  const uint64_t mask = (1ULL << (2 * k)) - 1;
  const int top = 2 * (k - 1);
  uint64_t T = 0;
  int64_t run = 0;
  for (int64_t i = e_lo - k + 1 < 0 ? 0 : e_lo - k + 1; i < e_lo; ++i) {
    uint8_t b = codes[i];
    run = b < 4 ? run + 1 : 0;
    T = (T >> 2) | ((uint64_t)(b & 3) << top);
  }
  int64_t e = e_lo;
#if defined(__BMI2__)
  for (; e + 8 <= e_hi; e += 8) {
    uint64_t v;
    memcpy(&v, codes + e, 8);
    if (v & 0xFCFCFCFCFCFCFCFCULL) {
      for (int u = 0; u < 8; ++u) {
        uint8_t b = codes[e + u];
        run = b < 4 ? run + 1 : 0;
        T = (T >> 2) | ((uint64_t)(b & 3) << top);
        if (run >= k) bufs[T >> bucket_shift].push_back((uint32_t)T);
      }
      continue;
    }
    uint64_t packed = _pext_u64(v, 0x0303030303030303ULL);
    uint64_t buf = T | (packed << (2 * k));
    if (run >= k - 1) {
      for (int u = 0; u < 8; ++u) {
        uint64_t c = (buf >> (2 * (u + 1))) & mask;
        bufs[c >> bucket_shift].push_back((uint32_t)c);
      }
    } else {
      int64_t r0 = run;
      for (int u = 0; u < 8; ++u) {
        uint64_t c = (buf >> (2 * (u + 1))) & mask;
        if (r0 + 1 + u >= k) bufs[c >> bucket_shift].push_back((uint32_t)c);
      }
    }
    run += 8;
    T = (buf >> 16) & mask;
  }
#endif
  for (; e < e_hi; ++e) {
    uint8_t b = codes[e];
    run = b < 4 ? run + 1 : 0;
    T = (T >> 2) | ((uint64_t)(b & 3) << top);
    if (run >= k) bufs[T >> bucket_shift].push_back((uint32_t)T);
  }
}

void count_partitioned(const uint8_t* codes, int64_t n, int k, int64_t* hist,
                       int n_threads) {
  const int kBuckets = 256;
  const int bucket_shift = 2 * k - 8;
  const int64_t sub_bins = 1LL << bucket_shift;
  const uint64_t mask = (1ULL << (2 * k)) - 1;
  // segment the stream so buffered codes stay <= ~256 MiB total
  const int64_t kSegWindows = 1LL << 26;
  std::vector<std::vector<std::vector<uint32_t>>> bufs(
      n_threads, std::vector<std::vector<uint32_t>>(kBuckets));
  for (int64_t seg_lo = k - 1; seg_lo < n; seg_lo += kSegWindows) {
    int64_t seg_hi = seg_lo + kSegWindows < n ? seg_lo + kSegWindows : n;
    {
      std::vector<std::thread> threads;
      int64_t span = seg_hi - seg_lo;
      int64_t per = (span + n_threads - 1) / n_threads;
      for (int t = 0; t < n_threads; ++t) {
        int64_t lo = seg_lo + t * per;
        int64_t hi = lo + per < seg_hi ? lo + per : seg_hi;
        if (lo >= hi) break;
        threads.emplace_back(emit_le_range, codes, n, k, lo, hi, bucket_shift,
                             bufs[t].data());
      }
      for (auto& th : threads) th.join();
    }
    std::atomic<int> next{0};
    auto worker = [&]() {
      std::vector<uint32_t> sub((size_t)sub_bins);
      const uint32_t lomask = (uint32_t)(sub_bins - 1);
      for (;;) {
        int b = next.fetch_add(1);
        if (b >= kBuckets) return;
        bool any = false;
        for (auto& tb : bufs)
          if (!tb[b].empty()) any = true;
        if (!any) continue;
        memset(sub.data(), 0, (size_t)sub_bins * sizeof(uint32_t));
        for (auto& tb : bufs)
          for (uint32_t c : tb[b]) ++sub[c & lomask];
        const uint64_t base = (uint64_t)b << bucket_shift;
        for (int64_t i = 0; i < sub_bins; ++i) {
          uint32_t v = sub[i];
          if (!v) continue;
          uint64_t c2 = base | (uint64_t)i;
          uint64_t f = pairrev(c2, k);
          uint64_t r = (~c2) & mask;
          __atomic_fetch_add(&hist[f < r ? f : r], (int64_t)v,
                             __ATOMIC_RELAXED);
        }
      }
    };
    {
      std::vector<std::thread> threads;
      for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
      worker();
      for (auto& th : threads) th.join();
    }
    if (seg_hi < n)
      for (auto& tb : bufs)
        for (auto& v : tb) v.clear();
  }
}

// Fold little-endian counts into the canonical histogram (adds into out).
void fold_canonical(const uint32_t* hist2, int k, int64_t* out) {
  const uint64_t mask = (1ULL << (2 * k)) - 1;
  const int64_t nbins = 1LL << (2 * k);
  for (int64_t c2 = 0; c2 < nbins; ++c2) {
    uint32_t v = hist2[c2];
    if (!v) continue;
    uint64_t f = pairrev((uint64_t)c2, k);
    uint64_t r = (~(uint64_t)c2) & mask;
    out[f < r ? f : r] += v;
  }
}

// Render one float/double exactly as CPython repr(float) / str(np.float32):
// shortest round-trip digits (std::to_chars scientific); fixed notation for
// exact |v| in [1e-4, 1e16), otherwise scientific with explicit sign and
// >= 2 exponent digits. The notation choice uses the EXACT value (numpy's
// dragon4 rule — e.g. float32(1e-4) = 9.9999997e-05 prints '1e-04' even
// though its shortest digits are "1"e-4); for float64 this coincides with
// CPython's digit-exponent rule on every double. Verified byte-identical
// against repr/str over millions of values across all ranges
// (tests/test_native.py).
template <typename T>
static char* py_repr(T v, char* p) {
  if (std::isnan(v)) {  // repr(float('nan')) == 'nan' (sign dropped)
    memcpy(p, "nan", 3);
    return p + 3;
  }
  if (std::isinf(v)) {
    if (v < 0) *p++ = '-';
    memcpy(p, "inf", 3);
    return p + 3;
  }
  if (v == (T)0.0) {
    if (std::signbit(v)) *p++ = '-';
    *p++ = '0';
    *p++ = '.';
    *p++ = '0';
    return p;
  }
  if (v < 0) {
    *p++ = '-';
    v = -v;
  }
  const bool fixed = (double)v >= 1e-4 && (double)v < 1e16;
  char buf[48];
  auto res = std::to_chars(buf, buf + 48, v, std::chars_format::scientific);
  char digits[32];
  int nd = 0;
  char* q = buf;
  digits[nd++] = *q++;
  if (*q == '.') {
    ++q;
    while (*q != 'e') digits[nd++] = *q++;
  }
  ++q;  // 'e'
  int esign = (*q++ == '-') ? -1 : 1;
  int E = 0;
  while (q < res.ptr) E = E * 10 + (*q++ - '0');
  E *= esign;
  if (fixed) {
    if (E >= nd - 1) {  // integral: digits, zero pad, ".0"
      memcpy(p, digits, nd);
      p += nd;
      for (int i = 0; i < E - nd + 1; ++i) *p++ = '0';
      *p++ = '.';
      *p++ = '0';
    } else if (E >= 0) {  // decimal point inside the digit string
      memcpy(p, digits, E + 1);
      p += E + 1;
      *p++ = '.';
      memcpy(p, digits + E + 1, nd - E - 1);
      p += nd - E - 1;
    } else {  // 0.0...digits
      *p++ = '0';
      *p++ = '.';
      for (int i = 0; i < -E - 1; ++i) *p++ = '0';
      memcpy(p, digits, nd);
      p += nd;
    }
  } else {  // scientific, python style
    *p++ = digits[0];
    if (nd > 1) {
      *p++ = '.';
      memcpy(p, digits + 1, nd - 1);
      p += nd - 1;
    }
    *p++ = 'e';
    *p++ = E >= 0 ? '+' : '-';
    int a = E >= 0 ? E : -E;
    char tmp[8];
    int len = 0;
    do {
      tmp[len++] = (char)('0' + a % 10);
      a /= 10;
    } while (a);
    while (len < 2) tmp[len++] = '0';
    while (len) *p++ = tmp[--len];
  }
  return p;
}

}  // namespace

extern "C" {

void kf2vec_encode(const uint8_t* in, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = LUT[in[i]];
}

// Parse a FASTA buffer: encode all sequence bytes (headers skipped) into
// `out`, writing record start offsets (within out) into `rec_offsets`
// (capacity max_records+1; the final entry is the total length). Returns the
// number of records, or -1 if max_records was exceeded.
int64_t kf2vec_parse_fasta(const uint8_t* data, int64_t n, uint8_t* out,
                           int64_t* out_len, int64_t* rec_offsets,
                           int64_t max_records) {
  int64_t o = 0;
  int64_t nrec = 0;
  int64_t i = 0;
  bool in_header = false;
  while (i < n) {
    uint8_t ch = data[i];
    // '>' INSIDE a header line is description text, not a new record
    // (matches io/fasta.py:_parse_fasta, which scans for '>' only after
    // the header's newline)
    if (ch == '>' && !in_header) {
      if (nrec >= max_records) return -1;
      rec_offsets[nrec++] = o;
      in_header = true;
    } else if (ch == '\n') {
      in_header = false;
    } else if (!in_header && ch != '\r') {
      out[o++] = LUT[ch];
    }
    ++i;
  }
  rec_offsets[nrec] = o;
  *out_len = o;
  return nrec;
}

// 2-bit pack a base-code buffer for the TPU counting path: 4 bases/byte in
// `packed` plus an invalid-base bitmask (1 bit/base, little-endian bit order,
// matching numpy packbits(bitorder="little")). n must be a multiple of 8.
// This is the host-side serial stage of the device pipeline, so it is
// multithreaded: each thread owns disjoint byte ranges of both outputs.
void kf2vec_pack2bit(const uint8_t* codes, int64_t n, uint8_t* packed,
                     uint8_t* invbits, int n_threads) {
  if (n <= 0 || (n & 7)) return;
  if (n_threads < 1) n_threads = 1;
  if (n < (1 << 16)) n_threads = 1;
  auto work = [codes, packed, invbits](int64_t lo8, int64_t hi8) {
    // process groups of 8 bases: 2 packed bytes + 1 invbits byte per group
    for (int64_t g = lo8; g < hi8; ++g) {
      const uint8_t* c = codes + g * 8;
      uint8_t p0 = 0, p1 = 0, inv = 0;
      for (int j = 0; j < 4; ++j) {
        p0 |= (uint8_t)((c[j] & 3) << (2 * j));
        p1 |= (uint8_t)((c[4 + j] & 3) << (2 * j));
      }
      for (int j = 0; j < 8; ++j) inv |= (uint8_t)((c[j] >= 4) << j);
      packed[g * 2] = p0;
      packed[g * 2 + 1] = p1;
      invbits[g] = inv;
    }
  };
  const int64_t n_groups = n / 8;
  if (n_threads == 1) {
    work(0, n_groups);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n_groups + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n_groups ? lo + per : n_groups;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Canonical window codes: out[i] = min(fwd, revcomp) code of the window
// starting at i (int64, n-k+1 entries), or `trash` if the window contains
// an invalid base. The vectorized-numpy equivalent is ~100x slower per byte.
void kf2vec_window_codes(const uint8_t* codes, int64_t n, int k,
                         int64_t trash, int64_t* out) {
  if (n < k || k < 1 || k > 31) return;
  const uint64_t mask = (2 * k < 64) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int rcs = 2 * (k - 1);
  uint64_t fwd = 0, rc = 0;
  int64_t run = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t b = codes[i];
    run = b < 4 ? run + 1 : 0;
    fwd = ((fwd << 2) | (b & 3)) & mask;
    rc = (rc >> 2) | ((uint64_t)((3 - b) & 3) << rcs);
    if (i >= k - 1)
      out[i - k + 1] = run >= k ? (int64_t)(fwd < rc ? fwd : rc) : trash;
  }
}

// Format an int64 array as the reference's .kf row tail: each value as
// "<int>.0" joined by commas, terminated by '\n'. Returns the byte length
// written. out must have room for n * 24 bytes (worst: '-' + 19 digits +
// '.0' + separator). This is the hot path of
// chunked .kf writing (repr(float) in Python is ~90% of get_chunks time).
int64_t kf2vec_format_counts(const int64_t* vals, int64_t n, char* out) {
  char* p = out;
  for (int64_t i = 0; i < n; ++i) {
    if (i) *p++ = ',';
    int64_t v = vals[i];
    // negate via uint64: -INT64_MIN is signed-overflow UB in int64
    uint64_t u;
    if (v < 0) {
      *p++ = '-';
      u = ~(uint64_t)v + 1;
    } else {
      u = (uint64_t)v;
    }
    char tmp[20];
    int len = 0;
    do {
      tmp[len++] = (char)('0' + u % 10);
      u /= 10;
    } while (u);
    while (len) *p++ = tmp[--len];
    *p++ = '.';
    *p++ = '0';
  }
  *p++ = '\n';
  return p - out;
}

// Join py_repr renderings of a float64 array with `sep`, terminated by
// '\n'. out needs n * 26 bytes. Returns bytes written.
int64_t kf2vec_format_doubles(const double* vals, int64_t n, char* out,
                              char sep) {
  char* p = out;
  for (int64_t i = 0; i < n; ++i) {
    if (i) *p++ = sep;
    p = py_repr(vals[i], p);
  }
  *p++ = '\n';
  return p - out;
}

// Same for float32 (str(np.float32) semantics). out needs n * 22 bytes.
int64_t kf2vec_format_floats(const float* vals, int64_t n, char* out,
                             char sep) {
  char* p = out;
  for (int64_t i = 0; i < n; ++i) {
    if (i) *p++ = sep;
    p = py_repr(vals[i], p);
  }
  *p++ = '\n';
  return p - out;
}

// Parse a separator-delimited (',' '\t' ' ') run of decimal floats into
// out (capacity max_vals). Returns the count, or -1 on a malformed token /
// capacity overflow. ~10x faster than Python str.split + np.array(float64):
// the .kf / .di_mtrx read path is parse-bound.
int64_t kf2vec_parse_doubles(const char* s, int64_t len, double* out,
                             int64_t max_vals) {
  const char* p = s;
  const char* end = s + len;
  int64_t n = 0;
  while (p < end) {
    while (p < end && (*p == ',' || *p == '\t' || *p == ' ' || *p == '\n' ||
                       *p == '\r'))
      ++p;
    if (p >= end) break;
    if (n >= max_vals) return -1;
    auto res = std::from_chars(p, end, out[n]);
    if (res.ec != std::errc()) return -1;
    ++n;
    p = res.ptr;
  }
  return n;
}

// Parse an entire name-prefixed numeric table (.kf: "name,v1,...\n" rows;
// .di_mtrx body: "name\tv1\t...\n"). Fills vals row-major, records
// [start,end) byte offsets of each row's name in name_spans (2 per row).
// Every row must have the same value count. Returns the row count and sets
// *cols_out; -1 on malformed input or capacity overflow.
int64_t kf2vec_parse_table(const char* s, int64_t len, double* vals,
                           int64_t max_vals, int64_t* name_spans,
                           int64_t max_rows, int64_t* cols_out) {
  const char* p = s;
  const char* end = s + len;
  int64_t rows = 0, nvals = 0, cols = -1;
  while (p < end) {
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    if (rows >= max_rows) return -1;
    const char* name_start = p;
    while (p < end && *p != ',' && *p != '\t' && *p != '\n') ++p;
    if (p >= end || *p == '\n') return -1;  // row with no values
    name_spans[2 * rows] = name_start - s;
    name_spans[2 * rows + 1] = p - s;
    int64_t row_vals = 0;
    while (p < end && *p != '\n') {
      while (p < end && (*p == ',' || *p == '\t' || *p == ' ' || *p == '\r'))
        ++p;
      if (p >= end || *p == '\n') break;
      if (nvals >= max_vals) return -1;
      auto res = std::from_chars(p, end, vals[nvals]);
      if (res.ec != std::errc()) return -1;
      ++nvals;
      ++row_vals;
      p = res.ptr;
    }
    if (cols < 0) cols = row_vals;
    if (row_vals != cols) return -1;
    ++rows;
  }
  *cols_out = cols < 0 ? 0 : cols;
  return rows;
}

// Multithreaded canonical k-mer histogram. hist has 4^k zero-initialized
// int64 entries. Fast path: per-thread uint32 little-endian histograms
// (count_le_range) merged then folded to canonical bins once; uint32 bins
// are chunk-guarded so totals never overflow. Falls back to the rolling
// canonical loop when the private histograms would not fit.
void kf2vec_count_canonical(const uint8_t* codes, int64_t n, int k,
                            int64_t* hist, int n_threads) {
  if (n < k || k < 1 || k > 31) return;
  const int64_t n_win = n - k + 1;
  const int64_t nbins = 1LL << (2 * k);
  const int64_t kMaxPrivateBytes = 64LL << 20;  // 64 MiB per thread
  if (n_threads < 1) n_threads = 1;
  if (n_win < 1 << 16) n_threads = 1;

  // k >= 12: LE histograms stop fitting caches (64 MiB at k=12 per thread);
  // use the radix-partitioned two-pass counter (multithreaded, cache-
  // resident 1 MiB sub-histograms) instead of either the per-thread LE
  // path or the old single-threaded rolling fallback
  if (k >= 12 && k <= 16 && n_win < (1LL << 31)) {
    count_partitioned(codes, n, k, hist, n_threads);
    return;
  }

  const bool le_ok = k <= 24 && nbins * (int64_t)sizeof(uint32_t) <= kMaxPrivateBytes;
  if (!le_ok) {
    if (nbins * (int64_t)sizeof(int64_t) > kMaxPrivateBytes) n_threads = 1;
    if (n_threads == 1) {
      count_range(codes, n, k, 0, n_win, hist);
      return;
    }
    std::vector<std::vector<int64_t>> priv(n_threads,
                                           std::vector<int64_t>(nbins, 0));
    std::vector<std::thread> threads;
    int64_t per = (n_win + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * per;
      int64_t hi = lo + per < n_win ? lo + per : n_win;
      if (lo >= hi) break;
      threads.emplace_back(count_range, codes, n, k, lo, hi, priv[t].data());
    }
    for (auto& th : threads) th.join();
    for (int t = 0; t < (int)priv.size(); ++t)
      for (int64_t b = 0; b < nbins; ++b) hist[b] += priv[t][b];
    return;
  }

  // windows end at e in [k-1, n); process in segments small enough that a
  // uint32 bin can never overflow (each window adds at most 1)
  const int64_t kSegWindows = 1LL << 31;
  std::vector<std::vector<uint32_t>> priv(n_threads,
                                          std::vector<uint32_t>(nbins, 0));
  for (int64_t seg_lo = k - 1; seg_lo < n; seg_lo += kSegWindows) {
    int64_t seg_hi = seg_lo + kSegWindows < n ? seg_lo + kSegWindows : n;
    if (n_threads == 1) {
      count_le_range(codes, n, k, seg_lo, seg_hi, priv[0].data());
    } else {
      std::vector<std::thread> threads;
      int64_t span = seg_hi - seg_lo;
      int64_t per = (span + n_threads - 1) / n_threads;
      for (int t = 0; t < n_threads; ++t) {
        int64_t lo = seg_lo + t * per;
        int64_t hi = lo + per < seg_hi ? lo + per : seg_hi;
        if (lo >= hi) break;
        threads.emplace_back(count_le_range, codes, n, k, lo, hi,
                             priv[t].data());
      }
      for (auto& th : threads) th.join();
    }
    for (int t = 1; t < n_threads; ++t) {
      for (int64_t b = 0; b < nbins; ++b) priv[0][b] += priv[t][b];
      if (seg_hi < n) memset(priv[t].data(), 0, nbins * sizeof(uint32_t));
    }
    fold_canonical(priv[0].data(), k, hist);
    if (seg_hi < n) memset(priv[0].data(), 0, nbins * sizeof(uint32_t));
  }
}

}  // extern "C"
