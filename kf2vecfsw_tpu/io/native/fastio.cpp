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

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

uint8_t LUT[256];

struct LutInit {
  LutInit() {
    memset(LUT, 4, sizeof(LUT));
    LUT['A'] = LUT['a'] = 0;
    LUT['C'] = LUT['c'] = 1;
    LUT['G'] = LUT['g'] = 2;
    LUT['T'] = LUT['t'] = 3;
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
    if (ch == '>') {
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

// Multithreaded canonical k-mer histogram. hist has 4^k zero-initialized
// int64 entries. Per-thread private histograms are used when 4^k is small
// enough; otherwise the range is processed single-threaded.
void kf2vec_count_canonical(const uint8_t* codes, int64_t n, int k,
                            int64_t* hist, int n_threads) {
  if (n < k || k < 1 || k > 31) return;
  const int64_t n_win = n - k + 1;
  const int64_t nbins = 1LL << (2 * k);
  const int64_t kMaxPrivateBytes = 64LL << 20;  // 64 MiB per thread
  if (n_threads < 1) n_threads = 1;
  if (n_win < 1 << 16) n_threads = 1;
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
}

}  // extern "C"
