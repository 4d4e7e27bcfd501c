// FM-index over a concatenated reference (BWT + occurrence checkpoints +
// sampled suffix array), replacing the hash-seed lookup with true
// bwa-mem-class exact-seed search.
//
// Reference behavior: utils/bwa/BwaMemIndex.java binds the bwa FM-index
// (.img) via JNI; here the index is built natively: suffix array by
// prefix-doubling (O(n log^2 n)), BWT via SA, rank checkpoints every 128
// symbols, SA samples every 32. Queries: classic backward search returning
// the SA interval, plus super-maximal-exact-match (SMEM-lite) enumeration by
// greedy backward extension, and locate() through LF-walks to the nearest SA
// sample.
//
// Build: make -C native/fmindex  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

// alphabet: $=0 A=1 C=2 G=3 T=4 N=5
constexpr int SIGMA = 6;
constexpr int OCC_RATE = 128;
constexpr int SA_RATE = 32;

inline uint8_t code_of(uint8_t b) {
  switch (b) {
    case 'A': case 'a': return 1;
    case 'C': case 'c': return 2;
    case 'G': case 'g': return 3;
    case 'T': case 't': return 4;
    default: return 5;
  }
}

struct FMIndex {
  int64_t n = 0;                  // text length incl. sentinel
  std::vector<uint8_t> bwt;       // BWT symbols (codes)
  int64_t C[SIGMA + 1] = {0};     // cumulative counts
  std::vector<int64_t> occ;       // (n/OCC_RATE+1) x SIGMA checkpoints
  std::vector<int64_t> sa_samp;   // sampled SA values
  std::vector<uint8_t> sa_is_samp;  // bitmask per position (i % SA_RATE == 0 of SA rank walk) -- we sample by SA index
};

// prefix-doubling suffix array (Manber-Myers with radix-ish std::sort)
void build_sa(const std::vector<uint8_t>& t, std::vector<int64_t>& sa) {
  const int64_t n = (int64_t)t.size();
  sa.resize(n);
  std::vector<int64_t> rank(n), tmp(n);
  for (int64_t i = 0; i < n; ++i) {
    sa[i] = i;
    rank[i] = t[i];
  }
  for (int64_t k = 1;; k <<= 1) {
    auto cmp = [&](int64_t a, int64_t b) {
      if (rank[a] != rank[b]) return rank[a] < rank[b];
      const int64_t ra = a + k < n ? rank[a + k] : -1;
      const int64_t rb = b + k < n ? rank[b + k] : -1;
      return ra < rb;
    };
    std::sort(sa.begin(), sa.end(), cmp);
    tmp[sa[0]] = 0;
    for (int64_t i = 1; i < n; ++i)
      tmp[sa[i]] = tmp[sa[i - 1]] + (cmp(sa[i - 1], sa[i]) ? 1 : 0);
    rank = tmp;
    if (rank[sa[n - 1]] == n - 1) break;
  }
}

FMIndex* build_index(const uint8_t* text, int64_t len) {
  auto* fm = new FMIndex();
  std::vector<uint8_t> t(len + 1);
  for (int64_t i = 0; i < len; ++i) t[i] = code_of(text[i]);
  t[len] = 0;  // sentinel
  fm->n = len + 1;
  std::vector<int64_t> sa;
  build_sa(t, sa);
  fm->bwt.resize(fm->n);
  for (int64_t i = 0; i < fm->n; ++i)
    fm->bwt[i] = sa[i] == 0 ? t[fm->n - 1] : t[sa[i] - 1];
  // C array
  int64_t cnt[SIGMA] = {0};
  for (int64_t i = 0; i < fm->n; ++i) cnt[t[i]]++;
  fm->C[0] = 0;
  for (int s = 0; s < SIGMA; ++s) fm->C[s + 1] = fm->C[s] + cnt[s];
  // occ checkpoints
  const int64_t n_cp = fm->n / OCC_RATE + 1;
  fm->occ.assign(n_cp * SIGMA, 0);
  int64_t run[SIGMA] = {0};
  for (int64_t i = 0; i < fm->n; ++i) {
    if (i % OCC_RATE == 0)
      for (int s = 0; s < SIGMA; ++s) fm->occ[(i / OCC_RATE) * SIGMA + s] = run[s];
    run[fm->bwt[i]]++;
  }
  // SA samples: store SA[i] for i % SA_RATE == 0
  fm->sa_samp.resize((fm->n + SA_RATE - 1) / SA_RATE);
  for (int64_t i = 0; i < fm->n; i += SA_RATE) fm->sa_samp[i / SA_RATE] = sa[i];
  return fm;
}

inline int64_t occ_at(const FMIndex* fm, int sym, int64_t i) {
  // occurrences of sym in bwt[0, i)
  const int64_t cp = i / OCC_RATE;
  int64_t o = fm->occ[cp * SIGMA + sym];
  for (int64_t j = cp * OCC_RATE; j < i; ++j) o += fm->bwt[j] == sym;
  return o;
}

// backward search: [lo, hi) SA interval of pattern (codes), or empty
void bw_search(const FMIndex* fm, const uint8_t* pat, int64_t m, int64_t* lo_out,
               int64_t* hi_out) {
  int64_t lo = 0, hi = fm->n;
  for (int64_t i = m - 1; i >= 0 && lo < hi; --i) {
    const int sym = code_of(pat[i]);
    if (sym == 5) { lo = hi = 0; break; }  // N never matches
    lo = fm->C[sym] + occ_at(fm, sym, lo);
    hi = fm->C[sym] + occ_at(fm, sym, hi);
  }
  *lo_out = lo;
  *hi_out = hi;
}

int64_t locate_one(const FMIndex* fm, int64_t r) {
  int64_t steps = 0;
  while (r % SA_RATE != 0) {
    const int sym = fm->bwt[r];
    if (sym == 0) return steps;  // hit the sentinel row: SA[r] = 0 offset steps
    r = fm->C[sym] + occ_at(fm, sym, r);
    ++steps;
  }
  return fm->sa_samp[r / SA_RATE] + steps;
}

}  // namespace

extern "C" {

void* fm_build(const uint8_t* text, int64_t len) { return build_index(text, len); }

void fm_free(void* h) { delete (FMIndex*)h; }

// exact pattern -> SA interval size and up to max_hits positions
int64_t fm_search(void* h, const uint8_t* pat, int64_t m, int64_t* positions,
                  int64_t max_hits) {
  auto* fm = (FMIndex*)h;
  int64_t lo, hi;
  bw_search(fm, pat, m, &lo, &hi);
  const int64_t nhits = hi - lo;
  const int64_t take = nhits < max_hits ? nhits : max_hits;
  for (int64_t i = 0; i < take; ++i) positions[i] = locate_one(fm, lo + i);
  return nhits;
}

// SMEM-lite seeds: for each query start chunk, the longest exact match
// extending left from each end position; emits (q_start, q_len, n_hits,
// first positions) tuples. Greedy non-overlapping from the right.
int64_t fm_seeds(void* h, const uint8_t* q, int64_t m, int64_t min_len,
                 int64_t max_hits_per_seed, int64_t* out, int64_t out_cap) {
  auto* fm = (FMIndex*)h;
  int64_t n_seeds = 0;
  int64_t end = m;
  while (end >= min_len) {
    // extend backward from `end` as far as possible
    int64_t lo = 0, hi = fm->n, last_lo = 0, last_hi = 0, len = 0;
    int64_t i = end - 1;
    for (; i >= 0; --i) {
      const int sym = code_of(q[i]);
      int64_t nlo, nhi;
      if (sym == 5) break;
      nlo = fm->C[sym] + occ_at(fm, sym, lo);
      nhi = fm->C[sym] + occ_at(fm, sym, hi);
      if (nlo >= nhi) break;
      lo = nlo;
      hi = nhi;
      last_lo = lo;
      last_hi = hi;
      ++len;
    }
    if (len >= min_len) {
      const int64_t q_start = end - len;
      const int64_t nhits = last_hi - last_lo;
      const int64_t take = nhits < max_hits_per_seed ? nhits : max_hits_per_seed;
      if (n_seeds * (3 + max_hits_per_seed) + 3 + take > out_cap) break;
      int64_t* rec = out + n_seeds * (3 + max_hits_per_seed);
      rec[0] = q_start;
      rec[1] = len;
      rec[2] = take;
      for (int64_t k2 = 0; k2 < take; ++k2)
        rec[3 + k2] = locate_one(fm, last_lo + k2);
      ++n_seeds;
      end = q_start + len / 2;  // half-overlap stepping keeps seed coverage
    } else {
      end -= (min_len / 2 > 1 ? min_len / 2 : 1);
    }
  }
  return n_seeds;
}

// serialize / load (the .img-equivalent): simple binary blob
int64_t fm_save_size(void* h) {
  auto* fm = (FMIndex*)h;
  return (int64_t)(sizeof(int64_t) * (2 + SIGMA + 1) + fm->bwt.size() +
                   fm->occ.size() * 8 + fm->sa_samp.size() * 8);
}

void fm_save(void* h, uint8_t* buf) {
  auto* fm = (FMIndex*)h;
  uint8_t* p = buf;
  auto w64 = [&](int64_t v) { std::memcpy(p, &v, 8); p += 8; };
  w64(fm->n);
  w64((int64_t)fm->occ.size());
  for (int s = 0; s <= SIGMA; ++s) w64(fm->C[s]);
  std::memcpy(p, fm->bwt.data(), fm->bwt.size());
  p += fm->bwt.size();
  std::memcpy(p, fm->occ.data(), fm->occ.size() * 8);
  p += fm->occ.size() * 8;
  std::memcpy(p, fm->sa_samp.data(), fm->sa_samp.size() * 8);
}

void* fm_load(const uint8_t* buf, int64_t len) {
  auto* fm = new FMIndex();
  const uint8_t* p = buf;
  auto r64 = [&]() { int64_t v; std::memcpy(&v, p, 8); p += 8; return v; };
  fm->n = r64();
  const int64_t occ_sz = r64();
  for (int s = 0; s <= SIGMA; ++s) fm->C[s] = r64();
  fm->bwt.resize(fm->n);
  std::memcpy(fm->bwt.data(), p, fm->n);
  p += fm->n;
  fm->occ.resize(occ_sz);
  std::memcpy(fm->occ.data(), p, occ_sz * 8);
  p += occ_sz * 8;
  fm->sa_samp.resize((fm->n + SA_RATE - 1) / SA_RATE);
  std::memcpy(fm->sa_samp.data(), p, fm->sa_samp.size() * 8);
  (void)len;
  return fm;
}
}
