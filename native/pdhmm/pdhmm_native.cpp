// Batched partially-determined PairHMM (DRAGEN-GATK PDHMM) host kernel.
//
// Exact double-precision port of the recurrence in
// utils/pairhmm/LoglessPDPairHMM.java:34-153 (NORMAL/INSIDE_DEL/AFTER_DEL column
// state machine with branch matrices for undetermined-deletion jump states) and
// the PD-aware priors (:177-214). Batched over (haplotype, read) pairs with
// OpenMP — the host-side equivalent of the GKL pdhmm AVX library that GATK's
// PDPairHMM.AVX_LOGLESS_CACHING mode binds.
//
// Loaded via ctypes from gatk_tpu/ops/pdhmm.py. Build: make -C native/pdhmm
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double INITIAL_CONDITION = 9.332636185032189e+307; // 2^1020
constexpr double TRISTATE_CORRECTION = 3.0;
constexpr uint8_t PD_SNP = 1, PD_DEL_START = 2, PD_DEL_END = 4;

enum State { NORMAL = 0, INSIDE_DEL = 1, AFTER_DEL = 2 };

// qualToProb / qualToErrorProb tables (QualityUtils.java)
struct QualTables {
  double prob[256];
  double err[256];
  QualTables() {
    for (int q = 0; q < 256; q++) {
      err[q] = std::pow(10.0, -q / 10.0);
      prob[q] = 1.0 - err[q];
    }
  }
};
const QualTables QT;

// PairHMMModel.qualToTransProbs: [mm, im, mi, ii, md, dd] per read base
inline void trans_probs(uint8_t iq, uint8_t dq, uint8_t gcp, double* t) {
  // matchToMatch = 1 - 10^(log10sum(-i/10, -d/10)) computed in linear space
  double pi = QT.err[iq], pd = QT.err[dq], pg = QT.err[gcp];
  double mm = 1.0 - (pi + pd);
  if (mm < 0.0) mm = 0.0;  // matchToMatchProb caps at 0 (QualityUtils semantics)
  t[0] = mm;               // matchToMatch
  t[1] = 1.0 - pg;         // indelToMatch
  t[2] = pi;               // matchToInsertion
  t[3] = pg;               // insertionToInsertion
  t[4] = pd;               // matchToDeletion
  t[5] = pg;               // deletionToDeletion
}

inline bool pd_base_matches(uint8_t x, uint8_t pdb) {
  if (!(pdb & PD_SNP)) return false;
  switch (x) {
    case 'A': case 'a': return pdb & 8;
    case 'C': case 'c': return pdb & 16;
    case 'T': case 't': return pdb & 64;
    case 'G': case 'g': return pdb & 32;
    default: return false;
  }
}

}  // namespace

extern "C" {

// One likelihood per pair. All sequence arrays are concatenated with offsets.
//   hap_bases/hap_pd:   concatenated haplotype bases / pd bytes (hap_off/hap_len)
//   read_*:             concatenated read bases + 4 qual tracks (read_off/read_len)
//   pair_hap/pair_read: per-pair indices into the two tables
// out: log10 likelihood per pair.
int pdhmm_compute_batch(
    const uint8_t* hap_bases, const uint8_t* hap_pd,
    const int64_t* hap_off, const int32_t* hap_len, int32_t n_haps,
    const uint8_t* read_bases, const uint8_t* read_quals,
    const uint8_t* read_iq, const uint8_t* read_dq, const uint8_t* read_gcp,
    const int64_t* read_off, const int32_t* read_len, int32_t n_reads,
    const int32_t* pair_hap, const int32_t* pair_read, int64_t n_pairs,
    double* out, int32_t n_threads) {
  (void)n_haps; (void)n_reads;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel
#endif
  {
    std::vector<double> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
    for (int64_t p = 0; p < n_pairs; p++) {
      const int32_t h = pair_hap[p], r = pair_read[p];
      const uint8_t* hb = hap_bases + hap_off[h];
      const uint8_t* pdb = hap_pd + hap_off[h];
      const int H = hap_len[h];
      const uint8_t* rb = read_bases + read_off[r];
      const uint8_t* rq = read_quals + read_off[r];
      const uint8_t* riq = read_iq + read_off[r];
      const uint8_t* rdq = read_dq + read_off[r];
      const uint8_t* rgcp = read_gcp + read_off[r];
      const int R = read_len[r];

      // 6 row-pairs of padded length H+1 (prev/cur), stored in one buffer:
      // [Mp, Ip, Dp, bMp, bIp, bDp, Mc, Ic, Dc, bMc, bIc, bDc]
      const int W = H + 1;
      buf.assign(12 * (size_t)W, 0.0);
      double* Mp = buf.data();
      double* Ip = Mp + W;
      double* Dp = Ip + W;
      double* bMp = Dp + W;
      double* bIp = bMp + W;
      double* bDp = bIp + W;
      double* Mc = bDp + W;
      double* Ic = Mc + W;
      double* Dc = Ic + W;
      double* bMc = Dc + W;
      double* bIc = bMc + W;
      double* bDc = bIc + W;

      const double init = INITIAL_CONDITION / H;
      for (int j = 0; j < W; j++) Dp[j] = init;

      // state persists across row boundaries, faithful to the Java loop
      // (LoglessPDPairHMM.java:62: declared outside the i loop)
      State state = NORMAL;
      double t[6];
      for (int i = 1; i <= R; i++) {
        trans_probs(riq[i - 1], rdq[i - 1], rgcp[i - 1], t);
        const uint8_t x = rb[i - 1];
        const double qp = QT.prob[rq[i - 1]];
        const double qe = QT.err[rq[i - 1]] / TRISTATE_CORRECTION;
        Mc[0] = Ic[0] = Dc[0] = bMc[0] = bIc[0] = bDc[0] = 0.0;
        for (int j = 1; j <= H; j++) {
          const uint8_t y = hb[j - 1];
          const uint8_t pj = pdb[j - 1];
          const double prior =
              (x == y || x == 'N' || y == 'N' || pd_base_matches(x, pj)) ? qp : qe;
          const bool del_end = (pj & PD_DEL_END) != 0;
          switch (state) {
            case NORMAL:
              bMc[j] = Mc[j - 1];
              bDc[j] = Dc[j - 1];
              bIc[j] = Ic[j - 1];
              Mc[j] = prior * (Mp[j - 1] * t[0] + (Ip[j - 1] + Dp[j - 1]) * t[1]);
              Dc[j] = Mc[j - 1] * t[4] + Dc[j - 1] * t[5];
              break;
            case INSIDE_DEL:
              bMc[j] = bMc[j - 1];
              bDc[j] = bDc[j - 1];
              bIc[j] = bIc[j - 1];
              Mc[j] = prior * (Mp[j - 1] * t[0] + (Ip[j - 1] + Dp[j - 1]) * t[1]);
              Dc[j] = Mc[j - 1] * t[4] + Dc[j - 1] * t[5];
              break;
            case AFTER_DEL: {
              bMc[j] = std::max(bMc[j - 1], Mc[j - 1]);
              bDc[j] = std::max(bDc[j - 1], Dc[j - 1]);
              bIc[j] = std::max(bIc[j - 1], Ic[j - 1]);
              Mc[j] = prior * (std::max(bMp[j - 1], Mp[j - 1]) * t[0] +
                               (std::max(bIp[j - 1], Ip[j - 1]) +
                                std::max(bDp[j - 1], Dp[j - 1])) * t[1]);
              Dc[j] = std::max(bMc[j - 1], Mc[j - 1]) * t[4] +
                      std::max(bDc[j - 1], Dc[j - 1]) * t[5];
              state = NORMAL;
              break;
            }
          }
          if (del_end) {
            Ic[j] = std::max(bMp[j], Mp[j]) * t[2] + std::max(bIp[j], Ip[j]) * t[3];
          } else {
            Ic[j] = Mp[j] * t[2] + Ip[j] * t[3];
          }
          if (pj & PD_DEL_START) state = INSIDE_DEL;
          if (del_end) state = AFTER_DEL;  // overrides (single-base deletions)
        }
        std::swap(Mp, Mc);
        std::swap(Ip, Ic);
        std::swap(Dp, Dc);
        std::swap(bMp, bMc);
        std::swap(bIp, bIc);
        std::swap(bDp, bDc);
      }
      double s = 0.0;
      for (int j = 1; j <= H; j++) s += Mp[j] + Ip[j];
      out[p] = std::log10(s) - std::log10(INITIAL_CONDITION);
    }
  }
  return 0;
}
}
