// Scalar double-precision LoglessPairHMM — the GATK-Java baseline class.
//
// A faithful port of the reference's Java fallback kernel
// (utils/pairhmm/LoglessPairHMM.java:31-105 recurrence + PairHMMModel.java:71-120
// transition probabilities) compiled as plain scalar C++ (-O3, single thread).
// Used ONLY by bench.py as the honest "GATK-Java-class single-thread" baseline
// for the TPU kernel's GCUPS multiplier: an optimized scalar C++ loop is a
// conservative (>=) stand-in for the Java implementation's throughput.
//
// Not used anywhere in the calling path.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kInitialCondition = 0x1.0p1020;  // 2^1020, LoglessPairHMM.java:24
constexpr double kTristate = 3.0;
constexpr int kMaxQual = 254;

double qual_to_error_prob(int q) { return std::pow(10.0, -q / 10.0); }

struct M2MCache {
  double p[kMaxQual + 1][kMaxQual + 1];
  M2MCache() {
    for (int i = 0; i <= kMaxQual; ++i)
      for (int j = 0; j <= kMaxQual; ++j) {
        double s = std::min(1.0, qual_to_error_prob(i) + qual_to_error_prob(j));
        p[i][j] = 1.0 - s;  // PairHMMModel.matchToMatchProb (log10-sum cached)
      }
  }
};
const M2MCache g_m2m;

inline int capq(uint8_t q) { return q > kMaxQual ? kMaxQual : q; }

}  // namespace

extern "C" {

// Compute log10 P(read|hap) for n_pairs pairs. Reads/haps are concatenated byte
// arrays with offsets; outputs one double per pair.
void pairhmm_scalar_batch(const uint8_t* read_bases, const uint8_t* rq,
                          const uint8_t* iq, const uint8_t* dq,
                          const uint8_t* gcp, const int64_t* read_off,
                          const int32_t* read_len, const uint8_t* hap_bases,
                          const int64_t* hap_off, const int32_t* hap_len,
                          const int32_t* pair_r, const int32_t* pair_h,
                          int32_t n_pairs, double* out) {
  std::vector<double> m_prev, m_cur, x_prev, x_cur, y_prev, y_cur;
  std::vector<double> tmm, tim, tmi, tii, tmd, tdd, pmatch, pmis;
  for (int32_t p = 0; p < n_pairs; ++p) {
    const int r = pair_r[p], h = pair_h[p];
    const uint8_t* rb = read_bases + read_off[r];
    const uint8_t* rqs = rq + read_off[r];
    const uint8_t* iqs = iq + read_off[r];
    const uint8_t* dqs = dq + read_off[r];
    const uint8_t* gcps = gcp + read_off[r];
    const uint8_t* hb = hap_bases + hap_off[h];
    const int R = read_len[r], H = hap_len[h];

    // per-row transition probabilities (PairHMMModel.qualToTransProbs)
    tmm.resize(R + 1); tim.resize(R + 1); tmi.resize(R + 1);
    tii.resize(R + 1); tmd.resize(R + 1); tdd.resize(R + 1);
    pmatch.resize(R + 1); pmis.resize(R + 1);
    for (int i = 1; i <= R; ++i) {
      const int qi = capq(iqs[i - 1]), qd = capq(dqs[i - 1]), qg = capq(gcps[i - 1]);
      tmm[i] = g_m2m.p[qi][qd];
      tmi[i] = qual_to_error_prob(qi);
      tmd[i] = qual_to_error_prob(qd);
      tim[i] = 1.0 - qual_to_error_prob(qg);
      tii[i] = qual_to_error_prob(qg);
      tdd[i] = tii[i];
      const double eps = qual_to_error_prob(capq(rqs[i - 1]));
      pmatch[i] = 1.0 - eps;
      pmis[i] = eps / kTristate;
    }

    m_prev.assign(H + 1, 0.0); x_prev.assign(H + 1, 0.0);
    y_prev.assign(H + 1, kInitialCondition / H);  // free start deletions :31-37
    m_cur.assign(H + 1, 0.0); x_cur.assign(H + 1, 0.0); y_cur.assign(H + 1, 0.0);

    for (int i = 1; i <= R; ++i) {
      const uint8_t rbase = rb[i - 1];
      const double t_mm = tmm[i], t_im = tim[i], t_mi = tmi[i], t_ii = tii[i],
                   t_md = tmd[i], t_dd = tdd[i], p_m = pmatch[i], p_x = pmis[i];
      m_cur[0] = 0.0; x_cur[0] = 0.0; y_cur[0] = 0.0;
      for (int j = 1; j <= H; ++j) {
        const uint8_t hbase = hb[j - 1];
        const double prior =
            (rbase == hbase || rbase == 'N' || hbase == 'N') ? p_m : p_x;
        m_cur[j] = prior * (m_prev[j - 1] * t_mm +
                            (x_prev[j - 1] + y_prev[j - 1]) * t_im);
        x_cur[j] = m_prev[j] * t_mi + x_prev[j] * t_ii;
        y_cur[j] = m_cur[j - 1] * t_md + y_cur[j - 1] * t_dd;
      }
      m_prev.swap(m_cur); x_prev.swap(x_cur); y_prev.swap(y_cur);
    }
    double final_sum = 0.0;
    for (int j = 1; j <= H; ++j) final_sum += m_prev[j] + x_prev[j];
    out[p] = std::log10(final_sum) - std::log10(kInitialCondition);
  }
}
}
