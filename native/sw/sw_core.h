// Shared affine-gap Smith-Waterman core (see sw_native.cpp header comment
// for provenance: exact port of SmithWatermanJavaAligner.java:109-380 matching
// gatk_tpu/ops/smith_waterman.py bit for bit). Included by sw_native.cpp and
// native/rtgraph/rtgraph_native.cpp (dangling-end recovery alignment).
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int64_t MATRIX_MIN_CUTOFF = -100000000LL;  // (int) -1.0e8
constexpr int64_t LOW_INIT = -(1LL << 30);           // -(2**31)//2

enum Overhang { SOFTCLIP = 0, INDEL = 1, LEADING_INDEL = 2, IGNORE_OH = 3 };
enum Op { OP_M = 0, OP_I = 1, OP_D = 2, OP_S = 4 };  // matches io/sam.py codes

struct Cigar {
  std::vector<uint8_t> ops;
  std::vector<int32_t> lens;
  int32_t offset = 0;
  int64_t score = 0;
};

template <typename BT>
inline Cigar backtrack_cigar(const BT* btrack, int64_t si, int64_t sj,
                             int32_t n, int32_t m, const int64_t* lastRow,
                             const int64_t* lastCol, int32_t overhang);

// one (ref x alt) alignment: fills btrack, returns cigar via backtrack
Cigar align_one(const uint8_t* ref, int32_t n, const uint8_t* alt, int32_t m,
                int32_t w_match, int32_t w_mismatch, int32_t w_open, int32_t w_ext,
                int32_t overhang) {
  const int64_t mp1 = m + 1;
  std::vector<int64_t> Hprev(mp1, 0), Hcur(mp1, 0);
  std::vector<int64_t> lastRow(mp1, 0);       // H[n][0..m]
  std::vector<int64_t> lastCol(n + 1, 0);     // H[0..n][m]
  std::vector<int32_t> btrack((int64_t)(n + 1) * mp1, 0);
  std::vector<int64_t> best_v(mp1, LOW_INIT);
  std::vector<int64_t> size_v(mp1, 0);

  if (overhang == INDEL || overhang == LEADING_INDEL) {
    for (int32_t j = 1; j <= m; ++j) Hprev[j] = w_open + (int64_t)(j - 1) * w_ext;
  }
  lastCol[0] = Hprev[m];

  for (int32_t i = 1; i <= n; ++i) {
    Hcur[0] = 0;
    if (overhang == INDEL || overhang == LEADING_INDEL)
      Hcur[0] = w_open + (int64_t)(i - 1) * w_ext;

    int64_t best_h = LOW_INIT, size_h = 0;
    const uint8_t ri = ref[i - 1];
    int32_t* bt = &btrack[(int64_t)i * mp1];

    for (int32_t j = 1; j <= m; ++j) {
      // vertical (down) gap: deletion w.r.t. alt (consumes ref)
      const int64_t prev_gap_v = Hprev[j] + w_open;
      best_v[j] += w_ext;
      if (prev_gap_v > best_v[j]) {  // strict: ties keep the longer gap
        best_v[j] = prev_gap_v;
        size_v[j] = 1;
      } else {
        ++size_v[j];
      }
      // horizontal (right) gap: insertion w.r.t. alt (consumes alt)
      const int64_t prev_gap_h = Hcur[j - 1] + w_open;
      best_h += w_ext;
      if (prev_gap_h > best_h) {
        best_h = prev_gap_h;
        size_h = 1;
      } else {
        ++size_h;
      }

      const int64_t step_diag =
          Hprev[j - 1] + (alt[j - 1] == ri ? w_match : w_mismatch);
      const int64_t step_down = best_v[j];
      const int64_t step_right = best_h;

      int64_t v;
      if (step_diag >= step_down && step_diag >= step_right) {
        v = step_diag;
        bt[j] = 0;
      } else if (step_right >= step_down) {
        v = step_right;
        bt[j] = (int32_t)-size_h;
      } else {
        v = step_down;
        bt[j] = (int32_t)size_v[j];
      }
      Hcur[j] = v < MATRIX_MIN_CUTOFF ? MATRIX_MIN_CUTOFF : v;
    }
    lastCol[i] = Hcur[m];
    std::swap(Hprev, Hcur);
  }
  // Hprev now holds row n
  for (int32_t j = 0; j <= m; ++j) lastRow[j] = Hprev[j];

  return backtrack_cigar(btrack.data(), mp1, 1, n, m, lastRow.data(),
                         lastCol.data(), overhang);
}

// --- cigar backtrack (smith_waterman.py _calculate_cigar port), shared by
// the scalar and 8-lane bundle kernels. bt(i,j) = btrack[i*si + j*sj].
template <typename BT>
inline Cigar backtrack_cigar(const BT* btrack, int64_t si, int64_t sj,
                             int32_t n, int32_t m, const int64_t* lastRow,
                             const int64_t* lastCol, int32_t overhang) {
  Cigar out;
  int32_t p1, p2;
  int64_t maxscore;
  int64_t segment_length = 0;
  if (overhang == INDEL) {
    p1 = n;
    p2 = m;
    maxscore = lastRow[m];
  } else {
    // best score in rightmost column; >= keeps the LAST (closest to diagonal)
    maxscore = lastCol[1];
    p1 = 1;
    for (int32_t i = 2; i <= n; ++i)
      if (lastCol[i] >= maxscore) {
        maxscore = lastCol[i];
        p1 = i;
      }
    p2 = m;
    if (overhang != LEADING_INDEL) {
      for (int32_t j = 1; j <= m; ++j) {
        const int64_t cur = lastRow[j];
        const int32_t d1 = n - j >= 0 ? n - j : j - n;
        const int32_t d2 = p1 - p2 >= 0 ? p1 - p2 : p2 - p1;
        if (cur > maxscore || (cur == maxscore && d1 < d2)) {
          p1 = n;
          p2 = j;
          maxscore = cur;
          segment_length = m - j;
        }
      }
    }
  }

  std::vector<uint8_t> ops;
  std::vector<int32_t> lens;
  if (segment_length > 0 && overhang == SOFTCLIP) {
    ops.push_back(OP_S);
    lens.push_back((int32_t)segment_length);
    segment_length = 0;
  }
  int32_t state = OP_M;
  while (true) {
    const int32_t btr = (int32_t)btrack[p1 * si + p2 * sj];
    int32_t new_state, step;
    if (btr > 0) {
      new_state = OP_D;
      step = btr;
      p1 -= btr;
    } else if (btr < 0) {
      new_state = OP_I;
      step = -btr;
      p2 += btr;
    } else {
      new_state = OP_M;
      step = 1;
      --p1;
      --p2;
    }
    if (new_state == state) {
      segment_length += step;
    } else {
      if (segment_length > 0) {
        ops.push_back((uint8_t)state);
        lens.push_back((int32_t)segment_length);
      }
      segment_length = step;
      state = new_state;
    }
    if (!(p1 > 0 && p2 > 0)) break;
  }

  if (overhang == SOFTCLIP) {
    ops.push_back((uint8_t)state);
    lens.push_back((int32_t)segment_length);
    if (p2 > 0) {
      ops.push_back(OP_S);
      lens.push_back(p2);
    }
    out.offset = p1;
  } else if (overhang == IGNORE_OH) {
    ops.push_back((uint8_t)state);
    lens.push_back((int32_t)(segment_length + p2));
    out.offset = p1 - p2;
  } else {  // INDEL / LEADING_INDEL
    ops.push_back((uint8_t)state);
    lens.push_back((int32_t)segment_length);
    if (p1 > 0) {
      ops.push_back(OP_D);
      lens.push_back(p1);
    } else if (p2 > 0) {
      ops.push_back(OP_I);
      lens.push_back(p2);
    }
    out.offset = 0;
  }
  // reverse
  out.ops.assign(ops.rbegin(), ops.rend());
  out.lens.assign(lens.rbegin(), lens.rend());
  out.score = maxscore;
  return out;
}

// --- 8-lane inter-task SIMD bundle -----------------------------------------
// Runs 8 independent alignments in lockstep over the same (i, j) sweep: the
// lane loop has no cross-lane dependencies, so g++ auto-vectorizes every cell
// update to AVX2 while keeping bit-exact scalar tie-break semantics per lane
// (the j-loop's horizontal-gap dependency is across j, never across lanes).
// Lanes with m_real[l] < m pad with 0-bytes (never equal to a real base);
// cells at j <= m_real[l] are then identical to a scalar run of that alt.
constexpr int32_t SWL = 8;

inline void align_bundle8(const uint8_t* ref, int32_t n,
                          const uint8_t* const* alts, const int32_t* m_real,
                          int32_t n_lanes, int32_t w_match, int32_t w_mismatch,
                          int32_t w_open, int32_t w_ext, int32_t overhang,
                          Cigar* out) {
  int32_t m = 0;
  for (int32_t l = 0; l < n_lanes; ++l) m = m_real[l] > m ? m_real[l] : m;
  const int64_t mp1 = m + 1;
  // interleaved padded alt matrix, widened to int32 so the lane loop maps to
  // full 8x32-bit AVX2 vectors: altm[(j-1)*SWL + l]
  std::vector<int32_t> altm((size_t)m * SWL, 0);
  for (int32_t l = 0; l < n_lanes; ++l)
    for (int32_t j = 0; j < m_real[l]; ++j) altm[(size_t)j * SWL + l] = alts[l][j];

  const bool ramp = overhang == INDEL || overhang == LEADING_INDEL;
  std::vector<int32_t> Hprev(mp1 * SWL, 0), Hcur(mp1 * SWL, 0);
  std::vector<int32_t> best_v(mp1 * SWL, (int32_t)LOW_INIT), size_v(mp1 * SWL, 0);
  std::vector<int32_t> btrack((size_t)(n + 1) * mp1 * SWL, 0);
  std::vector<int32_t> lastCol8((size_t)(n + 1) * SWL, 0);
  if (ramp)
    for (int32_t j = 1; j <= m; ++j)
      for (int32_t l = 0; l < SWL; ++l)
        Hprev[(size_t)j * SWL + l] = w_open + (j - 1) * w_ext;
  for (int32_t l = 0; l < n_lanes; ++l)
    lastCol8[l] = Hprev[(size_t)m_real[l] * SWL + l];

  const int32_t cutoff = (int32_t)MATRIX_MIN_CUTOFF;
  for (int32_t i = 1; i <= n; ++i) {
    const int32_t h0 = ramp ? w_open + (i - 1) * w_ext : 0;
    int32_t best_h[SWL], size_h[SWL];
    for (int32_t l = 0; l < SWL; ++l) {
      Hcur[l] = h0;
      best_h[l] = (int32_t)LOW_INIT;
      size_h[l] = 0;
    }
    const int32_t ri = ref[i - 1];
    int32_t* bt = &btrack[(size_t)i * mp1 * SWL];
    for (int32_t j = 1; j <= m; ++j) {
      const int32_t* __restrict__ hp = &Hprev[(size_t)j * SWL];
      const int32_t* __restrict__ hpm = hp - SWL;
      int32_t* __restrict__ hc = &Hcur[(size_t)j * SWL];
      const int32_t* __restrict__ hcm = hc - SWL;
      int32_t* __restrict__ bv = &best_v[(size_t)j * SWL];
      int32_t* __restrict__ sv = &size_v[(size_t)j * SWL];
      const int32_t* __restrict__ ab = &altm[(size_t)(j - 1) * SWL];
      int32_t* __restrict__ btj = bt + (size_t)j * SWL;
#ifdef _OPENMP
#pragma omp simd
#endif
      for (int32_t l = 0; l < SWL; ++l) {
        const int32_t prev_gap_v = hp[l] + w_open;
        int32_t bvl = bv[l] + w_ext;
        int32_t svl = sv[l];
        const bool cv = prev_gap_v > bvl;  // strict: ties keep the longer gap
        bvl = cv ? prev_gap_v : bvl;
        svl = cv ? 1 : svl + 1;
        bv[l] = bvl;
        sv[l] = svl;
        const int32_t prev_gap_h = hcm[l] + w_open;
        int32_t bhl = best_h[l] + w_ext;
        int32_t shl = size_h[l];
        const bool ch = prev_gap_h > bhl;
        bhl = ch ? prev_gap_h : bhl;
        shl = ch ? 1 : shl + 1;
        best_h[l] = bhl;
        size_h[l] = shl;
        const int32_t step_diag = hpm[l] + (ab[l] == ri ? w_match : w_mismatch);
        // diag >= right >= down tie-breaking
        const bool take_diag = step_diag >= bvl && step_diag >= bhl;
        const bool take_right = bhl >= bvl;
        int32_t v = take_diag ? step_diag : (take_right ? bhl : bvl);
        btj[l] = take_diag ? 0 : (take_right ? -shl : svl);
        hc[l] = v < cutoff ? cutoff : v;
      }
    }
    for (int32_t l = 0; l < n_lanes; ++l)
      lastCol8[(size_t)i * SWL + l] = Hcur[(size_t)m_real[l] * SWL + l];
    std::swap(Hprev, Hcur);
  }

  for (int32_t l = 0; l < n_lanes; ++l) {
    std::vector<int64_t> lastRow(m_real[l] + 1), lastCol(n + 1);
    for (int32_t j = 0; j <= m_real[l]; ++j)
      lastRow[j] = Hprev[(size_t)j * SWL + l];
    for (int32_t i = 0; i <= n; ++i) lastCol[i] = lastCol8[(size_t)i * SWL + l];
    out[l] = backtrack_cigar(&btrack[l], mp1 * SWL, SWL, n, m_real[l],
                             lastRow.data(), lastCol.data(), overhang);
  }
}

}  // namespace
