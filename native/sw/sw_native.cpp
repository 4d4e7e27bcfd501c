// Affine-gap Smith-Waterman with GATK-compatible cigars — native batch aligner.
//
// Exact port of the reference algorithm (SmithWatermanJavaAligner.java:109-380:
// sequential row scan with running vertical/horizontal gap-tracking arrays,
// strict-greater reset so ties keep the earlier/longer gap; diag >= right >=
// down tie-breaking; MATRIX_MIN_CUTOFF clamp) matching gatk_tpu/ops/
// smith_waterman.py (the golden-tested numpy path) bit for bit. Replaces the
// Intel GKL AVX aligner (utils/smithwaterman/SmithWatermanIntelAligner.java)
// in the host pipeline; OpenMP parallelism over batch items mirrors the
// reference's OMP PairHMM pattern (VectorLoglessPairHMM.java:70-77).
//
// Build: make -C native/sw   (g++ -O3 -fopenmp -shared -fPIC)

#include "sw_core.h"

extern "C" {

// Batch SW: one ref vs n_alts alt sequences (concatenated). Writes per-alt
// cigars into fixed-stride output buffers. Returns 0, or -1 if any cigar
// exceeded max_cigar elements (caller should retry with a larger bound).
int32_t sw_align_batch(const uint8_t* ref, int32_t n, const uint8_t* alts_cat,
                       const int64_t* alt_off, const int32_t* alt_len,
                       int32_t n_alts, int32_t w_match, int32_t w_mismatch,
                       int32_t w_open, int32_t w_ext, int32_t overhang,
                       uint8_t* cigar_ops_out, int32_t* cigar_lens_out,
                       int32_t* n_cigar_out, int32_t* offset_out,
                       int64_t* score_out, int32_t max_cigar, int32_t n_threads) {
  int32_t rc = 0;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic)
#endif
  for (int32_t a = 0; a < n_alts; ++a) {
    Cigar c = align_one(ref, n, alts_cat + alt_off[a], alt_len[a], w_match,
                        w_mismatch, w_open, w_ext, overhang);
    const int32_t nc = (int32_t)c.ops.size();
    if (nc > max_cigar) {
      rc = -1;
      n_cigar_out[a] = -1;
      continue;
    }
    std::memcpy(cigar_ops_out + (int64_t)a * max_cigar, c.ops.data(), nc);
    std::memcpy(cigar_lens_out + (int64_t)a * max_cigar, c.lens.data(),
                (size_t)nc * 4);
    n_cigar_out[a] = nc;
    offset_out[a] = c.offset;
    score_out[a] = c.score;
  }
  return rc;
}
}
