// Tandem-repeat length scan for the PairHMM PCR error model — native batch.
//
// Computes, for every offset of every read, the repeat length maxRL of
// ReadLikelihoodCalculationEngine.findTandemRepeatUnits (reference:
// ReadLikelihoodCalculationEngine.java:193-252), the hot loop of
// PairHMMLikelihoodCalculationEngine.applyPCRErrorModel (:283-375).
// Exact port of the golden-tested scalar python in
// gatk_tpu/calling/read_prep.py (find_tandem_repeat_length); OpenMP over
// reads mirrors the reference's OMP host parallelism
// (VectorLoglessPairHMM.java:70-77).
//
// Build: make -C native/readprep

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int MAX_STR_UNIT_LENGTH = 8;
constexpr int MAX_REPEAT_LENGTH = 20;

// #repetitions of unit (length ul) at the tail of s[0:n) (leading=false)
static inline int reps_trailing(const uint8_t* s, int n, const uint8_t* unit, int ul) {
    int count = 0;
    int end = n;
    while (end - ul >= 0 && std::memcmp(s + end - ul, unit, ul) == 0) {
        ++count;
        end -= ul;
    }
    return count;
}

// #repetitions of unit (length ul) at the head of s[0:n) (leading=true)
static inline int reps_leading(const uint8_t* s, int n, const uint8_t* unit, int ul) {
    int count = 0;
    int start = 0;
    while (start + ul <= n && std::memcmp(s + start, unit, ul) == 0) {
        ++count;
        start += ul;
    }
    return count;
}

static int repeat_length_at(const uint8_t* bases, int n, int offset) {
    // backward best unit: smallest ul whose block ending at offset repeats
    const uint8_t* best_bw_unit = bases + offset;
    int best_bw_ul = 1;
    int max_bw = 0;
    for (int ul = 1; ul <= MAX_STR_UNIT_LENGTH; ++ul) {
        if (offset + 1 - ul < 0) break;
        const uint8_t* unit = bases + offset + 1 - ul;
        max_bw = reps_trailing(bases, offset + 1, unit, ul);
        if (max_bw > 1) {
            best_bw_unit = unit;
            best_bw_ul = ul;
            break;
        }
    }
    int max_rl = max_bw;
    if (offset < n - 1) {
        const uint8_t* best_fw_unit = bases + offset + 1;
        int best_fw_ul = 1;
        int max_fw = 0;
        for (int ul = 1; ul <= MAX_STR_UNIT_LENGTH; ++ul) {
            if (offset + ul + 1 > n) break;
            const uint8_t* unit = bases + offset + 1;
            max_fw = reps_leading(bases + offset + 1, n - offset - 1, unit, ul);
            if (max_fw > 1) {
                best_fw_unit = unit;
                best_fw_ul = ul;
                break;
            }
        }
        if (best_fw_ul == best_bw_ul &&
            std::memcmp(best_fw_unit, best_bw_unit, best_fw_ul) == 0) {
            max_rl = max_bw + max_fw;
        } else {
            int max_bw2 = reps_trailing(bases, offset + 1, best_fw_unit, best_fw_ul);
            max_rl = max_fw + max_bw2;
        }
    }
    return std::min(max_rl, MAX_REPEAT_LENGTH);
}

}  // namespace

extern "C" {

// B: (n_reads, stride) row-major base matrix, rows 0-padded past lengths[i].
// out: (n_reads, stride) int32 repeat lengths; padding positions left as 0.
void tandem_repeat_lengths_batch(const uint8_t* B, int64_t n_reads, int64_t stride,
                                 const int64_t* lengths, int32_t* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 8)
#endif
    for (int64_t i = 0; i < n_reads; ++i) {
        const uint8_t* bases = B + i * stride;
        int32_t* row = out + i * stride;
        int n = static_cast<int>(lengths[i]);
        for (int j = 0; j < n; ++j) row[j] = repeat_length_at(bases, n, j);
    }
}

}  // extern "C"
