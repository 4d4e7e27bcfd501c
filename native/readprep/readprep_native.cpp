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


extern "C" {

// Pileup element expansion (gatk_tpu/engine/pileup.py expand_read +
// build_pileup_elements, exact port): expands every read's alignment into
// per-reference-position elements (M/=/X bases and D positions) restricted to
// [span_start, span_end), with the PileupElement adjacency flags
// (utils/pileup/PileupElement.java). Inputs are concatenated per-read arrays;
// outputs are caller-allocated with capacity >= total aligned length.
// Returns the number of elements written, or -1 if capacity was exceeded.
int64_t pileup_expand(const uint8_t* cat_bases, const uint8_t* cat_quals,
                      const int64_t* read_off, const uint8_t* cat_cig_ops,
                      const int32_t* cat_cig_lens, const int64_t* cig_off,
                      const int64_t* read_pos, int64_t n_reads,
                      int64_t span_start, int64_t span_end, int64_t cap,
                      int64_t* out_pos, uint8_t* out_base, uint8_t* out_qual,
                      uint8_t* out_flags, int32_t* out_read_idx) {
  // flag bits (engine/pileup.py)
  constexpr uint8_t F_DELETION = 1, F_BEFORE_DELETION = 2, F_AFTER_DELETION = 4,
                    F_BEFORE_INSERTION = 8, F_AFTER_INSERTION = 16,
                    F_NEXT_TO_SOFTCLIP = 32;
  constexpr uint8_t DELETION_BASE = '-';
  // cigar ops: M=0 I=1 D=2 N=3 S=4 H=5 P=6 ==7 X=8
  int64_t out = 0;
  for (int64_t ri = 0; ri < n_reads; ri++) {
    const uint8_t* bases = cat_bases + read_off[ri];
    const uint8_t* quals = cat_quals + read_off[ri];
    const uint8_t* ops = cat_cig_ops + cig_off[ri];
    const int32_t* lens = cat_cig_lens + cig_off[ri];
    const int64_t ncig = cig_off[ri + 1] - cig_off[ri];
    int64_t read_i = 0;
    int64_t ref_i = read_pos[ri];
    for (int64_t k = 0; k < ncig; k++) {
      const int op = ops[k];
      const int64_t ln = lens[k];
      if (op == 0 || op == 7 || op == 8) {  // M/=/X
        const int prev_op = k > 0 ? ops[k - 1] : -1;
        const int next_op = k < ncig - 1 ? ops[k + 1] : -1;
        uint8_t first_fl = 0, last_fl = 0;
        if (prev_op == 2) first_fl |= F_AFTER_DELETION;
        if (prev_op == 1) first_fl |= F_AFTER_INSERTION;
        if (prev_op == 4) first_fl |= F_NEXT_TO_SOFTCLIP;
        if (next_op == 2) last_fl |= F_BEFORE_DELETION;
        if (next_op == 1) last_fl |= F_BEFORE_INSERTION;
        if (next_op == 4) last_fl |= F_NEXT_TO_SOFTCLIP;
        // clip the block to the span
        int64_t j0 = 0, j1 = ln;
        if (ref_i < span_start) j0 = span_start - ref_i;
        if (ref_i + ln > span_end) j1 = span_end - ref_i;
        if (j0 < j1) {
          if (out + (j1 - j0) > cap) return -1;
          for (int64_t j = j0; j < j1; j++) {
            out_pos[out] = ref_i + j - span_start;
            out_base[out] = bases[read_i + j];
            out_qual[out] = quals[read_i + j];
            uint8_t fl = 0;
            if (j == 0) fl |= first_fl;
            if (j == ln - 1) fl |= last_fl;
            out_flags[out] = fl;
            out_read_idx[out] = (int32_t)ri;
            out++;
          }
        }
        read_i += ln;
        ref_i += ln;
      } else if (op == 2 || op == 3) {  // D/N
        if (op == 2) {
          int64_t j0 = 0, j1 = ln;
          if (ref_i < span_start) j0 = span_start - ref_i;
          if (ref_i + ln > span_end) j1 = span_end - ref_i;
          if (j0 < j1) {
            if (out + (j1 - j0) > cap) return -1;
            for (int64_t j = j0; j < j1; j++) {
              out_pos[out] = ref_i + j - span_start;
              out_base[out] = DELETION_BASE;
              out_qual[out] = 0;
              out_flags[out] = F_DELETION;
              out_read_idx[out] = (int32_t)ri;
              out++;
            }
          }
        }
        ref_i += ln;
      } else if (op == 1 || op == 4) {  // I/S consume read only
        read_i += ln;
      }  // H/P consume nothing
    }
  }
  return out;
}

}  // extern "C"

extern "C" {

// Batch BAM record parse (io/bam.py _parse_record, vectorized): splits raw
// uncompressed BAM records in data[off, end) into SoA buffers — core fields,
// concatenated names / cigars / ASCII bases / quals / raw tag blobs with
// offset arrays. Returns the number of records parsed; stops early if any
// buffer would overflow (caller retries with bigger caps) and writes the
// byte offset reached to *consumed.
int64_t bam_parse_records(const uint8_t* data, int64_t off, int64_t end,
                          int64_t cap_records, int64_t name_cap,
                          int64_t cig_cap, int64_t seq_cap, int64_t tag_cap,
                          int32_t* core,  // (cap_records, 8)
                          int64_t* name_off, uint8_t* name_buf,
                          int64_t* cig_off, uint8_t* cig_ops, int32_t* cig_lens,
                          int64_t* seq_off, uint8_t* seq_buf, uint8_t* qual_buf,
                          int64_t* tag_off, uint8_t* tag_buf,
                          int64_t* consumed) {
  static const char NT16[] = "=ACMGRSVTWYHKDBN";
  int64_t n = 0;
  int64_t np = 0, cp = 0, sp = 0, tp = 0;
  name_off[0] = cig_off[0] = seq_off[0] = tag_off[0] = 0;
  while (off + 4 <= end && n < cap_records) {
    const int32_t block_size = *reinterpret_cast<const int32_t*>(data + off);
    const int64_t rec_end = off + 4 + block_size;
    if (rec_end > end) break;
    const uint8_t* p = data + off + 4;
    const int32_t ref_id = reinterpret_cast<const int32_t*>(p)[0];
    const int32_t pos = reinterpret_cast<const int32_t*>(p)[1];
    const uint32_t l_rn_mapq_bin = reinterpret_cast<const uint32_t*>(p)[2];
    const uint32_t ncig_flag = reinterpret_cast<const uint32_t*>(p)[3];
    const int32_t l_seq = reinterpret_cast<const int32_t*>(p)[4];
    const int32_t next_ref = reinterpret_cast<const int32_t*>(p)[5];
    const int32_t next_pos = reinterpret_cast<const int32_t*>(p)[6];
    const int32_t tlen = reinterpret_cast<const int32_t*>(p)[7];
    const int32_t l_read_name = l_rn_mapq_bin & 0xFF;
    const int32_t mapq = (l_rn_mapq_bin >> 8) & 0xFF;
    const int32_t n_cigar = ncig_flag & 0xFFFF;
    const int32_t flag = ncig_flag >> 16;
    const uint8_t* q = p + 32;
    const int64_t name_len = l_read_name - 1;
    const int64_t n_seq_bytes = (l_seq + 1) / 2;
    const int64_t tag_len = rec_end - (int64_t)(q - data) - l_read_name -
                            4LL * n_cigar - n_seq_bytes - l_seq;
    if (np + name_len > name_cap || cp + n_cigar > cig_cap ||
        sp + l_seq > seq_cap || tp + tag_len > tag_cap)
      break;
    // name (without trailing NUL)
    std::memcpy(name_buf + np, q, name_len);
    np += name_len;
    q += l_read_name;
    // cigar + reference end
    int64_t ref_len = 0;
    for (int32_t k = 0; k < n_cigar; k++) {
      const uint32_t cv = reinterpret_cast<const uint32_t*>(q)[k];
      const uint8_t op = cv & 0xF;
      const int32_t ln = cv >> 4;
      cig_ops[cp + k] = op;
      cig_lens[cp + k] = ln;
      // M/D/N/=/X consume reference
      if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) ref_len += ln;
    }
    cp += n_cigar;
    q += 4LL * n_cigar;
    // bases 4-bit -> ASCII
    for (int32_t k = 0; k < l_seq; k++) {
      const uint8_t b = q[k >> 1];
      seq_buf[sp + k] = (uint8_t)NT16[(k & 1) ? (b & 0xF) : (b >> 4)];
    }
    q += n_seq_bytes;
    std::memcpy(qual_buf + sp, q, l_seq);
    sp += l_seq;
    q += l_seq;
    // raw tag blob
    if (tag_len > 0) std::memcpy(tag_buf + tp, q, tag_len);
    tp += tag_len > 0 ? tag_len : 0;

    int32_t* c = core + n * 8;
    c[0] = ref_id;
    c[1] = pos;
    c[2] = flag;
    c[3] = mapq;
    c[4] = next_ref;
    c[5] = next_pos;
    c[6] = tlen;
    c[7] = pos + (int32_t)ref_len;  // 0-based exclusive alignment end
    n++;
    name_off[n] = np;
    cig_off[n] = cp;
    seq_off[n] = sp;
    tag_off[n] = tp;
    off = rec_end;
  }
  *consumed = off;
  return n;
}

}  // extern "C"
