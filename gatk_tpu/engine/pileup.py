"""Pileup construction as dense arrays (LocusIteratorByState replacement).

Reference behavior: utils/pileup/PileupElement.java (adjacency flags),
utils/locusiterator/. Instead of streaming per-locus object pileups, each read is
expanded once into (ref_pos, base, qual, flags) element arrays; per-locus statistics
are then scatter-adds over a shard-relative coordinate — the form that maps onto TPU
histogram kernels and vectorized activity computation.
"""
from __future__ import annotations

import numpy as np

from ..io import sam
from ..io.reads import Read

# element flag bits
F_DELETION = 1
F_BEFORE_DELETION = 2
F_AFTER_DELETION = 4
F_BEFORE_INSERTION = 8
F_AFTER_INSERTION = 16
F_NEXT_TO_SOFTCLIP = 32

DELETION_BASE = ord("-")


def expand_read(read: Read):
    """Expand a read into per-reference-position pileup elements.

    Returns (ref_pos, base, qual, flags) int/uint8 arrays covering every reference
    position the alignment consumes (M/=/X bases and D positions).
    """
    n_ref = sam.cigar_ref_length(read.cigar_ops, read.cigar_lens)
    ref_pos = np.empty(n_ref, np.int64)
    base = np.empty(n_ref, np.uint8)
    qual = np.empty(n_ref, np.uint8)
    flags = np.zeros(n_ref, np.uint8)

    ops = read.cigar_ops
    lens = read.cigar_lens
    ncig = len(ops)
    out = 0
    read_i = 0
    ref_i = read.pos
    for k in range(ncig):
        op = int(ops[k])
        ln = int(lens[k])
        if op in (sam.OP_M, sam.OP_EQ, sam.OP_X):
            sl = slice(out, out + ln)
            ref_pos[sl] = np.arange(ref_i, ref_i + ln)
            base[sl] = read.bases[read_i : read_i + ln]
            qual[sl] = read.quals[read_i : read_i + ln]
            # adjacency flags on first/last base of this aligned block
            prev_op = int(ops[k - 1]) if k > 0 else -1
            next_op = int(ops[k + 1]) if k < ncig - 1 else -1
            if prev_op == sam.OP_D:
                flags[out] |= F_AFTER_DELETION
            if prev_op == sam.OP_I:
                flags[out] |= F_AFTER_INSERTION
            if prev_op == sam.OP_S:
                flags[out] |= F_NEXT_TO_SOFTCLIP
            if next_op == sam.OP_D:
                flags[out + ln - 1] |= F_BEFORE_DELETION
            if next_op == sam.OP_I:
                flags[out + ln - 1] |= F_BEFORE_INSERTION
            if next_op == sam.OP_S:
                flags[out + ln - 1] |= F_NEXT_TO_SOFTCLIP
            out += ln
            read_i += ln
            ref_i += ln
        elif op == sam.OP_D or op == sam.OP_N:
            if op == sam.OP_D:
                sl = slice(out, out + ln)
                ref_pos[sl] = np.arange(ref_i, ref_i + ln)
                base[sl] = DELETION_BASE
                qual[sl] = 0
                flags[sl] = F_DELETION
                out += ln
            ref_i += ln
        elif op in (sam.OP_I, sam.OP_S):
            read_i += ln
        # H and P consume nothing

    return ref_pos[:out], base[:out], qual[:out], flags[:out]


def count_high_quality_soft_clips(read: Read, qual_threshold: int = 28) -> int:
    """Number of soft-clipped bases with qual >= threshold (AlignmentUtils)."""
    n = 0
    read_i = 0
    for op, ln in zip(read.cigar_ops, read.cigar_lens):
        ln = int(ln)
        if sam.CONSUMES_READ[op]:
            if op == sam.OP_S:
                n += int(np.sum(read.quals[read_i : read_i + ln] >= qual_threshold))
            read_i += ln
    return n


def build_pileup_elements(reads, span_start: int, span_end: int):
    """Concatenate expanded elements of many reads, restricted to [span_start, span_end).

    Returns dict of arrays: pos (span-relative), base, qual, flags, read_idx.
    """
    all_pos, all_base, all_qual, all_flags, all_rid = [], [], [], [], []
    for k, r in enumerate(reads):
        p, b, q, f = expand_read(r)
        keep = (p >= span_start) & (p < span_end)
        if not keep.any():
            continue
        all_pos.append(p[keep] - span_start)
        all_base.append(b[keep])
        all_qual.append(q[keep])
        all_flags.append(f[keep])
        all_rid.append(np.full(int(keep.sum()), k, np.int32))
    if not all_pos:
        z = np.empty(0, np.int64)
        return dict(pos=z, base=z.astype(np.uint8), qual=z.astype(np.uint8),
                    flags=z.astype(np.uint8), read_idx=z.astype(np.int32))
    return dict(
        pos=np.concatenate(all_pos),
        base=np.concatenate(all_base),
        qual=np.concatenate(all_qual),
        flags=np.concatenate(all_flags),
        read_idx=np.concatenate(all_rid),
    )
