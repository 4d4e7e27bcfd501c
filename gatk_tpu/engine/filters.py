"""Read filters (engine/filters/ReadFilterLibrary + WellformedReadFilter equivalents).

Reference behavior: engine/filters/*.java; the HaplotypeCaller default stack is
HaplotypeCallerEngine.makeStandardHCReadFilters (MappingQualityReadFilter(20),
MappingQualityAvailable, Mapped, NotSecondaryAlignment, NotDuplicate,
PassesVendorQualityCheck, NonZeroReferenceLengthAlignment, GoodCigar, Wellformed).
"""
from __future__ import annotations

import numpy as np

from ..io import sam
from ..io.reads import Read


def mapped(r: Read) -> bool:
    return not r.is_unmapped and r.pos >= 0


def mapping_quality_available(r: Read) -> bool:
    return r.mapq != 255


def mapping_quality_at_least(r: Read, min_mq: int) -> bool:
    return r.mapq >= min_mq


def not_secondary(r: Read) -> bool:
    return not r.is_secondary


def not_supplementary(r: Read) -> bool:
    return not r.is_supplementary


def not_duplicate(r: Read) -> bool:
    return not r.is_duplicate


def passes_vendor_quality(r: Read) -> bool:
    return not r.fails_vendor_quality


def non_zero_reference_length(r: Read) -> bool:
    return sam.cigar_ref_length(r.cigar_ops, r.cigar_lens) > 0


def good_cigar(r: Read) -> bool:
    """GoodCigarReadFilter: no I/S at both ends of the cigar adjacent weirdness —
    specifically CigarUtils.isGood: no consecutive indels, does not start/end with
    deletion (after clips), no N... simplified to htsjdk validity + no leading/trailing
    deletion and no consecutive I/D pairs."""
    ops = [int(o) for o in r.cigar_ops]
    if not ops:
        return True
    core = [o for o in ops if o not in (sam.OP_S, sam.OP_H)]
    if core and (core[0] == sam.OP_D or core[-1] == sam.OP_D):
        return False
    for a, b in zip(core, core[1:]):
        if a in (sam.OP_I, sam.OP_D) and b in (sam.OP_I, sam.OP_D) and a != b:
            return False
    return True


def wellformed(r: Read, contig_length: int | None = None) -> bool:
    """WellformedReadFilter: aligned within contig, consistent cigar/seq lengths,
    has bases, non-empty cigar for mapped reads."""
    if r.is_unmapped:
        return False
    if r.pos < 0:
        return False
    if contig_length is not None and r.end > contig_length:
        return False
    if len(r.bases) == 0 or len(r.bases) != len(r.quals):
        return False
    if len(r.cigar_ops) == 0:
        return False
    if sam.cigar_read_length(r.cigar_ops, r.cigar_lens) != len(r.bases):
        return False
    return True


def hc_read_filter(r: Read, min_mapping_quality: int = 20, contig_length: int | None = None) -> bool:
    """The HaplotypeCaller default read-filter stack."""
    return (
        mapped(r)
        and mapping_quality_available(r)
        and mapping_quality_at_least(r, min_mapping_quality)
        and not_secondary(r)
        and not_duplicate(r)
        and passes_vendor_quality(r)
        and non_zero_reference_length(r)
        and good_cigar(r)
        and wellformed(r, contig_length)
    )


def mutect2_read_filter(r: Read, min_mapping_quality: int = 20, contig_length: int | None = None) -> bool:
    """Mutect2 default stack (adds NotSupplementary... shares most of HC's)."""
    return hc_read_filter(r, min_mapping_quality, contig_length) and not_supplementary(r)
