"""Pluggable variant-annotation engine (VariantAnnotatorEngine equivalent).

Reference: tools/walkers/annotator/VariantAnnotatorEngine.java +
VariantAnnotator.java and the annotation classes under walkers/annotator/.
Each annotation is a small class with `keys` (INFO keys it writes) and
`annotate(ctx) -> dict`; the engine runs a configurable set over a
VariantContext-like bundle of (variant, overlapping reads, reference,
optional per-sample genotypes). Registered names match the reference class
names so `-A AnnotationName` command lines port directly.

Annotations that need read-vs-haplotype likelihoods (RankSum family, FS/SOR
from informative reads) stay inline in genotyping_engine._standard_annotations;
this engine covers the pileup/genotype-derived set and powers the
VariantAnnotator tool (re-annotation of an existing VCF against a BAM).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..gvcf.annotations import (fisher_strand_phred, format_vcf_double,
                                inbreeding_coefficient, mann_whitney_z,
                                rms_mapping_quality, strand_odds_ratio)


@dataclass
class AnnotationContext:
    """Everything an annotation may inspect (VariantContext + ReadLikelihoods
    stand-in: here reads come from a pileup over the variant site)."""
    variant: object                 # io.vcf.Variant
    reads: list = field(default_factory=list)   # overlapping, filter-passing reads
    reference: object = None        # FastaReference or None
    # per-read allele support: +1 alt, 0 ref, -1 uninformative (filled by engine)
    read_allele: np.ndarray | None = None

    def alt_reads(self):
        if self.read_allele is None:
            return []
        return [r for r, a in zip(self.reads, self.read_allele) if a > 0]

    def ref_reads(self):
        if self.read_allele is None:
            return []
        return [r for r, a in zip(self.reads, self.read_allele) if a == 0]


class Annotation:
    keys: tuple = ()

    def annotate(self, ctx: AnnotationContext) -> dict:
        raise NotImplementedError


class Coverage(Annotation):
    """DP (Coverage.java)."""
    keys = ("DP",)

    def annotate(self, ctx):
        return {"DP": str(len(ctx.reads))} if ctx.reads else {}


class MappingQualityZero(Annotation):
    """MQ0 (MappingQualityZero.java)."""
    keys = ("MQ0",)

    def annotate(self, ctx):
        if not ctx.reads:
            return {}
        return {"MQ0": str(sum(1 for r in ctx.reads if r.mapq == 0))}


class RMSMappingQuality(Annotation):
    """MQ (RMSMappingQuality.java finalized form)."""
    keys = ("MQ",)

    def annotate(self, ctx):
        if not ctx.reads:
            return {}
        return {"MQ": f"{rms_mapping_quality([r.mapq for r in ctx.reads]):.2f}"}


class CountNs(Annotation):
    """NCount: reads with an N at the variant site (CountNs.java)."""
    keys = ("NCount",)

    def annotate(self, ctx):
        n = 0
        for r in ctx.reads:
            off = read_offset_at(r, ctx.variant.pos)
            if off is not None and r.bases[off] in (ord("N"), ord("n")):
                n += 1
        return {"NCount": str(n)} if n else {}


class FragmentLength(Annotation):
    """MFRL-style median fragment length per ref/alt (FragmentLength.java)."""
    keys = ("MFRL",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        ref = [abs(r.tlen) for r in ctx.ref_reads() if r.tlen]
        alt = [abs(r.tlen) for r in ctx.alt_reads() if r.tlen]
        med = lambda v: int(np.median(v)) if v else 0  # noqa: E731
        return {"MFRL": f"{med(ref)},{med(alt)}"}


class BaseQualityAnn(Annotation):
    """MBQ: median base quality per ref/alt (BaseQuality.java)."""
    keys = ("MBQ",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        pos = ctx.variant.pos
        vals = {0: [], 1: []}
        for r, a in zip(ctx.reads, ctx.read_allele):
            if a < 0:
                continue
            off = read_offset_at(r, pos)
            if off is not None:
                vals[1 if a > 0 else 0].append(int(r.quals[off]))
        med = lambda v: int(np.median(v)) if v else 0  # noqa: E731
        return {"MBQ": f"{med(vals[0])},{med(vals[1])}"}


class ReadPosition(Annotation):
    """MPOS: median distance from end of read, alt reads (ReadPosition.java)."""
    keys = ("MPOS",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        d = []
        for r in ctx.alt_reads():
            off = read_offset_at(r, ctx.variant.pos)
            if off is not None:
                d.append(min(off, len(r.bases) - 1 - off))
        return {"MPOS": str(int(np.median(d)))} if d else {}


class UniqueAltReadCount(Annotation):
    """UNIQ_ALT_READ_COUNT: alt reads deduped by (start, fragment length)
    (UniqueAltReadCount.java)."""
    keys = ("UNIQ_ALT_READ_COUNT",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        uniq = {(r.pos, r.tlen) for r in ctx.alt_reads()}
        return {"UNIQ_ALT_READ_COUNT": str(len(uniq))}


class MappingQualityRankSumTest(Annotation):
    """MQRankSum from the pileup split (MappingQualityRankSumTest.java)."""
    keys = ("MQRankSum",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        z = mann_whitney_z([r.mapq for r in ctx.alt_reads()],
                           [r.mapq for r in ctx.ref_reads()])
        return {"MQRankSum": format_vcf_double(z)} if z is not None else {}


class BaseQualityRankSumTest(Annotation):
    """BaseQRankSum (BaseQualityRankSumTest.java)."""
    keys = ("BaseQRankSum",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        pos = ctx.variant.pos
        alt, ref = [], []
        for r, a in zip(ctx.reads, ctx.read_allele):
            if a < 0:
                continue
            off = read_offset_at(r, pos)
            if off is not None:
                (alt if a > 0 else ref).append(int(r.quals[off]))
        z = mann_whitney_z(alt, ref)
        return {"BaseQRankSum": format_vcf_double(z)} if z is not None else {}


class ReadPosRankSumTest(Annotation):
    """ReadPosRankSum (ReadPosRankSumTest.java)."""
    keys = ("ReadPosRankSum",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}
        pos = ctx.variant.pos
        alt, ref = [], []
        for r, a in zip(ctx.reads, ctx.read_allele):
            if a < 0:
                continue
            off = read_offset_at(r, pos)
            if off is not None:
                (alt if a > 0 else ref).append(min(off, len(r.bases) - 1 - off))
        z = mann_whitney_z(alt, ref)
        return {"ReadPosRankSum": format_vcf_double(z)} if z is not None else {}


class ClippingRankSumTest(Annotation):
    """ClippingRankSum: hard-clip counts alt vs ref (ClippingRankSumTest.java)."""
    keys = ("ClippingRankSum",)

    def annotate(self, ctx):
        if ctx.read_allele is None:
            return {}

        def clips(r):
            from ..io import sam

            t = 0
            for o, l in zip(r.cigar_ops, r.cigar_lens):
                if o == sam.OP_H:
                    t += int(l)
            return t

        z = mann_whitney_z([clips(r) for r in ctx.alt_reads()],
                           [clips(r) for r in ctx.ref_reads()])
        return {"ClippingRankSum": format_vcf_double(z)} if z is not None else {}


class FisherStrand(Annotation):
    """FS from the pileup strand table (FisherStrand.java)."""
    keys = ("FS",)

    def annotate(self, ctx):
        t = _strand_table(ctx)
        if t is None:
            return {}
        return {"FS": f"{fisher_strand_phred(*t):.3f}"}


class StrandOddsRatio(Annotation):
    """SOR (StrandOddsRatio.java)."""
    keys = ("SOR",)

    def annotate(self, ctx):
        t = _strand_table(ctx)
        if t is None:
            return {}
        return {"SOR": f"{strand_odds_ratio(*t):.3f}"}


class StrandBiasBySample(Annotation):
    """SB raw table (StrandBiasBySample.java, a FORMAT field; emitted as INFO
    SB_TABLE here when no per-sample split is available)."""
    keys = ("SB_TABLE",)

    def annotate(self, ctx):
        t = _strand_table(ctx)
        if t is None:
            return {}
        return {"SB_TABLE": ",".join(str(x) for x in t)}


class ChromosomeCounts(Annotation):
    """AC/AF/AN from sample genotypes (ChromosomeCounts.java)."""
    keys = ("AC", "AF", "AN")

    def annotate(self, ctx):
        v = ctx.variant
        an = 0
        ac = [0] * len(v.alts)
        for s in v.samples:
            gt = s.get("GT", "./.")
            for tok in gt.replace("|", "/").split("/"):
                if tok in (".", ""):
                    continue
                an += 1
                ai = int(tok)
                if ai > 0:
                    ac[ai - 1] += 1
        if an == 0:
            return {}
        return {"AC": ",".join(str(c) for c in ac),
                "AF": ",".join(format_vcf_double(c / an) for c in ac),
                "AN": str(an)}


class InbreedingCoeff(Annotation):
    """InbreedingCoeff from per-sample PLs (InbreedingCoeff.java; needs >=10
    founder samples in the reference — threshold enforced there, not here)."""
    keys = ("InbreedingCoeff",)

    def annotate(self, ctx):
        pls = []
        for s in ctx.variant.samples:
            pl = s.get("PL")
            if pl:
                pls.append([int(x) for x in pl.split(",")][:3])
        f = inbreeding_coefficient(pls) if len(pls) >= 2 else None
        return {"InbreedingCoeff": format_vcf_double(f)} if f is not None else {}


class GenotypeSummaries(Annotation):
    """CCC/NCC/HWP-style summaries: called/no-call counts + mean GQ/DP
    (GenotypeSummaries.java)."""
    keys = ("CCC", "NCC", "GQ_MEAN", "GQ_STDDEV")

    def annotate(self, ctx):
        v = ctx.variant
        called, nocall, gqs = 0, 0, []
        for s in v.samples:
            gt = s.get("GT", "./.")
            if "." in gt.replace("|", "/").split("/"):
                nocall += 1
            else:
                called += 1
            if s.get("GQ") not in (None, "."):
                gqs.append(int(s["GQ"]))
        out = {"CCC": str(called * 2), "NCC": str(nocall)}
        if gqs:
            out["GQ_MEAN"] = f"{np.mean(gqs):.2f}"
            if len(gqs) > 1:
                out["GQ_STDDEV"] = f"{np.std(gqs, ddof=1):.2f}"
        return out


class SampleList(Annotation):
    """Samples carrying an alt (SampleList.java)."""
    keys = ("Samples",)

    def annotate(self, ctx):
        v = ctx.variant
        names = [s.get("_name", f"S{i}") for i, s in enumerate(v.samples)
                 if any(t not in ("0", ".", "") for t in
                        s.get("GT", "./.").replace("|", "/").split("/"))]
        return {"Samples": ",".join(names)} if names else {}


class TandemRepeat(Annotation):
    """STR/RU/RPA for indels vs the reference context (TandemRepeat.java)."""
    keys = ("STR", "RU", "RPA")

    def annotate(self, ctx):
        v = ctx.variant
        if ctx.reference is None or not v.alts:
            return {}
        if all(len(a) == len(v.ref) for a in v.alts):
            return {}  # indels only
        clen = ctx.reference.contig_length(v.contig)
        window = ctx.reference.fetch_bytes(
            v.contig, min(v.pos + 1, clen), min(v.pos + 1 + 60, clen))
        ru = _repeat_unit(v.ref, v.alts, bytes(window))
        if ru is None:
            return {}
        unit, counts = ru
        return {"STR": None, "RU": unit.decode(),
                "RPA": ",".join(str(c) for c in counts)}


def _leading_reps(unit: bytes, s: bytes) -> int:
    n, ul = 0, len(unit)
    while s[n * ul:(n + 1) * ul] == unit:
        n += 1
    return n


def _smallest_repeat_unit(s: bytes) -> bytes:
    """findRepeatedSubstring: smallest prefix whose tandem repetition is s."""
    for ul in range(1, len(s) // 2 + 1):
        if len(s) % ul == 0 and s[:ul] * (len(s) // ul) == s:
            return s[:ul]
    return s


def _repeat_unit(ref: str, alts, window: bytes):
    """Exact port of GATKVariantContextUtils.getNumTandemRepeatUnits:855-914.
    window = reference bases starting at pos+1 (after the padding base), which
    overlap the ref allele span; per-allele counts subtract the repetitions
    already inside the ref allele."""
    ref_b = ref.encode()[1:]  # drop padding base
    unit = None
    lengths = []
    for alt in alts:
        alt_b = alt.encode()[1:]
        if len(alt_b) == len(ref_b):
            return None
        long_b = alt_b if len(alt_b) > len(ref_b) else ref_b
        unit = _smallest_repeat_unit(long_b)
        reps_in_ref = _leading_reps(unit, ref_b)
        c_ref = _leading_reps(unit, ref_b + window) - reps_in_ref
        c_alt = _leading_reps(unit, alt_b + window) - reps_in_ref
        if c_ref == 0 or c_alt == 0:
            return None
        if not lengths:
            lengths.append(c_ref)
        lengths.append(c_alt)
    return (unit, lengths) if unit else None


class ReferenceBases(Annotation):
    """REF_BASES: the 10-base reference context (ReferenceBases.java)."""
    keys = ("REF_BASES",)

    def annotate(self, ctx):
        if ctx.reference is None:
            return {}
        v = ctx.variant
        lo = max(0, v.pos - 5)
        b = ctx.reference.fetch_bytes(v.contig, lo, v.pos + 5)
        return {"REF_BASES": bytes(b).decode()}


def _strand_table(ctx):
    if ctx.read_allele is None:
        return None
    t = [0, 0, 0, 0]
    for r, a in zip(ctx.reads, ctx.read_allele):
        if a < 0:
            continue
        base = 2 if a > 0 else 0
        t[base + (1 if r.is_reverse else 0)] += 1
    return tuple(t)


def read_offset_at(read, ref_pos: int):
    """Read offset aligned to ref_pos, or None (deletion/outside)."""
    from ..io import sam

    rp = read.pos
    ro = 0
    for op, ln in zip(read.cigar_ops, read.cigar_lens):
        ln = int(ln)
        cr = sam.CONSUMES_READ[op]
        cf = sam.CONSUMES_REF[op]
        if cr and cf:
            if rp <= ref_pos < rp + ln:
                return ro + (ref_pos - rp)
            rp += ln
            ro += ln
        elif cr:
            ro += ln
        elif cf:
            if rp <= ref_pos < rp + ln:
                return None
            rp += ln
    return None


# name -> class; names match the reference annotation class names
ANNOTATION_REGISTRY = {
    "Coverage": Coverage,
    "MappingQualityZero": MappingQualityZero,
    "RMSMappingQuality": RMSMappingQuality,
    "CountNs": CountNs,
    "FragmentLength": FragmentLength,
    "BaseQuality": BaseQualityAnn,
    "ReadPosition": ReadPosition,
    "UniqueAltReadCount": UniqueAltReadCount,
    "MappingQualityRankSumTest": MappingQualityRankSumTest,
    "BaseQualityRankSumTest": BaseQualityRankSumTest,
    "ReadPosRankSumTest": ReadPosRankSumTest,
    "ClippingRankSumTest": ClippingRankSumTest,
    "FisherStrand": FisherStrand,
    "StrandOddsRatio": StrandOddsRatio,
    "StrandBiasBySample": StrandBiasBySample,
    "ChromosomeCounts": ChromosomeCounts,
    "InbreedingCoeff": InbreedingCoeff,
    "GenotypeSummaries": GenotypeSummaries,
    "SampleList": SampleList,
    "TandemRepeat": TandemRepeat,
    "ReferenceBases": ReferenceBases,
}

STANDARD_SET = ("Coverage", "RMSMappingQuality", "MappingQualityRankSumTest",
                "BaseQualityRankSumTest", "ReadPosRankSumTest", "FisherStrand",
                "StrandOddsRatio", "ChromosomeCounts")


class VariantAnnotatorEngine:
    """Runs a set of annotations over an AnnotationContext
    (VariantAnnotatorEngine.java:annotateContext). Classifies each overlapping
    read as ref/alt/uninformative by comparing its bases at the site (the
    pileup stand-in for read-likelihood marginalization)."""

    def __init__(self, names=STANDARD_SET, extra=(), exclude=()):
        wanted = [n for n in list(names) + list(extra) if n not in exclude]
        unknown = [n for n in wanted if n not in ANNOTATION_REGISTRY]
        if unknown:
            from ..utils.errors import UserError

            raise UserError(f"unknown annotation(s): {', '.join(unknown)}")
        self.annotations = [ANNOTATION_REGISTRY[n]() for n in wanted]

    def classify_reads(self, variant, reads) -> np.ndarray:
        """+1 alt, 0 ref, -1 uninformative per read (SNP/MNP base compare;
        indel length heuristic via cigar)."""
        out = np.full(len(reads), -1, np.int8)
        v = variant
        is_indel = any(len(a) != len(v.ref) for a in v.alts)
        for i, r in enumerate(reads):
            off = read_offset_at(r, v.pos)
            if is_indel:
                # indel support: any I/D in the read near the site
                has_indel = _has_indel_near(r, v.pos)
                if off is None and not has_indel:
                    continue
                out[i] = 1 if has_indel else 0
            else:
                if off is None or off + len(v.ref) > len(r.bases):
                    continue
                seg = bytes(r.bases[off : off + len(v.ref)]).upper()
                if seg == v.ref.upper().encode():
                    out[i] = 0
                elif any(seg == a.upper().encode() for a in v.alts
                         if len(a) == len(v.ref)):
                    out[i] = 1
        return out

    def annotate(self, variant, reads=(), reference=None) -> dict:
        ctx = AnnotationContext(variant, list(reads), reference)
        if ctx.reads:
            ctx.read_allele = self.classify_reads(variant, ctx.reads)
        info = {}
        for ann in self.annotations:
            info.update(ann.annotate(ctx))
        return info


def _has_indel_near(read, pos: int, window: int = 10) -> bool:
    from ..io import sam

    rp = read.pos
    for op, ln in zip(read.cigar_ops, read.cigar_lens):
        ln = int(ln)
        if op in (sam.OP_I, sam.OP_D) and abs(rp - (pos + 1)) <= window:
            return True
        if sam.CONSUMES_REF[op]:
            rp += ln
    return False
