"""Structural-variant discovery from assembled-contig alignments.

Reference behavior: tools/StructuralVariantDiscoverer.java (+ the
spark/sv/discovery chimeric-alignment machinery it drives): take
queryname-grouped alignments of locally-assembled contigs, find contigs whose
split alignments (or large CIGAR gaps) indicate a novel adjacency, classify the
adjacency into simple SV types, and emit VCF records:

  same-strand split, reference gap >> contig gap          -> DEL
  same-strand split, contig gap >> reference gap          -> INS
  same-strand split, reference overlap (ref walk-back)    -> tandem DUP
  strand flip within a contig                             -> INV (both BPs)
  different chromosomes                                   -> BND mates

Novel adjacencies seen in multiple contigs are merged (evidence count in the
CTGS info field), mirroring simpleEvidenceForNovelAdjacencyMap de-duplication.
"""
from __future__ import annotations

import argparse
from dataclasses import dataclass

import numpy as np

from ..cli import UserError, register_tool
from ..io import sam, vcf

MIN_SV_SIZE = 50  # StructuralVariationDiscoveryArgumentCollection default
MIN_ALIGNMENT_LENGTH = 50


@dataclass
class ContigAlignment:
    """One alignment of an assembled contig (AlignmentInterval equivalent)."""
    ref_id: int
    contig: str
    ref_start: int  # 0-based
    ref_end: int
    is_reverse: bool
    read_start: int  # contig coordinates (forward-strand contig space)
    read_end: int
    mapq: int


def _contig_interval(read, header):
    """Contig-space [start, end) of the aligned bases, on the contig's forward
    strand (AlignmentInterval.startInAssembledContig semantics)."""
    lead = trail = 0
    ops, lens = read.cigar_ops, read.cigar_lens
    n = len(ops)
    if n and ops[0] in (sam.OP_S, sam.OP_H):
        lead = int(lens[0])
    if n > 1 and ops[n - 1] in (sam.OP_S, sam.OP_H):
        trail = int(lens[n - 1])
    aligned = sum(int(l) for o, l in zip(ops, lens)
                  if sam.CONSUMES_READ[o] and o not in (sam.OP_S, sam.OP_H))
    total = lead + aligned + trail
    if read.is_reverse:
        start = trail  # clips are in read orientation; flip to contig forward
    else:
        start = lead
    return start, start + aligned, total


def _collect_alignments(reads, header):
    out = []
    for r in reads:
        if r.is_unmapped or (r.flag & 0x100):
            continue
        cs, ce, _total = _contig_interval(r, header)
        if ce - cs < MIN_ALIGNMENT_LENGTH:
            continue
        out.append(ContigAlignment(
            ref_id=r.ref_id, contig=header.sequences[r.ref_id].name,
            ref_start=int(r.pos), ref_end=int(r.end), is_reverse=r.is_reverse,
            read_start=cs, read_end=ce, mapq=int(r.mapq)))
    out.sort(key=lambda a: a.read_start)
    return out


def _classify_pair(a1, a2, min_size):
    """Novel-adjacency classification for two contig-adjacent alignments
    (BreakpointsInference + SimpleChimera.inferType equivalents). Returns
    (svtype, contig, pos, end, svlen) or None."""
    read_gap = a2.read_start - a1.read_end
    if a1.contig != a2.contig:
        # inter-chromosomal adjacency -> BND pair
        bp1 = a1.ref_start if a1.is_reverse else a1.ref_end - 1
        bp2 = a2.ref_end - 1 if a2.is_reverse else a2.ref_start
        return ("BND", a1.contig, bp1, (a2.contig, bp2), 0)
    if a1.is_reverse != a2.is_reverse:
        # intra-chromosomal strand flip -> inversion breakpoint
        lo = min(a1.ref_start, a2.ref_start)
        hi = max(a1.ref_end, a2.ref_end)
        if hi - lo < min_size:
            return None
        return ("INV", a1.contig, lo, hi, hi - lo)
    # same strand: orient ref coordinates along the contig walk
    if not a1.is_reverse:
        ref_gap = a2.ref_start - a1.ref_end
        left_end = a1.ref_end
    else:
        ref_gap = a1.ref_start - a2.ref_end
        left_end = a2.ref_end
    delta = ref_gap - read_gap
    if delta >= min_size and ref_gap > 0:
        # reference skips ahead -> deletion of `delta` bases
        pos = left_end - 1
        return ("DEL", a1.contig, pos, pos + ref_gap, -(ref_gap - max(read_gap, 0)))
    if -delta >= min_size and read_gap > 0:
        # contig has extra sequence -> insertion at the junction
        pos = left_end - 1
        return ("INS", a1.contig, pos, pos + 1, read_gap - max(ref_gap, 0))
    if ref_gap < 0 and -ref_gap >= min_size:
        # reference walks backwards -> tandem duplication of the overlap
        dup_lo = (a2.ref_start if not a1.is_reverse else a1.ref_start)
        dup_hi = (a1.ref_end if not a1.is_reverse else a2.ref_end)
        return ("DUP", a1.contig, dup_lo, dup_hi, dup_hi - dup_lo)
    return None


@register_tool("StructuralVariantDiscoverer")
def structural_variant_discoverer(argv):
    """Call SVs/breakpoints from split alignments of assembled contigs
    (tools/StructuralVariantDiscoverer.java)."""
    p = argparse.ArgumentParser(description="StructuralVariantDiscoverer")
    p.add_argument("-I", "--input", required=True,
                   help="queryname-sorted/grouped contig alignments (BAM)")
    p.add_argument("-R", "--reference", default=None)
    p.add_argument("--outputVCFName", "-O", dest="output", required=True)
    p.add_argument("--min-svsize", type=int, default=MIN_SV_SIZE)
    p.add_argument("--min-mapq", type=int, default=20)
    args = p.parse_args(argv)

    from ..io import fasta
    from ..io.cram import open_reads

    ref = fasta.FastaReference(args.reference) if args.reference else None
    rd = open_reads(args.input, reference=ref)
    header = rd.header
    sample = header.read_groups[0].get("SM", "SAMPLE") if header.read_groups else "SAMPLE"

    # queryname grouping (the tool requires queryname-sorted input)
    adjacencies = {}  # key -> dict(record fields, ctgs)
    cur_name, cur_reads = None, []

    def process(name, reads):
        alns = _collect_alignments(reads, header)
        alns = [a for a in alns if a.mapq >= args.min_mapq]
        for a1, a2 in zip(alns, alns[1:]):
            res = _classify_pair(a1, a2, args.min_svsize)
            if res is None:
                continue
            svtype, contig, pos, end, svlen = res
            key = (svtype, contig, pos, end if not isinstance(end, tuple) else end)
            rec = adjacencies.setdefault(
                key, dict(svtype=svtype, contig=contig, pos=pos, end=end,
                          svlen=svlen, ctgs=set()))
            rec["ctgs"].add(name)

    seen_names = set()
    for r in rd:
        if r.name != cur_name:
            if cur_reads:
                process(cur_name, cur_reads)
            if r.name in seen_names:
                raise UserError("input is not queryname-grouped "
                                "(contig name seen twice non-adjacently)")
            seen_names.add(r.name)
            cur_name, cur_reads = r.name, []
        cur_reads.append(r)
    if cur_reads:
        process(cur_name, cur_reads)

    headers = [
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">',
        '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="SV length">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="End position">',
        '##INFO=<ID=CTGS,Number=.,Type=String,Description="Evidence contig names">',
        '##INFO=<ID=MATEID,Number=1,Type=String,Description="Mate breakend">',
        '##ALT=<ID=DEL,Description="Deletion">',
        '##ALT=<ID=INS,Description="Insertion">',
        '##ALT=<ID=DUP,Description="Tandem duplication">',
        '##ALT=<ID=INV,Description="Inversion">',
    ]
    contigs = [(s.name, s.length) for s in header.sequences]
    w = vcf.VcfWriter(args.output, [sample], contigs=contigs,
                      extra_header_lines=headers)
    records = []
    for key, rec in adjacencies.items():
        contig, pos = rec["contig"], rec["pos"]
        ref_base = "N"
        if ref is not None:
            ref_base = chr(ref.fetch(contig, pos, pos + 1)[0]).upper()
        info = {"SVTYPE": rec["svtype"], "CTGS": ",".join(sorted(rec["ctgs"]))}
        if rec["svtype"] == "BND":
            mate_contig, mate_pos = rec["end"]
            alt = f"{ref_base}]{mate_contig}:{mate_pos + 1}]"
            vid = f"BND_{contig}_{pos + 1}"
            info["MATEID"] = f"BND_{mate_contig}_{mate_pos + 1}"
            records.append(vcf.Variant(contig, pos, ref_base, (alt,), id=vid,
                                       qual=None, info=info,
                                       samples=[{"GT": "./."}], fmt_keys=("GT",)))
            continue
        info["END"] = str(rec["end"])
        info["SVLEN"] = str(rec["svlen"])
        vid = f"{rec['svtype']}_{contig}_{pos + 1}_{rec['end']}"
        records.append(vcf.Variant(contig, pos, ref_base,
                                   (f"<{rec['svtype']}>",), id=vid, qual=None,
                                   info=info, samples=[{"GT": "./."}],
                                   fmt_keys=("GT",)))
    order = {name: i for i, (name, _) in enumerate(contigs)}
    records.sort(key=lambda v: (order.get(v.contig, 1 << 30), v.pos))
    for v in records:
        w.write(v)
    w.close()
    print(f"StructuralVariantDiscoverer: {len(records)} SV records "
          f"from {len(seen_names)} contigs -> {args.output}")
    return 0
