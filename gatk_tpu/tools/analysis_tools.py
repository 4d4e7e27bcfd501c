"""Analysis/validation tools: Concordance, DepthOfCoverage,
LeftAlignAndTrimVariants, VariantsToTable, ReadsPipeline.

Reference behavior: tools/walkers/validation/Concordance.java,
tools/walkers/coverage/DepthOfCoverage.java,
tools/walkers/variantutils/LeftAlignAndTrimVariants.java,
tools/walkers/variantutils/VariantsToTable.java,
tools/spark/pipelines/ReadsPipelineSpark.java.
"""
from __future__ import annotations

import argparse

import numpy as np

from ..cli import UserError, register_tool
from ..engine import walkers
from ..engine import intervals as iv
from ..io import bam, fasta, vcf


def _genotype_alleles(v, sample_idx=0):
    """Set of called allele strings for a sample (ref + alts)."""
    if not v.samples:
        return None
    gt = v.samples[sample_idx].get("GT", ".")
    if "." in gt:
        return None
    return {v.alleles[int(i)] for i in gt.replace("|", "/").split("/")}


@register_tool("Concordance")
def concordance(argv):
    """Evaluate a callset against a truth VCF: TP/FP/FN, sensitivity, precision."""
    p = argparse.ArgumentParser(description="Concordance")
    p.add_argument("--evaluation", "-eval", required=True)
    p.add_argument("--truth", required=True)
    p.add_argument("--summary", required=True)
    p.add_argument("-L", "--intervals", action="append", default=None)
    args = p.parse_args(argv)

    def load(path):
        out = {}
        for v in vcf.VcfReader(path):
            if v.filters and v.filters != ("PASS",):
                continue  # only unfiltered/PASS records count (Concordance.java)
            for alt in v.alts:
                if alt.startswith("<") or alt == "*":
                    continue
                out[(v.contig, v.pos, v.ref, alt)] = v
        return out

    ev = load(args.evaluation)
    tr = load(args.truth)
    if args.intervals:
        ts = [iv.parse_interval(s) for s in args.intervals]

        def inside(k):
            return any(t.contig == k[0] and t.start <= k[1] < t.end for t in ts)

        ev = {k: v for k, v in ev.items() if inside(k)}
        tr = {k: v for k, v in tr.items() if inside(k)}

    def is_snp(k):
        return len(k[2]) == 1 and len(k[3]) == 1

    rows = []
    for kind, pred in (("SNP", is_snp), ("INDEL", lambda k: not is_snp(k))):
        tp = sum(1 for k in ev if k in tr and pred(k))
        fp = sum(1 for k in ev if k not in tr and pred(k))
        fn = sum(1 for k in tr if k not in ev and pred(k))
        sens = tp / (tp + fn) if tp + fn else 0.0
        prec = tp / (tp + fp) if tp + fp else 0.0
        rows.append((kind, tp, fp, fn, sens, prec))

    with open(args.summary, "w") as fh:
        fh.write("type\tTP\tFP\tFN\tSENSITIVITY\tPRECISION\n")
        for kind, tp, fp, fn, sens, prec in rows:
            fh.write(f"{kind}\t{tp}\t{fp}\t{fn}\t{sens:.3f}\t{prec:.3f}\n")
    for kind, tp, fp, fn, sens, prec in rows:
        print(f"{kind}: TP={tp} FP={fp} FN={fn} sensitivity={sens:.3f} precision={prec:.3f}")
    return 0


@register_tool("DepthOfCoverage")
def depth_of_coverage(argv):
    """Per-locus and summary depth over intervals."""
    p = argparse.ArgumentParser(description="DepthOfCoverage")
    p.add_argument("-I", "--input", required=True)
    p.add_argument("-L", "--intervals", action="append", required=True)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("--min-base-quality", type=int, default=0)
    args = p.parse_args(argv)

    from ..engine import pileup as pileup_mod

    reader = bam.BamReader(args.input)
    lengths = {s.name: s.length for s in reader.header.sequences}
    lines = ["Locus\tTotal_Depth\tAverage_Depth_sample\tDepth_for_sample"]
    total = 0
    n_loci = 0
    for s in args.intervals:
        t = iv.parse_interval(s, lengths)
        depth = np.zeros(t.end - t.start, np.int64)
        for r in reader.query(t.contig, t.start, t.end):
            if r.is_unmapped or r.is_duplicate or r.is_secondary:
                continue
            pos, base, qual, flags = pileup_mod.expand_read(r)
            keep = (pos >= t.start) & (pos < t.end) & (qual >= args.min_base_quality) \
                & ((flags & pileup_mod.F_DELETION) == 0)
            np.add.at(depth, pos[keep] - t.start, 1)
        for i, d in enumerate(depth):
            lines.append(f"{t.contig}:{t.start + i + 1}\t{d}\t{d:.2f}\t{d}")
        total += int(depth.sum())
        n_loci += len(depth)
    with open(args.output, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"mean depth {total / max(n_loci, 1):.2f} over {n_loci} loci")
    return 0


def left_align_variant(v, ref_fetch):
    """Shift an indel to its leftmost representation and trim shared bases
    (LeftAlignAndTrimVariants / GATKVariantContextUtils.leftAlignAndTrim)."""
    if len(v.alts) != 1 or v.alts[0].startswith("<") or v.alts[0] == "*":
        return v
    ref, alt, pos = v.ref, v.alts[0], v.pos
    if len(ref) == len(alt):
        return v
    # left-shift: while both alleles end with the same base, strip it and
    # prepend the previous reference base
    while pos > 0 and ref[-1] == alt[-1]:
        prev = ref_fetch(v.contig, pos - 1)
        ref = prev + ref[:-1]
        alt = prev + alt[:-1]
        pos -= 1
    # trim common suffix (keep >=1 base each)
    while len(ref) > 1 and len(alt) > 1 and ref[-1] == alt[-1]:
        ref, alt = ref[:-1], alt[:-1]
    # trim common prefix (keep the 1-base indel anchor)
    while len(ref) > 1 and len(alt) > 1 and ref[0] == alt[0] and ref[1] == alt[1]:
        ref, alt = ref[1:], alt[1:]
        pos += 1
    v.pos, v.ref, v.alts = pos, ref, (alt,)
    return v


@register_tool("LeftAlignAndTrimVariants")
def left_align_and_trim(argv):
    """Left-align indels and trim shared bases."""
    p = argparse.ArgumentParser(description="LeftAlignAndTrimVariants")
    p.add_argument("-V", "--variant", required=True)
    p.add_argument("-R", "--reference", required=True)
    p.add_argument("-O", "--output", required=True)
    args = p.parse_args(argv)

    ref = fasta.FastaReference(args.reference)
    cache = {}

    def fetch1(contig, pos):
        if contig not in cache:
            cache.clear()
            cache[contig] = bytes(ref.fetch(contig, 0, ref.contig_length(contig))).upper()
        return chr(cache[contig][pos])

    reader = vcf.VcfReader(args.variant)
    out = [left_align_variant(v, fetch1) for v in reader]
    out.sort(key=lambda v: (v.contig, v.pos))
    w = vcf.VcfWriter(args.output, reader.samples, extra_header_lines=reader.header_lines)
    for v in out:
        w.write(v)
    w.close()
    print(f"wrote {len(out)} records")
    return 0


@register_tool("VariantsToTable")
def variants_to_table(argv):
    """Extract VCF fields into a TSV."""
    p = argparse.ArgumentParser(description="VariantsToTable")
    p.add_argument("-V", "--variant", required=True)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("-F", "--fields", action="append", default=[])
    p.add_argument("-GF", "--genotype-fields", action="append", default=[])
    args = p.parse_args(argv)
    w = _VariantsToTableWalker(variant_path=args.variant)
    w.args = args
    w.run()
    return 0


class _VariantsToTableWalker(walkers.VariantWalker):
    """VariantsToTable as a VariantWalker (tools/walkers/variantutils/
    VariantsToTable.java extends VariantWalker)."""

    tool_name = "VariantsToTable"
    default_read_filters = ()

    _STD = {"CHROM": lambda v: v.contig, "POS": lambda v: str(v.pos + 1),
            "ID": lambda v: v.id, "REF": lambda v: v.ref,
            "ALT": lambda v: ",".join(v.alts),
            "QUAL": lambda v: vcf.format_qual(v.qual),
            "FILTER": lambda v: ";".join(v.filters) if v.filters else ".",
            "TYPE": lambda v: "SNP" if v.is_snp() else
            ("INDEL" if v.is_indel() else "OTHER")}

    def on_traversal_start(self):
        args = self.args
        self.samples = self.variant_reader.samples
        header = list(args.fields) + [f"{s}.{g}" for s in self.samples
                                      for g in args.genotype_fields]
        self.rows = [header]

    def apply(self, v):
        args = self.args
        row = []
        for f in args.fields:
            if f in self._STD:
                row.append(self._STD[f](v))
            else:
                val = v.info.get(f, "NA")
                row.append("NA" if val is None else
                           ("true" if val is True else str(val)))
        for si in range(len(self.samples)):
            for g in args.genotype_fields:
                row.append(str(v.samples[si].get(g, "NA"))
                           if si < len(v.samples) else "NA")
        self.rows.append(row)

    def on_traversal_success(self):
        with open(self.args.output, "w") as fh:
            fh.write("\n".join("\t".join(r) for r in self.rows) + "\n")
        print(f"wrote {len(self.rows) - 1} rows")


@register_tool("ReadsPipeline")
def reads_pipeline(argv):
    """MarkDuplicates -> BQSR -> HaplotypeCaller in one command
    (ReadsPipelineSpark equivalent, single-host)."""
    p = argparse.ArgumentParser(description="ReadsPipeline")
    p.add_argument("-I", "--input", required=True)
    p.add_argument("-R", "--reference", required=True)
    p.add_argument("--known-sites", action="append", default=[])
    p.add_argument("-O", "--output", required=True, help="output VCF")
    p.add_argument("-L", "--intervals", action="append", default=None)
    p.add_argument("--emit-ref-confidence", "-ERC", choices=["NONE", "GVCF"], default="NONE")
    p.add_argument("--adaptive-pruning", action="store_true")
    p.add_argument("--max-reads-per-alignment-start", type=int, default=50)
    args = p.parse_args(argv)

    import tempfile

    from . import bqsr_tools, hc_tool

    with tempfile.TemporaryDirectory() as td:
        md_bam = f"{td}/md.bam"
        bqsr_tools.mark_duplicates_tool(["-I", args.input, "-O", md_bam])
        final_bam = md_bam
        if args.known_sites:
            table = f"{td}/recal.table"
            recal_args = ["-I", md_bam, "-R", args.reference, "-O", table]
            for ks in args.known_sites:
                recal_args += ["--known-sites", ks]
            bqsr_tools.base_recalibrator(recal_args)
            final_bam = f"{td}/recal.bam"
            bqsr_tools.apply_bqsr(["-I", md_bam, "--bqsr-recal-file", table, "-O", final_bam])
        hc_args = ["-I", final_bam, "-R", args.reference, "-O", args.output,
                   "-ERC", args.emit_ref_confidence,
                   "--max-reads-per-alignment-start", str(args.max_reads_per_alignment_start)]
        if args.adaptive_pruning:
            hc_args.append("--adaptive-pruning")
        if args.intervals:
            for s in args.intervals:
                hc_args += ["-L", s]
        hc_tool.haplotype_caller(hc_args)
    print(f"pipeline complete -> {args.output}")
    return 0
