"""HaplotypeCaller tool (tools/walkers/haplotypecaller/HaplotypeCaller.java CLI
equivalent)."""
from __future__ import annotations

import numpy as np

from ..calling import hc_engine
from ..cli import UserError, register_tool, standard_io_parser
from ..engine import intervals as iv
from ..io import bam, fasta, vcf

VCF_HEADER_LINES = [
    '##FILTER=<ID=LowQual,Description="Low quality">',
    '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths for the ref and alt alleles in the order listed">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Approximate read depth (reads with MQ=255 or with bad mates are filtered)">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype Quality">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Normalized, Phred-scaled likelihoods for genotypes as defined in the VCF specification">',
]


@register_tool("HaplotypeCaller")
def haplotype_caller(argv):
    """Call germline SNPs and indels via local re-assembly of haplotypes."""
    p = standard_io_parser("HaplotypeCaller")
    p.add_argument("--standard-min-confidence-threshold-for-calling", type=float, default=30.0)
    p.add_argument("--sample-ploidy", type=int, default=2)
    p.add_argument("--min-base-quality-score", type=int, default=10)
    p.add_argument("--dont-use-soft-clipped-bases", action="store_true")
    p.add_argument("--pairhmm-device", action="store_true", help="force the Pallas kernel")
    p.add_argument("-ERC", "--emit-ref-confidence", choices=["NONE", "GVCF"], default="NONE")
    args = p.parse_args(argv)

    ref = fasta.FastaReference(args.reference)
    readers = [bam.BamReader(path) for path in args.input]
    header = readers[0].header
    sample = header.read_groups[0].get("SM", "SAMPLE") if header.read_groups else "SAMPLE"

    contig_lengths = {s.name: s.length for s in header.sequences}
    if args.intervals:
        targets = [iv.parse_interval(s, contig_lengths) for s in args.intervals]
    else:
        targets = [iv.Interval(s.name, 0, s.length) for s in header.sequences]

    hc_args = hc_engine.HCArgs(
        min_base_quality_score=args.min_base_quality_score,
        standard_confidence=args.standard_min_confidence_threshold_for_calling,
        ploidy=args.sample_ploidy,
        dont_use_soft_clipped_bases=args.dont_use_soft_clipped_bases,
        use_pairhmm_device=args.pairhmm_device,
    )
    engine = hc_engine.HaplotypeCallerEngine(ref, sample, hc_args)

    gvcf_mode = args.emit_ref_confidence == "GVCF"
    header_lines = list(VCF_HEADER_LINES)
    if gvcf_mode:
        header_lines += [
            '##ALT=<ID=NON_REF,Description="Represents any possible alternative allele">',
            '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="Minimum DP observed within the GVCF block">',
            '##INFO=<ID=END,Number=1,Type=Integer,Description="Stop position of the interval">',
        ]
    writer = vcf.VcfWriter(
        args.output,
        [sample],
        contigs=[(s.name, s.length) for s in header.sequences],
        extra_header_lines=header_lines,
    )
    n = 0
    for target in targets:
        reads = []
        for r in readers:
            reads.extend(r.query(target.contig, max(0, target.start - 1000), target.end + 1000))
        reads.sort(key=lambda x: (x.pos, x.name))
        if gvcf_mode:
            records = hc_engine.call_interval_gvcf(engine, reads, target)
            for v in records:
                writer.write(v)
                n += 1
        else:
            variants, _ = engine.call_interval(reads, target)
            for v in sorted(variants, key=lambda x: x.pos):
                writer.write(v)
                n += 1
    writer.close()
    print(f"wrote {n} variants to {args.output}")
    return 0
