"""CombineGVCFs / GenotypeGVCFs command line tools."""
from __future__ import annotations

import argparse

from ..cli import UserError, register_tool
from ..gvcf import genotype_gvcfs as gg
from ..io import vcf


@register_tool("GenotypeGVCFs")
def genotype_gvcfs_tool(argv):
    """Perform joint genotyping on one or more samples' GVCFs."""
    p = argparse.ArgumentParser(description="GenotypeGVCFs")
    p.add_argument("-V", "--variant", required=True)
    p.add_argument("-R", "--reference", default=None)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("-L", "--intervals", action="append", default=None)
    p.add_argument("--standard-min-confidence-threshold-for-calling", "-stand-call-conf",
                   type=float, default=30.0)
    p.add_argument("--include-non-variant-sites", action="store_true")
    p.add_argument("--sample-ploidy", type=int, default=2)
    args = p.parse_args(argv)

    from ..utils.javarandom import reset_random_generator

    reset_random_generator()
    reader = vcf.VcfReader(args.variant)
    # GATK emits samples in lexicographic order regardless of input order
    sample_order = sorted(range(len(reader.samples)), key=lambda i: reader.samples[i])
    sorted_samples = [reader.samples[i] for i in sample_order]
    out = []
    for v in reader:
        alts = [a for a in v.alts if a != gg.NON_REF and a != "*"]
        if not alts:
            continue  # hom-ref block
        records = [(v, v.samples[i]) for i in sample_order]
        res = gg.regenotype_records_at_site(
            records, reader.samples, ploidy=args.sample_ploidy,
            standard_confidence=args.standard_min_confidence_threshold_for_calling,
            include_non_variants=args.include_non_variant_sites,
        )
        if res is not None:
            out.append(res)

    header_lines = [
        '##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count in genotypes">',
        '##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">',
        '##INFO=<ID=AN,Number=1,Type=Integer,Description="Total number of alleles in called genotypes">',
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Approximate read depth">',
        '##INFO=<ID=QD,Number=1,Type=Float,Description="Variant Confidence/Quality by Depth">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Phred-scaled genotype likelihoods">',
    ]
    w = vcf.VcfWriter(args.output, sorted_samples, extra_header_lines=header_lines)
    for v in out:
        w.write(v)
    w.close()
    print(f"wrote {len(out)} variants to {args.output}")
    return 0


@register_tool("CombineGVCFs")
def combine_gvcfs_tool(argv):
    """Combine per-sample GVCFs into a multi-sample GVCF."""
    p = argparse.ArgumentParser(description="CombineGVCFs")
    p.add_argument("-V", "--variant", action="append", required=True)
    p.add_argument("-R", "--reference", required=True)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("-L", "--intervals", action="append", default=None)
    args = p.parse_args(argv)

    from ..engine import intervals as ivx
    from ..gvcf import combine
    from ..io import fasta

    ref = fasta.FastaReference(args.reference)
    readers = [vcf.VcfReader(path) for path in args.variant]
    all_samples = [s for r in readers for s in r.samples]

    # group records per contig per input
    per_input = []
    contigs_seen = []
    for r in readers:
        by_contig = {}
        for v in r:
            by_contig.setdefault(v.contig, ([], []))
            by_contig[v.contig][0].append(v)
            by_contig[v.contig][1].append(v.samples[0] if v.samples else {})
        per_input.append(by_contig)
        for c in by_contig:
            if c not in contigs_seen:
                contigs_seen.append(c)

    out_all = []
    for contig in contigs_seen:
        # tolerate MT/chrM naming differences between gvcf and reference
        ref_contig = contig
        if ref_contig not in ref.contig_order:
            alias = {"MT": "chrM", "chrM": "MT"}.get(contig)
            if alias in ref.contig_order:
                ref_contig = alias
            else:
                raise UserError(f"contig {contig} not in reference")
        seq = ref.fetch(ref_contig, 0, ref.contig_length(ref_contig))
        seq_upper = bytes(seq).upper()

        streams = [bc.get(contig, ([], [])) for bc in per_input]
        interval = None
        if args.intervals:
            for s in args.intervals:
                t = ivx.parse_interval(s, {contig: len(seq_upper)})
                if t.contig == contig:
                    interval = (t.start, t.end)
        out_all.extend(combine.combine_gvcfs(
            streams, all_samples, lambda p0: seq_upper[p0], contig, interval=interval))

    header_lines = [
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">',
        '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="Minimum DP in block">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Phred-scaled genotype likelihoods">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="Stop position of the interval">',
        f'##ALT=<ID=NON_REF,Description="Represents any possible alternative allele">',
    ]
    w = vcf.VcfWriter(args.output, all_samples, extra_header_lines=header_lines)
    for v in out_all:
        w.write(v)
    w.close()
    print(f"wrote {len(out_all)} records to {args.output}")
    return 0
