"""CombineGVCFs / GenotypeGVCFs command line tools."""
from __future__ import annotations

import argparse

from ..cli import register_tool
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
