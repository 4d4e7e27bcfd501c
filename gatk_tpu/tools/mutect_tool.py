"""Mutect2 command line tool (tools/walkers/mutect/Mutect2.java equivalent)."""
from __future__ import annotations

import argparse

from ..cli import register_tool
from ..engine import intervals as iv
from ..io import bam, fasta, vcf
from ..mutect.engine import M2Args, Mutect2Engine


@register_tool("Mutect2")
def mutect2(argv):
    """Call somatic SNVs and indels via local assembly of haplotypes."""
    p = argparse.ArgumentParser(description="Mutect2")
    p.add_argument("-I", "--input", action="append", required=True)
    p.add_argument("-R", "--reference", required=True)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("-L", "--intervals", action="append", default=None)
    p.add_argument("--tumor-sample", default=None)
    p.add_argument("--normal-sample", action="append", default=[])
    p.add_argument("--mitochondria-mode", action="store_true")
    p.add_argument("--tumor-lod-to-emit", "--emit-lod", type=float, default=None)
    p.add_argument("--initial-tumor-lod", type=float, default=None)
    p.add_argument("--min-AF", "--minimum-allele-fraction", type=float, default=0.0)
    p.add_argument("--max-reads-per-alignment-start", type=int, default=50)
    p.add_argument("--f1r2-tar-gz", default=None,
                   help="collect F1R2 counts while calling (for LearnReadOrientationModel)")
    args = p.parse_args(argv)

    m2args = M2Args(
        mitochondria_mode=args.mitochondria_mode,
        min_af=args.min_AF,
        max_reads_per_alignment_start=args.max_reads_per_alignment_start,
    )
    if args.tumor_lod_to_emit is not None:
        m2args.emission_log10_odds = args.tumor_lod_to_emit
    if args.initial_tumor_lod is not None:
        m2args.initial_log10_odds = args.initial_tumor_lod

    ref = fasta.FastaReference(args.reference)
    reader = bam.BamReader(args.input[0])
    lengths = {s.name: s.length for s in reader.header.sequences}
    sample = args.tumor_sample
    if sample is None:
        for rg in reader.header.read_groups:
            if rg.get("SM"):
                sample = rg["SM"]
                break
        sample = sample or "SAMPLE"

    eng = Mutect2Engine(ref, tumor_sample=sample, normal_samples=args.normal_sample, args=m2args)

    if args.intervals:
        targets = [iv.parse_interval(s, lengths) for s in args.intervals]
    else:
        targets = [iv.Interval(s.name, 0, s.length) for s in reader.header.sequences]

    f1r2_counts = None
    if args.f1r2_tar_gz:
        from ..mutect import orientation as ob
        f1r2_counts = ob.F1R2Counts(sample)

    all_variants = []
    callable_sites = 0
    for t in targets:
        reads = list(reader.query(t.contig, max(0, t.start - 300), min(lengths[t.contig], t.end + 300)))
        all_variants.extend(eng.call_interval(reads, t))
        callable_sites += eng.count_callable_sites(reads, t)
        if f1r2_counts is not None:
            from ..mutect.engine import m2_read_filter
            ref_bytes = ref.fetch(t.contig, t.start, t.end)
            ob.collect_f1r2_counts([r for r in reads if m2_read_filter(r)],
                                   ref_bytes, t.start, f1r2_counts)

    if f1r2_counts is not None:
        from ..mutect import orientation as ob
        ob.write_f1r2_targz(f1r2_counts, args.f1r2_tar_gz)

    all_variants.sort(key=lambda v: (v.contig, v.pos))
    header_lines = [
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Approximate read depth">',
        '##INFO=<ID=TLOD,Number=A,Type=Float,Description="Log 10 likelihood ratio score of variant existing versus not existing">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">',
        '##FORMAT=<ID=AF,Number=A,Type=Float,Description="Allele fractions of alternate alleles">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Approximate read depth">',
        '##FORMAT=<ID=F1R2,Number=R,Type=Integer,Description="Count of reads in F1R2 pair orientation supporting each allele">',
        '##FORMAT=<ID=F2R1,Number=R,Type=Integer,Description="Count of reads in F2R1 pair orientation supporting each allele">',
        f"##tumor_sample={sample}",
    ]
    w = vcf.VcfWriter(args.output, [sample],
                      contigs=[(s.name, s.length) for s in reader.header.sequences],
                      extra_header_lines=header_lines)
    for v in all_variants:
        w.write(v)
    w.close()
    # stats sidecar (MutectStats.java format; consumed by FilterMutectCalls /
    # MergeMutectStats — cf. mutect/mito/unfiltered.vcf.stats golden)
    with open(args.output + ".stats", "w") as fh:
        fh.write("statistic\tvalue\n")
        fh.write(f"callable\t{callable_sites}\n")
    print(f"wrote {len(all_variants)} variants to {args.output}")
    return 0


@register_tool("FilterMutectCalls")
def filter_mutect_calls(argv):
    """Filter somatic SNVs and indels called by Mutect2."""
    import argparse as _ap

    from ..io import vcf as vcfio
    from ..mutect.filtering import FilterMutectCallsEngine

    p = _ap.ArgumentParser(description="FilterMutectCalls")
    p.add_argument("-V", "--variant", required=True)
    p.add_argument("-R", "--reference", default=None)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("--mitochondria-mode", action="store_true")
    p.add_argument("--min-median-base-quality", type=int, default=20)
    p.add_argument("--min-median-mapping-quality", type=int, default=-1)
    p.add_argument("--min-median-read-position", type=int, default=1)
    p.add_argument("--max-events-in-region", type=int, default=2)
    p.add_argument("--max-alt-allele-count", type=int, default=1)
    p.add_argument("--min-allele-fraction", type=float, default=0.0)
    p.add_argument("--orientation-bias-artifact-priors", "--ob-priors", action="append",
                   default=[], help="tar.gz of artifact priors from LearnReadOrientationModel")
    args = p.parse_args(argv)

    min_mmq = args.min_median_mapping_quality
    if min_mmq < 0:
        min_mmq = 20 if args.mitochondria_mode else 30

    orientation_priors = {}
    for path in args.orientation_bias_artifact_priors:
        from ..mutect.orientation import read_artifact_priors_targz
        orientation_priors.update(read_artifact_priors_targz(path))
    reference = None
    if orientation_priors:
        if args.reference is None:
            raise SystemExit("--ob-priors requires -R/--reference for context lookup")
        from ..io import fasta
        reference = fasta.FastaReference(args.reference)

    reader = vcfio.VcfReader(args.variant)
    variants = list(reader)
    eng = FilterMutectCallsEngine(
        min_mbq=args.min_median_base_quality, min_mmq=min_mmq,
        min_mpos=args.min_median_read_position, max_events=args.max_events_in_region,
        max_alt_alleles=args.max_alt_allele_count, min_af=args.min_allele_fraction,
        mitochondria_mode=args.mitochondria_mode,
        orientation_priors=orientation_priors, reference=reference,
    )
    eng.learn(variants)
    n_pass, n_filt = eng.apply(variants)

    filter_headers = [
        '##FILTER=<ID=PASS,Description="All filters passed">',
        '##FILTER=<ID=weak_evidence,Description="Mutation does not meet likelihood threshold">',
        '##FILTER=<ID=base_qual,Description="alt median base quality">',
        '##FILTER=<ID=map_qual,Description="ref - alt median mapping quality">',
        '##FILTER=<ID=position,Description="median distance of alt variants from end of reads">',
        '##FILTER=<ID=clustered_events,Description="Clustered events observed in the tumor">',
        '##FILTER=<ID=multiallelic,Description="Site filtered because too many alt alleles pass tumor LOD">',
        '##FILTER=<ID=low_allele_fraction,Description="Allele fraction is below specified threshold">',
        '##FILTER=<ID=strand_bias,Description="Evidence for alt allele comes from one read direction only">',
        '##FILTER=<ID=orientation,Description="orientation bias detected by the orientation bias mixture model">',
    ]
    w = vcfio.VcfWriter(args.output, reader.samples,
                        extra_header_lines=reader.header_lines + filter_headers)
    for v in variants:
        w.write(v)
    w.close()
    print(f"{n_pass} passing, {n_filt} filtered -> {args.output}")
    return 0


@register_tool("GetPileupSummaries")
def get_pileup_summaries(argv):
    """Tabulate pileup counts at common biallelic SNP sites."""
    import argparse as _ap

    import numpy as np

    from ..engine import pileup as pileup_mod
    from ..mutect.contamination import PileupSite, write_pileup_table

    p = _ap.ArgumentParser(description="GetPileupSummaries")
    p.add_argument("-I", "--input", required=True)
    p.add_argument("-V", "--variant", required=True, help="population VCF with AF")
    p.add_argument("-L", "--intervals", action="append", default=None)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("--minimum-population-allele-frequency", type=float, default=0.01)
    p.add_argument("--maximum-population-allele-frequency", type=float, default=0.2)
    args = p.parse_args(argv)

    from ..io import bam as bamio, vcf as vcfio

    reader = bamio.BamReader(args.input)
    sample = reader.header.read_groups[0].get("SM", "SAMPLE") if reader.header.read_groups else "SAMPLE"
    sites = []
    for v in vcfio.VcfReader(args.variant):
        if len(v.alts) != 1 or not v.is_snp():
            continue
        af = v.info.get("AF")
        if af is None:
            continue
        af = float(str(af).split(",")[0])
        if not (args.minimum_population_allele_frequency <= af <= args.maximum_population_allele_frequency):
            continue
        ref_b = ord(v.ref)
        alt_b = ord(v.alts[0])
        refs = alts = others = 0
        for r in reader.query(v.contig, v.pos, v.pos + 1):
            if r.is_unmapped or r.is_duplicate or r.is_secondary or r.mapq < 50:
                continue
            pos, base, qual, flags = pileup_mod.expand_read(r)
            here = pos == v.pos
            if not here.any():
                continue
            i = int(np.nonzero(here)[0][0])
            if flags[i] & pileup_mod.F_DELETION or qual[i] < 10:
                continue
            b = int(base[i])
            if b == ref_b:
                refs += 1
            elif b == alt_b:
                alts += 1
            else:
                others += 1
        sites.append(PileupSite(v.contig, v.pos + 1, refs, alts, others, af))
    write_pileup_table(args.output, sample, sites)
    print(f"wrote {len(sites)} pileup summaries")
    return 0


@register_tool("CalculateContamination")
def calculate_contamination_tool(argv):
    """Estimate cross-sample contamination from pileup summaries."""
    import argparse as _ap

    from ..mutect.contamination import calculate_contamination, read_pileup_table

    p = _ap.ArgumentParser(description="CalculateContamination")
    p.add_argument("-I", "--input", required=True)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("--matched-normal", default=None)
    args = p.parse_args(argv)

    sample, sites = read_pileup_table(args.input)
    c, se = calculate_contamination(sites)
    with open(args.output, "w") as fh:
        fh.write("sample\tcontamination\terror\n")
        fh.write(f"{sample}\t{c}\t{se}\n")
    print(f"{sample}: contamination {c:.4f} +/- {se:.4f}")
    return 0


@register_tool("CollectF1R2Counts")
def collect_f1r2_counts_tool(argv):
    """Collect F1R2 read counts for the read-orientation artifact model."""
    import argparse as _ap

    from ..engine import intervals as ivx
    from ..io import bam as bamio, fasta as fastaio
    from ..mutect import orientation as ob
    from ..mutect.engine import m2_read_filter

    p = _ap.ArgumentParser(description="CollectF1R2Counts")
    p.add_argument("-I", "--input", required=True)
    p.add_argument("-R", "--reference", required=True)
    p.add_argument("-O", "--output", required=True, help="output .tar.gz")
    p.add_argument("-L", "--intervals", action="append", default=None)
    p.add_argument("--f1r2-min-bq", type=int, default=20)
    p.add_argument("--f1r2-median-mq", type=int, default=50)
    p.add_argument("--f1r2-max-depth", type=int, default=ob.DEFAULT_MAX_DEPTH)
    args = p.parse_args(argv)

    ref = fastaio.FastaReference(args.reference)
    reader = bamio.BamReader(args.input)
    lengths = {s.name: s.length for s in reader.header.sequences}
    sample = "SAMPLE"
    for rg in reader.header.read_groups:
        if rg.get("SM"):
            sample = rg["SM"]
            break

    if args.intervals:
        targets = [ivx.parse_interval(s, lengths) for s in args.intervals]
    else:
        targets = [ivx.Interval(s.name, 0, s.length) for s in reader.header.sequences]

    counts = ob.F1R2Counts(sample, args.f1r2_max_depth)
    for t in targets:
        reads = [r for r in reader.query(t.contig, t.start, t.end) if m2_read_filter(r)]
        ref_bytes = ref.fetch(t.contig, t.start, t.end)
        ob.collect_f1r2_counts(reads, ref_bytes, t.start, counts,
                               min_bq=args.f1r2_min_bq, min_median_mq=args.f1r2_median_mq)
    ob.write_f1r2_targz(counts, args.output)
    print(f"collected F1R2 counts over {len(targets)} intervals -> {args.output}")
    return 0


@register_tool("LearnReadOrientationModel")
def learn_read_orientation_model_tool(argv):
    """Learn artifact-prior probabilities for the orientation bias mixture model."""
    import argparse as _ap

    from ..mutect import orientation as ob

    p = _ap.ArgumentParser(description="LearnReadOrientationModel")
    p.add_argument("-I", "--input", action="append", required=True,
                   help="one or more CollectF1R2Counts .tar.gz")
    p.add_argument("-O", "--output", required=True, help="output .tar.gz of priors")
    p.add_argument("--convergence-threshold", type=float, default=ob.DEFAULT_CONVERGENCE_THRESHOLD)
    p.add_argument("--num-em-iterations", type=int, default=ob.DEFAULT_MAX_EM_ITERATIONS)
    p.add_argument("--max-depth", type=int, default=ob.DEFAULT_MAX_DEPTH)
    args = p.parse_args(argv)

    merged = {}
    for path in args.input:
        for sample, counts in ob.read_f1r2_targz(path, args.max_depth).items():
            if sample in merged:
                merged[sample].add(counts)
            else:
                merged[sample] = counts

    collections = [ob.learn_artifact_priors(c, args.convergence_threshold,
                                            args.num_em_iterations)
                   for c in merged.values()]
    ob.write_artifact_priors_targz(collections, args.output)
    for coll in collections:
        print(f"{coll.sample}: learned priors for {coll.num_unique_contexts()} unique contexts")
    return 0
