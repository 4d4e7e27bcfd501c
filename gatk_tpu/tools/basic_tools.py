"""Basic read/variant utility tools (CountReads, PrintReads, CountVariants,
SelectVariants-lite — engine walker tool equivalents)."""
from __future__ import annotations

from ..cli import register_tool, standard_io_parser
from ..engine import intervals as iv
from ..io import bam, vcf


@register_tool("CountReads")
def count_reads(argv):
    """Count reads in a BAM/SAM file (tools/CountReads.java equivalent)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-I", "--input", action="append", required=True)
    p.add_argument("-L", "--intervals", action="append", default=None)
    args = p.parse_args(argv)
    total = 0
    for path in args.input:
        r = bam.BamReader(path)
        if args.intervals:
            lengths = {s.name: s.length for s in r.header.sequences}
            for s in args.intervals:
                target = iv.parse_interval(s, lengths)
                total += sum(1 for _ in r.query(target.contig, target.start, target.end))
        else:
            total += sum(1 for _ in r)
    print(total)
    return 0


@register_tool("CountVariants")
def count_variants(argv):
    """Count variant records in a VCF."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-V", "--variant", required=True)
    args = p.parse_args(argv)
    print(sum(1 for _ in vcf.VcfReader(args.variant)))
    return 0


@register_tool("PrintReads")
def print_reads(argv):
    """Write reads (optionally subset by interval) to a new BAM."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-I", "--input", action="append", required=True)
    p.add_argument("-O", "--output", required=True)
    p.add_argument("-L", "--intervals", action="append", default=None)
    args = p.parse_args(argv)
    readers = [bam.BamReader(path) for path in args.input]
    w = bam.BamWriter(args.output, readers[0].header)
    n = 0
    for r in readers:
        if args.intervals:
            lengths = {s.name: s.length for s in r.header.sequences}
            for s in args.intervals:
                t = iv.parse_interval(s, lengths)
                for rd in r.query(t.contig, t.start, t.end):
                    w.write(rd)
                    n += 1
        else:
            for rd in r:
                w.write(rd)
                n += 1
    w.close()
    print(f"wrote {n} reads")
    return 0
