"""Walker framework tests (engine/walkers.py: GATKTool lifecycle + traversals)."""
import numpy as np
import pytest

from gatk_tpu.engine.walkers import (GATKTool, IntervalWalker, LocusWalker,
                                     ReadWalker, VariantWalker)
from gatk_tpu.io import bam as bamio, sam as samio
from gatk_tpu.io.reads import Read

MITO = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"


def _bam(tmp_path, reads):
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 100000, 0)])
    path = tmp_path / "w.bam"
    w = bamio.BamWriter(str(path), header)
    for r in reads:
        w.write(r)
    w.close()
    return str(path)


def _read(name, pos, mapq=60, n=50):
    return Read(name=name, flag=0, ref_id=0, pos=pos, mapq=mapq,
                cigar_ops=np.array([0], np.uint8), cigar_lens=np.array([n], np.int32),
                bases=np.full(n, ord("C"), np.uint8), quals=np.full(n, 30, np.uint8))


def test_read_walker_lifecycle_and_filters(tmp_path):
    path = _bam(tmp_path, [_read("a", 100), _read("b", 200), _read("low", 300, mapq=5)])
    events = []

    class W(ReadWalker):
        tool_name = "TestWalker"

        def on_traversal_start(self):
            events.append("start")

        def apply(self, read, ctx):
            events.append(read.name)

        def on_traversal_success(self):
            events.append("success")
            return len([e for e in events if e not in ("start", "success")])

    n = W(reads_path=path).run()
    assert events[0] == "start" and events[-1] == "success"
    assert n == 2  # mapq-5 read rejected by the default MQ filter
    # per-filter rejection counted
    w2 = W(reads_path=path)
    w2.run()
    assert w2.filter_stack.counts["MappingQualityReadFilter"] == 1


def test_locus_walker_pileup_depth(tmp_path):
    path = _bam(tmp_path, [_read("a", 100), _read("b", 120)])
    depths = {}

    class W(LocusWalker):
        def apply(self, contig, pos, bases, quals, mapqs):
            depths[pos] = len(bases)

    W(reads_path=path, intervals=["chr1:101-160"]).run()
    assert depths[100] == 1
    assert depths[125] == 2  # overlap of both reads
    assert depths[155] == 1
    assert 99 not in depths


def test_interval_and_variant_walkers(tmp_path):
    class IW(IntervalWalker):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.seen = []

        def apply(self, interval):
            self.seen.append((interval.contig, interval.start, interval.end))

    path = _bam(tmp_path, [_read("a", 100)])
    iw = IW(reads_path=path, intervals=["chr1:1-500", "chr1:600-700"])
    iw.run()
    assert iw.seen == [("chr1", 0, 500), ("chr1", 599, 700)]

    vcf_path = tmp_path / "v.vcf"
    vcf_path.write_text("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                        "chr1\t10\t.\tA\tC\t.\t.\t.\n"
                        "chr1\t900\t.\tG\tT\t.\t.\t.\n")

    class VW(VariantWalker):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.seen = []

        def apply(self, v):
            self.seen.append(v.pos)

    vw = VW(variant_path=str(vcf_path))
    vw.run()
    assert vw.seen == [9, 899]


def test_pileup_tool_on_mito(tmp_path):
    import os

    if not os.path.exists(f"{MITO}/NA12878.bam"):
        pytest.skip("reference data missing")
    from gatk_tpu.cli import TOOL_REGISTRY

    out = tmp_path / "pileup.txt"
    TOOL_REGISTRY["Pileup"]([
        "-I", f"{MITO}/NA12878.bam", "-R", f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta",
        "-L", "chrM:150-155", "-O", str(out)])
    lines = [l.split() for l in out.read_text().splitlines()]
    assert len(lines) == 6
    by_pos = {int(l[1]): l for l in lines}
    assert by_pos[152][2] == "T"             # rCRS ref base
    assert int(by_pos[152][3]) > 1000        # deep mito coverage
    # NA12878 is ~homoplasmic 152T>C: pileup bases mostly C
    bases = by_pos[152][4]
    assert bases.count("C") > 0.9 * len(bases)


def _vcf(tmp_path, name, rows):
    p = tmp_path / name
    with open(p, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("##contig=<ID=chr1,length=100000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, alt in rows:
            fh.write(f"chr1\t{pos}\t.\t{ref}\t{alt}\t50\tPASS\t.\n")
    return str(p)


def test_two_pass_variant_walker(tmp_path):
    path = _vcf(tmp_path, "a.vcf", [(100, "A", "G"), (200, "C", "T"), (300, "G", "A")])
    from gatk_tpu.engine.walkers import TwoPassVariantWalker

    seen = {"first": [], "second": [], "between": 0}

    class W(TwoPassVariantWalker):
        def first_pass_apply(self, v):
            seen["first"].append(v.pos)

        def after_first_pass(self):
            seen["between"] = len(seen["first"])

        def second_pass_apply(self, v):
            seen["second"].append(v.pos)

    W(variant_path=path).run()
    assert seen["first"] == seen["second"] == [99, 199, 299]
    assert seen["between"] == 3


def test_multi_variant_walker_sorted_union(tmp_path):
    a = _vcf(tmp_path, "a.vcf", [(100, "A", "G"), (300, "G", "A")])
    b = _vcf(tmp_path, "b.vcf", [(200, "C", "T"), (400, "T", "C")])
    from gatk_tpu.engine.walkers import MultiVariantWalker

    order = []

    class W(MultiVariantWalker):
        def apply(self, v, si):
            order.append((v.pos, si))

    W(variant_path=[a, b]).run()
    assert order == [(99, 0), (199, 1), (299, 0), (399, 1)]


def test_feature_walker_bed_and_vcf(tmp_path):
    bed = tmp_path / "f.bed"
    bed.write_text("chr1\t10\t20\nchr1\t50\t70\n")
    from gatk_tpu.engine.walkers import FeatureWalker

    got = []

    class W(FeatureWalker):
        def apply(self, f):
            got.append((f.start, f.end))

    W(feature_path=str(bed)).run()
    assert got == [(10, 20), (50, 70)]

    vcf = _vcf(tmp_path, "f.vcf", [(5, "A", "T")])
    got2 = []

    class W2(FeatureWalker):
        def apply(self, f):
            got2.append(f.pos)

    W2(feature_path=vcf).run()
    assert got2 == [4]


def test_reference_walker_windows():
    from gatk_tpu.engine.walkers import ReferenceWalker

    MITO_FA = MITO + "/Homo_sapiens_assembly38.mt_only.fasta"
    windows = []

    class W(ReferenceWalker):
        window_size = 4000

        def apply(self, ctx):
            windows.append((ctx.start, ctx.end, len(ctx.bases())))

    W(reference_path=MITO_FA, intervals=["chrM:1-10000"]).run()
    assert windows == [(0, 4000, 4000), (4000, 8000, 4000), (8000, 10000, 2000)]


def test_read_walker_with_transformer(tmp_path):
    from gatk_tpu.utils.errors import UserError as UE

    r = _read("q/1", 100)
    path = _bam(tmp_path, [r])
    names = []

    class W(ReadWalker):
        def apply(self, read, ctx):
            names.append(read.name)

    W(reads_path=path, read_transformers=["StripMateNumberTransformer"]).run()
    assert names == ["q"]
    with pytest.raises(UE):
        W(reads_path=path, read_transformers=["NoSuchTransformer"])
