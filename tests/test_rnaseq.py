"""SplitNCigarReads + ASEReadCounter tests: byte-level golden vs the
reference's expected BAM, plus splitting/overhang semantics on synthetic data."""
import subprocess
import sys

import numpy as np

from conftest import reference_path
from gatk_tpu.io import bam, sam
from gatk_tpu.io.reads import Read
from gatk_tpu.tools.rnaseq_tools import (SplitNCigarEngine, cigar_str,
                                         refactor_ndn, soft_clip_by_read_coords)

T = reference_path("src/test/resources/org/broadinstitute/hellbender/tools")


def _dump(path):
    out = []
    for r in bam.BamReader(path):
        out.append((r.name, r.flag, r.pos + 1, r.mapq, cigar_str(r),
                    sorted(r.tags.items())))
    return out


def test_split_ncigar_golden_fixndn(tmp_path):
    out = str(tmp_path / "split.bam")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "SplitNCigarReads",
                        "-I", f"{T}/splitNCigarReadsSnippet.bam", "-O", out,
                        "--refactor-cigar-string", "--process-secondary-alignments"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert _dump(out) == _dump(f"{T}/expected.splitNCigarReadsSnippet.splitNcigarReads.fixNDN.bam")


def _mk_read(pos, cigar, bases, mapq=60, flag=0):
    ops, lens = [], []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            ops.append("MIDNSHP=X".index(ch))
            lens.append(int(num))
            num = ""
    return Read("r1", flag, 0, pos, mapq,
                np.array(ops, np.uint8), np.array(lens, np.int32),
                np.frombuffer(bases.encode(), np.uint8).copy(),
                np.full(len(bases), 30, np.uint8))


def test_refactor_ndn():
    r = _mk_read(0, "10M5N3D7N10M", "A" * 20)
    ops, lens = refactor_ndn(r.cigar_ops, r.cigar_lens)
    r.cigar_ops, r.cigar_lens = ops, lens
    assert cigar_str(r) == "10M15N10M"


def test_split_docstring_example():
    """'2M2D1M2N1M2I1N1M2S' splits into 3 reads (SplitNCigarReads.java :202;
    note the reference docstring's middle example '3S1M2I2S' drops a base —
    read length must be conserved, so the correct middle cigar is 3S1M2I3S)."""
    read = _mk_read(100, "2M2D1M2N1M2I1N1M2S", "ACGTACGTA")
    eng = SplitNCigarEngine(do_not_fix_overhangs=True)
    eng.process_read(read, "chr")
    fam = eng.families[0]
    assert [cigar_str(r) for r in fam] == ["2M2D1M6S", "3S1M2I3S", "6S1M2S"]
    # positions: section2 starts after 2M2D1M+2N = ref 100+5+2=107; section3 after +1M2I+1N
    assert [r.pos for r in fam] == [100, 107, 109]


def test_soft_clip_by_read_coords():
    read = _mk_read(100, "50M", "A" * 50)
    left = soft_clip_by_read_coords(read, 0, 9)
    assert cigar_str(left) == "10S40M" and left.pos == 110
    right = soft_clip_by_read_coords(read, 40, 49)
    assert cigar_str(right) == "40M10S" and right.pos == 100


class _FakeRef:
    def __init__(self, seq):
        self.seq = np.frombuffer(seq.encode(), np.uint8)

    def fetch(self, contig, start, end):
        return self.seq[start:end]


def test_overhang_clipping():
    """A read overhanging into an intron with mismatching bases gets soft-clipped."""
    ref = _FakeRef("A" * 300)
    eng = SplitNCigarEngine(reference=ref, max_mismatches_in_overhang=1)
    # spliced read defines the junction: 20M100N20M at pos 50 -> intron [70, 169]
    spliced = _mk_read(50, "20M100N20M", "A" * 40)
    eng.process_read(spliced, "chr")
    # overhanging read starts inside the intron and crosses its end with
    # mismatching bases (intron ref is all A, read is all T)
    overhang_read = _mk_read(160, "30M", "T" * 30)
    eng.process_read(overhang_read, "chr")
    fixed = eng._fix_family(eng.families[1])
    assert cigar_str(fixed[0]) == "10S20M"
    assert fixed[0].pos == 170
    # a matching overhang is left alone
    ok_read = _mk_read(160, "30M", "A" * 30)
    eng.process_read(ok_read, "chr")
    fixed2 = eng._fix_family(eng.families[2])
    assert cigar_str(fixed2[0]) == "30M"


def test_ase_read_counter(tmp_path):
    # BAM with 6 ref reads + 4 alt reads over a het site
    header = bam.BamReader(f"{T}/splitNCigarReadsSnippet.bam").header
    path = str(tmp_path / "ase.bam")
    w = bam.BamWriter(path, header)
    for i in range(10):
        base = "G" if i < 4 else "A"
        r = _mk_read(1000, "20M", "A" * 10 + base + "A" * 9)
        r.name = f"r{i}"
        w.write(r)
    w.close()
    vcf_path = str(tmp_path / "sites.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        fh.write("20\t1011\t.\tA\tG\t50\tPASS\t.\tGT\t0/1\n")
    out = str(tmp_path / "ase.tsv")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "ASEReadCounter",
                        "-I", path, "-V", vcf_path, "-O", out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = open(out).read().splitlines()
    f = lines[1].split("\t")
    assert f[:8] == ["20", "1011", ".", "A", "G", "6", "4", "10"]
