"""FilterAlignmentArtifacts (realignmentfilter/FilterAlignmentArtifacts.java)."""
import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY
from gatk_tpu.io import bam as bamio, sam as samio, vcf
from gatk_tpu.io.reads import Read
from gatk_tpu.tools.realignment_tools import build_unitigs, supports_variant
from gatk_tpu.io.vcf import Variant


def _read(name, pos, seq, cigar=None, quals=None, ref_id=0):
    b = np.frombuffer(seq.encode(), np.uint8).copy()
    ops = cigar or [(0, len(b))]
    return Read(name=name, flag=0, ref_id=ref_id, pos=pos, mapq=60,
                cigar_ops=np.array([o for o, _ in ops], np.uint8),
                cigar_lens=np.array([l for _, l in ops], np.int32),
                bases=b, quals=np.full(len(b), 30, np.uint8))


def test_supports_variant_snp_and_indel():
    v = Variant("chr1", 105, "A", ("G",))
    assert supports_variant(_read("r", 100, "CCCCCGCCCC"), v)
    assert not supports_variant(_read("r", 100, "CCCCCACCCC"), v)
    # insertion support: read with I near the site
    vi = Variant("chr1", 105, "A", ("ATT",))
    r = _read("ri", 100, "CCCCCATTCCCC", cigar=[(0, 6), (1, 2), (0, 4)])
    assert supports_variant(r, vi)


def test_build_unitigs_consensus():
    rng = np.random.default_rng(1)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads = [_read(f"r{i}", 100 + 5 * i, seq[5 * i : 5 * i + 40]) for i in range(4)]
    unitigs = build_unitigs(reads)
    assert len(unitigs) == 1
    assert unitigs[0].decode() == seq[:55]


@pytest.fixture()
def dup_ref(tmp_path):
    """Two contigs sharing a 300bp near-identical segment (segmental dup)."""
    rng = np.random.default_rng(7)
    seg = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    uniq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    uniq2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    seg2 = list(seg)
    seg2[150] = "G" if seg[150] != "G" else "C"  # the "variant" base matches chr2
    c1 = uniq1 + seg
    c2 = uniq2 + "".join(seg2)
    fa = tmp_path / "dup.fa"
    fa.write_text(f">chr1\n{c1}\n>chr2\n{c2}\n")
    return str(fa), c1, c2, 200 + 150, seg2[150]


def test_filter_alignment_artifacts_tool(tmp_path, dup_ref):
    fa_path, c1, c2, var_pos, alt_base = dup_ref
    # reads drawn from chr2's copy of the segment but aligned to chr1 ->
    # apparent SNP at var_pos that realigns perfectly to chr2
    bam_path = str(tmp_path / "in.bam")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", len(c1), 0),
                                        samio.SequenceRecord("chr2", len(c2), 1)])
    w = bamio.BamWriter(bam_path, header)
    reads = []
    for i in range(8):
        start = var_pos - 60 + 6 * i
        seq = c2[start - 200 + 200 : start + 80]  # chr2 bases at chr1 coordinates
        reads.append(_read(f"r{i}", start, seq))
    for r in sorted(reads, key=lambda r: r.pos):
        w.write(r)
    w.close()

    vcf_path = str(tmp_path / "in.vcf")
    with open(vcf_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write('##contig=<ID=chr1>\n##contig=<ID=chr2>\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"chr1\t{var_pos + 1}\t.\t{c1[var_pos]}\t{alt_base}\t100\tPASS\t.\n")

    out = str(tmp_path / "out.vcf")
    rc = TOOL_REGISTRY["FilterAlignmentArtifacts"](
        ["-V", vcf_path, "-I", bam_path, "-R", fa_path, "-O", out])
    assert rc == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(recs) == 1
    assert "alignment_artifact" in recs[0][6]
    info = recs[0][7]
    assert "UNITIGS=" in info and "JOINT_ALIGNMENTS=" in info
