"""I/O layer tests against real reference-bundled test files."""
import os

import numpy as np
import pytest

from gatk_tpu.io import bam, bgzf, fasta, sam, vcf
from gatk_tpu.utils.testdata import reference_path

MITO_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito")
MITO_BAM = os.path.join(MITO_DIR, "NA12878.bam")
MITO_FASTA = os.path.join(MITO_DIR, "Homo_sapiens_assembly38.mt_only.fasta")
MITO_VCF = os.path.join(MITO_DIR, "unfiltered.vcf")

needs_ref = pytest.mark.skipif(not os.path.exists(MITO_BAM), reason="reference data missing")


@needs_ref
def test_bam_read_header_and_records():
    r = bam.BamReader(MITO_BAM)
    assert r.header.sequences, "no sequences in header"
    names = [s.name for s in r.header.sequences]
    assert "chrM" in names
    reads = list(r)
    assert len(reads) > 1000
    rd = reads[0]
    assert len(rd.bases) == len(rd.quals)
    assert set(rd.bases.tobytes()) <= set(b"ACGTN")
    # cigar read length must equal seq length for mapped reads with cigars
    for rd in reads[:200]:
        if not rd.is_unmapped and len(rd.cigar_ops):
            assert sam.cigar_read_length(rd.cigar_ops, rd.cigar_lens) == len(rd.bases)


@needs_ref
def test_bam_roundtrip(tmp_path):
    r = bam.BamReader(MITO_BAM)
    reads = list(r)[:500]
    out = str(tmp_path / "rt.bam")
    w = bam.BamWriter(out, r.header)
    for rd in reads:
        w.write(rd)
    w.close()
    r2 = bam.BamReader(out)
    reads2 = list(r2)
    assert len(reads2) == len(reads)
    for a, b in zip(reads, reads2):
        assert a.name == b.name and a.flag == b.flag and a.pos == b.pos
        np.testing.assert_array_equal(a.bases, b.bases)
        np.testing.assert_array_equal(a.quals, b.quals)
        np.testing.assert_array_equal(a.cigar_ops, b.cigar_ops)
        assert a.tags.keys() == b.tags.keys()


@needs_ref
def test_fasta_fetch():
    f = fasta.FastaReference(MITO_FASTA)
    assert f.contig_length("chrM") == 16569
    seq = f.fetch("chrM", 0, 20)
    assert len(seq) == 20
    assert set(seq.tobytes()) <= set(b"ACGTN")
    # cross-check a slice against reads: most bases of a high-MAPQ read should match
    r = bam.BamReader(MITO_BAM)
    for rd in r:
        if rd.mapq >= 60 and len(rd.cigar_ops) == 1 and rd.cigar_ops[0] == sam.OP_M:
            ref_slice = f.fetch("chrM", rd.pos, rd.end)
            matches = np.mean(ref_slice == rd.bases)
            assert matches > 0.9
            break


@needs_ref
def test_vcf_reader():
    v = vcf.VcfReader(MITO_VCF)
    recs = list(v)
    assert len(recs) >= 5
    assert all(r.contig == "chrM" for r in recs)
    assert v.samples
    r0 = recs[0]
    assert r0.ref and r0.alts


def test_vcf_writer_roundtrip(tmp_path):
    out = str(tmp_path / "t.vcf")
    w = vcf.VcfWriter(out, ["s1"], contigs=[("chr1", 1000)])
    w.write(
        vcf.Variant(
            "chr1", 99, "A", ("T",), qual=51.27, filters=(),
            info={"DP": 10}, samples=[{"GT": "0/1", "DP": "10"}], fmt_keys=("GT", "DP"),
        )
    )
    w.close()
    r = vcf.VcfReader(out)
    recs = list(r)
    assert len(recs) == 1
    assert recs[0].pos == 99 and recs[0].ref == "A" and recs[0].alts == ("T",)
    assert recs[0].samples[0]["GT"] == "0/1"


def test_bgzf_roundtrip():
    payload = os.urandom(200000) + b"tail"
    comp = bgzf.compress_bytes(payload)
    assert bgzf.decompress_bytes(comp) == payload


def test_native_bgzf_codec_roundtrip():
    """Native multithreaded codec must be byte-compatible with the python path."""
    import os

    from gatk_tpu.io import bgzf as bz

    payload = bytes(range(256)) * 2000 + b"tail"
    native = bz._load_native()
    c = bz.compress_bytes(payload)
    assert bz.decompress_bytes(c) == payload
    # force the pure-python path and cross-check
    os.environ["GATK_TPU_NO_NATIVE"] = "1"
    bz._NATIVE = None
    try:
        assert bz.decompress_bytes(c) == payload
        c_py = bz.compress_bytes(payload)
    finally:
        del os.environ["GATK_TPU_NO_NATIVE"]
        bz._NATIVE = None
    assert bz.decompress_bytes(c_py) == payload
    if native:
        assert bz._load_native()  # native lib present in this checkout


def test_bai_indexed_query_matches_full_scan():
    """BAI-indexed BamReader.query touches only overlapping BGZF blocks and
    returns exactly the full-scan result (htsjdk BAMFileReader.query parity)."""
    from gatk_tpu.io import bam

    M = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"
    r = bam.BamReader(f"{M}/NA12878.bam")
    assert r.index is not None
    base = r._bgzf.blocks_read
    hits = list(r.query("chrM", 100, 200))
    used = r._bgzf.blocks_read - base
    # full scan on a separate reader with the index disabled
    r2 = bam.BamReader(f"{M}/NA12878.bam")
    r2._index_checked = True
    full = [x for x in r2.query("chrM", 100, 200)]
    assert sorted((x.name, x.flag) for x in hits) == sorted((x.name, x.flag) for x in full)
    # the file has ~500 BGZF blocks; a 100bp window must touch far fewer
    assert used < 200, used
    # reg2bins sanity: window bins include bin 0 and the 16kb leaf bin
    bins = bam.BaiIndex.reg2bins(100, 200)
    assert 0 in bins and 4681 in bins


def test_gatk_path_uris(tmp_path, monkeypatch):
    """GATKPath-equivalent URI handling (engine/GATKPath.java): file:// URIs
    unwrap, cloud URIs resolve through the offline mirror map or fail with an
    actionable UserError."""
    import pytest

    from gatk_tpu.io import gatk_path, vcf as vcfio
    from gatk_tpu.utils.errors import UserError

    p = tmp_path / "x.vcf"
    p.write_text("##fileformat=VCFv4.2\n"
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                 "chr1\t100\t.\tA\tG\t50\tPASS\t.\n")
    assert gatk_path.resolve(str(p)) == str(p)
    assert gatk_path.resolve(f"file://{p}") == str(p)
    assert len(list(vcfio.VcfReader(f"file://{p}"))) == 1

    gp = gatk_path.GATKPath("gs://bucket/dir/x.vcf")
    assert gp.scheme == "gs" and gp.is_cloud
    with pytest.raises(UserError, match="offline"):
        gatk_path.resolve(gp)
    monkeypatch.setenv("GATK_TPU_URI_MIRROR",
                       f"gs://bucket/dir=>{tmp_path}")
    assert gatk_path.resolve(gp) == str(p)
    assert len(list(vcfio.VcfReader("gs://bucket/dir/x.vcf"))) == 1
