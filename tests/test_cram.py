"""CRAM reader tests against reference golden files.

Mirrors CRAMSupportIntegrationTest.testReadEntireCram (expected read names
from cram_with_*_index.cram over hg19mini) and asserts full record parity
between insert_size_metrics_test.cram (v3.0, rANS) and its BAM twin."""
import os

import pytest

from gatk_tpu.io import bam, fasta, sam
from gatk_tpu.io.cram import CramReader, open_reads, rans_uncompress

RES = "/root/reference/src/test/resources"
ENGINE = f"{RES}/org/broadinstitute/hellbender/engine"
ISM = f"{RES}/org/broadinstitute/hellbender/metrics/analysis/CollectInsertSizeMetrics"
BAM = f"{RES}/org/broadinstitute/hellbender/tools/mutect/mito/NA12878.bam"

pytestmark = pytest.mark.skipif(not os.path.isdir(ENGINE), reason="reference data missing")


@pytest.fixture(scope="module")
def hg19mini():
    return fasta.FastaReference(f"{RES}/hg19mini.fasta")


@pytest.fixture(scope="module")
def chr1_1m():
    return fasta.FastaReference(f"{RES}/Homo_sapiens_assembly19_chr1_1M.fasta")


def test_cram_v21_read_names(hg19mini):
    """CRAMSupportIntegrationTest.readEntireCramTestData: names a..k."""
    recs = list(CramReader(f"{ENGINE}/cram_with_crai_index.cram", reference=hg19mini))
    assert [r.name for r in recs] == list("abcdefghijk")
    mapped = [r for r in recs if not r.is_unmapped]
    assert all(r.bases.tobytes() and b"\x00" not in r.bases.tobytes() for r in recs)
    assert all(len(r.cigar_ops) > 0 for r in mapped)


def test_cram_v30_full_parity_with_bam(chr1_1m):
    """Every field of every record matches the BAM twin (incl. regenerated NM)."""
    crecs = list(CramReader(f"{ISM}/insert_size_metrics_test.cram", reference=chr1_1m))
    brecs = list(bam.BamReader(f"{ISM}/insert_size_metrics_test.bam"))
    assert len(crecs) == len(brecs) == 52
    for c, b in zip(crecs, brecs):
        for f in ("name", "flag", "ref_id", "pos", "mapq",
                  "mate_ref_id", "mate_pos", "tlen"):
            assert getattr(c, f) == getattr(b, f), (c.name, f)
        assert c.bases.tobytes() == b.bases.tobytes(), c.name
        assert c.quals.tobytes() == b.quals.tobytes(), c.name
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == \
            sam.cigar_to_string(b.cigar_ops, b.cigar_lens), c.name
        for k, v in b.tags.items():
            assert c.tags.get(k) == v, (c.name, k)


def test_cram_crai_query(hg19mini):
    reader = CramReader(f"{ENGINE}/cram_with_crai_index.cram", reference=hg19mini)
    contig = reader.header.sequences[0].name
    hits = list(reader.query(contig, 199, 210))
    assert {r.name for r in hits} >= {"a", "b", "c"}
    assert all(r.pos < 210 and r.end > 199 for r in hits)


def test_open_reads_dispatch(hg19mini):
    r = open_reads(f"{ENGINE}/cram_with_crai_index.cram", reference=hg19mini)
    assert isinstance(r, CramReader)
    mito = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
            "tools/mutect/mito/NA12878.bam")
    r2 = open_reads(mito)
    assert isinstance(r2, bam.BamReader)


def test_rans_roundtrip_order0_known():
    # decode a stream produced by the spec's reference implementation is covered
    # by the golden files; here sanity-check the empty stream contract
    assert rans_uncompress(b"") == b""


def test_cram_writer_roundtrip(tmp_path):
    """CRAM 3.0 writer round-trips the mito reads exactly (flags, cigars,
    bases, quals, mates, tags) through the CRAM reader without a reference
    (no-ref feature encoding, io/cram_writer.py)."""
    import itertools

    from gatk_tpu.io import bam
    from gatk_tpu.io.cram import CramReader
    from gatk_tpu.io.cram_writer import CramWriter

    reader = bam.BamReader(BAM)
    reads = list(itertools.islice(reader, 400))
    out = str(tmp_path / "rt.cram")
    w = CramWriter(out, reader.header)
    for r in reads:
        w.write(r)
    w.close()
    back = list(CramReader(out))
    assert len(back) == len(reads)
    for a, b in zip(reads, back):
        assert a.name == b.name and a.flag == b.flag
        assert a.ref_id == b.ref_id and a.pos == b.pos and a.mapq == b.mapq
        assert bytes(a.bases) == bytes(b.bases)
        assert bytes(a.quals) == bytes(b.quals)
        assert list(a.cigar_ops) == list(b.cigar_ops)
        assert list(a.cigar_lens) == list(b.cigar_lens)
        assert (a.mate_ref_id, a.mate_pos, a.tlen) == (b.mate_ref_id, b.mate_pos, b.tlen)
        assert {k: v for k, v in a.tags.items()} == {k: v for k, v in b.tags.items()}
    # header survives
    rd = CramReader(out)
    assert [s.name for s in rd.header.sequences] == \
        [s.name for s in reader.header.sequences]


def test_print_reads_writes_cram(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io.cram import CramReader

    out = str(tmp_path / "subset.cram")
    rc = TOOL_REGISTRY["PrintReads"](
        ["-I", BAM, "-O", out, "-L", "chrM:1-200"])
    assert rc == 0
    got = list(CramReader(out))
    assert got and all(r.pos < 200 or r.is_unmapped for r in got)
