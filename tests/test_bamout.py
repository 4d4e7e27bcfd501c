"""bamout tests (HaplotypeBAMWriter / createReadAlignedToRef semantics)."""
import numpy as np

from gatk_tpu.assembly.haplotype import Haplotype
from gatk_tpu.calling.bamout import (
    ARTIFICIAL_HAPLOTYPE_RG, BamoutCollector, realign_read_to_haplotype)
from gatk_tpu.calling.likelihoods import AlleleLikelihoods
from gatk_tpu.io import sam as samio
from gatk_tpu.io.reads import Read


def _read(name, bases, pos, quals=30):
    arr = np.frombuffer(bases.encode(), np.uint8).copy()
    return Read(name=name, flag=0, ref_id=0, pos=pos, mapq=60,
                cigar_ops=np.array([0], np.uint8),
                cigar_lens=np.array([len(bases)], np.int32),
                bases=arr, quals=np.full(len(arr), quals, np.uint8))


def _hap(bases, ops, lens, start, is_ref=False):
    return Haplotype(bases=bases.encode(), is_ref=is_ref,
                     cigar_ops=np.array(ops, np.uint8),
                     cigar_lens=np.array(lens, np.int32),
                     alignment_start=start)


def test_realign_through_deletion_haplotype():
    """A read matching a deletion haplotype exactly gets the deletion in its
    composed read->ref cigar and the correct reference position."""
    ref = "AACCGGTTAACCGGTTAACC"
    # haplotype = ref with 2bp deleted at offset 8 (cigar 8M2D10M), aligned at 100
    hap_bases = ref[:8] + ref[10:]
    hap = _hap(hap_bases, [0, 2, 0], [8, 2, 10], 100)
    # read covers the junction: hap offset 4, length 10
    read = _read("r1", hap_bases[4:14], 0)
    out = realign_read_to_haplotype(read, hap, 0)
    assert out is not None
    assert out.pos == 104
    pairs = list(zip(out.cigar_ops.tolist(), out.cigar_lens.tolist()))
    assert pairs == [(0, 4), (2, 2), (0, 6)]  # 4M2D6M


def test_realign_match_haplotype_position():
    ref = "AACCGGTTAACCGGTTAACC"
    hap = _hap(ref, [0], [len(ref)], 500, is_ref=True)
    read = _read("r1", ref[5:15], 0)
    out = realign_read_to_haplotype(read, hap, 0)
    assert out is not None and out.pos == 505
    assert list(out.cigar_ops) == [0] and list(out.cigar_lens) == [10]


def test_bamout_collector_roundtrip(tmp_path):
    """Haplotypes + realigned reads round-trip through a real BAM file with the
    artificial haplotype read group and HC tags."""
    ref = "AACCGGTTAACCGGTTAACC"
    ref_hap = _hap(ref, [0], [len(ref)], 100, is_ref=True)
    alt = ref[:9] + "T" + ref[10:]
    alt_hap = _hap(alt, [0], [len(alt)], 100)
    reads = [_read(f"r{i}", (alt if i % 2 else ref)[2:18], 102) for i in range(4)]
    values = np.zeros((2, 4))
    values[0, 1::2] = -5.0  # odd reads prefer alt
    values[1, 0::2] = -5.0  # even reads prefer ref
    lik = AlleleLikelihoods([ref_hap, alt_hap], reads, values)
    coll = BamoutCollector({"chr1": 0})
    coll.add_region("chr1", [ref_hap, alt_hap], lik)
    assert len(coll.records) == 6  # 2 haplotypes + 4 reads
    out = tmp_path / "bamout.bam"
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 1000, 0)])
    coll.write(str(out), header)
    from gatk_tpu.io import bam as bamio
    back = list(bamio.BamReader(str(out)))
    assert len(back) == 6
    hap_recs = [r for r in back if r.tags.get("RG") == ARTIFICIAL_HAPLOTYPE_RG]
    assert len(hap_recs) == 2
    assert all("HC" in r.tags for r in hap_recs)
    read_recs = [r for r in back if r.tags.get("RG") != ARTIFICIAL_HAPLOTYPE_RG]
    assert all("HC" in r.tags for r in read_recs)  # all informative here
    # coordinate-sorted
    assert [r.pos for r in back] == sorted(r.pos for r in back)
