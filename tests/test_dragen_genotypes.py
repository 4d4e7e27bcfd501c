"""DRAGEN BQD/FRD genotyping model tests
(GenotypeLikelihoodCalculatorDRAGEN.java + DRAGENGenotypesModel.java)."""
import numpy as np
import pytest

from gatk_tpu.calling import dragen_genotypes as dg
from gatk_tpu.calling import genotyper
from gatk_tpu.io.reads import Read


def test_mq_phred_interpolation():
    """DRAGENMappingQualityReadTransformer table: {0,30,60,100,200}->{0,30,40,45,50}."""
    assert dg.map_mq_to_phred(0) == 0.0
    assert dg.map_mq_to_phred(30) == 30.0
    assert dg.map_mq_to_phred(60) == 40.0
    assert dg.map_mq_to_phred(100) == 45.0
    assert dg.map_mq_to_phred(45) == pytest.approx(35.0)
    assert dg.map_mq_to_phred(20) == pytest.approx(20.0)


def test_homopolymer_adjustment():
    ref = np.frombuffer(b"ACGTTTTTACGT", np.uint8)
    # error base T at offset 8 (the A after the T-run): 4 Ts to the left, cap 4
    assert dg.forward_homopolymer_adjustment(ref, 8, ord("T")) == 20.0
    assert dg.forward_homopolymer_adjustment(ref, 8, ord("G")) == 0.0
    # reverse: T at offset 3 has 4 Ts to the right (offsets 4-7)
    assert dg.reverse_homopolymer_adjustment(ref, 3, ord("T")) == 20.0
    assert dg.reverse_homopolymer_adjustment(ref, 0, ord("C")) == 5.0


def _read(name, pos, n=20, mapq=60, reverse=False, quals=None):
    q = np.full(n, 30, np.uint8) if quals is None else np.asarray(quals, np.uint8)
    return Read(name=name, flag=0x10 if reverse else 0, ref_id=0, pos=pos,
                mapq=mapq, cigar_ops=np.array([0], np.uint8),
                cigar_lens=np.array([n], np.int32),
                bases=np.full(n, ord("A"), np.uint8), quals=q)


def _scenario(n_ref=10, n_alt=4, alt_bq=30, alt_mapq=60, loc=10, sep=-6.0,
              alt_at_read_end=False):
    """(lik matrix (2, n), reads): ref-supporting and alt-supporting reads.
    alt_at_read_end places the variant base on the last cycles of the alt reads
    (the BQD dropout signature)."""
    reads = []
    vals = []
    for i in range(n_ref):
        reads.append(_read(f"ref{i}", loc - 10, reverse=i % 2 == 1))
        vals.append([0.0, sep])
    for i in range(n_alt):
        if alt_at_read_end:
            # forward reads whose last base is the variant: high cycle count
            q = np.full(20, 30, np.uint8)
            q[-1] = alt_bq
            reads.append(_read(f"alt{i}", loc - 19, mapq=alt_mapq, quals=q))
        else:
            reads.append(_read(f"alt{i}", loc - 10, mapq=alt_mapq, reverse=i % 2 == 1))
        vals.append([sep, 0.0])
    lik = np.array(vals).T  # (2 alleles, n reads)
    return lik, reads


def test_bqd_rescues_base_quality_dropout():
    """Low-qual alt bases clustered at the ends of one strand's reads: the BQD
    hom-ref score must beat the standard model's hom-ref likelihood (the error
    tail is explained by dropout instead of a real allele)."""
    ref = np.full(200, ord("A"), np.uint8)
    ref[100] = ord("A")
    loc = 100
    lik, reads = _scenario(n_ref=10, n_alt=4, alt_bq=5, loc=loc,
                           alt_at_read_end=True)
    alleles = ["A", "C"]
    gl = genotyper.compute_genotype_likelihoods(lik, 2)
    fwd, rev = dg.build_containers(reads, loc)
    bqd = dg.calculate_bqd_likelihoods(2, lik, alleles, fwd, rev, ref, loc)
    gts = genotyper.genotype_allele_counts(2, 2)
    hom_ref = gts.index((0, 0))
    assert bqd[hom_ref] > gl[hom_ref] + 3  # dropout explains the alt tail
    # het/mixed genotypes are untouched by BQD
    assert np.isneginf(bqd[gts.index((0, 1))])
    merged = dg.apply_dragen_models(gl, lik, alleles, reads, loc, ref, 0,
                                    use_bqd=True, use_frd=False)
    assert np.all(merged >= gl - 1e-12)
    assert merged[hom_ref] == pytest.approx(bqd[hom_ref])


def test_bqd_does_not_rescue_good_alt_evidence():
    """High-quality alt reads on both strands at normal cycles: BQD must not
    materially beat the standard hom-ref likelihood (no free lunch)."""
    ref = np.full(200, ord("A"), np.uint8)
    loc = 100
    lik, reads = _scenario(n_ref=10, n_alt=8, alt_bq=35, loc=loc)
    alleles = ["A", "C"]
    gl = genotyper.compute_genotype_likelihoods(lik, 2)
    fwd, rev = dg.build_containers(reads, loc)
    bqd = dg.calculate_bqd_likelihoods(2, lik, alleles, fwd, rev, ref, loc)
    gts = genotyper.genotype_allele_counts(2, 2)
    het = gts.index((0, 1))
    # the het hypothesis must stay far better than the BQD hom-ref explanation
    assert gl[het] > bqd[gts.index((0, 0))] + 3


def test_frd_rescues_low_mapq_foreign_reads():
    """Alt support carried only by low-MQ reads: FRD's hom-ref score (foreign
    reads at the MQ-derived P(F)) must beat the standard hom-ref likelihood."""
    ref = np.full(200, ord("A"), np.uint8)
    loc = 100
    lik, reads = _scenario(n_ref=12, n_alt=4, alt_mapq=10, loc=loc)
    alleles = ["A", "C"]
    gl = genotyper.compute_genotype_likelihoods(lik, 2)
    fwd, rev = dg.build_containers(reads, loc)
    frd = dg.calculate_frd_likelihoods(2, lik, alleles, fwd + rev)
    gts = genotyper.genotype_allele_counts(2, 2)
    hom_ref = gts.index((0, 0))
    assert frd[hom_ref] > gl[hom_ref] + 3
    merged = dg.apply_dragen_models(gl, lik, alleles, reads, loc, ref, 0,
                                    use_bqd=False, use_frd=True)
    assert merged[hom_ref] == pytest.approx(frd[hom_ref])
    assert np.all(merged >= gl - 1e-12)


def test_frd_weaker_with_high_mapq_support():
    """With MQ60 alt reads the foreign-read prior is much smaller: the FRD
    hom-ref rescue must shrink versus the low-MQ case."""
    ref = np.full(200, ord("A"), np.uint8)
    loc = 100
    alleles = ["A", "C"]
    gts = genotyper.genotype_allele_counts(2, 2)
    hom_ref = gts.index((0, 0))
    scores = {}
    for mq in (10, 60):
        lik, reads = _scenario(n_ref=12, n_alt=4, alt_mapq=mq, loc=loc)
        fwd, rev = dg.build_containers(reads, loc)
        frd = dg.calculate_frd_likelihoods(2, lik, alleles, fwd + rev)
        scores[mq] = frd[hom_ref]
    assert scores[10] > scores[60] + 1


def test_hc_engine_merges_dragen_models():
    """assign_genotype_likelihoods(apply_bqd/apply_frd) flips an artifact-only
    het to hom-ref while a clean het stays het."""
    from gatk_tpu.assembly.haplotype import Haplotype, build_event_map
    from gatk_tpu.calling.genotyping_engine import assign_genotype_likelihoods
    from gatk_tpu.calling.likelihoods import AlleleLikelihoods

    ref_seq = "A" * 9 + "A" + "A" * 10
    alt_seq = "A" * 9 + "C" + "A" * 10
    ref_arr = np.frombuffer(ref_seq.encode(), np.uint8)

    def hap(bases, is_ref=False):
        h = Haplotype(bases=bases.encode(), is_ref=is_ref,
                      cigar_ops=np.array([0], np.uint8),
                      cigar_lens=np.array([len(bases)], np.int32),
                      alignment_start=0)
        build_event_map(h, ref_arr, 0)
        return h

    haps = [hap(ref_seq, True), hap(alt_seq)]
    # 12 clean ref reads + 5 low-MQ alt reads whose variant base is the final
    # low-quality cycle: both BQD and FRD explanations apply
    reads = []
    vals = []
    for i in range(12):
        reads.append(_read(f"r{i}", 0, n=20, reverse=i % 2 == 1))
        vals.append([0.0, -6.0])
    for i in range(5):
        q = np.full(20, 30, np.uint8)
        q[-1] = 4
        reads.append(_read(f"a{i}", 0, n=20, mapq=8, quals=q))
        vals.append([-6.0, 0.0])
    lik = AlleleLikelihoods(haps, reads, np.array(vals).T)
    plain = assign_genotype_likelihoods(
        haps, lik, ref_arr, 0, 0, 20, "chr1", "S")
    lik2 = AlleleLikelihoods(haps, reads, np.array(vals).T)
    dragen = assign_genotype_likelihoods(
        haps, lik2, ref_arr, 0, 0, 20, "chr1", "S",
        apply_bqd=True, apply_frd=True)
    # the artifact het is either dropped (hom-ref below emit threshold) or
    # demoted to a much lower QUAL than the plain model's call
    if plain and dragen:
        assert dragen[0].qual < plain[0].qual - 1
    else:
        assert plain and not dragen
