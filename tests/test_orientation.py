"""Read-orientation artifact model tests.

Mirrors the reference's LearnReadOrientationModelEngineUnitTest scenarios
(testSimpleCase at :96-131, revcomp merging at :300-325) plus round trips of
the tar.gz formats and the ReadOrientationFilter posterior.
"""
import numpy as np
import pytest

from gatk_tpu.io.reads import Read
from gatk_tpu.mutect import orientation as ob


def test_canonical_kmers():
    assert len(ob.ALL_KMERS) == 64
    assert len(ob.CANONICAL_KMERS) == 32
    for k in ob.CANONICAL_KMERS:
        assert k <= ob.reverse_complement(k)


def test_em_simple_case():
    """80 hom-ref sites + 20 all-F1R2 C->T artifact sites under ACT (mirrors
    LearnReadOrientationModelEngineUnitTest.testSimpleCase)."""
    max_depth = ob.DEFAULT_MAX_DEPTH
    ref_hist = np.zeros(max_depth)
    ref_hist[59] = 80  # depth 60
    alt_hist = np.zeros((4, 2, max_depth))
    # 20 records: refCount=50, altCount=10, altF1R2=10 (all F1R2), alt=T
    alt_rows = np.array([[3, 10, 10, 60]] * 20)

    prior = ob.learn_context("ACT", ref_hist, alt_hist, alt_rows, max_depth)
    pi = prior.pi
    assert pi[ob.STATE_INDEX["F1R2_T"]] == pytest.approx(20 / 100, abs=1e-2)
    assert pi[ob.STATE_INDEX["HOM_REF"]] == pytest.approx(80 / 100, abs=1e-2)
    assert pi.sum() == pytest.approx(1.0, abs=1e-9)
    # ref->ref artifacts impossible
    assert pi[ob.STATE_INDEX["F1R2_C"]] == 0.0
    assert pi[ob.STATE_INDEX["F2R1_C"]] == 0.0
    assert prior.num_examples == 100 and prior.num_alt_examples == 20


def test_em_distinguishes_somatic_het_from_artifact():
    """Balanced-orientation alt sites should load SOMATIC_HET, not artifacts."""
    rng = np.random.default_rng(42)
    max_depth = ob.DEFAULT_MAX_DEPTH
    ref_hist = np.zeros(max_depth)
    depths = rng.binomial(max_depth, 0.5, size=10_000)
    np.add.at(ref_hist, np.clip(depths, 1, max_depth) - 1, 1)

    rows = []
    for _ in range(100):
        n = int(rng.binomial(max_depth, 0.5))
        m = max(int(rng.binomial(n, 0.25)), 2)
        rows.append([3, m, m // 2, n])  # alt T, balanced F1R2
    prior = ob.learn_context("ACT", ref_hist, np.zeros((4, 2, max_depth)),
                             np.array(rows), max_depth)
    assert prior.pi[ob.STATE_INDEX["SOMATIC_HET"]] > 5 * prior.pi[ob.STATE_INDEX["F1R2_T"]]


def test_revcomp_merge_and_collection():
    """Counts under AGT (revcomp of ACT) fold into the canonical ACT context
    with complemented alts and flipped orientation."""
    counts = ob.F1R2Counts("s1", ob.DEFAULT_MAX_DEPTH)
    act = ob.KMER_INDEX["ACT"]
    agt = ob.KMER_INDEX["AGT"]
    counts.ref_hist[act, 59] = 40
    counts.ref_hist[agt, 59] = 40
    # ACT C->T all-F1R2 artifact == AGT G->A all-F2R1 artifact
    for _ in range(10):
        counts.alt_rows.append((act, 3, 50, 10, 25, 10))  # alt T, altF1R2=10
        counts.alt_rows.append((agt, 0, 50, 10, 25, 0))   # alt A, altF1R2=0 (all F2R1)

    coll = ob.learn_artifact_priors(counts)
    p_act = coll.get("ACT")
    p_agt = coll.get("AGT")
    assert p_act.num_examples == 100 and p_act.num_alt_examples == 20
    assert p_act.pi[ob.STATE_INDEX["F1R2_T"]] == pytest.approx(0.2, abs=2e-2)
    # revcomp entry mirrors: F1R2_T(ACT) == F2R1_A(AGT)
    assert p_agt.pi[ob.STATE_INDEX["F2R1_A"]] == pytest.approx(
        p_act.pi[ob.STATE_INDEX["F1R2_T"]], abs=1e-12)
    assert coll.num_unique_contexts() == 1


def _mk_read(pos, bases, flag=0x1 | 0x40, mapq=60, qual=35):
    n = len(bases)
    return Read("r%d" % np.random.randint(1 << 30), flag, 0, pos, mapq,
                np.array([0], np.uint8), np.array([n], np.int32),
                np.frombuffer(bases.encode(), np.uint8).copy(),
                np.full(n, qual, np.uint8))


def test_collect_f1r2_counts_synthetic():
    """Plant an all-F1R2 artifact at one locus of a uniform-ref pileup."""
    ref = b"AAACTAAAAA"  # context at position 3 (0-based) = ACT, ref base C
    counts = ob.F1R2Counts("s1", 200)
    reads = []
    # 30 F1R2 reads (forward, first-of-pair): 10 carry C->T at offset 3
    for i in range(30):
        bases = "AAATAAAAAA" if i < 10 else "AAACAAAAAA"
        reads.append(_mk_read(0, bases, flag=0x1 | 0x40))       # fwd read1 = F1R2
    # 30 F2R1 reads (forward, second-of-pair), all ref
    for i in range(30):
        reads.append(_mk_read(0, "AAACAAAAAA", flag=0x1 | 0x80))  # fwd read2 = F2R1

    ob.collect_f1r2_counts(reads, ref, 0, counts)

    act = ob.KMER_INDEX["ACT"]
    # the artifact site: alt_count=10 > 1 -> one design-matrix row
    rows = [r for r in counts.alt_rows if r[0] == act]
    assert rows == [(act, 3, 50, 10, 20, 10)]  # alt T, ref 50 (20 F1R2), alt 10 all F1R2
    # other covered loci with A ref and full depth are ref sites at depth 60
    aaa = ob.KMER_INDEX["AAA"]
    assert counts.ref_hist[aaa, 59] > 0
    # no depth-1 alt histogram entries
    assert counts.alt_hist.sum() == 0


def test_f1r2_targz_round_trip(tmp_path):
    counts = ob.F1R2Counts("sample A", 200)
    counts.ref_hist[ob.KMER_INDEX["ACT"], 59] = 80
    counts.alt_hist[ob.KMER_INDEX["ACT"], 3, ob.F1R2, 10] = 5
    counts.alt_rows.append((ob.KMER_INDEX["ACT"], 3, 50, 10, 25, 10))
    path = str(tmp_path / "f1r2.tar.gz")
    ob.write_f1r2_targz(counts, path)

    back = ob.read_f1r2_targz(path)
    assert set(back) == {"sample A"}
    c2 = back["sample A"]
    np.testing.assert_array_equal(c2.ref_hist, counts.ref_hist)
    np.testing.assert_array_equal(c2.alt_hist, counts.alt_hist)
    assert c2.alt_rows == counts.alt_rows


def test_priors_targz_round_trip(tmp_path):
    coll = ob.ArtifactPriorCollection("s1")
    pi = ob.flat_prior(1)
    pi[ob.STATE_INDEX["F1R2_T"]] = 0.3
    pi /= pi.sum()
    coll.set(ob.ArtifactPrior("ACT", pi, 100, 20))
    path = str(tmp_path / "priors.tar.gz")
    ob.write_artifact_priors_targz([coll], path)

    back = ob.read_artifact_priors_targz(path)
    p = back["s1"].get("ACT")
    np.testing.assert_allclose(p.pi, pi, atol=1e-15)
    assert p.num_examples == 100 and p.num_alt_examples == 20
    # revcomp context was persisted too
    p_rc = back["s1"].get("AGT")
    assert p_rc.pi[ob.STATE_INDEX["F2R1_A"]] == pytest.approx(
        pi[ob.STATE_INDEX["F1R2_T"]], abs=1e-12)


def test_orientation_filter_posterior():
    """All-F1R2 alt evidence under a learned F1R2_T-heavy prior -> artifact;
    balanced orientations -> not an artifact."""
    coll = ob.ArtifactPriorCollection("s1")
    pi = ob.flat_prior(1) * 0.0
    pi[ob.STATE_INDEX["HOM_REF"]] = 0.8
    pi[ob.STATE_INDEX["F1R2_T"]] = 0.15
    pi[ob.STATE_INDEX["SOMATIC_HET"]] = 0.05
    coll.set(ob.ArtifactPrior("ACT", pi, 1000, 150))

    # 20 alt reads all F1R2, 40 ref balanced
    p_art = ob.orientation_artifact_probability(
        coll, "ACT", "T", f1r2=[20, 20], f2r1=[20, 0], alt_index=0)
    assert p_art > 0.9
    # balanced alt reads
    p_bal = ob.orientation_artifact_probability(
        coll, "ACT", "T", f1r2=[20, 10], f2r1=[20, 10], alt_index=0)
    assert p_bal < 0.5
    # revcomp context consultation works (F2R1_A heavy under AGT)
    p_rc = ob.orientation_artifact_probability(
        coll, "AGT", "A", f1r2=[20, 0], f2r1=[20, 20], alt_index=0)
    assert p_rc > 0.9
