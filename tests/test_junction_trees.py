"""Junction-tree linked de Bruijn tests (JunctionTreeKBestHaplotypeFinder
semantics: long-range phasing beyond the kmer size)."""
import numpy as np

from gatk_tpu.assembly.assembler import assemble
from gatk_tpu.assembly.junction_trees import (find_k_best_jt,
                                              generate_junction_trees)
from gatk_tpu.assembly.rtgraph import ReadThreadingGraph
from gatk_tpu.io.reads import Read


def _mk_read(name, seq):
    arr = np.frombuffer(seq.encode(), np.uint8).copy()
    return Read(name=name, flag=0, ref_id=0, pos=0, mapq=60,
                cigar_ops=np.array([0], np.uint8), cigar_lens=np.array([len(arr)], np.int32),
                bases=arr, quals=np.full(len(arr), 35, np.uint8))


def _phasing_setup(k=10):
    """ref with two SNP sites separated by more than the kmer size; reads only
    support the cis combinations (ALT-ALT and REF-REF)."""
    rng = np.random.default_rng(11)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
    i1, i2 = 25, 55  # separated by 30 > k
    alt = list(ref)
    alt[i1] = {"A": "C", "C": "A", "G": "T", "T": "G"}[ref[i1]]
    alt[i2] = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref[i2]]
    alt = "".join(alt)
    return ref, alt


def test_junction_trees_record_read_paths():
    ref, alt = _phasing_setup()
    g = ReadThreadingGraph(10, 10)
    g.add_sequence("ref", ref.encode(), 0, len(ref), 1, True)
    for i in range(8):
        src = alt if i % 2 else ref
        g.add_read(f"r{i}", np.frombuffer(src.encode(), np.uint8),
                   np.full(len(src), 35, np.uint8))
    g.build()
    trees = generate_junction_trees(g, g.retained_sequences)
    assert trees, "branching graph must produce junction trees"
    total_evidence = sum(t.count for t in trees.values())
    assert total_evidence >= 8


def test_junction_trees_phase_distant_sites():
    """Classic k-best proposes all 4 hap combinations; junction-tree evidence
    ranks the two read-supported cis haplotypes on top."""
    ref, alt = _phasing_setup()
    g = ReadThreadingGraph(10, 10)
    g.add_sequence("ref", ref.encode(), 0, len(ref), 1, True)
    for i in range(12):
        src = alt if i % 2 else ref
        g.add_read(f"r{i}", np.frombuffer(src.encode(), np.uint8),
                   np.full(len(src), 35, np.uint8))
    g.build()
    trees = generate_junction_trees(g, g.retained_sequences)
    paths = find_k_best_jt(g, trees, max_paths=8)
    assert paths
    haps = [bases.decode() for bases, _score, _wk in paths]
    assert ref in haps and alt in haps
    # the two phased haplotypes outrank any recombinant (mixed) combination
    top2 = set(haps[:2])
    assert top2 == {ref, alt}, haps[:3]


def test_assemble_with_junction_trees():
    ref, alt = _phasing_setup()
    reads = []
    for i in range(16):
        src = alt if i % 2 else ref
        start = (i * 2) % 20
        reads.append(_mk_read(f"r{i}", src[start:start + 60]))
    ref_arr = np.frombuffer(ref.encode(), np.uint8)
    res = assemble(reads, ref_arr, 0, use_junction_trees=True)
    haps = {h.bases.decode() for h in res.haplotypes}
    assert ref in haps and alt in haps
