"""PathSeq tests: kmer library, host subtraction, DUST, taxonomic scoring."""
import numpy as np

from gatk_tpu.cli import TOOL_REGISTRY
from gatk_tpu.io import bam as bamio, sam as samio
from gatk_tpu.io.reads import Read
from gatk_tpu.tools.pathseq_tools import _canonical_kmers, dust_mask


def test_canonical_kmers_revcomp_invariant():
    seq = np.frombuffer(b"ACGTTGCAACGTACGGTCAG", np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    rc = np.array([comp[b] for b in seq[::-1]], np.uint8)
    k1 = set(_canonical_kmers(seq, 11).tolist())
    k2 = set(_canonical_kmers(rc, 11).tolist())
    assert k1 == k2 and len(k1) > 0
    # N bases break windows
    seq_n = seq.copy()
    seq_n[5] = ord("N")
    assert len(_canonical_kmers(seq_n, 11)) < len(_canonical_kmers(seq, 11))


def test_dust_mask_low_complexity():
    rng = np.random.default_rng(0)
    complex_part = rng.choice([65, 67, 71, 84], 64).astype(np.uint8)
    low_part = np.full(64, ord("A"), np.uint8)  # homopolymer: DUST score ~31
    bases = np.concatenate([complex_part, low_part])
    quals = np.full(len(bases), 30, np.uint8)
    out = dust_mask(bases, quals)
    assert (out[:64] == 30).all()          # complex window untouched
    assert (out[64:] == 2).all()           # homopolymer masked


def _write_bam(path, reads, contigs=(("host", 1000), ("microbe1", 5000), ("microbe2", 800))):
    header = samio.SamHeader(sequences=[samio.SequenceRecord(n, l, i)
                                        for i, (n, l) in enumerate(contigs)])
    w = bamio.BamWriter(str(path), header)
    for r in reads:
        w.write(r)
    w.close()


def _read(name, bases, ref_id=-1, pos=-1, flag=4):
    arr = np.frombuffer(bases.encode(), np.uint8).copy()
    ops = np.array([0], np.uint8) if flag & 4 == 0 else np.zeros(0, np.uint8)
    lens = np.array([len(arr)], np.int32) if flag & 4 == 0 else np.zeros(0, np.int32)
    return Read(name=name, flag=flag, ref_id=ref_id, pos=pos, mapq=60,
                cigar_ops=ops, cigar_lens=lens, bases=arr,
                quals=np.full(len(arr), 30, np.uint8))


def test_pathseq_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    host_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    microbe_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    host_fa = tmp_path / "host.fasta"
    host_fa.write_text(f">host\n{host_seq}\n")
    with open(str(host_fa) + ".fai", "w") as fh:
        fh.write(f"host\t{len(host_seq)}\t6\t{len(host_seq)}\t{len(host_seq)+1}\n")

    lib = tmp_path / "host.npz"
    TOOL_REGISTRY["PathSeqBuildKmers"](["-R", str(host_fa), "-O", str(lib)])

    # input: 2 host-derived read pairs + 2 microbe-derived pairs
    reads = []
    for i in range(2):
        for mate in range(2):
            reads.append(_read(f"host{i}", host_seq[i * 40:i * 40 + 60]))
    for i in range(2):
        for mate in range(2):
            reads.append(_read(f"mic{i}", microbe_seq[i * 40:i * 40 + 60]))
    in_bam = tmp_path / "in.bam"
    _write_bam(in_bam, reads)
    out_bam = tmp_path / "filtered.bam"
    TOOL_REGISTRY["PathSeqFilter"]([
        "-I", str(in_bam), "--paired-output", str(out_bam),
        "--kmer-file", str(lib)])
    kept = list(bamio.BamReader(str(out_bam)))
    names = {r.name for r in kept}
    assert names == {"mic0", "mic1"}, names

    # scoring: aligned microbe reads -> taxon abundance with tree propagation
    tax = tmp_path / "tax.tsv"
    tax.write_text(
        "1\t1\troot\troot\t0\t\n"
        "10\t1\tgenus\tExamplea\t0\t\n"
        "101\t10\tspecies\tExamplea one\t5000\tmicrobe1\n"
        "102\t10\tspecies\tExamplea two\t800\tmicrobe2\n")
    aligned = []
    for i in range(3):
        aligned.append(_read(f"t{i}", microbe_seq[:60], ref_id=1, pos=10, flag=0))
    aligned.append(_read("t3", microbe_seq[:60], ref_id=2, pos=10, flag=0))
    aln_bam = tmp_path / "aligned.bam"
    _write_bam(aln_bam, aligned)
    scores = tmp_path / "scores.tsv"
    TOOL_REGISTRY["PathSeqScore"]([
        "--paired-input", str(aln_bam), "--taxonomy-file", str(tax),
        "--scores-output", str(scores)])
    rows = {int(r[0]): r for r in
            (l.split("\t") for l in scores.read_text().splitlines()[1:])}
    assert float(rows[101][3]) == 3.0     # species-level score
    assert float(rows[102][3]) == 1.0
    assert float(rows[10][3]) == 4.0      # genus accumulates both species
    assert float(rows[1][3]) == 4.0       # root
    assert abs(float(rows[101][4]) - 75.0) < 1e-6  # normalized percent
    assert int(rows[101][6]) == 3          # unambiguous


def test_seed_extend_aligner_synthetic():
    """Seed-and-extend aligner: reads sampled from a synthetic microbe genome
    (with SNPs, an insertion, and reverse-complement) map back to their true
    positions; random reads stay unmapped."""
    import numpy as np

    from gatk_tpu.align.seed_extend import SeedExtendAligner, revcomp

    rng = np.random.default_rng(11)
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    g1 = rng.choice(bases4, 5000)
    g2 = rng.choice(bases4, 3000)
    aligner = SeedExtendAligner([("microbe1", g1), ("microbe2", g2)])

    # exact read from g1
    a = aligner.align(g1[1000:1100])
    assert a is not None and a.contig_index == 0 and a.pos == 1000
    assert not a.is_reverse and a.nm == 0

    # read with 3 SNPs from g2
    read = g2[500:600].copy()
    for i in (10, 50, 90):
        read[i] = bases4[(np.searchsorted(bases4, read[i]) + 1) % 4]
    a = aligner.align(read)
    assert a is not None and a.contig_index == 1 and a.pos == 500
    assert a.nm == 3

    # reverse-complement read
    a = aligner.align(revcomp(g1[2000:2120]))
    assert a is not None and a.contig_index == 0 and a.pos == 2000
    assert a.is_reverse

    # read with a 4bp insertion
    read = np.concatenate([g1[3000:3050], rng.choice(bases4, 4), g1[3050:3100]])
    a = aligner.align(read)
    assert a is not None and a.contig_index == 0 and a.pos == 3000
    assert 1 in a.cigar_ops.tolist()  # insertion op present

    # random garbage does not map
    assert aligner.align(rng.choice(bases4, 100)) is None or False


def test_pathseq_align_tool(tmp_path):
    import numpy as np

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(3)
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases4, 4000)
    fa = str(tmp_path / "microbe.fasta")
    with open(fa, "w") as fh:
        fh.write(">m1\n" + genome.tobytes().decode() + "\n")
    with open(fa + ".fai", "w") as fh:
        fh.write("m1\t4000\t4\t4000\t4001\n")

    header = samio.SamHeader(sequences=[samio.SequenceRecord("u", 1, 0)])
    inp = str(tmp_path / "filtered.bam")
    w = bamio.BamWriter(inp, header)
    for i, start in enumerate((100, 700, 1500)):
        seq = genome[start:start + 120]
        w.write(Read(name=f"m{i}", flag=4, ref_id=-1, pos=-1, mapq=0,
                     cigar_ops=np.zeros(0, np.uint8), cigar_lens=np.zeros(0, np.int32),
                     bases=seq.copy(), quals=np.full(120, 30, np.uint8)))
    w.write(Read(name="junk", flag=4, ref_id=-1, pos=-1, mapq=0,
                 cigar_ops=np.zeros(0, np.uint8), cigar_lens=np.zeros(0, np.int32),
                 bases=rng.choice(bases4, 120), quals=np.full(120, 30, np.uint8)))
    w.close()

    out = str(tmp_path / "aligned.bam")
    assert TOOL_REGISTRY["PathSeqAlign"](
        ["-I", inp, "-O", out, "--microbe-fasta", fa]) == 0
    got = {r.name: r for r in bamio.BamReader(out)}
    assert got["m0"].pos == 100 and not got["m0"].is_unmapped
    assert got["m1"].pos == 700 and got["m2"].pos == 1500
    assert got["m0"].tags["NM"] == 0
    assert got["junk"].is_unmapped
