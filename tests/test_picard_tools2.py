"""Round-5 Picard tranche part 2 (picard_tools2.py): functional tests on the
mito BAM + synthetic fixtures."""
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY

MITO = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
        "tools/mutect/mito")
BAM = f"{MITO}/NA12878.bam"
REF = f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta"

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="mito resources unavailable")


def run(tool, argv):
    rc = TOOL_REGISTRY[tool](argv)
    assert not rc


def test_sort_gff(tmp_path):
    gff = tmp_path / "in.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "chr2\t.\tgene\t500\t900\t.\t+\t.\tID=g2\n"
        "chr1\t.\tgene\t300\t400\t.\t+\t.\tID=g1\n"
        "chr1\t.\tgene\t100\t200\t.\t+\t.\tID=g0\n")
    out = tmp_path / "out.gff3"
    run("SortGff", ["-I", str(gff), "-O", str(out)])
    lines = [l for l in open(out) if not l.startswith("#")]
    ids = [l.split("ID=")[1].strip() for l in lines]
    # contig order of first appearance (chr2 first), start-sorted within
    assert ids == ["g2", "g0", "g1"]
    # with a dictionary, chr1 sorts first
    d = tmp_path / "ref.dict"
    d.write_text("@SQ\tSN:chr1\tLN:1000\n@SQ\tSN:chr2\tLN:1000\n")
    run("SortGff", ["-I", str(gff), "-O", str(out), "-SD", str(d)])
    ids = [l.split("ID=")[1].strip() for l in open(out) if not l.startswith("#")]
    assert ids == ["g0", "g1", "g2"]


def test_fifo_buffer():
    data = os.urandom(300000)
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "FifoBuffer",
                        "--IO_SIZE", "4096"], input=data,
                       capture_output=True, cwd="/root/repo")
    assert r.returncode == 0
    assert r.stdout == data


def test_accumulate_variant_calling_metrics(tmp_path):
    from gatk_tpu.tools.metrics_tools import write_metrics_file

    cols = ["TOTAL_SNPS", "NUM_IN_DB_SNP", "NOVEL_SNPS", "PCT_DBSNP"]
    for i, (tot, known) in enumerate([(10, 4), (30, 6)]):
        write_metrics_file(
            str(tmp_path / f"s{i}.variant_calling_summary_metrics"),
            "CollectVariantCallingMetrics",
            "picard.vcf.CollectVariantCallingMetrics$VariantCallingSummaryMetrics",
            cols, [[tot, known, tot - known, known / tot]])
    out = tmp_path / "merged"
    run("AccumulateVariantCallingMetrics",
        ["-I", str(tmp_path / "s0"), "-I", str(tmp_path / "s1"),
         "-O", str(out)])
    text = open(str(out) + ".variant_calling_summary_metrics").read()
    row = [l for l in text.splitlines() if l and l[0].isdigit()][0].split("\t")
    assert row[0] == "40" and row[1] == "10" and row[2] == "30"
    assert abs(float(row[3]) - 0.25) < 1e-9


def test_convert_sequencing_artifact_to_oxog(tmp_path):
    base = tmp_path / "art"
    run("CollectSequencingArtifactMetrics",
        ["-I", BAM, "-R", REF, "-O", str(base)])
    out = tmp_path / "oxog.txt"
    run("ConvertSequencingArtifactToOxoG",
        ["-I", str(base), "-O", str(out)])
    text = open(out).read()
    assert "CpcgMetrics" in text and "OXIDATION_Q" in text
    rows = [l for l in text.splitlines() if l and not l.startswith(("#", "CONTEXT"))]
    assert rows  # C>A and G>T classes present in real data


def test_collect_sam_error_metrics(tmp_path):
    out = tmp_path / "err"
    run("CollectSamErrorMetrics", ["-I", BAM, "-R", REF, "-O", str(out)])
    text = open(str(out) + ".error_summary_metrics").read()
    lines = {l.split("\t")[0]: l.split("\t") for l in text.splitlines()
             if l and not l.startswith(("#", "COVARIATE"))}
    assert "ALL" in lines and "REF_BASE:A" in lines
    n_all = int(lines["ALL"][1])
    # REF_BASE strata partition the ALL bases
    n_ref = sum(int(lines[f"REF_BASE:{b}"][1]) for b in "ACGT"
                if f"REF_BASE:{b}" in lines)
    assert n_all > 0 and abs(n_all - n_ref) <= n_all * 0.01
    # the mito BAM is high-quality: error rate well under 5%
    assert float(lines["ALL"][3]) < 0.05


def test_lift_over_haplotype_map(tmp_path):
    hm = tmp_path / "in.map"
    hm.write_text("@SQ\tSN:chrM\tLN:16569\n"
                  "#CHROM\tPOS\tNAME\n"
                  "chrM\t101\ts1\tA\tG\t0.3\n"
                  "chrM\t16400\ts2\tC\tT\t0.2\n")
    chain = tmp_path / "c.chain"
    chain.write_text(
        "chain 1 chrM 16569 + 0 16000 chr1 20000 + 1000 17000 1\n16000\n\n")
    out = tmp_path / "out.map"
    run("LiftOverHaplotypeMap",
        ["-I", str(hm), "-O", str(out), "-C", str(chain)])
    body = [l for l in open(out) if not l.startswith(("@", "#"))]
    assert len(body) == 1  # 16400 is outside the chain block -> dropped
    f = body[0].split("\t")
    assert f[0] == "chr1" and int(f[1]) == 1101


def test_bam_to_bfq(tmp_path):
    d = tmp_path / "bfq"
    run("BamToBfq", ["-I", BAM, "--ANALYSIS_DIR", str(d),
                     "--FLOWCELL_BARCODE", "fc", "--READS_TO_ALIGN", "50"])
    path = d / "fc.1.bfq"
    assert path.exists()
    with open(path, "rb") as fh:
        nlen = struct.unpack("<i", fh.read(4))[0]
        name = fh.read(nlen)
        assert name.endswith(b"\x00")
        slen = struct.unpack("<i", fh.read(4))[0]
        packed = np.frombuffer(fh.read(slen), np.uint8)
        assert len(packed) == slen
        # quals capped at 63, base codes in [0,3]
        assert (packed & 0x3F).max() <= 63 and (packed >> 6).max() <= 3


def test_collect_rrbs_metrics(tmp_path):
    out = tmp_path / "rrbs"
    run("CollectRrbsMetrics", ["-I", BAM, "-R", REF, "-O", str(out)])
    text = open(str(out) + ".rrbs_summary_metrics").read()
    row = [l for l in text.splitlines() if l and l[0].isdigit()][0].split("\t")
    reads, cpg_seen = int(row[0]), int(row[1])
    assert reads > 1000 and cpg_seen > 0
    # real (non-bisulfite) data: conversion rate is just the C>T error rate, tiny
    assert float(row[3]) < 0.05


def test_deprecation_and_suggestions(capsys):
    from gatk_tpu import cli

    msg = cli.unknown_command_message("IndelRealigner")
    assert "no longer included" in msg and "4.0.0.0" in msg
    msg = cli.unknown_command_message("HaplotypeCallr")
    assert "HaplotypeCaller" in msg
    msg = cli.unknown_command_message("Mutect")  # >=5-char substring match
    assert "Mutect2" in msg
    rc = cli.main(["IndelRealigner"])
    assert rc == 2


def test_generate_tool_wdl(tmp_path):
    out = tmp_path / "hc.wdl"
    run("GenerateToolWdl", ["--tool", "HaplotypeCaller", "-O", str(out)])
    text = open(out).read()
    assert text.startswith("version 1.0")
    assert "task HaplotypeCaller" in text
    assert "python -m gatk_tpu HaplotypeCaller" in text
    # required I/O args surface as typed inputs
    assert "File input" in text or "Array[File] input" in text
    assert "output" in text


def test_generate_shell_completion(tmp_path):
    out = tmp_path / "comp.bash"
    run("GenerateShellCompletion", ["-O", str(out)])
    text = open(out).read()
    assert "HaplotypeCaller" in text and "Mutect2" in text
    assert "complete -o default -F _gatk_tpu_complete" in text
    # the script is valid bash
    r = subprocess.run(["bash", "-n", str(out)], capture_output=True)
    assert r.returncode == 0


def test_fm_index_matches_naive_and_drives_aligner(tmp_path):
    """Native BWT/FM-index (align/fmindex.py): backward search equals naive
    string search; SMEM seeds place a mutated read correctly; SeedExtendAligner
    produces the same alignment through FM seeds as through kmer hashing."""
    import random

    from gatk_tpu.align import fmindex
    from gatk_tpu.align.fmindex import FMIndex
    from gatk_tpu.align.seed_extend import SeedExtendAligner

    if not fmindex.available():
        import pytest as _p

        _p.skip("libfm_native.so not built")
    rng = random.Random(5)
    text = bytes(rng.choice(b"ACGT") for _ in range(20000))
    fm = FMIndex.build([("c1", np.frombuffer(text, np.uint8))])
    for _ in range(50):
        m = rng.randint(10, 30)
        p = rng.randrange(len(text) - m)
        pat = text[p:p + m]
        naive = []
        st = 0
        while True:
            k = text.find(pat, st)
            if k < 0:
                break
            naive.append((0, k))
            st = k + 1
        n, hits = fm.search(np.frombuffer(pat, np.uint8), max_hits=200)
        assert n == len(naive) and sorted(hits) == sorted(naive)
    # save/load roundtrip (.fmi, the .img equivalent)
    path = tmp_path / "ref.fmi"
    fm.save(str(path))
    fm2 = FMIndex.load(str(path))
    assert fm2.search(np.frombuffer(text[500:540], np.uint8))[1] == [(0, 500)]

    # aligner equivalence: FM seeds vs kmer-hash seeds on mutated reads
    contigs = [("c1", np.frombuffer(text, np.uint8))]
    a_fm = SeedExtendAligner(contigs, use_fm=True)
    a_kmer = SeedExtendAligner(contigs, use_fm=False)
    assert a_fm.fm is not None and a_kmer.fm is None
    for _ in range(20):
        p = rng.randrange(len(text) - 150)
        read = bytearray(text[p:p + 150])
        for _m in range(3):
            i = rng.randrange(150)
            read[i] = rng.choice(b"ACGT")
        r1 = a_fm.align(np.frombuffer(bytes(read), np.uint8))
        r2 = a_kmer.align(np.frombuffer(bytes(read), np.uint8))
        assert r1 is not None and r1.pos == p and not r1.is_reverse
        assert r2 is None or r1.pos == r2.pos
