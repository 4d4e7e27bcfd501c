"""Smoke tests for the Picard-style utility tool batch."""
import os
import subprocess
import sys

from conftest import reference_path

MITO = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito")


def _run(tool, args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", tool] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, f"{tool}: {r.stderr}"
    return r


def test_sam_to_fastq_round_trip(tmp_path):
    fq = str(tmp_path / "reads.fastq")
    _run("SamToFastq", ["-I", f"{MITO}/NA12878.bam", "-F", fq])
    lines = open(fq).read().splitlines()
    assert len(lines) % 4 == 0 and len(lines) > 1000
    assert lines[0].startswith("@") and lines[2] == "+"

    bam = str(tmp_path / "unmapped.bam")
    _run("FastqToSam", ["-F1", fq, "-O", bam, "-SM", "sampleX"])
    from gatk_tpu.io import bam as bamio

    reader = bamio.BamReader(bam)
    assert reader.header.read_groups[0]["SM"] == "sampleX"
    reads = list(reader)
    assert len(reads) == len(lines) // 4
    assert all(r.is_unmapped for r in reads[:10])


def test_add_or_replace_read_groups(tmp_path):
    out = str(tmp_path / "rg.bam")
    _run("AddOrReplaceReadGroups", ["-I", f"{MITO}/NA12878.bam", "-O", out,
                                    "-ID", "rg1", "-LB", "lib1", "-PL", "ILLUMINA",
                                    "-PU", "unit1", "-SM", "newsample"])
    from gatk_tpu.io import bam as bamio

    reader = bamio.BamReader(out)
    assert reader.header.read_groups == [{"ID": "rg1", "LB": "lib1", "PL": "ILLUMINA",
                                          "PU": "unit1", "SM": "newsample"}]
    r = next(iter(reader))
    assert r.tags["RG"] == "rg1"


def test_bed_to_interval_list_and_interval_tools(tmp_path):
    bed = str(tmp_path / "t.bed")
    with open(bed, "w") as fh:
        fh.write("chrM\t99\t200\tregion1\t0\t+\nchrM\t299\t400\n")
    sd = str(tmp_path / "t.dict")
    with open(sd, "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n")
    il = str(tmp_path / "t.interval_list")
    _run("BedToIntervalList", ["-I", bed, "-SD", sd, "-O", il])
    body = [ln for ln in open(il) if not ln.startswith("@")]
    assert body[0].split("\t")[:3] == ["chrM", "100", "200"]

    il2 = str(tmp_path / "b.interval_list")
    with open(il2, "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\nchrM\t150\t350\t+\t.\n")
    out = str(tmp_path / "isect.interval_list")
    _run("IntervalListTools", ["-I", il, "-SI", il2, "--action", "INTERSECT", "-O", out])
    rows = [ln.split("\t") for ln in open(out) if not ln.startswith("@")]
    assert [(r[0], r[1], r[2]) for r in rows] == [("chrM", "150", "200"), ("chrM", "300", "350")]

    sub = str(tmp_path / "sub.interval_list")
    _run("IntervalListTools", ["-I", il, "-SI", il2, "--action", "SUBTRACT", "-O", sub])
    rows = [ln.split("\t") for ln in open(sub) if not ln.startswith("@")]
    assert [(r[0], r[1], r[2]) for r in rows] == [("chrM", "100", "149"), ("chrM", "351", "400")]


def test_collect_wgs_metrics(tmp_path):
    out = str(tmp_path / "wgs.txt")
    _run("CollectWgsMetrics", ["-I", f"{MITO}/NA12878.bam", "-O", out])
    text = open(out).read()
    assert "MEAN_COVERAGE" in text and "GENOME_TERRITORY" in text
    row = text.splitlines()[text.splitlines().index(
        next(l for l in text.splitlines() if l.startswith("GENOME_TERRITORY"))) + 1]
    assert int(row.split("\t")[0]) == 16569


def test_vcf_utilities(tmp_path):
    vcf_path = str(tmp_path / "in.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\told_name\n")
        fh.write("chrM\t100\t.\tA\tG\t50\tPASS\t.\tGT\t0/1\n")
        fh.write("chrM\t200\t.\tAT\tA\t50\tPASS\t.\tGT\t0/1\n")
    renamed = str(tmp_path / "renamed.vcf")
    _run("RenameSampleInVcf", ["-I", vcf_path, "-O", renamed,
                               "--new-sample-name", "new_name"])
    assert "new_name" in open(renamed).read().splitlines()[-3]

    snp = str(tmp_path / "snp.vcf")
    indel = str(tmp_path / "indel.vcf")
    _run("SplitVcfs", ["-I", vcf_path, "--snp-output", snp, "--indel-output", indel])
    assert sum(1 for l in open(snp) if not l.startswith("#")) == 1
    assert sum(1 for l in open(indel) if not l.startswith("#")) == 1

    sd = str(tmp_path / "t.dict")
    with open(sd, "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n")
    updated = str(tmp_path / "upd.vcf")
    _run("UpdateVCFSequenceDictionary", ["-V", vcf_path, "--source-dictionary", sd,
                                         "-O", updated])
    assert "##contig=<ID=chrM,length=16569>" in open(updated).read()
