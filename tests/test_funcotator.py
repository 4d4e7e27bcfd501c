"""Funcotator tests against the reference's bundled GENCODE datasources: the
PIK3CA SNP annotations must match the committed oncotator-annotated golden
(transcript, cDNA/codon/protein change), plus classification coverage checks."""
import subprocess
import sys

import pytest

from conftest import reference_path
from gatk_tpu.funcotator import gencode as gc

FD = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/funcotator")


@pytest.fixture(scope="module")
def pik3ca():
    return gc.GencodeDataSource.load(f"{FD}/small_pik3ca_dbsnp_ds")


@pytest.fixture(scope="module")
def cntn4():
    return gc.GencodeDataSource.load(f"{FD}/small_cntn4_ds")


def _golden_annotations():
    """{(pos, ref, alt): {key: value}} from the oncotator-annotated PIK3CA VCF."""
    out = {}
    with open(f"{FD}/PIK3CA_SNPS.oncotatorAnnotated.vcf") as fh:
        for ln in fh:
            if ln.startswith("#"):
                continue
            f = ln.split("\t")
            info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
            out[(int(f[1]), f[3], f[4])] = info
    return out


def test_pik3ca_snps_match_oncotator_golden(pik3ca):
    golden = _golden_annotations()
    n_checked = 0
    for (pos, ref, alt), info in golden.items():
        if "transcript_change" not in info or "annotation_transcript" not in info:
            continue
        f = gc.classify("chr3", pos, ref, alt, pik3ca)
        assert f.transcript_id == info["annotation_transcript"], (pos, f)
        assert f.cdna_change == info["transcript_change"], (pos, f)
        if "codon_change" in info:
            assert f.codon_change == info["codon_change"], (pos, f)
        if "HGVS_protein_change" in info:
            # golden format: ENSP00000263967:p.Pro2Ser -> ours: p.P2S
            long_aa = info["HGVS_protein_change"].split(":")[1]
            three_to_one = {
                "Ala": "A", "Arg": "R", "Asn": "N", "Asp": "D", "Cys": "C",
                "Gln": "Q", "Glu": "E", "Gly": "G", "His": "H", "Ile": "I",
                "Leu": "L", "Lys": "K", "Met": "M", "Phe": "F", "Pro": "P",
                "Ser": "S", "Thr": "T", "Trp": "W", "Tyr": "Y", "Val": "V",
                "Ter": "*"}
            short = long_aa
            for k, v in three_to_one.items():
                short = short.replace(k, v)
            if "=" not in short and "?" not in short:
                assert f.protein_change == short, (pos, f.protein_change, short)
        n_checked += 1
    assert n_checked >= 10


def test_classification_spectrum(cntn4):
    """Exercise intron/UTR/IGR/splice classifications on the CNTN4 transcript."""
    t = next(t for t in cntn4.transcripts.values() if t.sequence and t.strand == "+")
    exons = sorted(t.exons)
    # intronic: between first two exons, away from splice sites
    intron_pos = exons[0][1] + 50
    f = gc.classify(t.contig, intron_pos, "A", "G", cntn4)
    assert f.classification in ("INTRON", "RNA")
    # splice site: 1bp past an exon end
    f = gc.classify(t.contig, exons[0][1] + 1, "A", "G", cntn4)
    assert f.classification == "SPLICE_SITE"
    # IGR: far away from any transcript
    f = gc.classify(t.contig, 1_000, "A", "G", cntn4)
    assert f.classification in ("IGR", "FIVE_PRIME_FLANK")
    # frameshift inside CDS
    span = t.cds_span
    mid_exon = next((s + e) // 2 for s, e in exons if span[0] + 10 < (s + e) // 2 < span[1] - 10)
    f = gc.classify(t.contig, mid_exon, "AT", "A", cntn4)
    assert f.classification in ("FRAME_SHIFT_DEL", "SPLICE_SITE")


def test_funcotator_cli_vcf_and_maf(tmp_path, pik3ca):
    out_vcf = str(tmp_path / "out.vcf")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "Funcotator",
                        "-V", f"{FD}/PIK3CA_SNPS.vcf",
                        "--data-sources-path", f"{FD}/small_pik3ca_dbsnp_ds",
                        "--output-file-format", "VCF", "-O", out_vcf],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in open(out_vcf) if not ln.startswith("#")]
    assert lines and all("FUNCOTATION=[" in ln for ln in lines)

    out_maf = str(tmp_path / "out.maf")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "Funcotator",
                        "-V", f"{FD}/PIK3CA_SNPS.vcf",
                        "--data-sources-path", f"{FD}/small_pik3ca_dbsnp_ds",
                        "--output-file-format", "MAF", "-O", out_maf],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    maf_lines = open(out_maf).read().splitlines()
    assert maf_lines[1].startswith("Hugo_Symbol")
    assert any("PIK3CA" in ln and "Missense_Mutation" in ln for ln in maf_lines[2:])
