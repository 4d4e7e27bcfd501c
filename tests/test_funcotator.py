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


# ---------------------------------------------------------------------------
# Data-source factory framework (tools/funcotator/dataSources/)
# ---------------------------------------------------------------------------


def _variant(contig, pos1, ref, alts):
    from gatk_tpu.io.vcf import Variant

    return Variant(contig=contig, pos=pos1 - 1, ref=ref, alts=tuple(alts))


def test_locatable_xsv_factory():
    from gatk_tpu.funcotator import datasources as dsrc

    conf = dsrc.parse_config(f"{FD}/xsv_locatable_test.config")
    fac = dsrc.LocatableXsvFuncotationFactory(conf)
    assert fac.field_names == [
        "XSV_LOCATABLE_TEST_NAME_TEST_Villain",
        "XSV_LOCATABLE_TEST_NAME_TEST_test_val",
        "XSV_LOCATABLE_TEST_NAME_TEST_Bond",
    ]
    # inside the chr3 row span (178866310-178957882)
    out = fac.annotate(_variant("chr3", 178900000, "A", ["G"]), "G", None, None)
    assert out["XSV_LOCATABLE_TEST_NAME_TEST_Villain"] == "Largo"
    assert out["XSV_LOCATABLE_TEST_NAME_TEST_Bond"] == "Dalton"
    # outside any row
    out = fac.annotate(_variant("chr3", 1000, "A", ["G"]), "G", None, None)
    assert all(v == "" for v in out.values())


def test_vcf_funcotation_factory_allele_match():
    from gatk_tpu.funcotator import datasources as dsrc

    conf = dsrc.parse_config(
        f"{FD}/small_pik3ca_dbsnp_ds/dbsnp/hg19/dbsnp.config")
    fac = dsrc.VcfFuncotationFactory(conf)
    v = _variant("3", 178865910, "G", ["A"])
    out = fac.annotate(v, "A", None, None)
    assert out["dbSNP_snippetb150_ID"] == "rs565200234"
    assert out["dbSNP_snippetb150_COMMON"] == "1"
    # allele mismatch -> no annotation
    out = fac.annotate(_variant("3", 178865910, "G", ["C"]), "C", None, None)
    assert out["dbSNP_snippetb150_ID"] == ""


def test_simple_key_xsv_factory(tmp_path):
    import os

    from gatk_tpu.funcotator import datasources as dsrc

    src = tmp_path / "genes.tsv"
    src.write_text("gene\tscore\tfamily\nPIK3CA\t0.99\tkinase\nTP53\t0.87\ttumor_suppressor\n")
    conf = {"name": "GeneDB", "version": "v1", "src_file": "genes.tsv",
            "xsv_key": "GENE_NAME", "xsv_key_column": "0", "xsv_delimiter": "\\t",
            "xsv_permissive_cols": "false", "_dir": str(tmp_path)}
    fac = dsrc.SimpleKeyXsvFuncotationFactory(conf)
    assert fac.field_names == ["GeneDB_v1_score", "GeneDB_v1_family"]
    out = fac.annotate(_variant("3", 100, "A", ["G"]), "G", "PIK3CA", None)
    assert out == {"GeneDB_v1_score": "0.99", "GeneDB_v1_family": "kinase"}
    out = fac.annotate(_variant("3", 100, "A", ["G"]), "G", "NOPE", None)
    assert all(v == "" for v in out.values())


def test_cosmic_factory_sqlite(tmp_path):
    import sqlite3

    from gatk_tpu.funcotator import datasources as dsrc

    db = tmp_path / "cosmic.db"
    conn = sqlite3.connect(db)
    conn.execute('CREATE TABLE Cosmic ("Gene name" TEXT, "Mutation genome position" TEXT)')
    conn.executemany("INSERT INTO Cosmic VALUES (?, ?)", [
        ("PIK3CA", "3:178936082-178936082"),
        ("PIK3CA", "3:178936090-178936095"),
        ("PIK3CA", "3:178952085-178952085"),
        ("TP53", "17:7577000-7577000"),
    ])
    conn.commit()
    conn.close()
    conf = {"name": "Cosmic", "version": "v84", "src_file": "cosmic.db",
            "_dir": str(tmp_path)}
    fac = dsrc.CosmicFuncotationFactory(conf)
    out = fac.annotate(_variant("3", 178936090, "A", ["G"]), "G", "PIK3CA", None)
    assert out["Cosmic_v84_overlapping_mutations"] == "1"
    out = fac.annotate(_variant("3", 178936082, "A", ["G"]), "G", "PIK3CA", None)
    assert out["Cosmic_v84_overlapping_mutations"] == "1"
    out = fac.annotate(_variant("3", 178900000, "A", ["G"]), "G", "PIK3CA", None)
    assert out["Cosmic_v84_overlapping_mutations"] == "0"


def test_funcotator_cli_with_vcf_datasource(tmp_path):
    """End-to-end: gencode + dbsnp datasources in one tree; FUNCOTATION carries
    the dbSNP fields for a known PIK3CA site."""
    out = str(tmp_path / "annotated.vcf")
    inp = str(tmp_path / "in.vcf")
    with open(inp, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("3\t178865910\t.\tG\tA\t50\tPASS\t.\n")
    r = subprocess.run(
        [sys.executable, "-m", "gatk_tpu", "Funcotator", "-V", inp, "-O", out,
         "--data-sources-path", f"{FD}/small_pik3ca_dbsnp_ds",
         "--ref-version", "hg19"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    text = open(out).read()
    assert "FUNCOTATION=" in text
    assert "rs565200234" in text  # dbSNP VCF factory contributed its ID field
    header = [l for l in text.splitlines() if "ID=FUNCOTATION" in l][0]
    assert "dbSNP_snippetb150_ID" in header


# ---------------------------------------------------------------------------
# round-5 depth gates: the PIK3CA indel golden (57 ref/alt pairs spanning
# in-frame/frameshift del+ins, codon-boundary cases, splice-site windows,
# intronic c.eN+/-M notation) and MAF row-level comparison
# ---------------------------------------------------------------------------

_CLS_MAP = {"In_Frame_Del": "IN_FRAME_DEL", "In_Frame_Ins": "IN_FRAME_INS",
            "Frame_Shift_Del": "FRAME_SHIFT_DEL",
            "Frame_Shift_Ins": "FRAME_SHIFT_INS", "Splice_Site": "SPLICE_SITE",
            "Intron": "INTRON", "Silent": "SILENT",
            "Missense_Mutation": "MISSENSE", "Nonsense_Mutation": "NONSENSE"}


def test_pik3ca_indels_golden(pik3ca):
    """classification + transcript_change + codon_change must match the
    committed PIK3CA_INDELS golden exactly for every ref/alt pair; the
    protein_change column follows GATK's ProteinChangeInfo semantics, which
    agree with the (older oncotator-derived) golden on 34 of 57 rows — the
    reference's own oncotator comparison for indels is disabled
    (FuncotatorIntegrationTest.java:403-407)."""
    n = n_prot = 0
    for ln in open(f"{FD}/PIK3CA_INDELS.oncotatorAnnotated.vcf"):
        if ln.startswith("#"):
            continue
        f = ln.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        if "variant_classification" not in info:
            continue
        alts = f[4].split(",")
        ecls = info["variant_classification"].split(",")
        etc = info.get("transcript_change", "").split(",")
        ecc = info.get("codon_change", "").split(",")
        epc = info.get("protein_change", "").split(",")
        for i, alt in enumerate(alts):
            n += 1
            r = gc.classify("chr3", int(f[1]), f[3], alt, pik3ca)
            exp_cls = _CLS_MAP.get(ecls[i] if i < len(ecls) else ecls[0])
            assert r.classification == exp_cls, (f[1], f[3], alt, r)
            if i < len(etc):
                exp_tc = "" if etc[i] == "None" else etc[i]
                assert r.cdna_change == exp_tc, (f[1], alt, r.cdna_change, etc[i])
            if i < len(ecc):
                assert r.codon_change == ecc[i], (f[1], alt, r.codon_change, ecc[i])
            if i < len(epc) and r.protein_change == epc[i]:
                n_prot += 1
    assert n == 57
    assert n_prot >= 34


def test_funcotator_maf_rows_match_golden(tmp_path, pik3ca):
    """Funcotator CLI MAF output: per-row Variant_Classification / position /
    alleles match the oncotator-annotated PIK3CA SNP MAF."""
    out_maf = str(tmp_path / "out.maf")
    r = subprocess.run(
        [sys.executable, "-m", "gatk_tpu", "Funcotator",
         "-V", f"{FD}/PIK3CA_SNPS.vcf", "-O", out_maf,
         "--output-file-format", "MAF",
         "--data-sources-path", f"{FD}/small_pik3ca_dbsnp_ds",
         "--ref-version", "hg19"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    def load_maf(path):
        rows = {}
        header = None
        for ln in open(path):
            if ln.startswith("#"):
                continue
            fields = ln.rstrip("\n").split("\t")
            if header is None:
                header = fields
                continue
            d = dict(zip(header, fields))
            start = d.get("Start_position") or d.get("Start_Position")
            rows[(d["Chromosome"].lstrip("chr"), start,
                  d["Reference_Allele"])] = d
        return rows

    golden = load_maf(f"{FD}/PIK3CA_SNPS.oncotatorAnnotated.maf")
    got = load_maf(out_maf)
    n = 0
    for key, gd in golden.items():
        if key not in got:
            continue
        ours = got[key]
        assert ours["Variant_Classification"] == gd["Variant_Classification"], key
        assert ours["Variant_Type"] == gd["Variant_Type"], key
        assert ours["Tumor_Seq_Allele2"] == gd["Tumor_Seq_Allele2"], key
        n += 1
    assert n >= 10, f"only {n} MAF rows compared"


def test_intronic_splice_notation(pik3ca):
    """c.eN+/-M codon-change notation for intronic splice-site indels
    (FuncotatorUtils.createSpliceSiteCodonChange; golden rows 178948165+)."""
    r = gc.classify("chr3", 178948165, "GTGA", "G", pik3ca)
    assert r.classification == "SPLICE_SITE" and r.codon_change == "c.e20+2"
    r = gc.classify("chr3", 178948165, "G", "GT", pik3ca)
    assert r.classification == "SPLICE_SITE" and r.codon_change == "c.e20+1"
    r = gc.classify("chr3", 178948166, "T", "TT", pik3ca)
    assert r.classification == "SPLICE_SITE" and r.codon_change == "c.e20+2"


def test_de_novo_start_refinement(pik3ca):
    """5'UTR variants creating an upstream ATG become DE_NOVO_START_*
    (GencodeFuncotationFactory.createUtrFuncotation:1700-1755). PIK3CA
    exon 1 context 'GGAAGAG' (transcript pos 67-73): A>T at pos 70 makes
    A-T-G across the variant; the frame check against the 160-base
    (157 UTR + 3 trailing) region lands out of frame."""
    t = pik3ca.overlapping("chr3", 178866311, 178866311)[0]
    seq, g0 = t.sequence, 178866311

    def rf(contig, a, b):  # exon 1 is genomically contiguous with the transcript
        return seq[a - g0:b - g0 + 1]

    assert seq[66:73] == "GGAAGAG"
    gpos = g0 + 70 - 1  # transcript pos 70 ('A')
    f = gc.classify("chr3", gpos, "A", "T", pik3ca, ref_fetch=rf)
    assert f.classification == "DE_NOVO_START_OUT_FRAME"
    # hand frame check: hit index 1 -> x = 70 + (0-2+1) = 69; (160-69+1)%3 == 2
    # same variant without a reference stays 5'UTR
    f = gc.classify("chr3", gpos, "A", "T", pik3ca)
    assert f.classification == "FIVE_PRIME_UTR"
    # a non-ATG-creating neighbor stays 5'UTR even with the reference
    f = gc.classify("chr3", g0 + 30 - 1, seq[29], "T" if seq[29] != "T" else "C",
                    pik3ca, ref_fetch=rf)
    assert f.classification == "FIVE_PRIME_UTR"


def test_reference_severity_ordering():
    """_severity mirrors GencodeFuncotation.VariantClassification:777-849
    (lower reference number = more severe): MISSENSE outranks FRAME_SHIFT,
    DE_NOVO_START_OUT_FRAME ties NONSENSE, IGR is least severe."""
    sv = gc._severity
    assert sv("NONSENSE") == sv("NONSTOP") == sv("DE_NOVO_START_OUT_FRAME")
    assert sv("MISSENSE") > sv("FRAME_SHIFT_INS")
    assert sv("SPLICE_SITE") > sv("SILENT") > sv("FIVE_PRIME_UTR")
    assert sv("INTRON") > sv("FIVE_PRIME_FLANK") > sv("IGR")
    assert sv("COULD_NOT_DETERMINE") < sv("IGR")


def test_funcotator_indel_maf_conventions(tmp_path, pik3ca):
    """MAF indel conventions (MafOutputRenderer): anchor-trimmed alleles with
    '-' placeholders and the oncotator start/end positions — every one of the
    57 golden indel rows keys identically and matches on classification and
    variant type. (Protein_Change strings follow GATK-Funcotator conventions,
    which differ from the oncotator tool that produced this golden.)"""
    out_maf = str(tmp_path / "ind.maf")
    r = subprocess.run(
        [sys.executable, "-m", "gatk_tpu", "Funcotator",
         "-V", f"{FD}/PIK3CA_INDELS.vcf", "-O", out_maf,
         "--output-file-format", "MAF",
         "--data-sources-path", f"{FD}/small_pik3ca_dbsnp_ds",
         "--ref-version", "hg19"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    def load(path):
        rows, header = {}, None
        for ln in open(path):
            if ln.startswith("#"):
                continue
            f = ln.rstrip("\n").split("\t")
            if header is None:
                header = f
                continue
            d = dict(zip(header, f))
            start = d.get("Start_position") or d.get("Start_Position")
            rows[(d["Chromosome"].lstrip("chr"), start, d["Reference_Allele"],
                  d["Tumor_Seq_Allele2"])] = d
        return rows

    golden = load(f"{FD}/PIK3CA_INDELS.oncotatorAnnotated.maf")
    got = load(out_maf)
    assert len(golden) == 57
    for key, grow in golden.items():
        orow = got.get(key)
        assert orow is not None, f"missing MAF row {key}"
        for col in ("Variant_Classification", "Variant_Type"):
            assert grow[col] == orow[col], (key, col, grow[col], orow[col])
