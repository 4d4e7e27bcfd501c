"""VariantEval + FilterVariantTranches tests on synthetic callsets."""
import subprocess
import sys

import numpy as np


def _run(tool, args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", tool] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr


def _write_vcf(path, rows, info_lines=()):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        for ln in info_lines:
            fh.write(ln + "\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def test_variant_eval_counts(tmp_path):
    ev = str(tmp_path / "eval.vcf")
    db = str(tmp_path / "dbsnp.vcf")
    # 3 SNPs (2 Ti, 1 Tv), 1 insertion, 1 deletion, 1 filtered
    _write_vcf(ev, [
        ("20", 100, ".", "A", "G", 50, "PASS", "."),     # Ti, known
        ("20", 200, ".", "C", "T", 50, "PASS", "."),     # Ti, novel
        ("20", 300, ".", "A", "C", 50, "PASS", "."),     # Tv, known (diff alt -> novel!)
        ("20", 400, ".", "A", "AT", 50, "PASS", "."),    # insertion
        ("20", 500, ".", "AT", "A", 50, "PASS", "."),    # deletion
        ("20", 600, ".", "G", "A", 50, "lowqual", "."),  # filtered
    ])
    _write_vcf(db, [
        ("20", 100, ".", "A", "G", 50, "PASS", "."),
        ("20", 300, ".", "A", "T", 50, "PASS", "."),  # same pos, different alt
    ])
    out = str(tmp_path / "report.txt")
    _run("VariantEval", ["--eval", ev, "-D", db, "-O", out])
    text = open(out).read()
    # CountVariants row layout: name comp eval Novelty nProcessedLoci
    # nCalledLoci nRefLoci nVariantLoci variantRate variantRatePerBp nSNPs
    # nMNPs nInsertions nDeletions ... (CountVariants.java:20-76)
    lines = {ln.split()[3]: ln.split() for ln in text.splitlines()
             if ln.startswith("CountVariants ")}
    # filtered records are excluded by default: 5 processed, 3 snps, 1 ins, 1 del
    assert lines["all"][4:6] == ["5", "5"]
    assert lines["all"][10:14] == ["3", "0", "1", "1"]
    # known = allele-matching dbsnp sites only (pos 100)
    assert lines["known"][4] == "1" and lines["known"][10] == "1"
    assert lines["novel"][4] == "4"
    titv = {ln.split()[3]: ln.split() for ln in text.splitlines()
            if ln.startswith("TiTvVariantEvaluator ")}
    assert titv["all"][4:6] == ["2", "1"]
    comp = {ln.split()[3]: ln.split() for ln in text.splitlines()
            if ln.startswith("CompOverlap ")}
    # pos 100 and 300 overlap comp positions; only 100 concordant
    assert comp["all"][6] == "2" and comp["all"][8] == "1"
    # the standard module set emits one table each
    for tbl in ("IndelSummary", "MultiallelicSummary", "ValidationReport",
                "IndelLengthHistogram"):
        assert f"#:GATKTable:" in text and tbl in text


def test_variant_eval_stratifier_matrix(tmp_path):
    """-ST composition: Filter x Novelty states multiply; filtered records flow
    into the 'filtered' rows (stratifications/Filter.java)."""
    ev = str(tmp_path / "eval.vcf")
    db = str(tmp_path / "dbsnp.vcf")
    _write_vcf(ev, [
        ("20", 100, ".", "A", "G", 50, "PASS", "."),
        ("20", 200, ".", "C", "T", 50, "lowqual", "."),
        ("20", 300, ".", "A", "AT", 50, "PASS", "."),
        ("21", 100, ".", "G", "C", 50, "PASS", "."),
    ])
    _write_vcf(db, [("20", 100, ".", "A", "G", 50, "PASS", ".")])
    out = str(tmp_path / "report.txt")
    _run("VariantEval", ["--eval", ev, "-D", db, "-O", out,
                         "-ST", "Filter", "-ST", "Contig",
                         "-EV", "CountVariants", "-no-ev"])
    rows = [ln.split() for ln in open(out) if ln.startswith("CountVariants ")]
    # columns: name comp eval Novelty Filter Contig nProcessedLoci...
    by_key = {(r[3], r[4], r[5]): r for r in rows}
    assert by_key[("all", "called", "all")][6] == "3"
    assert by_key[("all", "filtered", "all")][6] == "1"
    assert by_key[("all", "raw", "all")][6] == "4"
    assert by_key[("all", "called", "20")][6] == "2"
    assert by_key[("all", "called", "21")][6] == "1"
    assert by_key[("known", "called", "20")][6] == "1"


def test_variant_eval_indel_modules(tmp_path):
    """IndelSummary + IndelLengthHistogram on a mixed indel callset."""
    ev = str(tmp_path / "eval.vcf")
    _write_vcf(ev, [
        ("20", 100, ".", "A", "AT", 50, "PASS", "."),        # +1
        ("20", 200, ".", "A", "ATTT", 50, "PASS", "."),      # +3
        ("20", 300, ".", "ATT", "A", 50, "PASS", "."),       # -2
        ("20", 400, ".", "AT", "A,ATT", 50, "PASS", "."),    # multiallelic -1/+1
        ("20", 500, ".", "C", "G", 50, "PASS", "."),         # SNP
    ])
    out = str(tmp_path / "report.txt")
    _run("VariantEval", ["--eval", ev, "-O", out])
    text = open(out).read()
    isum = [ln.split() for ln in text.splitlines()
            if ln.startswith("IndelSummary ") and ln.split()[3] == "all"][0]
    # name comp eval Novelty n_SNPs n_singleton_SNPs n_indels n_singleton_indels
    # nIndelSites n_multiallelic_indel_sites ...
    assert isum[4] == "1"       # one SNP allele
    assert isum[6] == "5"       # five indel alt alleles
    assert isum[8] == "4"       # four indel sites
    assert isum[9] == "1"       # one multiallelic indel site
    hist = {int(ln.split()[4]): float(ln.split()[5]) for ln in text.splitlines()
            if ln.startswith("IndelLengthHistogram ") and ln.split()[3] == "all"}
    # biallelic indels only: +1, +3, -2 -> freq 1/3 each
    assert abs(hist[1] - 1 / 3) < 1e-6
    assert abs(hist[3] - 1 / 3) < 1e-6
    assert abs(hist[-2] - 1 / 3) < 1e-6
    assert hist[2] == 0.0


def test_filter_variant_tranches(tmp_path):
    rng = np.random.default_rng(3)
    rows = []
    truth_rows = []
    # 100 SNPs with CNN_1D scores 0..99; truth = top 50 scores
    for i in range(100):
        score = float(i)
        rows.append(("20", 1000 + i, ".", "A", "G", 50, ".", f"CNN_1D={score:.2f}"))
        if i >= 50:
            truth_rows.append(("20", 1000 + i, ".", "A", "G", 50, "PASS", "."))
    inp = str(tmp_path / "in.vcf")
    res = str(tmp_path / "truth.vcf")
    _write_vcf(inp, rows, ['##INFO=<ID=CNN_1D,Number=1,Type=Float,Description="score">'])
    _write_vcf(res, truth_rows)
    out = str(tmp_path / "out.vcf")
    _run("FilterVariantTranches", ["-V", inp, "--resource", res,
                                   "--info-key", "CNN_1D",
                                   "--snp-tranche", "90.0", "-O", out])
    statuses = {}
    for ln in open(out):
        if ln.startswith("#"):
            continue
        f = ln.split("\t")
        statuses[int(f[1])] = f[6]
    # 90% sensitivity to truth (scores 50..99): cutoff at ~10th percentile of
    # truth scores => scores >= ~54 pass
    n_pass = sum(1 for s in statuses.values() if s == "PASS")
    assert 40 <= n_pass <= 50
    name = "CNN_1D_SNP_Tranche_90.00_100.00"
    assert any(s == name for s in statuses.values())
    # the highest-scoring variants pass, lowest fail
    assert statuses[1099] == "PASS" and statuses[1000] == name


def test_new_evaluators_and_stratifiers(tmp_path):
    """Round-4 vareval breadth: new evaluators/stratifiers registered and
    produce tables (varianteval/evaluators + stratifications)."""
    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.vareval.evaluators import EVALUATOR_REGISTRY
    from gatk_tpu.vareval.stratifiers import STRATIFIER_REGISTRY

    for n in ("VariantAFEvaluator", "ThetaVariantEvaluator", "GenotypeFilterSummary",
              "VariantSummary", "MendelianViolationEvaluator", "PrintMissingComp",
              "MetricsCollection"):
        assert n in EVALUATOR_REGISTRY, n
    for n in ("Family", "TandemRepeat", "IntervalStratification", "FunctionalClass"):
        assert n in STRATIFIER_REGISTRY, n

    vcf_in = tmp_path / "e.vcf"
    vcf_in.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:GQ:DP\t0/1:60:30\t0/0:50:25\n"
        "chr1\t200\t.\tC\tT\t60\tPASS\t.\tGT:GQ:DP\t1/1:70:40\t0/1:55:33\n"
        "chr1\t300\t.\tG\tGA\t40\tPASS\tSTR;RU=A;RPA=5,6\tGT:GQ:DP\t0/1:45:20\t./.:.:.\n")
    out = str(tmp_path / "eval.report")
    rc = TOOL_REGISTRY["VariantEval"](
        ["--eval", str(vcf_in), "-O", out,
         "-EV", "VariantAFEvaluator", "-EV", "ThetaVariantEvaluator",
         "-EV", "GenotypeFilterSummary", "-EV", "VariantSummary",
         "-EV", "MetricsCollection", "-ST", "TandemRepeat"])
    assert rc == 0
    text = open(out).read()
    for table in ("VariantAFEvaluator", "ThetaVariantEvaluator",
                  "GenotypeFilterSummary", "VariantSummary", "MetricsCollection"):
        assert table in text, table
    assert "is.repeat" in text and "not.repeat" in text


def test_r5_stratifiers_unit():
    """Unit behavior of the r5 stratifier tail (CompFeatureInput,
    EvalFeatureInput, JexlExpression, SnpEffPositionModifier, Degeneracy)."""
    from gatk_tpu.io.vcf import Variant
    from gatk_tpu.vareval.framework import EvalContext
    from gatk_tpu.vareval import stratifiers as st

    def ctx(info=None):
        v = Variant("20", 100, "A", ("G",), info=dict(info or {}))
        return EvalContext(v, "SNP", False, None, False, False, [])

    s = st.CompFeatureInput(); s.comp_name = "dbsnp"
    assert s.relevant_states(ctx()) == ("dbsnp",)
    s = st.EvalFeatureInput(); s.eval_name = "eval2"
    assert s.relevant_states(ctx()) == ("eval2",)

    j = st.JexlExpression()
    j.expressions = [("DepthLt20", "DP < 20"), ("DepthGt20", "DP > 20")]
    assert j.all_states == ("none", "DepthLt20", "DepthGt20")
    assert j.relevant_states(ctx({"DP": "15"})) == ("none", "DepthLt20")
    assert j.relevant_states(ctx({"DP": "25"})) == ("none", "DepthGt20")
    assert j.relevant_states(ctx({})) == ("none",)

    se = st.SnpEffPositionModifier()
    # SPLICE_SITE_ACCEPTOR is an INTRON subtype, not EXON/CDS
    assert se.relevant_states(ctx({"SNPEFF_EFFECT": "SPLICE_SITE_ACCEPTOR"})) \
        == ("SPLICE_SITE",)
    assert se.relevant_states(ctx({"SNPEFF_EFFECT": "STOP_GAINED"})) == (
        "GENE", "CODING_REGION", "STOP_GAINED")
    assert se.relevant_states(ctx({"SNPEFF_EFFECT": "UTR_5_PRIME"})) == ("GENE",)
    assert se.relevant_states(ctx({})) == ()

    d = st.Degeneracy()
    # Leu codons {CTT,CTC,CTA,CTG,TTA,TTG}: pos 0 {C,T} -> 2-fold,
    # pos 2 {T,C,A,G} -> 4-fold
    assert d.relevant_states(ctx({"refseq.functionalClass": "silent",
                                  "refseq.variantAA": "Leu",
                                  "refseq.frame": "0"})) == ("all", "2-fold")
    assert d.relevant_states(ctx({"refseq.functionalClass": "silent",
                                  "refseq.variantAA": "Leu",
                                  "refseq.frame": "2"})) == ("all", "4-fold")
    assert d.relevant_states(ctx({"refseq.functionalClass": "missense",
                                  "refseq.variantAA": "Met",
                                  "refseq.frame": "1"})) == ("all", "1-fold")
    # numbered annotations: nonsense beats missense
    assert d.relevant_states(ctx({
        "refseq.functionalClass_1": "missense", "refseq.variantAA_1": "Trp",
        "refseq.frame_1": "0",
        "refseq.functionalClass_2": "nonsense", "refseq.variantAA_2": "Gly",
        "refseq.frame_2": "2"})) == ("all", "4-fold")
    assert d.relevant_states(ctx({})) == ("all",)


def test_r5_stratifiers_cli(tmp_path):
    """-ST JexlExpression/-select wiring through the CLI."""
    ev = str(tmp_path / "eval.vcf")
    _write_vcf(ev, [
        ("20", 100, ".", "A", "G", 50, "PASS", "DP=10"),
        ("20", 200, ".", "C", "T", 50, "PASS", "DP=30"),
    ])
    out = str(tmp_path / "report.txt")
    _run("VariantEval", ["--eval", ev, "-O", out, "-no-st", "-no-ev",
                         "-EV", "CountVariants", "-ST", "JexlExpression",
                         "-select", "DP < 20", "-select-name", "DepthSelect"])
    text = open(out).read()
    rows = {ln.split()[3]: ln.split() for ln in text.splitlines()
            if ln.startswith("CountVariants ")}
    assert rows["none"][7] == "2"      # nVariantLoci over all
    assert rows["DepthSelect"][7] == "1"
