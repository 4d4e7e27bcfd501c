"""Mutect2 somatic-likelihoods math and activity tests (CPU)."""
import math

import numpy as np
import pytest

from gatk_tpu.mutect import somatic_likelihoods as sle
from gatk_tpu.mutect.engine import M2Args, m2_read_filter


def test_digamma_known_values():
    # digamma(1) = -gamma, digamma(2) = 1 - gamma
    gamma = 0.5772156649015329
    assert sle.digamma(1.0) == pytest.approx(-gamma, abs=1e-9)
    assert sle.digamma(2.0) == pytest.approx(1 - gamma, abs=1e-9)
    assert sle.digamma(10.5) == pytest.approx(2.3030010342976863, abs=1e-8)


def test_allele_fractions_posterior_obvious():
    # 90 reads strongly favor allele 0; 10 favor allele 1
    ll = np.zeros((2, 100))
    ll[1, :90] = -10.0
    ll[0, 90:] = -10.0
    post = sle.allele_fractions_posterior(ll, np.array([1.0, 1.0]))
    af = post / post.sum()
    assert af[0] == pytest.approx(91 / 102, abs=0.01)


def test_log_evidence_single_allele_is_loglik_sum():
    # with one allele, log evidence reduces to the sum of log likelihoods
    ll = np.array([[-1.0, -2.0, -0.5]])
    ev = sle.log_evidence(ll, np.array([1.0]))
    assert ev == pytest.approx(ll.sum(), abs=1e-6)


def test_log_likelihood_ratio_monotone_in_alt_count():
    weak = sle.log_likelihood_ratio(50, [30] * 2)
    strong = sle.log_likelihood_ratio(50, [30] * 20)
    assert strong > weak
    assert sle.log_likelihood_ratio(50, []) == -np.inf


def test_log_likelihood_ratio_high_depth_heuristic():
    # fork-specific: >300 ref reads with >1.6%*exp(-n/1000) confident alts => 5.0
    assert sle.log_likelihood_ratio(400, [20] * 30) == 5.0


def test_mito_mode_lowers_thresholds():
    a = M2Args(mitochondria_mode=True)
    assert a.emission_log10_odds == 0.0
    assert a.initial_log10_odds == 0.0
    b = M2Args()
    assert b.emission_log10_odds == 3.0 and b.initial_log10_odds == 2.0


def test_m2_read_filter(synthetic_read=None):
    from gatk_tpu.io.reads import Read
    import numpy as np

    def mk(mapq=60, flag=0, n=50):
        return Read("r", flag, 0, 100, mapq,
                    np.array([0], np.uint8), np.array([n], np.int32),
                    np.full(n, ord("A"), np.uint8), np.full(n, 30, np.uint8))

    assert m2_read_filter(mk())
    assert not m2_read_filter(mk(mapq=10))        # below MAPQ 20
    assert not m2_read_filter(mk(flag=0x400))     # duplicate
    assert not m2_read_filter(mk(n=20))           # below min read length 30


def test_filter_mutect_calls_engine():
    """Core filter semantics on synthetic records (new multi-pass engine)."""
    from gatk_tpu.io.vcf import Variant
    from gatk_tpu.mutect.filtering import M2FilterArgs, run_filter_mutect_calls

    def mk(tlod, mbq_alt=30, mpos=30, ecnt=1, alts=("C",)):
        tl = ",".join(f"{tlod:.2f}" for _ in alts)
        return Variant(
            contig="chrM", pos=100, ref="A", alts=alts,
            info={"TLOD": tl, "MBQ": f"30,{','.join(str(mbq_alt) for _ in alts)}",
                  "MMQ": "60," + ",".join("60" for _ in alts),
                  "MPOS": ",".join(str(mpos) for _ in alts),
                  "ECNT": str(ecnt), "ECNTH": ",".join("1" for _ in alts)},
            fmt_keys=("GT", "AD", "AF", "SB"),
            samples=[{"GT": "0/1", "AD": "50,50", "AF": "0.5", "SB": "25,25,25,25"}],
        )

    strong, weak, lowbq, endpos = mk(500.0), mk(0.2), mk(500.0, mbq_alt=5), mk(500.0, mpos=0)
    variants = [strong, weak, lowbq, endpos]
    args = M2FilterArgs(mitochondria=True)
    run_filter_mutect_calls(variants, args, ["S"], callable_sites=16000)
    assert strong.filters == ("PASS",)
    assert "weak_evidence" in weak.filters
    assert "base_qual" in lowbq.filters
    assert "position" in endpos.filters
    # mito mode: multiallelic not applied; default mode: applied
    multi = mk(500.0, alts=("C", "G", "T"))
    run_filter_mutect_calls([multi], M2FilterArgs(mitochondria=True), ["S"])
    assert multi.filters == ("PASS",)
    multi2 = mk(500.0, alts=("C", "G", "T"))
    run_filter_mutect_calls([multi2], M2FilterArgs(), ["S"])
    assert "multiallelic" in multi2.filters


def test_filter_mutect_calls_mito_golden():
    """FILTER + AS_FilterStatus parity with the reference integration test
    (Mutect2IntegrationTest.testFilterMitochondria, vcfsForFiltering row 1:
    mito mode, min-af 0.5, min-reads-per-strand 1, unique-alt-read-count 2
    on mutect/mito/unfiltered-with-assb.vcf)."""
    import os
    import tempfile

    from gatk_tpu.tools.mutect_tool import filter_mutect_calls
    from gatk_tpu.utils.testdata import reference_path

    src = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/"
                         "mutect/mito/unfiltered-with-assb.vcf")
    if not os.path.exists(src):
        import pytest
        pytest.skip("reference test data unavailable")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "filtered.vcf")
        filter_mutect_calls([
            "-V", src, "-O", out, "--mitochondria-mode",
            "--min-allele-fraction", "0.5",
            "--min-reads-per-strand", "1",
            "--unique-alt-read-count", "2",
        ])
        rows = [line.rstrip("\n").split("\t") for line in open(out)
                if not line.startswith("#")]
        # filtering stats sidecar written with learned threshold metadata
        stats = open(out + ".filteringStats.tsv").read()
        assert "#<METADATA>threshold=" in stats
    actual_filters = [set(r[6].split(";")) for r in rows]
    infos = [dict(kv.split("=", 1) for kv in r[7].split(";") if "=" in kv) for r in rows]
    actual_as = [i.get("AS_FilterStatus", "") for i in infos]
    expected_filters = [
        {"strand_bias", "strict_strand"},
        {"PASS"},
        {"weak_evidence", "low_allele_frac"},
        {"PASS"},
        {"PASS"},
        {"duplicate"},
        {"FAIL"},
    ]
    expected_as = [
        "strand_bias,strict_strand",
        "SITE",
        "weak_evidence,low_allele_frac",
        "SITE|weak_evidence,strand_bias,low_allele_frac|strand_bias,strict_strand,low_allele_frac",
        "SITE",
        "duplicate",
        "weak_evidence,strand_bias,strict_strand|low_allele_frac",
    ]
    assert actual_filters == expected_filters
    assert actual_as == expected_as


def test_calculate_contamination_known_mixtures():
    """Hom-alt contamination estimates within 10% relative of known NA12891/NA12892
    mixture fractions (CalculateContaminationIntegrationTest data)."""
    import os

    from gatk_tpu.mutect.contamination import calculate_contamination, read_pileup_table
    from gatk_tpu.utils.testdata import reference_path

    D = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/calculatecontamination")
    if not os.path.isdir(D):
        pytest.skip("reference data missing")
    for fname, expected in [
        ("NA12891_0.01_NA12892_0.99.table", 0.011),
        ("NA12891_0.03_NA12892_0.97.table", 0.031),
        ("NA12891_0.05_NA12892_0.95.table", 0.051),
        ("NA12891_0.08_NA12892_0.92.table", 0.081),
    ]:
        _s, sites = read_pileup_table(os.path.join(D, fname))
        c, _se = calculate_contamination(sites)
        assert abs(c - expected) < max(0.15 * expected, 0.005), (fname, c)


def test_merge_mutect_stats(tmp_path):
    from gatk_tpu.tools.mutect_tool import merge_mutect_stats

    a = tmp_path / "a.stats"
    b = tmp_path / "b.stats"
    a.write_text("statistic\tvalue\ncallable\t1000\n")
    b.write_text("statistic\tvalue\ncallable\t500\n")
    out = tmp_path / "merged.stats"
    merge_mutect_stats(["--stats", str(a), "--stats", str(b), "-O", str(out)])
    from gatk_tpu.mutect.filtering import read_mutect_stats
    assert read_mutect_stats(str(out))["callable"] == 1500.0


def test_create_somatic_panel_of_normals(tmp_path):
    """Sites with artifacts in >= min-sample-count normals enter the panel;
    likely-germline and singleton sites are excluded
    (CreateSomaticPanelOfNormals.java semantics)."""
    from gatk_tpu.tools.mutect_tool import create_somatic_panel_of_normals

    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{s}\n")
    # artifact site chr1:100 in both normals (low-AF alt), singleton at 200,
    # germline-looking het at 300 (AF 0.5 in the germline resource)
    n1 = tmp_path / "n1.vcf"
    n1.write_text(header.format(s="N1")
                  + "chr1\t100\t.\tA\tC\t.\t.\t.\tGT:AD\t0/1:95,5\n"
                  + "chr1\t200\t.\tG\tT\t.\t.\t.\tGT:AD\t0/1:90,10\n"
                  + "chr1\t300\t.\tT\tG\t.\t.\t.\tGT:AD\t0/1:50,50\n")
    n2 = tmp_path / "n2.vcf"
    n2.write_text(header.format(s="N2")
                  + "chr1\t100\t.\tA\tC\t.\t.\t.\tGT:AD\t0/1:93,7\n"
                  + "chr1\t300\t.\tT\tG\t.\t.\t.\tGT:AD\t0/1:48,52\n")
    germ = tmp_path / "germ.vcf"
    germ.write_text(header.format(s="POP")
                    + "chr1\t300\t.\tT\tG\t.\t.\tAF=0.3\tGT\t0/1\n")
    out = tmp_path / "pon.vcf"
    create_somatic_panel_of_normals([
        "-V", str(n1), "-V", str(n2), "-O", str(out),
        "--germline-resource", str(germ)])
    rows = [l.split("\t") for l in out.read_text().splitlines() if not l.startswith("#")]
    positions = [int(r[1]) for r in rows]
    assert 100 in positions      # shared artifact
    assert 200 not in positions  # singleton
    assert 300 not in positions  # germline
    info = dict(kv.split("=", 1) for kv in rows[0][7].split(";"))
    assert float(info["FRACTION"]) == 1.0
    assert "BETA" in info


def test_mito_filter_tools(tmp_path):
    """NuMTFilterTool + MTLowHeteroplasmyFilterTool semantics."""
    from gatk_tpu.tools.mutect_tool import (
        mt_low_heteroplasmy_filter_tool, numt_filter_tool)

    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    # low-depth alt (possible NuMT at 30x autosomal coverage) vs high-depth alt
    src = tmp_path / "in.vcf"
    src.write_text(header
                   + "chrM\t100\t.\tA\tC\t.\t.\t.\tGT:AD:AF\t0/1:500,20:0.04\n"
                   + "chrM\t200\t.\tG\tT\t.\t.\t.\tGT:AD:AF\t0/1:100,900:0.90\n")
    out = tmp_path / "numt.vcf"
    numt_filter_tool(["-V", str(src), "-O", str(out), "--autosomal-coverage", "30"])
    rows = {int(r[1]): r for r in
            (l.split("\t") for l in out.read_text().splitlines() if not l.startswith("#"))}
    assert "possible_numt" in rows[100][6]
    assert "possible_numt" not in rows[200][6]

    # 5 low-het passing sites > max 3 -> all low hets filtered
    src2 = tmp_path / "in2.vcf"
    lines = [f"chrM\t{100 + i}\t.\tA\tC\t.\t.\t.\tGT:AD:AF\t0/1:500,20:0.04\n"
             for i in range(5)]
    lines.append("chrM\t900\t.\tG\tT\t.\t.\t.\tGT:AD:AF\t0/1:100,900:0.90\n")
    src2.write_text(header + "".join(lines))
    out2 = tmp_path / "lowhet.vcf"
    mt_low_heteroplasmy_filter_tool(["-V", str(src2), "-O", str(out2)])
    rows2 = {int(r[1]): r for r in
             (l.split("\t") for l in out2.read_text().splitlines() if not l.startswith("#"))}
    assert all("mt_many_low_hets" in rows2[100 + i][6] for i in range(5))
    assert "mt_many_low_hets" not in rows2[900][6]
    # below the threshold count: nothing filtered
    src3 = tmp_path / "in3.vcf"
    src3.write_text(header + "".join(lines[:2]))
    out3 = tmp_path / "lowhet3.vcf"
    mt_low_heteroplasmy_filter_tool(["-V", str(src3), "-O", str(out3)])
    assert all(r.split("\t")[6] == "." for r in out3.read_text().splitlines()
               if not r.startswith("#"))


def test_get_normal_artifact_data(tmp_path):
    """GetNormalArtifactData on the mito BAM as both 'tumor' and 'normal'
    (table structure + normal-alt gating semantics)."""
    import os

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.utils.testdata import reference_path

    M = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito")
    if not os.path.isdir(M):
        pytest.skip("reference data missing")
    out = tmp_path / "artifact.table"
    TOOL_REGISTRY["GetNormalArtifactData"]([
        "-I", f"{M}/NA12878.bam", "-R", f"{M}/Homo_sapiens_assembly38.mt_only.fasta",
        "-L", "chrM:100-400", "-O", str(out), "--normal-sample", "NA12878"])
    lines = out.read_text().splitlines()
    assert lines[0] == "normal_alt\tnormal_dp\ttumor_alt\ttumor_dp\tdownsampling\ttype"
    rows = [l.split("\t") for l in lines[1:]]
    assert rows, "deep mito data must yield records"
    for r in rows:
        n_alt, n_dp = int(r[0]), int(r[1])
        assert 0 < n_alt <= 0.2 * n_dp  # gating rule
        assert int(r[3]) == 0           # no tumor reads (all reads are 'normal')
        assert r[5] == "SNV"
