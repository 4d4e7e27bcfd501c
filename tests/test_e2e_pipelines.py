"""End-to-end regression tests for the flagship pipelines on real data.

Mirrors the reference's integration-test gate (HaplotypeCallerIntegrationTest.java:80-101,
Mutect2IntegrationTest "testMitochondria"): run the full CLI path BAM -> VCF on the
mitochondria test dataset and assert the canonical NA12878 rCRS polymorphisms.
Runs on the 8-device CPU mesh via conftest (the PairHMM takes the compiled lax.scan
fallback); the real-TPU path is exercised by the driver/verify recipe with the same CLI.

Expected calls for chrM:1-1000 (canonical NA12878 mito variants, all ~homoplasmic):
152 T>C, 263 A>G, 302 ins(C), 310 T>TC, 750 A>G — cf. the golden
mutect/mito/unfiltered.vcf (which adds two low-AF homopolymer artifacts at 301/310
boundaries that a diploid germline caller correctly drops).
"""
import os

import pytest

from gatk_tpu.cli import TOOL_REGISTRY

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)

MITO = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"
BAM = f"{MITO}/NA12878.bam"
REF = f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta"

# keep CPU runtime bounded: cap positional downsampling at 5 per start (the data is
# ~2000x; GATK's own mito pipeline downsamples too) and use adaptive pruning as the
# reference M2 mito mode does.
FAST = ["--max-reads-per-alignment-start", "5", "--adaptive-pruning"]

CANONICAL_SITES = {152: ("T", "C"), 263: ("A", "G"), 310: ("T", "TC"), 750: ("A", "G")}


def _records(path):
    out = []
    for line in open(path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        out.append(f)
    return out


@pytest.fixture(scope="module")
def hc_vcf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e") / "hc.vcf")
    rc = TOOL_REGISTRY["HaplotypeCaller"](
        ["-I", BAM, "-R", REF, "-L", "chrM:1-1000", "-O", out] + FAST
    )
    assert rc == 0
    return out


def test_haplotypecaller_mito_canonical_sites(hc_vcf):
    recs = _records(hc_vcf)
    by_pos = {int(r[1]): r for r in recs}
    for pos, (ref, alt) in CANONICAL_SITES.items():
        assert pos in by_pos, f"missing canonical call at chrM:{pos}"
        r = by_pos[pos]
        assert r[3] == ref, (pos, r[3])
        assert alt in r[4].split(","), (pos, r[4])
    # the 302 insertion region must be called (allele representation may vary)
    assert 302 in by_pos or 301 in by_pos
    # homoplasmic sites: hom-alt genotype, high qual
    for pos in (152, 263, 750):
        r = by_pos[pos]
        gt = r[9].split(":")[0]
        assert gt in ("1/1", "1|1"), (pos, gt)
        assert float(r[5]) > 1000.0, (pos, r[5])
    # no spurious calls outside the expected set
    assert len(recs) <= 7, [r[1] for r in recs]


def test_haplotypecaller_mito_record_fields(hc_vcf):
    recs = _records(hc_vcf)
    by_pos = {int(r[1]): r for r in recs}
    r = by_pos[152]
    info = dict(kv.split("=", 1) for kv in r[7].split(";") if "=" in kv)
    for key in ("AC", "AF", "AN", "DP", "MLEAC", "MLEAF", "MQ", "QD", "SOR", "FS"):
        assert key in info, f"missing INFO {key}"
    assert info["AC"] == "2" and info["AN"] == "2" and info["AF"] == "1.00"
    assert int(info["DP"]) > 100
    fmt = dict(zip(r[8].split(":"), r[9].split(":")))
    ad = [int(x) for x in fmt["AD"].split(",")]
    assert ad[1] > 10 * max(ad[0], 1), ad  # homoplasmic: alt-dominated AD
    assert int(fmt["GQ"]) == 99


def test_haplotypecaller_gvcf_mode(tmp_path):
    out = str(tmp_path / "hc.g.vcf")
    rc = TOOL_REGISTRY["HaplotypeCaller"](
        ["-I", BAM, "-R", REF, "-L", "chrM:100-400", "-O", out, "-ERC", "GVCF"] + FAST
    )
    assert rc == 0
    recs = _records(out)
    assert recs, "empty GVCF"
    variant_pos = set()
    saw_block = False
    covered_end = 99
    for r in recs:
        pos = int(r[1])
        alts = r[4]
        assert pos > covered_end, f"overlapping/unsorted records at {pos}"
        if alts == "<NON_REF>":
            saw_block = True
            info = dict(kv.split("=", 1) for kv in r[7].split(";") if "=" in kv)
            covered_end = int(info["END"])
        else:
            assert alts.endswith(",<NON_REF>"), alts
            variant_pos.add(pos)
            covered_end = pos + len(r[3]) - 1
    assert saw_block
    for pos in (152, 263, 310):
        assert pos in variant_pos, f"GVCF missing variant at {pos}"
    # bands must cover the interval contiguously up to the end
    assert covered_end >= 395


def test_mutect2_mito_mode(tmp_path):
    out = str(tmp_path / "m2.vcf")
    rc = TOOL_REGISTRY["Mutect2"](
        ["-I", BAM, "-R", REF, "-L", "chrM:1-400", "-O", out,
         "--mitochondria-mode", "--max-reads-per-alignment-start", "5"]
    )
    assert rc == 0
    recs = _records(out)
    by_pos = {int(r[1]): r for r in recs}
    for pos, (ref, alt) in {152: ("T", "C"), 263: ("A", "G"), 310: ("T", "TC")}.items():
        assert pos in by_pos, f"Mutect2 missing {pos}"
        r = by_pos[pos]
        assert r[3] == ref
        assert alt in r[4].split(",")
    # TLOD present and strong at homoplasmic sites
    info = dict(kv.split("=", 1) for kv in by_pos[152][7].split(";") if "=" in kv)
    assert "TLOD" in info
    assert float(info["TLOD"].split(",")[0]) > 100.0
    # stats sidecar written (MergeMutectStats/FilterMutectCalls contract)
    assert os.path.exists(out + ".stats")


def test_reads_pipeline_md_bqsr_hc(tmp_path):
    out = str(tmp_path / "pipe.vcf")
    rc = TOOL_REGISTRY["ReadsPipeline"](
        ["-I", BAM, "-R", REF, "-L", "chrM:100-350", "-O", out] + FAST
    )
    assert rc == 0
    by_pos = {int(r[1]): r for r in _records(out)}
    for pos in (152, 263, 310):
        assert pos in by_pos, f"pipeline missing {pos}"


def test_hc_checkpoint_resume(tmp_path):
    """Per-shard checkpoint/resume: a rerun skips completed shards and emits the
    identical VCF (scatter-gather shard checkpoint pattern, SURVEY §5.4c)."""
    import os

    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "a.vcf")
    base = ["HaplotypeCaller", "-I", BAM, "-R", REF,
            "-L", "chrM:1-1200", "--shard-size", "400",
            "--checkpoint-dir", ckpt] + FAST
    TOOL_REGISTRY["HaplotypeCaller"](base[1:] + ["-O", out1])
    shards = sorted(os.listdir(ckpt))
    assert len(shards) == 3, shards
    # simulate a crash that lost the last shard, then resume
    os.remove(os.path.join(ckpt, shards[-1]))
    kept = [os.path.join(ckpt, s) for s in shards[:-1]]
    mtimes = [os.path.getmtime(p) for p in kept]
    out2 = str(tmp_path / "b.vcf")
    TOOL_REGISTRY["HaplotypeCaller"](base[1:] + ["-O", out2])
    # kept shards were reused, not recomputed
    assert [os.path.getmtime(p) for p in kept] == mtimes
    body = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert body(out1) == body(out2)
    assert len(body(out1)) > 0


def test_haplotypecaller_true_defaults(tmp_path):
    """HC at TRUE GATK defaults (downsample-50, fixed pruning) — the reference's
    integration gate runs tool defaults (HaplotypeCallerIntegrationTest.java:80-101);
    a default-path regression must not escape the suite."""
    out = str(tmp_path / "hc_default.vcf")
    rc = TOOL_REGISTRY["HaplotypeCaller"](
        ["-I", BAM, "-R", REF, "-L", "chrM:100-320", "-O", out]
    )
    assert rc == 0
    by_pos = {int(r[1]): r for r in _records(out)}
    for pos, (ref, alt) in {152: ("T", "C"), 263: ("A", "G"), 310: ("T", "TC")}.items():
        assert pos in by_pos, f"default-args HC missing chrM:{pos}"
        r = by_pos[pos]
        assert r[3] == ref and alt in r[4].split(","), (pos, r[3], r[4])
        gt = r[9].split(":")[0]
        assert gt in ("1/1", "1|1"), (pos, gt)
    # default downsampling keeps ~50 reads/start: depth must be far above the
    # FAST(-5) path's
    info = dict(kv.split("=", 1) for kv in by_pos[152][7].split(";") if "=" in kv)
    assert int(info["DP"]) > 400, info["DP"]


def test_mutect2_record_level_vs_golden(tmp_path):
    """Record-level comparison against the committed golden mutect/mito/unfiltered.vcf
    (Mutect2IntegrationTest testMitochondria): alleles exact, AF/AD/TLOD/DP within
    tolerance at every strongly-supported golden site — not just site membership.
    Runs TRUE M2 defaults (downsample-50, adaptive pruning via mito mode)."""
    out = str(tmp_path / "m2_default.vcf")
    rc = TOOL_REGISTRY["Mutect2"](
        ["-I", BAM, "-R", REF, "-L", "chrM:100-320", "-O", out, "--mitochondria-mode"]
    )
    assert rc == 0
    mine = {int(r[1]): r for r in _records(out)}
    golden = {int(r[1]): r for r in _records(f"{MITO}/unfiltered.vcf")
              # 301 is a TLOD=3.3 borderline emit; 400 is a hand-planted copy of
              # 302 used by FilterMutectCalls tests (not present in the reads)
              if int(r[1]) in (152, 263, 302, 310)}
    for pos, g in golden.items():
        assert pos in mine, f"missing golden site chrM:{pos}"
        m = mine[pos]
        g_alts, m_alts = g[4].split(","), m[4].split(",")
        g_info = dict(kv.split("=", 1) for kv in g[7].split(";") if "=" in kv)
        m_info = dict(kv.split("=", 1) for kv in m[7].split(";") if "=" in kv)
        g_fmt = dict(zip(g[8].split(":"), g[9].split(":")))
        m_fmt = dict(zip(m[8].split(":"), m[9].split(":")))
        g_tlod = dict(zip(g_alts, (float(x) for x in g_info["TLOD"].split(","))))
        m_tlod = dict(zip(m_alts, (float(x) for x in m_info["TLOD"].split(","))))
        g_af = dict(zip(g_alts, (float(x) for x in g_fmt["AF"].split(","))))
        m_af = dict(zip(m_alts, (float(x) for x in m_fmt["AF"].split(","))))
        g_ad = [int(x) for x in g_fmt["AD"].split(",")]
        m_ad = [int(x) for x in m_fmt["AD"].split(",")]
        g_ad_frac = dict(zip(g_alts, (a / max(1, sum(g_ad)) for a in g_ad[1:])))
        m_ad_frac = dict(zip(m_alts, (a / max(1, sum(m_ad)) for a in m_ad[1:])))
        assert m[3] == g[3], (pos, m[3], g[3])
        for alt, gt in g_tlod.items():
            if gt < 50.0:  # weak golden alleles (302's C at 10.7) may drop
                continue
            assert alt in m_alts, f"chrM:{pos} missing golden alt {alt}: {m_alts}"
            # TLOD scales with retained depth; require same order of magnitude
            # and strong support
            assert m_tlod[alt] > max(50.0, 0.3 * gt), (pos, alt, m_tlod[alt], gt)
            assert abs(m_af[alt] - g_af[alt]) < 0.15, (pos, alt, m_af[alt], g_af[alt])
            # AD read assignment at multiallelic sites depends on the exact
            # allele-set composition (302's homopolymer ladder differs between
            # callers); hold the strict bound at biallelic sites only
            if len(g_alts) == 1 and len(m_alts) == 1:
                assert abs(m_ad_frac[alt] - g_ad_frac[alt]) < 0.15, (pos, alt)
        # depth: default downsampling must land in the golden's regime (the FAST
        # path's DP≈30 would fail this)
        assert int(m_info["DP"]) > 0.3 * int(g_info["DP"]), (pos, m_info["DP"], g_info["DP"])


def test_haplotypecaller_pdhmm_mode(tmp_path):
    """--use-pdhmm end-to-end (DRAGEN PD haplotypes + PDHMM likelihoods,
    PartiallyDeterminedHaplotypeComputationEngine.java + LoglessPDPairHMM.java):
    the canonical mito sites must still be called; complex regions fall back to
    assembly haplotypes per the reference's heuristics."""
    out = str(tmp_path / "hc_pd.vcf")
    rc = TOOL_REGISTRY["HaplotypeCaller"](
        ["-I", BAM, "-R", REF, "-L", "chrM:100-320", "-O", out, "--use-pdhmm"] + FAST
    )
    assert rc == 0
    by_pos = {int(r[1]): r for r in _records(out)}
    for pos, (ref, alt) in {152: ("T", "C"), 263: ("A", "G"), 310: ("T", "TC")}.items():
        assert pos in by_pos, f"PD-mode HC missing chrM:{pos}"
        r = by_pos[pos]
        assert r[3] == ref and alt in r[4].split(","), (pos, r[3], r[4])
        gt = r[9].split(":")[0]
        assert gt in ("1/1", "1|1"), (pos, gt)


def test_progress_meter_output():
    import io

    from gatk_tpu.engine.progress import ProgressMeter

    buf = io.StringIO()
    pm = ProgressMeter("Test", unit="regions", seconds_between_updates=0.0, out=buf)
    pm.start()
    for i in range(5):
        pm.update(f"chr1:{i * 100}")
    pm.stop()
    text = buf.getvalue()
    assert "Starting Test traversal" in text
    assert "chr1:400" in text
    assert "Processed 5 total regions" in text
