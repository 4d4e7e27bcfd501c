"""AS_* reducible annotation reduce path vs the reference's own golden.

Gates (reference resources, tools/walkers/GenotypeGVCFs/):
  * GenotypeGVCFs on NA12878.AS.chr20snippet.g.vcf reproduces every AS_* INFO
    value (and QD, whose >=35 jitter shares the seeded RNG with AS_QD) of
    AS_Annotations.gatk3.7_30_ga4f720357.expected.vcf exactly.
  * CombineGVCFs-level raw merging: histogram/sum combining across two samples
    with allele remapping matches the per-section content of
    CombineGVCFs/testAlleleSpecificAnnotations.vcf.
"""
import os

import pytest

GG = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
      "tools/walkers/GenotypeGVCFs")
CG = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
      "tools/walkers/CombineGVCFs")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{GG}/NA12878.AS.chr20snippet.g.vcf"),
    reason="reference AS resources not available")


def _as_info(path, extra=("QD",)):
    out = {}
    for line in open(path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        info = {kv.split("=")[0]: kv.split("=", 1)[1]
                for kv in f[7].split(";") if "=" in kv}
        out[(f[0], f[1], f[3], f[4])] = {
            k: v for k, v in info.items()
            if k.startswith("AS_") or k in extra}
    return out


def test_genotype_gvcfs_as_finalize_matches_golden(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY

    out = tmp_path / "as_gg.vcf"
    rc = TOOL_REGISTRY["GenotypeGVCFs"](
        ["-V", f"{GG}/NA12878.AS.chr20snippet.g.vcf", "-O", str(out)])
    assert not rc
    exp = _as_info(f"{GG}/AS_Annotations.gatk3.7_30_ga4f720357.expected.vcf")
    got = _as_info(str(out))
    assert set(exp) == set(got)
    mismatches = []
    for site, fields in exp.items():
        for key, val in fields.items():
            if got[site].get(key) != val:
                mismatches.append((site, key, val, got[site].get(key)))
    assert not mismatches, mismatches[:10]


def _load_gvcf(path):
    from gatk_tpu.io import vcf as vcfmod

    rdr = vcfmod.VcfReader(path)
    recs = list(rdr)
    return recs, rdr.samples[0]


def test_combine_gvcfs_as_raw_merge_two_samples():
    """Histogram merge + AS_RAW_MQ/AS_SB_TABLE sums with allele remapping:
    per-allele section content matches the reference's combined golden
    (allele ORDER in multi-sample merges differs from htsjdk's merger; the
    per-allele values are compared keyed by allele string)."""
    from gatk_tpu.gvcf import combine as cmod

    streams, names, refmap = [], [], {}
    for p in (f"{GG}/NA12878.AS.chr20snippet.g.vcf",
              f"{CG}/NA12892.AS.chr20snippet.g.vcf"):
        recs, sample = _load_gvcf(p)
        streams.append((recs, [r.samples[0] for r in recs]))
        names.append(sample)
        for r in recs:
            for i, b in enumerate(r.ref):
                refmap[r.pos + i] = ord(b)
    out = cmod.combine_gvcfs(streams, names, lambda p: refmap.get(p, ord("N")),
                             "20")
    by_pos = {v.pos + 1: v for v in out if any(a != "<NON_REF>" for a in v.alts)}

    exp_by_pos = {}
    for line in open(f"{CG}/testAlleleSpecificAnnotations.vcf"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if "AS_SB_TABLE" not in f[7]:
            continue
        info = {kv.split("=")[0]: kv.split("=", 1)[1]
                for kv in f[7].split(";") if "=" in kv}
        exp_by_pos[int(f[1])] = (f[3], f[4].split(","), info)

    assert exp_by_pos, "no AS sites in expected combine output"
    checked = 0
    for pos, (eref, ealts, einfo) in exp_by_pos.items():
        v = by_pos.get(pos)
        assert v is not None, f"missing combined site {pos}"
        assert v.ref == eref
        assert sorted(v.alts) == sorted(ealts)
        # compare per-allele sections keyed by allele string
        for key in ("AS_RAW_MQ", "AS_SB_TABLE"):
            esecs = dict(zip([eref] + ealts, einfo[key].split("|")))
            gsecs = dict(zip([v.ref] + list(v.alts), v.info[key].split("|")))
            for allele, sec in esecs.items():
                assert gsecs[allele] == sec, (pos, key, allele, sec, gsecs[allele])
        # rank-sum histograms: GATK prints an empty section for a no-data
        # allele in combined output, our ZHistogram prints NaN — both parse
        # to the empty histogram, so normalize before comparing
        for key in ("AS_RAW_BaseQRankSum", "AS_RAW_MQRankSum",
                    "AS_RAW_ReadPosRankSum"):
            esecs = dict(zip([eref] + ealts, einfo[key].split("|")))
            gsecs = dict(zip([v.ref] + list(v.alts), v.info[key].split("|")))
            for allele, sec in esecs.items():
                got_sec = gsecs[allele]
                if sec in ("", "NaN") and got_sec in ("", "NaN"):
                    continue
                assert got_sec == sec, (pos, key, allele, sec, got_sec)
        checked += 1
    assert checked >= 3


def test_variant_annotator_as_classes_registered():
    from gatk_tpu.calling.annotations import (ANNOTATION_GROUPS,
                                              ANNOTATION_REGISTRY)

    for name in ("AS_FisherStrand", "AS_StrandOddsRatio",
                 "AS_RMSMappingQuality", "AS_QualByDepth",
                 "AS_BaseQualityRankSumTest", "AS_MappingQualityRankSumTest",
                 "AS_ReadPosRankSumTest", "AS_StrandBiasMutectAnnotation",
                 "SecondaryDepthPerAlleleBySample"):
        assert name in ANNOTATION_REGISTRY, name
    assert "AS_FisherStrand" in ANNOTATION_GROUPS["AS_StandardAnnotation"]


def test_as_annotation_classes_compute():
    """The finalized AS_ classes produce per-alt values from a read context."""
    import numpy as np

    from gatk_tpu.calling.annotations import (AnnotationContext,
                                              VariantAnnotatorEngine,
                                              ANNOTATION_REGISTRY)
    from gatk_tpu.io.reads import Read
    from gatk_tpu.io.vcf import Variant

    v = Variant(contig="chr1", pos=50, ref="A", alts=("T",), qual=200.0,
                filters=(), info={}, fmt_keys=("GT",), samples=[{"GT": "0/1"}])
    reads = []
    ba = []
    for i in range(24):
        alt = i % 2 == 0
        bases = np.full(100, ord("C"), np.uint8)
        bases[50 - 10] = ord("T") if alt else ord("A")
        r = Read(f"r{i}", 16 if i % 3 == 0 else 0, 0, 10, 50 if alt else 60,
                 np.zeros(1, np.uint8), np.array([100], np.int32),
                 bases, np.full(100, 30 if alt else 35, np.uint8))
        reads.append(r)
        ba.append(1 if alt else 0)
    ctx = AnnotationContext(variant=v, reads=reads,
                            read_best_allele=np.array(ba))
    out = {}
    for name in ("AS_FisherStrand", "AS_StrandOddsRatio",
                 "AS_RMSMappingQuality", "AS_QualByDepth",
                 "AS_BaseQualityRankSumTest", "AS_MappingQualityRankSumTest",
                 "AS_ReadPosRankSumTest", "AS_StrandBiasMutectAnnotation",
                 "SecondaryDepthPerAlleleBySample"):
        out.update(ANNOTATION_REGISTRY[name]().annotate(ctx))
    assert out["AS_MQ"] == "50.00"
    assert out["AS_SB_TABLE"].count("|") == 1
    assert out["SFAD"] == "12,12"
    assert float(out["AS_QD"]) == pytest.approx(200.0 / 24, abs=0.01)
    assert float(out["AS_MQRankSum"]) < 0  # alt MQ 50 < ref MQ 60
    assert float(out["AS_BaseQRankSum"]) < 0
    assert "AS_FS" in out and "AS_SOR" in out and "AS_ReadPosRankSum" in out


def test_genotype_gvcfs_keep_combined_matches_golden(tmp_path):
    """-keep-combined retains the subset raw AS_* annotations + AS_QUAL;
    every AS_ value matches AS_Annotations.keepRawCombined.expected.vcf."""
    from gatk_tpu.cli import TOOL_REGISTRY

    out = tmp_path / "kc.vcf"
    rc = TOOL_REGISTRY["GenotypeGVCFs"](
        ["-V", f"{GG}/NA12878.AS.chr20snippet.g.vcf", "-O", str(out),
         "-keep-combined"])
    assert not rc
    exp = _as_info(f"{GG}/AS_Annotations.keepRawCombined.expected.vcf",
                   extra=())
    got = _as_info(str(out), extra=())
    mismatches = [(site, key, val, got.get(site, {}).get(key))
                  for site, fields in exp.items()
                  for key, val in fields.items()
                  if got.get(site, {}).get(key) != val]
    assert not mismatches, mismatches[:10]


MITO = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
        "tools/mutect/mito")


@pytest.mark.slow
def test_hc_gvcf_as_raw_shapes(tmp_path):
    """HC -ERC GVCF -G AS_StandardAnnotation emits the reference's GVCF-mode
    raw forms (expected.testGVCFMode.gatk4.alleleSpecific.g.vcf shapes):
    per-alt z singletons with an empty ref section and NaN NON_REF, AS_RAW_MQ
    over all alleles, AS_SB_TABLE with a 0,0 NON_REF row, per-sample SB."""
    import os

    if not os.path.exists(f"{MITO}/NA12878.bam"):
        pytest.skip("mito unavailable")
    from gatk_tpu.cli import TOOL_REGISTRY

    out = tmp_path / "as.g.vcf"
    rc = TOOL_REGISTRY["HaplotypeCaller"](
        ["-I", f"{MITO}/NA12878.bam",
         "-R", f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta",
         "-L", "chrM:140-170", "-ERC", "GVCF",
         "--max-reads-per-alignment-start", "3",
         "-G", "AS_StandardAnnotation", "-O", str(out)])
    assert not rc
    var_lines = [l for l in open(out)
                 if not l.startswith("#") and "AS_SB_TABLE" in l]
    assert var_lines, "no AS-annotated variant records emitted"
    f = var_lines[0].rstrip("\n").split("\t")
    info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
    n_alleles = 1 + len(f[4].split(","))  # ref + alts (incl NON_REF)
    # AS_SB_TABLE covers every allele; NON_REF row is 0,0
    sb_rows = info["AS_SB_TABLE"].split("|")
    assert len(sb_rows) == n_alleles
    assert sb_rows[-1] == "0,0"
    # AS_RAW_MQ: %.2f per allele, NON_REF 0.00
    mq = info["AS_RAW_MQ"].split("|")
    assert len(mq) == n_alleles and mq[-1] == "0.00"
    # rank-sum raws: leading empty ref section, z,1 singletons or NaN,
    # NaN for NON_REF
    for key in ("AS_RAW_BaseQRankSum", "AS_RAW_MQRankSum",
                "AS_RAW_ReadPosRankSum"):
        secs = info[key].split("|")
        assert len(secs) == n_alleles
        assert secs[0] == ""          # ref section is empty
        assert secs[-1] == "NaN"      # NON_REF
        for sec in secs[1:-1]:
            assert sec == "NaN" or sec.endswith(",1"), (key, sec)
    # per-sample SB FORMAT field present with 4 comma-separated counts
    fmt = f[8].split(":")
    assert "SB" in fmt
    sb_val = f[9].split(":")[fmt.index("SB")]
    assert len(sb_val.split(",")) == 4
