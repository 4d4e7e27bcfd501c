"""CpxVariantReInterpreterSpark segment-rule extraction.

Cases ported from the reference's
SegmentedCpxVariantSimpleVariantExtractorUnitTest.java (coordinates,
SEGMENTS/ALT_ARRANGEMENT descriptors, and expected simple variants; alt
haplotypes replaced by synthetic strings of the same length — only the
length feeds the rules). Anchor bases come from a dict-backed reference
stub because the b38 snippet in the reference resources is an LFS stub.
"""
import pytest

from gatk_tpu.io.vcf import Variant
from gatk_tpu.tools.cpx_reinterpreter import (
    Interval1, compactify_missing, extract_multi_segment,
    extract_zero_one_segment, find_all_segments, get_ins_len)


def cpx(interval, alt_len, segments, arrangement, alt_seq=None):
    iv = Interval1(interval)
    info = {"END": str(iv.end), "SVTYPE": "CPX",
            "SEQ_ALT_HAPLOTYPE": alt_seq if alt_seq is not None
            else "A" * alt_len,
            "CTG_NAMES": "asm000001:tig00001"}
    if arrangement:
        info["ALT_ARRANGEMENT"] = ",".join(arrangement)
    if segments:
        info["SEGMENTS"] = ",".join(segments)
    return Variant(contig=iv.contig, pos=iv.start - 1, ref="N",
                   alts=("<CPX>",), id=f"CPX_{interval}", info=info)


def stub_ref(bases):
    """bases: {(contig, pos1): base}; default N."""
    return lambda contig, pos1: bases.get((contig, pos1), "N")


def brief(records):
    return sorted(
        (r.id, r.pos + 1, r.ref, r.alts[0], int(r.info["END"]),
         int(r.info["SVLEN"]), r.info["SVTYPE"]) for r in records)


# ---------------------------------------------------------------- helpers

def test_get_ins_len():
    assert get_ins_len("UINS-496", []) == 496
    assert get_ins_len("2", [45, 65, 45]) == 65
    assert get_ins_len("-2", [45, 65, 45]) == 65
    assert get_ins_len("-chr18:11642876-11642927", []) == 52


def test_find_all_segments():
    assert find_all_segments(["1", "2", "3", "2", "1", "2", "3"], 3) == 4
    assert find_all_segments(["1", "2", "3", "UINS-177", "1", "2", "2", "3"], 3) == 0
    assert find_all_segments(
        ["1", "2", "3", "4", "3", "1", "2", "3", "4", "5",
         "2", "3", "4", "5"], 5) == 5
    assert find_all_segments(["1", "2", "-1"], 3) == -1
    assert find_all_segments(["UINS-84", "2", "3", "UINS-5", "2", "2", "3"], 3) == -1


def test_compactify_missing():
    a = Interval1("chr20:8888822-8895288")
    b = Interval1("chr20:8895361-8895655")
    assert [repr(i) for i in compactify_missing([b, a])] == [repr(a), repr(b)]
    c = Interval1("chr1:100-200")
    d = Interval1("chr1:200-300")
    merged = compactify_missing([c, d])
    assert len(merged) == 1 and merged[0].start == 100 and merged[0].end == 300


# ---------------------------------------------- zero / one segment cases

def test_zero_segment_insertion():
    v = cpx("chr20:51740560-51740561", 551, [],
            ["-chr18:11642876-11642927", "UINS-496"])
    out = extract_zero_one_segment(v, stub_ref({("chr20", 51740560): "A"}))
    assert brief(out) == [("INS_chr20_51740560_51740560", 51740560, "A",
                           "<INS>", 51740560, 549, "INS")]
    assert out[0].info["CPX_EVENT"] == v.id


def test_one_segment_inversion():
    v = cpx("chr21:402806-402905", 98, ["chr21:402807-402904"], ["-1"])
    out = extract_zero_one_segment(v, stub_ref({}))
    assert brief(out) == [("INV_chr21_402806_402904", 402806, "N", "<INV>",
                           402904, 0, "INV")]


def test_one_segment_asis_too_small_boundary():
    # net gain 51 > 49 enters the branch but each side is 25/26 <= 49
    v = cpx("chr21:402806-402905", 149, ["chr21:402807-402904"],
            ["UINS-24", "1", "UINS-25"])
    assert extract_zero_one_segment(v, stub_ref({})) == []


def test_one_segment_asis_front_insertion():
    # {....., "1"} -> front insertion of altLen - segLen
    v = cpx("chr20:18675721-18675877", 565, ["chr20:18675721-18675877"],
            ["1", "UINS-28", "1", "UINS-64", "1"])
    out = extract_zero_one_segment(
        v, stub_ref({("chr20", 18675720): "A"}))
    assert brief(out) == [("INS_chr20_18675720_18675720", 18675720, "A",
                           "<INS>", 18675720, 408, "INS")]


def test_one_segment_asis_rear_insertion_uses_front_anchor():
    # {"1", ....} -> rear insertion; the reference (quirk) anchors it with
    # the FRONT base (SegmentedCpxVariantSimpleVariantExtractor.java:606)
    v = cpx("chr20:64096905-64097041", 455, ["chr20:64096905-64097041"],
            ["1", "1", "UINS-166"])
    out = extract_zero_one_segment(
        v, stub_ref({("chr20", 64096904): "A", ("chr20", 64097041): "G"}))
    assert brief(out) == [("INS_chr20_64097041_64097041", 64097041, "A",
                           "<INS>", 64097041, 318, "INS")]


def test_one_segment_asis_middle_both_insertions():
    v = cpx("chr20:51740560-51741035", 1075, ["chr20:51740561-51741034"],
            ["-chr18:11642876-11642927", "UINS-496", "1", "UINS-49"])
    out = extract_zero_one_segment(
        v, stub_ref({("chr20", 51740560): "A", ("chr20", 51741034): "T"}))
    assert brief(out) == [
        ("INS_chr20_51740560_51740560", 51740560, "A", "<INS>",
         51740560, 549, "INS"),
        ("INS_chr20_51741034_51741034", 51741034, "T", "<INS>",
         51741034, 50, "INS")]


def test_one_segment_deletion_only():
    v = cpx("chr20:20269131-20269199", 35, ["chr20:20269131-20269199"],
            ["-chrX:137700299-137700331"])
    out = extract_zero_one_segment(v, stub_ref({("chr20", 20269131): "A"}))
    assert brief(out) == [("DEL_chr20_20269131_20269198", 20269131, "A",
                           "<DEL>", 20269198, -67, "DEL")]


def test_one_segment_deletion_and_insertion():
    v = cpx("chr20:54849491-54849615", 140, ["chr20:54849491-54849615"],
            ["UINS-36", "-chr14:58474127-58474172", "UINS-54"])
    out = extract_zero_one_segment(v, stub_ref({("chr20", 54849491): "C"}))
    assert brief(out) == [
        ("DEL_chr20_54849491_54849614", 54849491, "C", "<DEL>",
         54849614, -123, "DEL"),
        ("INS_chr20_54849491_54849491", 54849491, "C", "<INS>",
         54849491, 140, "INS")]


def test_one_segment_fat_insertion():
    v = cpx("chr20:12558793-12558810", 151, ["chr20:12558793-12558810"],
            ["-chrX:99014092-99014129", "UINS-101"])
    out = extract_zero_one_segment(
        v, stub_ref({("chr20", p): "A" for p in range(12558793, 12558810)}))
    assert brief(out) == [("INS_chr20_12558793_12558809", 12558793,
                           "A" * 17, "<INS>", 12558809, 133, "INS")]


# ------------------------------------------------- multi segment cases

def test_multi_all_asis_front_insertion():
    v = cpx("chr21:21264944-21265096", 367,
            ["chr21:21264944-21264988", "chr21:21264988-21265052",
             "chr21:21265052-21265096"],
            ["1", "2", "3", "2", "1", "2", "3"])
    out = extract_multi_segment(v, stub_ref({("chr21", 21264943): "G"}))
    assert brief(out) == [("INS_chr21_21264943_21264943", 21264943, "G",
                           "<INS>", 21264943, 221, "INS")]


def test_multi_all_asis_rear_insertion():
    v = cpx("chr20:61919906-61920109", 745,
            ["chr20:61919906-61919908", "chr20:61919908-61920054",
             "chr20:61920054-61920109"],
            ["1", "2", "3", "UINS-177", "1", "2", "2", "3"])
    out = extract_multi_segment(v, stub_ref({("chr20", 61920109): "G"}))
    assert brief(out) == [("INS_chr20_61920109_61920109", 61920109, "G",
                           "<INS>", 61920109, 531, "INS")]


def test_multi_all_asis_front_and_rear():
    v = cpx("chr20:38653054-38653283", 715,
            ["chr20:38653054-38653113", "chr20:38653113-38653145",
             "chr20:38653145-38653179", "chr20:38653179-38653273",
             "chr20:38653273-38653283"],
            ["1", "2", "3", "4", "3", "1", "2", "3", "4", "5",
             "2", "3", "4", "5"])
    out = extract_multi_segment(
        v, stub_ref({("chr20", 38653053): "A", ("chr20", 38653283): "G"}))
    assert brief(out) == [
        ("INS_chr20_38653053_38653053", 38653053, "A", "<INS>",
         38653053, 259, "INS"),
        ("INS_chr20_38653283_38653283", 38653283, "G", "<INS>",
         38653283, 175, "INS")]


def test_multi_asis_and_inverted_means_deletion_not_inversion():
    v = cpx("chr20:23122561-23122996", 143,
            ["chr20:23122561-23122596", "chr20:23122596-23122666",
             "chr20:23122666-23122996"],
            ["1", "2", "-1"])
    out = extract_multi_segment(v, stub_ref({("chr20", 23122666): "C"}))
    assert brief(out) == [("DEL_chr20_23122666_23122995", 23122666, "C",
                           "<DEL>", 23122995, -329, "DEL")]


def test_multi_inverted_too_short_deletion_called():
    v = cpx("chr20:34732145-34733344", 61,
            ["chr20:34732145-34733303", "chr20:34733303-34733342",
             "chr20:34733342-34733344"],
            ["-3", "-2", "UINS-14", "3"])
    out = extract_multi_segment(v, stub_ref({("chr20", 34732145): "A"}))
    assert brief(out) == [("DEL_chr20_34732145_34733302", 34732145, "A",
                           "<DEL>", 34733302, -1157, "DEL")]


def test_multi_inversion_long_enough():
    v = cpx("chr21:26001843-26002386", 541,
            ["chr21:26001844-26002384", "chr21:26002384-26002386"],
            ["-1"])
    out = extract_multi_segment(v, stub_ref({("chr21", 26001844): "T"}))
    assert brief(out) == [("INV_chr21_26001843_26002384", 26001843, "T",
                           "<INV>", 26002384, 0, "INV")]


def test_multi_deleted_range_too_short_front_ins_only():
    v = cpx("chr21:23428920-23429023", 234,
            ["chr21:23428920-23428968", "chr21:23428968-23428998",
             "chr21:23428998-23429023"],
            ["UINS-84", "2", "3", "UINS-5", "2", "2", "3"])
    out = extract_multi_segment(v, stub_ref({("chr21", 23428920): "T"}))
    assert brief(out) == [("INS_chr21_23428920_23428920", 23428920, "T",
                           "<INS>", 23428920, 85, "INS")]


def test_multi_inversion_with_small_rear_insertion_dropped():
    v = cpx("chr20:13062977-13063278", 373,
            ["chr20:13062977-13063037", "chr20:13063037-13063272",
             "chr20:13063272-13063278"],
            ["1", "-2", "-1", "UINS-14"])
    out = extract_multi_segment(v, stub_ref({("chr20", 13063037): "G"}))
    assert brief(out) == [("INV_chr20_13063036_13063272", 13063036, "G",
                           "<INV>", 13063272, 0, "INV")]


def test_multi_rear_insertion_only():
    v = cpx("chr21:36680290-36680686", 665,
            ["chr21:36680290-36680331", "chr21:36680331-36680659",
             "chr21:36680659-36680686"],
            ["1", "2", "1", "UINS-249"])
    out = extract_multi_segment(v, stub_ref({("chr21", 36680686): "A"}))
    assert brief(out) == [("INS_chr21_36680686_36680686", 36680686, "A",
                           "<INS>", 36680686, 250, "INS")]


def test_multi_two_deletions_and_two_insertions():
    v = cpx("chr20:8888822-8895655", 655,
            ["chr20:8888822-8895288", "chr20:8895288-8895361",
             "chr20:8895361-8895655"],
            ["UINS-297", "2", "UINS-280"])
    out = extract_multi_segment(
        v, stub_ref({("chr20", 8888822): "G", ("chr20", 8895361): "T",
                     ("chr20", 8895655): "C"}))
    assert brief(out) == [
        ("DEL_chr20_8888822_8895287", 8888822, "G", "<DEL>",
         8895287, -6465, "DEL"),
        ("DEL_chr20_8895361_8895654", 8895361, "T", "<DEL>",
         8895654, -293, "DEL"),
        ("INS_chr20_8888822_8888822", 8888822, "G", "<INS>",
         8888822, 298, "INS"),
        ("INS_chr20_8895655_8895655", 8895655, "C", "<INS>",
         8895655, 281, "INS")]


# ------------------------------------------------------------ tool-level

def test_tool_end_to_end(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY

    seq = "ACGT" * 500
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\n" + "\n".join(
        seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")
    lines = [
        "##fileformat=VCFv4.2",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="x">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        # zero-segment 100bp insertion at 100
        "chr1\t100\tCPX_chr1:100-101\tN\t<CPX>\t.\t.\t"
        "END=101;SVTYPE=CPX;SEQ_ALT_HAPLOTYPE=" + "A" * 102 +
        ";ALT_ARRANGEMENT=UINS-100;CTG_NAMES=asm0:tig0",
        # multi-segment: segment 1 (len 100) gone -> deletion
        "chr1\t200\tCPX_chr1:200-400\tN\t<CPX>\t.\t.\t"
        "END=400;SVTYPE=CPX;SEQ_ALT_HAPLOTYPE=" + "A" * 60 +
        ";SEGMENTS=chr1:200-300,chr1:300-400;ALT_ARRANGEMENT=2"
        ";CTG_NAMES=asm0:tig0",
    ]
    cpx_vcf = tmp_path / "cpx.vcf"
    cpx_vcf.write_text("\n".join(lines) + "\n")
    prefix = str(tmp_path / "out")
    rc = TOOL_REGISTRY["CpxVariantReInterpreterSpark"](
        ["--cpx-vcf", str(cpx_vcf), "-R", str(fa),
         "--prefix-out-vcf", prefix])
    assert not rc
    one = [l for l in open(prefix + "_1_seg.vcf") if not l.startswith("#")]
    multi = [l for l in open(prefix + "_multi_seg.vcf")
             if not l.startswith("#")]
    assert len(one) == 1 and "SVTYPE=INS" in one[0]
    assert one[0].split("\t")[2] == "INS_chr1_100_100"
    assert len(multi) == 1 and "SVTYPE=DEL" in multi[0]
    assert multi[0].split("\t")[2] == "DEL_chr1_200_299"
