"""VETS (Extract/Train/ScoreVariantAnnotations) end-to-end on synthetic data."""
import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY


def _write_vcf(path, records, with_annots=True):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, alt, qd, fs in records:
            info = f"QD={qd:.2f};FS={fs:.2f}" if with_annots else "."
            fh.write(f"chr1\t{pos}\t.\t{ref}\t{alt}\t100\t.\t{info}\n")


@pytest.fixture()
def vets_run(tmp_path):
    rng = np.random.default_rng(7)
    # good SNPs: QD~N(20,2), FS~N(2,0.5); bad SNPs: QD~N(1.5,0.5), FS~N(40,5)
    good = [(1000 + i, "A", "G", rng.normal(20, 2), abs(rng.normal(2, 0.5)))
            for i in range(120)]
    bad = [(9000 + i, "C", "T", abs(rng.normal(1.5, 0.5)), rng.normal(40, 5))
           for i in range(12)]
    all_recs = sorted(good + bad)
    input_vcf = tmp_path / "input.vcf"
    _write_vcf(str(input_vcf), all_recs)
    # training resource = the good set; calibration = a subset of good
    training_vcf = tmp_path / "training.vcf"
    _write_vcf(str(training_vcf), good, with_annots=False)
    calib_vcf = tmp_path / "calib.vcf"
    _write_vcf(str(calib_vcf), good[:40], with_annots=False)
    return tmp_path, input_vcf, training_vcf, calib_vcf, good, bad


def test_vets_trio_end_to_end(vets_run):
    tmp_path, input_vcf, training_vcf, calib_vcf, good, bad = vets_run
    extract_prefix = str(tmp_path / "extract")
    rc = TOOL_REGISTRY["ExtractVariantAnnotations"]([
        "-V", str(input_vcf), "-O", extract_prefix,
        "-A", "QD", "-A", "FS",
        "--resource", "train,training=true:" + str(training_vcf),
        "--resource", "calib,calibration=true:" + str(calib_vcf)])
    assert rc == 0
    from gatk_tpu.tools.vets_tools import read_annotations_hdf5
    names, matrix, labels = read_annotations_hdf5(extract_prefix + ".annot.hdf5")
    assert names == ["QD", "FS"]
    assert matrix.shape == (len(good), 2)  # only labeled sites extracted
    assert labels["training"].sum() == len(good)
    assert labels["calibration"].sum() == 40

    train_prefix = str(tmp_path / "train")
    rc = TOOL_REGISTRY["TrainVariantAnnotationsModel"]([
        "--annotations-hdf5", extract_prefix + ".annot.hdf5",
        "-O", train_prefix])
    assert rc == 0
    import os
    assert os.path.exists(train_prefix + ".snp.scorer.pkl")
    assert os.path.exists(train_prefix + ".snp.calibrationScores.hdf5")

    score_prefix = str(tmp_path / "score")
    rc = TOOL_REGISTRY["ScoreVariantAnnotations"]([
        "-V", str(input_vcf), "-O", score_prefix,
        "-A", "QD", "-A", "FS",
        "--model-prefix", train_prefix,
        "--snp-calibration-sensitivity-threshold", "0.99"])
    assert rc == 0
    rows = [l.rstrip("\n").split("\t") for l in open(score_prefix + ".vcf")
            if not l.startswith("#")]
    by_pos = {int(r[1]): r for r in rows}
    bad_filtered = sum(1 for pos, *_ in bad if "LOW_SCORE" in by_pos[pos][6])
    good_passing = sum(1 for pos, *_ in good if by_pos[pos][6] == "PASS")
    assert bad_filtered == len(bad), "all outlier sites must be LOW_SCORE"
    assert good_passing >= 0.95 * len(good)
    # SCORE + CALIBRATION_SENSITIVITY annotated
    assert "SCORE=" in by_pos[good[0][0]][7]
    assert "CALIBRATION_SENSITIVITY=" in by_pos[good[0][0]][7]
