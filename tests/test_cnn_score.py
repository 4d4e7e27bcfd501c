"""NVScoreVariants (1D CNN) tests: trained scores separate planted good/bad
clusters and chain into FilterVariantTranches."""
import subprocess
import pytest
import sys

import numpy as np

from conftest import reference_path

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)

MITO_REF = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito/Homo_sapiens_assembly38.mt_only.fasta")


def _run(tool, args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", tool] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr


def _write_vcf(path, rows):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        for k in ("MQ", "DP", "SOR", "FS", "QD", "MQRankSum", "ReadPosRankSum"):
            fh.write(f'##INFO=<ID={k},Number=1,Type=Float,Description="x">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def test_cnn_training_and_scoring(tmp_path):
    rng = np.random.default_rng(5)
    rows, truth_rows = [], []
    pos = 500
    for i in range(120):
        good = i % 2 == 0
        if good:
            mq, qd, fs = rng.normal(60, 1), rng.normal(20, 2), abs(rng.normal(1, 0.5))
        else:
            mq, qd, fs = rng.normal(30, 4), abs(rng.normal(2, 1)), rng.normal(30, 5)
        info = f"MQ={mq:.2f};DP=30;SOR=1.0;FS={fs:.2f};QD={qd:.2f};MQRankSum=0.0;ReadPosRankSum=0.0"
        rows.append(("chrM", pos, ".", "A", "G", 50, ".", info))
        if good:
            truth_rows.append(("chrM", pos, ".", "A", "G", 50, "PASS", "."))
        pos += 13
    inp = str(tmp_path / "in.vcf")
    truth = str(tmp_path / "truth.vcf")
    _write_vcf(inp, rows)
    _write_vcf(truth, truth_rows)

    out = str(tmp_path / "scored.vcf")
    weights = str(tmp_path / "model.npz")
    _run("NVScoreVariants", ["-V", inp, "-R", MITO_REF, "-O", out,
                             "--truth-vcf", truth, "--epochs", "80",
                             "--save-model-weights", weights])

    scores = {}
    for ln in open(out):
        if ln.startswith("#"):
            continue
        f = ln.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        scores[int(f[1])] = float(info["CNN_1D"])
    good_scores = [scores[500 + 13 * i] for i in range(0, 120, 2)]
    bad_scores = [scores[500 + 13 * i] for i in range(1, 120, 2)]
    assert np.median(good_scores) > np.median(bad_scores) + 1.0
    sep = np.mean([g > np.percentile(bad_scores, 90) for g in good_scores])
    assert sep > 0.85

    # reload weights and re-score: identical results
    out2 = str(tmp_path / "scored2.vcf")
    _run("NVScoreVariants", ["-V", inp, "-R", MITO_REF, "-O", out2,
                             "--model-weights", weights])
    assert ([l for l in open(out) if not l.startswith("##")]
            == [l for l in open(out2) if not l.startswith("##")])

    # chain into FilterVariantTranches on the CNN_1D key
    filtered = str(tmp_path / "filtered.vcf")
    _run("FilterVariantTranches", ["-V", out, "--resource", truth,
                                   "--info-key", "CNN_1D",
                                   "--snp-tranche", "95.0", "-O", filtered])
    statuses = {}
    for ln in open(filtered):
        if ln.startswith("#"):
            continue
        f = ln.split("\t")
        statuses[int(f[1])] = f[6]
    good_pass = np.mean([statuses[500 + 13 * i] == "PASS" for i in range(0, 120, 2)])
    bad_pass = np.mean([statuses[500 + 13 * i] == "PASS" for i in range(1, 120, 2)])
    assert good_pass > 0.9 and bad_pass < 0.25
