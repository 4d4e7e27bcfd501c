"""VQSR tests: ApplyVQSR golden vs the reference's expected output, plus an
end-to-end VariantRecalibrator -> ApplyVQSR property test on synthetic clusters."""
import os
import subprocess
import sys

import numpy as np

from conftest import reference_path

D = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/VQSR")


def _run(tool, args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", tool] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    return r


def _data_lines(path):
    with open(path) as fh:
        return [ln.rstrip("\n") for ln in fh if not ln.startswith("##")]


def test_apply_vqsr_both_mode_golden(tmp_path):
    out = str(tmp_path / "out.vcf")
    _run("ApplyVQSR", ["-V", f"{D}/VQSR.mixedTest.input.vcf",
                       "--recal-file", f"{D}/VQSR.mixedTest.recal.vcf",
                       "--tranches-file", f"{D}/VQSR.mixedTest.tranches",
                       "-mode", "BOTH", "-L", "20:1000100-1000500", "-O", out])
    assert _data_lines(out) == _data_lines(f"{D}/expected/applySNPAndIndelResult.vcf")


def test_apply_vqsr_exclude_filtered(tmp_path):
    out = str(tmp_path / "out.vcf")
    _run("ApplyVQSR", ["-V", f"{D}/VQSR.mixedTest.input.vcf",
                       "--recal-file", f"{D}/VQSR.mixedTest.recal.vcf",
                       "--tranches-file", f"{D}/VQSR.mixedTest.tranches",
                       "-mode", "BOTH", "-L", "20:1000100-1000500",
                       "--exclude-filtered",
                       "--truth-sensitivity-filter-level", "90.0", "-O", out])
    for ln in _data_lines(out)[1:]:
        assert ln.split("\t")[6] in ("PASS", "."), ln


def _write_vcf(path, rows, infos=("QD", "FS", "MQ")):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        for k in infos:
            fh.write(f'##INFO=<ID={k},Number=1,Type=Float,Description="x">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def test_variant_recalibrator_end_to_end(tmp_path):
    rng = np.random.default_rng(12)
    rows = []
    truth_rows = []
    # good cluster: QD~20, FS~2, MQ~60; bad cluster: QD~2, FS~30, MQ~30
    n_good, n_bad = 400, 400
    pos = 1000
    for i in range(n_good):
        qd, fs, mq = rng.normal(20, 2), abs(rng.normal(2, 1)), rng.normal(60, 2)
        rows.append(("20", pos, ".", "A", "G", 100, ".",
                     f"QD={qd:.2f};FS={fs:.2f};MQ={mq:.2f}"))
        if i % 2 == 0:  # half the good sites are in the training/truth resource
            truth_rows.append(("20", pos, ".", "A", "G", 100, ".", "."))
        pos += 10
    for i in range(n_bad):
        qd, fs, mq = abs(rng.normal(2, 1)), rng.normal(30, 5), rng.normal(30, 5)
        rows.append(("20", pos, ".", "A", "T", 50, ".",
                     f"QD={qd:.2f};FS={fs:.2f};MQ={mq:.2f}"))
        pos += 10

    input_vcf = str(tmp_path / "input.vcf")
    truth_vcf = str(tmp_path / "truth.vcf")
    _write_vcf(input_vcf, rows)
    _write_vcf(truth_vcf, truth_rows)

    recal = str(tmp_path / "out.recal.vcf")
    tranches = str(tmp_path / "out.tranches")
    _run("VariantRecalibrator",
         ["-V", input_vcf, "-O", recal, "--tranches-file", tranches,
          "-an", "QD", "-an", "FS", "-an", "MQ", "-mode", "SNP",
          "--max-gaussians", "2",
          "--rscript-file", str(tmp_path / "plots.R"),
          "--output-model", str(tmp_path / "model.report"),
          "--resource:truthres,known=false,training=true,truth=true,prior=15.0", truth_vcf])

    # --output-model GATKReport has both model tables; --rscript-file written
    model_text = open(str(tmp_path / "model.report")).read()
    assert "PositiveModelMeans" in model_text and "NegativeModelCovariances" in model_text
    assert (tmp_path / "plots.R").exists()

    # recal VCF has a record per input site with VQSLOD + culprit
    lods = {}
    with open(recal) as fh:
        for ln in fh:
            if ln.startswith("#"):
                continue
            f = ln.split("\t")
            info = dict(kv.split("=") for kv in f[7].split(";") if "=" in kv)
            lods[int(f[1])] = float(info["VQSLOD"])
    assert len(lods) == n_good + n_bad
    good_lods = [lods[1000 + 10 * i] for i in range(n_good)]
    bad_lods = [lods[1000 + 10 * (n_good + i)] for i in range(n_bad)]
    # good cluster scores above bad cluster almost everywhere
    assert np.median(good_lods) > np.median(bad_lods) + 3
    frac_sep = np.mean([g > np.percentile(bad_lods, 95) for g in good_lods])
    assert frac_sep > 0.9

    # tranches: monotonically decreasing min VQSLOD with increasing sensitivity
    from gatk_tpu.vqsr.tranches import read_tranches

    ts = read_tranches(tranches)
    assert len(ts) >= 3
    lods_by_ts = [t.min_vqslod for t in ts]
    assert all(a >= b for a, b in zip(lods_by_ts, lods_by_ts[1:]))

    # ApplyVQSR at 99% TS keeps nearly all good sites PASS and filters most bad
    filtered_vcf = str(tmp_path / "filtered.vcf")
    _run("ApplyVQSR", ["-V", input_vcf, "--recal-file", recal,
                       "--tranches-file", tranches, "-mode", "SNP",
                       "--truth-sensitivity-filter-level", "99.0", "-O", filtered_vcf])
    statuses = {}
    for ln in _data_lines(filtered_vcf)[1:]:
        f = ln.split("\t")
        statuses[int(f[1])] = f[6]
    good_pass = np.mean([statuses[1000 + 10 * i] == "PASS" for i in range(n_good)])
    bad_pass = np.mean([statuses[1000 + 10 * (n_good + i)] == "PASS" for i in range(n_bad)])
    assert good_pass > 0.95
    assert bad_pass < 0.1
