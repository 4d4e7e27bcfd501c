"""GenomicsDB-equivalent cohort store tests: import + gendb:// GenotypeGVCFs
equals the CombineGVCFs -> GenotypeGVCFs path (the reference's
GenomicsDBImportIntegrationTest equivalence strategy)."""
import os
import subprocess
import sys

from conftest import reference_path
from gatk_tpu.io.gvcf_store import GvcfStore

CG_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/CombineGVCFs")
MITO_REF = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito/Homo_sapiens_assembly38.mt_only.fasta")
GVCF_A = os.path.join(CG_DIR, "NA12878.MT.filtered.g.vcf")
GVCF_B = os.path.join(CG_DIR, "NA19240.MT.filtered.g.vcf")


def _run(tool, args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", tool] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr


def _data_lines(path):
    with open(path) as fh:
        return [ln.rstrip("\n") for ln in fh if not ln.startswith("##")]


def test_store_import_and_query(tmp_path):
    ws = str(tmp_path / "ws")
    _run("GenomicsDBImport", ["-V", GVCF_A, "-V", GVCF_B,
                              "--genomicsdb-workspace-path", ws])
    store = GvcfStore(ws)
    assert store.samples == ["NA12878", "NA19240"]
    samples, per_sample = store.query("MT", 300, 310)
    assert all(recs for recs in per_sample)
    for recs in per_sample:
        for r in recs:
            assert r.pos < 310 and r.end > 300


def test_incremental_import(tmp_path):
    ws = str(tmp_path / "ws")
    _run("GenomicsDBImport", ["-V", GVCF_A, "--genomicsdb-workspace-path", ws])
    _run("GenomicsDBImport", ["-V", GVCF_B, "--genomicsdb-update-workspace-path", ws])
    store = GvcfStore(ws)
    assert store.samples == ["NA12878", "NA19240"]


def _write_gvcf(path, sample, records):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        fh.write('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="ad">\n')
        fh.write('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="dp">\n')
        fh.write('##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="gq">\n')
        fh.write('##FORMAT=<ID=PL,Number=G,Type=Integer,Description="pl">\n')
        fh.write('##INFO=<ID=END,Number=1,Type=Integer,Description="end">\n')
        fh.write('##INFO=<ID=DP,Number=1,Type=Integer,Description="dp">\n')
        fh.write('##ALT=<ID=NON_REF,Description="non-ref">\n')
        fh.write(f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}\n")
        for r in records:
            fh.write("\t".join(str(x) for x in r) + "\n")


def test_gendb_genotype_gvcfs_matches_combine_path(tmp_path):
    """Synthetic PL-bearing GVCFs over chrM: gendb:// path == combine path."""
    a = str(tmp_path / "a.g.vcf")
    b = str(tmp_path / "b.g.vcf")
    # sampleA: het at 100 (G>C), ref blocks elsewhere (real chrM ref bases)
    _write_gvcf(a, "sampleA", [
        ("chrM", 1, ".", "G", "<NON_REF>", ".", ".", "END=99",
         "GT:DP:GQ:PL", "0/0:30:99:0,90,1200"),
        ("chrM", 100, ".", "G", "C,<NON_REF>", 600.0, ".", "DP=30",
         "GT:AD:DP:GQ:PL", "0/1:14,16,0:30:99:630,0,520,680,590,1200"),
        ("chrM", 101, ".", "C", "<NON_REF>", ".", ".", "END=300",
         "GT:DP:GQ:PL", "0/0:28:95:0,95,1100"),
    ])
    # sampleB: hom-var at 100, het at 200 (A>C)
    _write_gvcf(b, "sampleB", [
        ("chrM", 1, ".", "G", "<NON_REF>", ".", ".", "END=99",
         "GT:DP:GQ:PL", "0/0:25:80:0,80,1000"),
        ("chrM", 100, ".", "G", "C,<NON_REF>", 900.0, ".", "DP=28",
         "GT:AD:DP:GQ:PL", "1/1:0,28,0:28:84:950,84,0,970,90,1000"),
        ("chrM", 101, ".", "C", "<NON_REF>", ".", ".", "END=199",
         "GT:DP:GQ:PL", "0/0:26:90:0,90,1050"),
        ("chrM", 200, ".", "A", "C,<NON_REF>", 300.0, ".", "DP=26",
         "GT:AD:DP:GQ:PL", "0/1:13,13,0:26:99:330,0,310,370,350,700"),
        ("chrM", 201, ".", "A", "<NON_REF>", ".", ".", "END=300",
         "GT:DP:GQ:PL", "0/0:27:93:0,93,1080"),
    ])

    ws = str(tmp_path / "ws")
    _run("GenomicsDBImport", ["-V", a, "-V", b, "--genomicsdb-workspace-path", ws])
    out_gendb = str(tmp_path / "gendb.vcf")
    _run("GenotypeGVCFs", ["-V", f"gendb://{ws}", "-R", MITO_REF, "-O", out_gendb])

    combined = str(tmp_path / "combined.g.vcf")
    _run("CombineGVCFs", ["-V", a, "-V", b, "-R", MITO_REF, "-O", combined])
    out_classic = str(tmp_path / "classic.vcf")
    _run("GenotypeGVCFs", ["-V", combined, "-O", out_classic])

    gendb_lines = _data_lines(out_gendb)
    classic_lines = _data_lines(out_classic)
    assert len(gendb_lines) == 3  # header + 2 variant sites
    assert gendb_lines == classic_lines
    assert gendb_lines[1].split("\t")[1] == "100"
    assert gendb_lines[2].split("\t")[1] == "200"
