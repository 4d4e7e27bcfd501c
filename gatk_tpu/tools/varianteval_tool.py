"""VariantEval: callset evaluation report (stratifiers x evaluators).

Reference behavior: tools/walkers/varianteval/ — VariantEval.java drives
evaluation modules (CountVariants.java, TiTvVariantEvaluator.java,
CompOverlap.java) over stratification states (Novelty via dbSNP comp track);
output is a GATKReport of one table per evaluation module
(utils/report/GATKReport format, reused from the BQSR writer).
"""
from __future__ import annotations

import argparse

from ..cli import register_tool

TRANSITIONS = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}


class _Counts:
    def __init__(self):
        self.n_processed = 0
        self.n_called = 0
        self.n_snps = 0
        self.n_mnps = 0
        self.n_insertions = 0
        self.n_deletions = 0
        self.n_complex = 0
        self.n_symbolic = 0
        self.n_mixed = 0
        self.n_no_calls = 0
        self.n_filtered = 0
        self.n_ti = 0
        self.n_tv = 0
        self.n_comp_overlap = 0
        self.n_concordant = 0

    def add(self, v, in_comp, alleles_match):
        self.n_processed += 1
        if v.filters and v.filters != ("PASS",):
            self.n_filtered += 1
            return
        self.n_called += 1
        if v.is_snp():
            self.n_snps += 1
            for a in v.alts:
                if len(a) == 1 and a != "*" and not a.startswith("<"):
                    if (v.ref, a) in TRANSITIONS:
                        self.n_ti += 1
                    else:
                        self.n_tv += 1
        elif all(a.startswith("<") for a in v.alts if a):
            self.n_symbolic += 1
        else:
            ins = del_ = other = 0
            for a in v.alts:
                if a.startswith("<") or a == "*":
                    continue
                if len(a) > len(v.ref) and a[: len(v.ref)] == v.ref:
                    ins += 1
                elif len(a) < len(v.ref) and v.ref[: len(a)] == a:
                    del_ += 1
                elif len(a) == len(v.ref):
                    other += 1  # MNP
                else:
                    other += 1
            if ins and not del_ and not other:
                self.n_insertions += 1
            elif del_ and not ins and not other:
                self.n_deletions += 1
            elif other and len(v.ref) == len(v.alts[0]):
                self.n_mnps += 1
            else:
                self.n_mixed += 1
        if in_comp:
            self.n_comp_overlap += 1
            if alleles_match:
                self.n_concordant += 1

    @property
    def titv(self):
        return self.n_ti / self.n_tv if self.n_tv else 0.0


@register_tool("VariantEval")
def variant_eval(argv):
    """Evaluate a callset: variant counts, Ti/Tv, comp overlap, stratified by novelty."""
    from ..io import vcf as vcfio
    from ..recal.report import ReportTable

    p = argparse.ArgumentParser(description="VariantEval")
    p.add_argument("--eval", action="append", required=True)
    p.add_argument("--comp", action="append", default=[])
    p.add_argument("-D", "--dbsnp", default=None)
    p.add_argument("-O", "--output", required=True)
    args = p.parse_args(argv)

    # known sites from dbsnp + comps: (contig, pos) -> set of (ref, alt)
    known = {}
    comp_tracks = {}
    for name, paths in (("dbsnp", [args.dbsnp] if args.dbsnp else []),
                        ("comp", args.comp)):
        for path in paths:
            track = comp_tracks.setdefault(name if name != "dbsnp" else "dbsnp", {})
            for rv in vcfio.VcfReader(path):
                s = track.setdefault((rv.contig, rv.pos), set())
                for a in rv.alts:
                    s.add((rv.ref, a))
    if args.dbsnp:
        known = comp_tracks.get("dbsnp", {})

    strata = ("all", "known", "novel")
    results = {}  # (eval_name, comp_name, novelty) -> _Counts
    eval_names = []
    for path in args.eval:
        eval_name = f"eval{len(eval_names) + 1}" if len(args.eval) > 1 else "eval"
        eval_names.append(eval_name)
        comp_names = list(comp_tracks) or ["none"]
        for comp_name in comp_names:
            for s in strata:
                results[(eval_name, comp_name, s)] = _Counts()
        for v in vcfio.VcfReader(path):
            key = (v.contig, v.pos)
            is_known = key in known and any((v.ref, a) in known[key] for a in v.alts)
            novelty = "known" if is_known else "novel"
            for comp_name in comp_names:
                track = comp_tracks.get(comp_name, {})
                in_comp = key in track
                match = in_comp and any((v.ref, a) in track[key] for a in v.alts)
                for s in ("all", novelty):
                    results[(eval_name, comp_name, s)].add(v, in_comp, match)

    # ---- report ----
    count_cols = [("CountVariants", "%s"), ("CompFeatureInput", "%s"),
                  ("EvalFeatureInput", "%s"), ("Novelty", "%s"),
                  ("nProcessedLoci", "%d"), ("nCalledLoci", "%d"), ("nFilteredLoci", "%d"),
                  ("nSNPs", "%d"), ("nMNPs", "%d"), ("nInsertions", "%d"),
                  ("nDeletions", "%d"), ("nComplex", "%d"), ("nSymbolic", "%d"),
                  ("nMixed", "%d"), ("insertionDeletionRatio", "%.2f")]
    titv_cols = [("TiTvVariantEvaluator", "%s"), ("CompFeatureInput", "%s"),
                 ("EvalFeatureInput", "%s"), ("Novelty", "%s"),
                 ("nTi", "%d"), ("nTv", "%d"), ("tiTvRatio", "%.2f")]
    comp_cols = [("CompOverlap", "%s"), ("CompFeatureInput", "%s"),
                 ("EvalFeatureInput", "%s"), ("Novelty", "%s"),
                 ("nEvalVariants", "%d"), ("novelSites", "%d"),
                 ("nVariantsAtComp", "%d"), ("compRate", "%.2f"),
                 ("nConcordant", "%d"), ("concordantRate", "%.2f")]

    t_count = ReportTable("CountVariants", "Counts different classes of variants", count_cols)
    t_titv = ReportTable("TiTvVariantEvaluator", "Ti/Tv Variant Evaluator", titv_cols)
    t_comp = ReportTable("CompOverlap", "The overlap between eval and comp sites", comp_cols)

    for (eval_name, comp_name, s), c in sorted(results.items()):
        idr = (c.n_insertions / c.n_deletions) if c.n_deletions else 0.0
        t_count.add_row("CountVariants", comp_name, eval_name, s,
                        c.n_processed, c.n_called, c.n_filtered, c.n_snps, c.n_mnps,
                        c.n_insertions, c.n_deletions, c.n_complex, c.n_symbolic,
                        c.n_mixed, idr)
        t_titv.add_row("TiTvVariantEvaluator", comp_name, eval_name, s,
                       c.n_ti, c.n_tv, c.titv)
        comp_rate = 100.0 * c.n_comp_overlap / c.n_called if c.n_called else 0.0
        conc_rate = 100.0 * c.n_concordant / c.n_comp_overlap if c.n_comp_overlap else 0.0
        t_comp.add_row("CompOverlap", comp_name, eval_name, s,
                       c.n_called, c.n_called - c.n_comp_overlap, c.n_comp_overlap,
                       comp_rate, c.n_concordant, conc_rate)

    tables = [t_comp, t_count, t_titv]
    with open(args.output, "w") as fh:
        fh.write(f"#:GATKReport.v1.1:{len(tables)}\n")
        for t in tables:
            fh.write(t.render())
            fh.write("\n")
    print(f"evaluated {len(args.eval)} callset(s) -> {args.output}")
    return 0
