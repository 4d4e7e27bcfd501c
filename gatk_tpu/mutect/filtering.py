"""FilterMutectCalls: probabilistic somatic call filtering.

Reference behavior: mutect/filtering/Mutect2FilteringEngine.java + the
Mutect2Filter subclasses (error probabilities combined across filters; the
threshold is learned to optimize the F score, ThresholdCalculator.java) and
mutect/clustering/SomaticClusteringModel.java (somatic prior estimation).

This implementation covers the hard filters computable from the M2 annotations
we emit (MBQ/MMQ/MPOS/ECNT/TLOD/AF/SB) plus the TLOD-posterior weak-evidence
filter with an EM-estimated log prior — the germline/contamination/orientation
resources-dependent filters hook in here when their inputs are provided.
"""
from __future__ import annotations

import math

import numpy as np

# filter names (GATKVCFConstants)
WEAK_EVIDENCE = "weak_evidence"
BASE_QUAL = "base_qual"
MAP_QUAL = "map_qual"
POSITION = "position"
CLUSTERED_EVENTS = "clustered_events"
MULTIALLELIC = "multiallelic"
LOW_ALLELE_FRACTION = "low_allele_fraction"
SLIPPAGE = "slippage"
STRAND_BIAS = "strand_bias"
ORIENTATION = "orientation"  # READ_ORIENTATION_ARTIFACT_FILTER_NAME

DEFAULT_MIN_MEDIAN_BASE_QUALITY = 20
DEFAULT_MIN_MEDIAN_MAPPING_QUALITY = 20  # mito mode uses 20; default 20
DEFAULT_MIN_MEDIAN_READ_POSITION = 1
DEFAULT_MAX_EVENTS_IN_REGION = 2
DEFAULT_MAX_ALT_ALLELE_COUNT = 1
DEFAULT_MIN_AF = 0.0


def _strand_artifact_prob(sb):
    """Simple symmetric strand-imbalance probability: alt reads all on one
    strand while ref covers both (approximation of the learned strand filter)."""
    ref_f, ref_r, alt_f, alt_r = sb
    alt = alt_f + alt_r
    if alt < 10 or (alt_f and alt_r):
        return 0.0
    if (ref_f and ref_r) and (alt_f == 0 or alt_r == 0):
        # binomial tail of all-one-strand under strand fraction from ref
        p = max(min(ref_f / (ref_f + ref_r), 0.99), 0.01)
        one_sided = p if alt_r == 0 else (1 - p)
        return max(0.0, 1.0 - 2 * (one_sided ** alt))
    return 0.0


class FilterMutectCallsEngine:
    def __init__(self, min_mbq=DEFAULT_MIN_MEDIAN_BASE_QUALITY,
                 min_mmq=DEFAULT_MIN_MEDIAN_MAPPING_QUALITY,
                 min_mpos=DEFAULT_MIN_MEDIAN_READ_POSITION,
                 max_events=DEFAULT_MAX_EVENTS_IN_REGION,
                 max_alt_alleles=DEFAULT_MAX_ALT_ALLELE_COUNT,
                 min_af=DEFAULT_MIN_AF,
                 mitochondria_mode=False,
                 orientation_priors=None, reference=None):
        self.min_mbq = min_mbq
        self.min_mmq = min_mmq
        self.min_mpos = min_mpos
        self.max_events = max_events
        self.max_alt_alleles = max_alt_alleles
        self.min_af = min_af
        self.mitochondria_mode = mitochondria_mode
        # {sample: ArtifactPriorCollection} from LearnReadOrientationModel + the
        # reference for 3-mer context lookup (ReadOrientationFilter.java)
        self.orientation_priors = orientation_priors or {}
        self.reference = reference
        self.log10_prior = -6.0  # initial somatic prior; EM-updated in learn pass

    # ---------------- per-variant error probabilities ----------------

    def hard_filters(self, v):
        """Set of failed hard filters for a variant record."""
        failed = set()
        info = v.info

        def ints(key):
            return [int(float(x)) for x in str(info.get(key, "")).split(",") if x not in ("", ".")]

        tlods = [float(x) for x in str(info.get("TLOD", "")).split(",") if x]
        mbq = ints("MBQ")
        mmq = ints("MMQ")
        mpos = ints("MPOS")
        # allele-level: filter only if ALL alt alleles fail (site-level verdict)
        if mbq[1:] and all(q < self.min_mbq for q in mbq[1:]):
            failed.add(BASE_QUAL)
        if mmq[1:] and all(q < self.min_mmq for q in mmq[1:]) and v.is_snp():
            failed.add(MAP_QUAL)
        if mpos and all(p < self.min_mpos for p in mpos):
            failed.add(POSITION)
        # clustered_events and multiallelic are not applied in mitochondria mode
        # (Mutect2FilteringEngine.java:314-321)
        if not self.mitochondria_mode:
            if int(info.get("ECNT", 1)) > self.max_events:
                failed.add(CLUSTERED_EVENTS)
            if len(v.alts) > self.max_alt_alleles + 1:
                failed.add(MULTIALLELIC)
        if self.min_af > 0 and v.samples:
            afs = [float(x) for x in v.samples[0].get("AF", "0").split(",")]
            if all(a < self.min_af for a in afs):
                failed.add(LOW_ALLELE_FRACTION)
        if v.samples and "SB" in v.samples[0]:
            sb = [int(x) for x in v.samples[0]["SB"].split(",")]
            if _strand_artifact_prob(sb) > 0.99:
                failed.add(STRAND_BIAS)
        return failed, tlods

    def orientation_artifact_probability(self, v, tlods):
        """Weighted-median posterior artifact probability over tumor genotypes
        (ReadOrientationFilter.calculateErrorProbability; single tumor sample ->
        its posterior directly)."""
        if not self.orientation_priors or self.reference is None or not v.samples:
            return 0.0
        if not v.is_snp() or not tlods:
            return 0.0
        from .orientation import orientation_artifact_probability as oap
        g = v.samples[0]
        if "F1R2" not in g or "F2R1" not in g:
            return 0.0
        alt_index = int(max(range(len(tlods)), key=lambda i: tlods[i]))
        alt_base = v.alts[alt_index]
        if len(alt_base) != 1:
            return 0.0
        try:
            ctx = self.reference.fetch_bytes(v.contig, v.pos - 1, v.pos + 2).decode()
        except Exception:
            return 0.0
        f1r2 = [int(x) for x in g["F1R2"].split(",")]
        f2r1 = [int(x) for x in g["F2R1"].split(",")]
        coll = next(iter(self.orientation_priors.values()))
        return oap(coll, ctx, alt_base, f1r2, f2r1, alt_index)

    def error_probability(self, tlods):
        """Weak-evidence error probability from the TLOD posterior with the
        learned somatic log prior (SomaticClusteringModel simplification)."""
        if not tlods:
            return 0.0
        best = max(tlods)
        log10_odds = min(best + self.log10_prior, 300.0)
        return 1.0 / (1.0 + 10.0 ** log10_odds)

    # ---------------- passes ----------------

    def learn(self, variants):
        """Estimate the somatic prior by EM over the TLOD mixture."""
        tlods = []
        for v in variants:
            t = [float(x) for x in str(v.info.get("TLOD", "")).split(",") if x]
            if t:
                tlods.append(max(t))
        if not tlods:
            return
        prior = 10.0 ** self.log10_prior
        for _ in range(10):
            resp = [1.0 / (1.0 + (1 - prior) / max(prior * 10.0 ** min(t, 300.0), 1e-300))
                    for t in tlods]
            prior = min(max(float(np.mean(resp)), 1e-8), 0.5)
        self.log10_prior = math.log10(prior)

    def apply(self, variants, threshold=0.5):
        """Assign FILTER fields in place; returns (n_pass, n_filtered)."""
        n_pass = 0
        n_filt = 0
        for v in variants:
            failed, tlods = self.hard_filters(v)
            if self.error_probability(tlods) > threshold:
                failed.add(WEAK_EVIDENCE)
            if self.orientation_artifact_probability(v, tlods) > threshold:
                failed.add(ORIENTATION)
            if failed:
                v.filters = tuple(sorted(failed))
                n_filt += 1
            else:
                v.filters = ("PASS",)
                n_pass += 1
        return n_pass, n_filt
