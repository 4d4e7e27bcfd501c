"""Read quality preparation for PairHMM (PairHMMLikelihoodCalculationEngine's
modifyReadQualities/applyPCRErrorModel/capMinimumReadQualities equivalents).

Reference behavior: haplotypecaller/PairHMMLikelihoodCalculationEngine.java:283-375
(PCR CONSERVATIVE rateFactor=3.0, INITIAL_QSCORE=40, MIN_ADJUSTED_QSCORE=10,
base-qual cap to MAPQ, threshold 18 -> fixed 6) and
ReadLikelihoodCalculationEngine.findTandemRepeatUnits :193-252.
"""
from __future__ import annotations

import math

import numpy as np

DEFAULT_GCP = 10
DEFAULT_INS_GOP = 45
DEFAULT_DEL_GOP = 45
BASE_QUALITY_SCORE_THRESHOLD = 18
MIN_USABLE_Q = 6
MIN_ADJUSTED_QSCORE = 10
INITIAL_QSCORE = 40.0
MAX_STR_UNIT_LENGTH = 8
MAX_REPEAT_LENGTH = 20
CONSERVATIVE_RATE_FACTOR = 3.0

_PCR_CACHE = {}


def pcr_error_cache(rate_factor: float = CONSERVATIVE_RATE_FACTOR) -> np.ndarray:
    key = rate_factor
    if key not in _PCR_CACHE:
        i = np.arange(MAX_REPEAT_LENGTH + 1, dtype=np.float64)
        q = np.floor(INITIAL_QSCORE - np.exp(i / (rate_factor * math.pi)) + 1.0 + 0.5)
        _PCR_CACHE[key] = np.maximum(MIN_ADJUSTED_QSCORE, q).astype(np.uint8)
    return _PCR_CACHE[key]


def _num_repetitions(unit: bytes, s: bytes, leading: bool) -> int:
    ul = len(unit)
    n = len(s)
    if n == 0:
        return 0
    count = 0
    if leading:
        start = 0
        while start + ul <= n and s[start : start + ul] == unit:
            count += 1
            start += ul
    else:
        end = n
        while end - ul >= 0 and s[end - ul : end] == unit:
            count += 1
            end -= ul
    return count


def find_tandem_repeat_length(bases: bytes, offset: int) -> int:
    """Repeat length at read offset (findTandemRepeatUnits, returns maxRL)."""
    best_bw_unit = bases[offset : offset + 1]
    max_bw = 0
    for ul in range(1, MAX_STR_UNIT_LENGTH + 1):
        if offset + 1 - ul < 0:
            break
        unit = bases[offset - ul + 1 : offset + 1]
        max_bw = _num_repetitions(unit, bases[: offset + 1], leading=False)
        if max_bw > 1:
            best_bw_unit = unit
            break
    best_unit = best_bw_unit
    max_rl = max_bw
    if offset < len(bases) - 1:
        best_fw_unit = bases[offset + 1 : offset + 2]
        max_fw = 0
        for ul in range(1, MAX_STR_UNIT_LENGTH + 1):
            if offset + ul + 1 > len(bases):
                break
            unit = bases[offset + 1 : offset + 1 + ul]
            max_fw = _num_repetitions(unit, bases[offset + 1 :], leading=True)
            if max_fw > 1:
                best_fw_unit = unit
                break
        if best_fw_unit == best_bw_unit:
            max_rl = max_bw + max_fw
        else:
            max_bw2 = _num_repetitions(best_fw_unit, bases[: offset + 1], leading=False)
            max_rl = max_fw + max_bw2
    return min(max_rl, MAX_REPEAT_LENGTH)


def apply_pcr_error_model(bases: bytes, ins_quals: np.ndarray, del_quals: np.ndarray,
                          rate_factor: float = CONSERVATIVE_RATE_FACTOR):
    cache = pcr_error_cache(rate_factor)
    for i in range(1, len(bases)):
        rl = find_tandem_repeat_length(bases, i - 1)
        cap = cache[rl]
        if ins_quals[i - 1] > cap:
            ins_quals[i - 1] = cap
        if del_quals[i - 1] > cap:
            del_quals[i - 1] = cap


def prepare_read_for_pairhmm(read, pcr_error_model: str = "CONSERVATIVE"):
    """Return dict(bases, rq, iq, dq, gcp) ready for the PairHMM kernel."""
    bases = bytes(read.bases)
    rq = read.quals.astype(np.int32).copy()
    bi = read.tags.get("BI")
    bd = read.tags.get("BD")
    n = len(bases)
    iq = (
        np.frombuffer(bi.encode(), np.uint8).astype(np.int32) - 33
        if isinstance(bi, str)
        else np.full(n, DEFAULT_INS_GOP, np.int32)
    )
    dq = (
        np.frombuffer(bd.encode(), np.uint8).astype(np.int32) - 33
        if isinstance(bd, str)
        else np.full(n, DEFAULT_DEL_GOP, np.int32)
    )
    if pcr_error_model == "CONSERVATIVE":
        apply_pcr_error_model(bases, iq, dq)
    elif pcr_error_model == "AGGRESSIVE":
        apply_pcr_error_model(bases, iq, dq, 2.0)
    # cap base qual by mapping quality, then threshold
    rq = np.minimum(rq, read.mapq)
    rq = np.where(rq < BASE_QUALITY_SCORE_THRESHOLD, MIN_USABLE_Q, rq)
    iq = np.where(iq < MIN_USABLE_Q, MIN_USABLE_Q, iq)
    dq = np.where(dq < MIN_USABLE_Q, MIN_USABLE_Q, dq)
    return dict(
        bases=bases,
        rq=rq.astype(np.uint8),
        iq=iq.astype(np.uint8),
        dq=dq.astype(np.uint8),
        gcp=np.full(n, DEFAULT_GCP, np.uint8),
    )
