#!/usr/bin/env python
"""Benchmark: PairHMM GCUPS on TPU vs CPU f64 baseline (GATK-Java-class).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is useful (unpadded) cell-updates/sec of the Pallas PairHMM kernel on
realistic HaplotypeCaller shapes (151bp reads x 400bp haplotypes, 8192 pairs).
Baseline is the host float64 LoglessPairHMM reference (single-core numpy, the same
algorithm class as GATK's Java fallback), measured on a subset and scaled.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    from gatk_tpu.ops import pairhmm_host, pairhmm_tpu

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    R, H, NP = 151, 400, 8192
    n_reads, n_haps = 64, 16
    hap_master = bases[rng.integers(0, 4, H)]
    haps = []
    for _ in range(n_haps):
        h = hap_master.copy()
        idx = rng.integers(0, H, 3)
        h[idx] = bases[rng.integers(0, 4, 3)]
        haps.append(h.tobytes())
    # reads are noisy subsequences of haplotypes, like real HC data
    reads = []
    for k in range(n_reads):
        h = np.frombuffer(haps[k % n_haps], np.uint8)
        start = int(rng.integers(0, H - R))
        rb = h[start : start + R].copy()
        rb[rng.integers(0, R, 2)] = bases[rng.integers(0, 4, 2)]
        reads.append(
            dict(
                bases=rb.tobytes(),
                rq=rng.integers(20, 40, R).astype(np.uint8),
                iq=np.full(R, 45, np.uint8),
                dq=np.full(R, 45, np.uint8),
                gcp=np.full(R, 10, np.uint8),
            )
        )
    ri = np.tile(np.arange(n_reads), NP // n_reads)[:NP]
    hi = np.repeat(np.arange(n_haps), NP // n_haps)[:NP]

    packed, rp, hmax, n = pairhmm_tpu.pack_batch(reads, haps, ri, hi)
    args = (
        packed["rbase"], packed["rq"], packed["iq"], packed["dq"], packed["gcp"],
        packed["e"], packed["rlen"], packed["hlen"],
    )
    interpret = jax.default_backend() == "cpu"
    # compile + warmup (the axon relay dispatches asynchronously and
    # block_until_ready may return early, so timing must pipeline dispatches and
    # fetch every result)
    dev_args = [jax.device_put(a) for a in args]
    np.asarray(pairhmm_tpu._pairhmm_call(*dev_args, rp=rp, hmax=hmax, interpret=interpret))
    iters = 1 if interpret else 10
    t0 = time.time()
    outs = [
        pairhmm_tpu._pairhmm_call(*dev_args, rp=rp, hmax=hmax, interpret=interpret)
        for _ in range(iters)
    ]
    vals = [np.asarray(o) for o in outs]
    dt = (time.time() - t0) / iters
    cells = NP * R * H
    tpu_gcups = cells / dt / 1e9
    # sanity: kernel must produce finite, non-floor results on realistic data
    frac_ok = float(np.mean(vals[0][0, :NP] > pairhmm_tpu.MIN_ACCEPTED_LOG10))
    if frac_ok < 0.5:
        print(f"WARNING: only {frac_ok:.0%} of pairs above f32 floor", file=sys.stderr)

    # baseline: host f64 reference on a subset (also a numeric cross-check)
    n_base = 32
    t0 = time.time()
    expected = []
    for k in range(n_base):
        r = reads[int(ri[k])]
        expected.append(pairhmm_host.compute_log10_likelihood(
            haps[int(hi[k])], r["bases"], r["rq"], r["iq"], r["dq"], r["gcp"]
        ))
    base_dt = time.time() - t0
    base_gcups = n_base * R * H / base_dt / 1e9
    got = np.asarray(vals[0][0, :n_base], np.float64)
    mask = np.asarray(expected) > pairhmm_tpu.MIN_ACCEPTED_LOG10
    max_err = float(np.abs(got[mask] - np.asarray(expected)[mask]).max()) if mask.any() else 0.0
    if max_err > 1e-3:
        print(f"WARNING: kernel deviates from host f64 by {max_err:.2e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "pairhmm_useful_gcups",
                "value": round(tpu_gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(tpu_gcups / base_gcups, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
