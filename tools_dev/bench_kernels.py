#!/usr/bin/env python
"""Dev harness: sweep PairHMM kernel variants on the real TPU.

Usage: python tools_dev/bench_kernels.py [--np 8192]
Reports GCUPS (useful cells = NP*R*H) for each variant at the bench.py shape.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np", type=int, default=8192)
    ap.add_argument("--r", type=int, default=151)
    ap.add_argument("--h", type=int, default=400)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from gatk_tpu.ops import pairhmm_tpu as pt

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    R, H, NP = args.r, args.h, getattr(args, "np")
    n_reads, n_haps = 64, 16
    hap_master = bases[rng.integers(0, 4, H)]
    haps = []
    for _ in range(n_haps):
        h = hap_master.copy()
        idx = rng.integers(0, H, 3)
        h[idx] = bases[rng.integers(0, 4, 3)]
        haps.append(h.tobytes())
    reads = []
    for k in range(n_reads):
        h = np.frombuffer(haps[k % n_haps], np.uint8)
        start = int(rng.integers(0, H - R))
        rb = h[start : start + R].copy()
        rb[rng.integers(0, R, 2)] = bases[rng.integers(0, 4, 2)]
        reads.append(dict(bases=rb.tobytes(), rq=rng.integers(20, 40, R).astype(np.uint8),
                          iq=np.full(R, 45, np.uint8), dq=np.full(R, 45, np.uint8),
                          gcp=np.full(R, 10, np.uint8)))
    ri = np.tile(np.arange(n_reads), NP // n_reads)[:NP]
    hi = np.repeat(np.arange(n_haps), NP // n_haps)[:NP]

    packed, rp, hmax, n = pt.pack_batch(reads, haps, ri, hi)
    pair_args = tuple(jax.device_put(packed[k]) for k in
                      ("rbase", "rq", "iq", "dq", "gcp", "e", "rlen", "hlen"))
    cells = NP * R * H

    ref = None

    def timeit(name, fn):
        nonlocal ref
        try:
            out = np.asarray(fn())  # compile+check
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return
        t0 = time.time()
        outs = [fn() for _ in range(args.iters)]
        vals = [np.asarray(o) for o in outs]
        dt = (time.time() - t0) / args.iters
        g = cells / dt / 1e9
        flat = vals[0].reshape(-1)
        err = ""
        if ref is not None:
            a = flat[: len(ref)]
            m = (a > pt.MIN_ACCEPTED_LOG10) & (ref > pt.MIN_ACCEPTED_LOG10)
            err = f" maxerr={np.abs(a[m]-ref[m]).max():.2e}" if m.any() else " (no overlap)"
        print(f"{name:28s} {g:8.2f} GCUPS  ({dt*1e3:.1f} ms){err}")
        return flat

    r = timeit("v1 (128 lanes)", lambda: pt._pairhmm_call(*pair_args, rp=rp, hmax=hmax))
    if r is not None:
        ref = r[:NP]
    for lanes in (256, 512, 1024):
        timeit(f"v2 (unroll2, {lanes} lanes)",
               lambda lanes=lanes: pt._pairhmm_call_v2(*pair_args, rp=rp, hmax=hmax, lanes=lanes))
    for lanes in (256, 512, 1024):
        timeit(f"v4 (interleave, {lanes} lanes)",
               lambda lanes=lanes: pt._pairhmm_call_v4(*pair_args, rp=rp, hmax=hmax, lanes=lanes))

    # cartesian matrix kernel at the same workload (64 reads x 16 haps covers all pairs)
    pr, prp = pt.pack_reads(reads)
    e, hlen, phmax = pt.pack_haps(haps, prp)
    mat_args = tuple(jax.device_put(a) for a in
                     (pr["rbase"], pr["rq"], pr["iq"], pr["dq"], pr["gcp"], e, pr["rlen"], hlen))
    nr_pad = pr["rbase"].shape[1]
    nh_pad = e.shape[1]
    mat_cells = NP * R * H  # useful pair coverage equals full cartesian here

    def mat_fn():
        return pt._pairhmm_matrix_call(*mat_args, rp=prp, hmax=phmax)

    try:
        out = np.asarray(mat_fn())
        t0 = time.time()
        outs = [mat_fn() for _ in range(args.iters)]
        _ = [np.asarray(o) for o in outs]
        dt = (time.time() - t0) / args.iters
        # matrix computes n_reads x n_haps unique pairs; scale to the NP workload
        uniq_cells = n_reads * n_haps * R * H
        print(f"{'matrix (cartesian)':28s} {uniq_cells/dt/1e9:8.2f} GCUPS  ({dt*1e3:.1f} ms, "
              f"{nr_pad}x{nh_pad} padded)")
    except Exception as e:
        print(f"matrix FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
