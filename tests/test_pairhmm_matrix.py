"""Cartesian matrix kernel vs host f64 reference."""
import numpy as np

from gatk_tpu.ops import pairhmm_host, pairhmm_tpu


def _mk(n_reads=6, n_haps=3, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    H = 220
    haps = []
    master = bases[rng.integers(0, 4, H)]
    for _ in range(n_haps):
        h = master.copy()
        h[rng.integers(0, H, 2)] = bases[rng.integers(0, 4, 2)]
        haps.append(h.tobytes())
    reads = []
    for k in range(n_reads):
        R = int(rng.integers(30, 140))
        h = np.frombuffer(haps[k % n_haps], np.uint8)
        s = int(rng.integers(0, H - R))
        rb = h[s : s + R].copy()
        rb[rng.integers(0, R, 2)] = bases[rng.integers(0, 4, 2)]
        reads.append(
            dict(
                bases=rb.tobytes(),
                rq=rng.integers(15, 45, R).astype(np.uint8),
                iq=np.full(R, 45, np.uint8),
                dq=np.full(R, 45, np.uint8),
                gcp=np.full(R, 10, np.uint8),
            )
        )
    return reads, haps


def test_matrix_matches_host():
    reads, haps = _mk()
    mat = pairhmm_tpu.compute_likelihood_matrix(reads, haps)
    assert mat.shape == (len(reads), len(haps))
    for r_i, r in enumerate(reads):
        for h_i, h in enumerate(haps):
            exp = pairhmm_host.compute_log10_likelihood(
                h, r["bases"], r["rq"], r["iq"], r["dq"], r["gcp"]
            )
            if exp > pairhmm_tpu.MIN_ACCEPTED_LOG10:
                np.testing.assert_allclose(mat[r_i, h_i], exp, atol=1e-4, rtol=0)


def test_matrix_floor_clamp():
    # a hopeless read floors at MIN_ACCEPTED under clamp mode
    reads = [
        dict(
            bases=b"C" * 120,
            rq=np.full(120, 40, np.uint8),
            iq=np.full(120, 45, np.uint8),
            dq=np.full(120, 45, np.uint8),
            gcp=np.full(120, 10, np.uint8),
        )
    ]
    haps = [b"A" * 300]
    mat = pairhmm_tpu.compute_likelihood_matrix(reads, haps, floor="clamp")
    assert mat[0, 0] == pairhmm_tpu.MIN_ACCEPTED_LOG10
    mat2 = pairhmm_tpu.compute_likelihood_matrix(reads, haps, floor="host")
    assert mat2[0, 0] < -100
