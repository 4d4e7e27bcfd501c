"""Flow-space PairHMM (Ultima Genomics) — host f64 reference + batched JAX path.

Reference: utils/pairhmm/FlowBasedPairHMM.java:167-241. The DP runs over flow
*keys* (homopolymer run lengths per flow) instead of bases; frame shifts happen
in discrete units of FLOW_SIZE=4 (the flow-order cycle), so:
  * match      pulls (i-1, j-1)      — next flow on both
  * insertion  pulls (i-4, j)        — a full extra flow cycle in the read
  * deletion   pulls (i,   j-4)      — a full extra flow cycle in the haplotype
Priors are the read's flow-matrix P(true hmer = hapKey[j] | flow i), nonzero only
where read/hap flow nucleotides agree — which for period-4 cyclic flow orders
confines each DP to one (j - i) mod 4 coset, letting the batched JAX version
compute dense rows safely (off-coset cells stay exactly zero).

TPU design: one lax.scan over read flows; each step is W-wide vector math plus a
stride-4 affine associative_scan for the within-row deletion recurrence; f32
with per-row renormalization (the 2^1020 logless scale is replaced by a running
log10 offset, same scheme as ops/pairhmm_tpu.py).
"""
from __future__ import annotations

import numpy as np

from . import pairhmm_model as pm
from .flow import FlowBasedHaplotype, FlowBasedRead

FLOW_SIZE = 4


def _starting_point(hap_flow_order: np.ndarray, read_flow_order: np.ndarray) -> int:
    """First haplotype flow reading the same nucleotide as the read's first flow
    (FlowBasedPairHMM.java:141-147)."""
    for i, b in enumerate(hap_flow_order):
        if b == read_flow_order[0]:
            return i
    return 0


def flow_pairhmm_log10(hap: FlowBasedHaplotype, read: FlowBasedRead) -> float:
    """Host f64 reference, mirroring FlowBasedPairHMM.java:167-241 exactly."""
    rk = read.key
    hk = hap.key
    R, H = len(rk), len(hk)
    if R == 0 or H == 0:
        return -np.inf
    pr, pc = R + 1 + FLOW_SIZE, H + 1 + FLOW_SIZE
    hap_start = _starting_point(hap.flow_order_array, read.flow_order_array)

    iq, dq, gcp = read.key_space_quals()
    trans = pm.qual_to_trans_probs(iq, dq, gcp)  # (R, 6)

    prob = read.prob_table(int(hk.max()))  # (R, max_hmer+1)
    prior = np.zeros((pr, pc))
    same = hap.flow_order_array[None, :] == read.flow_order_array[:, None]
    prior[1 + FLOW_SIZE:, 1 + FLOW_SIZE:] = np.where(same, prob[:, hk], 0.0)

    m = np.zeros((pr, pc))
    ins = np.zeros((pr, pc))
    d = np.zeros((pr, pc))
    init = 2.0 ** 1020 / H
    d[: FLOW_SIZE + 1, :] = init

    MM, IM = pm.MATCH_TO_MATCH, pm.INDEL_TO_MATCH
    MI, II = pm.MATCH_TO_INSERTION, pm.INSERTION_TO_INSERTION
    MD, DD = pm.MATCH_TO_DELETION, pm.DELETION_TO_DELETION
    for i in range(1 + FLOW_SIZE, pr):
        t = trans[i - FLOW_SIZE - 1]
        for j in range((hap_start + i) % FLOW_SIZE + FLOW_SIZE, pc, FLOW_SIZE):
            m[i, j] = prior[i, j] * (
                m[i - 1, j - 1] * t[MM]
                + ins[i - 1, j - 1] * t[IM]
                + d[i - 1, j - 1] * t[IM]
            )
            ins[i, j] = m[i - FLOW_SIZE, j] * t[MI] + ins[i - FLOW_SIZE, j] * t[II]
            d[i, j] = m[i, j - FLOW_SIZE] * t[MD] + d[i, j - FLOW_SIZE] * t[DD]
    total = m[pr - 1, 1:].sum() + ins[pr - 1, 1:].sum()
    if total <= 0:
        return -np.inf
    return float(np.log10(total) - pm.INITIAL_CONDITION_LOG10)


# ---------------------------------------------------------------------------
# Batched JAX path
# ---------------------------------------------------------------------------


def _pack_flow_batch(haps, reads, pairs):
    """Host-side packing for the batched device DP.

    pairs: list of (read_idx, hap_idx). Returns dict of padded arrays."""
    B = len(pairs)
    Rp = max(len(reads[ri].key) for ri, _ in pairs)
    Hp = max(len(haps[hi].key) for _, hi in pairs)
    W = Hp + 1 + FLOW_SIZE
    prior = np.zeros((B, Rp, W), dtype=np.float32)
    trans = np.zeros((B, Rp, 6), dtype=np.float32)
    rlen = np.zeros(B, dtype=np.int32)
    hlen = np.zeros(B, dtype=np.int32)
    ks_cache = {}
    for b, (ri, hi) in enumerate(pairs):
        rd, hp = reads[ri], haps[hi]
        R, H = len(rd.key), len(hp.key)
        rlen[b], hlen[b] = R, H
        if ri not in ks_cache:
            iq, dq, gc = rd.key_space_quals()
            ks_cache[ri] = pm.qual_to_trans_probs(iq, dq, gc)
        trans[b, :R] = ks_cache[ri]
        prob = rd.prob_table(int(hp.key.max()) if H else 0)
        same = hp.flow_order_array[None, :] == rd.flow_order_array[:, None]
        # prior rows for DP rows i=F+1.. map to read flow i-F-1; columns j=F+1..
        prior[b, :R, 1 + FLOW_SIZE: 1 + FLOW_SIZE + H] = np.where(
            same, prob[:, hp.key], 0.0)
    return dict(prior=prior, trans=trans, rlen=rlen, hlen=hlen,
                hap_start=np.zeros(B, dtype=np.int32), W=W, Rp=Rp)


def flow_pairhmm_batch_jax(prior, trans, rlen, hlen, hap_start=None):
    """Batched flow PairHMM on device. prior (B,Rp,W) f32 already coset-masked,
    trans (B,Rp,6), rlen/hlen (B,). Returns (B,) f32 log10 likelihoods.

    Scan over read flows; carry = 4-row M/I history + previous D row + running
    log10 scale. Per-row renormalization replaces the f64 2^1020 scale."""
    import jax
    import jax.numpy as jnp

    B, Rp, W = prior.shape
    Wg = -(-W // FLOW_SIZE)
    Wpad = Wg * FLOW_SIZE

    def pad_w(x):
        return jnp.pad(x, ((0, 0), (0, Wpad - W)))

    prior = jnp.asarray(prior)
    trans = jnp.asarray(trans)
    hlenj = jnp.asarray(hlen)
    init_d = pad_w(jnp.ones((B, W), jnp.float32) / jnp.maximum(
        hlenj[:, None].astype(jnp.float32), 1.0))

    MM, IM = pm.MATCH_TO_MATCH, pm.INDEL_TO_MATCH
    MI, II = pm.MATCH_TO_INSERTION, pm.INSERTION_TO_INSERTION
    MD, DD = pm.MATCH_TO_DELETION, pm.DELETION_TO_DELETION

    def shift1(x):  # x[..., j-1]
        return jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]

    def shift4(x):
        return jnp.pad(x, ((0, 0), (FLOW_SIZE, 0)))[:, :-FLOW_SIZE]

    def step(carry, xs):
        m_hist, i_hist, d_prev, acc = carry  # (4,B,Wp),(4,B,Wp),(B,Wp),(B,)
        prior_row, t = xs  # (B,W),(B,6)
        prior_row = pad_w(prior_row)
        t_mm = t[:, MM:MM + 1]
        t_im = t[:, IM:IM + 1]
        m_row = prior_row * (shift1(m_hist[3]) * t_mm
                             + (shift1(i_hist[3]) + shift1(d_prev)) * t_im)
        i_row = m_hist[0] * t[:, MI:MI + 1] + i_hist[0] * t[:, II:II + 1]
        # deletion: d[g] = m_row[g-1]*MD + d[g-1]*DD along stride-4 groups,
        # 4 independent phase chains, row-start d = 0
        a = shift4(m_row) * t[:, MD:MD + 1]  # (B, Wp)
        ag = a.reshape(B, Wg, FLOW_SIZE).transpose(1, 0, 2)  # (G,B,4)
        dd = jnp.broadcast_to(t[:, DD:DD + 1, None], (B, 1, FLOW_SIZE))
        ddg = jnp.broadcast_to(dd, (B, Wg, FLOW_SIZE)).transpose(1, 0, 2)

        def combine(x, y):
            ax, bx = x
            ay, by = y
            return ax * ay, by + ay * bx

        _, dg = jax.lax.associative_scan(combine, (ddg, ag), axis=0)
        d_row = dg.transpose(1, 0, 2).reshape(B, Wpad)
        # record this row's (M+I) sum in the current scale, with its offset
        row_sum = m_row.sum(axis=1) + i_row.sum(axis=1)
        y = (row_sum, acc)
        # renormalize the whole carried state so f32 never underflows to zero
        c = jnp.maximum(jnp.maximum(m_row.max(axis=1), i_row.max(axis=1)),
                        d_row.max(axis=1))
        c = jnp.where(c > 0, c, 1.0)
        inv = (1.0 / c)[:, None]
        m_hist = jnp.stack([m_hist[1] * inv, m_hist[2] * inv, m_hist[3] * inv,
                            m_row * inv])
        i_hist = jnp.stack([i_hist[1] * inv, i_hist[2] * inv, i_hist[3] * inv,
                            i_row * inv])
        return (m_hist, i_hist, d_row * inv, acc + jnp.log10(c)), y

    zeros4 = jnp.zeros((4, B, Wpad), jnp.float32)
    carry0 = (zeros4, zeros4, init_d, jnp.zeros(B, jnp.float32))
    xs = (prior.transpose(1, 0, 2), trans.transpose(1, 0, 2))
    _, (sums, accs) = jax.lax.scan(step, carry0, xs)
    # final row is i = rlen+F  <->  scan step k = rlen-1
    k = jnp.clip(jnp.asarray(rlen) - 1, 0, Rp - 1)
    bi = jnp.arange(B)
    total = sums[k, bi]
    out = jnp.where(total > 0, jnp.log10(jnp.maximum(total, 1e-38)), -jnp.inf)
    return out + accs[k, bi]


def compute_flow_likelihood_matrix(haps, reads) -> np.ndarray:
    """(n_reads, n_haps) float64 log10 matrix via the batched device DP."""
    pairs = [(ri, hi) for ri in range(len(reads)) for hi in range(len(haps))]
    if not pairs:
        return np.zeros((len(reads), len(haps)))
    packed = _pack_flow_batch(haps, reads, pairs)
    out = flow_pairhmm_batch_jax(packed["prior"], packed["trans"],
                                 packed["rlen"], packed["hlen"])
    return np.asarray(out, np.float64).reshape(len(reads), len(haps))
