"""Batched PairHMM as a Pallas TPU kernel.

Replaces GATK's native AVX/OpenMP PairHMM (utils/pairhmm/VectorLoglessPairHMM.java,
Intel GKL) with an anti-diagonal wavefront DP over batches of read×haplotype pairs:

  * lanes (last dim, 128)  = independent pairs
  * sublanes (first dim)   = read positions (the wavefront state vectors)
  * grid                   = pair blocks

The logless recurrence (utils/pairhmm/LoglessPairHMM.java:48-70) runs in f32 with the
initial condition rescaled from 2^1020 to 2^100 and the final-row readout folded into
a log-space accumulator.  f32 cannot span the full dynamic range of very poor
alignments (a single anti-diagonal holds both the free-deletion boundary value and
path products ~10^-500 below it), so — exactly like the reference's native kernel
(Intel GKL: f32 by default, recompute-in-double below MIN_ACCEPTED;
PairHMMNativeArgumentCollection.java:14-16) — results below MIN_ACCEPTED_LOG10 are
recomputed on the host in f64.  Such pairs are rare in practice and are dominated by
read-disqualification thresholds downstream (AlleleLikelihoods.normalizeLikelihoods).

Variable lengths: reads shorter than the block length are padded with rows whose
transitions are (tMI=1, tII=1, prior=0), which makes the insertion state carry
M[r][j]+X[r][j] unchanged to the last padded row — so the final-row readout is the
same fixed row for every pair.  Haplotype padding is masked at readout; padded cells
cannot influence valid cells because dependencies only flow toward larger j.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN10 = math.log(10.0)
LN2 = math.log(2.0)
N_BASE = ord("N")
TRISTATE_CORRECTION = 3.0
LANES = 128
INIT_LOG2 = 100  # initial condition 2^100 / hapLen (vs Java's 2^1020; log-corrected)
MIN_ACCEPTED_LOG10 = -28.0  # below this, recompute in f64 on host (GKL contract)
NEG_INF = -1e30
# bottom padding rows in the packed hap array so the group-of-8 kernel (v5) can
# load its per-group hap window at an 8-aligned sublane offset (Mosaic requires
# dynamic sublane starts to be provable multiples of 8 for wide-lane loads)
E_OFF = 16


def _roll1(x):
    """Shift +1 along sublane axis: out[i] = x[i-1]; row 0 becomes garbage (masked)."""
    return pltpu.roll(x, shift=1, axis=0)


def _pairhmm_kernel(
    # inputs (Rp, B) i32 / (He, B) i32 / (1, B) i32
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    # output (1, B) f32
    out_ref,
    # scratch
    m_ref, x_ref, y_ref,  # (2, Rp, B) f32 state diagonals
    tmm_ref, tim_ref, tmi_ref, tii_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,  # (Rp, B) f32
    acc_ref,  # (1, B) f32
    *, rp: int, hmax: int,
):
    B = out_ref.shape[1]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)

    # ---- prologue: qual -> probability tables in VMEM ------------------------------
    neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
    e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)

    rlen = rlen_ref[0, :][None, :]  # (1, B)
    pad = iota_i > rlen  # padded read rows (i in 1..rp-1 beyond read length); row 0 unused
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    tmm_ref[:] = jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del))
    tim_ref[:] = jnp.where(pad, zero, one - e_gcp)
    tmi_ref[:] = jnp.where(pad, one, e_ins)
    tii_ref[:] = jnp.where(pad, one, e_gcp)
    tmd_ref[:] = jnp.where(pad, zero, e_del)
    tdd_ref[:] = jnp.where(pad, zero, e_gcp)
    peq_ref[:] = jnp.where(pad, zero, one - e_base)
    pne_ref[:] = jnp.where(pad, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION))

    # ---- state init ----------------------------------------------------------------
    hlen_f = hlen_ref[0, :].astype(jnp.float32)[None, :]
    y0 = jnp.float32(2.0**INIT_LOG2) / hlen_f  # (1, B)
    m_ref[:] = jnp.zeros((2, rp, B), jnp.float32)
    x_ref[:] = jnp.zeros((2, rp, B), jnp.float32)
    # diagonal d=0 holds only cell (i=0, j=0): free-deletion boundary value
    y_ref[1] = jnp.zeros((rp, B), jnp.float32)
    y_ref[0] = jnp.where(iota_i == 0, jnp.broadcast_to(y0, (rp, B)), jnp.float32(0.0))
    acc_ref[:] = jnp.zeros((1, B), jnp.float32)

    hlen_row = hlen_ref[0, :][None, :]  # (1, B) i32
    rbase = rbase_ref[:]
    last = rp - 1

    num_d = rp - 1 + hmax  # diagonals 1..num_d

    def body(d, _):
        s = jax.lax.rem(d, 2)
        ns = 1 - s
        # haplotype bases along this anti-diagonal: W[i] = hap[d-i-1]
        start = E_OFF + hmax + rp - 1 - d
        w = e_ref[pl.ds(start, rp), :]
        prior = jnp.where(
            (rbase == w) | (rbase == N_BASE) | (w == N_BASE), peq_ref[:], pne_ref[:]
        )

        md2, xd2, yd2 = m_ref[s], x_ref[s], y_ref[s]
        md1, xd1, yd1 = m_ref[ns], x_ref[ns], y_ref[ns]

        m_new = prior * (tmm_ref[:] * _roll1(md2) + tim_ref[:] * (_roll1(xd2) + _roll1(yd2)))
        x_new = tmi_ref[:] * _roll1(md1) + tii_ref[:] * _roll1(xd1)
        y_new = tmd_ref[:] * md1 + tdd_ref[:] * yd1

        jvalid = iota_i <= (d - 1)  # rows with j = d - i >= 1
        interior = jvalid & (iota_i > 0)
        m_new = jnp.where(interior, m_new, zero)
        x_new = jnp.where(interior, x_new, zero)
        y_new = jnp.where(iota_i == 0, jnp.broadcast_to(y0, (rp, B)), jnp.where(jvalid, y_new, zero))

        m_ref[s] = m_new
        x_ref[s] = x_new
        y_ref[s] = y_new

        # final-row contribution: linear f32 sum of M+I at the last row, exactly
        # like the GKL native kernel (LoglessPairHMM.java:63-70); values carry
        # the 2^INIT_LOG2 scale and their sum stays far below f32 max.
        j_here = d - last
        c = m_new[last, :][None, :] + x_new[last, :][None, :]
        valid_c = (j_here >= 1) & (j_here <= hlen_row)
        acc_ref[:] = acc_ref[:] + jnp.where(valid_c, c, zero)
        return 0

    jax.lax.fori_loop(1, num_d + 1, body, 0)
    acc = acc_ref[:]
    out_ref[:] = jnp.where(
        acc > 0,
        (jnp.log(acc) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


def _pairhmm_matrix_kernel(
    # read block (Rp, B) i32; full hap array (He, NH) i32; rlen (1, B); hlen (1, NH)
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    out_ref,  # (1, B) f32 — likelihood of each read in the block vs this hap
    m_ref, x_ref, y_ref,
    tmm_ref, tim_ref, tmi_ref, tii_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,
    acc_ref, whap_ref,
    *, rp: int, hmax: int,
):
    """Cartesian form: lanes = 128 reads, one haplotype per grid column.

    Identical DP to _pairhmm_kernel but with read data loaded once per read block
    (the hap axis varies fastest in the grid) and the haplotype broadcast across
    lanes — no per-pair duplication in HBM. This matches the HaplotypeCaller
    access pattern (likelihoods for ALL reads x ALL haplotypes of a region).

    The hap array rides along unblocked (Mosaic forbids lane-dim-1 blocks); the
    current hap column is extracted once per grid step into whap_ref scratch via a
    masked reduction over lanes.
    """
    B = out_ref.shape[1]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)
    j = pl.program_id(1)

    # extract this grid step's haplotype column and length
    he, nh = e_ref.shape
    lane_iota_e = jax.lax.broadcasted_iota(jnp.int32, (he, nh), 1)
    whap_ref[:] = jnp.sum(
        jnp.where(lane_iota_e == j, e_ref[:], 0), axis=1, keepdims=True
    )
    lane_iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, nh), 1)
    hlen = jnp.sum(jnp.where(lane_iota_h == j, hlen_ref[:], 0))

    # prologue only on the first hap of each read block (constants persist in
    # scratch across grid steps; hap index is grid dim 1, iterated fastest)
    @pl.when(pl.program_id(1) == 0)
    def _():
        neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
        e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
        e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
        e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
        e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
        rlen = rlen_ref[0, :][None, :]
        pad = iota_i > rlen
        zero = jnp.float32(0.0)
        one = jnp.float32(1.0)
        tmm_ref[:] = jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del))
        tim_ref[:] = jnp.where(pad, zero, one - e_gcp)
        tmi_ref[:] = jnp.where(pad, one, e_ins)
        tii_ref[:] = jnp.where(pad, one, e_gcp)
        tmd_ref[:] = jnp.where(pad, zero, e_del)
        tdd_ref[:] = jnp.where(pad, zero, e_gcp)
        peq_ref[:] = jnp.where(pad, zero, one - e_base)
        pne_ref[:] = jnp.where(pad, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION))

    zero = jnp.float32(0.0)

    # pad haplotypes (hlen == 0, from NH bucketing) skip the whole DP sweep
    @pl.when(hlen > 0)
    def _run():
        y0 = jnp.float32(2.0**INIT_LOG2) / hlen.astype(jnp.float32)  # scalar
        m_ref[:] = jnp.zeros((2, rp, B), jnp.float32)
        x_ref[:] = jnp.zeros((2, rp, B), jnp.float32)
        y_ref[1] = jnp.zeros((rp, B), jnp.float32)
        y_ref[0] = jnp.where(iota_i == 0, y0, zero)
        acc_ref[:] = jnp.zeros((1, B), jnp.float32)

        rbase = rbase_ref[:]
        last = rp - 1
        num_d = rp - 1 + hmax

        def body(d, _):
            s = jax.lax.rem(d, 2)
            ns = 1 - s
            start = E_OFF + hmax + rp - 1 - d
            w = whap_ref[pl.ds(start, rp), :]  # (rp, 1) broadcasts across lanes
            prior = jnp.where(
                (rbase == w) | (rbase == N_BASE) | (w == N_BASE), peq_ref[:], pne_ref[:]
            )
            md2, xd2, yd2 = m_ref[s], x_ref[s], y_ref[s]
            md1, xd1, yd1 = m_ref[ns], x_ref[ns], y_ref[ns]
            m_new = prior * (tmm_ref[:] * _roll1(md2) + tim_ref[:] * (_roll1(xd2) + _roll1(yd2)))
            x_new = tmi_ref[:] * _roll1(md1) + tii_ref[:] * _roll1(xd1)
            y_new = tmd_ref[:] * md1 + tdd_ref[:] * yd1
            jvalid = iota_i <= (d - 1)
            interior = jvalid & (iota_i > 0)
            m_new = jnp.where(interior, m_new, zero)
            x_new = jnp.where(interior, x_new, zero)
            y_new = jnp.where(iota_i == 0, y0, jnp.where(jvalid, y_new, zero))
            m_ref[s] = m_new
            x_ref[s] = x_new
            y_ref[s] = y_new
            j_here = d - last
            c = m_new[last, :][None, :] + x_new[last, :][None, :]
            valid_c = (j_here >= 1) & (j_here <= hlen)
            acc_ref[:] = acc_ref[:] + jnp.where(valid_c, c, zero)
            return 0

        jax.lax.fori_loop(1, num_d + 1, body, 0)

    # out block is (NH, B), resident across the whole hap sweep for this read
    # block; write this hap's row via a dynamic sublane store. (acc_ref holds
    # garbage for pad haps — masked off by the where.)
    acc = acc_ref[:]
    out_ref[pl.ds(j, 1), :] = jnp.where(
        (hlen > 0) & (acc > 0),
        (jnp.log(jnp.maximum(acc, 1e-44)) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "interpret"))
def _pairhmm_matrix_call(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax, interpret=False):
    """Full (n_haps, n_reads_padded) likelihood matrix.

    rbase..gcp: (rp, NR) i32; e: (He, NH) i32; rlen: (1, NR); hlen: (1, NH).
    """
    nr = rbase.shape[1]
    nh = e.shape[1]
    he = e.shape[0]
    grid = (nr // LANES, nh)
    read_spec = pl.BlockSpec((rp, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # unblocked (hap data)
    rlen_spec = pl.BlockSpec((1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_matrix_kernel, rp=rp, hmax=hmax)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[read_spec] * 5 + [full_spec, rlen_spec, full_spec],
        out_specs=pl.BlockSpec((nh, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh, nr), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rp, LANES), jnp.float32),
            pltpu.VMEM((2, rp, LANES), jnp.float32),
            pltpu.VMEM((2, rp, LANES), jnp.float32),
        ]
        + [pltpu.VMEM((rp, LANES), jnp.float32)] * 8
        + [pltpu.VMEM((1, LANES), jnp.float32), pltpu.VMEM((he, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * (rp - 1 + hmax) * rp * LANES * 14,
            bytes_accessed=(5 * rp + 2) * nr * 4 + he * nh * 4 + nh * nr * 4,
            transcendentals=grid[0] * grid[1] * (rp - 1 + hmax) * LANES * 2,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "lanes", "interpret"))
def _pairhmm_cartesian_v6(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax,
                          lanes=128, interpret=False):
    """Cartesian (all reads x all haps) likelihoods via on-device pair expansion
    feeding the v6 pair kernel: returns (NH, NR) f32 log10.

    Expansion is hap-major so each 128-lane block shares one haplotype (NR is a
    multiple of 128), giving a tight per-block dynamic diagonal bound; padded
    haps (hlen 0) cost only ~rp/2 diagonals. The gather happens on device, so
    host->device transfer stays compact (reads + haps, not pairs)."""
    nr = rbase.shape[1]
    nh = e.shape[1]
    idx = jnp.arange(nr * nh, dtype=jnp.int32)
    ri = idx % nr
    hi = idx // nr
    out = _pairhmm_call_v6(
        rbase[:, ri], rq[:, ri], iq[:, ri], dq[:, ri], gcp[:, ri],
        e[:, hi], rlen[:, ri], jnp.maximum(hlen[:, hi], 1),
        rp=rp, hmax=hmax, lanes=lanes, interpret=interpret)
    return out.reshape(nh, nr)


def _pairhmm_kernel_v2(
    # inputs (Rp, B) i32 / (He, B) i32 / (1, B) i32
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    # output (1, B) f32
    out_ref,
    # scratch: M x2 slots, X x2, Y x2, tables x8, acc
    m0_ref, m1_ref, x0_ref, x1_ref, y0s_ref, y1s_ref,
    tmm_ref, tim_ref, tmi_ref, tii_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,
    acc_ref,
    *, rp: int, hmax: int,
):
    """Optimized wavefront: boundary conditions baked into the transition tables
    and a masked ramp phase / maskless steady phase loop split.

    Baking rules (vs the straightforward _pairhmm_kernel):
      * row 0 is the DP boundary row: peq/pne row0 = 0 (=> M row0 = 0),
        tmi/tii row0 = 0 (=> X row0 = 0), tmd row0 = 0 and tdd row0 = 1
        (=> Y row0 carries its initial 2^s/hapLen value forward unchanged) —
        no per-diagonal boundary selects.
      * rows where the read base is N: pne = peq (prior is always "match"),
        so the prior select needs only (rbase == w). Haplotypes are assumed
        N-free (guaranteed by assembly; pack_haps asserts) — GKL makes the
        same fast-path assumption.
      * the triangle masks (j >= 1) are only needed while d < rp (the ramp);
        for d >= rp every row is inside the valid band, so the steady loop
        runs with no masks at all. Tail garbage (j > hapLen) decays and is
        never read by valid cells (dependencies flow from smaller j) and is
        masked out of the final-row accumulator.
    """
    B = out_ref.shape[1]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)

    neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
    e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)

    rlen = rlen_ref[0, :][None, :]
    pad = iota_i > rlen  # padded read rows; row 0 is the boundary row
    row0 = iota_i == 0
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    tmm_ref[:] = jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del))
    tim_ref[:] = jnp.where(pad, zero, one - e_gcp)
    tmi_ref[:] = jnp.where(pad | row0, jnp.where(row0, zero, one), e_ins)
    tii_ref[:] = jnp.where(pad | row0, jnp.where(row0, zero, one), e_gcp)
    tmd_ref[:] = jnp.where(pad | row0, zero, e_del)
    tdd_ref[:] = jnp.where(row0, one, jnp.where(pad, zero, e_gcp))
    rbase = rbase_ref[:]
    peq = jnp.where(pad | row0, zero, one - e_base)
    peq_ref[:] = peq
    pne_ref[:] = jnp.where(
        rbase == N_BASE, peq,
        jnp.where(pad | row0, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION)),
    )

    hlen_f = hlen_ref[0, :].astype(jnp.float32)[None, :]
    y0 = jnp.float32(2.0**INIT_LOG2) / hlen_f  # (1, B)
    y0_full = jnp.where(row0, jnp.broadcast_to(y0, (rp, B)), zero)
    m0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    m1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    y0s_ref[:] = y0_full  # diagonal 0: boundary column value at row 0
    y1s_ref[:] = y0_full  # "diagonal -1": row 0 must also carry the boundary
    acc_ref[:] = jnp.zeros((1, B), jnp.float32)

    hlen_row = hlen_ref[0, :][None, :]
    last = rp - 1
    num_d = rp - 1 + hmax

    def one_diag(d, md2, xd2, yd2, md1, xd1, yd1, masked):
        # clamp handles the final unrolled half-step when num_d is odd (its
        # accumulator contribution is masked by j_here <= hlen)
        start = jnp.maximum(E_OFF + hmax + rp - 1 - d, 0)
        w = e_ref[pl.ds(start, rp), :]
        prior = jnp.where(rbase == w, peq_ref[:], pne_ref[:])
        m_new = prior * (tmm_ref[:] * _roll1(md2) + tim_ref[:] * _roll1(xd2 + yd2))
        x_new = tmi_ref[:] * _roll1(md1) + tii_ref[:] * _roll1(xd1)
        y_new = tmd_ref[:] * md1 + tdd_ref[:] * yd1
        if masked:
            jvalid = iota_i <= (d - 1)
            interior = jvalid & ~row0
            m_new = jnp.where(interior, m_new, zero)
            x_new = jnp.where(interior, x_new, zero)
            y_new = jnp.where(row0, jnp.broadcast_to(y0, (rp, B)),
                              jnp.where(jvalid, y_new, zero))
        j_here = d - last
        c = m_new[last, :][None, :] + x_new[last, :][None, :]
        valid_c = (j_here >= 1) & (j_here <= hlen_row)
        acc_ref[:] = acc_ref[:] + jnp.where(valid_c, c, zero)
        return m_new, x_new, y_new

    def make_body(masked):
        def body(t, _):
            d = 2 * t + 1
            # even diagonals in slot 0, odd in slot 1 (static indices)
            m_a, x_a, y_a = one_diag(d, m1_ref[:], x1_ref[:], y1s_ref[:],
                                     m0_ref[:], x0_ref[:], y0s_ref[:], masked)
            m1_ref[:] = m_a
            x1_ref[:] = x_a
            y1s_ref[:] = y_a
            m_b, x_b, y_b = one_diag(d + 1, m0_ref[:], x0_ref[:], y0s_ref[:],
                                     m_a, x_a, y_a, masked)
            m0_ref[:] = m_b
            x0_ref[:] = x_b
            y0s_ref[:] = y_b
            return 0
        return body

    # ramp: diagonals 1..ramp_end (masked); steady: ramp_end+1..num_d (maskless).
    # Bounds are static; both phases process two diagonals per step.
    ramp_steps = (rp + 1) // 2  # covers d in 1..2*ramp_steps >= rp
    jax.lax.fori_loop(0, ramp_steps, make_body(True), 0)
    total_steps = (num_d + 1) // 2
    jax.lax.fori_loop(ramp_steps, total_steps, make_body(False), 0)
    acc = acc_ref[:]
    out_ref[:] = jnp.where(
        acc > 0,
        (jnp.log(acc) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


def _pairhmm_kernel_v4(
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    out_ref,
    m0_ref, m1_ref, x0_ref, x1_ref, y0s_ref, y1s_ref,
    tmm_ref, tim_ref, tmi_ref, tii_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,
    acc_ref,
    *, rp: int, hmax: int, halves: int,
):
    """Latency-hiding variant: the block carries `halves` independent 128-lane
    sub-problems whose per-diagonal dependency chains are interleaved by the
    instruction scheduler (the wavefront recurrence is a serial chain of ~6
    dependent vector ops per diagonal; one 128-lane chain leaves the VPU mostly
    idle). All loads/stores stay 128 lanes wide (Mosaic's alignment-friendly
    width); only the scheduling interleaves."""
    B = out_ref.shape[1]
    L = B // halves
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)

    neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
    e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)

    rlen = rlen_ref[0, :][None, :]
    pad = iota_i > rlen
    row0 = iota_i == 0
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    tmm_ref[:] = jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del))
    tim_ref[:] = jnp.where(pad, zero, one - e_gcp)
    tmi_ref[:] = jnp.where(pad | row0, jnp.where(row0, zero, one), e_ins)
    tii_ref[:] = jnp.where(pad | row0, jnp.where(row0, zero, one), e_gcp)
    tmd_ref[:] = jnp.where(pad | row0, zero, e_del)
    tdd_ref[:] = jnp.where(row0, one, jnp.where(pad, zero, e_gcp))
    rbase_all = rbase_ref[:]
    peq = jnp.where(pad | row0, zero, one - e_base)
    peq_ref[:] = peq
    pne_ref[:] = jnp.where(
        rbase_all == N_BASE, peq,
        jnp.where(pad | row0, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION)),
    )

    hlen_f = hlen_ref[0, :].astype(jnp.float32)[None, :]
    y0 = jnp.float32(2.0**INIT_LOG2) / hlen_f
    y0_full = jnp.where(row0, jnp.broadcast_to(y0, (rp, B)), zero)
    m0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    m1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    y0s_ref[:] = y0_full
    y1s_ref[:] = y0_full
    acc_ref[:] = jnp.zeros((1, B), jnp.float32)

    hlen_row = hlen_ref[0, :][None, :]
    last = rp - 1
    num_d = rp - 1 + hmax
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (rp, L), 0)

    def one_diag_half(d, h, md2, xd2, yd2, md1, xd1, yd1, masked):
        lo = h * L
        start = jnp.maximum(E_OFF + hmax + rp - 1 - d, 0)
        w = e_ref[pl.ds(start, rp), pl.ds(lo, L)]
        rbase = rbase_ref[:, pl.ds(lo, L)]
        prior = jnp.where(rbase == w, peq_ref[:, pl.ds(lo, L)], pne_ref[:, pl.ds(lo, L)])
        m_new = prior * (tmm_ref[:, pl.ds(lo, L)] * _roll1(md2)
                         + tim_ref[:, pl.ds(lo, L)] * _roll1(xd2 + yd2))
        x_new = (tmi_ref[:, pl.ds(lo, L)] * _roll1(md1)
                 + tii_ref[:, pl.ds(lo, L)] * _roll1(xd1))
        y_new = tmd_ref[:, pl.ds(lo, L)] * md1 + tdd_ref[:, pl.ds(lo, L)] * yd1
        if masked:
            jvalid = iota_sub <= (d - 1)
            interior = jvalid & (iota_sub > 0)
            m_new = jnp.where(interior, m_new, zero)
            x_new = jnp.where(interior, x_new, zero)
            y_row0 = jnp.broadcast_to(y0[:, pl.ds(lo, L)], (rp, L))
            y_new = jnp.where(iota_sub == 0, y_row0, jnp.where(jvalid, y_new, zero))
        j_here = d - last
        c = m_new[last, :][None, :] + x_new[last, :][None, :]
        valid_c = (j_here >= 1) & (j_here <= hlen_row[:, pl.ds(lo, L)])
        acc_ref[:, pl.ds(lo, L)] = acc_ref[:, pl.ds(lo, L)] + jnp.where(valid_c, c, zero)
        return m_new, x_new, y_new

    def make_body(masked):
        def body(t, _):
            d = 2 * t + 1
            for h in range(halves):
                lo = h * L
                sl = (slice(None), pl.ds(lo, L))
                m_a, x_a, y_a = one_diag_half(
                    d, h, m1_ref[sl], x1_ref[sl], y1s_ref[sl],
                    m0_ref[sl], x0_ref[sl], y0s_ref[sl], masked)
                m1_ref[sl] = m_a
                x1_ref[sl] = x_a
                y1s_ref[sl] = y_a
                m_b, x_b, y_b = one_diag_half(
                    d + 1, h, m0_ref[sl], x0_ref[sl], y0s_ref[sl],
                    m_a, x_a, y_a, masked)
                m0_ref[sl] = m_b
                x0_ref[sl] = x_b
                y0s_ref[sl] = y_b
            return 0
        return body

    ramp_steps = (rp + 1) // 2
    jax.lax.fori_loop(0, ramp_steps, make_body(True), 0)
    total_steps = (num_d + 1) // 2
    jax.lax.fori_loop(ramp_steps, total_steps, make_body(False), 0)
    acc = acc_ref[:]
    out_ref[:] = jnp.where(
        acc > 0,
        (jnp.log(acc) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "lanes", "interpret"))
def _pairhmm_call_v4(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax,
                     lanes=256, interpret=False):
    """Pair-wise kernel with `lanes // 128` interleaved independent chains."""
    n = rbase.shape[1]
    lanes = min(lanes, n)
    halves = max(lanes // LANES, 1)
    grid = n // lanes
    he = e.shape[0]
    row_spec = pl.BlockSpec((rp, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((he, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_kernel_v4, rp=rp, hmax=hmax, halves=halves)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row_spec] * 5 + [e_spec, len_spec, len_spec],
        out_specs=pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rp, lanes), jnp.float32)] * 6
        + [pltpu.VMEM((rp, lanes), jnp.float32)] * 8
        + [pltpu.VMEM((1, lanes), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=grid * (rp - 1 + hmax) * rp * lanes * 14,
            bytes_accessed=(5 * rp + he + 3) * n * 4,
            transcendentals=grid * (rp - 1 + hmax) * lanes * 2,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "lanes", "interpret"))
def _pairhmm_call_v2(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax,
                     lanes=512, interpret=False):
    """Optimized pair-wise kernel: wide lane blocks + 2x-unrolled wavefront."""
    n = rbase.shape[1]
    lanes = min(lanes, n)
    grid = n // lanes
    he = e.shape[0]
    row_spec = pl.BlockSpec((rp, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((he, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_kernel_v2, rp=rp, hmax=hmax)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row_spec] * 5 + [e_spec, len_spec, len_spec],
        out_specs=pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rp, lanes), jnp.float32)] * 6
        + [pltpu.VMEM((rp, lanes), jnp.float32)] * 8
        + [pltpu.VMEM((1, lanes), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=grid * (rp - 1 + hmax) * rp * lanes * 14,
            bytes_accessed=(5 * rp + he + 3) * n * 4,
            transcendentals=grid * (rp - 1 + hmax) * lanes * 2,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


def _pairhmm_kernel_v5(
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    out_ref,
    m0_ref, m1_ref, x0_ref, x1_ref, y0s_ref, y1s_ref,
    tmmd_ref, timd_ref, tmid_ref, tiid_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,
    acc_ref,
    *, rp: int, hmax: int,
):
    """Group-of-8 unrolled wavefront. Three ideas over _pairhmm_kernel_v2:

    1. *Aligned hap loads*: the per-diagonal hap window slides by one sublane per
       step, which Mosaic cannot lower for wide (>128) lane blocks (dynamic
       sublane starts must be provable multiples of 8). Diagonals are processed
       in groups of 8; each group loads one (rp+16)-row block at an 8-aligned
       offset (E_OFF bottom padding guarantees in-bounds) and takes eight static
       sub-slices — so wide lane blocks compile, amortizing loop overhead.
    2. *Register-resident chains*: within a group the six live state arrays pass
       from diagonal to diagonal as values; only the last two diagonals' states
       are stored back to scratch at the group boundary, cutting VMEM state
       traffic ~8x (the kernel is VMEM-bandwidth-bound, not FLOP-bound).
    3. *Pre-rolled tables*: storing T'[i] = T[i+1] for the M/I transition tables
       turns (tmm*roll(m) + tim*roll(x+y)) into roll(tmm'*m + tim'*(x+y)) — two
       sublane rolls per diagonal instead of four. Boundary conditions stay baked
       (v2 scheme): row 0 of tmi/tii/peq/pne is 0, tdd row 0 is 1, so invalid
       wavefront cells provably stay 0 from the all-zero initial state and NO
       per-diagonal masks are needed in either phase (the only masking left is
       the (1,B) accumulator window test).
    """
    B = out_ref.shape[1]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)

    neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
    e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)

    rlen = rlen_ref[0, :][None, :]
    pad = iota_i > rlen
    row0 = iota_i == 0
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    def down(t):  # pre-roll: T'[i] = T[i+1] (wraps row 0 into row rp-1)
        return pltpu.roll(t, shift=rp - 1, axis=0)

    tmmd_ref[:] = down(jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del)))
    timd_ref[:] = down(jnp.where(pad, zero, one - e_gcp))
    tmid_ref[:] = down(jnp.where(pad | row0, jnp.where(row0, zero, one), e_ins))
    tiid_ref[:] = down(jnp.where(pad | row0, jnp.where(row0, zero, one), e_gcp))
    tmd_ref[:] = jnp.where(pad | row0, zero, e_del)
    tdd_ref[:] = jnp.where(row0, one, jnp.where(pad, zero, e_gcp))
    rbase = rbase_ref[:]
    peq = jnp.where(pad | row0, zero, one - e_base)
    peq_ref[:] = peq
    pne_ref[:] = jnp.where(
        rbase == N_BASE, peq,
        jnp.where(pad | row0, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION)),
    )

    hlen_f = hlen_ref[0, :].astype(jnp.float32)[None, :]
    y0 = jnp.float32(2.0**INIT_LOG2) / hlen_f
    y0_full = jnp.where(row0, jnp.broadcast_to(y0, (rp, B)), zero)
    m0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    m1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    # d=0 slot: boundary cell (0,0) = y0. d=-1 slot: ALL ZERO — with no ramp
    # masks, a y0 here would leak the boundary into the j=0 column via the
    # M-recurrence's d-2 read (cell (1,0) = prior*tim*y0 instead of 0).
    y0s_ref[:] = y0_full
    y1s_ref[:] = jnp.zeros((rp, B), jnp.float32)
    acc_ref[:] = jnp.zeros((1, B), jnp.float32)

    hlen_row = hlen_ref[0, :][None, :]
    last = rp - 1
    # num_d = rp - 1 + hmax = 8*n_groups - 1; the final group's 8th diagonal
    # overshoots by one (j > hlen there, masked out of the accumulator)
    n_groups = (rp + hmax) // 8

    def one_diag(w, md2, xd2, yd2, md1, xd1, yd1):
        prior = jnp.where(rbase == w, peq_ref[:], pne_ref[:])
        m_new = prior * _roll1(tmmd_ref[:] * md2 + timd_ref[:] * (xd2 + yd2))
        x_new = _roll1(tmid_ref[:] * md1 + tiid_ref[:] * xd1)
        y_new = tmd_ref[:] * md1 + tdd_ref[:] * yd1
        return m_new, x_new, y_new

    def make_body(with_acc):
        def body(g, _):
            # group g covers diagonals d = 8g+1 .. 8g+8; hap window rows
            # [E_OFF+hmax+rp-16-8g, +rp+16) cover all eight (8-aligned start)
            a = pl.multiple_of(E_OFF + hmax + rp - 16 - 8 * g, 8)
            blk = e_ref[pl.ds(a, rp + 16), :]
            st = (m1_ref[:], x1_ref[:], y1s_ref[:], m0_ref[:], x0_ref[:], y0s_ref[:])
            if with_acc:
                acc = acc_ref[:]
                d0 = 8 * g
            for c in range(8):
                w = blk[14 - c : 14 - c + rp, :]
                m_new, x_new, y_new = one_diag(w, *st)
                if with_acc:
                    j_here = (d0 + 1 + c) - last
                    cc = m_new[last, :][None, :] + x_new[last, :][None, :]
                    acc = acc + jnp.where((j_here >= 1) & (j_here <= hlen_row), cc, zero)
                st = (st[3], st[4], st[5], m_new, x_new, y_new)
            m1_ref[:], x1_ref[:], y1s_ref[:] = st[0], st[1], st[2]
            m0_ref[:], x0_ref[:], y0s_ref[:] = st[3], st[4], st[5]
            if with_acc:
                acc_ref[:] = acc
            return 0
        return body

    # groups entirely below the readout row contribute nothing to the accumulator
    g_quiet = max((rp - 8) // 8, 0)  # all d in groups [0, g_quiet) have d < rp
    jax.lax.fori_loop(0, g_quiet, make_body(False), 0)
    jax.lax.fori_loop(g_quiet, n_groups, make_body(True), 0)
    acc = acc_ref[:]
    out_ref[:] = jnp.where(
        acc > 0,
        (jnp.log(acc) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


def _pairhmm_kernel_v6(
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    out_ref,
    m0_ref, m1_ref, x0_ref, x1_ref, y0s_ref, y1s_ref,
    tmmd_ref, timd_ref, tmid_ref, tiid_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,
    acc_ref,
    *, rp: int, hmax: int,
):
    """Production pair-wise kernel: v2's 2x-unrolled wavefront plus

    * pre-rolled transition tables (T'[i] = T[i+1]) so M and X need one sublane
      roll each instead of two (roll(a)*b == roll(a * roll_inv(b))),
    * no per-diagonal masks at all — boundary conditions are baked into the
      tables (row 0: tmi=tii=peq=pne=0, tdd=1) and the d=-1 state slot is
      all-zero, so invalid wavefront cells provably stay 0 (cf. _pairhmm_kernel_v5),
    * a *dynamic* diagonal bound: the sweep stops at this block's max haplotype
      length instead of the static hmax bucket, so bucket padding costs nothing
      (pairs are grouped 128 to a block; the engine batches similar-length haps).
    """
    B = out_ref.shape[1]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)

    neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
    e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)

    rlen = rlen_ref[0, :][None, :]
    pad = iota_i > rlen
    row0 = iota_i == 0
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    def down(t):  # pre-roll: T'[i] = T[i+1] (wraps row 0 into row rp-1)
        return pltpu.roll(t, shift=rp - 1, axis=0)

    tmmd_ref[:] = down(jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del)))
    timd_ref[:] = down(jnp.where(pad, zero, one - e_gcp))
    tmid_ref[:] = down(jnp.where(pad | row0, jnp.where(row0, zero, one), e_ins))
    tiid_ref[:] = down(jnp.where(pad | row0, jnp.where(row0, zero, one), e_gcp))
    tmd_ref[:] = jnp.where(pad | row0, zero, e_del)
    tdd_ref[:] = jnp.where(row0, one, jnp.where(pad, zero, e_gcp))
    rbase = rbase_ref[:]
    peq = jnp.where(pad | row0, zero, one - e_base)
    peq_ref[:] = peq
    pne_ref[:] = jnp.where(
        rbase == N_BASE, peq,
        jnp.where(pad | row0, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION)),
    )

    hlen_f = hlen_ref[0, :].astype(jnp.float32)[None, :]
    y0 = jnp.float32(2.0**INIT_LOG2) / hlen_f
    y0_full = jnp.where(row0, jnp.broadcast_to(y0, (rp, B)), zero)
    m0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    m1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x0_ref[:] = jnp.zeros((rp, B), jnp.float32)
    x1_ref[:] = jnp.zeros((rp, B), jnp.float32)
    y0s_ref[:] = y0_full  # d=0 slot: boundary cell (0,0)
    y1s_ref[:] = jnp.zeros((rp, B), jnp.float32)  # d=-1 slot MUST be zero (maskless)
    acc_ref[:] = jnp.zeros((1, B), jnp.float32)

    hlen_row = hlen_ref[0, :][None, :]
    last = rp - 1

    def one_diag(d, md2, xd2, yd2, md1, xd1, yd1):
        start = E_OFF + hmax + rp - 1 - d
        w = e_ref[pl.ds(start, rp), :]
        prior = jnp.where(rbase == w, peq_ref[:], pne_ref[:])
        m_new = prior * _roll1(tmmd_ref[:] * md2 + timd_ref[:] * (xd2 + yd2))
        x_new = _roll1(tmid_ref[:] * md1 + tiid_ref[:] * xd1)
        y_new = tmd_ref[:] * md1 + tdd_ref[:] * yd1
        j_here = d - last
        c = m_new[last, :][None, :] + x_new[last, :][None, :]
        acc_ref[:] = acc_ref[:] + jnp.where(
            (j_here >= 1) & (j_here <= hlen_row), c, zero)
        return m_new, x_new, y_new

    # 8-deep unrolled wavefront body: intermediate diagonals flow value-to-
    # value (only the oldest two states round-trip through VMEM per iteration),
    # and the loop-control overhead amortizes over 8 diagonals — measured
    # 103.4 -> 115.1 GCUPS on the kernel bench workload, bit-identical outputs
    # (see ops/ROOFLINE.md).
    UNROLL = 8

    def body(t, _):
        d = UNROLL * t + 1
        s2 = (m1_ref[:], x1_ref[:], y1s_ref[:])
        s1 = (m0_ref[:], x0_ref[:], y0s_ref[:])
        for j in range(UNROLL):
            nxt = one_diag(d + j, *s2, *s1)
            s2 = s1
            s1 = nxt
        m1_ref[:], x1_ref[:], y1s_ref[:] = s2
        m0_ref[:], x0_ref[:], y0s_ref[:] = s1
        return 0

    # diagonals beyond rp-1+max(hlen) cannot contribute: stop there (dynamic
    # bound; up to UNROLL-1 diagonals of overshoot are masked by the
    # accumulator window)
    max_hlen = jnp.max(hlen_ref[0, :])
    total_steps = (rp + max_hlen + UNROLL - 1) // UNROLL
    jax.lax.fori_loop(0, total_steps, body, 0)
    acc = acc_ref[:]
    out_ref[:] = jnp.where(
        acc > 0,
        (jnp.log(acc) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


def _pairhmm_kernel_v7(
    rbase_ref, rq_ref, iq_ref, dq_ref, gcp_ref, e_ref, rlen_ref, hlen_ref,
    out_ref,
    tmmd_ref, timd_ref, tmid_ref, tiid_ref, tmd_ref, tdd_ref, peq_ref, pne_ref,
    *, rp: int, hmax: int,
):
    """v6 with the six wavefront state planes carried as fori_loop VALUES
    instead of VMEM scratch refs: Mosaic keeps the loop-carried vregs live
    across iterations, removing 6 (rp,B) load/stores per diagonal (the state
    traffic was ~half the per-diagonal instruction budget; see ops/ROOFLINE.md).
    Math identical to _pairhmm_kernel_v6."""
    B = out_ref.shape[1]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, B), 0)

    neg_ln10_over_10 = jnp.float32(-LN10 / 10.0)
    e_ins = jnp.exp(iq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_del = jnp.exp(dq_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_gcp = jnp.exp(gcp_ref[:].astype(jnp.float32) * neg_ln10_over_10)
    e_base = jnp.exp(rq_ref[:].astype(jnp.float32) * neg_ln10_over_10)

    rlen = rlen_ref[0, :][None, :]
    pad = iota_i > rlen
    row0 = iota_i == 0
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    def down(t):
        return pltpu.roll(t, shift=rp - 1, axis=0)

    tmmd_ref[:] = down(jnp.where(pad, zero, one - jnp.minimum(one, e_ins + e_del)))
    timd_ref[:] = down(jnp.where(pad, zero, one - e_gcp))
    tmid_ref[:] = down(jnp.where(pad | row0, jnp.where(row0, zero, one), e_ins))
    tiid_ref[:] = down(jnp.where(pad | row0, jnp.where(row0, zero, one), e_gcp))
    tmd_ref[:] = jnp.where(pad | row0, zero, e_del)
    tdd_ref[:] = jnp.where(row0, one, jnp.where(pad, zero, e_gcp))
    rbase = rbase_ref[:]
    peq = jnp.where(pad | row0, zero, one - e_base)
    peq_ref[:] = peq
    pne_ref[:] = jnp.where(
        rbase == N_BASE, peq,
        jnp.where(pad | row0, zero, e_base * jnp.float32(1.0 / TRISTATE_CORRECTION)),
    )

    hlen_f = hlen_ref[0, :].astype(jnp.float32)[None, :]
    y0 = jnp.float32(2.0**INIT_LOG2) / hlen_f
    y0_full = jnp.where(row0, jnp.broadcast_to(y0, (rp, B)), zero)
    zeros = jnp.zeros((rp, B), jnp.float32)

    hlen_row = hlen_ref[0, :][None, :]
    last = rp - 1

    def one_diag(d, acc, md2, xd2, yd2, md1, xd1, yd1):
        start = E_OFF + hmax + rp - 1 - d
        w = e_ref[pl.ds(start, rp), :]
        prior = jnp.where(rbase == w, peq_ref[:], pne_ref[:])
        m_new = prior * _roll1(tmmd_ref[:] * md2 + timd_ref[:] * (xd2 + yd2))
        x_new = _roll1(tmid_ref[:] * md1 + tiid_ref[:] * xd1)
        y_new = tmd_ref[:] * md1 + tdd_ref[:] * yd1
        j_here = d - last
        c = m_new[last, :][None, :] + x_new[last, :][None, :]
        acc = acc + jnp.where((j_here >= 1) & (j_here <= hlen_row), c, zero)
        return acc, m_new, x_new, y_new

    def body(t, carry):
        acc, m0, x0, y0s, m1, x1, y1s = carry
        d = 2 * t + 1
        acc, m_a, x_a, y_a = one_diag(d, acc, m1, x1, y1s, m0, x0, y0s)
        acc, m_b, x_b, y_b = one_diag(d + 1, acc, m0, x0, y0s, m_a, x_a, y_a)
        return acc, m_b, x_b, y_b, m_a, x_a, y_a

    max_hlen = jnp.max(hlen_ref[0, :])
    total_steps = (rp + max_hlen + 1) // 2
    init = (jnp.zeros((1, B), jnp.float32),
            zeros, zeros, y0_full, zeros, zeros, zeros)
    acc = jax.lax.fori_loop(0, total_steps, body, init)[0]
    out_ref[:] = jnp.where(
        acc > 0,
        (jnp.log(acc) - jnp.float32(INIT_LOG2 * LN2)) * jnp.float32(1.0 / LN10),
        jnp.float32(NEG_INF),
    )


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "lanes", "interpret"))
def _pairhmm_call_v7(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax,
                     lanes=128, interpret=False):
    """Loop-carried-state variant of the production kernel (experimental;
    see _pairhmm_kernel_v7 / ops/ROOFLINE.md)."""
    n = rbase.shape[1]
    lanes = min(lanes, n)
    grid = n // lanes
    he = e.shape[0]
    row_spec = pl.BlockSpec((rp, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((he, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_kernel_v7, rp=rp, hmax=hmax)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row_spec] * 5 + [e_spec, len_spec, len_spec],
        out_specs=pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rp, lanes), jnp.float32)] * 8,
        cost_estimate=pl.CostEstimate(
            flops=grid * (rp - 1 + hmax) * rp * lanes * 14,
            bytes_accessed=(5 * rp + he + 3) * n * 4,
            transcendentals=grid * rp * lanes * 4,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "lanes", "interpret"))
def _pairhmm_call_v6(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax,
                     lanes=128, interpret=False):
    """Production pair-wise kernel (see _pairhmm_kernel_v6)."""
    n = rbase.shape[1]
    lanes = min(lanes, n)
    grid = n // lanes
    he = e.shape[0]
    row_spec = pl.BlockSpec((rp, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((he, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_kernel_v6, rp=rp, hmax=hmax)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row_spec] * 5 + [e_spec, len_spec, len_spec],
        out_specs=pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rp, lanes), jnp.float32)] * 14
        + [pltpu.VMEM((1, lanes), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=grid * (rp - 1 + hmax) * rp * lanes * 14,
            bytes_accessed=(5 * rp + he + 3) * n * 4,
            transcendentals=grid * rp * lanes * 4,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "lanes", "interpret"))
def _pairhmm_call_v5(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax,
                     lanes=256, interpret=False):
    """Group-of-8 pair-wise kernel (see _pairhmm_kernel_v5)."""
    assert (rp + hmax) % 8 == 0, "rp+hmax must be a multiple of 8"
    n = rbase.shape[1]
    lanes = min(lanes, n)
    grid = n // lanes
    he = e.shape[0]
    row_spec = pl.BlockSpec((rp, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((he, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_kernel_v5, rp=rp, hmax=hmax)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row_spec] * 5 + [e_spec, len_spec, len_spec],
        out_specs=pl.BlockSpec((1, lanes), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rp, lanes), jnp.float32)] * 14
        + [pltpu.VMEM((1, lanes), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=grid * (rp - 1 + hmax) * rp * lanes * 14,
            bytes_accessed=(5 * rp + he + 3) * n * 4,
            transcendentals=grid * rp * lanes * 4,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "interpret"))
def _pairhmm_call(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax, interpret=False):
    n = rbase.shape[1]
    grid = n // LANES
    he = e.shape[0]
    row_spec = pl.BlockSpec((rp, LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((he, LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    kernel = functools.partial(_pairhmm_kernel, rp=rp, hmax=hmax)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[row_spec] * 5 + [e_spec, len_spec, len_spec],
        out_specs=pl.BlockSpec((1, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rp, LANES), jnp.float32),  # M
            pltpu.VMEM((2, rp, LANES), jnp.float32),  # X
            pltpu.VMEM((2, rp, LANES), jnp.float32),  # Y
        ]
        + [pltpu.VMEM((rp, LANES), jnp.float32)] * 8
        + [pltpu.VMEM((1, LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=grid * (rp - 1 + hmax) * rp * LANES * 14,
            bytes_accessed=(5 * rp + he + 3) * n * 4,
            transcendentals=grid * (rp - 1 + hmax) * LANES * 2,
        ),
        interpret=interpret,
    )(rbase, rq, iq, dq, gcp, e, rlen, hlen)


@functools.partial(jax.jit, static_argnames=("rp", "hmax"))
def _pairhmm_scan_call(rbase, rq, iq, dq, gcp, e, rlen, hlen, *, rp, hmax):
    """Cartesian PairHMM as a pure-jnp lax.scan wavefront (no Pallas).

    Same packed layout and semantics as _pairhmm_matrix_call: reads (rp, NR) i32,
    haps e (He, NH) i32, rlen (1, NR), hlen (1, NH) -> (NH, NR) f32 log10.
    Used as the compiled fallback on CPU backends (where Pallas interpret mode is
    orders of magnitude slower) and as a cross-backend consistency oracle for the
    Pallas kernel (the VectorPairHMMUnitTest.java:100 pattern).
    """
    nr = rbase.shape[1]
    nh = e.shape[1]
    f32 = jnp.float32
    neg = f32(-LN10 / 10.0)
    e_ins = jnp.exp(iq.astype(f32) * neg)
    e_del = jnp.exp(dq.astype(f32) * neg)
    e_gcp = jnp.exp(gcp.astype(f32) * neg)
    e_base = jnp.exp(rq.astype(f32) * neg)

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (rp, 1, 1), 0)
    pad = iota_i > rlen[0][None, None, :]  # (rp, 1, NR)
    zero, one = f32(0.0), f32(1.0)

    def rd(x):  # (rp, NR) -> (rp, 1, NR)
        return x[:, None, :]

    tmm = jnp.where(pad, zero, rd(one - jnp.minimum(one, e_ins + e_del)))
    tim = jnp.where(pad, zero, rd(one - e_gcp))
    tmi = jnp.where(pad, one, rd(e_ins))
    tii = jnp.where(pad, one, rd(e_gcp))
    tmd = jnp.where(pad, zero, rd(e_del))
    tdd = jnp.where(pad, zero, rd(e_gcp))
    peq = jnp.where(pad, zero, rd(one - e_base))
    pne = jnp.where(pad, zero, rd(e_base * f32(1.0 / TRISTATE_CORRECTION)))
    rbase3 = rd(rbase)

    hlen_h = hlen[0]  # (NH,)
    y0 = jnp.where(hlen_h > 0, f32(2.0**INIT_LOG2) / jnp.maximum(hlen_h, 1).astype(f32), zero)
    y0_full = jnp.where(iota_i == 0, y0[None, :, None], zero)  # (rp, NH, 1) broadcast rows

    shape = (rp, nh, nr)
    zeros = jnp.zeros(shape, f32)
    y_d0 = jnp.broadcast_to(y0_full, shape)
    last = rp - 1
    num_d = rp - 1 + hmax

    def roll1(x):
        return jnp.roll(x, 1, axis=0)

    def body(carry, d):
        m1, x1, y1, m2, x2, y2, acc = carry
        start = E_OFF + hmax + rp - 1 - d
        w = jax.lax.dynamic_slice(e, (start, 0), (rp, nh))[:, :, None]  # (rp, NH, 1)
        prior = jnp.where((rbase3 == w) | (rbase3 == N_BASE) | (w == N_BASE), peq, pne)
        m_new = prior * (tmm * roll1(m2) + tim * (roll1(x2) + roll1(y2)))
        x_new = tmi * roll1(m1) + tii * roll1(x1)
        y_new = tmd * m1 + tdd * y1
        jvalid = iota_i <= (d - 1)
        interior = jvalid & (iota_i > 0)
        m_new = jnp.where(interior, m_new, zero)
        x_new = jnp.where(interior, x_new, zero)
        y_new = jnp.where(iota_i == 0, y0_full, jnp.where(jvalid, y_new, zero))
        j_here = d - last
        c = m_new[last] + x_new[last]  # (NH, NR)
        valid_c = (j_here >= 1) & (j_here <= hlen_h)[:, None]
        acc = acc + jnp.where(valid_c, c, zero)
        return (m_new, x_new, y_new, m1, x1, y1, acc), None

    init = (zeros, zeros, y_d0, zeros, zeros, zeros, jnp.zeros((nh, nr), f32))
    (m1, x1, y1, m2, x2, y2, acc), _ = jax.lax.scan(
        body, init, jnp.arange(1, num_d + 1, dtype=jnp.int32)
    )
    return jnp.where(
        acc > 0,
        (jnp.log(jnp.maximum(acc, 1e-44)) - f32(INIT_LOG2 * LN2)) * f32(1.0 / LN10),
        f32(NEG_INF),
    )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# Fixed shape buckets: each distinct (rp, hmax, nr, nh) tuple costs one Mosaic
# compile (tens of seconds through the remote-compile path), so pad every axis up
# to a small ladder of shapes. rp covers reads to 158bp in one bucket. nr (reads,
# lane axis) uses a ~1.33x geometric ladder of 128-multiples; nh (haps, grid axis)
# is coarse because pad haps (hlen=0) skip the DP entirely via pl.when.
RP_BUCKETS = (160, 320)
HMAX_BUCKETS = (256, 512, 1024, 2048)
NR_BLOCK_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)
NH_BUCKETS = (8, 16, 32, 64, 128)


def _bucket(value, buckets):
    for b in buckets:
        if value <= b:
            return b
    return _round_up(value, buckets[-1])


def pack_batch(reads, haps, pair_read_idx, pair_hap_idx, rp=None, hmax=None):
    """Pack reads/haps into wavefront layout.

    reads: list of dicts with keys bases (bytes/uint8), rq, iq, dq, gcp (uint8 arrays)
    haps: list of bytes/uint8 haplotype bases
    pair_read_idx/pair_hap_idx: int arrays of pair definitions
    Returns dict of device-ready numpy arrays + (rp, hmax, n_pairs).
    """
    n_pairs = len(pair_read_idx)
    max_r = max(len(r["bases"]) for r in reads)
    max_h = max(len(h) for h in haps)
    rp = rp or _bucket(max_r + 2, RP_BUCKETS)
    hmax = hmax or _bucket(max_h, HMAX_BUCKETS)
    if max_r > rp - 2 or max_h > hmax:
        raise ValueError(f"bucket too small: R={max_r}->rp={rp}, H={max_h}->hmax={hmax}")
    n = _round_up(max(n_pairs, 1), LANES)
    he = hmax + 2 * rp + E_OFF

    def as_u8(x):
        return np.frombuffer(bytes(x), dtype=np.uint8) if isinstance(x, (bytes, bytearray)) else np.asarray(x, dtype=np.uint8)

    nr = len(reads)
    rbase_r = np.zeros((rp, nr), np.int32)
    rq_r = np.zeros((rp, nr), np.int32)
    iq_r = np.zeros((rp, nr), np.int32)
    dq_r = np.zeros((rp, nr), np.int32)
    gcp_r = np.zeros((rp, nr), np.int32)
    rlen_r = np.zeros(nr, np.int32)
    for k, r in enumerate(reads):
        b = as_u8(r["bases"])
        L = len(b)
        rlen_r[k] = L
        rbase_r[1 : L + 1, k] = b
        # GATK maps qual bytes through (q & 0xff) then caps at MAX_QUAL; quals here are
        # already uint8 so only the cap matters (no-op for sane inputs)
        rq_r[1 : L + 1, k] = as_u8(r["rq"])
        iq_r[1 : L + 1, k] = as_u8(r["iq"])
        dq_r[1 : L + 1, k] = as_u8(r["dq"])
        gcp_r[1 : L + 1, k] = as_u8(r["gcp"])

    nh = len(haps)
    e_h = np.zeros((he, nh), np.int32)
    hlen_h = np.zeros(nh, np.int32)
    p = rp - 1
    for k, h in enumerate(haps):
        b = as_u8(h)
        hlen_h[k] = len(b)
        # E[t] = hap[hmax - 1 - (t - p)]: reversed hap occupying t in [p + hmax - len, p + hmax)
        rev = b[::-1]
        e_h[E_OFF + p + hmax - len(b) : E_OFF + p + hmax, k] = rev

    ri = np.asarray(pair_read_idx, np.int64)
    hi = np.asarray(pair_hap_idx, np.int64)
    out = {}
    pad_cols = n - n_pairs

    def sel(mat, idx, fill=0):
        picked = mat[:, idx]
        if pad_cols:
            picked = np.concatenate([picked, np.full((mat.shape[0], pad_cols), fill, mat.dtype)], axis=1)
        return picked

    out["rbase"] = sel(rbase_r, ri)
    out["rq"] = sel(rq_r, ri)
    out["iq"] = sel(iq_r, ri)
    out["dq"] = sel(dq_r, ri)
    out["gcp"] = sel(gcp_r, ri)
    out["e"] = sel(e_h, hi)
    rlen = np.concatenate([rlen_r[ri], np.full(pad_cols, 1, np.int32)])
    hlen = np.concatenate([hlen_h[hi], np.full(pad_cols, 1, np.int32)])
    out["rlen"] = rlen[None, :].astype(np.int32)
    out["hlen"] = hlen[None, :].astype(np.int32)
    return out, rp, hmax, n_pairs


def pack_reads(reads, rp=None, nr=None):
    """Pack read data into (rp, NR_padded) arrays (NR padded to LANES)."""
    max_r = max(len(r["bases"]) for r in reads)
    rp = rp or _bucket(max_r + 2, RP_BUCKETS)
    if max_r > rp - 2:
        raise ValueError(f"read bucket too small: {max_r} -> rp={rp}")
    if nr is None:
        nr = LANES * _bucket(-(-max(len(reads), 1) // LANES), NR_BLOCK_BUCKETS)
    elif len(reads) > nr:
        raise ValueError(f"nr target too small: {len(reads)} > {nr}")

    def as_u8(x):
        return np.frombuffer(bytes(x), dtype=np.uint8) if isinstance(x, (bytes, bytearray)) else np.asarray(x, dtype=np.uint8)

    rbase = np.zeros((rp, nr), np.int32)
    rq = np.zeros((rp, nr), np.int32)
    iq = np.zeros((rp, nr), np.int32)
    dq = np.zeros((rp, nr), np.int32)
    gcp = np.zeros((rp, nr), np.int32)
    rlen = np.ones((1, nr), np.int32)
    for k, r in enumerate(reads):
        b = as_u8(r["bases"])
        L = len(b)
        rlen[0, k] = L
        rbase[1 : L + 1, k] = b
        rq[1 : L + 1, k] = as_u8(r["rq"])
        iq[1 : L + 1, k] = as_u8(r["iq"])
        dq[1 : L + 1, k] = as_u8(r["dq"])
        gcp[1 : L + 1, k] = as_u8(r["gcp"])
    return dict(rbase=rbase, rq=rq, iq=iq, dq=dq, gcp=gcp, rlen=rlen), rp


def pack_haps(haps, rp, hmax=None, nh=None):
    """Pack haplotypes into the reversed-extended (He, NH) array + lengths."""
    max_h = max(len(h) for h in haps)
    hmax = hmax or _bucket(max_h, HMAX_BUCKETS)
    if max_h > hmax:
        raise ValueError(f"hap bucket too small: {max_h} -> hmax={hmax}")
    # pad columns carry hlen=0: the kernel skips their DP sweep entirely
    if nh is None:
        nh = _bucket(len(haps), NH_BUCKETS)
    elif len(haps) > nh:
        raise ValueError(f"nh target too small: {len(haps)} > {nh}")
    he = hmax + 2 * rp + E_OFF
    e = np.zeros((he, nh), np.int32)
    hlen = np.zeros((1, nh), np.int32)
    p = rp - 1

    def as_u8(x):
        return np.frombuffer(bytes(x), dtype=np.uint8) if isinstance(x, (bytes, bytearray)) else np.asarray(x, dtype=np.uint8)

    for k, h in enumerate(haps):
        b = as_u8(h)
        hlen[0, k] = len(b)
        e[E_OFF + p + hmax - len(b) : E_OFF + p + hmax, k] = b[::-1]
    return e, hlen, hmax


# chunk sizes for the scan fallback: bound VMEM-equivalent host memory
# (rp * NH_CHUNK * NR_CHUNK f32 state x 7 carries) and the compile-shape ladder.
SCAN_NR_CHUNK = 512
SCAN_NH_CHUNK = 16


class _ScanChunks:
    """Lazy handle over chunked scan-path dispatches (duck-types device arrays
    enough for finish_likelihood_matrix)."""

    def __init__(self, parts, nh, nr):
        self.parts = parts  # list of (h0, r0, array)
        self.nh = nh
        self.nr = nr

    def __array__(self, dtype=None, copy=None):
        out = np.full((self.nh, self.nr), NEG_INF, np.float32)
        for h0, r0, arr in self.parts:
            a = np.asarray(arr)
            out[h0 : h0 + a.shape[0], r0 : r0 + a.shape[1]] = a
        return out.astype(dtype) if dtype is not None else out


def _scan_chunked(packed, e, hlen, rp, hmax, device=None):
    nr = packed["rbase"].shape[1]
    nh = e.shape[1]
    parts = []
    put = (lambda a: jax.device_put(a, device)) if device is not None else (lambda a: a)
    for h0 in range(0, nh, SCAN_NH_CHUNK):
        h1 = min(h0 + SCAN_NH_CHUNK, nh)
        e_c, hlen_c = put(e[:, h0:h1]), put(hlen[:, h0:h1])
        for r0 in range(0, nr, SCAN_NR_CHUNK):
            r1 = min(r0 + SCAN_NR_CHUNK, nr)
            args = tuple(
                put(packed[k][:, r0:r1]) for k in ("rbase", "rq", "iq", "dq", "gcp")
            ) + (e_c, put(packed["rlen"][:, r0:r1]), hlen_c)
            parts.append((h0, r0, _pairhmm_scan_call(*args, rp=rp, hmax=hmax)))
    return _ScanChunks(parts, nh, nr)


# Canonical cartesian program shapes (n_reads, n_haps). Each distinct
# (rp, hmax, nr, nh) is one compiled device program; compiles through the
# remote-TPU path cost 10-200s (wildly variable), so the whole HC/M2 run is
# held to this 2-program ladder: small regions pad up (pad haps skip their DP
# sweep, pad reads only waste lanes), oversize regions are CHUNKED into
# (CART_MAX_NR x CART_MAX_NH) tiles of the big shape. prewarm() dispatches
# dummy calls at startup so these compiles overlap host-side BAM/assembly work.
CARTESIAN_SHAPES = ((256, 32), (768, 128), (4096, 32))
CART_MAX_NR, CART_MAX_NH = CARTESIAN_SHAPES[-1]


class _CartParts:
    """Lazy handle over one or more cartesian-tile dispatches (duck-types a
    device array enough for finish_likelihood_matrix). parts: list of
    (h0, r0, n_h, n_r, device_out) tiles of the (nh_total, nr_total) matrix."""

    def __init__(self, parts, nh, nr):
        self.parts = parts
        self.nh = nh
        self.nr = nr

    def __array__(self, dtype=None, copy=None):
        # overlap all D2H transfers (each blocking fetch over the remote link
        # costs ~latency; async-copy first, then gather)
        for *_, arr in self.parts:
            _copy_to_host_async(arr)
        out = np.full((self.nh, self.nr), NEG_INF, np.float32)
        for h0, r0, n_h, n_r, arr in self.parts:
            a = np.asarray(arr)
            out[h0 : h0 + n_h, r0 : r0 + n_r] = a[:n_h, :n_r]
        return out.astype(dtype) if dtype is not None else out


def _copy_to_host_async(arr):
    """Enqueue a device->host copy without blocking (no-op for numpy/other)."""
    try:
        arr.copy_to_host_async()
    except AttributeError:
        pass


def _dispatch_tile(reads, haps, nr_t, nh_t, rp, hmax, device, interpret):
    packed, rp = pack_reads(reads, rp=rp, nr=nr_t)
    e, hlen, hmax = pack_haps(haps, rp, hmax=hmax, nh=nh_t)
    args = (packed["rbase"], packed["rq"], packed["iq"], packed["dq"], packed["gcp"],
            e, packed["rlen"], hlen)
    if device is not None:
        # one batched transfer for all 8 operands (vs 8 round trips — the
        # remote-device link is latency-bound)
        args = jax.device_put(args, device)
    return _pairhmm_cartesian_v6(*args, rp=rp, hmax=hmax, interpret=bool(interpret))


def start_likelihood_matrix(reads, haps, interpret=None, device=None):
    """Pack and LAUNCH the cartesian kernel without blocking; returns an opaque
    handle for finish_likelihood_matrix. Dispatching many regions before
    fetching any result pipelines host packing/assembly with device compute
    (and hides remote-device round-trip latency).

    On CPU backends the compiled lax.scan fallback replaces the Pallas kernel
    (interpret mode is orders of magnitude slower); pass interpret=True to force
    the Pallas interpreter (kernel unit tests). device pins the computation to
    one mesh device (interval-shard data parallelism)."""
    if interpret is None and jax.default_backend() == "cpu":
        packed, rp = pack_reads(reads)
        e, hlen, hmax = pack_haps(haps, rp)
        return _scan_chunked(packed, e, hlen, rp, hmax, device=device)
    max_r = max(len(r["bases"]) for r in reads)
    max_h = max(len(h) for h in haps)
    # floor rp/hmax at the canonical (160, 512): the v6 kernel's diagonal sweep
    # stops at the block's dynamic max hlen, so hmax padding costs only e-array
    # bytes — holding one (rp, hmax) for all typical regions avoids extra
    # programs (each is a 10-200s remote compile).
    rp = max(160, _bucket(max_r + 2, RP_BUCKETS))
    hmax = max(512, _bucket(max_h, HMAX_BUCKETS))
    # smallest single-program fit (least pair padding)
    best_fit = min(
        (s for s in CARTESIAN_SHAPES if len(reads) <= s[0] and len(haps) <= s[1]),
        key=lambda s: s[0] * s[1], default=None)
    if best_fit is not None:
        out = _dispatch_tile(reads, haps, best_fit[0], best_fit[1], rp, hmax,
                             device, interpret)
        _copy_to_host_async(out)
        return _CartParts([(0, 0, len(haps), len(reads), out)], len(haps), len(reads))
    # oversize region: tile the (haps x reads) grid, choosing the ladder shape
    # that minimizes dispatch count (the remote link is latency-bound), then
    # padded-pair waste
    def _tile_cost(s):
        nt = -(-len(reads) // s[0]) * -(-len(haps) // s[1])
        return (nt, nt * s[0] * s[1])

    nr_tile, nh_tile = min(CARTESIAN_SHAPES, key=_tile_cost)
    parts = []
    for h0 in range(0, len(haps), nh_tile):
        hs = haps[h0 : h0 + nh_tile]
        for r0 in range(0, len(reads), nr_tile):
            rs = reads[r0 : r0 + nr_tile]
            out = _dispatch_tile(rs, hs, nr_tile, nh_tile, rp, hmax,
                                 device, interpret)
            _copy_to_host_async(out)
            parts.append((h0, r0, len(hs), len(rs), out))
    return _CartParts(parts, len(haps), len(reads))


def finish_likelihood_matrix(handle, reads, haps, floor="clamp"):
    """Block on a start_likelihood_matrix handle and post-process."""
    mat = np.asarray(handle, np.float64)[: len(haps), : len(reads)].T
    bad = ~(mat > MIN_ACCEPTED_LOG10)
    if bad.any():
        if floor == "host":
            from . import pairhmm_host

            for r_i, h_i in zip(*np.nonzero(bad)):
                r = reads[r_i]
                mat[r_i, h_i] = pairhmm_host.compute_log10_likelihood(
                    haps[h_i], r["bases"], r["rq"], r["iq"], r["dq"], r["gcp"]
                )
        else:
            mat[bad] = MIN_ACCEPTED_LOG10
    return mat


_PREWARM_HANDLES = []


_PREWARM_THREAD = []


def prewarm_wait(timeout=None):
    """Block until prewarm's background compile(s) finish (bench harnesses call
    this between untimed setup and the timed section so remote-compile latency
    never pollutes a measurement)."""
    for t in _PREWARM_THREAD:
        t.join(timeout)


def prewarm(shapes=CARTESIAN_SHAPES, rp=160, hmax=512, device=None):
    """Asynchronously compile/load the canonical HC device programs: the pooled
    scan programs (k=POOL_K and k=1) plus the cartesian fallback shapes.

    Dispatches one dummy call per program WITHOUT fetching: jit dispatch is
    non-blocking on the TPU path, so the (potentially 10-200s) backend compile
    proceeds while the caller reads BAM / profiles activity / assembles. No-op
    on CPU backends (the scan fallback compiles in milliseconds). Mirrors the
    reference's native-PairHMM eager initialization (VectorLoglessPairHMM.java:60
    loads+initializes the native library before traversal starts)."""
    if jax.default_backend() == "cpu":
        return
    import threading

    def _go():
        try:
            he = hmax + 2 * rp + E_OFF
            pools = (np.zeros((rp, POOL_NR), np.int8),) * 5 + (
                np.ones((1, POOL_NR), np.int32),
                np.zeros((he, POOL_NH), np.int8),
                np.ones((1, POOL_NH), np.int32))
            if device is not None:
                pools = jax.device_put(pools, device)
            idx = (np.zeros((POOL_K, POOL_N), np.int32),) * 2
            if device is not None:
                idx = jax.device_put(idx, device)
            out = _pool_scan_exec(pools, idx, rp, hmax)
            _PREWARM_HANDLES.append(out)
            # force the (possibly cold, 10-400s) remote compile to completion
            # NOW, in this background thread, so foreground fetches never
            # absorb it; when the compile service is warm this costs one cheap
            # dummy execution
            np.asarray(out)
            for nr_t, nh_t in shapes:
                read = dict(bases=b"ACGT" * 16, rq=np.full(64, 30, np.uint8),
                            iq=np.full(64, 45, np.uint8), dq=np.full(64, 45, np.uint8),
                            gcp=np.full(64, 10, np.uint8))
                _PREWARM_HANDLES.append(_dispatch_tile(
                    [read], [b"ACGT" * 24], nr_t, nh_t, rp, hmax, device, False))
        except Exception:  # pragma: no cover - prewarm is best-effort
            pass

    t = threading.Thread(target=_go, daemon=True, name="pairhmm-prewarm")
    _PREWARM_THREAD.append(t)
    t.start()


def compute_likelihood_matrix(reads, haps, interpret=None, floor="clamp"):
    """(n_reads, n_haps) float64 log10 likelihood matrix via the cartesian kernel.

    floor='clamp': values at/below the f32 floor become MIN_ACCEPTED_LOG10 — safe
    for HC because downstream normalization caps at best-4.5 and reads whose best
    is below -8 are filtered (see module docstring). floor='host': recompute such
    entries exactly on the host (GKL double-fallback semantics).
    """
    out = start_likelihood_matrix(reads, haps, interpret=interpret)
    mat = np.asarray(out, np.float64)[: len(haps), : len(reads)].T  # (n_reads, n_haps)
    bad = ~(mat > MIN_ACCEPTED_LOG10)
    if bad.any():
        if floor == "host":
            from . import pairhmm_host

            for r_i, h_i in zip(*np.nonzero(bad)):
                r = reads[r_i]
                mat[r_i, h_i] = pairhmm_host.compute_log10_likelihood(
                    haps[h_i], r["bases"], r["rq"], r["iq"], r["dq"], r["gcp"]
                )
        else:
            mat[bad] = MIN_ACCEPTED_LOG10
    return mat


# ---------------------------------------------------------------------------
# Pooled cross-region dispatch
#
# The per-region cartesian path above marshals every region's reads+haps to the
# device separately (VectorLoglessPairHMM.java:90 marshals one region per native
# call). Through a remote-device link that is BANDWIDTH-bound (~20-80 MB/s
# observed), re-transferring int32 operands per region dominates the wall clock.
# The pooled path instead:
#   * packs ALL regions' reads/haps once into int8 device pools (4x fewer bytes;
#     upcast to int32 on device),
#   * expresses each region's read x hap cartesian product as (read_idx, hap_idx)
#     pair lists gathered ON DEVICE from the pools, and
#   * batches many 32k-pair launches into one lax.scan dispatch, so per-launch
#     link round-trips amortize across ~0.5M pairs.
# Per-128-lane blocks the v6 kernel bounds its sweep by the block max hlen, so
# dummy pad pairs (rlen=1/hlen=1) cost ~nothing.
# ---------------------------------------------------------------------------

POOL_NR = 16384  # read-instance pool capacity (last column = dummy)
POOL_NH = 1024  # haplotype pool capacity (last column = dummy)
POOL_N = 32768  # pairs per kernel launch
POOL_K = 16  # launches per scan dispatch (one link round-trip per K launches)


@functools.partial(jax.jit, static_argnames=("rp", "hmax", "interpret"))
def _pairhmm_pool_scan(rb, rq, iq, dq, gcp, rlen, e, hlen, ri, hi, *, rp, hmax,
                       interpret=False):
    """Pool-gather PairHMM: pools are int8 (rp, NR)/(he, NH) device residents;
    ri/hi are (k, n) int32 pair indices. Returns (k, 1, n) f32 log10."""

    def step(_, idx):
        ri1, hi1 = idx

        def g(a):
            return jnp.asarray(a, jnp.int32)[:, ri1]

        out = _pairhmm_call_v6(
            g(rb), g(rq), g(iq), g(dq), g(gcp),
            jnp.asarray(e, jnp.int32)[:, hi1], rlen[:, ri1], hlen[:, hi1],
            rp=rp, hmax=hmax, interpret=interpret)
        return None, out

    _, outs = jax.lax.scan(step, None, (ri, hi))
    return outs


# --- AOT executable cache -----------------------------------------------------
#
# The remote-TPU compile service takes 10-400s per Mosaic program with a cache
# that is unreliable across processes. jax's AOT serialization
# (jax.experimental.serialize_executable) bypasses compilation entirely: the
# first process to compile a canonical program serializes the loaded executable
# to ~/.cache/gatk_tpu/aot/; every later process deserializes in <0.1s. The key
# hashes the *lowered module* (so kernel edits invalidate automatically) plus
# the backend platform_version and jaxlib version.

_AOT_MEM = {}
_AOT_LOCK = None


def _aot_lock():
    global _AOT_LOCK
    if _AOT_LOCK is None:
        import threading
        _AOT_LOCK = threading.Lock()
    return _AOT_LOCK


def _aot_dir():
    import os
    d = os.environ.get("GATK_TPU_AOT_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "gatk_tpu", "aot")
    os.makedirs(d, exist_ok=True)
    return d


def _aot_executable(name, fn, example_args):
    """Load-or-compile a fixed-shape executable, AOT-cached on disk.

    fn: a function of positional arrays only (shapes fixed by example_args).
    Returns a jax Compiled (callable with arrays of the example shapes), or
    None if AOT is unavailable (fall back to plain jit dispatch)."""
    if name in _AOT_MEM:
        return _AOT_MEM[name]
    with _aot_lock():
        return _aot_executable_locked(name, fn, example_args)


def _aot_executable_locked(name, fn, example_args):
    if name in _AOT_MEM:  # compiled by the thread that held the lock first
        return _AOT_MEM[name]
    try:
        import hashlib
        import os
        import pickle

        from jax.experimental import serialize_executable as se

        jfn = jax.jit(fn)
        lowered = jfn.lower(*example_args)
        backend = jax.devices()[0].client
        h = hashlib.sha256()
        h.update(lowered.as_text().encode())
        h.update(getattr(backend, "platform_version", "").encode())
        h.update(jax.__version__.encode())
        path = os.path.join(_aot_dir(), f"{name}-{h.hexdigest()[:24]}.aot")
        if os.path.exists(path):
            with open(path, "rb") as f:
                compiled = se.deserialize_and_load(*pickle.loads(f.read()))
        else:
            compiled = lowered.compile()
            payload = pickle.dumps(se.serialize(compiled))
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        _AOT_MEM[name] = compiled
        return compiled
    except Exception:  # pragma: no cover - AOT is a fast-path only
        _AOT_MEM[name] = None
        return None


def _pool_scan_exec(pools, idx, rp, hmax, interpret=False):
    """Dispatch one pooled scan: AOT-cached executable on TPU backends,
    plain jit elsewhere (CPU tests / interpret mode)."""
    k = idx[0].shape[0]
    if not interpret and jax.default_backend() != "cpu":
        nr, nh, n = pools[0].shape[1], pools[6].shape[1], idx[0].shape[1]
        name = f"pool_scan_rp{rp}_h{hmax}_nr{nr}_nh{nh}_n{n}_k{k}"
        # IMPORTANT: compile via a stably-NAMED function (not a lambda) — the
        # compile-service cache keys include the HLO module name, so an
        # anonymous wrapper would orphan the cached binary every process.
        fn = functools.partial(_pairhmm_pool_scan, rp=rp, hmax=hmax,
                               interpret=False)
        functools.update_wrapper(fn, _pairhmm_pool_scan)
        compiled = _aot_executable(name, fn, tuple(pools) + tuple(idx))
        if compiled is not None:
            return compiled(*pools, *idx)
    return _pairhmm_pool_scan(*pools, *idx, rp=rp, hmax=hmax, interpret=interpret)


class _PoolSlice:
    """Lazy handle for one region's (nh, nr) likelihood matrix inside a
    PoolBatcher (duck-types a device array for finish_likelihood_matrix)."""

    def __init__(self, batcher, nh, nr):
        self.batcher = batcher
        self.segments = []  # (flush_record, pair_offset, n_read_cols) in fill order
        self.nh = nh
        self.nr = nr

    def __array__(self, dtype=None, copy=None):
        # pairs are hap-major within each read-column chunk, so each segment is
        # an (nh, take) column block of the final (nh, nr) matrix
        out = np.empty((self.nh, self.nr), np.float32)
        col = 0
        for rec, off, take in self.segments:
            self.batcher._materialize(rec)
            out[:, col : col + take] = rec["values"][off : off + self.nh * take].reshape(
                self.nh, take)
            col += take
        if col < self.nr:  # fetched before flush: push pending work out, retry
            self.batcher.flush()
            return self.__array__(dtype=dtype, copy=copy)
        return out.astype(dtype) if dtype is not None else out


class PoolBatcher:
    """Cross-region PairHMM dispatcher (the r04 answer to per-region launches).

    Usage: handle = batcher.add_region(prepped_reads, hap_bases); ...;
    batcher.flush(); np.asarray(handle) -> (nh, nr) log10 matrix. Thread-safe
    add_region (host assembly workers feed one shared batcher). On CPU backends
    every region falls through to the compiled lax.scan fallback per region
    (identical to start_likelihood_matrix)."""

    def __init__(self, device=None, rp=160, hmax=512, interpret=False,
                 nr_cap=POOL_NR, nh_cap=POOL_NH, pool_n=POOL_N, pool_k=POOL_K):
        self.device = device
        self.rp = rp
        self.hmax = hmax
        self.interpret = interpret
        self.nr_cap = nr_cap
        self.nh_cap = nh_cap
        self.pool_n = pool_n
        self.pool_k = pool_k
        self._lock = __import__("threading").Lock()
        self._cpu = jax.default_backend() == "cpu" and not interpret
        self._reset_pool()
        self._records = []  # flushed dispatch groups

    def _reset_pool(self):
        rp, he = self.rp, self.hmax + 2 * self.rp + E_OFF
        nr, nh = self.nr_cap, self.nh_cap
        self._rb = np.zeros((rp, nr), np.int8)
        self._rq = np.zeros((rp, nr), np.int8)
        self._iq = np.zeros((rp, nr), np.int8)
        self._dq = np.zeros((rp, nr), np.int8)
        self._gcp = np.zeros((rp, nr), np.int8)
        self._rlen = np.ones((1, nr), np.int32)
        self._e = np.zeros((he, nh), np.int8)
        self._hlen = np.ones((1, nh), np.int32)
        self._n_reads = 0
        self._n_haps = 0
        self._pairs_ri = []  # list of (nr_i,) int32 per hap row, in stream order
        self._pairs_hi = []
        self._n_pairs = 0
        self._pending = []  # (slice, region spans) awaiting flush

    def _add_reads(self, reads):
        """Pack reads into pool columns [n_reads, n_reads+len); returns base idx."""
        base = self._n_reads
        for k, r in enumerate(reads):
            b = np.frombuffer(bytes(r["bases"]), np.uint8) if isinstance(
                r["bases"], (bytes, bytearray)) else np.asarray(r["bases"], np.uint8)
            L = len(b)
            col = base + k
            self._rlen[0, col] = L
            self._rb[1 : L + 1, col] = b
            self._rq[1 : L + 1, col] = np.asarray(r["rq"], np.uint8)
            self._iq[1 : L + 1, col] = np.asarray(r["iq"], np.uint8)
            self._dq[1 : L + 1, col] = np.asarray(r["dq"], np.uint8)
            self._gcp[1 : L + 1, col] = np.asarray(r["gcp"], np.uint8)
        self._n_reads = base + len(reads)
        return base

    def _add_haps(self, haps):
        base = self._n_haps
        p, hmax = self.rp - 1, self.hmax
        for k, h in enumerate(haps):
            b = np.frombuffer(bytes(h), np.uint8) if isinstance(
                h, (bytes, bytearray)) else np.asarray(h, np.uint8)
            col = base + k
            self._hlen[0, col] = len(b)
            self._e[E_OFF + p + hmax - len(b) : E_OFF + p + hmax, col] = b[::-1]
        self._n_haps = base + len(haps)
        return base

    def add_region(self, reads, haps, interpret=None) -> object:
        """Queue one region's read x hap cartesian product; returns a lazy
        handle whose np.asarray() is the (nh, nr) log10 matrix."""
        if self._cpu:
            # per-region compiled scan fallback (fast-compile CPU path)
            packed, rp = pack_reads(reads)
            e, hlen, hmax = pack_haps(haps, rp)
            return _scan_chunked(packed, e, hlen, rp, hmax, device=self.device)
        max_r = max(len(r["bases"]) for r in reads)
        max_h = max(len(h) for h in haps)
        if max_r > self.rp - 2 or max_h > self.hmax or len(haps) > self.nh_cap - 1:
            # oversize region (long reads / long haplotypes): dedicated
            # cartesian dispatch outside the pool ladder
            return start_likelihood_matrix(reads, haps, interpret=self.interpret or None,
                                           device=self.device)
        with self._lock:
            handle = _PoolSlice(self, len(haps), len(reads))
            # reads may exceed pool capacity: split into column chunks
            r0 = 0
            while r0 < len(reads):
                if self._n_haps + len(haps) > self.nh_cap - 1 or self._n_reads >= self.nr_cap - 1:
                    self._flush_locked()
                take = min(len(reads) - r0, self.nr_cap - 1 - self._n_reads)
                chunk = reads[r0 : r0 + take]
                rbase = self._add_reads(chunk)
                hbase = self._add_haps(haps)
                ri_row = np.arange(rbase, rbase + take, dtype=np.int32)
                for j in range(len(haps)):
                    self._pairs_ri.append(ri_row)
                    self._pairs_hi.append(np.full(take, hbase + j, np.int32))
                self._pending.append((handle, self._n_pairs, take))
                self._n_pairs += take * len(haps)
                r0 += take
            # auto-flush once a full scan-dispatch worth of pairs is queued:
            # the device starts while later regions are still assembling
            if self._n_pairs >= self.pool_k * self.pool_n:
                self._flush_locked()
            return handle

    def flush(self):
        with self._lock:
            self._flush_locked()

    def _flush_locked(self):
        if not self._pending:
            self._reset_pool() if self._n_reads else None
            return
        n = self._n_pairs
        pool_n = self.pool_n
        n_pad = _round_up(n, pool_n)
        ri = np.full(n_pad, self.nr_cap - 1, np.int32)
        hi = np.full(n_pad, self.nh_cap - 1, np.int32)
        ri[:n] = np.concatenate(self._pairs_ri)
        hi[:n] = np.concatenate(self._pairs_hi)
        n_chunks = n_pad // pool_n
        pools = (self._rb, self._rq, self._iq, self._dq, self._gcp,
                 self._rlen, self._e, self._hlen)
        if self.device is not None:
            pools = jax.device_put(pools, self.device)
        rec = dict(values=None, outs=[], n=n)
        c0 = 0
        while c0 < n_chunks:
            # always the k=POOL_K program: ONE device program for the whole
            # engine (each distinct program risks a 10-400s remote compile);
            # trailing dummy rows (rlen=1/hlen=1) sweep ~(rp/2) diagonals vs
            # ~(rp+hmax)/2 for real rows, so padding a partial dispatch is cheap
            k = self.pool_k
            kc = min(k, n_chunks - c0)
            ri_k = np.full((k, pool_n), self.nr_cap - 1, np.int32)
            hi_k = np.full((k, pool_n), self.nh_cap - 1, np.int32)
            ri_k[:kc] = ri[c0 * pool_n : (c0 + kc) * pool_n].reshape(kc, pool_n)
            hi_k[:kc] = hi[c0 * pool_n : (c0 + kc) * pool_n].reshape(kc, pool_n)
            idx = (ri_k, hi_k)
            if self.device is not None:
                idx = jax.device_put(idx, self.device)
            out = _pool_scan_exec(pools, idx, self.rp, self.hmax,
                                  interpret=self.interpret)
            _copy_to_host_async(out)
            rec["outs"].append((out, kc))
            c0 += kc
        for handle, off, take in self._pending:
            handle.segments.append((rec, off, take))
        self._records.append(rec)
        self._reset_pool()

    def _materialize(self, rec):
        with self._lock:
            if rec["values"] is not None:
                return
            # a handle fetched before flush(): flush whatever is pending
            if rec.get("outs") == [] and rec["n"] == 0:
                rec["values"] = np.empty(0, np.float32)
                return
            parts = [np.asarray(out)[:kc, 0, :].reshape(-1) for out, kc in rec["outs"]]
            rec["values"] = np.concatenate(parts)[: rec["n"]] if parts else np.empty(0, np.float32)
            rec["outs"] = None  # release device buffers (HBM) once fetched
            # prune fully-materialized records so a long run's dispatch history
            # doesn't pin host memory for the process lifetime
            self._records = [r for r in self._records if r["values"] is None]


def compute_log10_likelihoods(reads, haps, pair_read_idx, pair_hap_idx, interpret=None):
    """End-to-end: pack on host, run the Pallas kernel, return (n_pairs,) float64.

    Pairs whose f32 result falls below MIN_ACCEPTED_LOG10 (or is non-finite) are
    recomputed on host in f64, mirroring the reference native kernel's
    double-precision fallback.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    packed, rp, hmax, n_pairs = pack_batch(reads, haps, pair_read_idx, pair_hap_idx)
    out = _pairhmm_call_v6(
        packed["rbase"], packed["rq"], packed["iq"], packed["dq"], packed["gcp"],
        packed["e"], packed["rlen"], packed["hlen"], rp=rp, hmax=hmax, interpret=interpret,
    )
    res = np.asarray(out)[0, :n_pairs].astype(np.float64)
    bad = ~(res > MIN_ACCEPTED_LOG10)
    if bad.any():
        from . import pairhmm_host

        for k in np.nonzero(bad)[0]:
            r = reads[pair_read_idx[k]]
            h = haps[pair_hap_idx[k]]
            res[k] = pairhmm_host.compute_log10_likelihood(
                h, r["bases"], r["rq"], r["iq"], r["dq"], r["gcp"]
            )
    return res
