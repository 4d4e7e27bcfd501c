"""jax-native MCMC for ModelSegments posterior modelling.

Reference: utils/mcmc/GibbsSampler.java + SliceSampler.java driving
copynumber/models/CopyRatioModeller.java (per-segment log2 copy-ratio means
with a global variance and per-point outlier indicators) and
AlleleFractionModeller.java (per-segment minor-allele fractions with a global
allelic-bias and outlier probability). Produces the posterior deciles written
to .modelFinal.seg (MultidimensionalModeller.java).

TPU-first design: instead of the reference's sequential per-parameter slice
sampling, every segment's parameter steps in parallel each sweep — a vectorized
slice sampler (step-out + shrinkage, Neal 2003) runs over the whole segment
vector inside lax.while_loop, and the Gibbs sweep is a lax.scan over
iterations. Point-level likelihoods reduce via segment_sum, so each sweep is
a handful of fused elementwise+scatter kernels regardless of segment count.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_WIDTH_STEPS = 8  # max step-out doublings
_SHRINK_STEPS = 32  # max shrinkage steps


def _vector_slice_sample(key, x0, logp, lower, upper, width):
    """One slice-sampling update for a VECTOR of independent parameters.

    logp(x_vec) -> per-parameter log densities (same shape as x_vec).
    Follows SliceSampler.java (step-out then shrink), vectorized with masks.
    """
    n = x0.shape[0]
    k_y, k_l, k_r, k_s = jax.random.split(key, 4)
    logy = logp(x0) + jnp.log(jax.random.uniform(k_y, (n,), minval=1e-12, maxval=1.0))
    # initial bracket
    u = jax.random.uniform(k_l, (n,))
    left = jnp.clip(x0 - u * width, lower, upper)
    right = jnp.clip(left + width, lower, upper)

    # step out
    def step_out(state):
        left, right, it = state
        grow_l = (logp(left) > logy) & (left > lower)
        grow_r = (logp(right) > logy) & (right < upper)
        left = jnp.where(grow_l, jnp.clip(left - width, lower, upper), left)
        right = jnp.where(grow_r, jnp.clip(right + width, lower, upper), right)
        return left, right, it + 1

    def step_cond(state):
        left, right, it = state
        need = ((logp(left) > logy) & (left > lower)) | ((logp(right) > logy) & (right < upper))
        return jnp.any(need) & (it < _WIDTH_STEPS)

    left, right, _ = jax.lax.while_loop(step_cond, step_out, (left, right, 0))

    # shrinkage
    def shrink(state):
        left, right, x, accepted, key, it = state
        key, sub = jax.random.split(key)
        prop = left + jax.random.uniform(sub, (n,)) * (right - left)
        ok = logp(prop) > logy
        newly = ok & ~accepted
        x = jnp.where(newly, prop, x)
        accepted = accepted | ok
        # shrink bracket toward x0 where rejected
        left = jnp.where(~ok & (prop < x0), jnp.maximum(left, prop), left)
        right = jnp.where(~ok & (prop >= x0), jnp.minimum(right, prop), right)
        return left, right, x, accepted, key, it + 1

    def shrink_cond(state):
        _, _, _, accepted, _, it = state
        return jnp.any(~accepted) & (it < _SHRINK_STEPS)

    _, _, x, accepted, _, _ = jax.lax.while_loop(
        shrink_cond, shrink,
        (left, right, x0, jnp.zeros(n, bool), k_s, 0))
    return jnp.where(accepted, x, x0)


# ----------------------------------------------------------------------------
# copy-ratio model (models/CopyRatioModeller.java)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(3, 4, 5))
def _copy_ratio_chain(key, y, seg_ids, n_segments, n_burn, n_samples):
    n_points = y.shape[0]
    y_min, y_max = jnp.min(y), jnp.max(y)
    span = jnp.maximum(y_max - y_min, 1e-3)
    log_outlier = -jnp.log(span)
    var_max = jnp.maximum(jnp.var(y), 1e-4) * 4.0 + 1e-4

    seg_counts = jax.ops.segment_sum(jnp.ones(n_points), seg_ids, n_segments)
    init_means = jax.ops.segment_sum(y, seg_ids, n_segments) / jnp.maximum(seg_counts, 1.0)

    def seg_loglik(means, var, outlier_prob, outlier):
        resid = y - means[seg_ids]
        ll_point = jnp.where(
            outlier,
            jnp.log(outlier_prob) + log_outlier,
            jnp.log1p(-outlier_prob) - 0.5 * jnp.log(2 * jnp.pi * var)
            - 0.5 * resid * resid / var)
        return ll_point

    def sweep(state, key):
        means, var, outlier_prob, outlier = state
        k1, k2, k3, k4 = jax.random.split(key, 4)

        # 1. outlier indicators: exact Bernoulli (CopyRatioSamplers indicator sampler)
        resid = y - means[seg_ids]
        log_in = jnp.log1p(-outlier_prob) - 0.5 * jnp.log(2 * jnp.pi * var) \
            - 0.5 * resid * resid / var
        log_out = jnp.log(outlier_prob) + log_outlier
        p_out = jax.nn.sigmoid(log_out - log_in)
        outlier = jax.random.uniform(k1, (n_points,)) < p_out

        # 2. outlier probability: Beta conjugate with prior (alpha=5, beta=95)
        n_out = jnp.sum(outlier)
        outlier_prob = jax.random.beta(k2, 5.0 + n_out, 95.0 + n_points - n_out)
        outlier_prob = jnp.clip(outlier_prob, 1e-5, 0.5)

        # 3. variance: vector slice sample of a single global param
        keep = ~outlier
        n_keep = jnp.maximum(jnp.sum(keep), 1.0)

        def var_logp(v):
            vv = v[0]
            resid2 = jnp.where(keep, (y - means[seg_ids]) ** 2, 0.0)
            return jnp.array([-0.5 * n_keep * jnp.log(vv) - 0.5 * jnp.sum(resid2) / vv])

        var = _vector_slice_sample(k3, jnp.array([var]), var_logp,
                                   jnp.array([1e-6]), jnp.array([var_max]),
                                   jnp.array([var_max * 0.05]))[0]

        # 4. segment means: all segments in parallel
        def means_logp(m):
            resid2 = jnp.where(keep, (y - m[seg_ids]) ** 2, 0.0)
            return -0.5 * jax.ops.segment_sum(resid2, seg_ids, n_segments) / var

        width = jnp.sqrt(var / jnp.maximum(seg_counts, 1.0)) * 3.0 + 1e-4
        means = _vector_slice_sample(k4, means, means_logp,
                                     jnp.full(n_segments, y_min - 1.0),
                                     jnp.full(n_segments, y_max + 1.0), width)
        return (means, var, outlier_prob, outlier), means

    init = (init_means, jnp.maximum(jnp.var(y), 1e-4), jnp.asarray(0.05),
            jnp.zeros(n_points, bool))
    keys = jax.random.split(key, n_burn + n_samples)
    _, samples = jax.lax.scan(sweep, init, keys)
    return samples[n_burn:]


def sample_copy_ratio_posteriors(seg_values, n_burn=50, n_samples=100, seed=0):
    """seg_values: list of per-segment arrays of log2 copy ratios.
    Returns (n_segments, 3) posterior 10/50/90 percentiles."""
    nonempty = [i for i, v in enumerate(seg_values) if len(v)]
    out = np.full((len(seg_values), 3), np.nan)
    if not nonempty:
        return out
    y = np.concatenate([np.asarray(seg_values[i], np.float32) for i in nonempty])
    seg_ids = np.concatenate([
        np.full(len(seg_values[i]), j, np.int32) for j, i in enumerate(nonempty)])
    samples = _copy_ratio_chain(jax.random.PRNGKey(seed), jnp.asarray(y),
                                jnp.asarray(seg_ids), len(nonempty),
                                n_burn, n_samples)
    q = np.percentile(np.asarray(samples), [10, 50, 90], axis=0).T
    for j, i in enumerate(nonempty):
        out[i] = q[j]
    return out


# ----------------------------------------------------------------------------
# allele-fraction model (models/AlleleFractionModeller.java)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(4, 5, 6))
def _allele_fraction_chain(key, alt, ref, seg_ids, n_segments, n_burn, n_samples):
    n_points = alt.shape[0]
    total = alt + ref
    minor = jnp.minimum(alt, ref).astype(jnp.float32)

    seg_counts = jax.ops.segment_sum(jnp.ones(n_points), seg_ids, n_segments)

    def log_binom(n, k, p):
        p = jnp.clip(p, 1e-6, 1 - 1e-6)
        return k * jnp.log(p) + (n - k) * jnp.log1p(-p)

    def point_loglik(f, bias):
        """per-het log likelihood marginalized over alt-minor/ref-minor
        (AlleleFractionLikelihoods.hetLogLikelihood with a scalar bias)."""
        fs = f[seg_ids]
        # alt minor: alt fraction = f / (f + (1-f)*bias); ref minor: 1 - that
        p_alt_minor = fs / (fs + (1 - fs) * bias)
        p_ref_minor = (1 - fs) / ((1 - fs) + fs * bias)
        ll_alt = log_binom(total, alt, p_alt_minor)
        ll_ref = log_binom(total, alt, p_ref_minor)
        return jnp.logaddexp(ll_alt, ll_ref) - jnp.log(2.0)

    def sweep(state, key):
        f, bias = state
        k1, k2 = jax.random.split(key)

        # global bias: slice sample (mean-bias sampler; gamma(alpha≈?) prior ~ 1)
        def bias_logp(b):
            bb = b[0]
            # weak gamma(10, 10) prior centered at 1
            return jnp.array([jnp.sum(point_loglik(f, bb)) + 9.0 * jnp.log(bb) - 10.0 * bb])

        bias = _vector_slice_sample(k1, jnp.array([bias]), bias_logp,
                                    jnp.array([0.1]), jnp.array([5.0]),
                                    jnp.array([0.1]))[0]

        # per-segment minor fractions in parallel
        def f_logp(fv):
            ll = point_loglik(fv, bias)
            return jax.ops.segment_sum(ll, seg_ids, n_segments)

        width = 0.5 / jnp.sqrt(jnp.maximum(seg_counts, 1.0)) + 0.01
        f = _vector_slice_sample(k2, f, f_logp,
                                 jnp.full(n_segments, 1e-3),
                                 jnp.full(n_segments, 0.5), width)
        return (f, bias), f

    init_f = jnp.clip(
        jax.ops.segment_sum(minor, seg_ids, n_segments)
        / jnp.maximum(jax.ops.segment_sum(total.astype(jnp.float32), seg_ids, n_segments), 1.0),
        1e-3, 0.5)
    keys = jax.random.split(key, n_burn + n_samples)
    _, samples = jax.lax.scan(sweep, (init_f, jnp.asarray(1.0)), keys)
    return samples[n_burn:]


def sample_allele_fraction_posteriors(seg_counts, n_burn=50, n_samples=100, seed=0):
    """seg_counts: list of per-segment lists of (ref_count, alt_count) het pairs.
    Returns (n_segments, 3) posterior 10/50/90 percentiles of the minor AF."""
    nonempty = [i for i, v in enumerate(seg_counts) if len(v)]
    out = np.full((len(seg_counts), 3), np.nan)
    if not nonempty:
        return out
    ref = np.concatenate([np.asarray([rc for rc, ac in seg_counts[i]], np.float32)
                          for i in nonempty])
    alt = np.concatenate([np.asarray([ac for rc, ac in seg_counts[i]], np.float32)
                          for i in nonempty])
    seg_ids = np.concatenate([
        np.full(len(seg_counts[i]), j, np.int32) for j, i in enumerate(nonempty)])
    samples = _allele_fraction_chain(jax.random.PRNGKey(seed), jnp.asarray(alt),
                                     jnp.asarray(ref), jnp.asarray(seg_ids),
                                     len(nonempty), n_burn, n_samples)
    q = np.percentile(np.asarray(samples), [10, 50, 90], axis=0).T
    for j, i in enumerate(nonempty):
        out[i] = q[j]
    return out
