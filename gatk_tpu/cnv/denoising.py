"""gCNV coherent denoising + per-interval copy-number HMM, jax/TPU-native.

Reference behavior: gcnvkernel models/model_denoising_calling.py (1284 LoC:
bias factorization, unexplained variance, mapping-error floor, CN prior HMM)
and models/pytensor_hmm.py (forward-backward). The reference trains with PyMC
ADVI + deterministic annealing on CPU; this implementation alternates
jit-compiled ADAM steps on the continuous parameters (marginalizing CN with a
batched lax.scan forward-backward) — same model, hardware-shaped inference.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


@dataclass
class DenoisingConfig:
    max_copy_number: int = 5
    max_bias_factors: int = 5
    p_alt: float = 1e-6
    cnv_coherence_length: float = 10000.0
    mapping_error_rate: float = 0.01
    learning_rate: float = 0.05
    max_rounds: int = 12
    m_steps_per_round: int = 40
    depth_correction_tau: float = 10000.0


def _nb_logpmf(y, mu, alpha):
    """NegBin log pmf, mean mu, inverse-dispersion alpha (vectorized)."""
    return (gammaln(y + alpha) - gammaln(alpha) - gammaln(y + 1.0)
            + alpha * (jnp.log(alpha) - jnp.log(alpha + mu))
            + y * (jnp.log(mu) - jnp.log(alpha + mu)))


def _hmm_forward_backward(log_emission, log_prior, log_trans):
    """Batched FB. log_emission: (S, T, C); log_prior: (C,) per-chain start;
    log_trans: (T-1, C, C) position-dependent. Returns log posteriors (S, T, C)."""

    def fwd_step(alpha, inputs):
        em, tr = inputs  # em: (S, C); tr: (C, C)
        nxt = jax.scipy.special.logsumexp(alpha[:, :, None] + tr[None], axis=1) + em
        return nxt, nxt

    alpha0 = log_prior[None] + log_emission[:, 0]
    _, alphas = jax.lax.scan(fwd_step, alpha0,
                             (jnp.swapaxes(log_emission[:, 1:], 0, 1), log_trans))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (T, S, C)

    def bwd_step(beta, inputs):
        em, tr = inputs
        nxt = jax.scipy.special.logsumexp(tr[None] + (em + beta)[:, None, :], axis=2)
        return nxt, nxt

    betaT = jnp.zeros_like(alpha0)
    _, betas = jax.lax.scan(bwd_step, betaT,
                            (jnp.swapaxes(log_emission[:, 1:], 0, 1)[::-1], log_trans[::-1]))
    betas = jnp.concatenate([betas[::-1], betaT[None]], axis=0)
    log_post = alphas + betas  # (T, S, C)
    log_post -= jax.scipy.special.logsumexp(log_post, axis=2, keepdims=True)
    return jnp.swapaxes(log_post, 0, 1)  # (S, T, C)


class GermlineDenoisingModel:
    """Cohort-mode denoising + calling over a (samples x intervals) count matrix."""

    def __init__(self, counts: np.ndarray, interval_ploidy: np.ndarray,
                 contig_ids: np.ndarray, distances: np.ndarray,
                 interval_lengths: np.ndarray | None = None,
                 config: DenoisingConfig | None = None, seed: int = 1984):
        """counts: (S, T) int; interval_ploidy: (S, T) int (from contig ploidy);
        contig_ids: (T,) int chain id per interval; distances: (T-1,) bp between
        consecutive interval midpoints (huge where contig changes)."""
        self.cfg = config or DenoisingConfig()
        self.counts = jnp.asarray(counts, jnp.float32)
        self.ploidy = jnp.asarray(interval_ploidy, jnp.float32)
        S, T = counts.shape
        C = self.cfg.max_copy_number + 1
        self.S, self.T, self.C = S, T, C

        # chain-break mask: where contig changes, transitions reset to prior
        breaks = contig_ids[1:] != contig_ids[:-1]
        self.distances = jnp.asarray(np.where(breaks, 1e12, distances), jnp.float32)

        rng = np.random.default_rng(seed)
        if interval_lengths is None:
            interval_lengths = np.ones(T)
        # explicit log-length offset so b_t only carries residual bias
        self.log_len = jnp.asarray(np.log(interval_lengths / interval_lengths.mean()), jnp.float32)
        med = np.maximum(np.median(counts / (interval_lengths / interval_lengths.mean())[None, :], axis=1), 1.0)
        params = {
            "log_d": jnp.asarray(np.log(med / 2.0), jnp.float32),  # per-copy depth
            "b": jnp.zeros(T, jnp.float32),
            "W": jnp.asarray(rng.normal(0, 0.01, (T, self.cfg.max_bias_factors)), jnp.float32),
            "z": jnp.asarray(rng.normal(0, 0.01, (S, self.cfg.max_bias_factors)), jnp.float32),
            "log_alpha": jnp.full(S, math.log(50.0), jnp.float32),  # inverse overdispersion
        }
        self.params = params

    # ---------------- model pieces ----------------

    def _emission(self, params):
        """log p(y_st | c) for all states: (S, T, C)."""
        cfg = self.cfg
        bias = params["b"][None, :] + params["z"] @ params["W"].T  # (S, T)
        base_mu = jnp.exp(params["log_d"][:, None] + self.log_len[None, :] + bias)  # per-copy mean
        c = jnp.arange(self.C, dtype=jnp.float32)
        mu = base_mu[:, :, None] * (c[None, None, :] + cfg.mapping_error_rate)
        alpha = jnp.exp(params["log_alpha"])[:, None, None]
        return _nb_logpmf(self.counts[:, :, None], mu, alpha)

    def _prior_and_trans(self):
        cfg = self.cfg
        C = self.C
        # per-sample-interval baseline state = ploidy; stationary prior
        c = jnp.arange(C, dtype=jnp.float32)
        # prior per (S, T, C): pi(c) = 1 - (C-1)*p_alt at baseline, p_alt elsewhere
        base = self.ploidy[:, :, None]  # (S, T, 1)
        pi = jnp.where(c[None, None, :] == base, 1.0 - (C - 1) * cfg.p_alt, cfg.p_alt)
        log_pi = jnp.log(pi)
        stay = jnp.exp(-self.distances / cfg.cnv_coherence_length)  # (T-1,)
        return log_pi, stay

    def _posteriors(self, params):
        log_em = self._emission(params)
        log_pi, stay = self._prior_and_trans()
        # transition at t: stay*delta + (1-stay)*pi_{t+1}; fold per-sample prior in
        # by running FB per sample with its own prior via emission augmentation.
        # T(c -> c') as (T-1, C, C) per sample is too big; exploit that pi is
        # per-sample constant across intervals of one contig (ploidy changes only
        # at chain breaks where stay ~ 0). Use sample-batched FB with shared
        # transitions computed from the baseline=ploidy at t+1 per sample.
        # Approximation-free for a single baseline per chain.
        eye = jnp.eye(self.C)

        def per_sample(le, lp):
            trans = jnp.log(
                stay[:, None, None] * eye[None]
                + (1.0 - stay)[:, None, None] * jnp.exp(lp[1:])[:, None, :]
            )
            return _hmm_forward_backward(le[None], lp[0], trans)[0]

        return jax.vmap(per_sample)(log_em, log_pi)

    def _loss(self, params, q):
        """Negative expected complete-data log likelihood + parameter priors.

        b_t gets a broad prior (simulated/real per-interval bias spans decades);
        scale identifiability comes from the closed-form depth/bias M-steps."""
        log_em = self._emission(params)
        ell = jnp.sum(q * log_em)
        prior = (
            -0.5 * jnp.sum(params["b"] ** 2) / 25.0
            - 0.5 * jnp.sum(params["W"] ** 2) / 1.0
            - 0.5 * jnp.sum(params["z"] ** 2) / 1.0
        )
        return -(ell + prior)

    def _closed_form_scale_updates(self, params, q):
        """Alternating exact M-steps for depth and per-interval bias given CN
        posteriors (Poisson-limit closed forms; a few sweeps suffice)."""
        cfg = self.cfg
        c = jnp.arange(self.C, dtype=jnp.float32)
        exp_c = jnp.sum(q * (c[None, None, :] + cfg.mapping_error_rate), axis=2)  # (S, T)
        y = self.counts
        fac = jnp.exp(self.log_len[None, :] + params["z"] @ params["W"].T)  # (S, T) w/o b, d
        b = params["b"]
        log_d = params["log_d"]
        for _ in range(3):
            denom_d = jnp.sum(exp_c * fac * jnp.exp(b)[None, :], axis=1)
            log_d = jnp.log(jnp.maximum(jnp.sum(y, axis=1) / jnp.maximum(denom_d, 1e-10), 1e-10))
            denom_b = jnp.sum(exp_c * fac * jnp.exp(log_d)[:, None], axis=0)
            b = jnp.log(jnp.maximum(jnp.sum(y, axis=0) / jnp.maximum(denom_b, 1e-10), 1e-10))
        return {**params, "log_d": log_d, "b": b}

    # ---------------- training ----------------

    def fit(self, verbose=False):
        cfg = self.cfg
        params = self.params

        posteriors_fn = jax.jit(self._posteriors)
        loss_grad = jax.jit(jax.value_and_grad(self._loss))

        # simple ADAM
        m = {k: jnp.zeros_like(v) for k, v in params.items()}
        v = {k: jnp.zeros_like(v) for k, v in params.items()}
        b1, b2, eps = 0.9, 0.999, 1e-8

        @jax.jit
        def adam_step(params, m, v, q, t):
            loss, g = loss_grad(params, q)
            new_p, new_m, new_v = {}, {}, {}
            for k in params:
                new_m[k] = b1 * m[k] + (1 - b1) * g[k]
                new_v[k] = b2 * v[k] + (1 - b2) * g[k] ** 2
                mhat = new_m[k] / (1 - b1 ** t)
                vhat = new_v[k] / (1 - b2 ** t)
                new_p[k] = params[k] - cfg.learning_rate * mhat / (jnp.sqrt(vhat) + eps)
            return new_p, new_m, new_v, loss

        scale_fn = jax.jit(self._closed_form_scale_updates)
        # denoising warm-up: CN pinned at the ploidy baseline while the bias
        # model converges (gcnvkernel's denoising epochs before calling starts)
        base_q = jax.nn.one_hot(self.ploidy.astype(jnp.int32), self.C)
        t = 1
        warmup = max(2, cfg.max_rounds // 3)
        for rnd in range(cfg.max_rounds):
            q = base_q if rnd < warmup else jnp.exp(posteriors_fn(params))
            params = scale_fn(params, q)
            for _ in range(cfg.m_steps_per_round):
                params, m, v, loss = adam_step(params, m, v, q, t)
                t += 1
            params = scale_fn(params, q)
            if verbose:
                print(f"round {rnd}: loss {float(loss):.1f}")
        self.params = params
        self.log_posteriors = np.asarray(posteriors_fn(params))
        return self

    def copy_number_calls(self):
        """(cn (S,T), cnlp (S,T,C) phred ints, cnq (S,T))."""
        lp = self.log_posteriors
        cn = lp.argmax(axis=2)
        phred = np.round(-10.0 * (lp / math.log(10.0)))
        phred = np.clip(phred - phred.min(axis=2, keepdims=True), 0, 3000).astype(int)
        sorted_p = np.sort(phred, axis=2)
        cnq = sorted_p[:, :, 1]
        return cn, phred, cnq

    def denoised_copy_ratios(self):
        params = self.params
        bias = np.asarray(params["b"])[None, :] + np.asarray(params["z"]) @ np.asarray(params["W"]).T
        base_mu = np.exp(np.asarray(params["log_d"])[:, None] + np.asarray(self.log_len)[None, :] + bias)
        return np.asarray(self.counts) / np.maximum(base_mu * np.asarray(self.ploidy), 1e-10) * np.asarray(self.ploidy) / 2.0
