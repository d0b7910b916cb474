"""DiBS gradient-estimator core — pure functions over particles.

Behavioral spec: /root/reference/dibs/inference/dibs.py:232-658. The reference
implements these as methods on a stateful class; here they are closures built
once by :func:`make_estimators` from a static config and the two model
callables, so the whole SVGD step traces into a single XLA program.

TPU-native differences from the reference:
  * the reparameterization, Θ, and acyclicity estimators are *one-vjp
    batched*: with shared MC samples the self-normalized ratio equals a
    softmax-weighted sum of per-sample gradients, so a single ``jax.vjp``
    with the weights as cotangents yields every particle's estimate (the
    reference runs one forward plus M backward passes per particle:
    dibs.py:439+447, :518+525);
  * graph samples come from the storage-free samplers in
    :mod:`dibs_tpu.ops.soft_graphs` (hardware-PRNG Pallas kernels on TPU;
    no noise tensors stored for the backward pass on any path);
  * the REINFORCE direction ``∇_Z log p(G|Z)`` uses its closed form (two
    batched matmuls, :func:`dibs_tpu.ops.edges.grad_latent_log_prob_batch`);
  * the acyclicity constraint gradient goes through the closed-form custom
    VJP in :mod:`dibs_tpu.ops.acyclic` (one extra matmul instead of a
    product-rule chain through ``matrix_power``);
  * the EMA-baseline branch resolves at trace time (``score_function_baseline``
    is static) instead of a runtime ``lax.cond``;
  * for ``LinearGaussian`` on TPU the Z- and Θ-likelihood estimates fuse
    into one single-pass online-softmax Pallas kernel
    (:mod:`dibs_tpu.inference.fused_linear`).

Estimator math (identical to the reference):

    ∇ log E_{p(G|Z)}[p(Θ, D | G)]
        = E[p(G|Z') ∇(...)] / E[p(G|Z)]      (self-normalized ratio)

computed with the *same* MC samples in numerator and denominator through a
signed ``logsumexp`` for stability.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import random, vmap
from jax.scipy.special import logsumexp
from jax.tree_util import tree_map

from dibs_tpu.ops.acyclic import acyclic_constr
from dibs_tpu.ops.edges import (
    edge_probs,
    edge_scores,
    grad_latent_log_prob_batch,
    sample_g,
)
from dibs_tpu.ops.soft_graphs import sample_hard_graphs, sample_soft_graphs
from dibs_tpu.utils.func import expand_by

__all__ = ["EstimatorConfig", "Estimators", "make_estimators", "stable_ratio_grad"]


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Static hyperparameters of the DiBS gradient estimators.

    Field meanings and defaults mirror the reference constructor
    (dibs.py:51-78); the asymmetric Marginal/Joint defaults live in the API
    classes, not here.
    """

    alpha_linear: float = 0.05
    beta_linear: float = 1.0
    tau: float = 1.0
    n_grad_mc_samples: int = 128
    n_acyclicity_mc_samples: int = 32
    grad_estimator_z: str = "reparam"  # 'score' | 'reparam'
    score_function_baseline: float = 0.0
    latent_prior_std: Optional[float] = None
    # 'notears' (reference parity: tr[(I+G/d)^d] - d) or 'spectral'
    # (beyond-reference: rho(G) via power iteration — O(K d^2) instead of
    # O(d^3 log d) per MC sample; see ops/acyclic.py)
    acyclicity: str = "notears"
    # 'sampled' (reference parity: E[∇h(G_soft)] over n_acyclicity_mc_samples
    # Gumbel-softmax samples, dibs.py:576-601) or 'mean' (beyond-reference:
    # the deterministic mean-field gradient ∇h(E[G]) = ∇h(edge_probs(Z)) —
    # zero MC samples, one h-evaluation per particle instead of K, removing
    # the K x d-step power-chain batch from the prior score entirely). Both
    # vanish exactly when the soft graph is acyclic; 'mean' swaps the MC
    # estimate of a relaxation's expectation for the relaxation at the
    # expectation. Studied (benchmarks/CONSTRAINT_MEAN_AB.json, 5 seeds,
    # full + gate protocols): quality-neutral for marginal workflows
    # (alpha_linear=1.0 saturates the sigmoid fast, killing the Jensen
    # bias) at +14% step throughput (cfg1); in JOINT configs the 20x
    # slower alpha schedule keeps the bias alive — 'mean' under-penalizes,
    # leaves cyclic particles at convergence in most runs, and degrades
    # the mixture (DiBS+) posterior, so use it there only when the
    # empirical posterior is the deliverable (+47% at cfg5).
    acyclicity_constraint: str = "sampled"

    def alpha(self, t):
        """Linear inverse-temperature schedule of the edge-prob sigmoid."""
        return self.alpha_linear * t

    def beta(self, t):
        """Linear schedule of the acyclicity-penalty weight."""
        return self.beta_linear * t


class Estimators(NamedTuple):
    """Bundle of batched (over particles) estimator callables.

    ``fused_grad_both`` is non-None when a model-specialized fused kernel can
    compute the Z- and Θ-likelihood gradients in one shot (signature
    ``(zs, thetas, t, key) -> (dz, dtheta)``); the engine prefers it when
    present.
    """

    eltwise_grad_z_likelihood: Callable
    eltwise_grad_theta_likelihood: Callable
    eltwise_grad_latent_prior: Callable
    fused_grad_both: Optional[Callable] = None


def stable_ratio_grad(log_num: jnp.ndarray, log_den: jnp.ndarray, grads: Any):
    """Self-normalized MC ratio ``E[w ∇]/E[w]`` in signed log-space, per leaf.

    Args:
        log_num: ``[M]`` numerator log-weights (possibly baseline-adjusted)
        log_den: ``[M]`` denominator log-weights
        grads: pytree whose leaves have leading MC dim ``M``

    Returns:
        pytree of ``grads`` with the MC dim contracted.

    The ``1/M`` factors of numerator and denominator cancel (same sample
    count), matching the reference's explicit ``- log M + log M``
    (dibs.py:382).
    """
    log_z = logsumexp(log_den, axis=0)

    def per_leaf(leaf):
        lse, sign = logsumexp(
            a=expand_by(log_num, leaf.ndim - 1), b=leaf, axis=0, return_sign=True
        )
        return sign * jnp.exp(lse - log_z)

    return tree_map(per_leaf, grads)


def make_estimators(
    *,
    cfg: EstimatorConfig,
    log_graph_prior: Callable,
    log_joint_prob: Callable,
    x: jnp.ndarray,
    interv_mask: jnp.ndarray,
    fused_linear_model=None,
    fused_nonlinear_model=None,
    use_pallas=None,
    sharding=None,
    node_log_joint_prob=None,
    fused_sample_sharing=None,
    batched_node_log_joint_prob=None,
) -> Estimators:
    """Builds the batched estimator callables for fixed data and models.

    Args:
        cfg: static estimator hyperparameters
        log_graph_prior: ``soft_g [d, d] -> scalar`` graph-prior log-density
            (evaluated on edge probabilities; must be differentiable)
        log_joint_prob: ``(g, theta, x, interv_mask, rng) -> scalar`` — joint
            likelihood for joint inference or marginal likelihood (ignoring
            ``theta``) for marginal inference
        x: ``[N, d]`` observations (closed over; static across the run)
        interv_mask: ``[N, d]`` intervention indicators
        fused_linear_model: optional :class:`~dibs_tpu.models.LinearGaussian`
            instance — enables the fused Pallas sample-and-score path
            (:mod:`dibs_tpu.inference.fused_linear`) on TPU when ``d`` is a
            lane multiple and the reparam estimator is selected
        use_pallas: forces the graph samplers on (True) or off (False);
            ``None`` = auto (TPU + lane-aligned shapes)
        sharding: particle-axis :class:`~jax.sharding.NamedSharding` when the
            engine runs mesh-sharded — the Pallas samplers and the fused
            linear path then run per shard via ``shard_map`` with
            global-index seeding (bitwise equal to the unsharded run)
            instead of replicating under GSPMD
        node_log_joint_prob: per-node decomposition of ``log_joint_prob``
            (``(g, theta, x, interv_mask, rng) -> [d]`` whose sum is the
            joint log-probability) — required by the ``score_rb`` estimator
        fused_sample_sharing: ``'hard'`` builds a generic fused Z+Θ
            estimator (``fused_grad_both``) that draws ONE Logistic noise
            batch for both likelihood gradients (reparam estimator only):
            the Θ-estimator scores the Gumbel-max *hard* graphs obtained by
            thresholding the soft samples at 0.5 (``sigmoid(tau u) > 0.5
            <=> u > 0`` — exactly the reference's Bernoulli distribution,
            dibs.py:102-119), while the Z-gradient is the unchanged reparam
            estimator. Same math as the separate estimators, one sampler
            pass instead of two. (A fully-relaxed single-vjp variant that
            also fed the Θ-estimator soft graphs was evaluated and
            rejected: its Θ-gradient never aligns with the exact
            enumerated gradient — cosine ~0.2 at any annealing
            temperature, because the soft mask reweights the Θ-prior term
            continuously. See tests/test_estimators.py.)
        batched_node_log_joint_prob: whole-batch per-node scorer
            (``(gs [B, d, d], theta, x, interv_mask, rng) -> [B, d]``) —
            when provided (e.g. BGe's fused Pallas determinant kernel,
            :mod:`dibs_tpu.ops.bge_kernel`), the REINFORCE ``score`` /
            ``score_rb`` estimators evaluate ALL particles' MC samples in
            one forward-only call instead of nested vmaps of the
            per-graph scorer. Unsharded runs only (the [P*M] flatten would
            merge mesh axes); marginal inference only (``theta`` unused).
    """

    # The dataset enters the estimators as a *runtime argument* when the
    # engine supplies it (x_/interv_ below), falling back to the factory
    # values for direct calls. Passing data as arguments keeps it out of the
    # compiled program's constants, so one (slow) Mosaic/XLA compile serves
    # every same-shaped dataset via the persistent compilation cache —
    # without this, each new dataset recompiled the fused kernels (~2-7 min).
    x_default, interv_default = x, interv_mask

    def _data(x_, interv_):
        return (x_default if x_ is None else x_,
                interv_default if interv_ is None else interv_)

    if sharding is not None:
        from dibs_tpu.parallel import constrain_mc as _mc_pin

        def _constrain_mc(gs):
            """Shards the MC-sample axis of ``[P, M, d, d]`` intermediates
            over the mesh's ``'mc'`` axis (no-op on a 1-D mesh) — SURVEY
            §2.4 axis 2. Downstream per-sample scoring partitions over both
            axes; the softmax / vjp reductions over M become psums."""
            return _mc_pin(gs, sharding)
    else:
        def _constrain_mc(gs):
            return gs

    # --- Z-likelihood score: REINFORCE (dibs.py:325-391) ---

    def grad_z_score(single_z, single_theta, sf_baseline, t, key, x_, interv_):
        alpha = cfg.alpha(t)
        p = edge_probs(single_z, alpha)

        key, k_g = random.split(key)
        g_samples = sample_g(p, k_g, cfg.n_grad_mc_samples)

        key, k_lik = random.split(key)
        return _grad_z_score_given_g(
            single_z, single_theta, sf_baseline, g_samples, t, k_lik,
            x_, interv_,
        )

    def _grad_z_score_given_g(single_z, single_theta, sf_baseline,
                              g_samples, t, k_lik, x_, interv_):
        logprobs = vmap(
            lambda g: log_joint_prob(g, single_theta, x_, interv_, k_lik)
        )(g_samples)
        return _grad_z_score_from_logprobs(
            single_z, sf_baseline, g_samples, logprobs, t
        )

    def _grad_z_score_from_logprobs(single_z, sf_baseline, g_samples,
                                    logprobs, t):
        alpha = cfg.alpha(t)
        # REINFORCE direction ∇_Z log p(G | Z) per MC graph sample —
        # closed form: two batched matmuls instead of M reverse-mode passes
        grad_z = grad_latent_log_prob_batch(g_samples, single_z, alpha)

        c = cfg.score_function_baseline
        if c > 0.0:
            # Variance-reduction baseline as a *signed linear-space* control
            # variate: numerator weights w_i = p_i - exp(b) with b the
            # log-space EMA of the mean log-likelihood (init -inf = off).
            # NOTE: deliberate divergence from the reference, which subtracts
            # the baseline from the numerator in log space (dibs.py:363-367)
            # — that rescales the whole gradient by exp(-baseline) and
            # overflows for any realistically-sized |log p|. The control
            # variate here is the textbook REINFORCE baseline (unbiased:
            # E[∇ log p(G|Z)] = 0) and stays finite at every scale.
            m = jnp.maximum(logprobs, sf_baseline)
            log_w = m + jnp.log(
                jnp.abs(jnp.exp(logprobs - m) - jnp.exp(sf_baseline - m))
            )
            sign_w = jnp.sign(logprobs - sf_baseline)
            grad_est = stable_ratio_grad(
                log_w, logprobs, sign_w[:, None, None, None] * grad_z
            )
            new_baseline = jnp.logaddexp(
                jnp.log(c) + logprobs.mean(0), jnp.log(1 - c) + sf_baseline
            )
        else:
            grad_est = stable_ratio_grad(logprobs, logprobs, grad_z)
            new_baseline = sf_baseline
        return grad_est, new_baseline

    # --- Z-likelihood score: per-node Rao-Blackwellized REINFORCE ---
    #
    # BEYOND-REFERENCE estimator (``grad_estimator_z="score_rb"``). When the
    # likelihood decomposes over node families, log E_{p(G|Z)}[p(D|G)] =
    # Σ_j log E_{col_j}[exp s_j(Pa_j)] because the parent columns are
    # independent under p(G|Z). Each column's gradient then self-normalizes
    # over its OWN node scores,
    #
    #     d/d score_ij = α ( Σ_m softmax_j(s_j)_m G_m[i, j]  −  p_ij ),
    #
    # instead of the whole graph's joint score — same estimand and the same
    # per-step compute as "score", but the softmax weights of node j no
    # longer carry the other d-1 nodes' score noise, collapsing the
    # estimator variance (validated in tests/test_estimators.py).

    def _grad_z_score_rb_given_g(single_z, single_theta, g_samples, t, k_lik,
                                 x_, interv_):
        node_scores = vmap(
            lambda g: node_log_joint_prob(g, single_theta, x_, interv_, k_lik)
        )(g_samples)  # [M, d]
        return _grad_z_score_rb_from_scores(single_z, g_samples, node_scores, t)

    def _grad_z_score_rb_from_scores(single_z, g_samples, node_scores, t):
        alpha = cfg.alpha(t)
        p = edge_probs(single_z, alpha)
        w = jnp.exp(node_scores - logsumexp(node_scores, axis=0))  # [M, d]
        g_bar = jnp.einsum("mij,mj->ij", g_samples, w,
                           precision=jax.lax.Precision.HIGHEST)
        resid = alpha * (g_bar - p)  # diagonals of g_bar and p are both 0
        u, v = single_z[..., 0], single_z[..., 1]
        hi = jax.lax.Precision.HIGHEST
        du = jnp.matmul(resid, v, precision=hi)
        dv = jnp.matmul(resid.T, u, precision=hi)
        return jnp.stack([du, dv], axis=-1)

    def grad_z_score_rb(single_z, single_theta, sf_baseline, t, key,
                        x_, interv_):
        alpha = cfg.alpha(t)
        p = edge_probs(single_z, alpha)
        key, k_g = random.split(key)
        g_samples = sample_g(p, k_g, cfg.n_grad_mc_samples)
        key, k_lik = random.split(key)
        grad = _grad_z_score_rb_given_g(
            single_z, single_theta, g_samples, t, k_lik, x_, interv_
        )
        return grad, sf_baseline

    def eltwise_grad_z_score_rb(zs, thetas, baselines, t, keys,
                                x=None, interv_mask=None):
        if node_log_joint_prob is None:
            raise ValueError(
                "grad_estimator_z='score_rb' needs a per-node likelihood "
                "decomposition (e.g. BGe.interventional_node_log_marginal_"
                "probs); this model does not provide one."
            )
        from dibs_tpu.ops.pallas_kernels import pallas_enabled

        x_, interv_ = _data(x, interv_mask)
        batch_hook = (batched_node_log_joint_prob is not None
                      and sharding is None)
        if batch_hook or use_pallas or (use_pallas is None
                                        and pallas_enabled()):
            g_all = _constrain_mc(sample_hard_graphs(
                edge_scores(zs), keys[0], cfg.alpha(t),
                cfg.n_grad_mc_samples, use_pallas=use_pallas,
                sharding=sharding,
            ))
            if batch_hook:
                # one fused whole-batch scorer call for every particle's
                # MC samples (BGe: the lane-batched Pallas eliminations)
                p_n, m_n, d_n = g_all.shape[0], g_all.shape[1], g_all.shape[2]
                node_scores = batched_node_log_joint_prob(
                    g_all.reshape(p_n * m_n, d_n, d_n), None, x_, interv_,
                    None,
                ).reshape(p_n, m_n, d_n)
                grads = vmap(
                    _grad_z_score_rb_from_scores, (0, 0, 0, None)
                )(zs, g_all, node_scores, t)
                return grads, baselines
            grads = vmap(
                _grad_z_score_rb_given_g, (0, 0, 0, None, 0, None, None)
            )(zs, thetas, g_all, t, keys, x_, interv_)
            return grads, baselines
        grads, _ = vmap(
            grad_z_score_rb, (0, 0, 0, None, 0, None, None), (0, 0)
        )(zs, thetas, baselines, t, keys, x_, interv_)
        return grads, baselines

    # --- Z-likelihood score: Gumbel-softmax reparameterization (dibs.py:395-459) ---
    #
    # Whole-batch formulation: the self-normalized ratio with shared samples
    # reduces to a softmax-weighted sum of per-sample gradients,
    #   ∇_Z ≈ Σ_m softmax(ℓ)_m ∇_Z ℓ_m ,
    # so ONE vjp call with the softmax weights as cotangents computes every
    # particle's estimate (the reference runs a separate forward and M
    # backward passes per particle). The relaxed graph samples come from the
    # storage-free sampler (ops/soft_graphs.py): on TPU the Logistic noise is
    # generated inside a Pallas kernel and never touches HBM.

    def eltwise_grad_z_reparam(zs, thetas, baselines, t, keys,
                               x=None, interv_mask=None):
        alpha = cfg.alpha(t)
        key_noise = keys[0]
        x_, interv_ = _data(x, interv_mask)

        def batched_logprobs(zs_):
            scores = edge_scores(zs_)
            gs = sample_soft_graphs(
                scores, key_noise, alpha, cfg.tau, cfg.n_grad_mc_samples,
                use_pallas=use_pallas, sharding=sharding,
            )
            gs = _constrain_mc(gs)
            return vmap(
                lambda g_p, th_p: vmap(
                    lambda g: log_joint_prob(g, th_p, x_, interv_, key_noise)
                )(g_p),
                (0, 0),
            )(gs, thetas)  # [P, M]

        logprobs, vjp_fn = jax.vjp(batched_logprobs, zs)
        weights = jnp.exp(logprobs - logsumexp(logprobs, axis=1, keepdims=True))
        (grads,) = vjp_fn(weights)
        return grads, baselines

    def eltwise_grad_z_score(zs, thetas, baselines, t, keys,
                             x=None, interv_mask=None):
        from dibs_tpu.ops.pallas_kernels import pallas_enabled

        x_, interv_ = _data(x, interv_mask)
        batch_hook = (batched_node_log_joint_prob is not None
                      and thetas is None and sharding is None)
        if batch_hook or use_pallas or (use_pallas is None
                                        and pallas_enabled()):
            # batched hardware-PRNG Bernoulli sampling for the whole
            # particle batch (Gumbel-max identity gives exactly
            # Bernoulli(sigmoid(alpha s))); different stream than the XLA
            # per-particle path, same distribution — see docs/PARITY.md
            g_all = _constrain_mc(sample_hard_graphs(
                edge_scores(zs), keys[0], cfg.alpha(t),
                cfg.n_grad_mc_samples, use_pallas=use_pallas,
                sharding=sharding,
            ))
            if batch_hook:
                # one fused whole-batch scorer call (BGe: the lane-batched
                # Pallas eliminations replace P*M*d HBM-bound GE sweeps)
                p_n, m_n, d_n = g_all.shape[0], g_all.shape[1], g_all.shape[2]
                logprobs = batched_node_log_joint_prob(
                    g_all.reshape(p_n * m_n, d_n, d_n), None, x_, interv_,
                    None,
                ).reshape(p_n, m_n, d_n).sum(-1)
                return vmap(
                    _grad_z_score_from_logprobs, (0, 0, 0, 0, None), (0, 0)
                )(zs, baselines, g_all, logprobs, t)
            return vmap(
                _grad_z_score_given_g,
                (0, 0, 0, 0, None, 0, None, None), (0, 0),
            )(zs, thetas, baselines, g_all, t, keys, x_, interv_)
        return vmap(
            grad_z_score, (0, 0, 0, None, 0, None, None), (0, 0)
        )(zs, thetas, baselines, t, keys, x_, interv_)

    grad_z_fns = {
        "score": eltwise_grad_z_score,
        "score_rb": eltwise_grad_z_score_rb,
        "reparam": eltwise_grad_z_reparam,
    }
    if cfg.grad_estimator_z not in grad_z_fns:
        raise ValueError(f"Unknown gradient estimator `{cfg.grad_estimator_z}`")
    if cfg.grad_estimator_z == "score_rb" and cfg.score_function_baseline > 0.0:
        raise ValueError(
            "score_function_baseline > 0 has no effect with "
            "grad_estimator_z='score_rb': the per-node Rao-Blackwellized "
            "estimator applies no EMA control variate (its per-column "
            "softmax already removes the cross-node score noise the "
            "baseline targets). Set score_function_baseline=0."
        )
    eltwise_grad_z_likelihood = grad_z_fns[cfg.grad_estimator_z]

    # --- Θ-likelihood score (dibs.py:467-551) ---
    #
    # Same whole-batch one-vjp formulation as the reparam Z-estimator: the
    # self-normalized pytree ratio is a softmax-weighted sum of per-sample
    # Θ-gradients, so one vjp with the [P, M] softmax weights as cotangents
    # yields every particle's pytree estimate.

    def eltwise_grad_theta_likelihood(zs, thetas, t, keys,
                                      x=None, interv_mask=None):
        """Pytree of Θ-gradients with leading particle dim."""
        alpha = cfg.alpha(t)
        x_, interv_ = _data(x, interv_mask)
        g_samples = _constrain_mc(sample_hard_graphs(
            edge_scores(zs), keys[0], alpha, cfg.n_grad_mc_samples,
            use_pallas=use_pallas, sharding=sharding,
        ))  # [P, M, d, d] — hardware-PRNG Gumbel-max on TPU

        def batched_logprobs(thetas_):
            return vmap(
                lambda g_p, th_p: vmap(
                    lambda g: log_joint_prob(g, th_p, x_, interv_, keys[0])
                )(g_p),
                (0, 0),
            )(g_samples, thetas_)  # [P, M]

        logprobs, vjp_fn = jax.vjp(batched_logprobs, thetas)
        weights = jnp.exp(logprobs - logsumexp(logprobs, axis=1, keepdims=True))
        (grads,) = vjp_fn(weights)
        return grads

    # --- Z-prior score (dibs.py:557-658) ---

    def log_graph_prior_particle(single_z, t):
        """Graph prior evaluated on the particle's edge-probability matrix."""
        soft_g = edge_probs(single_z, cfg.alpha(t))
        return log_graph_prior(soft_g=soft_g)

    def eltwise_grad_latent_prior(zs, keys, t, latent_prior_std):
        """Batched score of ``log p(Z)``:

        ``-beta(t) E[∇h] - Z / sigma_z^2 + ∇ log f(Z)``

        The acyclicity term depends on ``cfg.acyclicity_constraint``:
        ``'sampled'`` (the default / reference-parity path, dibs.py:576-601)
        estimates ``E_{p(G|Z)}[h(G)]`` with Gumbel-softmax samples from the
        storage-free sampler and one whole-batch vjp with uniform ``1/K``
        cotangents (= the MC mean of per-sample gradients); ``'mean'`` takes
        the deterministic gradient ``∇h(E[G])`` of the edge-probability
        matrix — one h per particle, zero MC samples. Either way ``h``
        carries the closed-form power-chain VJP (ops/acyclic.py).
        """
        alpha = cfg.alpha(t)
        d = zs.shape[1]

        grad_prior_z = vmap(jax.grad(log_graph_prior_particle, 0), (0, None), 0)(
            zs, t
        )

        if cfg.acyclicity == "spectral":
            from dibs_tpu.ops.acyclic import acyclic_constr_spectral

            def h_one(g):
                return acyclic_constr_spectral(g)
        elif cfg.acyclicity == "notears":
            # penalty gradient tolerates bf16 multiplies in the power chain
            # (the exact-h DAG checks in metrics stay at HIGHEST)
            def h_one(g):
                return acyclic_constr(g, d, jax.lax.Precision.DEFAULT)
        else:
            raise ValueError(
                f"acyclicity must be 'notears' or 'spectral'; got "
                f"{cfg.acyclicity!r}"
            )

        if cfg.acyclicity_constraint == "mean":
            # deterministic mean-field constraint: one h per particle on the
            # edge-probability matrix — no Gumbel samples, no K-batch chain
            def batched_h(zs_):
                probs = vmap(lambda z_: edge_probs(z_, alpha))(zs_)
                return vmap(h_one)(probs)  # [P]

            h_vals, vjp_fn = jax.vjp(batched_h, zs)
            (grad_constraint,) = vjp_fn(jnp.ones_like(h_vals))
        elif cfg.acyclicity_constraint == "sampled":
            def batched_h(zs_):
                scores = edge_scores(zs_)
                gs = _constrain_mc(sample_soft_graphs(
                    scores, keys[0], alpha, cfg.tau,
                    cfg.n_acyclicity_mc_samples,
                    use_pallas=use_pallas, sharding=sharding,
                ))
                return vmap(vmap(h_one))(gs)  # [P, K]

            h_vals, vjp_fn = jax.vjp(batched_h, zs)
            (grad_constraint,) = vjp_fn(
                jnp.full_like(h_vals, 1.0 / cfg.n_acyclicity_mc_samples)
            )
        else:
            raise ValueError(
                f"acyclicity_constraint must be 'sampled' or 'mean'; got "
                f"{cfg.acyclicity_constraint!r}"
            )

        return (
            -cfg.beta(t) * grad_constraint
            - zs / (latent_prior_std**2.0)
            + grad_prior_z
        )

    # --- generic shared-sample fused Z+Θ estimator (any joint model) ---

    def _batched_logprobs(gs, thetas_, x_, interv_, rng):
        """[P, M, d, d] graphs x per-particle Θ -> [P, M] log-joints."""
        return vmap(
            lambda g_p, th_p: vmap(
                lambda g: log_joint_prob(g, th_p, x_, interv_, rng)
            )(g_p),
            (0, 0),
        )(gs, thetas_)

    def _make_fused_shared():
        from dibs_tpu.utils.func import zero_diagonal

        def fused_shared(zs, thetas, t, key, x=None, interv_mask=None):
            alpha = cfg.alpha(t)
            x_, interv_ = _data(x, interv_mask)

            def sample_soft(zs_):
                gs = sample_soft_graphs(
                    edge_scores(zs_), key, alpha, cfg.tau,
                    cfg.n_grad_mc_samples, use_pallas=use_pallas,
                    sharding=sharding,
                )
                return _constrain_mc(gs)

            # Z-gradient = unchanged reparam estimator; Θ-gradient scores
            # the Gumbel-max hard graphs derived from the SAME noise batch
            # (sigmoid(tau u) > 0.5 <=> u > 0, so the threshold of the
            # soft sample IS the reference's Bernoulli sample) — one
            # sampler pass serves both estimators
            def f_z(zs_):
                gs = sample_soft(zs_)
                return _batched_logprobs(gs, thetas, x_, interv_, key), gs

            # has_aux returns the soft batch from the SAME trace — one
            # sampler pass, no reliance on XLA CSE across the vjp boundary
            logp_soft, vjp_z, soft_aux = jax.vjp(f_z, zs, has_aux=True)
            w_soft = jnp.exp(
                logp_soft - logsumexp(logp_soft, axis=1, keepdims=True)
            )
            (dz,) = vjp_z(w_soft)

            soft_ng = jax.lax.stop_gradient(soft_aux)
            hard = zero_diagonal((soft_ng > 0.5).astype(zs.dtype))

            def f_theta(th_):
                return _batched_logprobs(hard, th_, x_, interv_, key)

            logp_hard, vjp_t = jax.vjp(f_theta, thetas)
            w_hard = jnp.exp(
                logp_hard - logsumexp(logp_hard, axis=1, keepdims=True)
            )
            (dtheta,) = vjp_t(w_hard)
            return dz, dtheta

        return fused_shared

    # --- optional fused Pallas sample-and-score path (LinearGaussian) ---

    def _data_scale_policy(obs_noise, warn=True):
        """Large-data-scale heads-up for the *nonlinear* model: estimate
        the per-sample |log-likelihood| magnitude N·Σ_j E[x_j²]/(2σ²) and
        warn from 1e6 up. The fused kernels themselves are scale-safe
        (centered scoring tracks the exact XLA estimators at any scale —
        DESIGN.md §11g, CENTERED_NL_AB.json), so this is about the
        *model*: MLP conditionals with N(0, σ_p²) weight priors recover
        structure on data this large only if the process really lives at
        that scale. Measured both ways: naturally-generated d=20
        nonlinear data at est ≈ 1.1e6 scores reference-level AUROC 0.91
        (parity cfg3), while the same est reached by artificially
        10x-scaling d=12 data collapses to chance in BOTH the fused and
        exact-XLA arms — no cheap data statistic separates the two, so
        this warns with the mechanism instead of a verdict. The linear
        SEM is scale-covariant and needs no warning."""
        import numpy as _np

        from dibs_tpu.inference.fused_linear import _FAST_LL_MAX

        x_host = _np.asarray(x)
        est = float(
            x_host.shape[0] * _np.square(x_host).mean(0).sum()
            / (2.0 * float(obs_noise))
        )
        if warn and est > 1.0e6:
            import warnings

            warnings.warn(
                f"data scale puts |log-likelihood| ~ {est:.1e} per sample. "
                "If x was rescaled or arrives unstandardized (rather than "
                "naturally living at this scale), the nonlinear model's "
                "N(0, sig_param^2) weight priors make structure recovery "
                "unreliable regardless of estimator (measured collapse on "
                "10x-scaled data — DESIGN.md §11g). Standardizing x is the "
                "standard practice (dibs_tpu.utils.standardize); "
                "dibs_tpu.config.set_pallas_enabled(False) / "
                "DIBS_DISABLE_PALLAS=1 selects the exact XLA estimators "
                "(measured equivalent here).",
                stacklevel=3,
            )
        return est <= _FAST_LL_MAX  # kept for tests/diagnostics

    fused_grad_both = None
    if fused_sample_sharing is not None and cfg.grad_estimator_z == "reparam":
        if fused_sample_sharing != "hard":
            raise ValueError(
                f"fused_sample_sharing must be None or 'hard'; got "
                f"{fused_sample_sharing!r}"
            )
        fused_grad_both = _make_fused_shared()

    # --- fused single-pass Pallas path (DenseNonlinearGaussian) ---
    if (fused_nonlinear_model is not None
            and cfg.grad_estimator_z == "reparam"):
        from dibs_tpu.inference.fused_nonlinear import (
            fused_nonlinear_available,
            fused_nonlinear_estimators,
        )

        if fused_nonlinear_available(fused_nonlinear_model,
                                     n_obs=x.shape[0]):
            model_nl = fused_nonlinear_model
            _data_scale_policy(model_nl.obs_noise)  # advisory only

            def fused_grad_both(zs, thetas, t, key,  # noqa: F811
                                x=None, interv_mask=None):
                x_, interv_ = _data(x, interv_mask)
                if sharding is not None:
                    from dibs_tpu.parallel.shard_ops import (
                        divides_mesh,
                        sharded_fused_nonlinear,
                    )
                if sharding is not None and divides_mesh(sharding,
                                                         zs.shape[0]):
                    dscores, dtheta = sharded_fused_nonlinear(
                        zs=zs, thetas=thetas, x=x_, interv_mask=interv_,
                        key=key, alpha=cfg.alpha(t), tau=cfg.tau,
                        n_samples=cfg.n_grad_mc_samples, model=model_nl,
                        sharding=sharding,
                    )
                else:
                    dscores, dtheta = fused_nonlinear_estimators(
                        zs=zs, thetas=thetas, x=x_, interv_mask=interv_,
                        key=key, alpha=cfg.alpha(t), tau=cfg.tau,
                        n_samples=cfg.n_grad_mc_samples, model=model_nl,
                    )
                # chain d/d scores -> d/dZ:  dU = dS V,  dV = dSᵀ U
                u, v = zs[..., 0], zs[..., 1]
                du = jnp.einsum("pij,pjk->pik", dscores, v)
                dv = jnp.einsum("pij,pik->pjk", dscores, u)
                dz = jnp.stack([du, dv], axis=-1)
                return dz, dtheta
    if fused_linear_model is not None and cfg.grad_estimator_z == "reparam":
        from dibs_tpu.inference.fused_linear import (
            fused_linear_available,
            fused_linear_estimators,
        )

        if not fused_linear_available(x.shape[-1], n_obs=x.shape[0]):
            import jax as _jax

            if _jax.default_backend() == "tpu":  # pragma: no cover - TPU only
                import warnings

                warnings.warn(
                    f"fused linear-Gaussian Pallas path disabled for "
                    f"d={x.shape[-1]}, N={x.shape[0]} (supported: "
                    "2 <= d <= 384 and N within the kernel's VMEM budget "
                    "— see fused_linear_available); falling back to the "
                    "generic estimators — expect lower throughput.",
                    stacklevel=2,
                )
        else:
            def fused_grad_both(zs, thetas, t, key,
                                x=None, interv_mask=None):
                x_, interv_ = _data(x, interv_mask)
                if sharding is not None:
                    from dibs_tpu.parallel.shard_ops import (
                        divides_mesh,
                        sharded_fused_linear,
                    )
                if sharding is not None and divides_mesh(sharding, zs.shape[0]):
                    dscores, dtheta = sharded_fused_linear(
                        zs=zs, thetas=thetas, x=x_, interv_mask=interv_,
                        key=key, alpha=cfg.alpha(t), tau=cfg.tau,
                        n_samples=cfg.n_grad_mc_samples,
                        model=fused_linear_model, sharding=sharding,
                    )
                else:
                    dscores, dtheta = fused_linear_estimators(
                        zs=zs, thetas=thetas, x=x_, interv_mask=interv_,
                        key=key, alpha=cfg.alpha(t), tau=cfg.tau,
                        n_samples=cfg.n_grad_mc_samples,
                        model=fused_linear_model,
                    )
                # chain d/d scores -> d/dZ:  dU = dS V,  dV = dSᵀ U
                u, v = zs[..., 0], zs[..., 1]
                du = jnp.einsum("pij,pjk->pik", dscores, v)
                dv = jnp.einsum("pij,pik->pjk", dscores, u)
                dz = jnp.stack([du, dv], axis=-1)
                return dz, dtheta

    return Estimators(
        eltwise_grad_z_likelihood=eltwise_grad_z_likelihood,
        eltwise_grad_theta_likelihood=eltwise_grad_theta_likelihood,
        eltwise_grad_latent_prior=eltwise_grad_latent_prior,
        fused_grad_both=fused_grad_both,
    )
