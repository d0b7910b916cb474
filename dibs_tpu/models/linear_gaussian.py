"""Linear-Gaussian likelihood models: closed-form BGe score and linear SEM.

Behavioral spec: /root/reference/dibs/models/linearGaussian.py (BGe at :8-171,
LinearGaussian at :173-339). TPU-native differences:

  * BGe computes all ``d`` node scores in one batched pass whose hot ops are
    a single ``[d, N] @ [N, d]`` covariance matmul (shared across nodes) and a
    batched masked ``slogdet`` — both requested at HIGHEST precision so the
    numerics stay stable for *soft* (relaxed) adjacency inputs in fp32.
  * ``sample_obs`` uses the jittable d-step SEM fixed-point iteration
    (:mod:`dibs_tpu.ops.ancestral`) instead of an igraph toposort loop, and
    takes the graph as an adjacency *matrix*.

Duck-typed inference contract (consumed by the SVGD engine):
  * BGe:            ``interventional_log_marginal_prob(g, _, x, interv, rng)``
  * LinearGaussian: ``interventional_log_joint_prob(g, theta, x, interv, rng)``
Both must be pure, jit-compilable, and (for reparam gradients) well-defined
for soft adjacency entries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random, vmap
from jax.scipy.special import gammaln
from jax.scipy.stats import norm as jax_normal

from dibs_tpu.ops.ancestral import interv_to_vectors, sample_sem_obs
from dibs_tpu.ops.logdet import masked_logdet_pd_pair

__all__ = ["BGe", "LinearGaussian"]

_HI = jax.lax.Precision.HIGHEST

# HBM budget (floats) for one chunk of masked [d, d] matrices in the
# large-d XLA determinant fallback (see batched_node_log_marginal_
# likelihoods): ~0.5 GB of intermediates per lax.map slice.
_BGE_CHUNK_ELEMS = 2 ** 27


class BGe:
    """Bayesian Gaussian equivalent (BGe) marginal likelihood ``log p(D | G)``.

    Normal-Wishart conjugate prior over (mean, precision) of a linear Gaussian
    SEM; scores all DAGs in a Markov equivalence class equally. Formulas follow
    Geiger & Heckerman (2002) with the Kuipers et al. (2014) correction for the
    posterior parameter matrix ``R`` (the paper's main text uses
    ``alpha_lambd`` where the supplement correctly uses ``alpha_mu``;
    the reference notes the same at linearGaussian.py:91-92).

    Per-node score for node ``j`` with parent set ``Pa``:

        log Γ-ratio + (d-dependent constants)
        + 0.5 (N + alpha_lambd - d + |Pa|)     * logdet(R[Pa, Pa])
        - 0.5 (N + alpha_lambd - d + |Pa| + 1) * logdet(R[Pa∪j, Pa∪j])

    Interventional handling: rows of ``x`` where node ``j`` was intervened are
    removed from node ``j``'s sufficient statistics; a node with zero
    remaining rows contributes 0.

    The submatrix log-determinants are evaluated through
    :func:`dibs_tpu.utils.func.masked_slogdet`, which remains well-defined and
    differentiable for soft parent masks — this is what makes BGe usable with
    the Gumbel-softmax reparameterization gradient.

    Hyperparameter defaults: ``mean_obs = 0``, ``alpha_mu = 1.0``,
    ``alpha_lambd = d + 2`` (must exceed ``d + 1``).
    """

    def __init__(self, *, n_vars, mean_obs=None, alpha_mu=None, alpha_lambd=None):
        self.n_vars = n_vars
        self.mean_obs = mean_obs if mean_obs is not None else jnp.zeros(n_vars)
        self.alpha_mu = alpha_mu if alpha_mu is not None else 1.0
        self.alpha_lambd = alpha_lambd if alpha_lambd is not None else n_vars + 2
        if not self.alpha_lambd > n_vars + 1:
            raise ValueError(
                f"alpha_lambd must exceed n_vars + 1 = {n_vars + 1}, "
                f"got {self.alpha_lambd}"
            )
        self.no_interv_targets = jnp.zeros(n_vars, dtype=bool)

    # --- not available for the marginal model (parity with reference :50-57) ---

    def get_theta_shape(self, *, n_vars):
        raise NotImplementedError(
            "Not available for the BGe score; use the `LinearGaussian` model."
        )

    def sample_parameters(self, *, key, n_vars, n_particles=0, batch_size=0):
        raise NotImplementedError(
            "Not available for the BGe score; use the `LinearGaussian` model."
        )

    def sample_obs(self, *, key, n_samples, g, theta, toporder=None, interv=None):
        raise NotImplementedError(
            "Not available for the BGe score; use the `LinearGaussian` model."
        )

    # --- pure/jittable scoring path ---

    def _node_score(self, j, n_parents, g, r_mats, n_obs):
        """BGe score contribution of node ``j``.

        Args:
            j: node index
            n_parents: (possibly soft) parent count of ``j`` — column sum of g
            g: ``[d, d]`` (possibly soft) adjacency
            r_mats: ``[d, d, d]`` per-node posterior parameter matrices ``R_j``
                (precomputed; differ across nodes only through the
                interventional row masking)
            n_obs: ``[d]`` effective number of observations per node
        """
        d = self.n_vars
        small_t = (self.alpha_mu * (self.alpha_lambd - d - 1)) / (self.alpha_mu + 1)
        n = n_obs[j]
        r = r_mats[j]

        parents = g[:, j]
        e_j = jnp.eye(d)[:, j]

        log_gamma_term = (
            0.5 * (jnp.log(self.alpha_mu) - jnp.log(n + self.alpha_mu))
            + gammaln(0.5 * (n + self.alpha_lambd - d + n_parents + 1))
            - gammaln(0.5 * (self.alpha_lambd - d + n_parents + 1))
            - 0.5 * n * jnp.log(jnp.pi)
            # ratio det(T_JJ)^(..) / det(T_II)^(..) for the default diagonal T
            + 0.5 * (self.alpha_lambd - d + 2 * n_parents + 1) * jnp.log(small_t)
        )

        # R is PD (T + S_N + PSD rank-1 term), so the masked determinants go
        # through the unpivoted Gaussian-elimination path (ops/logdet.py):
        # ~11x faster than batched Cholesky on TPU, and both determinants of
        # the BGe ratio come out of ONE elimination (j permuted last)
        logdet_pa, logdet_paj = masked_logdet_pd_pair(r, parents, e_j)
        log_term_r = (
            0.5 * (n + self.alpha_lambd - d + n_parents) * logdet_pa
            - 0.5 * (n + self.alpha_lambd - d + n_parents + 1) * logdet_paj
        )

        # neutral element when node j has no un-intervened observations
        return jnp.where(jnp.isclose(n, 0), 0.0, log_gamma_term + log_term_r)

    def _posterior_r_mats(self, x, interv_targets):
        """Per-node posterior parameter matrices ``R_j`` and row counts.

        ``R_j = T + S_N + (N alpha_mu / (N + alpha_mu)) (x̄ - μ)(x̄ - μ)^T``
        computed over the rows where node ``j`` was *not* intervened.

        Returns ``(r_mats [d, d, d], n_obs [d])``. The dominant cost is one
        batched ``[d, N, d] x [d, N, d] -> [d, d, d]`` covariance contraction
        on the MXU.
        """
        d = self.n_vars
        small_t = (self.alpha_mu * (self.alpha_lambd - d - 1)) / (self.alpha_mu + 1)
        t_mat = small_t * jnp.eye(d)

        keep = 1.0 - interv_targets.astype(x.dtype)  # [N, d]; column j = rows kept for node j
        n_obs = keep.sum(axis=0)  # [d]

        # masked per-node row means: [d(node), d(var)]
        sums = jnp.einsum("nj,nd->jd", keep, x, precision=_HI)
        safe_n = jnp.where(jnp.isclose(n_obs, 0), 1.0, n_obs)
        x_bar = jnp.where(jnp.isclose(n_obs, 0)[:, None], 0.0, sums / safe_n[:, None])

        # centered, re-masked residuals per node: [d(node), N, d(var)]
        x_center = (x[None, :, :] - x_bar[:, None, :]) * keep.T[:, :, None]
        s_n = jnp.einsum("jnd,jne->jde", x_center, x_center, precision=_HI)

        mean_diff = x_bar - self.mean_obs[None, :]  # [d, d]
        scale = (n_obs * self.alpha_mu) / (n_obs + self.alpha_mu)  # [d]
        outer = jnp.einsum("jd,je->jde", mean_diff, mean_diff, precision=_HI)

        r_mats = t_mat[None] + s_n + scale[:, None, None] * outer
        return r_mats, n_obs

    def node_log_marginal_likelihoods(self, *, g, x, interv_targets):
        """Per-node BGe scores ``[d]`` (their sum is the marginal likelihood).

        The BGe score decomposes over node families — node ``j``'s term
        depends only on its parent column ``g[:, j]`` — which is what makes
        the Rao-Blackwellized per-node score estimator possible
        (:mod:`dibs_tpu.inference.estimators`, ``grad_estimator_z="score_rb"``).
        """
        d = self.n_vars
        r_mats, n_obs = self._posterior_r_mats(x, interv_targets)
        n_parents_all = g.sum(axis=0)
        return vmap(self._node_score, (0, 0, None, None, None), 0)(
            jnp.arange(d), n_parents_all, g, r_mats, n_obs
        )

    def log_marginal_likelihood(self, *, g, x, interv_targets):
        """Closed-form BGe marginal likelihood ``log p(D | G)`` (jit-able)."""
        return self.node_log_marginal_likelihoods(
            g=g, x=x, interv_targets=interv_targets
        ).sum(0)

    def batched_node_log_marginal_likelihoods(self, *, gs, x, interv_targets):
        """Per-node BGe scores for a whole ``[B, d, d]`` hard-graph batch:
        returns ``[B, d]`` (row sums are the marginal likelihoods).

        Same math as :meth:`node_log_marginal_likelihoods`, but the
        determinant pairs of the entire batch run through the fused
        lane-batched Pallas elimination (:mod:`dibs_tpu.ops.bge_kernel`) on
        TPU — each matrix stays VMEM-resident across all ``d`` elimination
        steps instead of being rewritten in HBM ``d`` times. Forward-only
        (graph samples are REINFORCE constants); differentiable callers
        must use the per-graph path.
        """
        from dibs_tpu.ops.bge_kernel import bge_logdet_pairs, bge_pallas_available

        d = self.n_vars
        r_mats, n_obs = self._posterior_r_mats(x, interv_targets)
        n_parents = gs.sum(axis=-2)  # [B, d] (possibly soft) column sums

        if bge_pallas_available(d):
            logdet_pa, logdet_paj = bge_logdet_pairs(r_mats, gs)
        else:
            eye = jnp.eye(d)

            def pairs_of(g_batch):
                return vmap(
                    lambda g: vmap(
                        lambda j: masked_logdet_pd_pair(
                            r_mats[j], g[:, j], eye[:, j])
                    )(jnp.arange(d))
                )(g_batch)

            # large d: the masked-matrix batch is [B*d, d, d] floats
            # (~107 GB at d=128, P=100, M=128) — chunk the graph batch so
            # each slice stays ~0.5 GB of intermediates (the Pallas kernel
            # never has this problem: its matrices live only in VMEM)
            b = gs.shape[0]
            per_chunk = max(1, _BGE_CHUNK_ELEMS // (d * d * d))
            if d > 64 and b > per_chunk:
                from jax import lax

                n_chunks = -(-b // per_chunk)
                b_pad = n_chunks * per_chunk
                gs_pad = jnp.zeros((b_pad, d, d), gs.dtype).at[:b].set(gs)
                ld_pa, ld_paj = lax.map(
                    pairs_of, gs_pad.reshape(n_chunks, per_chunk, d, d))
                logdet_pa = ld_pa.reshape(b_pad, d)[:b]
                logdet_paj = ld_paj.reshape(b_pad, d)[:b]
            else:
                logdet_pa, logdet_paj = pairs_of(gs)

        small_t = (self.alpha_mu * (self.alpha_lambd - d - 1)) / (self.alpha_mu + 1)
        n = n_obs[None, :]  # [1, d]
        log_gamma_term = (
            0.5 * (jnp.log(self.alpha_mu) - jnp.log(n + self.alpha_mu))
            + gammaln(0.5 * (n + self.alpha_lambd - d + n_parents + 1))
            - gammaln(0.5 * (self.alpha_lambd - d + n_parents + 1))
            - 0.5 * n * jnp.log(jnp.pi)
            + 0.5 * (self.alpha_lambd - d + 2 * n_parents + 1) * jnp.log(small_t)
        )
        log_term_r = (
            0.5 * (n + self.alpha_lambd - d + n_parents) * logdet_pa
            - 0.5 * (n + self.alpha_lambd - d + n_parents + 1) * logdet_paj
        )
        return jnp.where(jnp.isclose(n, 0), 0.0, log_gamma_term + log_term_r)

    def batched_interventional_node_log_marginal_probs(self, gs, _, x,
                                                       interv_targets, rng):
        """Batched inference-contract wrapper over
        :meth:`batched_node_log_marginal_likelihoods` — the hook consumed by
        the REINFORCE (``score`` / ``score_rb``) estimators for whole
        sample batches."""
        return self.batched_node_log_marginal_likelihoods(
            gs=gs, x=x, interv_targets=interv_targets
        )

    def interventional_log_marginal_prob(self, g, _, x, interv_targets, rng):
        """Inference-contract wrapper; dummy ``theta``/``rng`` unify the
        marginal and joint signatures (reference :150-170)."""
        return self.log_marginal_likelihood(g=g, x=x, interv_targets=interv_targets)

    def interventional_node_log_marginal_probs(self, g, _, x, interv_targets,
                                               rng):
        """Per-node analog of :meth:`interventional_log_marginal_prob` —
        the hook consumed by the ``score_rb`` gradient estimator."""
        return self.node_log_marginal_likelihoods(
            g=g, x=x, interv_targets=interv_targets
        )


class LinearGaussian:
    """Linear SEM with additive Gaussian noise; generative + joint-likelihood model.

    ``x_j = x @ (g * theta)[:, j] + eps_j`` with ``eps ~ N(0, obs_noise)`` and
    Gaussian edge-weight prior ``theta_ij ~ N(mean_edge, sig_edge^2)`` on
    present edges. Equal noise across nodes makes the structure identifiable.
    """

    def __init__(self, *, n_vars, obs_noise=0.1, mean_edge=0.0, sig_edge=1.0,
                 min_edge=0.5):
        self.n_vars = n_vars
        self.obs_noise = obs_noise
        self.mean_edge = mean_edge
        self.sig_edge = sig_edge
        self.min_edge = min_edge
        self.no_interv_targets = jnp.zeros(n_vars, dtype=bool)

    def get_theta_shape(self, *, n_vars):
        """Parameter tree shape: a single ``[d, d]`` edge-weight matrix."""
        return jnp.array((n_vars, n_vars))

    def sample_parameters(self, *, key, n_vars, n_particles=0, batch_size=0):
        """Samples ``theta`` from the edge prior, shifted away from zero by
        ``min_edge`` (reference :212-227). Leading dims equal to 0 are dropped.
        """
        shape = tuple(s for s in (batch_size, n_particles, n_vars, n_vars) if s != 0)
        theta = self.mean_edge + self.sig_edge * random.normal(key, shape=shape)
        return theta + jnp.sign(theta) * self.min_edge

    def sample_obs(self, *, key, n_samples, g, theta, toporder=None, interv=None):
        """Ancestral sampling of ``[n_samples, d]`` observations.

        ``g`` is a ``[d, d]`` adjacency *matrix* (not an igraph object);
        ``toporder`` is accepted for API compatibility and ignored — the
        jittable fixed-point iteration needs no topological order.
        """
        del toporder
        g = jnp.asarray(g)
        w = g * theta
        mask, values = interv_to_vectors(interv, self.n_vars)
        return sample_sem_obs(
            key=key,
            n_samples=n_samples,
            n_vars=self.n_vars,
            mean_fn=lambda x: jnp.matmul(x, w, precision=_HI),
            obs_noise=self.obs_noise,
            interv_mask=mask,
            interv_values=values,
        )

    # --- pure/jittable scoring path ---

    def log_prob_parameters(self, *, theta, g):
        """Edge-masked Gaussian parameter prior ``log p(Θ | G)``."""
        return jnp.sum(
            g * jax_normal.logpdf(x=theta, loc=self.mean_edge, scale=self.sig_edge)
        )

    def log_likelihood(self, *, x, theta, g, interv_targets):
        """Gaussian SEM likelihood ``log p(D | G, Θ)`` with intervened entries
        masked out of the score. One ``[N, d] @ [d, d]`` matmul computes all
        node means at once."""
        from dibs_tpu.config import likelihood_matmul_precision

        # trace-time shape check (reference linearGaussian.py:305)
        assert x.shape == interv_targets.shape, (
            f"x {x.shape} and interv_targets {interv_targets.shape} must match"
        )
        means = jnp.matmul(x, g * theta, precision=likelihood_matmul_precision())
        logpdf = jax_normal.logpdf(x=x, loc=means, scale=jnp.sqrt(self.obs_noise))
        return jnp.sum(jnp.where(interv_targets, 0.0, logpdf))

    def interventional_log_joint_prob(self, g, theta, x, interv_targets, rng):
        """Joint ``log p(Θ, D | G) = log p(Θ | G) + log p(D | G, Θ)``."""
        return self.log_prob_parameters(g=g, theta=theta) + self.log_likelihood(
            g=g, theta=theta, x=x, interv_targets=interv_targets
        )
