"""Latent-embedding edge operations: ``Z -> (scores, probs, graphs)``.

The DiBS latent representation is ``Z in R^{d x k x 2}`` with embedding banks
``U = Z[..., 0]`` and ``V = Z[..., 1]``; the logit ("score") of edge ``i -> j``
is the inner product ``u_i · v_j`` (behavioral spec:
/root/reference/dibs/inference/dibs.py:84-204).

Every op here:
  * is batched over arbitrary leading dims of ``Z``;
  * masks the diagonal (self-loops are never modeled);
  * lowers the score computation to a single ``[d, k] @ [k, d]`` matmul per
    batch element (MXU-friendly; alpha-scaling and sigmoid fuse into the
    matmul epilogue under XLA).

Temperature conventions:
  * ``alpha`` — inverse-temperature of the edge-prob sigmoid (anneal: alpha(t))
  * ``tau``   — constant Gumbel-softmax temperature
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.nn import log_sigmoid, sigmoid

from dibs_tpu.utils.func import zero_diagonal

__all__ = [
    "edge_scores",
    "edge_probs",
    "edge_log_probs",
    "particle_to_g_lim",
    "particle_to_soft_graph",
    "particle_to_hard_graph",
    "sample_g",
    "latent_log_prob",
]


def edge_scores(z: jnp.ndarray) -> jnp.ndarray:
    """Raw edge scores ``s_ij = u_i · v_j`` of shape ``[..., d, d]``.

    ``z``: ``[..., d, k, 2]``. Runs as a batched matmul on the MXU.
    """
    u, v = z[..., 0], z[..., 1]
    return jnp.einsum(
        "...ik,...jk->...ij", u, v, precision=jax.lax.Precision.HIGHEST
    )


def edge_probs(z: jnp.ndarray, alpha) -> jnp.ndarray:
    """Edge probabilities ``sigmoid(alpha * s_ij)``, diagonal-masked."""
    probs = sigmoid(alpha * edge_scores(z))
    return zero_diagonal(probs)


def edge_log_probs(z: jnp.ndarray, alpha):
    """``(log p_ij, log (1 - p_ij))`` as a numerically-stable log-sigmoid pair.

    Note: the diagonal of both outputs is zeroed, not ``log``-transformed —
    consumers always multiply against diagonal-free adjacency samples, so the
    diagonal never contributes (same convention as the reference,
    dibs.py:187-204).
    """
    s = alpha * edge_scores(z)
    return zero_diagonal(log_sigmoid(s)), zero_diagonal(log_sigmoid(-s))


def particle_to_g_lim(z: jnp.ndarray) -> jnp.ndarray:
    """Hard graph in the ``alpha -> inf`` limit: ``1[u_i · v_j > 0]``."""
    g = (edge_scores(z) > 0).astype(jnp.int32)
    return zero_diagonal(g)


def particle_to_soft_graph(z: jnp.ndarray, eps: jnp.ndarray, alpha, tau) -> jnp.ndarray:
    """Gumbel-softmax (concrete) relaxed adjacency sample.

    ``eps ~ Logistic(0, 1)`` of shape broadcastable to ``[..., d, d]``;
    returns ``sigmoid(tau * (eps + alpha * s))`` with zeroed diagonal.
    """
    soft = sigmoid(tau * (eps + alpha * edge_scores(z)))
    return zero_diagonal(soft)


def particle_to_hard_graph(z: jnp.ndarray, eps: jnp.ndarray, alpha) -> jnp.ndarray:
    """Gumbel-max (hard) adjacency sample: ``1[eps + alpha * s > 0]``."""
    hard = ((eps + alpha * edge_scores(z)) > 0.0).astype(jnp.float32)
    return zero_diagonal(hard)


def sample_g(p: jnp.ndarray, key, n_samples: int) -> jnp.ndarray:
    """``n_samples`` Bernoulli adjacency samples from edge-prob matrix ``p``.

    ``p``: ``[d, d]`` -> returns ``[n_samples, d, d]`` int32, diagonal-masked.
    """
    d = p.shape[-1]
    g = random.bernoulli(key, p=p, shape=(n_samples, d, d)).astype(jnp.int32)
    return zero_diagonal(g)


def latent_log_prob(single_g: jnp.ndarray, single_z: jnp.ndarray, alpha) -> jnp.ndarray:
    """Bernoulli log-likelihood ``log p(G | Z)`` of one graph sample.

    Used (via ``jax.grad``) by the REINFORCE estimator.
    """
    log_p, log_1_p = edge_log_probs(single_z, alpha)
    return jnp.sum(single_g * log_p + (1 - single_g) * log_1_p)


def grad_latent_log_prob_batch(gs: jnp.ndarray, single_z: jnp.ndarray,
                               alpha) -> jnp.ndarray:
    """Closed-form ``∇_Z log p(G | Z)`` for a batch of graph samples.

    With ``s_ij = u_i · v_j`` and ``p_ij = σ(α s_ij)``,

        ∂ log p(G|Z) / ∂s_ij = α (g_ij − p_ij)         (off-diagonal)
        ∂ / ∂u_i = Σ_j α (g_ij − p_ij) v_j
        ∂ / ∂v_j = Σ_i α (g_ij − p_ij) u_i

    so the whole ``[M, d, k, 2]`` gradient batch is two batched matmuls on
    the MXU — replacing the reference's ``vmap(grad(latent_log_prob))``
    (M reverse-mode passes, dibs.py:232-247). Equality with autodiff is
    property-tested.

    Args:
        gs: ``[M, d, d]`` batch of (hard) adjacency samples
        single_z: ``[d, k, 2]``
        alpha: edge-prob inverse temperature

    Returns:
        ``[M, d, k, 2]`` gradient batch
    """
    u, v = single_z[..., 0], single_z[..., 1]
    p = edge_probs(single_z, alpha)
    resid = zero_diagonal(alpha * (gs - p))  # [M, d, d]
    grad_u = jnp.einsum(
        "mij,jk->mik", resid, v, precision=jax.lax.Precision.HIGHEST
    )
    grad_v = jnp.einsum(
        "mij,ik->mjk", resid, u, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.stack([grad_u, grad_v], axis=-1)
