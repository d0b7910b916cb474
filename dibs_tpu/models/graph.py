"""Random-DAG prior distributions.

Matrix-native counterparts of the reference graph models
(/root/reference/dibs/models/graph.py). Unlike the reference, every
``sample_G`` here returns a ``[d, d]`` int32 adjacency matrix directly —
there is no igraph object type anywhere in this framework. The duck-typed
contract consumed by the inference engine is a single method:

    unnormalized_log_prob_soft(soft_g=[d, d] relaxed adjacency) -> scalar

which must be jit-compilable and grad-differentiable (it is evaluated on the
edge-probability matrix inside the latent-prior score,
/root/reference/dibs/inference/dibs.py:604-623).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as onp
from jax import random

from dibs_tpu.native import graph as native_graph
from dibs_tpu.utils.func import zero_diagonal

__all__ = [
    "ErdosReniDAGDistribution",
    "ScaleFreeDAGDistribution",
    "UniformDAGDistributionRejection",
]


class ErdosReniDAGDistribution:
    """Erdős–Rényi random DAG with i.i.d. edge probability.

    pmf: ``p(G) ∝ p^e (1-p)^(C(d,2) - e)`` with ``p`` chosen to give
    ``n_edges_per_node`` edges per node in expectation. Sampling: Bernoulli
    matrix, strictly-lower-triangular mask, random permutation conjugation
    (behavioral spec: graph.py:32-59).
    """

    def __init__(self, n_vars, n_edges_per_node=2):
        self.n_vars = n_vars
        self.n_edges = n_edges_per_node * n_vars
        self.p = self.n_edges / ((self.n_vars * (self.n_vars - 1)) / 2)

    def sample_G(self, key, return_mat=True):
        """Samples one DAG as a ``[d, d]`` int32 adjacency matrix.

        ``return_mat`` is accepted for reference-API compatibility; this
        framework always returns matrices.
        """
        del return_mat
        key, subk = random.split(key)
        mat = random.bernoulli(subk, p=self.p, shape=(self.n_vars, self.n_vars))
        dag = jnp.tril(mat.astype(jnp.int32), k=-1)

        key, subk = random.split(key)
        p_mat = random.permutation(subk, jnp.eye(self.n_vars, dtype=jnp.int32))
        return p_mat.T @ dag @ p_mat

    def unnormalized_log_prob_single(self, *, g, j):
        """Unnormalized ``log p(G_j)`` of node ``j``'s family (``g`` is a matrix)."""
        n_parents = jnp.sum(g[:, j])
        return n_parents * jnp.log(self.p) + (
            self.n_vars - n_parents - 1
        ) * jnp.log(1 - self.p)

    def unnormalized_log_prob(self, *, g):
        """Unnormalized ``log p(G)`` for a hard adjacency matrix."""
        n_pairs = self.n_vars * (self.n_vars - 1) / 2.0
        n_edges = jnp.sum(g)
        return n_edges * jnp.log(self.p) + (n_pairs - n_edges) * jnp.log(1 - self.p)

    def unnormalized_log_prob_soft(self, *, soft_g):
        """Relaxed ``log p(G)`` evaluated on an edge-probability matrix."""
        n_pairs = self.n_vars * (self.n_vars - 1) / 2.0
        e_soft = jnp.sum(soft_g)
        return e_soft * jnp.log(self.p) + (n_pairs - e_soft) * jnp.log(1 - self.p)


class ScaleFreeDAGDistribution:
    """Scale-free random DAG with power-law in-degree prior.

    pmf: ``p(G) ∝ prod_j (1 + deg_in(j))^(-3)``. Sampling runs the native
    Barabási–Albert kernel (C++ ``graphlib`` or numpy fallback) followed by a
    random vertex permutation (behavioral spec: graph.py:132-151; the
    reference calls igraph's C Barabasi generator).
    """

    def __init__(self, n_vars, verbose=False, n_edges_per_node=2):
        self.n_vars = n_vars
        self.n_edges_per_node = n_edges_per_node
        self.verbose = verbose

    def sample_G(self, key, return_mat=True):
        """Samples one DAG as a ``[d, d]`` int32 adjacency matrix (host-side)."""
        del return_mat
        # host-side sampler: derive an integer seed from the JAX key. (The
        # reference similarly drops to impure host RNG here, graph.py:144.)
        try:
            key_data = random.key_data(key)  # new-style typed keys
        except TypeError:
            key_data = key  # raw uint32 key arrays
        seed = int(onp.asarray(key_data).astype(onp.uint64).sum())
        mat = native_graph.barabasi_albert(self.n_vars, self.n_edges_per_node, seed)
        perm = onp.asarray(random.permutation(key, self.n_vars))
        return jnp.array(native_graph.permute_vertices(mat, perm))

    def unnormalized_log_prob_single(self, *, g, j):
        n_parents = jnp.sum(g[:, j])
        return -3.0 * jnp.log(1 + n_parents)

    def unnormalized_log_prob(self, *, g):
        return jnp.sum(-3.0 * jnp.log(1 + jnp.sum(g, axis=0)))

    def unnormalized_log_prob_soft(self, *, soft_g):
        """Relaxed in-degree power-law prior on an edge-probability matrix."""
        soft_indegree = soft_g.sum(0)
        return jnp.sum(-3.0 * jnp.log(1 + soft_indegree))


class UniformDAGDistributionRejection:
    """Uniform distribution over DAGs via rejection sampling (feasible d <= 5)."""

    def __init__(self, n_vars):
        self.n_vars = n_vars

    def sample_G(self, key, return_mat=True):
        del return_mat
        while True:
            key, subk = random.split(key)
            mat = random.bernoulli(
                subk, p=0.5, shape=(self.n_vars, self.n_vars)
            ).astype(jnp.int32)
            mat = zero_diagonal(mat)
            if native_graph.is_dag(onp.asarray(mat)):
                return mat

    def unnormalized_log_prob_single(self, *, g, j):
        return jnp.array(0.0)

    def unnormalized_log_prob(self, *, g):
        return jnp.array(0.0)

    def unnormalized_log_prob_soft(self, *, soft_g):
        return jnp.array(0.0)
