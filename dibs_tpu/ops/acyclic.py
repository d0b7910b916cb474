"""NOTEARS-style differentiable acyclicity constraint, TPU-optimized.

Definition (matching /root/reference/dibs/graph_utils.py:8-30):

    h(G) = tr[(I + (1/d) * G)^d] - d

``h(G) == 0`` iff the (binary) adjacency matrix ``G`` has no directed cycle;
for soft ``G`` it penalizes cycle mass. Yu et al. (2019),
http://proceedings.mlr.press/v97/yu19a/yu19a.pdf.

TPU-native design
-----------------
The reference evaluates ``jnp.linalg.matrix_power`` and lets autodiff
differentiate through the (binary-exponentiation) product chain, which stores
every intermediate square and replays a product-rule chain on the backward
pass. Here we exploit the closed form of the gradient instead:

    d/dG tr[(I + a*G)^d] = a * d * ((I + a*G)^(d-1))^T

so the VJP costs a *single* extra matmul beyond the forward pass: we compute
``P = M^(d-1)`` by binary exponentiation (O(log d) [d,d] matmuls on the MXU),
take ``h = tr(M @ P) - d`` without materializing ``M^d`` (trace of a product
is an elementwise dot), and keep ``P`` as the only residual. This removes the
O(log d) saved intermediates and the product-rule backward chain entirely —
the dominant cost in the reference's prior-score path
(n_particles * n_acyclicity_mc_samples gradient evaluations per SVGD step,
/root/reference/dibs/inference/dibs.py:576-601).

All matmuls request float32 accumulation explicitly so they tile onto the MXU
with full precision regardless of input dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["acyclic_constr", "elwise_acyclic_constr", "matrix_power"]


def matrix_power(m: jnp.ndarray, n: int,
                 precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """``m ** n`` by binary exponentiation with explicit matmul precision.

    ``n`` must be a static Python int >= 0 (shapes/loop bounds are static
    under jit by construction).
    """
    if n < 0:
        raise ValueError("matrix_power requires n >= 0")

    def mm(a, b):
        return jnp.matmul(a, b, precision=precision)

    d = m.shape[-1]
    result = jnp.broadcast_to(jnp.eye(d, dtype=m.dtype), m.shape)
    base = m
    while n > 0:
        if n & 1:
            result = mm(result, base)
        n >>= 1
        if n:
            base = mm(base, base)
    return result


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def acyclic_constr(g: jnp.ndarray, n_vars: int,
                   precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Acyclicity penalty ``h(G) = tr[(I + G/d)^d] - d`` for one ``[d, d]`` matrix.

    Differentiable w.r.t. ``g`` with an exact closed-form VJP (see module
    docstring). ``n_vars`` and ``precision`` must be static.

    ``precision`` controls the power-chain matmuls. The default (HIGHEST,
    full fp32) is what the DAG-ness checks in the metrics rely on
    (``h == 0`` exactly for nilpotent binary adjacencies). The *penalty
    gradient* inside the SVGD prior score tolerates bf16 multiplies
    (``Precision.DEFAULT``), which run ~6x faster on the MXU — the
    estimator core uses that.
    """
    h, _ = _acyclic_fwd_impl(g, n_vars, precision)
    return h


def _acyclic_fwd_impl(g, n_vars, precision):
    alpha = 1.0 / n_vars
    m = jnp.eye(n_vars, dtype=g.dtype) + alpha * g
    p = matrix_power(m, n_vars - 1, precision=precision)
    # tr(M @ P) without forming M @ P: sum of elementwise product with P^T.
    h = jnp.sum(m * p.T) - n_vars
    return h, p


def _acyclic_fwd(g, n_vars, precision):
    h, p = _acyclic_fwd_impl(g, n_vars, precision)
    return h, p


def _acyclic_bwd(n_vars, precision, p, h_bar):
    # d h / d G = (1/d) * d * (M^(d-1))^T = (M^(d-1))^T
    del precision
    return (h_bar * p.T,)


acyclic_constr.defvjp(_acyclic_fwd, _acyclic_bwd)


@functools.partial(jax.jit, static_argnums=(1,))
def elwise_acyclic_constr(gs: jnp.ndarray, n_vars: int) -> jnp.ndarray:
    """Batched ``h(G)`` over a leading batch dimension: ``[n, d, d] -> [n]``."""
    return jax.vmap(lambda g: acyclic_constr(g, n_vars), 0, 0)(gs)
