"""JAX-native ancestral sampling for structural equation models.

The reference samples observations by walking an igraph topological order in a
Python loop with per-node ``x.at[:, j].set`` updates
(/root/reference/dibs/models/linearGaussian.py:230-272,
 /root/reference/dibs/models/nonlinearGaussian.py:189-242). That requires a
host-side toposort (igraph C code) and is unjittable.

Here we use the DAG fixed-point identity instead: for a structural equation
``x_j = f_j(x_parents(j)) + z_j`` on a DAG of depth <= d, iterating

    x  <-  where(intervened, clamp_value, f(x ⊙ parent-mask) + z)

``d`` times from ``x = 0`` converges exactly (after ``k`` iterations all nodes
of topological depth < ``k`` hold their final values; intervened nodes are
constant from iteration one). This runs as a ``lax.scan`` of ``d`` fused
matmul/MLP steps on device — no toposort, no host round-trips, jittable and
vmappable over batches of (g, theta).

The convergence argument needs f_j to depend only on *masked* inputs, which
holds for both model families (linear: ``x @ (g * theta)``; nonlinear: MLP on
``x * g[:, j]``).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["interv_to_vectors", "sample_sem_obs"]


def interv_to_vectors(
    interv: Optional[Dict[int, float]], n_vars: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Converts an ``{node: clamp_value}`` intervention dict to dense vectors.

    Returns ``(mask [d] float, values [d] float)`` with ``values`` zero at
    non-intervened entries.
    """
    mask = jnp.zeros((n_vars,))
    values = jnp.zeros((n_vars,))
    if interv:
        idx = jnp.array(sorted(interv.keys()), dtype=jnp.int32)
        vals = jnp.array([float(interv[int(i)]) for i in sorted(interv.keys())])
        mask = mask.at[idx].set(1.0)
        values = values.at[idx].set(vals)
    return mask, values


def sample_sem_obs(
    *,
    key,
    n_samples: int,
    n_vars: int,
    mean_fn: Callable[[jnp.ndarray], jnp.ndarray],
    obs_noise: float,
    interv_mask: jnp.ndarray,
    interv_values: jnp.ndarray,
) -> jnp.ndarray:
    """Samples ``[n_samples, d]`` observations from an additive-noise SEM.

    Args:
        key: PRNG key (consumed once, for the Gaussian noise matrix)
        n_samples: number of i.i.d. rows
        n_vars: number of variables ``d``
        mean_fn: maps the full current ``x [N, d]`` to the matrix of node
            means ``[N, d]``; must internally mask non-parent inputs per node
            (e.g. ``x @ (g * theta)`` or per-node masked MLP forward)
        obs_noise: additive Gaussian noise *variance*
        interv_mask: ``[d]`` indicator of clamped nodes
        interv_values: ``[d]`` clamp values (ignored where mask == 0)

    Returns:
        observation matrix ``[n_samples, d]``
    """
    z = jnp.sqrt(obs_noise) * jax.random.normal(key, shape=(n_samples, n_vars))

    def step(x, _):
        x_new = jnp.where(interv_mask, interv_values, mean_fn(x) + z)
        return x_new, None

    x0 = jnp.zeros((n_samples, n_vars))
    x_final, _ = lax.scan(step, x0, None, length=n_vars)
    return x_final
