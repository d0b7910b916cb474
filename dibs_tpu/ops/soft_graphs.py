"""Batched Gumbel-softmax graph sampling with a storage-free backward pass.

``sample_soft_graphs`` draws ``n_samples`` relaxed adjacency samples
``G = sigmoid(tau * (eps + alpha * scores))`` (``eps ~ Logistic(0, 1)``) for a
whole particle batch in one call, wrapped in a custom VJP that needs only the
*output* as residual:

    dG/d scores = tau * alpha * G (1 - G)

so neither path stores the noise tensor for the backward pass — and the TPU
path (:func:`dibs_tpu.ops.pallas_kernels.gumbel_soft_graphs_pallas`) never
materializes the noise at all: it is generated in VMEM from the hardware PRNG
inside the kernel. At the d=128 / 1000-particle scaling config this removes a
~2 GB HBM round-trip plus the host-threefry bit generation from every SVGD
step.

The XLA fallback draws ``eps = jax.random.logistic(key, [B, M, d, d])`` — the
deterministic spec tests rely on (tests/test_estimators.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import random

from dibs_tpu.ops.pallas_kernels import gumbel_soft_graphs_pallas, pallas_enabled
from dibs_tpu.utils.func import zero_diagonal

__all__ = ["sample_soft_graphs", "sample_hard_graphs"]

# VMEM guard for the padded sampler blocks [1, block_m, dp, dp]
_MAX_SAMPLER_D = 384


def _check_sampler_d(use_pallas: Optional[bool], d: int) -> None:
    """The VMEM cap applies to *forced* Pallas runs too — a silent OOM deep
    inside Mosaic is a worse failure than this error."""
    if use_pallas and d > _MAX_SAMPLER_D:
        raise ValueError(
            f"use_pallas=True but d={d} exceeds the Pallas sampler's VMEM "
            f"cap ({_MAX_SAMPLER_D}); use the XLA path (use_pallas=False or "
            "None) for graphs this large."
        )


def _sampler_pad(d: int) -> int:
    """d padded to a sublane multiple (the kernel block is [bm, dp, dp];
    padded rows/cols are sliced away by the caller)."""
    return ((max(d, 2) + 7) // 8) * 8


def _pallas_graphs_padded(scores, seed, alpha, tau, n_samples, hard):
    """Pallas Gumbel sampling at any d: zero-pad scores to a sublane
    multiple, sample, slice. Padded entries draw their own noise (the
    PRNG stream depends on the padded shape — documented; any stream is a
    valid sampler) and are discarded by the slice."""
    b, d, _ = scores.shape
    dp = _sampler_pad(d)
    if dp != d:
        scores = jnp.zeros((b, dp, dp), scores.dtype).at[:, :d, :d].set(scores)
    out = gumbel_soft_graphs_pallas(scores, seed, alpha, tau, n_samples,
                                    hard=hard)
    if dp != d:
        out = out[:, :, :d, :d]
    return out


def _key_to_seed(key) -> jnp.ndarray:
    try:
        kd = random.key_data(key)
    except TypeError:
        kd = key
    kd = kd.reshape(-1).astype(jnp.uint32)
    return (kd[0] ^ (kd[-1] << 1)).astype(jnp.int32)


def sample_soft_graphs(scores: jnp.ndarray, key, alpha, tau,
                       n_samples: int, use_pallas: Optional[bool] = None,
                       sharding=None):
    """``[B, d, d]`` scores -> ``[B, n_samples, d, d]`` relaxed graph samples.

    Differentiable w.r.t. ``scores`` and ``alpha`` (closed-form VJP); the PRNG
    ``key`` and static ``tau`` / ``n_samples`` are not differentiated.

    With ``sharding`` (a particle-axis :class:`~jax.sharding.NamedSharding`)
    the Pallas path runs per mesh shard via ``shard_map`` with global-index
    seeding — bitwise identical to the unsharded call (see
    :mod:`dibs_tpu.parallel.shard_ops`).
    """
    b, d, _ = scores.shape
    _check_sampler_d(use_pallas, d)
    if use_pallas is None:
        use_pallas = pallas_enabled() and d <= _MAX_SAMPLER_D
    if use_pallas and sharding is not None:
        from dibs_tpu.parallel.shard_ops import divides_mesh

        use_pallas = divides_mesh(sharding, b)

    @jax.custom_vjp
    def sample(s, a):
        if use_pallas:
            if sharding is not None:
                from dibs_tpu.parallel.shard_ops import sharded_gumbel_graphs

                return sharded_gumbel_graphs(
                    s, _key_to_seed(key), a, tau, n_samples,
                    sharding=sharding,
                )
            return _pallas_graphs_padded(
                s, _key_to_seed(key), a, tau, n_samples, hard=False
            )
        eps = random.logistic(key, shape=(b, n_samples, d, d))
        return zero_diagonal(jax.nn.sigmoid(tau * (eps + a * s[:, None])))

    def fwd(s, a):
        out = sample(s, a)
        return out, (out, s, a)

    def bwd(res, g_out):
        out, s, a = res
        # dG/ds = tau*a*G(1-G); dG/da = tau*s*G(1-G); diagonal already zero
        sensit = tau * out * (1.0 - out) * g_out  # [B, M, d, d]
        d_scores = a * sensit.sum(axis=1)
        d_alpha = jnp.sum(sensit * s[:, None]).astype(jnp.asarray(a).dtype)
        return d_scores, d_alpha

    sample.defvjp(fwd, bwd)
    return sample(scores, jnp.asarray(alpha, scores.dtype))


def sample_hard_graphs(scores: jnp.ndarray, key, alpha, n_samples: int,
                       use_pallas: Optional[bool] = None,
                       sharding=None) -> jnp.ndarray:
    """``[B, d, d]`` scores -> ``[B, n_samples, d, d]`` hard Bernoulli
    adjacency samples (``G_ij ~ Bernoulli(sigmoid(alpha s_ij))`` via the
    Gumbel-max identity ``1[eps + alpha s > 0]``). Non-differentiable —
    used by the REINFORCE and Θ estimators, which treat samples as constants.
    ``sharding``: as in :func:`sample_soft_graphs`.
    """
    b, d, _ = scores.shape
    _check_sampler_d(use_pallas, d)
    if use_pallas is None:
        use_pallas = pallas_enabled() and d <= _MAX_SAMPLER_D
    if use_pallas and sharding is not None:
        from dibs_tpu.parallel.shard_ops import divides_mesh

        use_pallas = divides_mesh(sharding, b)
    if use_pallas:
        scores_ng = jax.lax.stop_gradient(scores)
        if sharding is not None:
            from dibs_tpu.parallel.shard_ops import sharded_gumbel_graphs

            out = sharded_gumbel_graphs(
                scores_ng, _key_to_seed(key), alpha, 1.0, n_samples,
                sharding=sharding, hard=True,
            )
        else:
            out = _pallas_graphs_padded(
                scores_ng, _key_to_seed(key), alpha, 1.0, n_samples,
                hard=True,
            )
        return jax.lax.stop_gradient(out)
    eps = random.logistic(key, shape=(b, n_samples, d, d))
    hard = (eps + alpha * jax.lax.stop_gradient(scores)[:, None] > 0.0)
    return zero_diagonal(hard.astype(jnp.float32))
