"""Global numeric policy for the framework's hot matmuls.

Default is ``'highest'`` (full fp32 accumulation on the MXU) — required for
parity-grade numerics in the BGe sufficient statistics and safe everywhere.
Likelihood-scoring matmuls tolerate lower precision; setting ``'default'``
(bf16 multiplies, fp32 accumulation — the MXU's native fast path) trades a
few likelihood decimals for throughput on large configs:

    import dibs_tpu.config as cfg
    cfg.set_likelihood_matmul_precision("default")

Only the *likelihood* matmuls read this knob; the BGe covariance/determinant
path and the SVGD transport always run at ``'highest'``.
"""
from __future__ import annotations

import jax

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_likelihood_matmul_precision = jax.lax.Precision.HIGHEST


def set_likelihood_matmul_precision(p) -> None:
    """Sets the precision of likelihood-scoring matmuls.

    Accepts ``'default' | 'high' | 'highest'`` or a ``jax.lax.Precision``.
    Takes effect at the next trace (construct engines after setting it).
    """
    global _likelihood_matmul_precision
    if isinstance(p, str):
        p = _PRECISIONS[p]
    _likelihood_matmul_precision = p


def likelihood_matmul_precision():
    return _likelihood_matmul_precision
