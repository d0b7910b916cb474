"""Global numeric policy for the framework's hot matmuls.

Default is ``'highest'`` (full fp32 accumulation on the MXU) — required for
parity-grade numerics in the BGe sufficient statistics and safe everywhere.
Likelihood-scoring matmuls tolerate lower precision; setting ``'default'``
(bf16 multiplies, fp32 accumulation — the MXU's native fast path) trades a
few likelihood decimals for throughput on large configs:

    import dibs_tpu.config as cfg
    cfg.set_likelihood_matmul_precision("default")

Only the *likelihood* matmuls read this knob; the BGe covariance/determinant
path always runs at ``'highest'``. The SVGD transport has its own knob
(:func:`set_transport_matmul_precision`, default ``'high'``) because its
``[P, P] @ [P, n]`` driver/repulsion matmuls are ~a quarter of the step at
production scale (d=128, P=1000): the driver term weights *stochastic*
gradient estimates whose MC noise dwarfs bf16x3 rounding. Measured A/B
(``benchmarks/TRANSPORT_PREC_AB.json``: config-5 steps/s + reduced d=20
quality, 3 seeds per arm): ``highest`` 17.8, ``high`` 18.7, ``default``
19.8 steps/s with AUROC statistically identical across arms
(0.954–0.966 everywhere) — so the default is ``'high'`` (bf16x3,
~2^-17, quality-transparent with margin). ``'default'`` (single-pass
bf16, ~2^-9) was later validated at the FULL 2000-step protocol too —
10 paired seeds at d=20 plus the d=128 large-feature clustered regime
(``benchmarks/TRANSPORT_DEFAULT_STUDY.json``): quality indistinguishable
(the repulsion centering holds even at 2^-9), but it buys only ~5% at
cfg5 (2-rep medians 21.9 vs 23.0 steps/s) — the remaining transport time
is mostly conversion/copy traffic, not MXU passes — so it stays opt-in rather than churning the quality goldens.
The ``'high'`` default IS validated at the full 2000-step protocol: the
round-3d parity re-validation (parity/RESULTS_r3.md addendum) ran with
it and matched the recorded golden medians.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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


_transport_matmul_precision = jax.lax.Precision.HIGH


def set_transport_matmul_precision(p) -> None:
    """Sets the precision of the SVGD transport's ``[P, P] @ [P, n]``
    driver/repulsion matmuls (:mod:`dibs_tpu.inference.transport`).

    Accepts ``'default' | 'high' | 'highest'`` or a ``jax.lax.Precision``.
    On TPU these lower to 1 / 3 / 6 MXU passes respectively. The kernel
    *matrix* (squared-distance Gram form) is unaffected — its exponent
    feeds ``exp`` and keeps its own fixed policy. Takes effect at the next
    trace (construct engines after setting it).
    """
    global _transport_matmul_precision
    if isinstance(p, str):
        p = _PRECISIONS[p]
    _transport_matmul_precision = p


def transport_matmul_precision():
    return _transport_matmul_precision


_ring_payload_dtype = jnp.float32


def set_ring_payload_dtype(dtype) -> None:
    """Sets the wire dtype of the ring transport's rotating ``(v, grad)``
    blocks (:mod:`dibs_tpu.parallel.ring`).

    Accepts ``'float32'`` (default) or ``'bfloat16'``. With bf16 the
    ``ppermute`` payload halves — the single biggest projected multi-chip
    lever for the ICI-bound cfg5 strong-scaling regime
    (benchmarks/MULTICHIP_PROJECTION.md: 8-chip efficiency 49% -> ~70%
    modeled). Only the *rotating* copies quantize: each device's resident
    block and all tile accumulators stay f32, so the r=0 (self) tile is
    exact and errors do not compound around the ring (each hop re-quantizes
    the same f32-born block once — the blocks are forwarded as-received).
    Takes effect at the next trace. Off (f32) by default: bf16 payload
    perturbs kernel tiles by ~2^-9 relative, the same order the transport
    'default' precision study measured as quality-transparent at full
    protocol (benchmarks/TRANSPORT_DEFAULT_STUDY.json), but multi-chip
    quality has only virtual-mesh evidence so far.
    """
    global _ring_payload_dtype
    if isinstance(dtype, str):
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    if dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(f"ring payload dtype must be float32 or bfloat16; "
                         f"got {dtype}")
    _ring_payload_dtype = dtype


def ring_payload_dtype():
    return _ring_payload_dtype


# --- Pallas kill switch -----------------------------------------------------
#
# None = auto (Pallas on TPU, XLA elsewhere). False disables every Pallas
# fast path — the engines fall back to the XLA formulations, which are
# bitwise-testable against CPU and keep full f32 likelihood weighting on
# extreme-scale (unstandardized) data. Also settable via the environment:
# DIBS_DISABLE_PALLAS=1.

_pallas_override: "bool | None" = None


def set_pallas_enabled(on) -> None:
    """Force the Pallas fast paths on/off; ``None`` restores auto-detect.

    ``False`` is the supported direction (exact-XLA fallback everywhere).
    ``True`` force-enables on a non-TPU backend — only meaningful for
    tests/interpret-mode debugging; the Mosaic kernels themselves still
    require TPU hardware to execute. Takes effect at the next trace
    (construct engines after setting it).
    """
    global _pallas_override
    _pallas_override = on


def pallas_override():
    """Returns the forced setting (True/False) or None for auto."""
    import os

    if os.environ.get("DIBS_DISABLE_PALLAS", "") not in ("", "0"):
        return False
    return _pallas_override
