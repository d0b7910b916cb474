"""Hardware cost accounting: per-step FLOPs/bytes models and rooflines.

VERDICT r2 item 1: every throughput claim needs a hardware denominator.
This module provides

* an *analytic* per-SVGD-step cost model for each engine configuration,
  built from the reference hot-loop inventory (SURVEY.md §3.1; reference
  ``dibs/inference/dibs.py:395-459``, ``linearGaussian.py:63-144``,
  ``nonlinearGaussian.py:275-305``) and this package's actual operator
  choices (closed-form REINFORCE direction, one-vjp estimators, GE
  determinant pairs, log-depth acyclicity chain);
* the *compiled* cost as XLA reports it (``compiled.cost_analysis()``) for
  cross-checking the analytic model;
* a roofline verdict: achieved TFLOP/s, GB/s, percent of peak, and which
  ceiling (compute / HBM / neither = op-bound) the measured time sits
  against.

Peaks are per-chip datasheet numbers. TPU v5e (the benchmark device):
197 bf16 TFLOP/s, ~49 fp32-equivalent TFLOP/s (fp32 matmuls run as
multi-pass bf16 on the MXU), 819 GB/s HBM.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

__all__ = ["CHIP_PEAKS", "StepCost", "bge_step_cost", "linear_step_cost",
           "nonlinear_step_cost", "roofline", "xla_cost_analysis",
           "ring_comm_model", "allgather_comm_model", "multichip_projection",
           "phase_roofline", "PHASE_CEILINGS"]

CHIP_PEAKS = {
    "tpu_v5e": {
        "bf16_tflops": 197.0,
        "fp32_tflops": 49.2,
        "hbm_gbps": 819.0,
        # ICI: one-way bandwidth per link. v5e is a 2-D torus with ~45 GB/s
        # per link per direction ("How to Scale Your Model" ballpark; the
        # r3 VERDICT's "~400 GB/s/link" reads as the aggregate across the
        # 4 links x 2 directions, ~360 GB/s — we model the conservative
        # per-direction figure because a 1-D ring ppermute rides exactly
        # one link each way). All comm projections scale inversely in
        # this number; the tables state it explicitly.
        "ici_gbps_per_link_dir": 45.0,
        "ici_links": 4,
    },
    # CPU reference host (rough: 1 core AVX-512 @ ~2 GHz)
    "cpu_1core": {"bf16_tflops": 0.064, "fp32_tflops": 0.128, "hbm_gbps": 20.0},
}


@dataclasses.dataclass
class StepCost:
    """Analytic per-step cost, split by phase.

    ``flops``: multiply-accumulate-style floating ops (MXU + VPU), counting
    one FMA as 2. ``bytes_min``: the *compulsory* HBM traffic of the
    algorithm as implemented — each major intermediate tensor counted once
    written + once read (fused consumers counted as zero); this is the
    floor the implementation aims at, not what a given compiler run
    achieves. ``transcendentals``: exp/log/sigmoid/gammaln evaluations
    (VPU-serialized, often the true ceiling for elimination/sampling ops).
    """

    flops: float
    bytes_min: float
    transcendentals: float
    phases: Dict[str, float]

    def total_row(self, seconds: float, chip: str = "tpu_v5e") -> Dict[str, Any]:
        return roofline(self.flops, self.bytes_min, self.transcendentals,
                        seconds, chip)


def _sampling_cost(p, m, d):
    """Gumbel graph sampling: per sample-entry ~1 PRNG draw + log/sigmoid.
    Pallas path: noise never in HBM; traffic = output only."""
    n = p * m * d * d
    return dict(flops=6.0 * n, bytes=4.0 * n, transc=2.0 * n)


def _kernel_transport_cost(p, d, k, theta_dim=0):
    """[P, P] SE kernel + transport matmuls (Gram formulation)."""
    feat = d * k * 2 + theta_dim
    flops = 2.0 * p * p * feat * 3  # gram + two transport matmuls
    bytes_ = 4.0 * (2 * p * feat + 3 * p * p)
    return dict(flops=flops, bytes=bytes_, transc=p * p)


def _acyclicity_cost(p, kmc, d):
    """E[grad h(G)] via soft samples + log-depth power chain (forward +
    closed-form VJP: ~(log2 d + 2) batched [d, d] matmuls per sample)."""
    n_mm = math.ceil(math.log2(max(d, 2))) + 2
    flops = p * kmc * (2.0 * d * d * d * n_mm)
    bytes_ = 4.0 * p * kmc * d * d * (n_mm + 2)
    samp = _sampling_cost(p, kmc, d)
    return dict(flops=flops + samp["flops"], bytes=bytes_ + samp["bytes"],
                transc=samp["transc"])


def bge_step_cost(*, d, n_obs, p, m, kmc=32, k=None) -> StepCost:
    """MarginalDiBS + BGe with the ``score`` estimator (config 1).

    Hot op: per (particle, MC sample, node) one bordered-GE determinant
    pair over the parent-masked ``[d, d]`` posterior matrix
    (``ops/bge_kernel.py``): ~d^3 FLOPs, d logs. Sufficient statistics
    are shared across the whole batch (one [d, N, d] contraction).
    """
    k = k or d
    b = p * m * d  # determinant pairs per step
    phases = {}
    # masked-matrix build (d^2 per pair) + elimination sweep (~d^3/2 FMA)
    phases["bge_eliminations"] = b * (d * d * 2.0 + d * d * d)
    elim_transc = b * (d + 1.0)  # log per pivot + schur log
    # gamma/score assembly per node
    phases["bge_gamma_terms"] = 10.0 * p * m * d
    gamma_transc = 3.0 * p * m * d
    samp = _sampling_cost(p, m, d)
    phases["sampling"] = samp["flops"]
    # REINFORCE direction: closed-form batch matmuls (ops/edges.py)
    phases["reinforce_dir"] = 2.0 * p * m * d * d * k * 2
    acy = _acyclicity_cost(p, kmc, d)
    phases["acyclicity_prior"] = acy["flops"]
    ker = _kernel_transport_cost(p, d, k)
    phases["kernel_transport"] = ker["flops"]

    # compulsory traffic: masks in (Pallas kernel reads [B, d] masks,
    # writes 2 scalars) + sampler output + reinforce grads + prior
    bytes_min = (
        4.0 * (b * d + 2 * b)          # det kernel in/out
        + samp["bytes"]                 # graph samples materialized
        + 4.0 * p * m * d * d           # reinforce per-sample reads
        + acy["bytes"] + ker["bytes"]
        + 4.0 * 3 * p * d * k * 2       # z, grads, update
    )
    return StepCost(
        flops=sum(phases.values()),
        bytes_min=bytes_min,
        transcendentals=elim_transc + gamma_transc + samp["transc"]
        + acy["transc"],
        phases=phases,
    )


def linear_step_cost(*, d, n_obs, p, m, kmc=32, k=None) -> StepCost:
    """JointDiBS + LinearGaussian, fused Pallas reparam path (configs 2/4/5).

    Fused kernel (round 4: ONE pass, online softmax): per (particle,
    sample) one delta matmul ``[N, d] @ [d, d]`` forward and its two
    backward matmuls, sampled once. (This model never counted the legacy
    two-pass design's replayed sampling/forward, so the single-pass
    change moves *measured* time toward the model — the r3 MFU figures
    were computed against these same FLOPs.)
    """
    k = k or d
    phases = {}
    fwd = 2.0 * n_obs * d * d  # means matmul per (p, m)
    # centered scoring: + one reference matmul per particle per pass at
    # HIGHEST precision (6 Mosaic MXU passes), amortized over the M samples
    ref = 2.0 * 6.0 * fwd
    phases["fused_forward"] = p * (m * (fwd + 4.0 * n_obs * d) + ref)
    phases["fused_backward"] = p * m * (2.0 * fwd + 6.0 * d * d)
    samp = _sampling_cost(p, m, d)
    phases["sampling_in_kernel"] = samp["flops"]
    acy = _acyclicity_cost(p, kmc, d)
    phases["acyclicity_prior"] = acy["flops"]
    ker = _kernel_transport_cost(p, d, k, theta_dim=d * d)
    phases["kernel_transport"] = ker["flops"]

    # fused path: graphs/noise/masked-weights never in HBM; traffic is
    # x (read per tile), dZ/dTheta outputs, prior + transport tensors
    bytes_min = (
        4.0 * (p * m / 8.0) * n_obs * d     # x tile re-reads (8-sample groups)
        + 4.0 * 2 * p * d * d               # dscores + dtheta out
        + acy["bytes"] + ker["bytes"]
        + 4.0 * 3 * p * d * k * 2
    )
    return StepCost(
        flops=sum(phases.values()),
        bytes_min=bytes_min,
        transcendentals=samp["transc"] + acy["transc"] + p * m * n_obs,
        phases=phases,
    )


def nonlinear_step_cost(*, d, n_obs, p, m, hidden=(5,), kmc=32,
                        k=None, shared_sampling=True,
                        fused_kernel=False) -> StepCost:
    """JointDiBS + DenseNonlinearGaussian (config 3).

    ``fused_kernel=False``: the XLA shared-sample estimators (one soft
    forward + Z-vjp, one hard forward + Θ-vjp). ``fused_kernel=True``: the
    single-pass online-softmax Pallas kernel
    (:mod:`dibs_tpu.inference.fused_nonlinear`): per sample group, one
    ``[N, dp] @ [dp, bm*dp]`` matmul per hidden unit per stream forward
    plus one backward (``4 h1`` total), at the kernel's sublane-padded
    ``dp``; graphs/noise/activations never reach HBM.
    """
    k = k or d
    dims = (d, *hidden, 1)
    h1 = hidden[0]
    phases = {}
    samp = _sampling_cost(p, m if shared_sampling else 2 * m, d)
    acy = _acyclicity_cost(p, kmc, d)
    theta_dim = sum(dims[i] * dims[i + 1] * d + dims[i + 1] * d
                    for i in range(len(dims) - 1))
    ker = _kernel_transport_cost(p, d, k, theta_dim=theta_dim)

    if fused_kernel:
        dp = ((max(d, 2) + 7) // 8) * 8
        n_pad = ((max(n_obs, 8) + 7) // 8) * 8
        # 4*h1 wide matmuls (soft/hard x fwd/bwd) over the padded shapes +
        # masking/epilogue elementwise
        mm = 4.0 * h1 * 2.0 * n_pad * dp * dp  # per sample
        # centered scoring: + h1 reference matmuls per particle at HIGHEST
        # (6 MXU passes), amortized over the M samples
        ref = 6.0 * h1 * 2.0 * n_pad * dp * dp
        phases["fused_single_pass"] = p * (m * (mm + 10.0 * dp * dp * h1)
                                           + ref)
        phases["in_kernel_sampling"] = samp["flops"]
        bytes_core = 4.0 * (
            p * (dp * dp * (2 + h1) + 3 * h1 * dp)  # params in, grads out
            + (p * m / 16.0) * n_pad * dp            # x tile re-reads
        )
        transc_core = samp["transc"] + 2.0 * p * m * dp
    else:
        fwd = 0.0
        for i in range(len(dims) - 1):
            fwd += 2.0 * n_obs * dims[i] * dims[i + 1] * d
        fwd += d * d * hidden[0]
        phases["soft_forward_plus_zvjp"] = p * m * fwd * 3.0
        phases["hard_forward_plus_tvjp"] = p * m * fwd * 2.5
        phases["sampling"] = samp["flops"]
        bytes_core = (
            samp["bytes"]
            + 4.0 * p * m * d * d * h1 * 2   # masked first-layer weights
            + 4.0 * p * m * d * h1 * n_obs * 2  # layer-1 activations
        )
        transc_core = samp["transc"] + 2.0 * p * m * n_obs * d

    phases["acyclicity_prior"] = acy["flops"]
    phases["kernel_transport"] = ker["flops"]
    bytes_min = (bytes_core + acy["bytes"] + ker["bytes"]
                 + 4.0 * 3 * (p * d * k * 2 + p * theta_dim))
    return StepCost(
        flops=sum(phases.values()),
        bytes_min=bytes_min,
        transcendentals=transc_core + acy["transc"],
        phases=phases,
    )


def roofline(flops, bytes_, transc, seconds, chip="tpu_v5e",
             fp32=True) -> Dict[str, Any]:
    """Achieved rates vs chip peaks + which ceiling binds.

    ``mfu`` uses the fp32 matmul peak by default (the engine keeps
    likelihood matmuls at HIGHEST precision — measured faster than bf16 at
    these shapes, benchmarks/RESULTS.md r2 notes).
    """
    peaks = CHIP_PEAKS[chip]
    peak_t = peaks["fp32_tflops"] if fp32 else peaks["bf16_tflops"]
    tflops = flops / seconds / 1e12
    gbps = bytes_ / seconds / 1e9
    # VPU transcendental ceiling: ~1 exp/log per lane-cycle across 8x128
    # lanes at ~0.94 GHz => ~0.96e12/s on v5e (order-of-magnitude model)
    transc_rate = transc / seconds / 1e9
    mfu = tflops / peak_t
    mem_frac = gbps / peaks["hbm_gbps"]
    transc_frac = transc_rate / 960.0 if chip == "tpu_v5e" else float("nan")
    fracs = {"compute": mfu, "hbm": mem_frac, "transcendental": transc_frac}
    bound = max(fracs, key=lambda kk: fracs[kk] if fracs[kk] == fracs[kk] else -1)
    if fracs[bound] == fracs[bound] and fracs[bound] < 0.15:
        # no classical ceiling explains the time: dominated by serialized
        # vector-op chains / kernel-launch & dispatch latency
        bound = "none (op/latency-bound)"
    return {
        "seconds_per_step": seconds,
        "tflops_achieved": round(tflops, 4),
        "hbm_gbps_achieved": round(gbps, 2),
        "transc_gops": round(transc_rate, 3),
        "mfu_pct": round(100 * mfu, 2),
        "hbm_pct": round(100 * mem_frac, 2),
        "transc_pct": round(100 * transc_frac, 2)
        if transc_frac == transc_frac else None,
        "binding_ceiling": bound,
        "headroom_x": round(1.0 / max(fracs.values()), 1)
        if max(fracs.values()) > 0 else None,
    }


# --------------------------------------------------------------------------
# Per-phase roofline (VERDICT r3 item 3): each phase's achieved TF/s
# against the ceiling ITS precision class can reach on the MXU. The
# step-level roofline hides where the gap lives; this itemizes it.
#
# Ceiling rationale per phase (v5e: bf16 197 TF/s; each extra MXU pass
# divides it — fp32/HIGHEST = 6 passes ~ 33 TF/s effective for f32
# operands, but XLA reports "fp32 peak" 49.2 = 197/4; we use the
# published 49.2 for HIGHEST-class phases and 197/3 for HIGH (bf16x3)):
#   fused_forward / fused_backward — the delta matmuls run single-pass
#     DEFAULT (bf16 multiplies), but their [N, dp] @ [dp, wd] shape caps
#     MXU row utilization at dp/128 at small d, so the honest ceiling is
#     shape-scaled: 197 * min(dp, 128)/128.
#   sampling — VPU/PRNG work, no MXU ceiling; modeled against VPU lanes.
#   acyclicity_prior — [d, d] matmul chain at DEFAULT precision: 197
#     scaled by d/128 row utilization.
#   kernel_transport — HIGH precision (bf16x3): 197/3.
#   bge_eliminations — serialized VPU vector chain; ceiling = VPU f32
#     throughput (see VPU_F32_TOPS).
# --------------------------------------------------------------------------

# v5e VPU: 8 sublanes x 128 lanes x 4 ALUs per core @ ~0.94 GHz ~ 3.9
# Tf32-op/s. Used as the ceiling for elementwise/PRNG-bound phases.
VPU_F32_TOPS = 3.9


def PHASE_CEILINGS(d: int, chip: str = "tpu_v5e") -> Dict[str, float]:
    peaks = CHIP_PEAKS[chip]
    bf16 = peaks["bf16_tflops"]
    fp32 = peaks["fp32_tflops"]
    row_util = min(max(d, 1), 128) / 128.0
    return {
        "fused_forward": bf16 * row_util,
        "fused_backward": bf16 * row_util,
        "sampling_in_kernel": VPU_F32_TOPS,
        "sampling": VPU_F32_TOPS,
        "acyclicity_prior": bf16 * row_util,
        "kernel_transport": bf16 / 3.0,
        "bge_eliminations": VPU_F32_TOPS,
        "bge_gamma_terms": VPU_F32_TOPS,
        "reinforce_dir": fp32,
    }


def phase_roofline(cost: "StepCost", measured_ms: Dict[str, float],
                   d: int, chip: str = "tpu_v5e"):
    """Per-phase achieved TF/s vs that phase's ceiling.

    ``measured_ms`` maps a measured-time label to (milliseconds, tuple of
    model phase names it covers). Returns a list of row dicts
    (label, ms, gflop, achieved TF/s, ceiling TF/s, pct, gap x).
    """
    ceils = PHASE_CEILINGS(d, chip)
    rows = []
    for label, (ms, phase_names) in measured_ms.items():
        gflop = sum(cost.phases.get(p, 0.0) for p in phase_names) / 1e9
        # FLOP-weighted harmonic ceiling: the minimum time the covered
        # phases could take if each ran at its own ceiling
        t_floor_ms = sum(
            (cost.phases.get(p, 0.0) / 1e9)
            / ceils.get(p, CHIP_PEAKS[chip]["fp32_tflops"])
            for p in phase_names
        )
        ceil = gflop / max(t_floor_ms, 1e-12)
        ach = gflop / max(ms, 1e-9)  # GFLOP / ms == TF/s
        rows.append({
            "phase": label, "ms": round(ms, 3), "gflop": round(gflop, 2),
            "achieved_tfs": round(ach, 2), "ceiling_tfs": round(ceil, 1),
            "pct_of_ceiling": round(100.0 * ach / ceil, 1),
            "gap_x": round(ceil / max(ach, 1e-9), 2),
        })
    return rows


# --------------------------------------------------------------------------
# VPU work model for the small-d fused kernels (VERDICT r3 item 1).
#
# The step-level MFU metric counts MXU FLOPs only; at d=20 the fused
# kernels' time is dominated by VPU *elementwise* work (PRNG draws,
# sampling transforms, residual/score epilogues) whose lane-op count
# scales linearly in the sample batch — which is why fleet batching
# cannot amortize it (FLEET_SCALING.json: per-dataset marginal cost at
# B=8 equals the standalone step). These counters turn "op/latency-
# bound, 2-5% MFU" into the honest label: VPU-throughput-bound at the
# counted fraction of VPU peak.
# --------------------------------------------------------------------------


def linear_kernel_vpu_ops(*, d, n_obs, p, m) -> float:
    """f32 lane-ops of the single-pass fused linear kernel's elementwise
    work per SVGD step (PRNG ~8 ops/lane over [2, dp, wd]; sampling ~10;
    scoring/residual chains ~14 per [N_pad, wd] lane; epilogues ~9 per
    [dp, wd] lane), counted from the kernel body at the padded shapes."""
    dp = 16
    while dp < min(d, 128):
        dp *= 2
    if d > 128:
        dp = ((d + 127) // 128) * 128
    n_pad = ((max(n_obs, 8) + 7) // 8) * 8
    per_sample = 31.0 * dp * dp + 14.0 * n_pad * dp
    return p * m * per_sample


def bge_kernel_vpu_ops(*, d, p, m) -> float:
    """f32 lane-ops of the lane-batched bordered-Schur BGe kernel per
    step: the masked build (~4 ops x d columns) plus the elimination
    sweep (~3 ops per remaining column per pivot, ~d^2/2 column-updates),
    each on [d, TILE] tiles — per matrix ~(4 d^2 + 1.5 d^2 (d+1)/...)
    ~ 1.5 d^3 lane-ops dominated by the sweep."""
    b = p * m * d  # determinant pairs
    per_matrix = 4.0 * d * d + 1.5 * d * d * d / 2.0 * 2.0
    return b * per_matrix


# --------------------------------------------------------------------------
# Multi-chip performance model (VERDICT r3 item 2)
#
# Real multi-chip hardware is unavailable in this environment; the virtual
# CPU mesh validates *structure* (collective counts/types — see
# tests/test_parallel.py::test_ring_hlo_collective_structure), and this
# model supplies the *performance* story: per-config ICI comm volume and
# projected weak/strong-scaling efficiency. The only cross-particle
# coupling in SVGD is the [P, P] kernel/transport (reference
# svgd.py:258-261, 710-714); everything else is embarrassingly parallel
# over particles, so the model has three terms per chip:
#
#   t(N) = t_fixed  +  t_particle_work / N  +  exposed_comm(N)
#
# * ``t_fixed``: per-step time that does not shrink with fewer local
#   particles — dispatch, the fixed population of small XLA ops, Pallas
#   grid prologues. Calibrated from the fleet B-sweep (t(B) ~= t_fixed +
#   B * t_work fits both; benchmarks/FLEET_SCALING.json).
# * particle work: every estimator phase AND the transport tile compute
#   (each device computes [P/N, P/N] tiles x N ring rounds = P^2/N pairs).
# * comm: the ring rotates the flattened (v, grad) blocks — per device per
#   step, (N-1) rounds x block bytes; XLA's latency-hiding scheduler
#   overlaps each permute with the next tile's compute, so the *exposed*
#   comm is max(0, round_comm - round_tile_compute) per round. The
#   all-gather fallback path transfers (N-1)/N * P * n bytes instead.
# --------------------------------------------------------------------------


def ring_comm_model(*, p, n_dev, z_dim, theta_dim=0, dtype_bytes=4.0
                    ) -> Dict[str, float]:
    """Per-device ICI traffic of the ring transport for one SVGD step.

    The rotating payload per device is the flattened local ``(v, grad)``
    block pair: ``2 * (P/N) * (z_dim + theta_dim)`` floats (marginal
    engines have ``theta_dim=0``; the joint ring rotates z/dz plus the
    flattened theta/dtheta — ``dibs_tpu/parallel/ring.py``).
    """
    blk = 2.0 * (p / n_dev) * (z_dim + theta_dim) * dtype_bytes
    rounds = max(n_dev - 1, 0)
    return {
        "block_bytes": blk,
        "rounds": rounds,
        "bytes_per_device": rounds * blk,
        "bytes_total": rounds * blk * n_dev,
    }


def allgather_comm_model(*, p, n_dev, z_dim, theta_dim=0, dtype_bytes=4.0
                         ) -> Dict[str, float]:
    """Per-device ICI traffic of the all-gather transport path (used when
    the kernel needs the global distance matrix, e.g. median-heuristic
    bandwidths): each device receives every other shard of (v, grad)."""
    recv = 2.0 * (n_dev - 1) / max(n_dev, 1) * p * (z_dim + theta_dim) \
        * dtype_bytes
    return {"bytes_per_device": recv, "bytes_total": recv * n_dev}


# one ppermute round's launch+hop latency (cannot overlap with compute;
# dominates the ring cost for tiny payloads — the small-d configs)
ICI_ROUND_LATENCY_S = 2e-6


def multichip_projection(*, seconds_1chip, p, n_dev, z_dim, theta_dim=0,
                         transport_frac, t_fixed=0.0, weak=False,
                         chip="tpu_v5e", ici_gbps=None,
                         round_latency_s=ICI_ROUND_LATENCY_S,
                         payload_dtype_bytes=4.0
                         ) -> Dict[str, Any]:
    """Projected per-step time and scaling efficiency at ``n_dev`` chips.

    Args:
        seconds_1chip: measured single-chip step time at particle count
            ``p`` (the BASELINE config numbers).
        transport_frac: fraction of the *scalable* single-chip step spent
            in the [P, P] kernel/transport (from the accounting phase
            model, or measured — 36% at d=128/P=2000).
        t_fixed: non-scaling per-step seconds (fleet-sweep calibrated).
        weak: if True, the projection holds the per-chip particle count at
            ``p`` (global particles = p * n_dev) instead of splitting
            ``p`` across chips.
        payload_dtype_bytes: wire bytes per element of the rotating
            blocks — 4.0 (f32, default) or 2.0 (the flag-gated bf16
            payload, :func:`dibs_tpu.config.set_ring_payload_dtype`,
            implemented in ``parallel/ring.py``). Sub-f32 payloads add a
            modeled quantize/upcast cost: two HBM-bandwidth passes over
            the f32-sized block per round (quantize-on-forward +
            upcast-on-use), charged to compute (it overlaps with nothing
            — it IS on the tile critical path).

    Returns a dict with the per-term breakdown, the overlapped and
    non-overlapped step-time projections, and the efficiency (vs perfect
    linear scaling for strong, vs constant step time for weak).
    """
    peaks = CHIP_PEAKS[chip]
    bw = (ici_gbps if ici_gbps is not None
          else peaks["ici_gbps_per_link_dir"]) * 1e9
    t_work = max(seconds_1chip - t_fixed, 0.0)
    t_tr1 = transport_frac * t_work        # single-chip transport compute
    t_other1 = t_work - t_tr1              # everything else (particle-par)

    if n_dev == 1:
        t_step = t_fixed + t_work
        return {"n_dev": 1, "t_step": t_step, "t_step_no_overlap": t_step,
                "t_fixed": t_fixed, "t_other": t_other1, "t_transport": t_tr1,
                "t_comm_exposed": 0.0, "comm_bytes_per_device": 0.0,
                "efficiency": 1.0}

    if weak:
        # per-chip: other work constant; transport work grows ~linearly
        # (P_total^2 / N = N * p^2 pair-work per device); rotating block
        # stays p * n floats.
        t_other = t_other1
        t_tr = n_dev * t_tr1
        comm = ring_comm_model(p=p * n_dev, n_dev=n_dev, z_dim=z_dim,
                               theta_dim=theta_dim,
                               dtype_bytes=payload_dtype_bytes)
    else:
        t_other = t_other1 / n_dev
        t_tr = t_tr1 / n_dev
        comm = ring_comm_model(p=p, n_dev=n_dev, z_dim=z_dim,
                               theta_dim=theta_dim,
                               dtype_bytes=payload_dtype_bytes)

    rounds = comm["rounds"]
    per_round_comm = comm["block_bytes"] / bw
    per_round_tile = t_tr / max(n_dev, 1)  # N tile steps per ring pass
    exposed = rounds * (max(0.0, per_round_comm - per_round_tile)
                        + round_latency_s)
    t_comm_full = rounds * (per_round_comm + round_latency_s)

    # quantize/upcast passes for sub-f32 payloads (see docstring)
    t_conv = 0.0
    if payload_dtype_bytes < 4.0:
        blk_f32 = comm["block_bytes"] * 4.0 / payload_dtype_bytes
        t_conv = rounds * 2.0 * blk_f32 / (peaks["hbm_gbps"] * 1e9)

    t_step = t_fixed + t_other + t_tr + t_conv + exposed
    t_step_no_overlap = t_fixed + t_other + t_tr + t_conv + t_comm_full
    if weak:
        eff = (t_fixed + t_work) / t_step  # ideal: constant step time
    else:
        eff = (t_fixed + t_work) / (n_dev * t_step)
    return {
        "n_dev": n_dev,
        "t_step": t_step,
        "t_step_no_overlap": t_step_no_overlap,
        "t_fixed": t_fixed,
        "t_other": t_other,
        "t_transport": t_tr,
        "t_comm_exposed": exposed,
        "t_comm_full": t_comm_full,
        "t_conv": t_conv,
        "comm_bytes_per_device": comm["bytes_per_device"],
        "efficiency": eff,
    }


def xla_cost_analysis(fn, *args, **kwargs) -> Optional[Dict[str, float]]:
    """FLOPs / bytes as XLA's compiled cost model reports them (may be
    unavailable on some backends; returns None then)."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", float("nan"))),
            "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
            "transcendentals": float(ca.get("transcendentals", float("nan"))),
        }
    except Exception:
        return None
