"""Multi-chip performance projection (VERDICT r3 item 2).

Real multi-chip hardware is unavailable in this environment. The virtual
CPU mesh validates the *structure* of the sharded program (equality
asserts in `__graft_entry__.dryrun_multichip`; collective counts/types in
`tests/test_parallel.py::test_ring_hlo_collective_structure`); this report
supplies the *performance* story from the analytic ICI model in
`dibs_tpu.accounting`:

    t(N) = t_fixed + t_particle_work / N + exposed_comm(N)

with per-config measured inputs: single-chip step time, the transport
fraction (the only cross-particle coupling — reference svgd.py:258-261,
710-714), and the fleet-sweep-fitted fixed per-step overhead
(benchmarks/FLEET_SCALING.json, when present).

Writes benchmarks/MULTICHIP_PROJECTION.md.

Usage: python scripts/multichip_report.py [--out benchmarks/MULTICHIP_PROJECTION.md]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dibs_tpu.accounting import CHIP_PEAKS, multichip_projection, ring_comm_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measured single-chip inputs (update when the headline numbers move):
# steps_per_sec from benchmarks/SINGLEPASS_AB.json (single-pass arm);
# transport_frac measured by scripts/profile_step.py phase attribution
# (r3b: 36% at P=2000; quadratic scaling gives the P-specific shares).
CONFIGS = [
    # name, d, P, steps/s (1 chip), transport fraction of the step
    ("cfg2 joint linear d=20 P=30", 20, 30, 3269.0, 0.02),
    ("cfg4 joint interv d=30 P=20", 30, 20, 2522.0, 0.02),
    ("cfg5 scaling d=128 P=1000", 128, 1000, 20.5, 0.24),
    ("scale-out d=128 P=2000", 128, 2000, 8.3, 0.36),
]


def t_fixed_from_fleet():
    """Fleet-sweep linear fit's intercept: per-step time that does not
    shrink with less per-chip work (dispatch + fixed op population)."""
    path = os.path.join(REPO, "benchmarks", "FLEET_SCALING.json")
    if not os.path.exists(path):
        return 0.0, "no FLEET_SCALING.json — t_fixed=0 (optimistic)"
    with open(path) as f:
        data = json.load(f)
    fits = [v["fit_ms"]["t_fixed"] for k, v in data.items()
            if isinstance(v, dict) and "fit_ms" in v]
    if not fits:
        return 0.0, "no fits in FLEET_SCALING.json"
    t = max(min(fits), 0.0) / 1e3
    return t, f"fleet-sweep fit intercepts {fits} ms -> t_fixed={t*1e3:.3f} ms"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default=os.path.join(REPO, "benchmarks",
                                         "MULTICHIP_PROJECTION.md"))
    args = ap.parse_args()

    t_fixed, t_fixed_note = t_fixed_from_fleet()
    ici = CHIP_PEAKS["tpu_v5e"]["ici_gbps_per_link_dir"]

    lines = [
        "# Multi-chip projection (analytic; v5e ICI "
        f"{ici:.0f} GB/s/link/dir)",
        "",
        "No multi-chip hardware exists in this environment; these are the",
        "accounting-model projections (`dibs_tpu.accounting."
        "multichip_projection`)",
        "validated structurally on the 8-device virtual mesh (dryrun",
        "equality asserts; HLO collective-structure test). The model:",
        "`t(N) = t_fixed + work/N + exposed_comm(N)`, ring transport",
        "comm overlapped with tile compute per round (XLA latency-hiding",
        "scheduler), all-gather volume identical per device.",
        "",
        f"t_fixed: {t_fixed_note}.",
        "",
    ]

    for name, d, p, sps, tfrac in CONFIGS:
        sec1 = 1.0 / sps
        zdim = d * d * 2
        tdim = d * d
        ring = ring_comm_model(p=p, n_dev=8, z_dim=zdim, theta_dim=tdim)
        lines.append(f"## {name} — 1-chip {sps:.1f} steps/s, "
                     f"transport {tfrac*100:.0f}% of step, ring payload "
                     f"{ring['block_bytes']/1e6:.1f} MB/block")
        lines.append("")
        lines.append("| chips | strong steps/s | strong eff | strong eff "
                     "(bf16 wire) | weak steps/s (P/chip const) | weak eff "
                     "| exposed comm (strong) |")
        lines.append("|---|---|---|---|---|---|---|")
        for n in (1, 4, 8, 16):
            st = multichip_projection(
                seconds_1chip=sec1, p=p, n_dev=n, z_dim=zdim,
                theta_dim=tdim, transport_frac=tfrac, t_fixed=t_fixed)
            bf = multichip_projection(
                seconds_1chip=sec1, p=p, n_dev=n, z_dim=zdim,
                theta_dim=tdim, transport_frac=tfrac, t_fixed=t_fixed,
                payload_dtype_bytes=2.0)
            wk = multichip_projection(
                seconds_1chip=sec1, p=p, n_dev=n, z_dim=zdim,
                theta_dim=tdim, transport_frac=tfrac, t_fixed=t_fixed,
                weak=True)
            lines.append(
                f"| {n} | {1.0/st['t_step']:.1f} | "
                f"{st['efficiency']*100:.0f}% | "
                f"{bf['efficiency']*100:.0f}% | {1.0/wk['t_step']:.1f} | "
                f"{wk['efficiency']*100:.0f}% | "
                f"{st['t_comm_exposed']*1e3:.2f} ms |")
        lines.append("")

    lines += [
        "Knob (IMPLEMENTED in round 5): the production-scale configs are",
        "ring-comm-exposed at 8+ chips (49-98 MB rotating blocks). The",
        "'strong eff (bf16 wire)' column is the flag-gated bf16 ring",
        "payload (`dibs_tpu.config.set_ring_payload_dtype('bfloat16')`,",
        "`parallel/ring.py`): the rotating (v, grad) blocks cross ICI at",
        "half width, accumulators and the resident block stay f32, and the",
        "model now charges two HBM passes per round of quantize/upcast",
        "overhead (`multichip_projection(payload_dtype_bytes=2.0)`).",
        "Validated on the virtual mesh — equality within bf16-quantization",
        "tolerance vs the f32 ring plus a lowered-HLO check that every",
        "collective-permute payload is bf16",
        "(tests/test_parallel.py::test_ring_bf16_payload_matches_f32).",
        "Default off: only the wire-width timing claim still needs real",
        "ICI.",
        "",
        "t_fixed caveat: the fleet-sweep fits produced slightly NEGATIVE",
        "intercepts (clamped to 0 here), so the t_fixed that erodes",
        "small-config strong scaling at 16 chips is a fit artifact, not a",
        "measurement. Treat the 16-chip small-d rows as optimistic by an",
        "unknown sub-millisecond constant; the production-scale rows are",
        "comm-dominated and insensitive to it.",
        "",
        "Reading: strong scaling divides the particle set across chips.",
        "The small-d configs project well to 8 chips (their ring blocks",
        "are tiny; the per-round ppermute latency term is what erodes",
        "them by 16) — but at P=30 over 8+ chips the per-chip particle",
        "count is already 2-4, so the practical ceiling is the particle",
        "count, and multi-problem throughput should use the zero-",
        "collective 'datasets' fleet mesh axis instead. The production-",
        "scale configs are ring-COMM-exposed at 8+ chips (see the knob",
        "above). Weak scaling holds P/chip constant: the global",
        "[P_total, P_total] transport grows ~N per chip, which is the",
        "quadratic term the ring distributes but cannot shrink.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
