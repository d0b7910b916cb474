"""Aggregates the golden end-to-end comparison into a markdown report.

Reads ``parity/results/ref_cfg{C}_seed{S}*.json`` (actual reference
implementation) and ``ours_cfg{C}_seed{S}.json`` (dibs-tpu on the *same*
synthetic data) and writes ``parity/RESULTS_r2.md`` with per-config
mean +/- sd of E-SHD / AUROC / neg (M)LL for both posterior estimators,
plus the throughput table from the CPU timing runs.

Usage: python parity/compare.py
"""
import glob
import json
import os
import re
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")

CONFIG_NAMES = {
    1: "1 marginal BGe, d=20 ER linear-Gaussian, P=30",
    2: "2 joint LinearGaussian, d=20 SF, P=30",
    3: "3 joint DenseNonlinearGaussian, d=20 SF, P=30",
    4: "4 joint LinearGaussian + interventional, d=30 SF, P=20",
}


def load(side):
    pat = os.path.join(RESULTS, f"{side}_cfg*_seed*.json")
    out = {}
    for path in sorted(glob.glob(pat)):
        m = re.search(rf"{side}_cfg(\d+)_seed(\d+)", os.path.basename(path))
        if not m:
            continue
        cfg, seed = int(m.group(1)), int(m.group(2))
        with open(path) as f:
            d = json.load(f)
        if "empirical" not in d:  # timing-only record
            continue
        if d.get("steps") != 2000:  # smoke runs are not protocol runs
            continue
        out.setdefault(cfg, {})[seed] = d
    return out


def fmt(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return "—"
    if len(vals) == 1:
        return f"{vals[0]:.2f}"
    return f"{statistics.mean(vals):.2f} ± {statistics.stdev(vals):.2f}"


def metric_row(runs, estimator, key):
    return fmt([r[estimator].get(key) for r in runs.values()
                if estimator in r])


def main():
    ref, ours = load("ref"), load("ours")
    lines = [
        "# Golden end-to-end comparison — round 2",
        "",
        "The ACTUAL reference implementation (`/root/reference/dibs`, run via",
        "the igraph shim) vs dibs-tpu, inferring on **identical synthetic",
        "data** (saved by the reference side), 2000 SVGD steps, reference",
        "protocol seeds. `DiBS` = empirical posterior, `DiBS+` = mixture.",
        "",
    ]
    for cfg in sorted(set(ref) | set(ours)):
        r, o = ref.get(cfg, {}), ours.get(cfg, {})
        seeds_r, seeds_o = sorted(r), sorted(o)
        ll_key = "neg_mll" if cfg == 1 else "neg_ll"
        lines += [
            f"## Config {CONFIG_NAMES.get(cfg, cfg)}",
            "",
            f"reference seeds: {seeds_r} | dibs-tpu seeds: {seeds_o}",
            "",
            "| metric | reference DiBS | dibs-tpu DiBS |"
            " reference DiBS+ | dibs-tpu DiBS+ |",
            "|---|---|---|---|---|",
        ]
        for label, key in [("E-SHD", "eshd"), ("AUROC", "auroc"),
                           (f"neg {'M' if cfg == 1 else ''}LL", ll_key)]:
            lines.append(
                f"| {label} | {metric_row(r, 'empirical', key)} "
                f"| {metric_row(o, 'empirical', key)} "
                f"| {metric_row(r, 'mixture', key)} "
                f"| {metric_row(o, 'mixture', key)} |"
            )
        lines.append("")

    # throughput table from the timing-only CPU records
    lines += ["## Throughput (reference on CPU — the BASELINE.md baseline)",
              "",
              "| config | reference CPU steps/s |",
              "|---|---|"]
    for path in sorted(glob.glob(os.path.join(RESULTS, "ref_cfg*_seed*.json"))):
        with open(path) as f:
            d = json.load(f)
        if "steps_per_sec" in d and "CPU" in d.get("device", ""):
            lines.append(
                f"| {CONFIG_NAMES.get(d['config'], d['config'])} "
                f"| {d['steps_per_sec']:.3f} |"
            )
    lines.append("")

    out = os.path.join(HERE, "RESULTS_r2.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
