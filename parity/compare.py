"""Aggregates the golden end-to-end comparison into a markdown report.

Reads ``parity/results/ref_cfg{C}_seed{S}*.json`` (actual reference
implementation) and ``ours_cfg{C}_seed{S}{gen}.json`` (dibs-tpu on the
*same* synthetic data; generation precedence ``_r3 > _r3e > _r3d >
base``, reported per config) and writes
``parity/RESULTS_r3.md`` with per-config mean ± sd AND median [IQR] of
E-SHD / AUROC / neg (M)LL for both posterior estimators, an outlier note
for heavy-tailed cells (VERDICT r2 weak-item 2), plus the reference-CPU
throughput table.

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


# explicit generation precedence (ADVICE r3: the old `(_r3)?` suffix regex
# also matched `_r3d`/`_r3e` and tie-broke by glob sort order). Higher
# rank wins regardless of file order; the generation actually used per
# seed is reported in the table's provenance line.
#   ours: _r3 (r3g reruns at HEAD) > _r3e (wide-plan kernels) > _r3d > base
#   ref:  base (the CPU run that also carries steps/s) > _tpu
_PRECEDENCE = {
    "ours": ["_r3", "_r3e", "_r3d", ""],
    "ref": ["", "_tpu"],
}


def load(side):
    """{cfg: {seed: record}}; record carries ``_gen`` (suffix used)."""
    pat = os.path.join(RESULTS, f"{side}_cfg*_seed*.json")
    ranks = _PRECEDENCE[side]
    out = {}
    for path in sorted(glob.glob(pat)):
        base = os.path.basename(path)
        m = re.match(rf"{side}_cfg(\d+)_seed(\d+)(_[a-z0-9]+)?\.json$", base)
        if not m:
            continue
        cfg, seed, gen = int(m.group(1)), int(m.group(2)), m.group(3) or ""
        if gen not in ranks:  # _rb3 study files, _cpurepro diagnostics, ...
            continue
        with open(path) as f:
            d = json.load(f)
        if "empirical" not in d:  # timing-only record
            continue
        if d.get("steps") != 2000:  # smoke runs are not protocol runs
            continue
        slot = out.setdefault(cfg, {})
        if seed not in slot or ranks.index(gen) < ranks.index(
                slot[seed]["_gen"]):
            d["_gen"] = gen
            slot[seed] = d
    return out


def _vals(runs, estimator, key):
    return [r[estimator].get(key) for r in runs.values()
            if estimator in r and r[estimator].get(key) is not None]


def fmt_mean(vals):
    if not vals:
        return "—"
    if len(vals) == 1:
        return f"{vals[0]:.2f}"
    return f"{statistics.mean(vals):.2f} ± {statistics.stdev(vals):.2f}"


def fmt_median(vals):
    if not vals:
        return "—"
    if len(vals) == 1:
        return f"{vals[0]:.2f}"
    q = statistics.quantiles(vals, n=4)
    return f"{statistics.median(vals):.2f} [{q[0]:.2f}, {q[2]:.2f}]"


def outlier_note(cfg, runs, estimator, key):
    """Flags seeds whose value exceeds 3x the median (positive metrics)."""
    notes = []
    vals = {s: r[estimator].get(key) for s, r in runs.items()
            if estimator in r and r[estimator].get(key) is not None}
    if len(vals) < 3:
        return notes
    med = statistics.median(vals.values())
    for s, v in sorted(vals.items()):
        if med > 0 and v > 3 * med:
            note = (f"outlier: cfg {cfg} seed {s} {estimator}/{key} = "
                    f"{v:.0f} vs median {med:.0f}")
            rec = runs[s].get("per_particle")
            if rec:
                lls = rec.get("holdout_ll", [])
                if lls:
                    worst = min(lls)
                    note += (f" — worst particle holdout LL {worst:.0f} vs "
                             f"median particle {statistics.median(lls):.0f}"
                             f" ({sum(rec.get('cyclic', []))} cyclic)")
            notes.append(note)
    return notes


def main():
    ref, ours = load("ref"), load("ours")
    lines = [
        "# Golden end-to-end comparison — round 3",
        "",
        "The ACTUAL reference implementation (`/root/reference/dibs`, run via",
        "the igraph shim) vs dibs-tpu, inferring on **identical synthetic",
        "data** (saved by the reference side), 2000 SVGD steps, reference",
        "protocol seeds. `DiBS` = empirical posterior, `DiBS+` = mixture.",
        "Cells report mean ± sd and median [IQR] — medians are the robust",
        "statistic for the heavy-tailed negLL cells.",
        "",
        "Partial-coverage cells print their own n. In particular the",
        "reference E-CPDAG-SHD exists only for the r3g-extension seeds",
        "(4–8) on configs 2/4 — that 5-seed subset is measurably harder",
        "than the full 10 (ref mixture E-SHD mean 48.6 on seeds 4–8 vs",
        "41.6 over all 10 on cfg4), so do not compare a 5-seed reference",
        "CPDAG cell against a 10-seed ours cell across columns.",
        "",
    ]
    all_notes = []
    for cfg in sorted(set(ref) | set(ours)):
        r, o = ref.get(cfg, {}), ours.get(cfg, {})
        ll_key = "neg_mll" if cfg == 1 else "neg_ll"

        def gen_note(runs):
            by_gen = {}
            for s, d in runs.items():
                by_gen.setdefault(d["_gen"] or "(base)", []).append(s)
            return "; ".join(f"{g}: seeds {sorted(ss)}"
                             for g, ss in sorted(by_gen.items()))

        lines += [
            f"## Config {CONFIG_NAMES.get(cfg, cfg)}",
            "",
            f"reference seeds: {sorted(r)} | dibs-tpu seeds: {sorted(o)}",
            "",
            f"provenance — reference: {gen_note(r)} | dibs-tpu: "
            f"{gen_note(o)}. (`_r3` = r3g reruns at HEAD; `_r3e` = "
            "wide-plan kernel generation; cells with partial coverage "
            "print their own n.)",
            "",
            "| metric | reference DiBS | dibs-tpu DiBS |"
            " reference DiBS+ | dibs-tpu DiBS+ |",
            "|---|---|---|---|---|",
        ]
        rows = [("E-SHD", "eshd"), ("AUROC", "auroc"),
                (f"neg {'M' if cfg == 1 else ''}LL", ll_key)]
        # equivalence-class SHD (recorded by both harnesses from round 3
        # on; older result files simply lack the key and render as —)
        if any(_vals(s, est, "cpdag_eshd")
               for s in (r, o) for est in ("empirical", "mixture")):
            rows.insert(1, ("E-CPDAG-SHD", "cpdag_eshd"))
        def cell(runs, est, key, fmt):
            """Formatted stat; annotates n when a side's coverage is
            partial (ADVICE r3: the reference records cpdag_eshd only
            for the r3g seeds, so those cells are 5-seed, not 10)."""
            vals = _vals(runs, est, key)
            s = fmt(vals)
            if vals and len(vals) != len(runs):
                s += f" (n={len(vals)})"
            return s

        for label, key in rows:
            for stat, fmt in [("mean±sd", fmt_mean),
                              ("median [IQR]", fmt_median)]:
                lines.append(
                    f"| {label} ({stat}) "
                    f"| {cell(r, 'empirical', key, fmt)} "
                    f"| {cell(o, 'empirical', key, fmt)} "
                    f"| {cell(r, 'mixture', key, fmt)} "
                    f"| {cell(o, 'mixture', key, fmt)} |"
                )
        lines.append("")
        for est in ("empirical", "mixture"):
            all_notes += outlier_note(cfg, o, est, ll_key)
            all_notes += [n + " (reference side)"
                          for n in outlier_note(cfg, r, est, ll_key)]

    if all_notes:
        lines += ["## Outlier notes (values > 3x the seed-median)", ""]
        lines += [f"- {n}" for n in all_notes]
        lines.append("")

    # score_rb study (config 1): quality + wall time vs the default 'score'
    rb_files = sorted(glob.glob(os.path.join(RESULTS,
                                             "ours_cfg1_seed*_rb3.json")))
    if rb_files:
        lines += [
            "## score_rb study — config 1 with the Rao-Blackwellized "
            "estimator (beyond-reference)",
            "",
            "Same data/seeds/protocol as config 1 above; "
            "`grad_estimator_z='score_rb'` (per-node softmax weights).",
            "",
            "| seed | DiBS E-SHD | DiBS AUROC | DiBS+ E-SHD | DiBS+ AUROC |"
            " neg MLL (DiBS+) | wall s |",
            "|---|---|---|---|---|---|---|",
        ]
        for path in rb_files:
            with open(path) as f:
                r = json.load(f)
            lines.append(
                f"| {r['seed']} | {r['empirical']['eshd']:.1f} "
                f"| {r['empirical']['auroc']:.3f} "
                f"| {r['mixture']['eshd']:.1f} "
                f"| {r['mixture']['auroc']:.3f} "
                f"| {r['mixture'].get('neg_mll', float('nan')):.0f} "
                f"| {r.get('wall_s', 0):.0f} |"
            )
        lines.append("")

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

    out = os.path.join(HERE, "RESULTS_r3.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
