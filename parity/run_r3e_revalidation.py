"""Ours-side parity re-validation after the wide-group (1024-lane) plan.

The round-3 golden tables (RESULTS_r3.md) recorded dibs-tpu with the
pre-centering fused kernels. Centered scoring keeps the same math and
PRNG streams but different rounding, so the per-seed trajectories move;
this re-runs the ours side for every config whose hot path changed
(cfg2/cfg3/cfg4 — cfg1 is BGe, untouched) on the SAME reference-saved
data, 2000 steps, and prints per-config medians next to the recorded
round-3 ours medians for a direct drift check. One process, one tunnel
acquisition; results land as ours_cfg{N}_seed{S}_r3e.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

SEEDS = {2: (123, 0, 1, 2, 3),
         4: (123, 0, 1, 2, 3)}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_one(mod, argv, out_path):
    if os.path.exists(out_path):
        log(f"skip (exists): {os.path.basename(out_path)}")
        return
    t0 = time.perf_counter()
    sys.argv = ["runner"] + argv
    try:
        mod.main()
    except SystemExit as e:
        if e.code:
            log(f"FAILED rc={e.code}: {argv}")
            return
    except Exception as e:
        log(f"FAILED {e!r}: {argv}")
        return
    log(f"done in {time.perf_counter()-t0:.0f}s: {os.path.basename(out_path)}")


def median(v):
    import statistics

    return statistics.median(v)


def main():
    import parity.run_ours_quality as ours

    for cfg, seeds in SEEDS.items():
        for seed in seeds:
            data = os.path.join(RESULTS, f"data_cfg{cfg}_seed{seed}.npz")
            if not os.path.exists(data):
                log(f"skip (no data): cfg{cfg} seed{seed}")
                continue
            out = os.path.join(RESULTS, f"ours_cfg{cfg}_seed{seed}_r3e.json")
            run_one(ours, ["--config", str(cfg), "--seed", str(seed),
                           "--steps", "2000", "--out-suffix", "_r3e"], out)

    # drift summary: r3d medians vs the recorded round-3 ours rows
    for cfg, seeds in SEEDS.items():
        for suffix, label in (("_r3e", "centered"), ("", "recorded"),
                              ("_r3", "recorded-r3")):
            rows = []
            for seed in seeds:
                p = os.path.join(RESULTS,
                                 f"ours_cfg{cfg}_seed{seed}{suffix}.json")
                if os.path.exists(p):
                    with open(p) as f:
                        rows.append(json.load(f))
            if not rows:
                continue
            for est in ("empirical", "mixture"):
                sh = median([r[est]["eshd"] for r in rows])
                au = median([r[est]["auroc"] for r in rows])
                log(f"cfg{cfg} {label:12s} {est:9s} (n={len(rows)}): "
                    f"median E-SHD {sh:.1f}  AUROC {au:.3f}")
    log("REVALIDATION DONE")


if __name__ == "__main__":
    main()
