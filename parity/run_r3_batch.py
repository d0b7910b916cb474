"""All remaining round-3 parity runs in ONE process.

The per-process TPU-tunnel acquisition on this host costs 2-20 minutes
(see .claude/skills/verify/SKILL.md), so the per-run shell loop of
run_r3_extension.sh pays an enormous tax across ~30 runs. This driver
calls the two runners' ``main()`` in-process with patched argv — one
acquisition for everything. Skips runs whose result JSON already exists
(same convention as the shell scripts).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DIBS_REF_DEVICE", "tpu")

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
DEV = os.environ["DIBS_REF_DEVICE"]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_one(mod, argv, out_path):
    if os.path.exists(out_path):
        log(f"skip (exists): {os.path.basename(out_path)}")
        return
    log(f"run: {' '.join(argv)}")
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
    log(f"done in {time.perf_counter()-t0:.0f}s")


def main():
    import parity.run_reference_quality as ref
    import parity.run_ours_quality as ours

    # remaining reference runs: cfg1 seeds 4-8 (if any missing), cfg3 4-8
    for cfg in (1, 3):
        for seed in (4, 5, 6, 7, 8):
            out = os.path.join(RESULTS, f"ref_cfg{cfg}_seed{seed}_{DEV}.json")
            run_one(ref, ["--config", str(cfg), "--seed", str(seed),
                          "--steps", "2000", "--quality-only"], out)

    # ours round-3 reruns: cfg1 + cfg3, all 10 seeds
    for cfg in (1, 3):
        for seed in (123, 0, 1, 2, 3, 4, 5, 6, 7, 8):
            data = os.path.join(RESULTS, f"data_cfg{cfg}_seed{seed}.npz")
            if not os.path.exists(data):
                log(f"skip (no data): cfg{cfg} seed{seed}")
                continue
            out = os.path.join(RESULTS, f"ours_cfg{cfg}_seed{seed}_r3.json")
            run_one(ours, ["--config", str(cfg), "--seed", str(seed),
                           "--steps", "2000", "--out-suffix", "_r3"], out)

    # score_rb study (cfg1, 5 seeds)
    for seed in (123, 0, 1, 2, 3):
        data = os.path.join(RESULTS, f"data_cfg1_seed{seed}.npz")
        if not os.path.exists(data):
            continue
        out = os.path.join(RESULTS, f"ours_cfg1_seed{seed}_rb3.json")
        run_one(ours, ["--config", "1", "--seed", str(seed),
                       "--steps", "2000", "--out-suffix", "_rb3",
                       "--grad-estimator-z", "score_rb"], out)

    log("R3 BATCH DONE")


if __name__ == "__main__":
    main()
