"""Round-3g parity extension: config 4 seeds 4-8, both sides, ONE process.

Config 4 (joint LinearGaussian + interventional, d=30 SF, P=20) had 5
seeds while configs
1 and 3 were extended to 10 in round 3 (VERDICT r2 item 5). This driver
brings config 4 to the same 10-seed footing: the ACTUAL reference
implementation (via the igraph shim, on the default device) generates
the data and runs first, then dibs-tpu infers on the identical data.
Same skip-if-exists convention and single-tunnel-acquisition rationale
as run_r3_batch.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DIBS_REF_DEVICE", "tpu")

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
DEV = os.environ["DIBS_REF_DEVICE"]

SEEDS = (4, 5, 6, 7, 8)


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

    for seed in SEEDS:
        out = os.path.join(RESULTS, f"ref_cfg4_seed{seed}_{DEV}.json")
        run_one(ref, ["--config", "4", "--seed", str(seed),
                      "--steps", "2000", "--quality-only"], out)

    for seed in SEEDS:
        data = os.path.join(RESULTS, f"data_cfg4_seed{seed}.npz")
        if not os.path.exists(data):
            log(f"skip (no data): cfg4 seed{seed}")
            continue
        out = os.path.join(RESULTS, f"ours_cfg4_seed{seed}_r3.json")
        run_one(ours, ["--config", "4", "--seed", str(seed),
                       "--steps", "2000", "--out-suffix", "_r3"], out)

    log("R3G CFG4 BATCH DONE")


if __name__ == "__main__":
    main()
