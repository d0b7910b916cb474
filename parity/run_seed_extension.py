"""Parity seed-extension driver: one config, both sides, ONE process.

Replaces the near-identical run_r3g_cfg2.py / run_r3g_cfg4.py copies
(ADVICE r3): brings a config to a wider seed footing by running the
ACTUAL reference implementation (via the igraph shim, on the default
device) first — it generates and saves the data — then dibs-tpu
inferring on the identical data. Same skip-if-exists convention and
single-tunnel-acquisition rationale as run_r3_batch.py.

Usage:
    python parity/run_seed_extension.py --config 2 --seeds 4,5,6,7,8 \
        [--steps 2000] [--out-suffix _r3]
"""
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, required=True)
    ap.add_argument("--seeds", type=str, required=True,
                    help="comma-separated seed list, e.g. 4,5,6,7,8")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--out-suffix", type=str, default="_r3")
    args = ap.parse_args()
    cfg = args.config
    seeds = [int(s) for s in args.seeds.split(",")]

    import parity.run_reference_quality as ref
    import parity.run_ours_quality as ours

    for seed in seeds:
        out = os.path.join(RESULTS, f"ref_cfg{cfg}_seed{seed}_{DEV}.json")
        run_one(ref, ["--config", str(cfg), "--seed", str(seed),
                      "--steps", str(args.steps), "--quality-only"], out)

    for seed in seeds:
        data = os.path.join(RESULTS, f"data_cfg{cfg}_seed{seed}.npz")
        if not os.path.exists(data):
            log(f"skip (no data): cfg{cfg} seed{seed}")
            continue
        out = os.path.join(
            RESULTS, f"ours_cfg{cfg}_seed{seed}{args.out_suffix}.json")
        run_one(ours, ["--config", str(cfg), "--seed", str(seed),
                       "--steps", str(args.steps),
                       "--out-suffix", args.out_suffix], out)

    log(f"SEED-EXTENSION BATCH DONE (cfg {cfg}, seeds {seeds})")


if __name__ == "__main__":
    main()
