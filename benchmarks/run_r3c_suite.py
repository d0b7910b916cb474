"""Round-3c consolidated TPU re-measurement at HEAD — ONE process.

The r3 throughput table was measured before the hardware-numerics hardening
(commits 75a74f8/16a170c), whose split-3 scoring chain cost cfg3 ~29% and
cfg4 ~42%; the scale-gated precision class (fused_linear._FAST_LL_MAX)
restores the single-pass bf16 chain on standardized-scale data. This suite
re-runs all five BASELINE configs + rooflines at HEAD into RESULTS_r3c.json
and finishes with the on-device quality gate (which exercises both the
scale-1 fast chain and the 10x-scale split-3 chain).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import benchmarks.run_r3_suite as suite


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    suite.OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "RESULTS_r3c.json")
    suite.main()
    log("=== quality gate (same process) ===")
    import scripts.quality_gate as gate

    try:
        gate.main()  # raises SystemExit(1) on failure
        rc = 0
    except SystemExit as e:
        rc = int(e.code or 0)
    log(f"quality gate rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
