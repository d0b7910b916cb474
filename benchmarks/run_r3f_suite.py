"""Round-3f consolidated TPU measurement at HEAD — ONE process.

Re-measurement after the 2048-lane wide-group plan for the fused linear
kernel (commit 4c596b0) — the r3e table was taken at the 1024-lane plan,
so the headline numbers for cfg2/cfg4 predate the current plan. All five
BASELINE configs + rooflines into RESULTS_r3f.json, then the on-device
quality gate in the same process.
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
                             "RESULTS_r3f.json")
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
