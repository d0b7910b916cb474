"""Round-3d consolidated TPU measurement at HEAD — ONE process.

Final authoritative numbers for the round after the centered-scoring
kernels (linear + nonlinear) and the transport-precision default flip:
all five BASELINE configs + rooflines into RESULTS_r3e.json, then the
on-device quality gate in the same process.
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
                             "RESULTS_r3e.json")
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
