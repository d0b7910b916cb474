"""On-device proof of the golden regression gate (VERDICT r3 item 5).

One process (tunnel admits one client):
  1. record the golden medians at HEAD (--record-golden);
  2. run the clean gate — must PASS;
  3. run each injected regression — the gate must FAIL on the golden
     comparison (the collapse floors alone may or may not catch it; the
     point is the golden layer does).

Prints a PROOF summary line per stage; exit 0 iff the proof holds.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import quality_gate as qg


def run(argv):
    qg.FAILURES.clear()
    code = 0
    try:
        qg.main(argv)
    except SystemExit as e:
        code = int(e.code or 0)
    return code, list(qg.FAILURES)


def main():
    proof_ok = True

    print("=== stage 1: record golden ===", flush=True)
    code, _ = run(["--record-golden"])
    assert code == 0

    print("=== stage 2: clean gate (expect PASS) ===", flush=True)
    code, fails = run([])
    print(f"PROOF clean: exit={code} failures={len(fails)}", flush=True)
    proof_ok &= code == 0

    for mode in ("kernel-bandwidth", "mc-starve"):
        print(f"=== stage 3: inject {mode} (expect FAIL) ===", flush=True)
        code, fails = run(["--inject", mode, "--skip-canaries"])
        golden_fails = [f for f in fails if f[0].startswith("golden/")]
        print(f"PROOF {mode}: exit={code} golden_failures="
              f"{[f[0] for f in golden_fails]}", flush=True)
        proof_ok &= code != 0 and len(golden_fails) > 0

    print(f"PROOF {'HOLDS' if proof_ok else 'BROKEN'}", flush=True)
    raise SystemExit(0 if proof_ok else 1)


if __name__ == "__main__":
    main()
