"""Summarizes the score_rb study files (parity/results/ours_cfg1_seed*_rb3*.json)
into the 10-seed + M-sweep table for parity/RESULTS_r3.md and README.

Usage: python parity/summarize_score_rb.py
"""
import glob
import json
import os
import statistics as st

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")

GROUPS = (("M=128", "_rb3"), ("M=64", "_rb3m64"), ("M=32", "_rb3m32"))


def fmt(vals):
    if not vals:
        return "—"
    med = st.median(vals)
    mean = st.mean(vals)
    sd = st.pstdev(vals) if len(vals) > 1 else 0.0
    return f"{mean:.2f} ± {sd:.2f} (med {med:.2f})"


def main():
    print("| arm | n | DiBS E-SHD | DiBS AUROC | DiBS+ E-SHD | "
          "DiBS+ AUROC | DiBS+ neg MLL |")
    print("|---|---|---|---|---|---|---|")
    for label, suffix in GROUPS:
        rows = []
        for path in sorted(glob.glob(os.path.join(
                RESULTS_DIR, f"ours_cfg1_seed*{suffix}.json"))):
            # anchor: _rb3 must not match _rb3m64/_rb3m32 files
            base = os.path.basename(path)
            if not base.endswith(f"{suffix}.json"):
                continue
            if suffix == "_rb3" and ("m64" in base or "m32" in base):
                continue
            with open(path) as f:
                rows.append(json.load(f))
        cells = [
            fmt([r["empirical"]["eshd"] for r in rows]),
            fmt([r["empirical"]["auroc"] for r in rows]),
            fmt([r["mixture"]["eshd"] for r in rows]),
            fmt([r["mixture"]["auroc"] for r in rows]),
            fmt([r["mixture"]["neg_mll"] for r in rows]),
        ]
        print(f"| score_rb {label} | {len(rows)} | " + " | ".join(cells)
              + " |")


if __name__ == "__main__":
    main()
