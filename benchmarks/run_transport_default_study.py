"""Transport-precision 'default' promotion study — full protocol.

Round 4 left `'high'` (bf16x3) as the transport default because the
reduced 800-step protocol "does not stress the late clustered regime"
where the repulsion difference nearly cancels (benchmarks/RESULTS.md,
TRANSPORT_PREC_AB.json). This study closes exactly that evidence gap so
`'default'` (one bf16 MXU pass — the last itemized cfg5 transport lever,
phi family ~1.7x off floor) can be promoted or rejected on full-protocol
data:

  1. FULL d=20 protocol (2000 steps, P=30, the parity protocol of
     /root/reference/examples/dibs_joint.ipynb cells 4-10) at 10 seeds,
     arms paired on identical per-seed datasets and sampling keys — the
     2000-step run *ends* deep in the clustered regime the reduced
     protocol never reaches.
  2. d=128 / N=512 / P=100 quality (the large-feature clustered regime,
     32768-feature Z Gram rows — where one bf16 pass rounds hardest),
     2 seeds, paired.
  3. cfg5 steps/s, arms interleaved 2x in this same process.

Verdict rule (printed at the end): promote iff paired median quality at
'default' is within (AUROC -0.02, E-SHD +10%) of 'high' on BOTH
protocols. Writes benchmarks/TRANSPORT_DEFAULT_STUDY.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jax import random

import dibs_tpu.config as config
from dibs_tpu.inference import JointDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.models import LinearGaussian
from dibs_tpu.target import make_linear_gaussian_model

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "TRANSPORT_DEFAULT_STUDY.json")
ARMS = ("high", "default")
SEEDS_D20 = (0, 1, 2, 3, 4, 5, 6, 7, 8, 123)
SEEDS_D128 = (0, 1)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_quality(data, gm, lm, seed, steps, n_particles, **dibs_kw):
    dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                     **dibs_kw)
    gs, thetas = dibs.sample(key=random.PRNGKey(seed),
                             n_particles=n_particles, steps=steps)
    emp = dibs.get_empirical(gs, thetas)
    mix = dibs.get_mixture(gs, thetas)
    return {
        "seed": seed,
        "emp_auroc": float(threshold_metrics(dist=emp, g=data.g)["roc_auc"]),
        "emp_eshd": float(expected_shd(dist=emp, g=data.g)),
        "mix_auroc": float(threshold_metrics(dist=mix, g=data.g)["roc_auc"]),
        "mix_eshd": float(expected_shd(dist=mix, g=data.g)),
    }


def d20_protocol(out):
    """Full parity protocol: d=20 SF joint linear, 2000 steps, P=30."""
    for seed in SEEDS_D20:
        k1, _ = random.split(random.PRNGKey(seed))
        data, gm, lm = make_linear_gaussian_model(key=k1, n_vars=20,
                                                  graph_prior_str="sf")
        for arm in ARMS:
            config.set_transport_matmul_precision(arm)
            row = run_quality(data, gm, lm, seed, steps=2000, n_particles=30)
            out["d20"][arm].append(row)
            log(f"[d20 {arm} seed={seed}] emp_auroc={row['emp_auroc']:.3f} "
                f"emp_eshd={row['emp_eshd']:.1f} "
                f"mix_auroc={row['mix_auroc']:.3f} "
                f"mix_eshd={row['mix_eshd']:.1f}")
        save(out)


def d128_protocol(out):
    """Large-feature clustered regime: d=128, N=512, P=100, 1200 steps."""
    for seed in SEEDS_D128:
        kk = random.split(random.PRNGKey(1000 + seed), 4)
        lin = LinearGaussian(n_vars=128)
        from dibs_tpu.models import ErdosReniDAGDistribution
        gm = ErdosReniDAGDistribution(n_vars=128, n_edges_per_node=2)
        g_gt = gm.sample_G(kk[0])
        th_gt = lin.sample_parameters(key=kk[1], n_vars=128)
        x = lin.sample_obs(key=kk[2], n_samples=512, g=g_gt, theta=th_gt)

        class _D:  # duck-typed holder for run_quality's data.x / data.g
            pass

        data = _D()
        data.x, data.g = x, g_gt
        for arm in ARMS:
            config.set_transport_matmul_precision(arm)
            row = run_quality(data, gm, lin, seed, steps=1200,
                              n_particles=100, n_grad_mc_samples=32,
                              n_acyclicity_mc_samples=8)
            out["d128"][arm].append(row)
            log(f"[d128 {arm} seed={seed}] emp_auroc={row['emp_auroc']:.3f} "
                f"emp_eshd={row['emp_eshd']:.1f}")
        save(out)


def cfg5_throughput(out):
    from run_benchmarks import config_5

    for rep in range(2):
        for arm in ARMS:
            config.set_transport_matmul_precision(arm)
            r = config_5(False)
            out["cfg5"][arm].append(r["steps_per_sec"])
            log(f"[cfg5 rep{rep} {arm}] {r['steps_per_sec']:.2f} steps/s "
                f"(compile {r['compile_s']:.1f}s)")
            save(out)


def save(out):
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


def verdict(out):
    v = {}
    for proto in ("d20", "d128"):
        rows_h, rows_d = out[proto]["high"], out[proto]["default"]
        if not rows_h:
            continue
        for m in ("emp_auroc", "emp_eshd", "mix_auroc", "mix_eshd"):
            if m not in rows_h[0]:
                continue
            mh = statistics.median(r[m] for r in rows_h)
            md = statistics.median(r[m] for r in rows_d)
            v[f"{proto}.{m}"] = {"high": mh, "default": md}
            log(f"[verdict {proto}.{m}] high={mh:.3f} default={md:.3f}")
    ok = True
    for key, pair in v.items():
        if "auroc" in key:
            ok &= pair["default"] >= pair["high"] - 0.02
        else:
            ok &= pair["default"] <= pair["high"] * 1.10
    out["verdict"] = {"medians": v, "promote_default": bool(ok)}
    log(f"PROMOTE 'default': {ok}")
    save(out)


def main():
    out = {"d20": {a: [] for a in ARMS}, "d128": {a: [] for a in ARMS},
           "cfg5": {a: [] for a in ARMS}}
    try:
        cfg5_throughput(out)
        d20_protocol(out)
        d128_protocol(out)
    finally:
        config.set_transport_matmul_precision("high")
    verdict(out)
    log(f"DONE -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
