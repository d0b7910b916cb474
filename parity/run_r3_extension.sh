#!/bin/bash
# Round-3 parity hardening (VERDICT r2 item 5):
#  - extend configs 1 and 3 to 10 seeds (adds seeds 4..8)
#  - re-run the ours side for ALL cfg1/cfg3 seeds with the round-3 engine
#    (r3 results go to ours_cfg*_seed*_r3.json; r2 files stay for history)
# Strictly sequential — one TPU process at a time (worker-crash gotcha).
cd /root/repo
DEV=${DIBS_REF_DEVICE:-tpu}
NEW_SEEDS="4 5 6 7 8"
ALL_SEEDS="123 0 1 2 3 4 5 6 7 8"

for cfg in 1 3; do
  for seed in $NEW_SEEDS; do
    out="parity/results/ref_cfg${cfg}_seed${seed}_${DEV}.json"
    if [ -f "$out" ]; then
      echo "=== ref cfg $cfg seed $seed already done ==="
      continue
    fi
    echo "=== ref cfg $cfg seed $seed start $(date) ==="
    DIBS_REF_DEVICE=$DEV python parity/run_reference_quality.py \
      --config "$cfg" --seed "$seed" --steps 2000 --quality-only \
      > "parity/logs/ref_cfg${cfg}_seed${seed}_${DEV}.log" 2>&1
    echo "=== ref cfg $cfg seed $seed done $(date) rc=$? ==="
  done
done

for cfg in 1 3; do
  for seed in $ALL_SEEDS; do
    out="parity/results/ours_cfg${cfg}_seed${seed}_r3.json"
    data="parity/results/data_cfg${cfg}_seed${seed}.npz"
    if [ -f "$out" ]; then
      echo "=== ours-r3 cfg $cfg seed $seed already done ==="
      continue
    fi
    if [ ! -f "$data" ]; then
      echo "=== ours-r3 cfg $cfg seed $seed SKIPPED (no data) ==="
      continue
    fi
    echo "=== ours-r3 cfg $cfg seed $seed start $(date) ==="
    python parity/run_ours_quality.py --config "$cfg" --seed "$seed" \
      --steps 2000 --out-suffix _r3 \
      > "parity/logs/ours_cfg${cfg}_seed${seed}_r3.log" 2>&1
    echo "=== ours-r3 cfg $cfg seed $seed done $(date) rc=$? ==="
  done
done
# score_rb study (VERDICT r2 item 3a): config 1 with the Rao-Blackwellized
# estimator over the same seeds — quality + wall time vs 'score'
for seed in 123 0 1 2 3; do
  out="parity/results/ours_cfg1_seed${seed}_rb3.json"
  data="parity/results/data_cfg1_seed${seed}.npz"
  [ -f "$out" ] && { echo "=== rb cfg 1 seed $seed already done ==="; continue; }
  [ ! -f "$data" ] && continue
  echo "=== rb cfg 1 seed $seed start $(date) ==="
  python parity/run_ours_quality.py --config 1 --seed "$seed" \
    --steps 2000 --out-suffix _rb3 --grad-estimator-z score_rb \
    > "parity/logs/ours_cfg1_seed${seed}_rb3.log" 2>&1
  echo "=== rb cfg 1 seed $seed done $(date) rc=$? ==="
done
echo "R3 PARITY EXTENSION DONE"
