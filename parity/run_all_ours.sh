#!/bin/bash
# dibs-tpu side of the golden end-to-end comparison: same configs/seeds as
# run_all_reference.sh, on the data files the reference runs saved.
# Skips runs whose result JSON already exists.
cd /root/repo
for spec in "1 123" "2 123" "3 123" "4 123" \
            "1 0" "2 0" "3 0" "4 0" \
            "1 1" "2 1" "3 1" "4 1" \
            "1 2" "2 2" "3 2" "4 2" \
            "1 3" "2 3" "3 3" "4 3"; do
  set -- $spec
  cfg=$1; seed=$2
  out="parity/results/ours_cfg${cfg}_seed${seed}.json"
  data="parity/results/data_cfg${cfg}_seed${seed}.npz"
  if [ -f "$out" ]; then
    echo "=== ours config $cfg seed $seed already done, skipping ==="
    continue
  fi
  if [ ! -f "$data" ]; then
    echo "=== ours config $cfg seed $seed SKIPPED (no data file) ==="
    continue
  fi
  echo "=== ours config $cfg seed $seed start $(date) ==="
  python parity/run_ours_quality.py --config "$cfg" --seed "$seed" \
    --steps 2000 > "parity/logs/ours_cfg${cfg}_seed${seed}.log" 2>&1
  echo "=== ours config $cfg seed $seed done $(date) rc=$? ==="
done
echo "ALL OURS RUNS DONE"
