#!/bin/bash
# Sequential reference quality suite on CPU (single core). Logs per run.
cd /root/repo
for spec in "1 123" "2 123" "3 123" "4 123" "1 0" "1 1" "1 2" "1 3"; do
  set -- $spec
  cfg=$1; seed=$2
  echo "=== config $cfg seed $seed start $(date) ==="
  DIBS_REF_DEVICE=cpu python parity/run_reference_quality.py \
    --config "$cfg" --seed "$seed" --steps 2000 \
    > "parity/logs/ref_cfg${cfg}_seed${seed}.log" 2>&1
  echo "=== config $cfg seed $seed done $(date) rc=$? ==="
done
echo "ALL REFERENCE RUNS DONE"
