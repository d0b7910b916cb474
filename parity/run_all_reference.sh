#!/bin/bash
# Sequential reference quality suite. Default device: TPU (axon) — the
# reference is pure JAX so quality metrics can be produced on-device fast;
# CPU throughput is measured separately (see parity/time_reference_cpu.sh).
# Logs per run; skips runs whose result JSON already exists.
cd /root/repo
DEV=${DIBS_REF_DEVICE:-tpu}
for spec in "1 123" "2 123" "3 123" "4 123" \
            "1 0" "2 0" "3 0" "4 0" \
            "1 1" "2 1" "3 1" "4 1" \
            "1 2" "2 2" "3 2" "4 2" \
            "1 3" "2 3" "3 3" "4 3"; do
  set -- $spec
  cfg=$1; seed=$2
  suffix=""
  [ "$DEV" != "cpu" ] && suffix="_${DEV}"
  out="parity/results/ref_cfg${cfg}_seed${seed}${suffix}.json"
  if [ -f "$out" ]; then
    echo "=== config $cfg seed $seed already done, skipping ==="
    continue
  fi
  echo "=== config $cfg seed $seed start $(date) ==="
  DIBS_REF_DEVICE=$DEV python parity/run_reference_quality.py \
    --config "$cfg" --seed "$seed" --steps 2000 --quality-only \
    > "parity/logs/ref_cfg${cfg}_seed${seed}${suffix}.log" 2>&1
  echo "=== config $cfg seed $seed done $(date) rc=$? ==="
done
echo "ALL REFERENCE RUNS DONE"
