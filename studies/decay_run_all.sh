#!/bin/bash
cd /root/repo
for cfg in "v16 16 1500" "v48 48 1500" "v16_noreset 16 0"; do
  set -- $cfg
  JAX_PLATFORMS=cpu python scripts/schedule_run.py --iters 3500 --views $2 \
    --res 96 64 --reset_interval $3 --initial_capacity 2048 \
    --dup_capacity 131072 --max_per_tile 1024 \
    --out /tmp/decay_study/$1.json > /tmp/decay_study/$1.log 2>&1
done
echo ALL_DONE > /tmp/decay_study/DONE
