#!/bin/bash
# Round-4 end-of-round watcher: the axon tunnel dropped at ~22:27 on the
# final build day (second bench run hit the 570 s watchdog; a bare
# jax.devices() probe hangs past 120 s). Probe every 2 min; when the tunnel
# returns, run the full default bench (headline + heavy-tail + chain train
# step + viewer-profile fps) so the chain-dispatch and viewer-profile wins
# land in a record artifact. Results -> studies/r4_measure/.
set -u
cd /root/repo
OUT=studies/r4_measure
MAX_WAIT_S=${MAX_WAIT_S:-21600}
t0=$(date +%s)
while true; do
  timeout 240 python -c "import jax; jax.devices()[0]" >/dev/null 2>&1 && break
  [ $(( $(date +%s) - t0 )) -gt "$MAX_WAIT_S" ] && { echo "gave up $(date)" >> $OUT/WATCH_STATUS; exit 1; }
  sleep 120
done
echo "tunnel up $(date)" >> $OUT/WATCH_STATUS
timeout 640 python bench.py > $OUT/bench_r4_record2.json 2> $OUT/bench_r4_record2.err
echo "record2 done $(date)" >> $OUT/WATCH_STATUS
# second pass: warm-cache repeat — the artifact the driver run will resemble
timeout 640 python bench.py > $OUT/bench_r4_record3.json 2> $OUT/bench_r4_record3.err
echo "ALL DONE $(date)" >> $OUT/WATCH_STATUS
