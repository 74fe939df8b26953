#!/bin/bash
# Round-5 chip queue #4: NS df32 long tail + N_u sweep, then the P15
# seed matrix (VERDICT items 3 and 5).  Chains after queue 3.
cd /root/repo
# Wait for queue 2 to finish...
while [ -f /tmp/tpu_queue.pid ] && kill -0 $(cat /tmp/tpu_queue.pid) 2>/dev/null; do
  sleep 60
done
# ...then for queue 3 to start (writes its pid) and finish.
for i in $(seq 1 30); do
  [ -f /tmp/tpu_queue3.pid ] && break
  sleep 10
done
while [ -f /tmp/tpu_queue3.pid ] && kill -0 $(cat /tmp/tpu_queue3.pid) 2>/dev/null; do
  sleep 60
done
echo $$ > /tmp/tpu_queue4.pid
set -x
timeout 4200 python experiments/tune_navierstokes.py N2 > logs/ns_n2.log 2>&1
echo "n2 rc=$?"
timeout 2400 python experiments/tune_navierstokes.py N4 N5 > logs/ns_sweep.log 2>&1
echo "sweep rc=$?"
timeout 8000 python experiments/tune_burgers.py P15 --seed=1234 > logs/p15_seed1234.log 2>&1
echo "p15_1234 rc=$?"
timeout 8000 python experiments/tune_burgers.py P15 --seed=42 > logs/p15_seed42.log 2>&1
echo "p15_42 rc=$?"
echo QUEUE4_DONE
