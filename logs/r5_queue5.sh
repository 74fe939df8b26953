#!/bin/bash
# Round-5 chip queue #5 (reprioritized remainder of queue 4): the
# N_u sweep (VERDICT item 3's table), then the highest-value probes —
# P17 flagship df32 recipe (item 1), AC long df32 tail (item 4), NS
# capacity probes N6/N7 (item 3) — ahead of the P15 seed matrix
# (item 5), which runs from queue 6 if round time remains.
cd /root/repo
# Wait for queue 4's N2 job (pid 6146) and its wrapper (27271, exits
# on its pending SIGTERM as soon as N2 returns).
while kill -0 6146 2>/dev/null || kill -0 27271 2>/dev/null; do
  sleep 30
done
echo $$ > /tmp/tpu_queue5.pid
set -x
timeout 2400 python experiments/tune_navierstokes.py N4 N5 > logs/ns_sweep.log 2>&1
echo "sweep rc=$?"
timeout 3000 python experiments/tune_burgers.py P17 --seed=1234 > logs/p17.log 2>&1
echo "p17 rc=$?"
timeout 2700 python experiments/tune_allencahn.py A1t > logs/ac_a1t.log 2>&1
echo "a1t rc=$?"
timeout 4800 python experiments/tune_navierstokes.py N6 > logs/ns_n6.log 2>&1
echo "n6 rc=$?"
timeout 4800 python experiments/tune_navierstokes.py N7 > logs/ns_n7.log 2>&1
echo "n7 rc=$?"
echo QUEUE5_DONE
