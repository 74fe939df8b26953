#!/bin/bash
# Round-5 chip queue #3: headline-basin df32 tails (resample/val-select),
# Allen-Cahn fast recipe, NS df32 tail swap.  Waits for queue 2's pid.
cd /root/repo
while [ -f /tmp/tpu_queue.pid ] && kill -0 $(cat /tmp/tpu_queue.pid) 2>/dev/null; do
  sleep 60
done
echo $$ > /tmp/tpu_queue3.pid
set -x
timeout 5400 python experiments/df32_ab.py df32_10k_rsvs df32_10k_rs df32_10k_vs --stage1=headline > logs/df32_ab_headline.log 2>&1
echo "headline rc=$?"
timeout 3600 python experiments/tune_allencahn.py A1 > logs/ac_probe.log 2>&1
echo "ac rc=$?"
timeout 4500 python experiments/tune_navierstokes.py N1 > logs/ns_df32.log 2>&1
echo "ns1 rc=$?"
echo QUEUE3_DONE
