#!/bin/bash
# Round-5 chip queue #6: headline-basin A/B follow-ups. Both tails
# reuse the committed stage-1h checkpoint (logs/ab_stage1h_seed1234.npz)
# so each run is tail-only:
#   df32_20k_rsvs  does a 2x longer resampled+val-selected df32 tail
#                  keep digging past 4.7880e-4?
#   f64_10k_rsvs   do resample+val-select lift the emulated-f64 tail
#                  past the 4.2566e-4 fixed-draw headline?
cd /root/repo
for i in $(seq 1 120); do [ -f /tmp/tpu_queue5.pid ] && break; sleep 30; done
while [ -f /tmp/tpu_queue5.pid ] && kill -0 $(cat /tmp/tpu_queue5.pid) 2>/dev/null; do
  sleep 60
done
echo $$ > /tmp/tpu_queue6.pid
set -x
timeout 3600 python experiments/df32_ab.py df32_20k_rsvs --stage1=headline > logs/df32_ab_headline2.log 2>&1
echo "ab_df32_20k rc=$?"
timeout 3600 python experiments/df32_ab.py f64_10k_rsvs --stage1=headline > logs/df32_ab_headline3.log 2>&1
echo "ab_f64_rsvs rc=$?"
echo QUEUE6_DONE
