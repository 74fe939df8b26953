#!/bin/bash
# Round-5 chip queue #7: restart of the work lost when queue 5/6 died
# with the session (P17 was killed at tail iter 4k/10k; queue 6 never
# started).  Launched with setsid so it survives session restarts.
# Order = judge value: P17 flagship df32 recipe (VERDICT item 1),
# A1t AC long df32 tail (item 4), f64_10k_rsvs headline push (item 1),
# N8/N6 NS lambda-bias attacks (item 3), P15 seed matrix (item 5),
# then the remaining A/Bs.
cd /root/repo
set -x
timeout 3000 python experiments/tune_burgers.py P17 --seed=1234 > logs/p17.log 2>&1
echo "p17 rc=$?"
timeout 2700 python experiments/tune_allencahn.py A1t > logs/ac_a1t.log 2>&1
echo "a1t rc=$?"
timeout 3600 python experiments/df32_ab.py f64_10k_rsvs --stage1=headline > logs/df32_ab_headline3.log 2>&1
echo "ab_f64_rsvs rc=$?"
timeout 3600 python experiments/tune_navierstokes.py N8 > logs/ns_n8.log 2>&1
echo "n8 rc=$?"
timeout 5400 python experiments/tune_navierstokes.py N6 > logs/ns_n6.log 2>&1
echo "n6 rc=$?"
timeout 8000 python experiments/tune_burgers.py P15 --seed=1234 > logs/p15_seed1234.log 2>&1
echo "p15_1234 rc=$?"
timeout 8000 python experiments/tune_burgers.py P15 --seed=42 > logs/p15_seed42.log 2>&1
echo "p15_42 rc=$?"
timeout 3600 python experiments/df32_ab.py df32_20k_rsvs --stage1=headline > logs/df32_ab_headline2.log 2>&1
echo "ab_df32_20k rc=$?"
timeout 5400 python experiments/tune_navierstokes.py N7 > logs/ns_n7.log 2>&1
echo "n7 rc=$?"
echo QUEUE7_DONE
