#!/bin/bash
# Round-5 chip queue #1: TPU test tier + df32 tail A/B (one TPU process at a time)
cd /root/repo
set -x
PINN_TPU_TESTS=1 timeout 1800 python -m pytest tests/ -m tpu -q > logs/tpu_tier_r5.log 2>&1
echo "tpu tier rc=$?"
timeout 9000 python experiments/df32_ab.py df32_10k hy_4k4k df32_n30 gradcheck > logs/df32_ab.log 2>&1
echo "df32_ab rc=$?"
