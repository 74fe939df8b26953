#!/bin/bash
# Round-5 chip queue #2: green TPU tier, bf16-basin df32 A/B, gradcheck,
# n30 redo (killed by session restart), S3, D1d/D2d.
# ONE TPU process at a time (CLAUDE.md); chained with timeouts.
cd /root/repo
set -x
PINN_TPU_TESTS=1 timeout 1800 python -m pytest tests/ -m tpu -q > logs/tpu_tier_r5b.log 2>&1
echo "tpu tier rc=$?"
timeout 4500 python experiments/df32_ab.py df32_4k df32_10k --bf16 > logs/df32_ab_bf16.log 2>&1
echo "ab_bf16 rc=$?"
timeout 1500 python experiments/df32_ab.py gradcheck > logs/df32_gradcheck.log 2>&1
echo "gradcheck rc=$?"
timeout 3600 python experiments/df32_ab.py df32_n30 > logs/df32_n30.log 2>&1
echo "n30 rc=$?"
timeout 4000 python experiments/tune_schrodinger.py S3 > logs/s3_df32.log 2>&1
echo "s3 rc=$?"
timeout 3000 python experiments/tune_disc.py D1d D2d > logs/disc_df32.log 2>&1
echo "disc rc=$?"
echo QUEUE2_DONE
