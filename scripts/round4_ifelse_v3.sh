#!/bin/bash
# Round-4 doom if-else v3-silhouette intervention (VERDICT r3 next #6):
# regenerate the if-else dataset at the reference protocol (10k/1k/100
# programs, 25+5 demos, len<=2 — r3's doom_ifelse_len2_seed123 recipe)
# with sprite_style=v3 (species-unique silhouettes on top of the v2
# palette), then train the full model at the reference two-stage budget
# and evaluate greedy + beam-5 execution rerank + the error-class
# breakdown. The v2 control at this exact protocol is round 3's measured
# 0.641 greedy / 0.929 rerank (RESULTS.md).
# Stage 1 (CPU gen) forks as soon as the doom_main shard gen is done;
# stage 2 (TPU) waits for round4_chain.sh to finish so the chip is free.
# Launch detached:
#   setsid nohup bash scripts/round4_ifelse_v3.sh \
#       > /tmp/r4_ifelse.log 2>&1 < /dev/null &
set -x
if [ -f /tmp/r4_ifelse.pid ] && kill -0 "$(cat /tmp/r4_ifelse.pid)" \
    2>/dev/null && [ "$(cat /tmp/r4_ifelse.pid)" != "$$" ]; then
  echo "another round4_ifelse_v3.sh is live"; exit 1
fi
echo $$ > /tmp/r4_ifelse.pid
cd /root/repo
DS=datasets/doom_ifelse3_len2_seed123

# ---- stage 1: wait for the doom_main shard gen, then regen if-else v3 ----
until grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r4.log 2>/dev/null; do
  sleep 60
done
if ! { [ -f $DS/id.txt ] && [ "$(wc -l < $DS/id.txt)" -eq 11100 ]; }; then
  rm -rf $DS
  nice -n 19 python -m demo2program_tpu.cli.vizdoom_generator_cli \
    --dir_name doom_ifelse3 --ifelse --seed 123 \
    --num_train 10000 --num_test 1000 --num_val 100 \
    --num_demo_per_program 25 --num_test_demo_per_program 5 \
    --max_demo_length 2 --perception_type simple --sprite_style v3 \
    > /tmp/ifelse3_gen.log 2>&1
fi
[ -f $DS/id.txt ] || { echo "ifelse v3 gen failed"; exit 1; }
echo "IFELSE3 DATASET READY"

# ---- stage 2: wait for the main TPU chain, then train + eval ----
until grep -q "ROUND4 CHAIN DONE" /tmp/r4_chain.log 2>/dev/null; do
  sleep 60
done
python scripts/doom_stage_runner.py \
    --dataset_path $DS --num_k 25 \
    --stage model=full,bs=32,steps=50000,dir=train_dir/ifelse3_full_s1,eval=0 \
    --stage model=full,bs=8,steps=50000,dir=train_dir/ifelse3_full_s2,warm=train_dir/ifelse3_full_s1/ckpt/50000/default

python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path $DS --num_k 25 \
    --cell_impl pallas --model full --train_dir train_dir/ifelse3_full_s2 \
    --output_dir train_dir/ifelse3_full_s2/eval_rerank \
    --pred_program --quiet --unroll_type beam --beam_width 5 \
    --execution_rerank

JAX_PLATFORMS=cpu python -m demo2program_tpu.tools.doom_error_analysis \
    --dump "$(ls train_dir/ifelse3_full_s2/eval/out_*_test.txt | head -1)" \
    > /tmp/ifelse3_error_analysis.log 2>&1 || true

mkdir -p results/r4/doom_ifelse_v3
cp train_dir/ifelse3_full_s2/eval/out_*_test.log \
   results/r4/doom_ifelse_v3/full_greedy.log 2>/dev/null
cp train_dir/ifelse3_full_s2/eval_rerank/out_*_test.log \
   results/r4/doom_ifelse_v3/full_beam5_rerank.log 2>/dev/null
cp /tmp/ifelse3_error_analysis.log results/r4/doom_ifelse_v3/ 2>/dev/null
echo "ROUND4 IFELSE V3 DONE"
