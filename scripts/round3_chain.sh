#!/bin/bash
# Round-3 serial TPU chain: finish the ViZDoom if-else table at the
# reference budget (full model two-stage 50k+50k, README.md:116-133), add
# baselines, then the doom_main (non-ifelse) table. Every stage is
# idempotent: the trainer auto-resumes (or exits immediately once its
# resume.json target is met), so relaunching this script after any crash
# continues where it left off. Stage budgets for baselines are trimmed vs
# the reference (documented in RESULTS.md) to fit the single-chip round.
set -x
cd /root/repo

# If the detached stage-1 process (pre-chain launch) is still running, wait.
if [ -f /tmp/doom_s1.pid ] && kill -0 "$(cat /tmp/doom_s1.pid)" 2>/dev/null; then
  echo "waiting for running stage-1 trainer $(cat /tmp/doom_s1.pid)"
  while kill -0 "$(cat /tmp/doom_s1.pid)" 2>/dev/null; do sleep 60; done
fi

DS=datasets/doom_ifelse_len2_seed123
COMMON="--dataset_type vizdoom --dataset_path $DS --num_k 25 --cell_impl pallas"
EV="python -m demo2program_tpu.cli.evaler_cli $COMMON --quiet --pred_program"

# --- if-else: full model, reference two-stage budget ---
python -m demo2program_tpu.cli.trainer_cli $COMMON --model full \
    --batch_size 32 --max_steps 50000 --lr_weight_decay \
    --train_dir train_dir/doom_ifelse_full_s1 --ckpt_save_step 5000 \
    --test_sample_step 2500 --log_step 100
python -m demo2program_tpu.cli.trainer_cli $COMMON --model full \
    --batch_size 8 --max_steps 50000 --lr_weight_decay \
    --checkpoint train_dir/doom_ifelse_full_s1/ckpt/50000/default \
    --train_dir train_dir/doom_ifelse_full_s2 --ckpt_save_step 5000 \
    --test_sample_step 2500 --log_step 100
$EV --model full --train_dir train_dir/doom_ifelse_full_s2 \
    --output_dir train_dir/doom_ifelse_full_s2/eval

# --- if-else: baselines (trimmed single-stage budgets) ---
python -m demo2program_tpu.cli.trainer_cli $COMMON \
    --model synthesis_baseline --batch_size 32 --max_steps 25000 \
    --lr_weight_decay --train_dir train_dir/doom_ifelse_synthesis \
    --ckpt_save_step 5000 --test_sample_step 2500 --log_step 100
$EV --model synthesis_baseline --train_dir train_dir/doom_ifelse_synthesis \
    --output_dir train_dir/doom_ifelse_synthesis/eval

python -m demo2program_tpu.cli.trainer_cli $COMMON \
    --model induction_baseline --batch_size 32 --max_steps 25000 \
    --lr_weight_decay --train_dir train_dir/doom_ifelse_induction \
    --ckpt_save_step 5000 --test_sample_step 2500 --log_step 100
$EV --model induction_baseline --train_dir train_dir/doom_ifelse_induction \
    --output_dir train_dir/doom_ifelse_induction/eval

# --- doom_main (non-ifelse, k=15 HBM regime) ---
DSM=datasets/doom_main
COMMONM="--dataset_type vizdoom --dataset_path $DSM --num_k 15 --cell_impl pallas"
EVM="python -m demo2program_tpu.cli.evaler_cli $COMMONM --quiet --pred_program"

python -m demo2program_tpu.cli.trainer_cli $COMMONM --model full \
    --batch_size 32 --max_steps 15000 --lr_weight_decay \
    --train_dir train_dir/doom_main_full_s1 --ckpt_save_step 2500 \
    --test_sample_step 2500 --log_step 100
python -m demo2program_tpu.cli.trainer_cli $COMMONM --model full \
    --batch_size 8 --max_steps 10000 --lr_weight_decay \
    --checkpoint train_dir/doom_main_full_s1/ckpt/15000/default \
    --train_dir train_dir/doom_main_full_s2 --ckpt_save_step 2500 \
    --test_sample_step 2500 --log_step 100
$EVM --model full --train_dir train_dir/doom_main_full_s2 \
    --output_dir train_dir/doom_main_full_s2/eval

python -m demo2program_tpu.cli.trainer_cli $COMMONM \
    --model synthesis_baseline --batch_size 32 --max_steps 15000 \
    --lr_weight_decay --train_dir train_dir/doom_main_synthesis \
    --ckpt_save_step 2500 --test_sample_step 2500 --log_step 100
$EVM --model synthesis_baseline --train_dir train_dir/doom_main_synthesis \
    --output_dir train_dir/doom_main_synthesis/eval

python -m demo2program_tpu.cli.trainer_cli $COMMONM \
    --model induction_baseline --batch_size 32 --max_steps 15000 \
    --lr_weight_decay --train_dir train_dir/doom_main_induction \
    --ckpt_save_step 2500 --test_sample_step 2500 --log_step 100
$EVM --model induction_baseline --train_dir train_dir/doom_main_induction \
    --output_dir train_dir/doom_main_induction/eval

echo "ROUND3 CHAIN DONE"
