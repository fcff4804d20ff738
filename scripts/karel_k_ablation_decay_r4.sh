#!/bin/bash
# Karel per-k ablation, MAIN-TABLE RECIPE edition (round 4): train one
# model per (model, k) with the exact recipe that produced the main
# karel25k table (staircase LR decay x0.5/10k — reference trainer.py:82-91
# — 60k steps here so the schedule is fully played out), select the
# checkpoint among {20k,40k,60k} by VAL-split unseen execution accuracy,
# report the TEST split at the chosen checkpoint.
#
# Supersedes the round-3 constant-LR protocol (karel_k_ablation_clr2.sh):
# CLR at 1e-3 produced degenerate starts (summarizer k=3 val exec 0.016 at
# 20k) and plateaued ~10 points under the published per-k numbers; the
# main-table recipe is also the honest protocol match (the reference's
# per-k models were trained like its main models).
set -x
cd /root/repo
DS=datasets/karel_25k

for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_dk
    if grep -q "Final Avg Report" $D/eval/out_*_test.log 2>/dev/null; then
      echo "combo $M k=$K already evaluated; skipping"
      continue
    fi
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps 60000 --lr_weight_decay \
        --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 \
        --cell_impl pallas
    for STEP in 20000 40000 60000; do
      if grep -q "Final Avg Report" $D/eval_val/out_${STEP}_val.log \
          2>/dev/null; then
        continue
      fi
      python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
          --dataset_type karel --quiet --pred_program \
          --model $M --num_k $K --checkpoint $D/ckpt/$STEP/default \
          --dataset_split val --max_steps 64 \
          --output_dir $D/eval_val --cell_impl pallas
    done
    BEST=$(python - "$D" <<'EOF'
import re, sys
d = sys.argv[1]
best_step, best_acc = None, -1.0
for step in (20000, 40000, 60000):
    try:
        txt = open(f"{d}/eval_val/out_{step}_val.log").read()
    except OSError:
        continue
    ms = re.findall(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not ms:
        continue
    acc = float(ms[-1].split(",")[-2])  # last bucket = all-correct
    print(f"val unseen exec @{step}: {acc:.3f}", file=sys.stderr)
    if acc > best_acc:
        best_step, best_acc = step, acc
print(best_step or 60000)
EOF
)
    python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
        --dataset_type karel --quiet --pred_program \
        --model $M --num_k $K --checkpoint $D/ckpt/$BEST/default \
        --output_dir $D/eval --cell_impl pallas
  done
done
echo "K ABLATION DECAY R4 DONE"
