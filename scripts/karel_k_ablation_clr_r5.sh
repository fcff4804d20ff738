#!/bin/bash
# Karel per-k ablation, CONSTANT-LR edition, round 5 — the reference's
# ACTUAL recipe (VERDICT r4 next #2): Adam at constant 1e-3
# (/root/reference/trainer.py:275 `lr_weight_decay` defaults False and the
# README training commands never pass it), trained LONG (100k steps) with
# VAL-split checkpoint selection, TEST split reported at the chosen
# checkpoint.
#
# Root-cause note on the r3 "degenerate starts" that killed the first
# constant-LR attempt (commit 1c6f7c2): the r4 staircase-decay runs show
# the SAME low point at 20k (summarizer k=3 val exec 0.106 @20k ->
# 0.507 @40k -> 0.534 @60k) — the optimizer paths of the two recipes are
# bit-identical for the first 10k steps (schedule is the only difference,
# train/step.py:41-51), so the r3 20k snapshot was a slow TAKEOFF
# mistaken for divergence, not a divergence. Meanwhile the decay recipe
# freezes the model by 40-60k (LR 1e-3*0.5^(step//10k) = 1.5e-5 at 60k),
# which is why the r4 per-k numbers plateaued under the published table.
# This suite keeps LR at 1e-3 throughout and trains past the takeoff.
# The val curve at {20k,40k,60k,80k,100k} is kept as the diagnosis
# artifact.
#
# Idempotent: a combo whose final test eval log exists is skipped; a
# half-trained combo auto-resumes from its latest checkpoint.
set -x
cd /root/repo
DS=datasets/karel_25k

for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_clr5
    if grep -q "Final Avg Report" $D/eval/out_*_test.log 2>/dev/null; then
      echo "combo $M k=$K already evaluated; skipping"
      continue
    fi
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps 100000 \
        --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 \
        --cell_impl pallas
    for STEP in 20000 40000 60000 80000 100000; do
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
for step in (20000, 40000, 60000, 80000, 100000):
    try:
        txt = open(f"{d}/eval_val/out_{step}_val.log").read()
    except OSError:
        continue
    # the LAST match is the [Final Avg Report] over all eval batches
    ms = re.findall(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not ms:
        continue
    acc = float(ms[-1].split(",")[-2])  # last bucket = all demos correct
    print(f"val unseen exec @{step}: {acc:.3f}", file=sys.stderr)
    if acc > best_acc:
        best_step, best_acc = step, acc
print(best_step or 100000)
EOF
)
    python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
        --dataset_type karel --quiet --pred_program \
        --model $M --num_k $K --checkpoint $D/ckpt/$BEST/default \
        --output_dir $D/eval --cell_impl pallas
  done
done
echo "K ABLATION CLR R5 DONE"
