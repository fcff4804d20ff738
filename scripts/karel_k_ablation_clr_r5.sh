#!/bin/bash
# Karel per-k ablation, CONSTANT-LR edition, round 5 — the reference's
# ACTUAL recipe (VERDICT r4 next #2): Adam at constant 1e-3
# (/root/reference/trainer.py:275 `lr_weight_decay` defaults False and the
# README training commands never pass it), trained LONG (100k steps) with
# VAL-split checkpoint selection, TEST split reported at the chosen
# checkpoint.
#
# Root-cause notes (full analysis in RESULTS.md "Per-k ablation root
# cause"): the r3 "degenerate start" that killed the first constant-LR
# attempt was a ~5-10k-step takeoff plateau judged from a single 20k
# snapshot — the constant-LR and decay optimizer paths are bit-identical
# for the first 10k steps (train/step.py:41-51). The r4 decay recipe
# instead freezes LR to 1.5e-5 by 60k (summarizer k=3 still climbing) and
# overfits synthesis k=3 to train loss 0.015 with val exec stuck ~0.44.
# The decay summarizer k=5 run NEVER took off at all (test exec 0.083
# after 60k steps), so takeoff is genuinely stochastic at small k: this
# suite therefore retries a combo ONCE with a fresh seed when its best
# val exec stays under the takeoff threshold — the last root-cause
# candidate the r4 verdict asked to check (seed retries).
#
# Idempotent: a combo whose final test eval log exists is skipped; a
# half-trained run auto-resumes from its latest checkpoint.
#
# r5 mid-round revision: the completed k=3 pair at 100k steps was STILL
# CLIMBING on val (synthesis 0.377@20k -> 0.493@100k; summarizer
# 0.410@40k -> 0.490@100k, +3.4pt/20k at the end) and its test numbers
# (0.509 / 0.516) still trail the published 0.585 / 0.606. The reference
# driver trains to a 1,000,000-step ceiling (/root/reference/trainer.py:153)
# so its per-k models saw far more optimization. Training here is ~1.5
# ms/step on the chunked HBM loop (100k steps ~= 2.5 min), so fresh combos
# (stage P2's k=5) now train straight to 300k with val evals at 9 points;
# the k=3 pair is extended to 300k by karel_k_ablation_ext300_r5.sh,
# invoked at the bottom when this script runs as stage P2.
set -x
cd /root/repo
DS=datasets/karel_25k
MAXS=${MAXS:-300000}
VAL_STEPS="20000 40000 60000 80000 100000 150000 200000 250000 300000"
TAKEOFF=0.30
KS=${KS:-"3 5"}   # k values to run; the r5 chain splits them around suite C

pick_best() {
  python - "$1" <<'EOF'
import re, sys
d = sys.argv[1]
best_step, best_acc = None, -1.0
for step in (20000, 40000, 60000, 80000, 100000,
             150000, 200000, 250000, 300000):
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
print(f"{best_step or 100000} {best_acc:.4f}")
EOF
}

run_combo() {  # $1=model $2=k $3=seed $4=train_dir -> sets BEST, BESTACC
  local M=$1 K=$2 SEED=$3 D=$4
  # watchdog: the tunnel intermittently wedges a client forever; training
  # resumes exactly on relaunch (r5 observed wedges, scripts/watchdog_run.py)
  python scripts/watchdog_run.py --stale 1500 --retries 3 \
      --watch "$D/metrics.jsonl" --watch "$D/samples.txt" -- \
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
      --model $M --num_k $K --max_steps $MAXS --seed $SEED \
      --train_dir $D --ckpt_save_step 5000 \
      --test_sample_step 1000 --log_step 100 \
      --cell_impl pallas
  # all val points in ONE process: the eval graph compiles once
  python scripts/watchdog_run.py --stale 1200 --retries 3 \
      --watch "$D/eval_val/out_*" -- \
    python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
      --dataset_type karel --quiet --pred_program \
      --model $M --num_k $K --train_dir $D \
      --dataset_split val --max_steps 64 \
      --output_dir $D/eval_val --cell_impl pallas \
      --sweep_steps "$(echo $VAL_STEPS | tr ' ' ',')"
  read -r BEST BESTACC <<< "$(pick_best "$D")"
}

# When running as stage K10 (right after doom phase F), first grab the
# val-selected doom full-model rows while the checkpoints are fresh —
# train loss hit 0.03 by step 3.3k on the 2500-program view, so the
# final checkpoint may sit well past the generalization peak and the
# chain's stage V (last) may not fit the round. Baselines skip (no ckpt
# dirs yet); the full stage-V rerun at the end is idempotent over this.
if [ "$KS" = "10" ]; then
  bash scripts/doom_k25_valsel_r5b.sh > /tmp/doom_valsel_early.log 2>&1 \
    || echo "early doom valsel FAILED (see /tmp/doom_valsel_early.log)"
fi

for K in $KS; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_clr5
    if grep -q "Final Avg Report" $D/eval/out_*_test.log \
           $D*/eval/out_*_test.log 2>/dev/null; then
      echo "combo $M k=$K already evaluated; skipping"
      continue
    fi
    run_combo $M $K 123 $D
    if python -c "import sys; sys.exit(0 if float('$BESTACC') < $TAKEOFF else 1)"; then
      echo "combo $M k=$K seed 123 never took off (best val $BESTACC);"
      echo "retrying once with seed 234"
      D=train_dir/karel25k_${M}_k${K}_clr5_s234
      run_combo $M $K 234 $D
    fi
    python scripts/watchdog_run.py --stale 1200 --retries 3 \
        --watch "$D/eval/out_*" -- \
      python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
        --dataset_type karel --quiet --pred_program \
        --model $M --num_k $K --checkpoint $D/ckpt/$BEST/default \
        --output_dir $D/eval --cell_impl pallas
  done
done
echo "K ABLATION CLR R5 DONE"

# When running as stage K10, also rescue the summarizer k=5 row (its
# seed-123 run crossed the takeoff threshold only at ~250k and landed
# mid-takeoff; scripts/summarizer_k5_fix.sh extends it to 500k + runs a
# fresh seed-234, best-val across both). Rides after the stage marker so
# a crash here can't void the k=10 harvest.
if [ "$KS" = "10" ]; then
  bash scripts/summarizer_k5_fix.sh > /tmp/summarizer_k5_fix.log 2>&1 \
    || echo "summarizer k5 fix FAILED (see /tmp/summarizer_k5_fix.log)"
fi

# When running as stage P2 (KS=5), also extend the already-accepted k=3
# pair from 100k to 300k — the chain script can't be edited while running,
# so the extension rides here, AFTER the stage marker so a crash in the
# extension can't void P2's harvest. The ext script harvests its own
# results into results/r5/karel_k_ablation_clr/.
if [ "$KS" = "5" ]; then
  KS=3 TARGET=300000 bash scripts/karel_k_ablation_ext300_r5.sh \
      > /tmp/karel_ablation_ext300_k3.log 2>&1 \
    || echo "k=3 ext300 FAILED (see /tmp/karel_ablation_ext300_k3.log)"
fi
