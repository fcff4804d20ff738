#!/bin/bash
# Suite C addendum: VAL-SELECTED checkpoint rows for doom_main k=25.
#
# The headline suite-C protocol evaluates the FINAL checkpoint (reference
# parity: its evaler loads the trained model as-is, README.md:138-141).
# But this round trains on a 2500-program view at constant LR 1e-3 —
# ~640 epochs for the bs=32 stages — so the final checkpoint may sit past
# the generalization peak. This addendum mirrors the per-k Karel
# protocol: evaluate every saved stage checkpoint on the 100-program VAL
# split, pick the best unseen-demo execution, then report the TEST split
# at that checkpoint (results land as *_valsel_test.log; the final-ckpt
# rows stay the headline).
#
# Run AFTER the round-5 chain is done (single-tenant chip).
set -x
cd /root/repo
DS=datasets/doom_main25_len8_seed123

pick_best() {  # $1=dir $2=space-separated candidate steps
  python - "$1" "$2" <<'EOF'
import re, sys
d, steps = sys.argv[1], [int(s) for s in sys.argv[2].split()]
best_step, best_acc = None, -1.0
for step in steps:
    try:
        txt = open(f"{d}/eval_val/out_{step}_val.log").read()
    except OSError:
        continue
    ms = re.findall(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not ms:
        continue
    acc = float(ms[-1].split(",")[-2])  # last bucket = all demos correct
    print(f"val unseen exec @{step}: {acc:.3f}", file=sys.stderr)
    if acc > best_acc:
        best_step, best_acc = step, acc
print(best_step or steps[-1])
EOF
}

valsel() {  # $1=model $2=train_dir $3=candidate steps
  local M=$1 D=$2 STEPS=$3 STEP BEST f
  [ -d "$D/ckpt" ] || { echo "no ckpts in $D; skipping"; return; }
  for STEP in $STEPS; do
    [ -d $D/ckpt/$STEP ] || continue
    grep -q "Final Avg Report" $D/eval_val/out_${STEP}_val.log \
        2>/dev/null && continue
    python -m demo2program_tpu.cli.evaler_cli \
        --dataset_type vizdoom --dataset_path $DS --num_k 25 \
        --cell_impl pallas --quiet --pred_program \
        --model $M --checkpoint $D/ckpt/$STEP/default \
        --dataset_split val --output_dir $D/eval_val
  done
  BEST=$(pick_best "$D" "$STEPS")
  if ! grep -q "Final Avg Report" $D/eval_valsel/out_${BEST}_test.log \
      2>/dev/null; then
    python -m demo2program_tpu.cli.evaler_cli \
        --dataset_type vizdoom --dataset_path $DS --num_k 25 \
        --cell_impl pallas --quiet --pred_program \
        --model $M --checkpoint $D/ckpt/$BEST/default \
        --output_dir $D/eval_valsel
  fi
  mkdir -p results/r5/doom_main_k25
  f=$(ls -t $D/eval_valsel/out_*_test.log 2>/dev/null | head -1)
  [ -n "$f" ] && cp "$f" \
      results/r5/doom_main_k25/$(basename $D)_valsel_test.log
  for v in $D/eval_val/out_*_val.log; do
    [ -e "$v" ] && cp "$v" \
        results/r5/doom_main_k25/$(basename $D)_$(basename "$v")
  done
  echo "VALSEL DONE $M $D best=$BEST"
}

valsel full train_dir/doom_main2k5_full_s2 \
    "55000 60000 65000 70000 75000 80000 85000 90000 95000 100000"
valsel synthesis_baseline train_dir/doom_main2k5_synthesis \
    "5000 10000 15000 20000 25000"
echo "DOOM K25 VALSEL DONE"
