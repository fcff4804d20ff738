#!/bin/bash
# Suite C addendum, r5b budgets: VAL-SELECTED checkpoint rows for
# doom_main k=25 (see scripts/doom_k25_valsel_r5.sh for the rationale —
# the 2500-program regime is ~190 epochs even at the cut budgets, so the
# final checkpoint may sit past the generalization peak; headline rows
# stay final-ckpt, these land as *_valsel_test.log).
#
# Candidate steps match scripts/doom_main_k25_r5b.sh budgets: s1 trains
# 0->15k (ckpts 5k/10k/15k), s2 warm-starts at 15k and trains to 25k
# (ckpts 20k/25k), baselines 0->10k (ckpts 5k/10k). Steps are
# env-overridable for the extension path.
set -x
cd /root/repo
DS=datasets/doom_main25_len8_seed123
S1_STEPS=${S1_STEPS:-"5000 10000 15000"}
S2_STEPS=${S2_STEPS:-"20000 25000"}
B_STEPS=${B_STEPS:-"5000 10000"}

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
  local M=$1 D=$2 STEPS=$3 STEP BEST f v
  [ -d "$D/ckpt" ] || { echo "no ckpts in $D; skipping"; return; }
  # all candidate steps in one process: the eval graph compiles once
  # (--sweep_steps skips already-done logs + missing ckpts itself)
  python -m demo2program_tpu.cli.evaler_cli \
      --dataset_type vizdoom --dataset_path $DS --num_k 25 \
      --cell_impl pallas --quiet --pred_program \
      --model $M --train_dir $D \
      --dataset_split val --output_dir $D/eval_val \
      --sweep_steps "$(echo $STEPS | tr ' ' ',')"
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

# s2 first (the headline model), then s1 (did the bs=8 finetune help?),
# then baselines — same rationale as the suite: value lands in order.
valsel full train_dir/doom_main2k5_full_s2 "$S2_STEPS"
valsel full train_dir/doom_main2k5_full_s1 "$S1_STEPS"
valsel synthesis_baseline train_dir/doom_main2k5_synthesis "$B_STEPS"
valsel induction_baseline train_dir/doom_main2k5_induction "$B_STEPS"
echo "DOOM K25 VALSEL R5B DONE"
