#!/bin/bash
# Round-5 master chain, edition C — takes over from round5_chain_b.sh,
# which was killed mid-stage-C: its doom suite carried the original
# 50k+50k+25k+25k budgets (~14 h of chip at the measured 0.43 s/step),
# unfinishable in the remaining round-5 window, and it only harvested on
# FULL suite completion — a third consecutive round with zero doom-k25
# numbers. This chain orders bounded stages first and harvests
# incrementally:
#   P2' - wait for the in-flight interleaved per-k k=5 + k=3-ext300 suite
#         (scripts/run_p2_interleaved.sh) to finish and release the chip
#   S   - karel25k synthesis seed-234 + val-selected ckpt   (~20 min)
#   F   - doom_main k=25 full model s1->eval->s2->eval->rerank (time-boxed
#         budgets, scripts/doom_main_k25_r5b.sh PHASE=F)      (~3.5 h)
#   K10 - per-k CLR suite at k=10, completes the 3/5/10 table (~1.2 h)
#   B   - doom_main k=25 baselines (synthesis, induction)     (~2.5 h)
#   V   - doom val-selected checkpoint rows (r5b budgets)     (~1 h)
# Markers: /tmp/r5_stage_{S,F,K10,B,V}.done. Launch detached:
#   setsid nohup bash scripts/round5_chain_c.sh \
#       > /tmp/r5_chainc.log 2>&1 < /dev/null &
set -x
if ! mkdir /tmp/r5_chainc.lock 2>/dev/null; then
  pid=$(cat /tmp/r5_chainc.lock/pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
      && grep -q round5_chain_c "/proc/$pid/cmdline" 2>/dev/null; then
    echo "another round5 chain C is live (pid $pid)"; exit 1
  fi
fi
mkdir -p /tmp/r5_chainc.lock
echo $$ > /tmp/r5_chainc.lock/pid
cd /root/repo

newest() { ls -t $1 2>/dev/null | head -1; }

# ---- wait for the interleaved P2 suite to finish with the chip ----
until grep -q "P2 INTERLEAVE DONE\|P2 INTERLEAVE FAILED" /tmp/r5_p2il.log \
      2>/dev/null; do
  sleep 60
done
rm -f /tmp/tpu_pause   # belt-and-braces: the interleave's release already ran

# ---- stage S: karel25k synthesis, seed 234 + val-selected checkpoint ----
# (identical protocol to the r4 seed-123 row: 30k steps, staircase decay,
# so the comparison against published 0.641 and r4's 0.637 is seed-only)
D=train_dir/karel25k_synthesis_s234
if [ ! -f /tmp/r5_stage_S.done ]; then
  if ! grep -q "Final Avg Report" $D/eval/out_*_test.log 2>/dev/null; then
    python -m demo2program_tpu.cli.trainer_cli \
        --dataset_path datasets/karel_25k \
        --model synthesis_baseline --num_k 10 --max_steps 30000 \
        --lr_weight_decay --seed 234 --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 --cell_impl pallas \
        > /tmp/karel_synth_s234.log 2>&1
    for STEP in 20000 25000 30000; do
      grep -q "Final Avg Report" $D/eval_val/out_${STEP}_val.log 2>/dev/null \
        && continue
      python -m demo2program_tpu.cli.evaler_cli \
          --dataset_path datasets/karel_25k --dataset_type karel --quiet \
          --pred_program --model synthesis_baseline --num_k 10 \
          --checkpoint $D/ckpt/$STEP/default --dataset_split val \
          --max_steps 64 --output_dir $D/eval_val --cell_impl pallas \
          >> /tmp/karel_synth_s234.log 2>&1
    done
    BEST=$(python - "$D" <<'EOF'
import re, sys
d = sys.argv[1]
best_step, best_acc = None, -1.0
for step in (20000, 25000, 30000):
    try:
        txt = open(f"{d}/eval_val/out_{step}_val.log").read()
    except OSError:
        continue
    ms = re.findall(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not ms:
        continue
    acc = float(ms[-1].split(",")[-2])
    if acc > best_acc:
        best_step, best_acc = step, acc
print(best_step or 30000)
EOF
)
    python -m demo2program_tpu.cli.evaler_cli \
        --dataset_path datasets/karel_25k --dataset_type karel --quiet \
        --pred_program --model synthesis_baseline --num_k 10 \
        --checkpoint $D/ckpt/$BEST/default --output_dir $D/eval \
        --cell_impl pallas >> /tmp/karel_synth_s234.log 2>&1
  fi
  if grep -q "Final Avg Report" $D/eval/out_*_test.log 2>/dev/null; then
    mkdir -p results/r5/karel25k_synthesis_s234
    f=$(newest "$D/eval/out_*_test.log")
    cp "$f" results/r5/karel25k_synthesis_s234/
    for v in $D/eval_val/out_*_val.log; do
      [ -e "$v" ] && cp "$v" results/r5/karel25k_synthesis_s234/
    done
    touch /tmp/r5_stage_S.done
  else
    echo "stage S FAILED; continuing"
  fi
fi

# ---- stage F: doom_main k=25 full model (headline) ----
if [ ! -f /tmp/r5_stage_F.done ]; then
  PHASE=F bash scripts/doom_main_k25_r5b.sh > /tmp/doom_k25_r5b_F.log 2>&1
  if grep -q "DOOM R5B PHASE F DONE" /tmp/doom_k25_r5b_F.log; then
    touch /tmp/r5_stage_F.done
  else
    echo "stage F FAILED; continuing"
  fi
fi

# ---- stage K10: per-k CLR at k=10 (300k steps, val-selected) ----
if [ ! -f /tmp/r5_stage_K10.done ]; then
  KS=10 bash scripts/karel_k_ablation_clr_r5.sh \
      > /tmp/karel_ablation_clr5_k10.log 2>&1
  if grep -q "K ABLATION CLR R5 DONE" /tmp/karel_ablation_clr5_k10.log; then
    mkdir -p results/r5/karel_k_ablation_clr
    for M in synthesis_baseline summarizer; do
      for D in train_dir/karel25k_${M}_k10_clr5 \
               train_dir/karel25k_${M}_k10_clr5_s234; do
        [ -d "$D" ] || continue
        f=$(newest "$D/eval/out_*_test.log")
        [ -n "$f" ] && cp "$f" \
          results/r5/karel_k_ablation_clr/$(basename $D)_test.log
        for v in $D/eval_val/out_*_val.log; do
          [ -e "$v" ] && cp "$v" \
            results/r5/karel_k_ablation_clr/$(basename $D)_$(basename "$v")
        done
      done
    done
    touch /tmp/r5_stage_K10.done
  else
    echo "stage K10 FAILED; continuing"
  fi
fi

# ---- stage B: doom_main k=25 baselines ----
if [ ! -f /tmp/r5_stage_B.done ]; then
  PHASE=B bash scripts/doom_main_k25_r5b.sh > /tmp/doom_k25_r5b_B.log 2>&1
  if grep -q "DOOM MAIN K25 R5B SUITE DONE" /tmp/doom_k25_r5b_B.log; then
    touch /tmp/r5_stage_B.done
  else
    echo "stage B FAILED; continuing"
  fi
fi

# ---- stage V: doom val-selected checkpoint rows ----
if [ ! -f /tmp/r5_stage_V.done ]; then
  bash scripts/doom_k25_valsel_r5b.sh > /tmp/doom_k25_valsel.log 2>&1
  if grep -q "DOOM K25 VALSEL R5B DONE" /tmp/doom_k25_valsel.log; then
    touch /tmp/r5_stage_V.done
  else
    echo "stage V FAILED; continuing"
  fi
fi

echo "ROUND5 CHAIN C DONE"
