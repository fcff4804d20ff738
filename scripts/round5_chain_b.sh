#!/bin/bash
# Round-5 master TPU chain, POST-WIPE edition B. The original
# scripts/round5_chain.sh assumed the round-4 chain's artifacts survived;
# the r5 boot wiped datasets/ + train_dir/, so this edition rebuilds from
# scratch, ordered so the #1 VERDICT item (doom_main k=25) lands earliest
# while the 1-core host generates datasets (scripts/round5_gen_b.sh):
#   P1 - per-k CLR ablation, k=3 pair   (karel ready first; TPU-bound,
#        host-light chunked loop -> doom gen keeps the core)
#   C  - doom_main k=25 suite           (as soon as doom_main25 is ready)
#   P2 - per-k CLR ablation, k=5 pair
#   S  - karel25k synthesis seed-234 + val-selected checkpoint
#   I  - doom if-else v3 two-stage      (only if its dataset is ready)
# Stage markers /tmp/r5_stage_{P1,C,P2,S,I}.done; harvest to results/r5/
# as each stage completes (commit from the interactive session).
# Launch detached:
#   setsid nohup bash scripts/round5_chain_b.sh \
#       > /tmp/r5_chain.log 2>&1 < /dev/null &
set -x
if ! mkdir /tmp/r5_chainb.lock 2>/dev/null; then
  pid=$(cat /tmp/r5_chainb.lock/pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
      && grep -q round5_chain_b "/proc/$pid/cmdline" 2>/dev/null; then
    echo "another round5 chain B is live (pid $pid)"; exit 1
  fi
fi
mkdir -p /tmp/r5_chainb.lock
echo $$ > /tmp/r5_chainb.lock/pid
cd /root/repo

newest() { ls -t $1 2>/dev/null | head -1; }

harvest_ablation() {  # $1 = k value
  local K=$1 M D sfx f v
  mkdir -p results/r5/karel_k_ablation_clr
  for M in synthesis_baseline summarizer; do
    for D in train_dir/karel25k_${M}_k${K}_clr5 \
             train_dir/karel25k_${M}_k${K}_clr5_s234; do
      [ -d "$D" ] || continue
      sfx=$(basename "$D" | sed "s/.*clr5//")
      f=$(newest "$D/eval/out_*_test.log")
      [ -n "$f" ] && cp "$f" \
        results/r5/karel_k_ablation_clr/${M}_k${K}_clr5${sfx}_test.log
      for v in $D/eval_val/out_*_val.log; do
        [ -e "$v" ] && cp "$v" \
          results/r5/karel_k_ablation_clr/${M}_k${K}${sfx}_$(basename "$v")
      done
    done
  done
}

# ---- wait for karel_25k ----
until [ -f datasets/karel_25k/id.txt ] \
      && [ "$(wc -l < datasets/karel_25k/id.txt)" -eq 35000 ]; do
  sleep 30
done

# ---- stage P1: per-k CLR ablation, k=3 ----
if [ ! -f /tmp/r5_stage_P1.done ]; then
  KS=3 bash scripts/karel_k_ablation_clr_r5.sh \
      > /tmp/karel_ablation_clr5_k3.log 2>&1
  if grep -q "K ABLATION CLR R5 DONE" /tmp/karel_ablation_clr5_k3.log; then
    harvest_ablation 3
    touch /tmp/r5_stage_P1.done
  else
    echo "stage P1 FAILED; continuing"
  fi
fi

# ---- stage C: doom_main k=25 suite ----
DM=datasets/doom_main25_len8_seed123
until [ -f $DM/id.txt ] && [ "$(wc -l < $DM/id.txt)" -eq 2900 ]; do
  if grep -q "doom_main25 gen FAILED" /tmp/r5_gen.log 2>/dev/null; then
    echo "doom gen failed; skipping stage C"; break
  fi
  sleep 60
done
if [ -f $DM/id.txt ] && [ "$(wc -l < $DM/id.txt)" -eq 2900 ] \
   && [ ! -f /tmp/r5_stage_C.done ]; then
  bash scripts/doom_main_k25_r5.sh > /tmp/doom_k25.log 2>&1
  if grep -q "DOOM MAIN K25 R5 SUITE DONE" /tmp/doom_k25.log; then
    mkdir -p results/r5/doom_main_k25
    for D in doom_main2k5_full_s2 doom_main2k5_synthesis \
             doom_main2k5_induction; do
      f=$(newest "train_dir/$D/eval/out_*_test.log")
      [ -n "$f" ] && cp "$f" results/r5/doom_main_k25/${D}.log
      for r in train_dir/$D/eval/*report*; do
        [ -e "$r" ] && cp "$r" results/r5/doom_main_k25/
      done
    done
    f=$(newest "train_dir/doom_main2k5_full_s2/eval_rerank/out_*_test.log")
    [ -n "$f" ] && cp "$f" results/r5/doom_main_k25/full_beam10_rerank.log
    for r in train_dir/doom_main2k5_full_s2/eval_rerank/*report*; do
      [ -e "$r" ] && cp "$r" results/r5/doom_main_k25/
    done
    JAX_PLATFORMS=cpu python -m demo2program_tpu.tools.doom_error_analysis \
        --dump "$(newest 'train_dir/doom_main2k5_full_s2/eval/out_*_test.txt')" \
        > results/r5/doom_main_k25/error_analysis.log 2>&1 || true
    touch /tmp/r5_stage_C.done
  else
    echo "stage C FAILED; continuing"
  fi
fi

# ---- stage P2: per-k CLR ablation, k=5 ----
if [ ! -f /tmp/r5_stage_P2.done ]; then
  KS=5 bash scripts/karel_k_ablation_clr_r5.sh \
      > /tmp/karel_ablation_clr5_k5.log 2>&1
  if grep -q "K ABLATION CLR R5 DONE" /tmp/karel_ablation_clr5_k5.log; then
    harvest_ablation 5
    touch /tmp/r5_stage_P2.done
  else
    echo "stage P2 FAILED; continuing"
  fi
fi

# ---- stage S: karel25k synthesis, seed 234 + val-selected checkpoint ----
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

# ---- stage I: doom if-else v3 (only if the dataset regen finished) ----
DS=datasets/doom_ifelse3_len2_seed123
if [ -f $DS/id.txt ] && [ "$(wc -l < $DS/id.txt)" -eq 11100 ] \
   && [ ! -f /tmp/r5_stage_I.done ]; then
  ISTEPS1=${ISTEPS1:-50000}
  ISTEPS2=${ISTEPS2:-50000}
  python scripts/doom_stage_runner.py \
      --dataset_path $DS --num_k 25 \
      --stage model=full,bs=32,steps=$ISTEPS1,dir=train_dir/ifelse3_full_s1,eval=0 \
      --stage model=full,bs=8,steps=$ISTEPS2,dir=train_dir/ifelse3_full_s2,warm=train_dir/ifelse3_full_s1/ckpt/$ISTEPS1/default \
      > /tmp/ifelse3_train.log 2>&1
  f=$(newest "train_dir/ifelse3_full_s2/eval/out_*_test.log")
  if [ -n "$f" ] && grep -q "Final Avg Report" "$f"; then
    python -m demo2program_tpu.cli.evaler_cli \
        --dataset_type vizdoom --dataset_path $DS --num_k 25 \
        --cell_impl pallas --model full \
        --train_dir train_dir/ifelse3_full_s2 \
        --output_dir train_dir/ifelse3_full_s2/eval_rerank \
        --pred_program --quiet --unroll_type beam --beam_width 5 \
        --execution_rerank > /tmp/ifelse3_rerank.log 2>&1
    mkdir -p results/r5/doom_ifelse_v3
    cp "$f" results/r5/doom_ifelse_v3/full_greedy.log
    fr=$(newest "train_dir/ifelse3_full_s2/eval_rerank/out_*_test.log")
    [ -n "$fr" ] && cp "$fr" results/r5/doom_ifelse_v3/full_beam5_rerank.log
    JAX_PLATFORMS=cpu python -m demo2program_tpu.tools.doom_error_analysis \
        --dump "$(newest 'train_dir/ifelse3_full_s2/eval/out_*_test.txt')" \
        > results/r5/doom_ifelse_v3/error_analysis.log 2>&1 || true
    touch /tmp/r5_stage_I.done
  else
    echo "stage I FAILED (no completed test eval)"
  fi
else
  echo "stage I skipped or already done"
fi

echo "ROUND5 CHAIN B DONE"
