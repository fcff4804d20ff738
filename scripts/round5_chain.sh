#!/bin/bash
# Round-5 master TPU chain. Sequenced per VERDICT r4 "Next round":
#   (wait) round-4 chain D finishes stage C (doom_main k=25 suite)
#   C' - verify/repair+harvest the doom_main k=25 suite (next #1, #5)
#   P  - Karel per-k ablation at the reference's CONSTANT-LR recipe
#        (next #2; root-cause note in karel_k_ablation_clr_r5.sh)
#   I  - doom if-else v3-silhouette retrain at the r3 protocol (next #3)
#   S  - karel25k synthesis seed-234 + val-selected checkpoint (next #8)
# ADVICE r4 hygiene: atomic mkdir lock (no check-then-write race), every
# stage gated on its suite's completion marker before its .done file is
# touched, harvest copies pick the newest match explicitly.
# Launch detached:
#   setsid nohup bash scripts/round5_chain.sh \
#       > /tmp/r5_chain.log 2>&1 < /dev/null &
set -x
if ! mkdir /tmp/r5_chain.lock 2>/dev/null; then
  pid=$(cat /tmp/r5_chain.lock/pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
      && grep -q round5_chain "/proc/$pid/cmdline" 2>/dev/null; then
    echo "another round5 chain is live (pid $pid); refusing to double up"
    exit 1
  fi
  echo "stale lock (pid ${pid:-unknown} not a round5 chain); taking over"
fi
mkdir -p /tmp/r5_chain.lock
echo $$ > /tmp/r5_chain.lock/pid
cd /root/repo

newest() { ls -t $1 2>/dev/null | head -1; }

# ---- wait for round-4 chain D (stage C = doom_main k25 suite) ----
R4PID=$(cat /tmp/r4_chain.pid 2>/dev/null)
until grep -q "ROUND4 CHAIN DONE" /tmp/r4_chain.log 2>/dev/null; do
  if [ -n "$R4PID" ] && ! kill -0 "$R4PID" 2>/dev/null; then
    echo "round-4 chain exited without its DONE marker; proceeding to repair"
    break
  fi
  sleep 60
done

# ---- stage C': verify / repair / harvest doom_main k=25 ----
if ! grep -q "DOOM MAIN K25 R3J SUITE DONE" /tmp/doom_k25.log 2>/dev/null; then
  echo "doom k25 suite marker missing; relaunching (idempotent resume)"
  bash scripts/doom_main_k25_r3j.sh >> /tmp/doom_k25.log 2>&1 || true
fi
if grep -q "DOOM MAIN K25 R3J SUITE DONE" /tmp/doom_k25.log 2>/dev/null; then
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
  echo "stage C' FAILED (doom k25 suite never completed); continuing"
fi

# ---- stage P: per-k ablation, constant-LR reference recipe ----
bash scripts/karel_k_ablation_clr_r5.sh > /tmp/karel_ablation_clr5.log 2>&1
if grep -q "K ABLATION CLR R5 DONE" /tmp/karel_ablation_clr5.log; then
  mkdir -p results/r5/karel_k_ablation_clr
  for K in 3 5; do
    for M in synthesis_baseline summarizer; do
      # the suite retries a no-takeoff combo once under <dir>_s234; the
      # final test eval lives in whichever dir was accepted
      for D in train_dir/karel25k_${M}_k${K}_clr5 \
               train_dir/karel25k_${M}_k${K}_clr5_s234; do
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
  done
  touch /tmp/r5_stage_P.done
else
  echo "stage P FAILED; continuing"
fi

# ---- stage I: doom if-else v3-silhouette retrain (r3 protocol) ----
DS=datasets/doom_ifelse3_len2_seed123
if [ -f $DS/id.txt ] && [ "$(wc -l < $DS/id.txt)" -eq 11100 ]; then
  python scripts/doom_stage_runner.py \
      --dataset_path $DS --num_k 25 \
      --stage model=full,bs=32,steps=50000,dir=train_dir/ifelse3_full_s1,eval=0 \
      --stage model=full,bs=8,steps=50000,dir=train_dir/ifelse3_full_s2,warm=train_dir/ifelse3_full_s1/ckpt/50000/default \
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
    echo "stage I FAILED (no completed test eval); continuing"
  fi
else
  echo "stage I SKIPPED: ifelse3 dataset missing/incomplete"
fi

# ---- stage S: karel25k synthesis, new seed + val-selected checkpoint ----
D=train_dir/karel25k_synthesis_s234
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
  echo "stage S FAILED"
fi

echo "ROUND5 CHAIN DONE"
