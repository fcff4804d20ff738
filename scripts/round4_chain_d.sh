#!/bin/bash
# Round-4 master TPU chain, edition D (post THIRD wipe): same as edition C
# but stage A (karel25k evidence suite) is skipped when its harvested
# artifacts already live in results/r4/karel25k/ with completion markers —
# that evidence is committed to git and re-training it would burn ~an hour
# of TPU before the actually-unfinished stage B' (per-k ablation) starts.
# Idempotent + PID-guarded. Launch detached:
#   setsid nohup bash scripts/round4_chain_d.sh \
#       > /tmp/r4_chain.log 2>&1 < /dev/null &
set -x
if [ -f /tmp/r4_chain.pid ] && kill -0 "$(cat /tmp/r4_chain.pid)" \
    2>/dev/null && [ "$(cat /tmp/r4_chain.pid)" != "$$" ]; then
  echo "another round4 chain is live; refusing to double up"
  exit 1
fi
echo $$ > /tmp/r4_chain.pid
cd /root/repo

# ---- wait for the karel dataset ----
until [ -f datasets/karel_25k/id.txt ] \
      && [ "$(wc -l < datasets/karel_25k/id.txt)" -eq 35000 ]; do
  sleep 30
done

# ---- stage A: karel25k evidence suite (skip if committed evidence ok) ----
stage_a_done=1
for L in karel25k_full karel25k_summarizer karel25k_synthesis \
         karel25k_induction karel25k_full_beam5_rerank; do
  grep -q "Final Avg Report" results/r4/karel25k/${L}.log 2>/dev/null \
    || stage_a_done=0
done
if [ "$stage_a_done" -eq 1 ]; then
  echo "stage A evidence already committed in results/r4/karel25k; skipping"
else
  bash scripts/karel25k_suite_r4.sh > /tmp/karel25k_r4.log 2>&1
  grep -q "KAREL25K SUITE R4 DONE" /tmp/karel25k_r4.log \
    || { echo "suite A failed"; exit 1; }
fi
touch /tmp/r4_stage_A.done

# ---- stage B': per-k ablation, main-table decay recipe ----
bash scripts/karel_k_ablation_decay_r4.sh > /tmp/karel_ablation_dk.log 2>&1
mkdir -p results/r4/karel_k_ablation
for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_dk
    cp $D/eval/out_*_test.log \
       results/r4/karel_k_ablation/${M}_k${K}_dk.log 2>/dev/null
    cp $D/eval_val/out_*_val.log \
       results/r4/karel_k_ablation/ 2>/dev/null
  done
done
touch /tmp/r4_stage_B.done

# ---- stage C: wait for the doom dataset, then suite C (k=25) ----
waited=0
until grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r4.log 2>/dev/null; do
  if [ "$waited" -ge 43200 ]; then
    echo "doom gen never finished after 12h - aborting"; exit 1
  fi
  sleep 60; waited=$((waited + 60))
done
bash scripts/doom_main_k25_r3j.sh > /tmp/doom_k25.log 2>&1

mkdir -p results/r4/doom_main_k25
for D in doom_main2k5_full_s2 doom_main2k5_synthesis doom_main2k5_induction; do
  cp train_dir/$D/eval/out_*_test.log \
     results/r4/doom_main_k25/${D}.log 2>/dev/null
  cp train_dir/$D/eval/*report* results/r4/doom_main_k25/ 2>/dev/null
done
cp train_dir/doom_main2k5_full_s2/eval_rerank/out_*_test.log \
   results/r4/doom_main_k25/full_beam10_rerank.log 2>/dev/null
cp train_dir/doom_main2k5_full_s2/eval_rerank/*report* \
   results/r4/doom_main_k25/ 2>/dev/null
touch /tmp/r4_stage_C.done
echo "ROUND4 CHAIN DONE"
