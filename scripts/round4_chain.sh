#!/bin/bash
# Round-4 master TPU chain — idempotent, PID-guarded. Assumes
# scripts/round4_gen.sh already ran (karel_25k on disk, doom shard gen
# forked). Order: (A) karel25k evidence re-materialization suite,
# (B) per-k constant-LR ablation, (C) wait for doom shards -> suite C at
# k=25, (D) harvest per-k + doom artifacts into results/r4/.
# Launch detached:
#   setsid nohup bash scripts/round4_chain.sh \
#       > /tmp/r4_chain.log 2>&1 < /dev/null &
set -x
if [ -f /tmp/r4_chain.pid ] && kill -0 "$(cat /tmp/r4_chain.pid)" \
    2>/dev/null && [ "$(cat /tmp/r4_chain.pid)" != "$$" ]; then
  echo "another round4_chain.sh is live; refusing to double up"
  exit 1
fi
echo $$ > /tmp/r4_chain.pid
cd /root/repo

[ -f datasets/karel_25k/id.txt ] || { echo "karel_25k missing"; exit 1; }

# ---- stage A: karel25k evidence suite ----
bash scripts/karel25k_suite_r4.sh > /tmp/karel25k_r4.log 2>&1
grep -q "KAREL25K SUITE R4 DONE" /tmp/karel25k_r4.log \
  || { echo "suite A failed"; exit 1; }

# ---- stage B: per-k CLR ablation ----
bash scripts/karel_k_ablation_clr2.sh > /tmp/karel_ablation_clr.log 2>&1
mkdir -p results/r4/karel_k_ablation
for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_clr
    cp $D/eval/out_*_test.log \
       results/r4/karel_k_ablation/${M}_k${K}.log 2>/dev/null
    cp $D/eval_val/out_*_val.log results/r4/karel_k_ablation/ 2>/dev/null
  done
done

# ---- stage C: wait for the doom dataset, then suite C (k=25) ----
waited=0
until grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r4.log 2>/dev/null; do
  if [ "$waited" -ge 43200 ]; then
    echo "doom gen never finished after 12h - aborting"
    exit 1
  fi
  sleep 60; waited=$((waited + 60))
done
bash scripts/doom_main_k25_r3j.sh > /tmp/doom_k25.log 2>&1

# ---- stage D: harvest doom artifacts ----
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
echo "ROUND4 CHAIN DONE"
