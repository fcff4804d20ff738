#!/bin/bash
# Round-4 chain, phase B' onward: decay-recipe per-k ablation (supersedes
# the CLR protocol mid-flight), then suite C at k=25, then artifact
# harvest. Idempotent + PID-guarded; assumes karel_25k and the merged
# doom_main are already on disk.
# Launch detached:
#   setsid nohup bash scripts/round4_chain_b.sh \
#       > /tmp/r4_chain.log 2>&1 < /dev/null &
set -x
if [ -f /tmp/r4_chain.pid ] && kill -0 "$(cat /tmp/r4_chain.pid)" \
    2>/dev/null && [ "$(cat /tmp/r4_chain.pid)" != "$$" ]; then
  echo "another round4 chain is live; refusing to double up"
  exit 1
fi
echo $$ > /tmp/r4_chain.pid
cd /root/repo

# ---- stage B': per-k ablation, main-table recipe ----
bash scripts/karel_k_ablation_decay_r4.sh > /tmp/karel_ablation_dk.log 2>&1
mkdir -p results/r4/karel_k_ablation
for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    for SUF in dk clr; do
      D=train_dir/karel25k_${M}_k${K}_${SUF}
      cp $D/eval/out_*_test.log \
         results/r4/karel_k_ablation/${M}_k${K}_${SUF}.log 2>/dev/null
    done
  done
done

# ---- stage C: suite C (k=25 subset view, full + baselines + rerank) ----
[ -f datasets/doom_main/id.txt ] || { echo "doom_main missing"; exit 1; }
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
