#!/bin/bash
# Suite C, round-3j edition (post-wipe): doom_main on a 2500-program
# SUBSET VIEW at k=25 — the reference's exact seen-demo count
# (README.md:100-133 trains ViZDoom at k=25). Third point on the
# data-vs-k curve under the 16 GB HBM device-cache budget:
#   suite A = 10k programs @ k=8 (recorded in RESULTS.md),
#   suite B = 5k @ k=15 (killed by the VM wipe, never finished),
#   suite C = 2.5k @ k=25 (~8.9 GB cache).
# Same original 300-program test split as suite A (the 4 seed-shards are
# regenerated with the same seeds -> bit-identical datasets). Full model
# at the reference two-stage budget (50k bs32 + 50k bs8) PLUS the
# synthesis/induction baselines at the suite-A 25k budget, all through
# one stage-runner process (one HBM cache push), then beam-10 +
# execution-rerank eval of the full model.
set -x
cd /root/repo
STEPS1=${STEPS1:-50000}
STEPS2=${STEPS2:-50000}
BSTEPS=${BSTEPS:-25000}
SRC=datasets/doom_main
VIEW=datasets/doom_main_2k5
python - <<'EOF'
import json, os
src, view = "datasets/doom_main", "datasets/doom_main_2k5"
os.makedirs(view, exist_ok=True)
if not os.path.exists(view + "/data.hdf5"):
    os.symlink(os.path.abspath(src + "/data.hdf5"), view + "/data.hdf5")
ids = [s.strip() for s in open(src + "/id.txt") if s.strip()]
assert len(ids) == 10400, len(ids)
open(view + "/id.txt", "w").write(
    "\n".join(ids[:2500] + ids[10000:10400]) + "\n")
json.dump({"num_train": 2500, "num_test": 300, "num_val": 100},
          open(view + "/splits.json", "w"))
print("subset view ready")
EOF

python scripts/doom_stage_runner.py \
    --dataset_path $VIEW --num_k 25 \
    --stage model=full,bs=32,steps=$STEPS1,dir=train_dir/doom_main2k5_full_s1,eval=0 \
    --stage model=full,bs=8,steps=$STEPS2,dir=train_dir/doom_main2k5_full_s2,warm=train_dir/doom_main2k5_full_s1/ckpt/$STEPS1/default \
    --stage model=synthesis_baseline,bs=32,steps=$BSTEPS,dir=train_dir/doom_main2k5_synthesis \
    --stage model=induction_baseline,bs=32,steps=$BSTEPS,dir=train_dir/doom_main2k5_induction

# beam-10 + execution rerank: the main task's rerank gain is bounded by
# right-program-in-beam (suite A k=8: rerank_changed only 0.103 at
# width 5), so the k=25 model gets the wider search
python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path $VIEW --num_k 25 \
    --cell_impl pallas --model full --train_dir train_dir/doom_main2k5_full_s2 \
    --output_dir train_dir/doom_main2k5_full_s2/eval_rerank \
    --pred_program --quiet --unroll_type beam --beam_width 10 \
    --execution_rerank
echo "DOOM MAIN K25 R3J SUITE DONE"
