#!/bin/bash
# Suite C: doom_main full model on a 2500-program SUBSET VIEW at k=25 —
# the reference's exact seen-demo count (README.md:100-133 trains ViZDoom
# at k=25). Third point on the data-vs-k curve under the 16 GB HBM
# device-cache budget: suite A = 10k programs @ k=8 (doom_main_r3b.sh),
# suite B = 5k @ k=15 (doom_main_k15_sub.sh), C = 2.5k @ k=25 (~8.9 GB
# cache). Same original 300-program test split for all three.
set -x
cd /root/repo
SRC=datasets/doom_main
VIEW=datasets/doom_main_2k5
# reclaim suite B's ~21 GB device-cache sidecar (its runs are done by the
# time this suite starts; a rerun rebuilds it in ~10 min) so this suite's
# ~11 GB sidecar fits the disk
rm -rf datasets/doom_main_5k/device_cache_v1
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
    --stage model=full,bs=32,steps=50000,dir=train_dir/doom_main2k5_full_s1,eval=0 \
    --stage model=full,bs=8,steps=50000,dir=train_dir/doom_main2k5_full_s2,warm=train_dir/doom_main2k5_full_s1/ckpt/50000/default \
    --stage model=synthesis_baseline,bs=32,steps=25000,dir=train_dir/doom_main2k5_synthesis \
    --stage model=induction_baseline,bs=32,steps=25000,dir=train_dir/doom_main2k5_induction

# beam-10: the main task's rerank gain is bounded by right-program-in-beam
# (suite A k=8: rerank_changed only 0.103 at width 5), so the k=25 model
# gets the wider search
python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path $VIEW --num_k 25 \
    --cell_impl pallas --model full --train_dir train_dir/doom_main2k5_full_s2 \
    --output_dir train_dir/doom_main2k5_full_s2/eval_rerank \
    --pred_program --quiet --unroll_type beam --beam_width 10 \
    --execution_rerank

# beam-10 + rerank on the suite A (10k-program, k=8) checkpoint too: how
# much of its greedy->rerank headroom was the width-5 beam
python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path datasets/doom_main --num_k 8 \
    --cell_impl pallas --model full --train_dir train_dir/doom_main_full_s2 \
    --output_dir train_dir/doom_main_full_s2/eval_rerank_b10 \
    --pred_program --quiet --unroll_type beam --beam_width 10 \
    --execution_rerank --rerank_k 25
echo "DOOM MAIN K25 SUBSET SUITE DONE"
