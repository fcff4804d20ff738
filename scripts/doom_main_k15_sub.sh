#!/bin/bash
# Suite B: doom_main full model on a 5000-program SUBSET VIEW at k=15 —
# the other end of the data-vs-k tradeoff under the 16 GB HBM cache budget
# (suite A = scripts/doom_main_r3b.sh: 10k programs at k=8). The view dir
# symlinks data.hdf5 and re-partitions id.txt via splits.json
# (data/dataset.py:all_ids) keeping the ORIGINAL 300 test + 100 val ids.
set -x
cd /root/repo
SRC=datasets/doom_main
VIEW=datasets/doom_main_5k
python - <<'EOF'
import json, os
src, view = "datasets/doom_main", "datasets/doom_main_5k"
os.makedirs(view, exist_ok=True)
if not os.path.exists(view + "/data.hdf5"):
    os.symlink(os.path.abspath(src + "/data.hdf5"), view + "/data.hdf5")
ids = [s.strip() for s in open(src + "/id.txt") if s.strip()]
assert len(ids) == 10400, len(ids)
# first 5000 train ids, then the original test (10000:10300) + val ids
open(view + "/id.txt", "w").write(
    "\n".join(ids[:5000] + ids[10000:10400]) + "\n")
json.dump({"num_train": 5000, "num_test": 300, "num_val": 100},
          open(view + "/splits.json", "w"))
print("subset view ready")
EOF

python scripts/doom_stage_runner.py \
    --dataset_path $VIEW --num_k 15 \
    --stage model=full,bs=32,steps=50000,dir=train_dir/doom_main5k_full_s1,eval=0 \
    --stage model=full,bs=8,steps=50000,dir=train_dir/doom_main5k_full_s2,warm=train_dir/doom_main5k_full_s1/ckpt/50000/default

python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path $VIEW --num_k 15 \
    --cell_impl pallas --model full --train_dir train_dir/doom_main5k_full_s2 \
    --output_dir train_dir/doom_main5k_full_s2/eval_rerank \
    --pred_program --quiet --unroll_type beam --beam_width 5 \
    --execution_rerank --rerank_k 25
echo "DOOM MAIN K15 SUBSET SUITE DONE"
