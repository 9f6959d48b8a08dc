#!/bin/sh
# Stage 1 — NeRF-synthetic (reference script/run_nerfsynthetic.sh)
declare -a list=("chair")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/nerf_synthetic}"
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.train_ngp \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name nerf --num_lobes 0 --num_layers 2 \
  --log2_hashmap_size 19 --batch_size 20 --scale 1.5 \
  --max_steps 20000 --reg_type occ --occ_thres 0.01
done
