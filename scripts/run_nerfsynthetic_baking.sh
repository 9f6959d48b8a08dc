#!/bin/sh
# Stage 6 — prune + segment + UV + bake + eval (reference run_nerfsynthetic_baking.sh)
declare -a list=("chair")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/nerf_synthetic}"
texture_size=4096
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.bake all \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name baking \
  --ckpt_path ${root}/ckpts/${scene}/finetune/finetune \
  --sg_ckpt_path ${root}/ckpts/${scene}/finetune_sg/fit_sg \
  --mesh_path ${root}/results/${scene}/finetune/mesh.ply \
  --texture_size ${texture_size} --compression_type sigmoid \
  --lambda_thres 7.5 --num_lobes 6 --max_hits 25 --scale 1.5
done
