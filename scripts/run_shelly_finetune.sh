#!/bin/sh
# Stage 4 — finetune (reference run_nerfsynthetic_finetune.sh)
declare -a list=("khady")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/shelly}"
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.train_finetune \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name finetune --scaling 0.0434 \
  --mesh_path ${root}/results/${scene}/field/smp_mesh.ply \
  --up_sample 2.0 --voxel_size 150 --max_hits 25 --num_lobes 0 \
  --num_layers 2 --ckpt_path ${root}/ckpts/${scene}/nerf/ngp \
  --max_iterations 10000 --log2_hashmap_size 19 --batch_size 17 \
  --scale 1.5
done
