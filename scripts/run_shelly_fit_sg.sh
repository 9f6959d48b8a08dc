#!/bin/sh
# Stage 5 — fit spherical gaussians (reference run_nerfsynthetic_fit_sg.sh)
declare -a list=("khady")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/shelly}"
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.train_fit_sg \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name finetune_sg --scaling 0.0434 \
  --mesh_path ${root}/results/${scene}/finetune/mesh.ply \
  --up_sample 2.0 --max_hits 25 --num_lobes 3 --num_layers 2 \
  --ckpt_path ${root}/ckpts/${scene}/finetune/finetune \
  --max_iterations 20000 --log2_hashmap_size 19 --batch_size 18 \
  --scale 1.5
done
