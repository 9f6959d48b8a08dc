#!/bin/sh
# Stage 2 — quadrature field (reference script/run_nerfsynthetic_field.sh)
declare -a list=("khady")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/shelly}"
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.train_field \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name field --ckpt_path ${root}/ckpts/${scene}/nerf/ngp \
  --num_lobes 0 --log2_hashmap_size 19 \
  --field_log2_hashmap_size 30 --batch_size 18 --scale 1.5 \
  --max_steps 25000
done
