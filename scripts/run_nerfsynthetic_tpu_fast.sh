#!/bin/sh
# Stage 1 — TPU-fast variant of run_nerfsynthetic.sh: the cell-layout
# hash encoding (one gather per (point, level)) with the bf16-pair
# sorted table gradient — 1.42M samples/s vs 845k for the exact
# tcnn-parity path on v5e, fixture PSNR within 0.03 dB at equal steps
# (BASELINE.md / PERF_NOTES.md "Round 3"). All other hyperparameters
# match the reference recipe.
declare -a list=("chair")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/nerf_synthetic}"
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.train_ngp \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name nerf --num_lobes 0 --num_layers 2 \
  --log2_hashmap_size 19 --batch_size 20 --scale 1.5 \
  --max_steps 20000 --reg_type occ --occ_thres 0.01 \
  --layout cell --grad_payload bf16factor
done
