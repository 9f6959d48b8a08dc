#!/bin/sh
# Stage 1 — TPU-fast OPT-IN variant of run_nerfsynthetic.sh: the
# cell-layout L8F4 hash encoding with the factorized bf16 sorted table
# gradient — ~3.49M samples/s vs ~1.23M for the exact tcnn-parity path
# on v5e (BENCH/BASELINE.md 2026-08-21). Quality tradeoff, measured at
# the non-saturating 200x200 parity protocol (2500 steps): about
# -5 dB standalone stage-1 PSNR vs the corner default at equal SHORT
# step budgets; the full six-stage pipeline built on it bakes 33.37 dB
# vs the corner chain's 33.10 (BASELINE.md 2026-08-21). Use the plain
# run_nerfsynthetic.sh (corner layout) when standalone stage-1 quality
# at short budgets matters; use this for pipeline throughput. All
# other hyperparameters match the reference recipe.
declare -a list=("chair")
root="${ROOT:-runs/}"
data_root="${DATA_ROOT:-data/nerf_synthetic}"
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.train_ngp \
  --scene ${scene} --data_root ${data_root} --root ${root} \
  --exp_name nerf --num_lobes 0 --num_layers 2 \
  --log2_hashmap_size 19 --batch_size 20 --scale 1.5 \
  --max_steps 20000 --reg_type occ --occ_thres 0.01 \
  --layout cell --grad_payload bf16factor --n_levels 8 --n_features 4
done
