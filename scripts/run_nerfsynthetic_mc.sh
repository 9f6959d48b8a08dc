#!/bin/sh
# Stage 3 — marching cubes + simplify (reference run_nerfsynthetic_mc.sh)
declare -a list=("chair")
root="${ROOT:-runs/}"
grad_thres=0.01; omega=100; vx=150; density_thres=10.0; combine=True
for scene in ${list[@]}; do
python -m quadraturefields_tpu.cli.marching_cubes \
  ${root}/results/${scene}/field/ 100.0 True ${omega} 0 0 ${combine} ${grad_thres} ${density_thres}
python -m quadraturefields_tpu.cli.downsample_mesh \
  ${root}/results/${scene}/field/mesh.ply ${vx}
done
