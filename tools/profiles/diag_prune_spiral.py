"""A/B: spiral-augmented prune coverage on the prod artifacts.

Context (PERF_NOTES "Baked-PSNR decomposition"): after exhaustive
train-view pruning + the adaptive pack cap, baked PSNR sits AT the
SG-at-hits ceiling of the pruned mesh (28.72 vs 28.90 dB), while the
same SG on the UNPRUNED mesh hits 35.58 — i.e. ~6.7 dB is faces the
12-view train split never hits that the test views do see. This
reruns the prune with spiral coverage rings (the reference's
trainval-coverage analog, prune_mesh_after_finetuning.py:62-66), then
atlas+bake+eval at the texel-lossless 8192/pad1 config.

Run: python tools/profiles/diag_prune_spiral.py [n_per_ring]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

from quadraturefields_tpu.baking.stage6 import (
    BakedRenderer,
    bake_textures,
    evaluate_baked,
    prune_mesh,
    segment_and_atlas,
)
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader
from quadraturefields_tpu.data.own_views import spiral_prune_rings
from quadraturefields_tpu.geometry.intersect import MeshIntersection
from quadraturefields_tpu.geometry.meshio import load_ply
from quadraturefields_tpu.train.stage5_fit_sg import Stage5Config
from quadraturefields_tpu.utils.checkpoint import load_checkpoint

ROOT = "/tmp/qf_tpu_prod"
OUT = os.path.join(ROOT, "out")
CKPT = os.path.join(ROOT, "stage_ckpts")
N_RING = int(sys.argv[1]) if len(sys.argv) > 1 else 10
TEX, PAD = 8192, 1.0
RUN_DIR = os.path.join(ROOT, f"out_spiral{N_RING}_tex{TEX}")
os.makedirs(RUN_DIR, exist_ok=True)

cfg5 = Stage5Config(scene="fixture", data_root=os.path.join(ROOT, "data"),
                    num_lobes=3, max_hits=25, render_step_size=5e-3)
sg_cfg = cfg5.sg_config()
teacher_cfg = cfg5.teacher_config()

st4 = load_checkpoint(os.path.join(CKPT, "stage4"))
st5 = load_checkpoint(os.path.join(CKPT, "stage5"))

# the stage-4 deformed mesh = smp_mesh topology + checkpointed verts
smp = load_ply(os.path.join(OUT, "smp_mesh.ply"))
smp.vertices[:] = np.asarray(st4["verts"], np.float32)
mi = MeshIntersection(mesh=smp, simplify_mesh=False, num_intersections=25)
print(f"deformed mesh: {smp.faces.shape[0]} faces; spiral {N_RING}/ring",
      flush=True)

train_ds = SubjectLoader(subject_id="fixture",
                         root_fp=os.path.join(ROOT, "data"),
                         split="train", num_rays=8192)
t0 = time.time()
rings = spiral_prune_rings(distance=4.0, n_per_ring=N_RING,
                           z_fracs=(0.1, 0.45, 0.8), resolution=200)
pruned, tri_w = prune_mesh(
    st4["params"]["rf"], teacher_cfg, mi, train_ds,
    np.asarray(cfg5.aabb), render_step_size=5e-3, extra_views=rings,
    out_dir=RUN_DIR,
)
print(f"pruned: {pruned.faces.shape[0]} faces (was 846101 train-only) "
      f"wall {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
atlas_mesh, uv, v_image, tri_image = segment_and_atlas(
    pruned, TEX, padding=PAD, out_dir=RUN_DIR
)
with open(os.path.join(RUN_DIR, "atlas_stats.json")) as f:
    stats = json.load(f)
print("atlas", json.dumps(stats), f"wall {time.time()-t0:.0f}s",
      flush=True)

t0 = time.time()
comp = bake_textures(
    st5["sg_params"], sg_cfg, v_image, tri_image,
    np.asarray(cfg5.aabb),
    teacher_params=st4["params"]["rf"], teacher_cfg=teacher_cfg,
    texture_size=TEX, out_dir=RUN_DIR,
)
print(f"bake wall {time.time()-t0:.0f}s", flush=True)

test_ds = SubjectLoader(subject_id="fixture",
                        root_fp=os.path.join(ROOT, "data"),
                        split="test", num_rays=None)
renderer = BakedRenderer(atlas_mesh, uv, comp, sg_cfg, max_hits=25,
                         render_step_size=5e-3)
results = evaluate_baked(renderer, test_ds, n_views=2)
print("SPIRAL_PRUNE " + json.dumps({
    "n_per_ring": N_RING, "texture_size": TEX, "padding": PAD,
    "faces_kept": int(pruned.faces.shape[0]),
    **{k: float(v) for k, v in results.items()},
    "tri_utilization": stats["tri_utilization"],
    "n_charts": stats["n_charts"],
}), flush=True)
