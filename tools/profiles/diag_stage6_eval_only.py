"""Eval-only rerun on already-baked stage-6 artifacts (texture PNGs +
atlas OBJ), for A/B-ing renderer changes without the 12-min atlas+bake.

Context: the prod 846k-face mesh at tex 8192/pad 1 measured baked PSNR
19.20 with psnr(baked, sg_at_hits) = 20.16 — the fixed pack_cap_hits=2.0
truncation bug (the busiest 8192-ray chunk carried 46.3k hits against a
16384 cap; 70% dropped). This script re-evaluates with the adaptive cap.

Run: python tools/profiles/diag_stage6_eval_only.py [texdir_suffix]
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

from quadraturefields_tpu.baking.compression import FeatureCompression
from quadraturefields_tpu.baking.stage6 import BakedRenderer, evaluate_baked
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader
from quadraturefields_tpu.geometry.meshio import load_obj_with_uv
from quadraturefields_tpu.models.ngp import NGPConfig

ROOT = "/tmp/qf_tpu_prod"
SUF = sys.argv[1] if len(sys.argv) > 1 else "out_tex8192_pad1"
RUN_DIR = os.path.join(ROOT, SUF)
TEX = 8192 if "8192" in SUF else 4096

t0 = time.time()
atlas_mesh, uv = load_obj_with_uv(
    os.path.join(RUN_DIR, f"mesh_segmentation_{TEX}.obj")
)
comp = FeatureCompression(
    num_lobes=3, path=os.path.join(RUN_DIR, f"texture_{TEX}/"),
    compression_type="sigmoid",
)
print(f"loaded atlas {atlas_mesh.faces.shape[0]} faces, tex {TEX} "
      f"({time.time()-t0:.0f}s)", flush=True)

sg_cfg = NGPConfig(head="sg", num_g_lobes=3)
renderer = BakedRenderer(atlas_mesh, uv, comp, sg_cfg, max_hits=25,
                         render_step_size=5e-3)
test_ds = SubjectLoader(subject_id="fixture",
                        root_fp=os.path.join(ROOT, "data"),
                        split="test", num_rays=None)
results = evaluate_baked(renderer, test_ds, n_views=2)
print("EVAL_ONLY " + json.dumps(
    {k: float(v) for k, v in results.items()}
), flush=True)
