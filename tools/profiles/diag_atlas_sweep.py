"""Sweep segmentation granularity against atlas texel utilization.

The prod-pipeline run packed 127,772 charts (median segment ~17 faces,
min_size=20) into the 4096^2 atlas at tri_utilization 0.118 — i.e.
~0.9 signal texels per face, which caps baked PSNR regardless of the
SG fit. This sweeps `min_size` (the post-Felzenszwalb merge floor, in
faces) on the prod mesh_updated.ply and reports charts/utilization so
stage 6 can pick an adaptive default. Host-only (no chip).

Run: python tools/profiles/diag_atlas_sweep.py [min_size ...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from quadraturefields_tpu.baking.uvatlas import build_uv_atlas
from quadraturefields_tpu.geometry.meshio import load_ply
from quadraturefields_tpu.geometry.native import segment_mesh

MESH = "/tmp/qf_tpu_prod/out/mesh_updated.ply"
TEX = 4096

mesh = load_ply(MESH)
nf = mesh.faces.shape[0]
print(f"mesh: {mesh.vertices.shape[0]} verts, {nf} faces", flush=True)

sweep = [int(a) for a in sys.argv[1:]] or [20, 200, 1000, 4000]
for min_size in sweep:
    t0 = time.time()
    seg = segment_mesh(mesh.vertices, mesh.faces, kthr=0.01,
                       min_size=min_size)
    n_seg = len(np.unique(seg))
    _, _, stats = build_uv_atlas(mesh, seg, TEX)
    stats = {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in stats.items()}
    print(json.dumps({
        "min_size": min_size, "n_segments": n_seg,
        "faces_per_seg": round(nf / n_seg, 1),
        "wall_s": round(time.time() - t0, 1), **stats,
    }), flush=True)
