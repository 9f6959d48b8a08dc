"""Sweep segmentation granularity against atlas texel utilization.

The prod-pipeline run packed 127k-517k charts (median segment ~17
faces, min_size=20) into the atlas at tri_utilization 0.06-0.23 —
i.e. ~1 signal texel per face, with most of the atlas spent on the
per-chart `2*pad+1` rect overhead. This sweeps `min_size` (the
post-Felzenszwalb merge floor, in faces) and the atlas padding on the
prod mesh_updated.ply and reports charts/utilization so stage 6 can
pick an adaptive default. Host-only (no chip).

If the prod artifacts are absent (e.g. /tmp wiped), a faithful
stand-in is synthesized the same way stage 3 makes the prod mesh:
analytic fixture sigma on a 256^3 grid -> C++ marching tetrahedra ->
voxel-clustering decimation (same knobs as tools/tpu_pipeline_prod.py
stage 3). The decimation roughness is what splinters the normal-based
segmentation, so the stand-in reproduces the pathology.

Run: python tools/profiles/diag_atlas_sweep.py [min_size ...]
     QF_SWEEP_PAD=0,1,2 to sweep padding too (default 1).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from quadraturefields_tpu.baking.uvatlas import build_uv_atlas
from quadraturefields_tpu.geometry.meshio import Mesh, load_ply, save_ply
from quadraturefields_tpu.geometry.native import segment_mesh

MESH = "/tmp/qf_tpu_prod/out/mesh_updated.ply"
STANDIN = "/tmp/qf_atlas_standin.ply"
TEX = int(os.environ.get("QF_SWEEP_TEX", 4096))
PADS = [float(p) for p in os.environ.get("QF_SWEEP_PAD", "1").split(",")]
COSES = [float(c)
         for c in os.environ.get("QF_SWEEP_COS", "0.5").split(",")]
SMOOTHS = [int(s)
           for s in os.environ.get("QF_SWEEP_SMOOTH", "0").split(",")]
TOLS = [float(t)
        for t in os.environ.get("QF_SWEEP_TOL", "0").split(",")]


def synth_standin() -> Mesh:
    from quadraturefields_tpu.data.fixture import make_fixture_scene
    from quadraturefields_tpu.geometry.extract import downsample_mesh
    from quadraturefields_tpu.geometry.native import marching_tetrahedra

    scene = make_fixture_scene()
    n = 256
    # same normalized [-1, 1] cube the stage-3 extractor emits
    xs = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    # fixture world aabb is [-1.5, 1.5]^3
    sigma = scene.sigma(pts * 1.5).reshape(n, n, n).astype(np.float32)
    verts, faces = marching_tetrahedra(
        sigma, level=5.0,
        origin=(-1.0, -1.0, -1.0),
        spacing=(2.0 / (n - 1),) * 3,
    )
    mesh = downsample_mesh(Mesh(verts, faces), vx=150.0)
    return mesh


if os.path.exists(MESH):
    mesh, src = load_ply(MESH), MESH
elif os.path.exists(STANDIN):
    mesh, src = load_ply(STANDIN), STANDIN + " (cached stand-in)"
else:
    t0 = time.time()
    mesh = synth_standin()
    save_ply(STANDIN, mesh)
    src = STANDIN + f" (synthesized in {time.time()-t0:.0f}s)"
nf = mesh.faces.shape[0]
print(f"mesh: {src}: {mesh.vertices.shape[0]} verts, {nf} faces",
      flush=True)

sweep = [int(a) for a in sys.argv[1:]] or [20, 200, 1000, 4000]
for min_size in sweep:
    t0 = time.time()
    seg = segment_mesh(mesh.vertices, mesh.faces, kthr=0.01,
                       min_size=min_size)
    n_seg = len(np.unique(seg))
    seg_s = time.time() - t0
    for pad in PADS:
        for cos_thres in COSES:
            for smooth in SMOOTHS:
                for tol in TOLS:
                    t1 = time.time()
                    _, _, stats = build_uv_atlas(
                        mesh, seg, TEX, padding=pad,
                        fold_cos_thres=cos_thres,
                        fold_smooth_rounds=smooth,
                        fold_area_tol=tol,
                    )
                    stats = {
                        k: (round(v, 4)
                            if isinstance(v, float) else v)
                        for k, v in stats.items()
                    }
                    print(json.dumps({
                        "min_size": min_size, "pad": pad,
                        "cos": cos_thres, "smooth": smooth,
                        "tol": tol, "n_segments": n_seg,
                        "faces_per_seg": round(nf / n_seg, 1),
                        "seg_s": round(seg_s, 1),
                        "atlas_s": round(time.time() - t1, 1),
                        **stats,
                    }), flush=True)
