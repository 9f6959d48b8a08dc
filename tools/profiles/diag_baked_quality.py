"""Decompose the prod pipeline's stage-1 42.7 dB -> baked 18.2 dB drop.

Renders the prod-run test views through each representation rung, so
the quality loss is attributed to a specific stage boundary:

  quad_teacher — stage-4 finetuned RF rendered AT MESH HITS (25/ray)
                 on the stage-4 mesh: the quadrature/mesh ceiling.
  sg_t4        — stage-5 SG appearance at the same hits: + SG fit loss.
  sg_pruned    — same on mesh_updated.ply: + stage-6 pruning loss.
  sg_atlas     — same on the atlas OBJ: + segmentation/remesh loss.
  baked        — BakedRenderer from texture PNGs: + texel path
                 (V-image rasterization, uint8 quantization, texel
                 gather). Also reports PSNR(baked, sg_atlas), the
                 GT-independent texel-path error.

Requires a completed tools/tpu_pipeline_prod.py run (artifacts under
/tmp/qf_tpu_prod). Reference contract being diagnosed:
test_baking_texture_images.py:341-429 vs train_fit_sg.py eval.

Run: python tools/profiles/diag_baked_quality.py [n_views]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from quadraturefields_tpu.baking.compression import FeatureCompression
from quadraturefields_tpu.baking.stage6 import BakedRenderer
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader
from quadraturefields_tpu.geometry.intersect import MeshIntersection
from quadraturefields_tpu.geometry.meshio import Mesh, load_obj_with_uv, load_ply
from quadraturefields_tpu.models.ngp import ngp_forward
from quadraturefields_tpu.render.quadrature import HitRows, render_fit_sg_rows
from quadraturefields_tpu.train.stage5_fit_sg import Stage5Config
from quadraturefields_tpu.utils.checkpoint import load_checkpoint
from quadraturefields_tpu.utils.metrics import psnr

ROOT = "/tmp/qf_tpu_prod"
OUT = os.path.join(ROOT, "out")
CKPT = os.path.join(ROOT, "stage_ckpts")
N_VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CHUNK = 4096

cfg5 = Stage5Config(scene="fixture", data_root=os.path.join(ROOT, "data"),
                    num_lobes=3, max_hits=25, render_step_size=5e-3)
sg_cfg = cfg5.sg_config()
teacher_cfg = cfg5.teacher_config()
aabb = jnp.asarray(cfg5.aabb)

st4 = load_checkpoint(os.path.join(CKPT, "stage4"))
st5 = load_checkpoint(os.path.join(CKPT, "stage5"))
rf_params = st4["params"]["rf"]
sg_params = st5["sg_params"]

smp = load_ply(os.path.join(OUT, "smp_mesh.ply"))
# stage-4 construction applied scale=1.5 (grid->world); the saved verts
# are post-scale, post-deformation world coordinates
mesh_t4 = Mesh(np.asarray(st4["verts"], np.float32), smp.faces)
mesh_pruned = load_ply(os.path.join(OUT, "mesh_updated.ply"))
atlas_mesh, uv = load_obj_with_uv(
    os.path.join(OUT, "mesh_segmentation_4096.obj")
)

comp = FeatureCompression(
    num_lobes=sg_cfg.num_g_lobes,
    path=os.path.join(OUT, "texture_4096", ""),
    compression_type="sigmoid", lambda_thres=7.5,
)

fwd = lambda p, x, d, a, c: (lambda r: (r[0], r[1][..., 0]))(
    ngp_forward(p, x, d, a, c)
)


def render_quad(mi: MeshIntersection, params, cfg, name):
    """Chunked fit-SG-style render: params' rgb at hits, teacher RF
    sigma, white background."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def _render(o, d, tri, ts, valid):
        hits = HitRows(tri_ids=tri, ts=ts, valid=valid)
        rgb, _, _, _ = render_fit_sg_rows(
            params, rf_params, hits, o, d, aabb, cfg, teacher_cfg,
            ngp_forward_fn=fwd, render_step_size=5e-3, bg_color="white",
        )
        return rgb

    def view(data):
        origins = np.asarray(data["rays"].origins, np.float32)
        viewdirs = np.asarray(data["rays"].viewdirs, np.float32)
        n = origins.shape[0]
        n_pad = (n + CHUNK - 1) // CHUNK * CHUNK
        o = np.concatenate([origins, np.zeros((n_pad - n, 3), np.float32)])
        d = np.concatenate(
            [viewdirs, np.tile([[0, 0, 1.0]], (n_pad - n, 1))]
        ).astype(np.float32)
        outs = []
        for i in range(0, n_pad, CHUNK):
            oc, dc = o[i:i + CHUNK], d[i:i + CHUNK]
            tri, ts, valid = mi.intersect_rows(oc, dc)
            outs.append(np.asarray(_render(
                jnp.asarray(oc), jnp.asarray(dc), jnp.asarray(tri),
                jnp.asarray(ts), jnp.asarray(valid),
            )))
        return np.concatenate(outs)[:n]

    return view


def main():
    ds = SubjectLoader(subject_id="fixture",
                       root_fp=os.path.join(ROOT, "data"),
                       split="test", num_rays=None)
    H, W = ds.HEIGHT, ds.WIDTH
    views = [ds.fetch_eval_view(i) for i in range(min(N_VIEWS, len(ds)))]

    mi_t4 = MeshIntersection(mesh=mesh_t4, simplify_mesh=False,
                             scale=1.0, num_intersections=25)
    mi_pruned = MeshIntersection(mesh=mesh_pruned, simplify_mesh=False,
                                 scale=1.0, num_intersections=25)
    baked = BakedRenderer(atlas_mesh, uv, comp, sg_cfg, max_hits=25,
                          render_step_size=5e-3)

    rungs = {
        "quad_teacher": render_quad(mi_t4, rf_params, teacher_cfg, "qt"),
        "sg_t4": render_quad(mi_t4, sg_params, sg_cfg, "sg4"),
        "sg_pruned": render_quad(mi_pruned, sg_params, sg_cfg, "sgp"),
        "sg_atlas": render_quad(
            baked.mesh_intersect, sg_params, sg_cfg, "sga"
        ),
        "baked": lambda data: np.asarray(
            baked.render_view(data)
        ).reshape(-1, 3),
    }
    report = {}
    renders = {k: [] for k in rungs}
    for name, fn in rungs.items():
        t0 = time.perf_counter()
        vals = []
        for data in views:
            rgb = fn(data).reshape(H, W, 3)
            renders[name].append(rgb)
            px = np.asarray(data["pixels"]).reshape(H, W, 3)
            vals.append(float(psnr(jnp.asarray(rgb), jnp.asarray(px))))
        report[name] = {
            "psnr": round(float(np.mean(vals)), 3),
            "per_view": [round(v, 3) for v in vals],
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(name, report[name], flush=True)
    # GT-independent inter-rung deltas
    for a, b in [("sg_atlas", "baked"), ("sg_t4", "sg_pruned"),
                 ("sg_pruned", "sg_atlas"), ("quad_teacher", "sg_t4")]:
        d = float(np.mean([
            psnr(jnp.asarray(renders[a][i]), jnp.asarray(renders[b][i]))
            for i in range(len(views))
        ]))
        report[f"psnr({a},{b})"] = round(d, 3)
    print("DIAG " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
