"""Stage-6-only rerun on the prod artifacts: atlas/bake knob A/Bs.

Reuses the prod run's pruned mesh (mesh_updated.ply) and stage-4/5
checkpoints, then reruns segment -> atlas -> bake -> baked eval with
the given texture size / padding, printing atlas stats + baked PSNR.
The decomposition context (diag_baked_quality.py): SG-at-hits on this
mesh is 28.90 dB, so (28.90 - baked) is the texel-path loss being
minimized here.

Run: python tools/profiles/diag_stage6_rerun.py <texture_size> <padding>
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
    segment_and_atlas,
)
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader
from quadraturefields_tpu.geometry.meshio import load_ply
from quadraturefields_tpu.train.stage5_fit_sg import Stage5Config
from quadraturefields_tpu.utils.checkpoint import load_checkpoint

ROOT = "/tmp/qf_tpu_prod"
OUT = os.path.join(ROOT, "out")
CKPT = os.path.join(ROOT, "stage_ckpts")
TEX = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
PAD = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
RUN_DIR = os.path.join(ROOT, f"out_tex{TEX}_pad{PAD:g}")
os.makedirs(RUN_DIR, exist_ok=True)

cfg5 = Stage5Config(scene="fixture", data_root=os.path.join(ROOT, "data"),
                    num_lobes=3, max_hits=25, render_step_size=5e-3)
sg_cfg = cfg5.sg_config()
teacher_cfg = cfg5.teacher_config()

st4 = load_checkpoint(os.path.join(CKPT, "stage4"))
st5 = load_checkpoint(os.path.join(CKPT, "stage5"))

pruned = load_ply(os.path.join(OUT, "mesh_updated.ply"))
print(f"pruned mesh: {pruned.faces.shape[0]} faces; tex {TEX} pad {PAD}",
      flush=True)

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

# GT-independent texel-path loss: SG evaluated AT THE HIT POINTS on
# THIS atlas mesh vs the texture fetch, same hits/compositing
import jax.numpy as jnp

from quadraturefields_tpu.models.ngp import ngp_forward
from quadraturefields_tpu.render.quadrature import (
    HitRows,
    render_fit_sg_rows,
)
from quadraturefields_tpu.utils.metrics import psnr

fwd = lambda p, x, d, a, c: (lambda r: (r[0], r[1][..., 0]))(
    ngp_forward(p, x, d, a, c)
)
aabb = jnp.asarray(cfg5.aabb)


@jax.jit
def _sg_render(o, d, tri, ts, valid):
    hits = HitRows(tri_ids=tri, ts=ts, valid=valid)
    rgb, _, _, _ = render_fit_sg_rows(
        st5["sg_params"], st4["params"]["rf"], hits, o, d, aabb,
        sg_cfg, teacher_cfg, ngp_forward_fn=fwd,
        render_step_size=5e-3, bg_color="white",
    )
    return rgb


deltas = []
H, W = test_ds.HEIGHT, test_ds.WIDTH
for i in range(2):
    data = test_ds.fetch_eval_view(i)
    baked_img = np.asarray(renderer.render_view(data)).reshape(H, W, 3)
    o = np.asarray(data["rays"].origins, np.float32)
    d = np.asarray(data["rays"].viewdirs, np.float32)
    outs = []
    C = 4096
    npad = (o.shape[0] + C - 1) // C * C
    o = np.concatenate([o, np.repeat(o[-1:], npad - o.shape[0], 0)])
    d = np.concatenate([d, np.repeat(d[-1:], npad - d.shape[0], 0)])
    for j in range(0, npad, C):
        tri, ts, valid = renderer.mesh_intersect.intersect_rows(
            o[j:j + C], d[j:j + C]
        )
        outs.append(np.asarray(_sg_render(
            jnp.asarray(o[j:j + C]), jnp.asarray(d[j:j + C]),
            jnp.asarray(tri), jnp.asarray(ts), jnp.asarray(valid),
        )))
    sg_img = np.concatenate(outs)[: H * W].reshape(H, W, 3)
    deltas.append(float(psnr(jnp.asarray(baked_img), jnp.asarray(sg_img))))

print("STAGE6 " + json.dumps({
    "texture_size": TEX, "padding": PAD,
    **{k: float(v) for k, v in results.items()},
    "psnr_baked_vs_sg_at_hits": round(float(np.mean(deltas)), 3),
    "tri_utilization": stats["tri_utilization"],
    "n_charts": stats["n_charts"], "scale": stats["scale"],
}), flush=True)
