"""Six-stage pipeline ON THE TPU at production-proxy scale.

VERDICT round-2 #5: the env ships no real NeRF-synthetic scenes, so
this is the closest available proxy for lego/khady parity — the
procedural fixture at 200x200 views, 256^3 grid export, 4096^2
texture, max_hits=25, 3 SG lobes (the reference contract shapes from
script/run_nerfsynthetic_finetune.sh + run_*_fit_sg.sh). Records the
per-stage wall time + PSNR ladder; paste the tail into BASELINE.md.

Run: python tools/tpu_pipeline_prod.py  (takes O(1h) on the chip; use
nohup + a pid file per the repo workflow)
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

from quadraturefields_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)

T0 = time.time()
LADDER = {}
# stage checkpoints + artifacts are namespaced by encoding so a
# headline run never resumes from incompatible corner-layout artifacts
ENC_NAME = os.environ.get("QF_PROD_ENC", "headline")
CKPT = f"/tmp/qf_tpu_prod_{ENC_NAME}/stage_ckpts"
os.makedirs(CKPT, exist_ok=True)


def _done(stage):
    return os.path.exists(os.path.join(CKPT, stage, "_METADATA")) or \
        os.path.isdir(os.path.join(CKPT, stage))


def lap(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


from quadraturefields_tpu.data.fixture import write_fixture_dataset

data_root = "/tmp/qf_tpu_prod/data"  # fixture data is encoding-agnostic
out_dir = f"/tmp/qf_tpu_prod_{ENC_NAME}/out"
os.makedirs(out_dir, exist_ok=True)
if not os.path.exists(
    os.path.join(data_root, "fixture", "transforms_test.json")
):
    write_fixture_dataset(data_root, res=200, n_train=12, n_test=2)
lap("fixture ready (200x200, 12 train / 2 test)")

from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer

# Encoding selector (VERDICT r3 #3): "headline" = the TPU-fast cell
# L8F4 bf16factor config bench.py's primary metric measures — now the
# default, so the production run validates the measured config
# end-to-end; QF_PROD_ENC=corner reruns the tcnn-parity layout (the
# round-3 33.10 dB ladder).
if ENC_NAME == "headline":
    ENC = dict(layout="cell", grad_payload="bf16factor",
               n_levels=8, n_features=4)
else:
    ENC = dict(layout="corner", grad_payload="f32",
               n_levels=16, n_features=2)

t_stage = time.time()
cfg1 = Stage1Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=1200, init_batch_size=4096, batch_size_log2=16,
    grid_resolution=128, render_step_size=5e-3,
    num_lobes=0, eval_chunk=2048, ckpt_every=10**9, log_every=400,
    **ENC,
)
t1 = Stage1Trainer(cfg1)
if _done("stage1"):
    st = load_checkpoint(os.path.join(CKPT, "stage1"))
    t1.params = st["params"]
    t1.occ_state = t1.occ_state._replace(
        occs=st["occs"], binaries=st["binaries"]
    )
    m1 = {"psnr": float(st["psnr"])}
    lap(f"stage1 RESUMED from checkpoint (psnr {m1['psnr']:.2f})")
else:
    while t1.step <= cfg1.max_steps:
        t1.train_one_step()
    m1 = t1.evaluate()
    save_checkpoint(os.path.join(CKPT, "stage1"), {
        "params": t1.params, "occs": t1.occ_state.occs,
        "binaries": t1.occ_state.binaries,
        "psnr": np.float32(m1["psnr"]),
    })
LADDER["stage1"] = {"psnr": m1["psnr"], "wall_s": time.time() - t_stage}
lap(f"stage1 done: eval {m1}")
assert m1["psnr"] > 20, m1

from quadraturefields_tpu.train.stage2_field import Stage2Config, Stage2Trainer

t_stage = time.time()
cfg2 = Stage2Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=400, batch_size_log2=16, grid_resolution=128,
    render_step_size=5e-3, num_lobes=0,
    field_log2_hashmap_size=19, field_max_res=256,
    grid_export_size=256, ckpt_every=10**9, log_every=10**9,
    **ENC,
)
if os.path.exists(os.path.join(out_dir, "grads_valid.npy")) and \
        os.path.exists(
            os.path.join(out_dir, "density_grids_valid.npy")):
    lap("stage2 RESUMED (artifacts on disk)")
else:
    t2 = Stage2Trainer(
        cfg2, ngp_params=t1.params, occ_state=t1.occ_state
    )
    while t2.step <= cfg2.max_steps:
        t2.train_one_step()
    t2.export_artifacts(out_dir)
LADDER["stage2"] = {"wall_s": time.time() - t_stage}
lap("stage2 done + 256^3 artifacts exported")

from quadraturefields_tpu.geometry.extract import downsample_mesh, extract_mesh

t_stage = time.time()
from quadraturefields_tpu.geometry.meshio import Mesh, load_ply

smp_path = os.path.join(out_dir, "smp_mesh.ply")
if os.path.exists(smp_path):
    smp = load_ply(smp_path)
    mesh = smp
    lap("stage3 RESUMED (smp_mesh.ply on disk)")
else:
    mesh = extract_mesh(
        out_dir, sigma=100.0, include_grad=True, omega=30.0, thres=0.0,
        combine=True, grad_thres=1e-4, density_thres=5.0, save=True,
    )
    smp = downsample_mesh(mesh, vx=150.0)
    from quadraturefields_tpu.geometry.meshio import save_ply
    save_ply(smp_path, smp)
LADDER["stage3"] = {
    "faces": int(mesh.faces.shape[0]),
    "faces_decimated": int(smp.faces.shape[0]),
    "wall_s": time.time() - t_stage,
}
lap(f"stage3 done: mesh {mesh.faces.shape[0]} -> {smp.faces.shape[0]} faces")

# scheduling escape hatch: pre-build the cheap stages in one process
# (their artifacts resume for free), run the expensive tail later on an
# idle chip
if int(os.environ.get("QF_PROD_STOP_AFTER", 6)) <= 3:
    print("PROD PARTIAL " + json.dumps(LADDER), flush=True)
    sys.exit(0)

from quadraturefields_tpu.train.stage4_finetune import (
    Stage4Config,
    Stage4Trainer,
)

t_stage = time.time()
# deformation-field capacity: 21 = the round-3/4 ladder value; 19 = the
# round-5 promoted TPU-fast size (gate_stage4_field.py quality gate)
field_T = int(os.environ.get("QF_PROD_FIELD_T", 21))
cfg4 = Stage4Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=400, init_batch_size=4096, batch_size_log2=16,
    grid_resolution=128, render_step_size=5e-3, num_lobes=0,
    up_sample=2, max_hits=25, freeze_rf_steps=100,
    mesh_update_every=200, ckpt_every=10**9, log_every=10**9,
    scaling=0.0434, max_num_rays=1 << 16,
    field_log2_hashmap_size=field_T, field_max_res=512,
    **ENC,
)
LADDER["stage4_field_log2_T"] = field_T
t4 = Stage4Trainer(
    cfg4, ngp_params=t1.params, occ_state=t1.occ_state, mesh=smp
)
if _done("stage4"):
    st = load_checkpoint(os.path.join(CKPT, "stage4"))
    t4.params = st["params"]
    t4.occ_state = t4.occ_state._replace(
        occs=st["occs"], binaries=st["binaries"]
    )
    t4.mesh_intersect.mesh.vertices[:] = np.asarray(st["verts"])
    t4.mesh_intersect.bvh.update_vertices(np.asarray(st["verts"]))
    loss = st["last_loss"]
    t4.prefetcher.stop()
    lap("stage4 RESUMED from checkpoint")
else:
    while t4.step <= cfg4.max_steps:
        loss, nh, mse = t4.train_one_step()
        if t4.step == cfg4.mesh_update_every:
            t4.apply_mesh_update()
    t4.prefetcher.stop()
    save_checkpoint(os.path.join(CKPT, "stage4"), {
        "params": t4.params, "occs": t4.occ_state.occs,
        "binaries": t4.occ_state.binaries,
        "verts": np.asarray(t4.mesh_intersect.mesh.vertices),
        "last_loss": np.float32(float(loss)),
    })
LADDER["stage4"] = {"last_loss": float(loss),
                    "wall_s": time.time() - t_stage}
lap(f"stage4 done (last loss {float(loss):.5f})")

from quadraturefields_tpu.train.stage5_fit_sg import (
    Stage5Config,
    Stage5Trainer,
)

t_stage = time.time()
cfg5 = Stage5Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=600, init_batch_size=4096, batch_size_log2=16,
    grid_resolution=128, render_step_size=5e-3, num_lobes=3,
    up_sample=2, max_hits=25, max_num_rays=1 << 16,
    **ENC,
)
t5 = Stage5Trainer(
    cfg5, teacher_params=t4.params["rf"], occ_state=t4.occ_state,
    mesh=t4.mesh_intersect.mesh,
)
if _done("stage5"):
    st = load_checkpoint(os.path.join(CKPT, "stage5"))
    t5.sg_params = st["sg_params"]
    loss5 = st["last_loss"]
    t5.prefetcher.stop()
    lap("stage5 RESUMED from checkpoint")
else:
    while t5.step <= cfg5.max_steps:
        loss5, nh, mse5 = t5.train_one_step()
    t5.prefetcher.stop()
    save_checkpoint(os.path.join(CKPT, "stage5"), {
        "sg_params": t5.sg_params,
        "last_loss": np.float32(float(loss5)),
    })
LADDER["stage5"] = {"last_loss": float(loss5),
                    "wall_s": time.time() - t_stage}
lap(f"stage5 done (last loss {float(loss5):.5f})")

from quadraturefields_tpu.baking.stage6 import (
    BakedRenderer,
    bake_textures,
    evaluate_baked,
    prune_mesh,
    segment_and_atlas,
)
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader

t_stage = time.time()
# khady-contract default (run_shelly_baking.sh:23): at ~1M kept faces
# the 4096 atlas costs ~2.3 dB of texel fidelity (233k charts,
# tri_utilization 0.062) while 8192/pad1 is measured ~lossless vs the
# SG-at-hits ceiling — see BASELINE.md 2026-08-19 rows
texture_size = int(os.environ.get("QF_PROD_TEX", 8192))
atlas_padding = float(os.environ.get("QF_PROD_PAD", 1.0))
train_ds = SubjectLoader(
    subject_id="fixture", root_fp=data_root, split="train", num_rays=8192
)
# exhaustive prune (n_batches=None): every pixel of every train view —
# sampled pruning at this mesh size deleted 93% of visible faces and
# cost 17 dB of baked PSNR (diag_baked_quality.py, 2026-08-19) — plus
# spiral coverage rings: with only 12 train views, faces the test
# views see but no train ray hits are deleted at any threshold
# (~6.7 dB; PERF_NOTES), the trainval-coverage analog
from quadraturefields_tpu.data.own_views import spiral_prune_rings

pruned, _ = prune_mesh(
    t4.params["rf"], t4.ngp_cfg, t4.mesh_intersect, train_ds, t4.aabb,
    render_step_size=5e-3,
    extra_views=spiral_prune_rings(
        distance=4.0, n_per_ring=10, z_fracs=(0.1, 0.45, 0.8),
        resolution=200,
    ),
    out_dir=out_dir,
)
atlas_mesh, uv, v_image, tri_image = segment_and_atlas(
    pruned, texture_size, padding=atlas_padding, out_dir=out_dir
)
with open(os.path.join(out_dir, "atlas_stats.json")) as f:
    LADDER["atlas"] = json.load(f)
comp = bake_textures(
    t5.sg_params, t5.sg_cfg, v_image, tri_image, t5.aabb,
    teacher_params=t4.params["rf"], teacher_cfg=t4.ngp_cfg,
    texture_size=texture_size, out_dir=out_dir,
)
test_ds = SubjectLoader(
    subject_id="fixture", root_fp=data_root, split="test", num_rays=None
)
renderer = BakedRenderer(
    atlas_mesh, uv, comp, t5.sg_cfg, max_hits=25, render_step_size=5e-3
)
results = evaluate_baked(renderer, test_ds, n_views=2)
LADDER["stage6"] = {**{k: float(v) for k, v in results.items()},
                    "wall_s": time.time() - t_stage}
lap(f"stage6 done: baked eval {results}")

# volumetric PSNR of the same teacher for the gate (pipeline-test
# contract: baked within a few dB of the volumetric render)
vol_psnr = m1["psnr"]
LADDER["total_wall_s"] = time.time() - T0
print("PROD LADDER " + json.dumps(LADDER), flush=True)
assert np.isfinite(results["psnr"]) and results["psnr"] > 18, results
lap("TPU PIPELINE PROD OK")
