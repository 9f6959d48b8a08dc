"""Full six-stage pipeline smoke ON THE TPU at fixture scale.

The pytest pipeline runs on the forced-CPU backend; this script drives
the same chain against the real chip (remote compiles + device math),
catching TPU-only defects (oversized jit constants, unsupported ops,
precision surprises). Uses the persistent jit cache.
"""
import os, sys, time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

T0 = time.time()


def lap(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


from quadraturefields_tpu.data.fixture import write_fixture_dataset

data_root = "/tmp/qf_tpu_pipe/data"
out_dir = "/tmp/qf_tpu_pipe/out"
os.makedirs(out_dir, exist_ok=True)
write_fixture_dataset(data_root, res=40, n_train=8, n_test=2)
lap("fixture written")

from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer

cfg1 = Stage1Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=220, init_batch_size=512, batch_size_log2=13,
    grid_resolution=32, render_step_size=2e-2, num_lobes=0,
    eval_chunk=2048, ckpt_every=10**9, log_every=10**9,
)
t1 = Stage1Trainer(cfg1)
while t1.step <= cfg1.max_steps:
    t1.train_one_step()
m1 = t1.evaluate()
lap(f"stage1 done: eval {m1}")
assert m1["psnr"] > 13, m1

from quadraturefields_tpu.train.stage2_field import Stage2Config, Stage2Trainer

cfg2 = Stage2Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=120, batch_size_log2=13, grid_resolution=32,
    render_step_size=2e-2, num_lobes=0,
    field_log2_hashmap_size=14, field_max_res=64,
    grid_export_size=48, ckpt_every=10**9, log_every=10**9,
)
t2 = Stage2Trainer(cfg2, ngp_params=t1.params, occ_state=t1.occ_state)
while t2.step <= cfg2.max_steps:
    t2.train_one_step()
t2.export_artifacts(out_dir)
lap("stage2 done + artifacts exported")

from quadraturefields_tpu.geometry.extract import downsample_mesh, extract_mesh

mesh = extract_mesh(
    out_dir, sigma=100.0, include_grad=True, omega=30.0, thres=0.0,
    combine=True, grad_thres=1e-4, density_thres=5.0, save=True,
)
smp = downsample_mesh(mesh, vx=40.0)
lap(f"stage3 done: mesh {mesh.faces.shape[0]} -> {smp.faces.shape[0]} faces")

from quadraturefields_tpu.train.stage4_finetune import (
    Stage4Config,
    Stage4Trainer,
)

cfg4 = Stage4Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=60, init_batch_size=512, batch_size_log2=12,
    grid_resolution=32, render_step_size=2e-2, num_lobes=0,
    up_sample=1, max_hits=8, freeze_rf_steps=20,
    mesh_update_every=40, ckpt_every=10**9, log_every=10**9,
    scaling=0.02, max_num_rays=1 << 13,
    field_log2_hashmap_size=14, field_max_res=64,
)
t4 = Stage4Trainer(
    cfg4, ngp_params=t1.params, occ_state=t1.occ_state, mesh=smp
)
while t4.step <= cfg4.max_steps:
    loss, nh, mse = t4.train_one_step()
    if t4.step == cfg4.mesh_update_every:
        t4.apply_mesh_update()
t4.prefetcher.stop()
lap(f"stage4 done (last loss {float(loss):.5f})")

from quadraturefields_tpu.train.stage5_fit_sg import (
    Stage5Config,
    Stage5Trainer,
)

cfg5 = Stage5Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=80, init_batch_size=512, batch_size_log2=12,
    grid_resolution=32, render_step_size=2e-2, num_lobes=2,
    up_sample=1, max_hits=8, max_num_rays=1 << 13,
)
t5 = Stage5Trainer(
    cfg5, teacher_params=t4.params["rf"], occ_state=t4.occ_state,
    mesh=t4.mesh_intersect.mesh,
)
while t5.step <= cfg5.max_steps:
    loss5, nh, mse5 = t5.train_one_step()
t5.prefetcher.stop()
lap(f"stage5 done (last loss {float(loss5):.5f})")

from quadraturefields_tpu.baking.stage6 import (
    BakedRenderer,
    bake_textures,
    evaluate_baked,
    prune_mesh,
    segment_and_atlas,
)
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader

texture_size = 256
train_ds = SubjectLoader(
    subject_id="fixture", root_fp=data_root, split="train", num_rays=2048
)
pruned, _ = prune_mesh(
    t4.params["rf"], t4.ngp_cfg, t4.mesh_intersect, train_ds, t4.aabb,
    render_step_size=2e-2, n_batches=8, out_dir=out_dir,
)
atlas_mesh, uv, v_image, tri_image = segment_and_atlas(
    pruned, texture_size, out_dir=out_dir
)
comp = bake_textures(
    t5.sg_params, t5.sg_cfg, v_image, tri_image, t5.aabb,
    teacher_params=t4.params["rf"], teacher_cfg=t4.ngp_cfg,
    texture_size=texture_size, out_dir=out_dir,
)
test_ds = SubjectLoader(
    subject_id="fixture", root_fp=data_root, split="test", num_rays=None
)
renderer = BakedRenderer(
    atlas_mesh, uv, comp, t5.sg_cfg, max_hits=8, render_step_size=2e-2
)
results = evaluate_baked(renderer, test_ds, n_views=1)
lap(f"stage6 done: baked eval {results}")
assert np.isfinite(results["psnr"]) and results["psnr"] > 12, results
lap("TPU PIPELINE SMOKE OK")
