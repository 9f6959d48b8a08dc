"""Stage-4 deformation-field capacity quality gate (VERDICT r4 #3).

Round 4 measured the stage-4 step at 56.6k rays/s with the reference's
T=2^24 deformation field (train_finetune.py:387-399) and 90k rays/s
with T=2^19, but parked the promotion pending a quality gate. This
runs the fixture pipeline (stage 1 -> 2 -> 3 once, shared) and then
TWO stage-4 arms that differ ONLY in field_log2_hashmap_size (24 vs
19), comparing the post-finetune quadrature-render eval PSNR on held-
out views. Gate: |psnr_24 - psnr_19| <= 0.1 dB (the repo-wide quality
bar, BASELINE.json).

The fixture sphere is the only scene available in this env (BASELINE
.md preamble); its deformations are smoother than a real scene's, so
the gate is recorded with that caveat.

Run (idle chip): python tools/profiles/gate_stage4_field.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

T0 = time.time()


def lap(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


from quadraturefields_tpu.data.fixture import write_fixture_dataset
from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader

root = "/tmp/qf_gate_s4field"
data_root = os.path.join(root, "data")
out_dir = os.path.join(root, "out")
os.makedirs(out_dir, exist_ok=True)
if not os.path.exists(
    os.path.join(data_root, "fixture", "transforms_test.json")
):
    write_fixture_dataset(data_root, res=128, n_train=10, n_test=2)
lap("fixture ready (128x128, 10 train / 2 test)")

ENC = dict(layout="cell", grad_payload="bf16factor",
           n_levels=8, n_features=4)

from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer
from quadraturefields_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)

cfg1 = Stage1Config(
    scene="fixture", data_root=data_root, root=out_dir,
    max_steps=800, init_batch_size=4096, batch_size_log2=15,
    grid_resolution=128, render_step_size=5e-3,
    num_lobes=0, eval_chunk=2048, ckpt_every=10**9, log_every=400,
    **ENC,
)
t1 = Stage1Trainer(cfg1)
s1_ckpt = os.path.join(root, "stage1_ckpt")
if os.path.isdir(s1_ckpt):
    st = load_checkpoint(s1_ckpt)
    t1.params = st["params"]
    t1.occ_state = t1.occ_state._replace(
        occs=st["occs"], binaries=st["binaries"]
    )
    m1 = {"psnr": float(st["psnr"])}
    lap(f"stage1 RESUMED (psnr {m1['psnr']:.2f})")
else:
    while t1.step <= cfg1.max_steps:
        t1.train_one_step()
    m1 = t1.evaluate()
    save_checkpoint(s1_ckpt, {
        "params": t1.params, "occs": t1.occ_state.occs,
        "binaries": t1.occ_state.binaries,
        "psnr": np.float32(m1["psnr"]),
    })
    lap(f"stage1 done: {m1}")

from quadraturefields_tpu.train.stage2_field import Stage2Config, Stage2Trainer

if os.path.exists(os.path.join(out_dir, "grads_valid.npy")):
    lap("stage2 RESUMED (artifacts on disk)")
else:
    cfg2 = Stage2Config(
        scene="fixture", data_root=data_root, root=out_dir,
        max_steps=300, batch_size_log2=15, grid_resolution=128,
        render_step_size=5e-3, num_lobes=0,
        field_log2_hashmap_size=19, field_max_res=256,
        grid_export_size=256, ckpt_every=10**9, log_every=10**9,
        **ENC,
    )
    t2 = Stage2Trainer(cfg2, ngp_params=t1.params, occ_state=t1.occ_state)
    while t2.step <= cfg2.max_steps:
        t2.train_one_step()
    t2.export_artifacts(out_dir)
    lap("stage2 done")

from quadraturefields_tpu.geometry.extract import downsample_mesh, extract_mesh
from quadraturefields_tpu.geometry.meshio import load_ply, save_ply

smp_path = os.path.join(out_dir, "smp_mesh.ply")
if os.path.exists(smp_path):
    smp = load_ply(smp_path)
    lap("stage3 RESUMED (smp_mesh.ply on disk)")
else:
    mesh = extract_mesh(
        out_dir, sigma=100.0, include_grad=True, omega=30.0, thres=0.0,
        combine=True, grad_thres=1e-4, density_thres=5.0, save=True,
    )
    smp = downsample_mesh(mesh, vx=150.0)
    save_ply(smp_path, smp)
    lap(f"stage3 done: {mesh.faces.shape[0]} -> {smp.faces.shape[0]}"
        " faces")

from quadraturefields_tpu.train.stage4_finetune import (
    Stage4Config,
    Stage4Trainer,
)

# upsample must match Stage4Config.up_sample: evaluate() renders the
# upsampled ray grid and area-downsamples to the native pixels
# (reference train_finetune.py eval contract)
test_ds = SubjectLoader(
    subject_id="fixture", root_fp=data_root, split="test",
    num_rays=None, upsample=2,
)
GATE = {"stage1_psnr": m1["psnr"]}
for log2_T in (24, 19):
    arm_cache = os.path.join(root, f"arm_{log2_T}.json")
    if os.path.exists(arm_cache):
        with open(arm_cache) as f:
            GATE[f"T2^{log2_T}"] = json.load(f)
        lap(f"stage4 arm T=2^{log2_T} RESUMED: {GATE[f'T2^{log2_T}']}")
        continue
    t_arm = time.time()
    cfg4 = Stage4Config(
        scene="fixture", data_root=data_root, root=out_dir,
        max_steps=300, init_batch_size=4096, batch_size_log2=15,
        grid_resolution=128, render_step_size=5e-3, num_lobes=0,
        up_sample=2, max_hits=25, freeze_rf_steps=100,
        mesh_update_every=150, ckpt_every=10**9, log_every=10**9,
        scaling=0.0434, max_num_rays=1 << 15,
        field_log2_hashmap_size=log2_T, field_max_res=512,
        **ENC,
    )
    # each arm gets its own param/occ copies: the trainer's jitted step
    # donates params, which deletes the shared t1 buffers for the next
    # arm otherwise
    import jax.numpy as jnp

    arm_params = jax.tree_util.tree_map(jnp.copy, t1.params)
    arm_occ = t1.occ_state._replace(
        occs=jnp.copy(t1.occ_state.occs),
        binaries=jnp.copy(t1.occ_state.binaries),
    )
    t4 = Stage4Trainer(
        cfg4, ngp_params=arm_params, occ_state=arm_occ, mesh=smp
    )
    while t4.step <= cfg4.max_steps:
        loss, nh, mse = t4.train_one_step()
        if t4.step == cfg4.mesh_update_every:
            t4.apply_mesh_update()
    t4.prefetcher.stop()
    metrics = t4.evaluate(test_ds, n_views=2)
    GATE[f"T2^{log2_T}"] = {
        "psnr": float(metrics["psnr"]),
        "last_loss": float(loss),
        "wall_s": round(time.time() - t_arm, 1),
    }
    with open(arm_cache, "w") as f:
        json.dump(GATE[f"T2^{log2_T}"], f)
    lap(f"stage4 arm T=2^{log2_T}: {GATE[f'T2^{log2_T}']}")

delta = GATE["T2^24"]["psnr"] - GATE["T2^19"]["psnr"]
GATE["delta_db"] = round(delta, 4)
GATE["pass"] = bool(abs(delta) <= 0.1)
print("GATE_STAGE4_FIELD " + json.dumps(GATE), flush=True)
