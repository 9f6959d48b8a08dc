"""Full six-stage pipeline integration test at tiny scale on the
procedural fixture scene: NeRF -> field -> mesh -> finetune -> fit-SG
-> bake -> baked eval. Every stage consumes the previous stage's real
artifacts, mirroring the reference's script DAG (SURVEY §0)."""
import os
import json

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.pipeline

from quadraturefields_tpu.baking.stage6 import (
    BakedRenderer,
    bake_textures,
    evaluate_baked,
    prune_mesh,
    segment_and_atlas,
)
from quadraturefields_tpu.data.fixture import write_fixture_dataset
from quadraturefields_tpu.geometry.extract import downsample_mesh, extract_mesh
from quadraturefields_tpu.geometry.intersect import MeshIntersection
from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer
from quadraturefields_tpu.train.stage2_field import (
    Stage2Config,
    Stage2Trainer,
)
from quadraturefields_tpu.train.stage4_finetune import (
    Stage4Config,
    Stage4Trainer,
)
from quadraturefields_tpu.train.stage5_fit_sg import (
    Stage5Config,
    Stage5Trainer,
)

RES = 40
GRID_EXPORT = 48


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    """Run stages 1-3 once; later tests extend the chain."""
    data_root = str(tmp_path_factory.mktemp("data"))
    out_dir = str(tmp_path_factory.mktemp("out"))
    write_fixture_dataset(data_root, res=RES, n_train=8, n_test=2)

    # ---- stage 1 (plain mlp head; the finetune recipe uses num_lobes=0)
    cfg1 = Stage1Config(
        scene="fixture", data_root=data_root, root=out_dir,
        max_steps=220, init_batch_size=512, batch_size_log2=13,
        grid_resolution=32, render_step_size=2e-2, num_lobes=0,
        eval_chunk=2048, ckpt_every=10**9, log_every=10**9,
    )
    t1 = Stage1Trainer(cfg1)
    while t1.step <= cfg1.max_steps:
        t1.train_one_step()

    # ---- stage 2 (small field, small grid export)
    cfg2 = Stage2Config(
        scene="fixture", data_root=data_root, root=out_dir,
        max_steps=120, batch_size_log2=13, grid_resolution=32,
        render_step_size=2e-2, num_lobes=0,
        field_log2_hashmap_size=14, field_max_res=64,
        grid_export_size=GRID_EXPORT, ckpt_every=10**9, log_every=10**9,
    )
    t2 = Stage2Trainer(
        cfg2, ngp_params=t1.params, occ_state=t1.occ_state,
    )
    while t2.step <= cfg2.max_steps:
        t2.train_one_step()
    t2.export_artifacts(out_dir)

    # ---- stage 3
    mesh = extract_mesh(
        out_dir, sigma=100.0, include_grad=True, omega=30.0, thres=0.0,
        combine=True, grad_thres=1e-4, density_thres=5.0, save=True,
    )
    smp = downsample_mesh(mesh, vx=40.0)
    return {
        "data_root": data_root,
        "out_dir": out_dir,
        "t1": t1,
        "t2": t2,
        "mesh": mesh,
        "smp": smp,
    }


def test_stage2_field_loss_decreases(ctx):
    t2 = ctx["t2"]
    losses = []
    for _ in range(20):
        loss, _, _ = t2.train_one_step()
        losses.append(float(loss))
    assert np.isfinite(losses).all()


def test_stage3_mesh_near_sphere(ctx):
    """The extracted surface must hug the fixture sphere (r=0.5 world =
    1/3 of the normalized [-1,1] cube)."""
    mesh = ctx["mesh"]
    assert mesh.vertices.shape[0] > 50
    # mesh coords are normalized to [-1,1] over the 1.5-scaled aabb.
    # The fixture's soft density falloff puts the union isosurface at
    # r ~ 0.75 (sphere core at 0.5); the bound catches garbage (> 0.85
    # = background shell) or collapse (< 0.3), and the real stage-3
    # quality contract is the downstream baked-vs-volumetric PSNR gate.
    r = np.linalg.norm(mesh.vertices * 1.5, axis=1)
    med = np.median(r)
    assert 0.3 < med < 0.8, med
    assert os.path.exists(os.path.join(ctx["out_dir"], "mesh.ply"))
    assert os.path.exists(os.path.join(ctx["out_dir"], "grids_valid.npy"))
    smp = ctx["smp"]
    assert smp.vertices.shape[0] < mesh.vertices.shape[0]


@pytest.fixture(scope="module")
def stage4(ctx):
    cfg4 = Stage4Config(
        scene="fixture", data_root=ctx["data_root"], root=ctx["out_dir"],
        max_steps=50, init_batch_size=512, batch_size_log2=12,
        grid_resolution=32, render_step_size=2e-2, num_lobes=0,
        up_sample=1, max_hits=8, freeze_rf_steps=20,
        mesh_update_every=30, ckpt_every=10**9, log_every=10**9,
        scaling=0.02, max_num_rays=1 << 13,
        field_log2_hashmap_size=14, field_max_res=64,
    )
    t4 = Stage4Trainer(
        cfg4, ngp_params=ctx["t1"].params, occ_state=ctx["t1"].occ_state,
        mesh=ctx["smp"],
    )
    losses = []
    while t4.step <= cfg4.max_steps:
        loss, nh, mse = t4.train_one_step()
        losses.append(float(loss))
        if t4.step == cfg4.mesh_update_every:
            t4.apply_mesh_update()
    t4.prefetcher.stop()
    return t4, losses


def test_stage4_finetune_runs(stage4):
    t4, losses = stage4
    assert np.isfinite(losses).all()
    # quadrature + volumetric joint loss should drop
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_stage4_volumetric_psnr_floor(ctx, stage4):
    """The finetuned field must still render the fixture well
    volumetrically — the quality anchor the baked result is later
    measured against (VERDICT #5)."""
    from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader

    t4, _ = stage4
    test_ds = SubjectLoader(
        subject_id="fixture", root_fp=ctx["data_root"], split="test",
        num_rays=None,
    )
    metrics = t4.evaluate(test_ds, n_views=1)
    print(f"stage4 volumetric psnr={metrics['psnr']:.2f}")
    ctx["psnr4"] = metrics["psnr"]
    assert metrics["psnr"] > 14.0, metrics


@pytest.fixture(scope="module")
def stage5(ctx, stage4):
    t4, _ = stage4
    cfg5 = Stage5Config(
        scene="fixture", data_root=ctx["data_root"], root=ctx["out_dir"],
        max_steps=60, init_batch_size=512, batch_size_log2=12,
        grid_resolution=32, render_step_size=2e-2, num_lobes=2,
        up_sample=1, max_hits=8, max_num_rays=1 << 13,
    )
    t5 = Stage5Trainer(
        cfg5, teacher_params=t4.params["rf"], occ_state=t4.occ_state,
        mesh=t4.mesh_intersect.mesh,
    )
    losses = []
    while t5.step <= cfg5.max_steps:
        loss, nh, mse = t5.train_one_step()
        losses.append(float(loss))
    t5.prefetcher.stop()
    return t5, losses


def test_stage5_fit_sg_runs(stage5):
    t5, losses = stage5
    assert np.isfinite(losses).all()
    # at this tiny scale the fit starts near its plateau (the SG init
    # already composites close to the teacher), so "decreasing" is only
    # assertable up to plateau noise (~±5% between 10-step windows —
    # both dense and packed runs have flipped the strict version)
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 1.1
    # absolute sanity floor: at this tiny scale the SG fit plateaus
    # around 1.2e-2 smooth-l1 (measured); a diverged/NaN-adjacent fit
    # sits an order of magnitude higher
    assert np.mean(losses[-10:]) < 2e-2, np.mean(losses[-10:])


def test_stage6_bake_and_eval(ctx, stage4, stage5):
    from quadraturefields_tpu.data.nerf_synthetic import SubjectLoader

    t4, _ = stage4
    t5, _ = stage5
    out_dir = ctx["out_dir"]
    texture_size = 256

    train_ds = SubjectLoader(
        subject_id="fixture", root_fp=ctx["data_root"], split="train",
        num_rays=2048,
    )
    pruned, tri_w = prune_mesh(
        t4.params["rf"], t4.ngp_cfg, t4.mesh_intersect, train_ds,
        t4.aabb, render_step_size=2e-2, n_batches=8,
        out_dir=out_dir,
    )
    assert pruned.faces.shape[0] > 0
    assert pruned.faces.shape[0] <= t4.mesh_intersect.n_faces

    atlas_mesh, uv, v_image, tri_image = segment_and_atlas(
        pruned, texture_size, out_dir=out_dir
    )
    assert (tri_image >= 0).sum() > 100
    assert uv.min() >= 0 and uv.max() < texture_size
    # atlas packing efficiency floor (VERDICT round-2 #7): the skyline
    # packer must keep the chart bounding rects above 50% of the atlas
    # on the pipeline fixture (xatlas retry-shrink contract,
    # generate_uv_xatlas_old.py:69-94)
    with open(os.path.join(out_dir, "atlas_stats.json")) as f:
        astats = json.load(f)
    assert astats["rect_utilization"] > 0.5, astats
    assert astats["raster_utilization"] > 0.3, astats

    comp = bake_textures(
        t5.sg_params, t5.sg_cfg, v_image, tri_image, t5.aabb,
        teacher_params=t4.params["rf"], teacher_cfg=t4.ngp_cfg,
        texture_size=texture_size, out_dir=out_dir,
    )
    assert os.path.exists(
        os.path.join(out_dir, f"texture_{texture_size}", "alpha.png")
    )

    test_ds = SubjectLoader(
        subject_id="fixture", root_fp=ctx["data_root"], split="test",
        num_rays=None,
    )
    renderer = BakedRenderer(
        atlas_mesh, uv, comp, t5.sg_cfg, max_hits=8,
        render_step_size=2e-2,
    )
    results = evaluate_baked(
        renderer, test_ds, n_views=1,
        out_path=os.path.join(
            out_dir, f"results_baking_textureimage_{texture_size}.json"
        ),
    )
    psnr4 = ctx.get("psnr4")
    print(
        f"baked psnr={results['psnr']:.2f} vs stage4 volumetric "
        f"psnr={psnr4}"
    )
    # The fidelity contract (VERDICT #5): baking quantizes appearance
    # into uint8 textures but must stay close to the volumetric render
    # of the SAME model — a silent 1-dB bake regression must fail here.
    assert np.isfinite(results["psnr"]), results
    assert results["psnr"] > 13.0, results
    if psnr4 is not None:
        assert results["psnr"] > psnr4 - 2.0, (results["psnr"], psnr4)
    assert results["fps"] > 0
