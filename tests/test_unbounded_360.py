"""mip-NeRF-360 / unbounded path: loader on a synthetic COLMAP text
fixture, contraction round-trip, contracted occupancy update, and a
full unbounded train step (reference branch:
train_ngp_nerf_sg_occ.py:157-204, loader switch utils.py:37-45)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadraturefields_tpu.ops.activations import (
    contract_to_unisphere,
    inv_contract_from_unisphere,
)


def _write_colmap_fixture(root, scene="kitchen", n_images=10, hw=(12, 16)):
    import imageio.v2 as imageio

    h, w = hw
    ddir = os.path.join(root, scene)
    sparse = os.path.join(ddir, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(ddir, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("# cameras\n")
        f.write(f"1 PINHOLE {w} {h} {w * 1.2} {w * 1.2} {w/2} {h/2}\n")
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("# images\n")
        for i in range(n_images):
            # cameras on a ring looking inward
            a = 2 * np.pi * i / n_images
            c = np.array([3 * np.cos(a), 3 * np.sin(a), 1.0])
            fwd = -c / np.linalg.norm(c)
            right = np.cross(fwd, [0, 0, 1.0])
            right /= np.linalg.norm(right)
            up = np.cross(fwd, right)
            R_c2w = np.stack([right, up, fwd], axis=1)  # cols = axes
            R_w2c = R_c2w.T
            t = -R_w2c @ c
            # rotation matrix -> quaternion (w, x, y, z)
            tr = np.trace(R_w2c)
            qw = np.sqrt(max(0.0, 1 + tr)) / 2
            qx = (R_w2c[2, 1] - R_w2c[1, 2]) / (4 * qw + 1e-12)
            qy = (R_w2c[0, 2] - R_w2c[2, 0]) / (4 * qw + 1e-12)
            qz = (R_w2c[1, 0] - R_w2c[0, 1]) / (4 * qw + 1e-12)
            f.write(
                f"{i+1} {qw} {qx} {qy} {qz} {t[0]} {t[1]} {t[2]} 1 "
                f"im_{i:03d}.png\n\n"
            )
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            imageio.imwrite(
                os.path.join(img_dir, f"im_{i:03d}.png"), img
            )
    return ddir


def test_contract_inverse_roundtrip():
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    rng = np.random.default_rng(0)
    # points inside and far outside the box
    x = np.concatenate([
        rng.uniform(-1, 1, (64, 3)),
        rng.uniform(-30, 30, (64, 3)),
    ]).astype(np.float32)
    y = contract_to_unisphere(jnp.asarray(x), aabb)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
    x2 = inv_contract_from_unisphere(y, aabb)
    np.testing.assert_allclose(np.asarray(x2), x, rtol=2e-4, atol=2e-4)


def test_360_loader_pose_normalization(tmp_path):
    _write_colmap_fixture(str(tmp_path))
    from quadraturefields_tpu.data.nerf_360_v2 import SubjectLoader

    train = SubjectLoader(
        subject_id="kitchen", root_fp=str(tmp_path), split="train",
        num_rays=64, color_bkgd_aug="random", factor=1,
    )
    test = SubjectLoader(
        subject_id="kitchen", root_fp=str(tmp_path), split="test",
        num_rays=None, factor=1,
    )
    # every-8th-image split (nerf_360_v2.py:67-72)
    assert len(test) == 2 and len(train) == 8
    # similarity normalization keeps the camera ring near unit scale
    d = np.linalg.norm(train.camtoworlds[:, :3, 3], axis=1)
    assert d.max() < 4.0 and d.min() > 0.05
    batch = train.fetch_train_batch()
    assert batch["rays"].origins.shape == (64, 3)
    assert batch["pixels"].shape == (64, 3)
    n = np.linalg.norm(np.asarray(batch["rays"].viewdirs), axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    view = test.fetch_eval_view(0)
    assert view["pixels"].shape == (test.HEIGHT * test.WIDTH, 3)


def test_unbounded_train_step_runs(tmp_path):
    """One full stage-1 train step with unbounded=True (360 branch):
    cone marching + contracted occupancy + contraction in the model."""
    _write_colmap_fixture(str(tmp_path))
    from quadraturefields_tpu.train.stage1_ngp import (
        Stage1Config,
        Stage1Trainer,
    )

    cfg = Stage1Config(
        scene="kitchen",
        data_root=str(tmp_path),
        scene_type="360",
        data_factor=1,
        max_steps=2,
        batch_size_log2=10,
        log2_hashmap_size=12,
        grid_resolution=32,
        root=str(tmp_path / "runs"),
    )
    assert cfg.is_unbounded
    assert cfg.render_config().cone_angle == 0.004
    trainer = Stage1Trainer(cfg)
    loss, aux = trainer.train_one_step()
    assert np.isfinite(float(loss))
    loss, aux = trainer.train_one_step()
    assert np.isfinite(float(loss))


def _cube_mesh(half=0.4):
    """12-triangle cube around the origin (inside the camera ring)."""
    from quadraturefields_tpu.geometry.meshio import Mesh

    s = half
    v = np.array([
        [-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
        [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
    ], np.float32)
    f = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ], np.int32)
    return Mesh(vertices=v, faces=f)


def test_stage2_unbounded_step_and_h5_export(tmp_path):
    """Stage 2 on a 360 scene (reference train_field.py:151-152): one
    field step trains through contracted cone marching, and the grid
    export writes the chunked h5 artifact (field_utils.py:160-225)."""
    _write_colmap_fixture(str(tmp_path))
    from quadraturefields_tpu.train.stage1_ngp import (
        Stage1Config, Stage1Trainer,
    )
    from quadraturefields_tpu.train.stage2_field import (
        Stage2Config, Stage2Trainer,
    )

    cfg1 = Stage1Config(
        scene="kitchen", data_root=str(tmp_path), scene_type="360",
        data_factor=1, max_steps=2, batch_size_log2=10,
        log2_hashmap_size=12, grid_resolution=32,
        root=str(tmp_path / "runs"),
    )
    t1 = Stage1Trainer(cfg1)
    t1.train_one_step()

    cfg2 = Stage2Config(
        scene="kitchen", data_root=str(tmp_path), scene_type="360",
        data_factor=1, max_steps=2, init_batch_size=256,
        batch_size_log2=10, log2_hashmap_size=12, grid_resolution=32,
        field_log2_hashmap_size=14, field_max_res=64,
        grid_export_size=16, root=str(tmp_path / "runs"),
    )
    assert cfg2.is_unbounded
    assert cfg2.render_config().cone_angle == 0.004
    t2 = Stage2Trainer(cfg2, ngp_params=t1.params, occ_state=t1.occ_state)
    loss, nv, mse = t2.train_one_step()
    assert np.isfinite(float(loss))
    out_dir = str(tmp_path / "out")
    t2.export_artifacts(out_dir)
    h5_path = os.path.join(out_dir, "grids_valid.h5")
    assert os.path.exists(h5_path)
    import h5py

    with h5py.File(h5_path, "r") as h5:
        assert h5["grids"].shape == (16, 16, 16)
        assert h5["grads"].shape == (16, 16, 16)
        assert np.isfinite(h5["grids"][:]).all()
    assert os.path.exists(os.path.join(out_dir, "binaries.npy"))
    assert os.path.exists(
        os.path.join(out_dir, "density_grids_valid.npy")
    )


def test_stage4_stage5_unbounded_step(tmp_path):
    """Stages 4 and 5 accept a 360 scene (reference
    train_finetune.py:248-249, train_fit_sg.py:233-234): constructors
    wire the 360 loader + contracted knobs and one train step runs."""
    _write_colmap_fixture(str(tmp_path))
    from quadraturefields_tpu.train.stage4_finetune import (
        Stage4Config, Stage4Trainer,
    )
    from quadraturefields_tpu.train.stage5_fit_sg import (
        Stage5Config, Stage5Trainer,
    )
    from quadraturefields_tpu.models.ngp import ngp_init

    mesh = _cube_mesh()
    cfg4 = Stage4Config(
        scene="kitchen", data_root=str(tmp_path), scene_type="360",
        data_factor=1, max_steps=2, init_batch_size=256,
        batch_size_log2=11, log2_hashmap_size=12, grid_resolution=32,
        max_hits=4, up_sample=1, max_num_rays=1 << 11,
        field_log2_hashmap_size=14, field_max_res=64,
        root=str(tmp_path / "runs"),
    )
    assert cfg4.is_unbounded and cfg4.render_config().cone_angle == 0.004
    t4 = Stage4Trainer(
        cfg4,
        ngp_params=ngp_init(jax.random.PRNGKey(0), cfg4.ngp_config()),
        occ_state=None,
        mesh=mesh,
    )
    try:
        loss, nh, mse = t4.train_one_step()
        assert np.isfinite(float(loss))
    finally:
        t4.prefetcher.stop()

    cfg5 = Stage5Config(
        scene="kitchen", data_root=str(tmp_path), scene_type="360",
        data_factor=1, max_steps=2, init_batch_size=256,
        batch_size_log2=11, log2_hashmap_size=12, grid_resolution=32,
        max_hits=4, up_sample=1, max_num_rays=1 << 11, num_lobes=2,
        root=str(tmp_path / "runs"),
    )
    assert cfg5.is_unbounded
    t5 = Stage5Trainer(
        cfg5,
        teacher_params=ngp_init(
            jax.random.PRNGKey(1), cfg5.teacher_config()
        ),
        occ_state=None,
        mesh=mesh,
    )
    try:
        loss, nh, mse = t5.train_one_step()
        assert np.isfinite(float(loss))
    finally:
        t5.prefetcher.stop()


def test_cone_t_grid_monotone_and_bounded():
    from quadraturefields_tpu.ops.grid import (
        _cone_t_grid,
        max_march_steps_cone,
    )

    near, far, dt, c = 0.2, 100.0, 1e-3, 0.004
    ms = max_march_steps_cone(near, far, dt, c)
    t_min = jnp.asarray([near, near + 0.37])
    knots = np.asarray(_cone_t_grid(t_min, dt, c, ms))
    d = np.diff(knots, axis=1)
    assert (d > 0).all()
    # nerfacc advance: dt_i = max(dt0, t_i * cone_angle). Ray 0 starts
    # below t_star=dt/c (linear first step = dt); ray 1 starts past it
    # (geometric first step = t_min * c).
    np.testing.assert_allclose(
        d[:, 0], np.maximum(dt, np.asarray(t_min) * c), rtol=1e-3
    )
    # deep in the growth phase the ratio is exactly 1+c
    tail = knots[:, -64:]
    np.testing.assert_allclose(tail[:, 1:] / tail[:, :-1], 1 + c, rtol=1e-5)
    # the static bound reaches the far plane
    assert knots[:, -1].min() >= far
