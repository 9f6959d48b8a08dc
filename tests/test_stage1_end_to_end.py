"""End-to-end stage-1 training on the procedural fixture scene.

The analytic numpy renderer in data/fixture.py produces ground-truth
images independent of the JAX stack, so climbing PSNR here validates
the whole pipeline: loader -> occ-grid march -> hash-grid NGP ->
segmented-scan compositing -> loss -> Adam.
"""
import numpy as np
import pytest

from quadraturefields_tpu.data.fixture import write_fixture_dataset
from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    write_fixture_dataset(str(root), res=48, n_train=8, n_test=2)
    return str(root)


@pytest.fixture(scope="module")
def trained(fixture_root, tmp_path_factory):
    cfg = Stage1Config(
        scene="fixture",
        data_root=fixture_root,
        root=str(tmp_path_factory.mktemp("runs")),
        max_steps=160,
        init_batch_size=512,
        batch_size_log2=14,
        grid_resolution=32,
        render_step_size=2e-2,
        num_lobes=2,
        eval_chunk=2048,
        eval_views=1,
        ckpt_every=10**9,
        log_every=10**9,
    )
    trainer = Stage1Trainer(cfg)
    losses = []
    while trainer.step <= cfg.max_steps:
        loss, aux = trainer.train_one_step()
        losses.append(float(loss))
    return trainer, losses


def test_loss_decreases(trained):
    _, losses = trained
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20])


def test_eval_psnr_reasonable(trained):
    trainer, _ = trained
    metrics = trainer.evaluate()
    # soft analytic sphere is easy; even 250 tiny steps should clear 20dB
    assert metrics["psnr"] > 20.0, metrics
    assert metrics["ssim"] > 0.6, metrics


def test_occ_grid_pruned(trained):
    trainer, _ = trained
    b = np.asarray(trainer.occ_state.binaries)
    occ_frac = b.mean()
    # the sphere occupies ~2% of the box; grid must have pruned most
    assert occ_frac < 0.5
