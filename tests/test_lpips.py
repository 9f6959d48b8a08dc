"""LPIPS end-to-end: weights-gated NaN path + full compute path with a
synthetic (random) VGG16 weight file produced in the converter's npz
layout. Mirrors the reference's lpips.LPIPS(net="vgg") usage
(train_ngp_nerf_sg_occ.py:262-264)."""
import numpy as np
import pytest

from quadraturefields_tpu.utils.lpips import _VGG16_CONVS, LPIPS


def _random_weights_npz(path):
    rng = np.random.default_rng(0)
    out = {}
    in_ch = 3
    for out_ch, idx in _VGG16_CONVS:
        out[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, (out_ch, in_ch, 3, 3)
        ).astype(np.float32)
        out[f"features.{idx}.bias"] = np.zeros((out_ch,), np.float32)
        in_ch = out_ch
    for k, ch in enumerate((64, 128, 256, 512, 512)):
        out[f"lin{k}.weight"] = rng.uniform(0, 0.1, ch).astype(np.float32)
    np.savez(path, **out)
    return path


def test_nan_without_weights():
    m = LPIPS(weights_path="/nonexistent/lpips.npz")
    assert np.isnan(
        m(np.zeros((8, 8, 3), np.float32), np.ones((8, 8, 3), np.float32))
    )


def test_full_compute_with_synthetic_weights(tmp_path):
    path = _random_weights_npz(str(tmp_path / "w.npz"))
    m = LPIPS(weights_path=path)
    assert m.available
    rng = np.random.default_rng(1)
    a = rng.random((32, 32, 3)).astype(np.float32)
    b = rng.random((32, 32, 3)).astype(np.float32)
    d_ab = float(m(a, b))
    d_aa = float(m(a, a))
    assert np.isfinite(d_ab) and d_ab > 0
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    # symmetry
    assert float(m(b, a)) == pytest.approx(d_ab, rel=1e-4)


def test_trainer_metric_keys(tmp_path, monkeypatch):
    """evaluate() emits psnr/ssim/lpips like the reference results
    JSON contract."""
    from quadraturefields_tpu.utils import metrics

    # force the unavailable-weights path for speed
    metrics._LPIPS_SINGLETON = None
    monkeypatch.delenv("QF_LPIPS_WEIGHTS", raising=False)
    v = metrics.lpips_metric(
        np.zeros((4, 4, 3), np.float32), np.zeros((4, 4, 3), np.float32)
    )
    assert np.isnan(v)
