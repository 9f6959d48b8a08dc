"""Image metrics (utils/metrics.py).

SSIM regression: the E[x^2] - mu^2 moment estimates cancel ~7
significant digits on near-constant windows; without HIGHEST-precision
convs and range clamping the denominator collapses and mean SSIM
exceeds 1 (a 42 dB prod-pipeline eval reported 1.073, with
single-window ratios up to 201). Reference metric contract:
train_ngp_nerf_sg_occ.py:262-264 (torchmetrics SSIM in [0, 1]).
"""
import numpy as np
import jax.numpy as jnp

from quadraturefields_tpu.utils.metrics import psnr, ssim


def _float64_ssim(a, b, ks=11, sigma=1.5):
    x = np.arange(ks) - ks // 2
    g = np.exp(-x**2 / (2 * sigma**2))
    g /= g.sum()
    k2 = np.outer(g, g)
    h, w, c = a.shape
    oh, ow = h - ks + 1, w - ks + 1

    def filt(im):
        out = np.empty((oh, ow, c))
        for ch in range(c):
            for i in range(oh):
                for j in range(ow):
                    out[i, j, ch] = (im[i:i + ks, j:j + ks, ch] * k2).sum()
        return out

    mu0, mu1 = filt(a), filt(b)
    s00 = filt(a * a) - mu0**2
    s11 = filt(b * b) - mu1**2
    s01 = filt(a * b) - mu0 * mu1
    c1, c2 = 1e-4, 9e-4
    return np.mean(
        ((2 * mu0 * mu1 + c1) * (2 * s01 + c2))
        / ((mu0**2 + mu1**2 + c1) * (s00 + s11 + c2))
    )


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    x = rng.random((48, 48, 3)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-6


def test_ssim_flat_regions_stay_in_range():
    """Near-constant windows must not push SSIM above 1 (float32
    variance cancellation regression)."""
    rng = np.random.default_rng(0)
    z = np.ones((48, 48, 3), np.float32)
    z[15:30, 15:30] = 0.3
    zn = np.clip(z + rng.normal(0, 0.007, z.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(z), jnp.asarray(zn)))
    ref = _float64_ssim(z.astype(np.float64), zn.astype(np.float64))
    assert got <= 1.0 + 1e-6
    assert abs(got - ref) < 1e-3


def test_ssim_orders_degradation():
    rng = np.random.default_rng(1)
    x = rng.random((48, 48, 3)).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.01, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert s_small > s_big > 0.0


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4
