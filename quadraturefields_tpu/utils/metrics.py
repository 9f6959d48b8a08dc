"""Image metrics + losses (PSNR / SSIM / smooth-L1).

The reference evaluates PSNR via -10 log10(mse)
(train_ngp_nerf_sg_occ.py:348-349), SSIM via torchmetrics
StructuralSimilarityIndexMeasure (gaussian kernel 11, sigma 1.5,
data_range 1), and LPIPS via lpips VGG (see utils/lpips.py for the
gated port). Losses follow torch.nn.functional.smooth_l1_loss
(beta=1.0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(a, b):
    return -10.0 * jnp.log(mse(a, b)) / jnp.log(10.0)


def smooth_l1_loss(pred, target, beta: float = 1.0, ray_mask=None):
    """Mean smooth-L1; `ray_mask` ([N] bool over the leading axis)
    restricts the mean to unmasked rows (used by the packed quadrature
    renderers to drop cap-truncated rays from the loss)."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d**2 / beta, d - 0.5 * beta)
    if ray_mask is None:
        return jnp.mean(loss)
    m = ray_mask.astype(loss.dtype)
    per_row = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
    return jnp.sum(per_row * m) / jnp.clip(jnp.sum(m), min=1.0)


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(img0, img1, max_val: float = 1.0, kernel_size=11, sigma=1.5):
    """Mean SSIM over channels, gaussian-windowed (torchmetrics
    defaults). Inputs: [H, W, C] in [0, max_val]; out-of-range values
    (an unclipped SG composite can exceed 1) are clipped — otherwise
    the ratio exceeds its [−1, 1] bound (a 42 dB fixture eval reported
    SSIM 1.073)."""
    img0 = jnp.clip(img0, 0.0, max_val)
    img1 = jnp.clip(img1, 0.0, max_val)
    kernel = _gaussian_kernel(kernel_size, sigma)
    kernel = kernel[:, :, None, None]  # HWIO

    def filt(x):
        # x: [H, W, C] -> depthwise conv. HIGHEST precision: the
        # E[x^2] - mu^2 variance below cancels ~7 significant digits on
        # near-constant windows; a low-precision conv (TPU convs default
        # to bf16 accumulation) leaves variance errors ~1e-3, on the
        # order of c2, which collapses the denominator (observed mean
        # SSIM 1.073 and single-window ratios up to 201 on a 42 dB eval).
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # [C,1,H,W]
        out = jax.lax.conv_general_dilated(
            x,
            jnp.transpose(kernel, (2, 3, 0, 1)),  # OIHW
            window_strides=(1, 1),
            padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.transpose(out[:, 0], (1, 2, 0))

    mu0 = filt(img0)
    mu1 = filt(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    # clamp the moment estimates to their mathematical ranges: variances
    # are >= 0 and |covariance| <= sqrt(s00*s11) (Cauchy-Schwarz); the
    # float32 estimates can violate both by ~1e-5 on flat windows
    s00 = jnp.maximum(filt(img0 * img0) - mu00, 0.0)
    s11 = jnp.maximum(filt(img1 * img1) - mu11, 0.0)
    s01 = filt(img0 * img1) - mu01
    s01 = jnp.clip(s01, -jnp.sqrt(s00 * s11), jnp.sqrt(s00 * s11))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


_LPIPS_SINGLETON = None


def lpips_metric(img0, img1):
    """LPIPS(VGG) between [H, W, 3] images in [0, 1]; NaN when no
    weights are installed (see utils/lpips.py and
    tools/convert_lpips_weights.py). The reference reports LPIPS from
    every trainer (train_ngp_nerf_sg_occ.py:262-264,
    test_baking_texture_images.py:412-429); this helper keeps the
    metric plumbing identical with or without the weight file.
    """
    global _LPIPS_SINGLETON
    if _LPIPS_SINGLETON is None:
        from .lpips import LPIPS

        _LPIPS_SINGLETON = LPIPS()
    return float(_LPIPS_SINGLETON(img0, img1))
