"""LPIPS perceptual metric (VGG variant), weights-gated.

The reference evaluates LPIPS(net="vgg") in every trainer
(train_ngp_nerf_sg_occ.py:262-264 etc.). This environment ships no
torchvision/lpips packages and has no network egress, so pretrained VGG
weights cannot be materialized here. This module implements the full
LPIPS computation in JAX — VGG16 feature trunk, unit-normalized feature
differences, linear calibration weights, spatial averaging — and loads
weights from a local .npz when available (set QF_LPIPS_WEIGHTS or pass
`weights_path`). Without weights it reports NaN so metric plumbing
stays intact end-to-end.

Weight file format: npz with conv weights "features.{i}.weight"/"bias"
(torchvision VGG16 layer indices) and "lin{k}.weight" calibration
vectors (lpips package layout).
"""
from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, torchvision features index)
_VGG16_CONVS = [
    (64, 0), (64, 2),
    (128, 5), (128, 7),
    (256, 10), (256, 12), (256, 14),
    (512, 17), (512, 19), (512, 21),
    (512, 24), (512, 26), (512, 28),
]
# relu indices after which LPIPS taps features (relu1_2 ... relu5_3)
_TAP_AFTER = {2, 7, 14, 21, 28}
_POOL_AFTER = {2, 7, 14, 21}  # maxpool after these conv indices (not 28)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    _warned_nan = False  # one loud warning per process, not per eval

    def __init__(self, weights_path: Optional[str] = None):
        weights_path = weights_path or os.environ.get("QF_LPIPS_WEIGHTS")
        self.params = None
        if weights_path and os.path.exists(weights_path):
            raw = np.load(weights_path)
            self.params = {k: jnp.asarray(raw[k]) for k in raw.files}

    @property
    def available(self) -> bool:
        return self.params is not None

    def _features(self, x):
        """x: [N, H, W, 3] in [-1, 1] -> list of tap activations."""
        h = (x - _SHIFT) / _SCALE
        h = jnp.transpose(h, (0, 3, 1, 2))  # NCHW
        taps = []
        for _, idx in _VGG16_CONVS:
            w = self.params[f"features.{idx}.weight"]  # [O, I, 3, 3]
            b = self.params[f"features.{idx}.bias"]
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(1, 1), padding="SAME"
            ) + b[None, :, None, None]
            h = jax.nn.relu(h)
            if idx in _TAP_AFTER:
                taps.append(h)
            if idx in _POOL_AFTER:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID",
                )
        return taps

    def __call__(self, img0, img1):
        """img0/img1: [H, W, 3] in [0, 1]. Returns scalar LPIPS or NaN
        when weights are unavailable."""
        if not self.available:
            if not LPIPS._warned_nan:
                LPIPS._warned_nan = True
                warnings.warn(
                    "LPIPS weights unavailable — emitting NaN for every "
                    "lpips metric. Provide an npz via QF_LPIPS_WEIGHTS "
                    "(build it with tools/convert_lpips_weights.py from "
                    "the torch `lpips` package; see that script's "
                    "docstring for the procedure).",
                    stacklevel=2,
                )
            return float("nan")
        x0 = jnp.asarray(img0)[None] * 2.0 - 1.0
        x1 = jnp.asarray(img1)[None] * 2.0 - 1.0
        f0s = self._features(x0)
        f1s = self._features(x1)
        total = 0.0
        for k, (f0, f1) in enumerate(zip(f0s, f1s)):
            n0 = f0 / jnp.sqrt(
                jnp.sum(f0**2, axis=1, keepdims=True) + 1e-10
            )
            n1 = f1 / jnp.sqrt(
                jnp.sum(f1**2, axis=1, keepdims=True) + 1e-10
            )
            diff = (n0 - n1) ** 2
            lin = self.params[f"lin{k}.weight"].reshape(1, -1, 1, 1)
            total = total + jnp.mean(
                jnp.sum(diff * lin, axis=1), axis=(1, 2)
            )
        return float(total[0])
