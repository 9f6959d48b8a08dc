"""Texture-map feature compression (stage 6).

Parity rebuild of reference texture_utils.FeatureCompression
(texture_utils.py:17-203): the SG feature vector
[diffuse(3), per-lobe (axis(3), lambda(1), color(3)) x L, sigma] is
quantized to uint8 PNG maps:
  alpha.png          [N,N]    sigma -> 1-exp(-0.005 sigma)
  diffuse.png        [N,N,3]  sigmoid or linear codec
  lambda_axis_i.png  [N,N,3]  (compressed lambda, azimuth, elevation)
  color_i.png        [N,N,3]  lobe color codec
Decoding (get_features_from_texture_map) is jit-friendly device math —
the real-time baked render path.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops.quantize import (
    compress_colors,
    compress_lambda,
    compress_polar_coordinates,
    compress_sigma,
    inverse_of_azimuth_and_elevation,
    inverse_of_compressed_colors,
    inverse_of_compressed_lambda,
    inverse_of_compressed_sigma,
)


class FeatureCompression:
    def __init__(
        self,
        num_lobes: int,
        initialize: bool = False,
        texture_size: int | None = None,
        path: str | None = None,
        compression_type: str = "sigmoid",
        lambda_thres: float = 7.5,
    ):
        self.num_lobes = num_lobes
        self.texture_size = texture_size
        # reference naming: "sigmoid" selects the sigmoid codec which the
        # low-level fns call "sigma" (texture_utils.py:74 + ngp.py:264)
        self.compression_type = (
            "sigma" if compression_type == "sigmoid" else compression_type
        )
        self.lambda_thres = lambda_thres

        if initialize:
            n = texture_size
            self.alpha = np.zeros((n, n), np.uint8)
            self.diffuse = np.zeros((n, n, 3), np.uint8)
            self.sg_colors = [
                np.zeros((n, n, 3), np.uint8) for _ in range(num_lobes)
            ]
            self.lambdas = [
                np.zeros((n, n, 3), np.uint8) for _ in range(num_lobes)
            ]
        else:
            import imageio.v2 as imageio

            self.alpha = np.asarray(imageio.imread(path + "alpha.png"))
            self.diffuse = np.asarray(imageio.imread(path + "diffuse.png"))
            self.sg_colors = [
                np.asarray(imageio.imread(path + f"color_{i}.png"))
                for i in range(num_lobes)
            ]
            self.lambdas = [
                np.asarray(imageio.imread(path + f"lambda_axis_{i}.png"))
                for i in range(num_lobes)
            ]
            self.texture_size = self.alpha.shape[0]

    def compress(self, features):
        """features [N, 3 + 7*num_lobes + 1] -> dict of uint8 arrays
        (texture_utils.py:67-98). Runs on HOST numpy: baking writes
        millions of texels and per-chunk device round trips cost
        minutes on the remote platform (measured 316 s for 5.6M texels
        vs ~2 s in numpy)."""
        features = np.asarray(features)
        n = features.shape[0]
        sigma = features[:, -1]
        alpha = compress_sigma(sigma)
        diffuse = compress_colors(
            features[..., :3], compress_type=self.compression_type
        )
        lobes = features[..., 3:-1].reshape(n, self.num_lobes, 7)
        azimuth, elevation = compress_polar_coordinates(lobes[..., :3])
        comp_lambda = compress_lambda(
            np.abs(lobes[..., 3]), self.lambda_thres
        )
        data = {
            "alpha": np.asarray(alpha),
            "diffuse": np.asarray(diffuse),
            "lambdas": [],
            "colors": [],
        }
        for i in range(self.num_lobes):
            data["lambdas"].append(
                np.stack(
                    [
                        np.asarray(comp_lambda[..., i]),
                        np.asarray(azimuth[..., i]),
                        np.asarray(elevation[..., i]),
                    ],
                    axis=-1,
                )
            )
            data["colors"].append(
                np.asarray(
                    compress_colors(
                        lobes[..., i, 4:],
                        compress_type=self.compression_type,
                    )
                )
            )
        return data

    def load_features_into_maps(self, features, indices):
        """Write compressed features into texel (row, col) positions
        (texture_utils.py:197-203)."""
        data = self.compress(features)
        r, c = np.asarray(indices[:, 0]), np.asarray(indices[:, 1])
        self.alpha[r, c] = data["alpha"]
        self.diffuse[r, c] = data["diffuse"]
        for i in range(self.num_lobes):
            self.lambdas[i][r, c] = data["lambdas"][i]
            self.sg_colors[i][r, c] = data["colors"][i]

    def save_to_file(self, path: str):
        import imageio.v2 as imageio

        os.makedirs(os.path.dirname(path + "x"), exist_ok=True)
        imageio.imwrite(path + "alpha.png", self.alpha)
        imageio.imwrite(path + "diffuse.png", self.diffuse)
        for i in range(self.num_lobes):
            imageio.imwrite(path + f"color_{i}.png", self.sg_colors[i])
            imageio.imwrite(path + f"lambda_axis_{i}.png", self.lambdas[i])

    def as_device_arrays(self):
        """Stacked jnp arrays for the jitted baked render path."""
        return {
            "alpha": jnp.asarray(self.alpha),
            "diffuse": jnp.asarray(self.diffuse),
            "lambda_axis": jnp.stack(
                [jnp.asarray(a) for a in self.lambdas]
            ),  # [L, N, N, 3]
            "colors": jnp.stack(
                [jnp.asarray(a) for a in self.sg_colors]
            ),  # [L, N, N, 3]
        }

    def as_device_array_packed(self):
        """All maps channel-packed into ONE [N, N, 1+3+6L] uint8 array:
        the baked render path then pays one texture gather per hit
        instead of 2+2L (TPU gather cost scales with the index count,
        PERF_NOTES.md). Channel layout: [alpha, diffuse(3), per-lobe
        (lambda, azimuth, elevation, color(3))]."""
        parts = [self.alpha[..., None], self.diffuse]
        for i in range(self.num_lobes):
            parts.append(self.lambdas[i])
            parts.append(self.sg_colors[i])
        # (power-of-two channel padding was measured and does NOT speed
        # the per-hit gather — it is index-latency-bound, not
        # alignment-bound: 22.7 ms at 22B rows vs 26.1 ms at 32B,
        # profiles/profile_baked.py 2026-08-17)
        return jnp.asarray(np.concatenate(parts, axis=-1))

    def get_features_from_packed_texels(self, tex):
        """Decode a gathered [M, 1+3+6L] uint8 texel block (from
        as_device_array_packed) -> [M, 3 + 7L + 1] feature vectors —
        same output contract as get_features_from_texture_map."""
        sigma = inverse_of_compressed_sigma(tex[:, 0])
        diffuse = inverse_of_compressed_colors(
            tex[:, 1:4], compress_type=self.compression_type
        )
        feats = [diffuse]
        for i in range(self.num_lobes):
            o = 4 + 6 * i
            lam = inverse_of_compressed_lambda(
                tex[:, o], self.lambda_thres
            )
            axis = inverse_of_azimuth_and_elevation(
                tex[:, o + 1], tex[:, o + 2]
            )
            color = inverse_of_compressed_colors(
                tex[:, o + 3:o + 6],
                compress_type=self.compression_type,
            )
            feats.append(axis)
            feats.append(lam[:, None])
            feats.append(color)
        feats.append(sigma[:, None])
        return jnp.concatenate(feats, axis=-1)

    def get_features_from_texture_map(self, indices, maps=None):
        """Texel (row, col) -> decoded feature vector
        [diffuse(3), lobes(7L), sigma(1)] (texture_utils.py:149-175).
        jit-friendly when `maps` (as_device_arrays) is passed."""
        maps = maps if maps is not None else self.as_device_arrays()
        r, c = indices[:, 0], indices[:, 1]
        sigma = inverse_of_compressed_sigma(maps["alpha"][r, c])
        diffuse = inverse_of_compressed_colors(
            maps["diffuse"][r, c], compress_type=self.compression_type
        )
        feats = [diffuse]
        for i in range(self.num_lobes):
            shared = maps["lambda_axis"][i][r, c]
            lam = inverse_of_compressed_lambda(
                shared[:, 0], self.lambda_thres
            )
            axis = inverse_of_azimuth_and_elevation(
                shared[:, 1], shared[:, 2]
            )
            color = inverse_of_compressed_colors(
                maps["colors"][i][r, c],
                compress_type=self.compression_type,
            )
            feats.append(axis)
            feats.append(lam[:, None])
            feats.append(color)
        feats.append(sigma[:, None])
        return jnp.concatenate(feats, axis=-1)
