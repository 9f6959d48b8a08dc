"""Multiresolution hash-grid encoding (instant-NGP style), TPU-native.

Replaces tiny-cuda-nn's HashGrid/Grid encodings (used throughout the
reference: examples/radiance_fields/ngp.py:340-358, examples/field.py:157-171).
Design:
  * one flat parameter table `[total_entries, F]`; per-level slices are
    dense (stride-indexed) when the level's grid fits the hashmap budget,
    spatial-hashed otherwise — mirroring tcnn's capacity behavior so the
    same (L, F, log2_T, N_min, scale) configs carry over.
  * encoding = per-level 8-corner gather + trilerp, unrolled over the
    (static) level count; XLA fuses the trilerp arithmetic around the
    gathers and the backward pass becomes a scatter-add into the table.
  * inputs are [N, 3] in [0, 1]; out-of-range coords clamp (the callers
    zero densities outside the AABB via the selector, matching the
    reference's semantics).

The per-level resolution follows tcnn's formula:
  scale_l = N_min * growth^l - 1;  res_l = ceil(scale_l) + 1
and position scaling pos = x * scale_l + 0.5.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# tcnn spatial-hash primes (the first coordinate is unmultiplied).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.4472692012786865
    dtype: str = "float32"  # table dtype; compute is fp32

    @staticmethod
    def from_max_resolution(
        max_resolution: int,
        n_levels: int = 16,
        base_resolution: int = 16,
        n_features: int = 2,
        log2_hashmap_size: int = 19,
        dtype: str = "float32",
    ) -> "HashGridConfig":
        """per_level_scale = exp((ln max_res - ln base_res)/(L-1)),
        the reference's derivation (ngp.py:320-322, field.py:154)."""
        s = math.exp(
            (math.log(max_resolution) - math.log(base_resolution))
            / (n_levels - 1)
        )
        return HashGridConfig(
            n_levels=n_levels,
            n_features=n_features,
            log2_hashmap_size=log2_hashmap_size,
            base_resolution=base_resolution,
            per_level_scale=s,
            dtype=dtype,
        )

    @property
    def level_scales(self) -> Tuple[float, ...]:
        return tuple(
            self.base_resolution * (self.per_level_scale**l) - 1.0
            for l in range(self.n_levels)
        )

    @property
    def level_resolutions(self) -> Tuple[int, ...]:
        return tuple(int(math.ceil(s)) + 1 for s in self.level_scales)

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        """Entries per level: dense res^3 if it fits, else 2^log2_T.
        Dense sizes are padded to a multiple of 8 like tcnn."""
        hashmap_size = 1 << self.log2_hashmap_size
        sizes = []
        for res in self.level_resolutions:
            dense = res**3
            size = min(dense, hashmap_size)
            size = (size + 7) // 8 * 8
            sizes.append(size)
        return tuple(sizes)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.level_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def total_entries(self) -> int:
        return self.level_offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features


def hashgrid_init(key, cfg: HashGridConfig):
    """Table init U(-1e-4, 1e-4), tcnn's default for grid encodings."""
    table = jax.random.uniform(
        key,
        (cfg.total_entries, cfg.n_features),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )
    return table.astype(jnp.dtype(cfg.dtype))


def _level_indices(coords, res: int, size: int):
    """Flat table index of integer corner coords for one level.

    coords: [..., 3] int32 in [0, res-1]. Dense stride indexing when the
    level is unhashed (size >= res^3), else xor-multiply spatial hash.
    """
    if res**3 <= size:
        return (
            coords[..., 0]
            + coords[..., 1] * res
            + coords[..., 2] * (res * res)
        )
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    # size for hashed levels is exactly 2^log2_T (a power of two).
    return (h & jnp.uint32(size - 1)).astype(jnp.int32)


# The 8 trilinear corners, as a static numpy array.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
    dtype=np.int32,
)


def hashgrid_encode(table, x, cfg: HashGridConfig):
    """Encode positions x [N, 3] in [0,1]^3 -> features [N, L*F].

    Differentiable w.r.t. both `table` (scatter-add VJP from the gather)
    and `x` (through the trilerp weights), so callers can take field
    gradients w.r.t. positions when they do not stop-gradient the input
    (the reference's back_prop flag, field.py:195-199).
    """
    x = jnp.clip(x, 0.0, 1.0)
    outs = []
    scales = cfg.level_scales
    resolutions = cfg.level_resolutions
    sizes = cfg.level_sizes
    offsets = cfg.level_offsets
    compute_dtype = jnp.float32
    for l in range(cfg.n_levels):
        pos = x.astype(compute_dtype) * jnp.asarray(
            scales[l], compute_dtype
        ) + 0.5
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor
        base = pos_floor.astype(jnp.int32)
        res = resolutions[l]
        # corners: [N, 8, 3]
        corners = jnp.clip(
            base[:, None, :] + jnp.asarray(_CORNERS)[None, :, :], 0, res - 1
        )
        idx = _level_indices(corners, res, sizes[l]) + offsets[l]  # [N, 8]
        feats = table[idx].astype(compute_dtype)  # [N, 8, F]
        # trilinear weights: prod over axes of (1-frac or frac)
        w = jnp.ones(idx.shape, compute_dtype)
        for axis in range(3):
            c = jnp.asarray(_CORNERS)[None, :, axis].astype(compute_dtype)
            f = frac[:, None, axis]
            w = w * (c * f + (1.0 - c) * (1.0 - f))
        outs.append(jnp.sum(feats * w[..., None], axis=1))  # [N, F]
    return jnp.concatenate(outs, axis=-1)


def hashgrid_encode_batched(table, x, cfg: HashGridConfig, chunk: int = 2**20):
    """Chunked encode for very large point sets (dense grid export)."""
    n = x.shape[0]
    if n <= chunk:
        return hashgrid_encode(table, x, cfg)
    pieces = []
    for i in range(0, n, chunk):
        pieces.append(hashgrid_encode(table, x[i : i + chunk], cfg))
    return jnp.concatenate(pieces, axis=0)
