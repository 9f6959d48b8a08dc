"""Instant-NGP radiance fields (plain, SG-appearance, density-only).

Capability-parity with the reference model family
(examples/radiance_fields/ngp.py):
  * head="mlp"  -> NGPRadianceField   (ngp.py:657-809): bias-free fused
    MLP head, sigmoid RGB.
  * head="sg"   -> NGPRadianceFieldSGNew (ngp.py:284-470): BasicDecoder
    head emitting diffuse(3) + num_g_lobes * [axis(3), lambda(1),
    color(3)]; rgb = sigmoid(diffuse + sum_lobes c*exp(l*(axis.dir-1))).
  * head="none" -> NGPDensityField   (ngp.py:812-890).

Everything is a pure function over a params pytree; configs are frozen
dataclasses (static under jit). Matmuls run in a configurable compute
dtype (bf16 by default) with fp32 accumulation; density/compositing math
stays fp32.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activations import (
    contract_to_unisphere,
    density_activation,
)
from ..ops.hashgrid import HashGridConfig, hashgrid_encode, hashgrid_init
from ..ops.mlp import mlp_apply, mlp_init
from ..ops.sh import spherical_harmonics_deg4


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    # "sg"     -> NGPRadianceFieldSGNew (shared-axis lobes, ngp.py:284-470)
    # "sg_old" -> NGPRadianceFieldSG (per-channel 5-tuple lobes,
    #             ngp.py:473-654; head dim 3 + L*3*(3+1+1))
    # "mlp"    -> NGPRadianceField; "none" -> NGPDensityField
    head: str = "sg"  # "sg" | "sg_old" | "mlp" | "none"
    num_dim: int = 3
    use_viewdirs: bool = False
    unbounded: bool = False
    base_resolution: int = 16
    max_resolution: int = 4096
    geo_feat_dim: int = 15
    n_levels: int = 16
    # features per level (tcnn F); the cell layout supports any even F
    # — L=8/F=4 halves the gather-index count at the same output dim
    n_features: int = 2
    log2_hashmap_size: int = 19
    num_g_lobes: int = 3
    hidden_size: int = 64
    num_layers: int = 2  # hidden layers in the head decoder
    discretize: bool = False
    compute_dtype: str = "bfloat16"
    table_dtype: str = "float32"
    interp: str = "cube"  # "tet" halves table lookups (see hashgrid.py)
    grad_mode: str = "auto"  # table-gradient strategy (see hashgrid.py)
    # "cell" = one-gather-per-level table layout (hashgrid.py). At the
    # model level log2_hashmap_size keeps its tcnn meaning (log2 of the
    # per-level PARAMETER budget / n_features); cell rows hold 8x the
    # features, so the row count drops by 3 bits — equal parameters,
    # fewer (wider) gathers.
    layout: str = "corner"
    # cell-layout table-gradient contribution precision (hashgrid.py):
    # "f32" exact | "bf16pair" packed bf16 pairs (~1.6x cheaper sort)
    grad_payload: str = "f32"

    @property
    def hashgrid(self) -> HashGridConfig:
        log2_t = self.log2_hashmap_size
        if self.layout == "cell":
            log2_t = max(log2_t - 3, 4)
        return HashGridConfig.from_max_resolution(
            self.max_resolution,
            n_levels=self.n_levels,
            base_resolution=self.base_resolution,
            n_features=self.n_features,
            log2_hashmap_size=log2_t,
            dtype=self.table_dtype,
            interp=self.interp,
            grad_mode=self.grad_mode,
            layout=self.layout,
            grad_payload=self.grad_payload,
        )

    @property
    def head_output_dim(self) -> int:
        if self.head == "sg":
            return 3 + self.num_g_lobes * 7
        if self.head == "sg_old":
            return ngp_sg_old_head_output_dim(self.num_g_lobes)
        if self.head == "mlp":
            return 3
        return 0

    @property
    def dir_enc_dim(self) -> int:
        return 16 if self.use_viewdirs else 0

    @property
    def _cdtype(self):
        return jnp.dtype(self.compute_dtype)


def density_field_config(**kw) -> NGPConfig:
    """NGPDensityField defaults (reference ngp.py:815-825)."""
    base = dict(
        head="none", max_resolution=128, n_levels=5, log2_hashmap_size=17,
        geo_feat_dim=0,
    )
    base.update(kw)
    return NGPConfig(**base)


def ngp_init(key, cfg: NGPConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "table": hashgrid_init(k1, cfg.hashgrid),
        # tcnn NetworkWithInputEncoding: 64-wide, 1 hidden layer, no bias
        "mlp_base": mlp_init(
            k2,
            cfg.hashgrid.output_dim,
            1 + cfg.geo_feat_dim,
            hidden_dim=64,
            num_hidden_layers=1,
            bias=False,
        ),
    }
    if cfg.head in ("sg", "sg_old"):
        params["mlp_head"] = mlp_init(
            k3,
            cfg.dir_enc_dim + cfg.geo_feat_dim,
            cfg.head_output_dim,
            hidden_dim=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            bias=True,
        )
    elif cfg.head == "mlp":
        # tcnn Network head: 2 hidden layers, bias-free
        params["mlp_head"] = mlp_init(
            k3,
            cfg.dir_enc_dim + cfg.geo_feat_dim,
            3,
            hidden_dim=cfg.hidden_size,
            num_hidden_layers=2,
            bias=False,
        )
    return params


def ngp_normalize(x, aabb, cfg: NGPConfig):
    """World -> [0,1]^3 (+ in-bounds selector). Reference ngp.py:395-402."""
    if cfg.unbounded:
        y = contract_to_unisphere(x, aabb)
        selector = jnp.ones(x.shape[:-1], bool)
    else:
        aabb_min, aabb_max = aabb[:3], aabb[3:]
        y = (x - aabb_min) / (aabb_max - aabb_min)
        selector = jnp.all((y > 0.0) & (y < 1.0), axis=-1)
    return selector, y


def ngp_query_density(
    params, x, aabb, cfg: NGPConfig, return_feat: bool = False
):
    """density [N,1] (zeroed outside the box) and optionally the geo
    features. Reference ngp.py:404-426."""
    selector, y = ngp_normalize(x, aabb, cfg)
    h = hashgrid_encode(params["table"], y, cfg.hashgrid)
    out = mlp_apply(
        params["mlp_base"], h, compute_dtype=cfg._cdtype
    )
    density_raw = out[..., :1].astype(jnp.float32)
    density = density_activation(density_raw) * selector[..., None]
    if return_feat:
        return density, out[..., 1:]
    return density


def _spherical_gaussian_mixture(feats, dirs, num_lobes: int):
    """sum over lobes of c * exp(lambda * (axis.dir - 1)).

    feats: [N, num_lobes*7] laid out per-lobe [axis(3), lambda(1),
    color(3)]. Reference ngp.py:371-393.
    """
    n = feats.shape[0]
    lobes = feats.reshape(n, num_lobes, 7)
    axis = lobes[..., :3]
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    lam = jnp.abs(lobes[..., 3])
    c = lobes[..., 4:7]
    dot = jnp.sum(axis * dirs[:, None, :], axis=-1)
    g = jnp.exp(lam * (dot - 1.0))[..., None]
    return jnp.sum(c * g, axis=1)


def ngp_head_apply(params, embedding, dirs, cfg: NGPConfig):
    """Geo features (+ optional SH-encoded dirs) -> rgb in [0,1]."""
    if cfg.use_viewdirs:
        d01 = (dirs + 1.0) / 2.0
        d_enc = spherical_harmonics_deg4(d01)
        h = jnp.concatenate([d_enc, embedding], axis=-1)
    else:
        h = embedding
    raw = mlp_apply(
        params["mlp_head"], h, compute_dtype=cfg._cdtype
    ).astype(jnp.float32)
    if cfg.head == "sg":
        diffuse = raw[:, :3]
        sg = _spherical_gaussian_mixture(raw[:, 3:], dirs, cfg.num_g_lobes)
        return jax.nn.sigmoid(diffuse + sg)
    if cfg.head == "sg_old":
        diffuse = raw[:, :3]
        # with use_viewdirs the reference evaluates the mixture on the
        # [0,1]-remapped direction (the tcnn remap leaks into the SG
        # dot product, _query_rgb at ngp.py:616-631) — replicated for
        # checkpoint parity, not "fixed"
        d_mix = (dirs + 1.0) / 2.0 if cfg.use_viewdirs else dirs
        sg = _sg_mixture_old(raw[:, 3:], d_mix, cfg.num_g_lobes)
        return jax.nn.sigmoid(diffuse + sg)
    return jax.nn.sigmoid(raw)


def ngp_forward(params, x, dirs, aabb, cfg: NGPConfig):
    """(rgb, density). Reference ngp.py:463-470."""
    density, embedding = ngp_query_density(
        params, x, aabb, cfg, return_feat=True
    )
    rgb = ngp_head_apply(params, embedding, dirs, cfg)
    return rgb, density


def ngp_features(params, x, aabb, cfg: NGPConfig):
    """Per-point bakeable features [head_output_dim + 1]: raw head output
    concat density. Reference ngp.py:445-454 (features)."""
    density, embedding = ngp_query_density(
        params, x, aabb, cfg, return_feat=True
    )
    raw = mlp_apply(
        params["mlp_head"], embedding, compute_dtype=cfg._cdtype
    ).astype(jnp.float32)
    return jnp.concatenate([raw, density], axis=-1)


def ngp_features_to_rgb(features, dirs, cfg: NGPConfig):
    """Decode baked features (no MLP) -> rgb; the real-time render path.
    Reference ngp.py:456-461 (sg) / ngp.py:642-645 (sg_old, raw dirs)."""
    diffuse = features[:, :3]
    if cfg.head == "sg_old":
        sg = _sg_mixture_old(features[:, 3:], dirs, cfg.num_g_lobes)
    else:
        sg = _spherical_gaussian_mixture(
            features[:, 3:], dirs, cfg.num_g_lobes
        )
    return jax.nn.sigmoid(diffuse + sg)


def _sg_mixture_old(feats, dirs, num_lobes: int):
    """Old SG layout: per lobe 3 x [axis(3), lambda(1), amplitude(1)],
    one 5-tuple per color channel; a = |amp| * exp(-lambda*(1-axis.dir)).
    Reference NGPRadianceFieldSG (ngp.py:559-579)."""
    n = feats.shape[0]
    lobes = feats.reshape(n, num_lobes, 3, 5)
    axis = lobes[..., :3]
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    lam = jnp.abs(lobes[..., 3])
    amp = jnp.abs(lobes[..., 4])
    dot = jnp.sum(axis * dirs[:, None, None, :], axis=-1)
    g = amp * jnp.exp(-lam * (1.0 - dot))  # [n, lobes, 3]
    return jnp.sum(g, axis=1)


def ngp_sg_old_head_output_dim(num_lobes: int) -> int:
    """3 + num_lobes * 3 * (3+1+1), reference ngp.py:553."""
    return 3 + num_lobes * 15


def ngp_sg_old_features_to_rgb(features, dirs, num_lobes: int):
    """features_to_rgb of the older NGPRadianceFieldSG layout
    (ngp.py:642-645)."""
    diffuse = features[:, :3]
    return jax.nn.sigmoid(
        diffuse + _sg_mixture_old(features[:, 3:], dirs, num_lobes)
    )
