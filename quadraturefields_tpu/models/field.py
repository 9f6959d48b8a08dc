"""Quadrature field: hash-grid scalar field with an ELU decoder.

Reference: examples/field.py:130-270 (Field). Key semantics preserved:
  * domain is [-scale, scale]^3 mapped to [0,1]^3;
  * the hash-grid input is stop-gradient'ed unless back_prop is set
    (field.py:195-199), so position gradients flow only through the
    xyz-concat branch of the decoder — this is the reference's exact
    choice and makes the stage-2 "double backprop" cheap;
  * decoder input is concat([x_norm, features]) (field.py:200);
  * the grid growth factor is b = exp(ln(max_res*scale/min_res)/(L-1))
    (field.py:154) — note the *scale factor* enters the top resolution.

field_with_grad replaces torch autograd.grad(create_graph=True) with a
jax.vjp that stays differentiable w.r.t. params, so the stage-2 loss can
backprop through the field gradient.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.hashgrid import HashGridConfig, hashgrid_encode, hashgrid_init
from ..ops.mlp import mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    scale: float = 1.5
    back_prop: bool = False
    log2_hashmap_size: int = 19
    n_levels: int = 16
    max_resolution: int = 512
    min_resolution: int = 16
    output_dim: int = 1
    hidden_size: int = 32
    num_features: int = 2
    nl: str = "elu"  # "elu" | "relu"
    bias: bool = True
    bias_last: bool = True
    compute_dtype: str = "float32"
    table_dtype: str = "float32"
    interp: str = "cube"  # "tet" halves table lookups (see hashgrid.py)
    grad_mode: str = "auto"  # table-gradient strategy (see hashgrid.py)
    # cell layout / reduced-precision gradient payload work for the
    # field encoder exactly as for the NGP one (hashgrid.py); the
    # log2_hashmap_size keeps its per-level parameter meaning
    layout: str = "corner"
    grad_payload: str = "f32"

    @property
    def hashgrid(self) -> HashGridConfig:
        # b = exp(ln(max_res*scale/N_min)/(L-1)), reference field.py:154
        b = math.exp(
            math.log(self.max_resolution * self.scale / self.min_resolution)
            / (self.n_levels - 1)
        )
        log2_t = self.log2_hashmap_size
        if self.layout == "cell":
            log2_t = max(log2_t - 3, 4)
        return HashGridConfig(
            n_levels=self.n_levels,
            n_features=self.num_features,
            log2_hashmap_size=log2_t,
            base_resolution=self.min_resolution,
            per_level_scale=b,
            dtype=self.table_dtype,
            interp=self.interp,
            grad_mode=self.grad_mode,
            layout=self.layout,
            grad_payload=self.grad_payload,
        )

    @property
    def activation(self):
        return jax.nn.elu if self.nl == "elu" else jax.nn.relu

    @property
    def _cdtype(self):
        return jnp.dtype(self.compute_dtype)


def field_init(key, cfg: FieldConfig):
    k1, k2 = jax.random.split(key)
    return {
        "table": hashgrid_init(k1, cfg.hashgrid),
        "decoder": mlp_init(
            k2,
            cfg.hashgrid.output_dim + 3,
            cfg.output_dim,
            hidden_dim=cfg.hidden_size,
            num_hidden_layers=2,
            bias=cfg.bias,
            bias_last=cfg.bias_last,
        ),
    }


def field_apply(params, x, cfg: FieldConfig):
    """x: [N,3] in [-scale, scale] world coords -> field [N, output_dim].

    Reference Field.density + Field.field (field.py:186-227).
    """
    x_norm = (x + cfg.scale) / (2.0 * cfg.scale)
    enc_in = x_norm if cfg.back_prop else jax.lax.stop_gradient(x_norm)
    h = hashgrid_encode(params["table"], enc_in, cfg.hashgrid)
    out = mlp_apply(
        params["decoder"],
        jnp.concatenate([x_norm, h], axis=-1),
        activation=cfg.activation,
        compute_dtype=cfg._cdtype,
    )
    return out.astype(jnp.float32)


def field_with_grad(params, x, cfg: FieldConfig):
    """(field [N, output_dim], dfield/dx [N, 3]).

    Matches Field.forward(x, return_grad=True) (field.py:206-223): the
    gradient is of the summed/flattened field w.r.t. the input points
    (for output_dim == 1 this is the true spatial gradient). Implemented
    as a vjp with a ones cotangent; remains differentiable w.r.t.
    params for the stage-2 training loss.
    """
    field, vjp_fn = jax.vjp(lambda p: field_apply(params, p, cfg), x)
    (grad,) = vjp_fn(jnp.ones_like(field))
    return field, grad


def field_double_grad(params, x, cfg: FieldConfig):
    """Full 3x3 second derivative of the (scalar) field at x, matching
    Field.field_double_grad (field.py:240-251): rows are d(grad_i)/dx."""
    def grad_fn(p):
        _, g = field_with_grad(params, p[None], cfg)
        return g[0]

    return jax.vmap(jax.jacrev(grad_fn))(x)


def compute_abs_loss(field_grad):
    """L1 norm of the field gradient, averaged
    (Field.compute_abs_loss, field.py:261-264)."""
    return jnp.mean(jnp.sum(jnp.abs(field_grad), axis=1))


def compute_double_field_loss(field_double_der):
    """Mean |second derivative| (Field.compute_double_field_loss,
    field.py:266-270)."""
    return jnp.mean(jnp.abs(field_double_der))


@dataclasses.dataclass(frozen=True)
class FieldMLPConfig:
    """SIREN field variant (reference FieldMLP, field.py:274-413):
    positional encoding + sine-activated MLP, no hash grid."""
    scale: float = 1.5
    output_dim: int = 1
    hidden_size: int = 256
    num_layers: int = 6
    w0_initial: float = 30.0
    pe_degrees: int = 3


def field_mlp_init(key, cfg: FieldMLPConfig):
    import numpy as np

    from .mlp_nerf import sinusoidal_dim

    dim = sinusoidal_dim(3, 0, cfg.pe_degrees)
    keys = jax.random.split(key, cfg.num_layers + 1)
    layers = []
    fan_in = dim
    for i in range(cfg.num_layers):
        # SIREN init: first layer U(-1/n, 1/n), later
        # U(-sqrt(6/n)/w0, +)/w0-scaled
        if i == 0:
            bound = 1.0 / fan_in
        else:
            bound = math.sqrt(6.0 / fan_in) / cfg.w0_initial
        w = jax.random.uniform(
            keys[i], (fan_in, cfg.hidden_size), minval=-bound,
            maxval=bound,
        )
        b = jnp.zeros((cfg.hidden_size,))
        layers.append({"w": w, "b": b})
        fan_in = cfg.hidden_size
    bound = math.sqrt(6.0 / fan_in) / cfg.w0_initial
    out = {
        "w": jax.random.uniform(
            keys[-1], (fan_in, cfg.output_dim), minval=-bound,
            maxval=bound,
        ),
        "b": jnp.zeros((cfg.output_dim,)),
    }
    return {"layers": layers, "out": out}


def field_mlp_apply(params, x, cfg: FieldMLPConfig):
    """x [N,3] world -> field [N, output_dim] via sin activations."""
    from .mlp_nerf import sinusoidal_encode

    h = sinusoidal_encode(x, 0, cfg.pe_degrees)
    w0 = cfg.w0_initial
    for i, layer in enumerate(params["layers"]):
        h = jnp.sin(
            (w0 if i == 0 else 1.0)
            * (jnp.dot(h, layer["w"]) + layer["b"])
        )
    return jnp.dot(h, params["out"]["w"]) + params["out"]["b"]


def field_mlp_with_grad(params, x, cfg: FieldMLPConfig):
    field, vjp_fn = jax.vjp(lambda p: field_mlp_apply(params, p, cfg), x)
    (grad,) = vjp_fn(jnp.ones_like(field))
    return field, grad


@dataclasses.dataclass(frozen=True)
class DeltaFieldConfig:
    """DeltaField (reference field.py:415-491): a bare hash-grid whose
    per-point feature sum is the field (no decoder); min_res 128."""
    scale: float = 1.5
    log2_hashmap_size: int = 19
    n_levels: int = 16
    max_resolution: int = 512
    min_resolution: int = 128
    table_dtype: str = "float32"

    @property
    def hashgrid(self) -> HashGridConfig:
        b = math.exp(
            math.log(self.max_resolution * self.scale / self.min_resolution)
            / (self.n_levels - 1)
        )
        return HashGridConfig(
            n_levels=self.n_levels,
            n_features=2,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.min_resolution,
            per_level_scale=b,
            dtype=self.table_dtype,
        )


def delta_field_init(key, cfg: DeltaFieldConfig):
    return {"table": hashgrid_init(key, cfg.hashgrid)}


def delta_field_apply(params, x, cfg: DeltaFieldConfig):
    """x in [-scale, scale] -> sum of encoded features [N]
    (DeltaField.density, field.py:458-473)."""
    x_norm = (x + cfg.scale) / (2.0 * cfg.scale)
    h = hashgrid_encode(params["table"], x_norm, cfg.hashgrid)
    return jnp.sum(h, axis=1)


def field_loss(weights, weights_rev, field_grad, view_dirs, mask=None):
    """| max(w, w_rev) - |grad_f . d| | averaged (over valid samples).

    Reference Field.compute_field_loss (field.py:253-259); weights are
    detached (they come from a no-grad render anyway). `mask` excludes
    padding samples of the fixed-size packed buffer.
    """
    view_dirs = view_dirs / jnp.clip(
        jnp.linalg.norm(view_dirs, axis=1, keepdims=True), min=1e-12
    )
    target = jnp.maximum(
        jax.lax.stop_gradient(weights), jax.lax.stop_gradient(weights_rev)
    )
    proj = jnp.abs(jnp.sum(field_grad * view_dirs, axis=1))
    err = jnp.abs(target - proj)
    if mask is None:
        return jnp.mean(err)
    denom = jnp.clip(jnp.sum(mask), min=1.0)
    return jnp.sum(jnp.where(mask, err, 0.0)) / denom
