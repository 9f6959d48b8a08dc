"""Ray-batch data parallelism over a device mesh.

The reference is strictly single-GPU (SURVEY §2.4: no torch.distributed
anywhere); the TPU-native scaling axis is the ray batch: rays are
embarrassingly parallel, model params are tiny (hash table ~16-64 MB)
and replicate. Each chip marches/compacts/composites its own ray shard
entirely locally (so the global sample compaction never crosses chips)
and gradients all-reduce over ICI with one psum per step.

Built on shard_map so per-shard code sees local shapes; works on any
1-D mesh including the virtual CPU mesh used in tests and the driver's
dryrun.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.ngp import NGPConfig
from ..render.renderer import RenderConfig, render_rays_occgrid
from ..utils.metrics import smooth_l1_loss


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def make_dp_train_step(
    mesh: Mesh,
    aabb,
    ngp_cfg: NGPConfig,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    o_lambda: float = 1e-3,
    axis: str = "data",
):
    """Returns train_step(params, opt_state, occ_state, origins,
    viewdirs, pixels, bkgd, key) -> (params, opt_state, loss).

    Inputs: params/opt_state/occ_state replicated; ray tensors sharded
    on their leading axis. The per-shard sample budget is
    rcfg.max_samples_total // n_devices, so the global budget matches
    the single-chip configuration.
    """
    n_dev = mesh.devices.size
    local_rcfg = RenderConfig(
        **{
            **rcfg.__dict__,
            "max_samples_total": max(
                256, rcfg.max_samples_total // n_dev
            ),
        }
    )

    def local_loss(params, occ_state, origins, viewdirs, pixels, bkgd, key):
        result = render_rays_occgrid(
            params, aabb, ngp_cfg, occ_state, origins, viewdirs,
            local_rcfg, render_bkgd=bkgd, stratified=True, key=key,
        )
        rgb_loss = smooth_l1_loss(result.rgb, pixels)
        acc = result.opacity[:, 0]
        reg = (o_lambda * (-acc * jnp.log(acc + 1e-10))).mean()
        return rgb_loss + reg

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    def sharded_loss_and_grad(
        params, occ_state, origins, viewdirs, pixels, bkgd, key
    ):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        loss, grads = jax.value_and_grad(local_loss)(
            params, occ_state, origins, viewdirs, pixels, bkgd, key
        )
        return (
            jax.lax.pmean(loss, axis),
            jax.lax.pmean(grads, axis),
        )

    @jax.jit
    def train_step(
        params, opt_state, occ_state, origins, viewdirs, pixels, bkgd, key
    ):
        loss, grads = sharded_loss_and_grad(
            params, occ_state, origins, viewdirs, pixels, bkgd, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
