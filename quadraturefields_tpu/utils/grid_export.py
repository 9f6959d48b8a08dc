"""Dense grid export: field / |grad field| / density at 1024^3.

Reference: examples/field_utils.py:276-341 (extract_grid,
extract_density_grid) — evaluate on a 2x-supersampled lattice
(2*grid_size per axis, coords = linspace(-1,1)*scale) and 2x
average-pool down, streaming two z-slices at a time so the full
supersampled volume never materializes. Output axis order is (x, y, z)
and the artifact contract matches the reference:
  grids_valid.npy  float32 [N,N,N]
  grads_valid.npy  float16 [N,N,N]  (|grad| clipped to 65504)
  density_grids_valid.npy float16 [N,N,N]

The slice evaluator is a jitted device function; the z loop runs on
host (8.6G field evals at N=1024 — bounded HBM, full MXU occupancy per
slice).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _slice_coords(grid_size: int, scale: float, z):
    n = 2 * grid_size
    lin = jnp.linspace(-1.0, 1.0, n)
    gx, gy = jnp.meshgrid(lin, lin, indexing="ij")
    coords = jnp.stack(
        [gx.reshape(-1), gy.reshape(-1), jnp.full((n * n,), z)], axis=1
    )
    return coords * scale


def _avgpool2(stack2):
    """[2, 2N, 2N] -> [N, N] average over 2x2x2 blocks."""
    two, h, w = stack2.shape
    x = stack2.reshape(2, h // 2, 2, w // 2, 2)
    return x.mean(axis=(0, 2, 4))


def extract_field_grid(
    field_with_grad_fn,
    prefix: str,
    scale: float,
    grid_size: int = 1024,
    chunk: int = 1 << 20,
):
    """field_with_grad_fn(coords [M,3]) -> (field [M], gradnorm [M]).

    Writes grids_valid.npy / grads_valid.npy under `prefix`.
    """
    n = 2 * grid_size

    @jax.jit
    def eval_slice(z):
        coords = _slice_coords(grid_size, scale, z)
        fields = []
        grads = []
        for b in range(0, coords.shape[0], chunk):
            f, g = field_with_grad_fn(coords[b : b + chunk])
            fields.append(f)
            grads.append(g)
        f = jnp.concatenate(fields).reshape(n, n)
        g = jnp.clip(jnp.concatenate(grads).reshape(n, n), 0, 65504.0)
        return f, g

    zs = np.linspace(-1.0, 1.0, n)
    grids = np.zeros((grid_size, grid_size, grid_size), np.float32)
    grads = np.zeros((grid_size, grid_size, grid_size), np.float16)
    pair_f = np.zeros((2, n, n), np.float32)
    pair_g = np.zeros((2, n, n), np.float32)
    for j in range(n):
        f, g = eval_slice(zs[j])
        pair_f[j % 2] = np.asarray(f)
        pair_g[j % 2] = np.asarray(g)
        if j % 2 == 1:
            grids[:, :, j // 2] = _avgpool2(pair_f)
            grads[:, :, j // 2] = _avgpool2(pair_g).astype(np.float16)
    os.makedirs(prefix, exist_ok=True)
    np.save(os.path.join(prefix, "grids_valid.npy"), grids)
    np.save(os.path.join(prefix, "grads_valid.npy"), grads)
    return grids, grads


def extract_field_grid_h5(
    field_with_grad_fn,
    path: str,
    scale: float,
    grid_size: int = 1024,
    chunk: int = 1 << 20,
):
    """Chunked h5 export of the field/grad grids (reference
    field_utils.py:160-225, the memory-bounded variant used for 360
    scenes): z-slices streamed into h5 datasets, no supersampling."""
    import h5py

    n = grid_size

    @jax.jit
    def eval_slice(z):
        lin = jnp.linspace(-1.0, 1.0, n)
        gx, gy = jnp.meshgrid(lin, lin, indexing="ij")
        coords = jnp.stack(
            [gx.reshape(-1), gy.reshape(-1), jnp.full((n * n,), z)],
            axis=1,
        ) * scale
        fs, gs = [], []
        for b in range(0, coords.shape[0], chunk):
            f, g = field_with_grad_fn(coords[b : b + chunk])
            fs.append(f)
            gs.append(g)
        return (
            jnp.concatenate(fs).reshape(n, n),
            jnp.clip(jnp.concatenate(gs).reshape(n, n), 0, 65504.0),
        )

    zs = np.linspace(-1.0, 1.0, n)
    with h5py.File(path, "w") as h5:
        dset_f = h5.create_dataset("grids", (n, n, n), dtype="f4")
        dset_g = h5.create_dataset("grads", (n, n, n), dtype="f2")
        for j in range(n):
            f, g = eval_slice(zs[j])
            dset_f[:, :, j] = np.asarray(f)
            dset_g[:, :, j] = np.asarray(g).astype(np.float16)
    return path


def extract_density_grid(
    density_fn,
    prefix: str,
    scale: float,
    grid_size: int = 1024,
    chunk: int = 1 << 20,
):
    """density_fn(coords [M,3]) -> sigma [M]. Writes
    density_grids_valid.npy."""
    n = 2 * grid_size

    @jax.jit
    def eval_slice(z):
        coords = _slice_coords(grid_size, scale, z)
        outs = []
        for b in range(0, coords.shape[0], chunk):
            outs.append(density_fn(coords[b : b + chunk]))
        return jnp.clip(jnp.concatenate(outs).reshape(n, n), 0, 65504.0)

    zs = np.linspace(-1.0, 1.0, n)
    grids = np.zeros((grid_size, grid_size, grid_size), np.float16)
    pair = np.zeros((2, n, n), np.float32)
    for j in range(n):
        pair[j % 2] = np.asarray(eval_slice(zs[j]))
        if j % 2 == 1:
            grids[:, :, j // 2] = _avgpool2(pair).astype(np.float16)
    os.makedirs(prefix, exist_ok=True)
    np.save(os.path.join(prefix, "density_grids_valid.npy"), grids)
    return grids
