"""Stage 3: mesh extraction from the exported field/density grids.

TPU/host split mirrors the reference (examples/marching_cubes.py:16-82 +
examples/downsample_mesh.py:11-20): grid filtering/normalization runs on
device (Gaussian smooth, trilinear occupancy upsample, sin(omega*q)),
the isosurface runs host-side (marching tetrahedra in C++; the
reference uses skimage marching_cubes). Mesh vertices are emitted in
the reference's normalized [-1, 1] cube (marching_cubes.py:66-67,77-78).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .meshio import Mesh, save_ply
from .native import decimate_vertex_clustering, marching_tetrahedra


def gaussian_kernel_1d(kernel_size: int = 5, sigma: float = 100.0):
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth_3d(grid, kernel_size: int = 5, sigma: float = 100.0):
    """Separable 3-D Gaussian blur, 'same' padding (reference
    field_utils.GaussianSmoothing with kernel 5, sigma 100 — at that
    sigma it is effectively a 5^3 box filter)."""
    k = jnp.asarray(gaussian_kernel_1d(kernel_size, sigma))
    pad = kernel_size // 2

    def conv_axis(g, axis):
        g = jnp.moveaxis(g, axis, -1)
        shape = g.shape
        x = g.reshape(1, -1, shape[-1])
        out = jax.lax.conv_general_dilated(
            x[:, None],  # NCHW with H=flat, W=axis
            k[None, None, None, :],
            window_strides=(1, 1),
            padding=((0, 0), (pad, pad)),
        )[:, 0]
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    for axis in range(3):
        grid = conv_axis(grid, axis)
    return grid


def upsample_trilinear_aligned(grid, out_shape):
    """Trilinear upsample with align_corners=True semantics (torch
    nn.Upsample in marching_cubes.py:30): out coord i maps to
    i*(in-1)/(out-1)."""
    g = jnp.asarray(grid, jnp.float32)

    def interp_axis(x, axis, n_out):
        n_in = x.shape[axis]
        if n_in == n_out:
            return x
        pos = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(jnp.float32)
        x_lo = jnp.take(x, lo, axis=axis)
        x_hi = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return x_lo * (1 - w) + x_hi * w

    for axis in range(3):
        g = interp_axis(g, axis, out_shape[axis])
    return g


def extract_mesh(
    out_dir: str,
    sigma: float = 100.0,
    include_grad: bool = True,
    omega: float = 100.0,
    thres: float = 0.0,
    combine: bool = True,
    grad_thres: float = 0.01,
    density_thres: float = 10.0,
    grids=None,
    grads=None,
    binaries=None,
    nerf_density=None,
    save: bool = True,
):
    """Reference marching_cubes.py flow:
      1. Gaussian-smooth the field grid;
      2. upsample occupancy binaries to the grid res (trilinear,
         align_corners) as a validity mask d;
      3. normalize grid*d to [-1, 1];
      4. quantity = grid * d * (|grad| > grad_thres);
      5. quadrature surface = isosurface of sin(omega*quantity) at
         `thres`; optionally union with the NeRF density surface at
         `density_thres`.
    Returns the combined Mesh (vertices in [-1, 1]^3) and writes
    mesh.ply / mesh_nerf.ply when `save`.
    """
    if grids is None:
        grids = np.load(os.path.join(out_dir, "grids_valid.npy"))
    if grads is None:
        grads = np.load(os.path.join(out_dir, "grads_valid.npy"))
    if binaries is None:
        binaries = np.load(os.path.join(out_dir, "binaries.npy"))[0]

    n = grids.shape[0]
    grid = gaussian_smooth_3d(jnp.asarray(grids, jnp.float32), 5, sigma)
    d = upsample_trilinear_aligned(
        jnp.asarray(binaries, jnp.float32), (n, n, n)
    )
    gd = grid * d
    gmin = gd.min()
    grid = grid - gmin
    gmax = (grid * d).max()
    grid = grid / (gmax + 1e-6)
    grid = (grid - 0.5) * 2.0
    quantity = grid * d
    if include_grad:
        quantity = quantity * (
            jnp.asarray(grads, jnp.float32) > grad_thres
        )
    surface = np.asarray(jnp.sin(omega * quantity), np.float32)

    meshes = []
    verts, faces = marching_tetrahedra(surface, level=thres)
    quad_mesh = Mesh(
        (verts / (n - 1) - 0.5) * 2.0, faces
    )
    meshes.append(quad_mesh)

    if combine:
        if nerf_density is None:
            nerf_density = np.load(
                os.path.join(out_dir, "density_grids_valid.npy")
            )
        dverts, dfaces = marching_tetrahedra(
            np.asarray(nerf_density, np.float32), level=density_thres
        )
        nd = nerf_density.shape[0]
        density_mesh = Mesh((dverts / (nd - 1) - 0.5) * 2.0, dfaces)
        if save:
            save_ply(os.path.join(out_dir, "mesh_nerf.ply"), density_mesh)
        meshes.append(density_mesh)

    mesh = meshes[0]
    for m in meshes[1:]:
        mesh = mesh.concat(m)
    if save:
        save_ply(os.path.join(out_dir, "mesh.ply"), mesh)
    return mesh


def downsample_mesh(mesh: Mesh, vx: float = 150.0) -> Mesh:
    """Vertex-clustering simplification at voxel 1/vx (reference
    downsample_mesh.py:13-20)."""
    verts, faces = decimate_vertex_clustering(
        mesh.vertices, mesh.faces, 1.0 / vx
    )
    return Mesh(verts, faces)
