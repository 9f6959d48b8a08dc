"""Field slice visualization (reference field_utils.plot_field,
field_utils.py:78-157): per-axis mid-plane slices of the field value,
|grad|, and sin(omega*field) saved as PNGs during stage-2 training."""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def plot_field(field_with_grad_fn, prefix: str, scale: float = 0.5,
               grid_size: int = 512, omega: float = 100.0, step: int = 0):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(prefix, exist_ok=True)
    lin = np.linspace(-1.0, 1.0, grid_size, dtype=np.float32) * scale
    gx, gy = np.meshgrid(lin, lin, indexing="ij")
    for axis in range(3):
        coords = np.zeros((grid_size * grid_size, 3), np.float32)
        plane = [a for a in range(3) if a != axis]
        coords[:, plane[0]] = gx.reshape(-1)
        coords[:, plane[1]] = gy.reshape(-1)
        f, g = field_with_grad_fn(jnp.asarray(coords))
        f = np.asarray(f).reshape(grid_size, grid_size)
        g = np.asarray(g).reshape(grid_size, grid_size)
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        for ax, img, title in zip(
            axes,
            [f, g, np.sin(omega * f)],
            ["field", "|grad|", "sin(omega*field)"],
        ):
            im = ax.imshow(img, cmap="jet")
            ax.set_title(title)
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.savefig(
            os.path.join(prefix, f"field_axis{axis}_step{step}.png"),
            dpi=80, bbox_inches="tight",
        )
        plt.close(fig)
