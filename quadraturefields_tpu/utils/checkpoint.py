"""Checkpointing: orbax pytree checkpoints with optimizer state + step.

The reference torch.save's bare state_dicts with no optimizer state or
step resume (train_ngp_nerf_sg_occ.py:357-364 etc.); here every stage
checkpoints the full train state so a stage can resume mid-run, while
keeping the reference's cross-stage artifact contract (named files in
ckpts/<scene>/<exp>/).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restored = ckptr.restore(path, item=jax.device_get(target))
    else:
        restored = ckptr.restore(path)
    return restored


def save_grid_npy(path: str, arr) -> None:
    np.save(path, np.asarray(arr))
