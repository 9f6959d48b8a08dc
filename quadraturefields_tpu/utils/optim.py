"""Optimizer/schedule wiring matching the reference trainers.

Reference recipe (train_ngp_nerf_sg_occ.py:240-261): Adam(lr=1e-2,
eps=1e-15, weight_decay per-scene) with ChainedScheduler(
LinearLR(start_factor=0.01, total_iters=100),
MultiStepLR(milestones=[1/2, 3/4, 9/10]*max_steps, gamma=0.33)).
torch's Adam applies weight decay additively to the gradient *before*
the moment updates — replicated with add_decayed_weights placed ahead
of scale_by_adam.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def donate_if_accelerator(*argnums):
    """Donation argnums for a trainer step, or () on CPU.

    Donating (params, opt_state, caches) saves an HBM copy of the hash
    tables every step on TPU; on the CPU test backend donation is
    unimplemented and every jitted call would warn, so it is disabled
    there.
    """
    return argnums if jax.default_backend() != "cpu" else ()


def reference_lr_schedule(
    base_lr: float,
    max_steps: int,
    warmup_iters: int = 100,
    start_factor: float = 0.01,
    gamma: float = 0.33,
    milestones=None,
):
    if milestones is None:
        milestones = [
            max_steps // 2,
            max_steps * 3 // 4,
            max_steps * 9 // 10,
        ]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lin = start_factor + (1.0 - start_factor) * jnp.minimum(
            step, warmup_iters
        ) / warmup_iters
        decay = jnp.ones(())
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return base_lr * lin * decay

    return schedule


def make_ngp_optimizer(
    max_steps: int,
    lr: float = 1e-2,
    eps: float = 1e-15,
    weight_decay: float = 1e-6,
    warmup_iters: int = 100,
):
    schedule = reference_lr_schedule(lr, max_steps, warmup_iters)
    txs = []
    if weight_decay > 0:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=eps),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*txs)
