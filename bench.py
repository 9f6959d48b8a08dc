"""Benchmark: stage-1 NGP training throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: training samples/sec (field evaluations composited per second)
for the stage-1 recipe at the reference's shipped scale (2^18 target
samples/step, 128^3 occupancy grid, 16x2^19 hash table, step 5e-3).
Baseline: the reference publishes no numbers (BASELINE.md); we use an
estimated RTX-3090 nerfacc/tcnn throughput of 2.6e7 samples/s
(~100 steps/s at 2^18 samples) and report vs_baseline against the
2x-per-chip north-star target, i.e. vs_baseline = value / (2 * 2.6e7).
"""
from __future__ import annotations

import json
import time

import numpy as np


BASELINE_SAMPLES_PER_SEC = 2.6e7  # estimated RTX-3090 stage-1 throughput
TARGET_MULTIPLIER = 2.0


def main():
    import jax
    import jax.numpy as jnp

    from quadraturefields_tpu.data.fixture import FixtureScene
    from quadraturefields_tpu.models.ngp import NGPConfig, ngp_init
    from quadraturefields_tpu.ops.grid import (
        OccGridConfig,
        occ_grid_init,
        occ_grid_update,
        max_march_steps,
    )
    from quadraturefields_tpu.models.ngp import ngp_query_density
    from quadraturefields_tpu.render.renderer import (
        RenderConfig,
        render_rays_occgrid,
    )
    from quadraturefields_tpu.utils.metrics import smooth_l1_loss
    from quadraturefields_tpu.utils.optim import make_ngp_optimizer
    import optax

    aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
    # tet interpolation is the TPU-native default: exact piecewise-
    # linear encoding with half the table lookups (gather/scatter cost
    # on TPU scales with index count; see PERF_NOTES.md)
    ngp_cfg = NGPConfig(
        head="sg", num_g_lobes=2, log2_hashmap_size=19, interp="tet"
    )
    step_size = 5e-3
    rcfg = RenderConfig(
        render_step_size=step_size,
        max_steps=max_march_steps(np.asarray(aabb), step_size),
        max_samples_total=1 << 18,
        coarse_factor=4,
    )
    occ_cfg = OccGridConfig(resolution=128)

    key = jax.random.PRNGKey(0)
    params = ngp_init(key, ngp_cfg)
    occ_state = occ_grid_init(aabb, occ_cfg)
    optimizer = make_ngp_optimizer(max_steps=20000)
    opt_state = optimizer.init(params)

    # put the grid in a realistic post-pruning regime: occupy the
    # fixture sphere (~2% of cells occupied, like trained lego)
    scene = FixtureScene()

    def occ_seed_fn(x):
        return jnp.asarray(
            scene.sigma(np.asarray(x)) * step_size, jnp.float32
        )

    # host-side seeding of binaries (not benchmarked)
    res = occ_cfg.resolution
    grid = np.stack(
        np.meshgrid(*([np.linspace(-1.5, 1.5, res)] * 3), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    occs = scene.sigma(grid).astype(np.float32) * step_size
    binaries = (occs > 0.01).reshape(res, res, res)
    occ_state = occ_state._replace(
        occs=jnp.asarray(occs), binaries=jnp.asarray(binaries)
    )

    n_rays = 8192  # ~2^18 / 32 samples per ray in the occupied regime
    rng = np.random.default_rng(0)

    def make_batch():
        theta = rng.uniform(0, 2 * np.pi, n_rays)
        phi = rng.uniform(0.5, 2.6, n_rays)
        eye = np.stack(
            [
                4 * np.cos(theta) * np.sin(phi),
                4 * np.sin(theta) * np.sin(phi),
                4 * np.cos(phi),
            ],
            axis=-1,
        ).astype(np.float32)
        target = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
        d = target - eye
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pix = rng.random((n_rays, 3)).astype(np.float32)
        return jnp.asarray(eye), jnp.asarray(d), jnp.asarray(pix)

    def loss_fn(params, occ_state, origins, viewdirs, pixels, key):
        result = render_rays_occgrid(
            params, aabb, ngp_cfg, occ_state, origins, viewdirs, rcfg,
            render_bkgd=jnp.ones(3), stratified=True, key=key,
        )
        acc = result.opacity[:, 0]
        reg = (1e-3 * (-acc * jnp.log(acc + 1e-10))).mean()
        return smooth_l1_loss(result.rgb, pixels) + reg, result.num_valid

    @jax.jit
    def train_step(params, opt_state, occ_state, origins, viewdirs,
                   pixels, key):
        (loss, nv), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, occ_state, origins, viewdirs, pixels, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, nv

    # warmup/compile
    o, d, p = make_batch()
    params, opt_state, loss, nv = train_step(
        params, opt_state, occ_state, o, d, p, key
    )
    jax.block_until_ready(loss)

    n_iters = 50
    batches = [make_batch() for _ in range(5)]
    total_samples = 0
    t0 = time.perf_counter()
    for i in range(n_iters):
        o, d, p = batches[i % len(batches)]
        params, opt_state, loss, nv = train_step(
            params, opt_state, occ_state, o, d, p,
            jax.random.fold_in(key, i),
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    # count true composited samples (per-step demand, capped at budget)
    nv_val = min(int(nv), rcfg.max_samples_total)
    samples_per_sec = nv_val * n_iters / dt

    print(
        json.dumps(
            {
                "metric": "stage1_train_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(
                    samples_per_sec
                    / (TARGET_MULTIPLIER * BASELINE_SAMPLES_PER_SEC),
                    4,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
