"""Probe: occupancy-grid EMA refresh cost at bench scale.

The all-in stage-1 number charges the every-16-step occ refresh
(~13 ms/step amortized in the round-3 BASELINE rows). The refresh's
post-warmup partial update previously applied `.at[idx].multiply` +
`.at[idx].max` over a 524k-cell CONTIGUOUS partition — two full-table
scatters. ops/grid.py now uses dynamic_slice + dynamic_update_slice
(no scatter). This probe times occ_grid_update standalone (partial
branch, 128^3 grid, quarter partitions, L8F4 cell encoder density
eval) so the refresh's absolute cost is a recorded number.

Run on an idle chip: python tools/profiles/profile_refresh.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from quadraturefields_tpu.models.ngp import (  # noqa: E402
    NGPConfig,
    ngp_init,
    ngp_query_density,
)
from quadraturefields_tpu.ops.grid import (  # noqa: E402
    OccGridConfig,
    occ_grid_init,
    occ_grid_update,
)


def main():
    aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
    ngp_cfg = NGPConfig(
        head="sg", num_g_lobes=2, log2_hashmap_size=19, interp="tet",
        layout="cell", grad_payload="bf16pair", n_levels=8, n_features=4,
    )
    occ_cfg = OccGridConfig(resolution=128)
    step_size = 5e-3
    key = jax.random.PRNGKey(0)
    params = ngp_init(key, ngp_cfg)
    occ_state = occ_grid_init(aabb, occ_cfg)

    @jax.jit
    def occ_update(params, occ_state, step, key):
        def occ_eval_fn(x):
            d = ngp_query_density(params, x, aabb, ngp_cfg)
            return d[..., 0] * step_size

        return occ_grid_update(occ_state, step, key, occ_eval_fn, occ_cfg)

    # compile (lax.cond compiles both branches into the one program)
    r = occ_update(params, occ_state, jnp.int32(512), key)
    float(r.occs[0])

    meds = {}
    for name, step0 in (("partial", 512), ("warmup_full", 0)):
        times = []
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                r = occ_update(
                    params, occ_state, jnp.int32(step0 + 16 * i), key
                )
            float(r.occs[0])
            times.append((time.perf_counter() - t0) / 8)
        meds[name] = float(np.median(times))
        print(f"{name}: {1e3 * meds[name]:.2f} ms/refresh "
              f"(windows {[round(1e3 * t, 1) for t in times]})")
    print("production regime (partial) amortized over "
          f"update_interval=16: {1e3 * meds['partial'] / 16:.2f} ms/step")


if __name__ == "__main__":
    main()
