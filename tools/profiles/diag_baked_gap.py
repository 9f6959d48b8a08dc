"""Root-cause the baked-FPS gap: driver bench 85.9 ms/frame vs
profile_baked 27.9 ms at the same contract config (VERDICT r4 weak #1).

The two paths render the SAME view of the SAME mesh through the SAME
jitted fn (`_render_packed_uv_cam_impl`); the one config delta found by
reading both is the pack cap: profile_baked fixes cap = 1.25x rays
(800,000), while bench's adaptive `_pack_cap` doubles from n_rays until
it covers the true hit count -> 1,280,000 for the 640k-ray frame with
~708k hits. This probe sweeps cap over {sqrt2-grid >= hits, 800k, 2^20,
1.28M} in ONE chip session and times 10-dispatch windows per cap,
exactly like bench.py's device-path timing.

Usage: python tools/profiles/diag_baked_gap.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache

_enable_compile_cache()

sys.path.insert(0, "/root/repo/tools/profiles")
from profile_baked import build, H, W, FOCAL, MAX_HITS  # noqa: E402

from quadraturefields_tpu.utils.batching import snap_pack_cap  # noqa: E402


def main():
    renderer = build()
    render = jax.jit(renderer._render_packed_uv_cam_impl,
                     static_argnums=(6, 7, 8, 9))

    eye = np.asarray([3.0, 0.0, 1.2], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    cam = np.stack([eye, right, up, fwd]).astype(np.float32)
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = ((i[..., None] - W / 2) / FOCAL * right
            + (j[..., None] - W / 2) / FOCAL * -up + fwd).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.broadcast_to(eye, dirs.shape).astype(np.float32)
    n = origins.shape[0]

    tri_ids, ts, _, uvs = renderer.mesh_intersect.intersect_rows_uv(
        origins, dirs
    )
    n_valid = int((tri_ids >= 0).sum())
    bench_cap = renderer._pack_cap(n, n_valid, None)
    grid_cap = snap_pack_cap(n_valid, 1 << 22, min_cap=n)
    print(f"rays {n}  hits/frame {n_valid}  bench adaptive cap "
          f"{bench_cap}  sqrt2-grid cap {grid_cap}", flush=True)

    cam_dev = jnp.asarray(cam)
    caps = sorted({grid_cap, 800_000, 1 << 20, bench_cap})
    for cap in caps:
        slots, ts_p, uv_p = renderer.pack_hits_uv(tri_ids, ts, uvs, cap)
        slots_d = jnp.asarray(slots)
        uv_d = jnp.asarray(uv_p)
        ts_d = jnp.asarray(ts_p)
        t0 = time.perf_counter()
        rgb, _, _ = render(renderer.maps_packed, cam_dev,
                           jnp.float32(0.0), slots_d, uv_d, ts_d, n,
                           MAX_HITS, W, FOCAL)
        float(jnp.sum(rgb))
        print(f"cap {cap}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                rgb, _, _ = render(renderer.maps_packed, cam_dev,
                                   jnp.float32(0.0), slots_d, uv_d,
                                   ts_d, n, MAX_HITS, W, FOCAL)
            float(jnp.sum(rgb))
            windows.append(time.perf_counter() - t0)
        ms = sorted(windows)[1] / 10 * 1e3
        print(f"cap {cap}: {ms:.1f} ms/frame ({1e3/ms:.1f} FPS) "
              f"windows {['%.3f' % w for w in windows]}", flush=True)


if __name__ == "__main__":
    main()
