"""Decompose TODAY's uv_cam baked frame (56-62 ms measured this
session vs the 27.9 ms recorded 2026-08-17) into its actual
sub-computations, at the bench contract shapes (640k rays, ~708k hits,
cap = sqrt2-grid 741376, 25 hits / 3 lobes / 4096^2).

profile_baked's component section times the OLD dense-transport pieces
(face_data prep, segment_sum composite), not what
_render_packed_uv_cam_impl runs — this probe times the real pieces:
  cam-math viewdirs | texel gather | dequant+SG decode |
  boundaries+weights scan | presorted-MXU composite
Usage: python tools/profiles/diag_baked_parts.py [cap]
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


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(best)[1]/n*1e3:.2f} ms", flush=True)
    return out


def main():
    renderer = build()
    comp = renderer.compressor
    sg_cfg = renderer.sg_cfg

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
    cap = (int(sys.argv[1]) if len(sys.argv) > 1
           else snap_pack_cap(n_valid, 1 << 22, min_cap=n))
    print(f"rays {n} hits {n_valid} cap {cap}", flush=True)
    slots, ts_p, uv_p = renderer.pack_hits_uv(tri_ids, ts, uvs, cap)
    slots_d = jnp.asarray(slots)
    uv_d = jnp.asarray(uv_p)
    ts_d = jnp.asarray(ts_p)
    cam_dev = jnp.asarray(cam)
    maps = renderer.maps_packed

    render = jax.jit(renderer._render_packed_uv_cam_impl,
                     static_argnums=(6, 7, 8, 9))
    timeit("FULL uv_cam frame", lambda: render(
        maps, cam_dev, jnp.float32(0.0), slots_d, uv_d, ts_d, n,
        MAX_HITS, W, FOCAL))

    from quadraturefields_tpu.ops import scan
    from quadraturefields_tpu.ops.hashgrid_sorted import (
        presorted_row_segment_sum,
    )
    from quadraturefields_tpu.models.ngp import ngp_features_to_rgb

    @jax.jit
    def stage_prep(slots):
        valid = slots >= 0
        ray_idx = jnp.where(valid, slots // MAX_HITS, n).astype(jnp.int32)
        return valid, ray_idx

    valid, ray_idx = timeit("  slot math", stage_prep, slots_d)

    @jax.jit
    def stage_dirs(ray_idx, cam):
        rc = jnp.clip(ray_idx, 0, n - 1).astype(jnp.float32)
        i = jnp.mod(rc, W)
        j = jnp.floor(rc / W)
        d = ((i[:, None] - W / 2) / FOCAL * cam[1]
             + (j[:, None] - W / 2) / FOCAL * -cam[2] + cam[3])
        return d / jnp.linalg.norm(d, axis=1, keepdims=True)

    d = timeit("  cam-math viewdirs", stage_dirs, ray_idx, cam_dev)

    T = comp.texture_size

    @jax.jit
    def stage_gather(maps, uv_p):
        texels = jnp.clip(jnp.floor(uv_p).astype(jnp.int32), 0, T - 1)
        return maps[texels[:, 0], texels[:, 1]]

    tex = timeit("  texel gather", stage_gather, maps, uv_d)

    @jax.jit
    def stage_decode(tex, d, valid):
        feats = comp.get_features_from_packed_texels(tex)
        sigmas = jnp.where(valid, feats[:, -1], 0.0)
        rgbs = ngp_features_to_rgb(feats[:, :-1], d, sg_cfg)
        return sigmas, rgbs

    sigmas, rgbs = timeit("  dequant+SG decode", stage_decode, tex, d,
                          valid)

    @jax.jit
    def stage_weights(ray_idx, ts_p, sigmas, valid):
        boundaries = scan.mark_pack_boundaries(ray_idx)
        weights, _, _ = scan.render_weight_from_density(
            ts_p, ts_p + renderer.render_step_size, sigmas, boundaries
        )
        return jnp.where(valid, weights, 0.0)

    weights = timeit("  boundaries+weights scan", stage_weights,
                     ray_idx, ts_d, sigmas, valid)

    @jax.jit
    def stage_composite(weights, rgbs, ts_p, ray_idx):
        vals8 = jnp.concatenate(
            [weights[:, None] * rgbs, weights[:, None],
             weights[:, None] * ts_p[:, None],
             jnp.zeros((weights.shape[0], 3), jnp.float32)], axis=1)
        return presorted_row_segment_sum(ray_idx, vals8, n)

    timeit("  presorted-MXU composite", stage_composite, weights, rgbs,
           ts_d, ray_idx)


if __name__ == "__main__":
    main()
