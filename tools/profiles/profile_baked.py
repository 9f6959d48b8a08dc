"""Per-component breakdown of the baked device frame (VERDICT round-2
weak #2: the 125 ms frame had no texel-gather / SG-decode / composite
accounting). Stages one 800x800 frame's packed hits on device, then
times the full packed render and each component in isolation at the
same shapes, at the REFERENCE config (max_hits=25, 3 lobes,
run_nerfsynthetic_finetune.sh / run_shelly_fit_sg.sh:12).

Usage: python tools/profile_baked.py [lobes] [chunks-per-frame]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _bumpy_sphere, _enable_compile_cache

_enable_compile_cache()

NUM_LOBES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
MAX_HITS = 25
H = W = 800
FOCAL = 1111.0


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


def build():
    from quadraturefields_tpu.baking.compression import FeatureCompression
    from quadraturefields_tpu.baking.stage6 import (
        BakedRenderer, segment_and_atlas,
    )
    from quadraturefields_tpu.geometry.meshio import Mesh
    from quadraturefields_tpu.models.ngp import NGPConfig

    texture_size = 4096
    verts, faces = _bumpy_sphere(200)
    mesh = Mesh(verts, faces)
    atlas_mesh, uv, v_image, tri_image = segment_and_atlas(
        mesh, texture_size
    )
    rng = np.random.default_rng(0)
    comp = FeatureCompression(
        num_lobes=NUM_LOBES, initialize=True,
        texture_size=texture_size, compression_type="sigmoid",
    )
    rows, cols = np.nonzero(tri_image >= 0)
    n_texels = rows.shape[0]
    block = 1 << 15
    fdim = 3 + 7 * NUM_LOBES + 1
    base = np.zeros((block, fdim), np.float32)
    base[:, :3] = rng.standard_normal((block, 3), dtype=np.float32)
    for i in range(NUM_LOBES):
        o = 3 + 7 * i
        ax = rng.standard_normal((block, 3), dtype=np.float32)
        base[:, o:o + 3] = ax / np.linalg.norm(ax, axis=1, keepdims=True)
        base[:, o + 3] = rng.uniform(0.5, 6.0, block)
        base[:, o + 4:o + 7] = rng.standard_normal(
            (block, 3), dtype=np.float32
        )
    base[:, -1] = rng.uniform(50.0, 400.0, block)
    reps = -(-n_texels // block)
    feats = np.tile(base, (reps, 1))[:n_texels]
    chunk = 1 << 21
    for i in range(0, n_texels, chunk):
        comp.load_features_into_maps(
            feats[i:i + chunk],
            np.stack([rows[i:i + chunk], cols[i:i + chunk]], 1),
        )
    sg_cfg = NGPConfig(head="sg", num_g_lobes=NUM_LOBES)
    renderer = BakedRenderer(
        atlas_mesh, uv, comp, sg_cfg, max_hits=MAX_HITS,
        render_step_size=5e-3,
    )
    return renderer


def main():
    renderer = build()
    comp = renderer.compressor
    sg_cfg = renderer.sg_cfg
    print(f"packed map: {renderer.maps_packed.shape} "
          f"{renderer.maps_packed.dtype}", flush=True)

    # one frame of rays + staged hits
    eye = np.asarray([3.0, 0.0, 1.2], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    cam = np.stack([eye, right, up, fwd]).astype(np.float32)
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = ((i[..., None] - W / 2) / FOCAL * right
            + (j[..., None] - H / 2) / FOCAL * -up + fwd).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.broadcast_to(eye, dirs.shape).astype(np.float32)

    chunk = (H * W) // N_CHUNKS
    cam_dev = jnp.asarray(cam)
    staged = []
    t0 = time.perf_counter()
    for s in range(0, H * W, chunk):
        o = origins[s:s + chunk]
        tri_ids, ts, _ = renderer.mesh_intersect.intersect_rows(
            o, dirs[s:s + chunk]
        )
        slots, tri_p, ts_p = renderer.pack_hits(
            tri_ids, ts, cap=int(o.shape[0] * 1.25)
        )
        staged.append((
            jnp.asarray(dirs[s:s + chunk]), jnp.asarray(slots),
            jnp.asarray(tri_p), jnp.asarray(ts_p), o.shape[0],
        ))
    print(f"host BVH+pack+stage: {time.perf_counter()-t0:.1f}s "
          f"({sum(int((s[1] >= 0).sum()) for s in staged)} hits/frame)",
          flush=True)

    maps, geom = renderer.maps_packed, renderer.geom
    d_dev, slots, tri_p, ts_p, n_chunk = staged[0]

    # full packed frame (all chunks, one number)
    render = jax.jit(renderer._render_packed_impl,
                     static_argnums=(7, 8))

    def full_frame(maps, geom):
        outs = []
        for d_dev, slots, tri_p, ts_p, n_chunk in staged:
            rgb, _, _ = render(maps, geom, cam_dev[:1], d_dev, slots,
                               tri_p, ts_p, n_chunk, MAX_HITS)
            outs.append(rgb)
        return outs[-1]

    timeit(f"full packed frame ({N_CHUNKS} dispatch)", full_frame,
           maps, geom)

    # UV-transport variant: host cast emits per-hit texels
    staged_uv = []
    t0 = time.perf_counter()
    for s in range(0, H * W, chunk):
        o = origins[s:s + chunk]
        tri_ids, ts, _, uvs = renderer.mesh_intersect.intersect_rows_uv(
            o, dirs[s:s + chunk]
        )
        slots, ts_p, uv_p = renderer.pack_hits_uv(
            tri_ids, ts, uvs, cap=int(o.shape[0] * 1.25)
        )
        staged_uv.append((
            jnp.asarray(dirs[s:s + chunk]), jnp.asarray(slots),
            jnp.asarray(uv_p), jnp.asarray(ts_p), o.shape[0],
        ))
    print(f"host BVH+pack+stage (uv): {time.perf_counter()-t0:.1f}s",
          flush=True)
    render_uv = jax.jit(renderer._render_packed_uv_impl,
                        static_argnums=(5, 6))

    def full_frame_uv(maps):
        outs = []
        for d_dev, slots, uv_p, ts_p, n_chunk in staged_uv:
            rgb, _, _ = render_uv(maps, d_dev, slots, uv_p, ts_p,
                                  n_chunk, MAX_HITS)
            outs.append(rgb)
        return outs[-1]

    timeit(f"full UV frame ({N_CHUNKS} dispatch)", full_frame_uv, maps)

    render_uv_cam = jax.jit(renderer._render_packed_uv_cam_impl,
                            static_argnums=(6, 7, 8, 9))

    def full_frame_uv_cam(maps):
        outs = []
        start = 0
        for _, slots, uv_p, ts_p, n_chunk in staged_uv:
            rgb, _, _ = render_uv_cam(
                maps, cam_dev, jnp.float32(start), slots, uv_p, ts_p,
                n_chunk, MAX_HITS, W, FOCAL)
            outs.append(rgb)
            start += n_chunk
        return outs[-1]

    cam_dev = jnp.asarray(cam)
    r_gather = full_frame_uv(maps)
    r_cam = full_frame_uv_cam(maps)
    err = float(jnp.max(jnp.abs(r_gather - r_cam)))
    print(f"uv-cam vs uv-gather max err: {err:.2e}", flush=True)
    timeit(f"full UV+cam frame ({N_CHUNKS} dispatch)", full_frame_uv_cam,
           maps)

    # components at chunk shapes (first chunk)
    from quadraturefields_tpu.ops import scan
    from quadraturefields_tpu.render.baked import hit_uv_texels
    from quadraturefields_tpu.models.ngp import ngp_features_to_rgb

    def prep(geom, slots, tri, ts_p, d_all):
        valid = slots >= 0
        ray_idx = jnp.where(valid, slots // MAX_HITS, n_chunk)
        ray_idx = ray_idx.astype(jnp.int32)
        ray_clip = jnp.clip(ray_idx, 0, n_chunk - 1)
        d = d_all[ray_clip]
        o = jnp.broadcast_to(cam_dev[:1], (n_chunk, 3))[ray_clip]
        xyz = o + d * ts_p[:, None]
        fd = geom["face_data"][jnp.maximum(tri, 0)]
        return valid, ray_idx, d, xyz, fd

    valid, ray_idx, d, xyz, fd = jax.jit(prep)(
        geom, slots, tri_p, ts_p, d_dev
    )
    timeit("  prep (slot math + face_data gather)", jax.jit(prep),
           geom, slots, tri_p, ts_p, d_dev)

    def texelize(xyz, fd):
        return hit_uv_texels(xyz, fd[..., :3], fd[..., 3:],
                             comp.texture_size)

    texels = jax.jit(texelize)(xyz, fd)
    timeit("  barycentric+uv->texels", jax.jit(texelize), xyz, fd)

    def gather(maps, texels):
        return maps[texels[:, 0], texels[:, 1]]

    tex = jax.jit(gather)(maps, texels)
    timeit("  texture row gather", jax.jit(gather), maps, texels)

    def decode(tex, d):
        feats = comp.get_features_from_packed_texels(tex)
        rgbs = ngp_features_to_rgb(feats[:, :-1], d, sg_cfg)
        return rgbs, feats[:, -1]

    timeit("  dequant+SG decode", jax.jit(decode), tex, d)
    rgbs, sigmas = jax.jit(decode)(tex, d)

    def composite(sigmas, rgbs, ray_idx, ts_p, valid):
        sig = jnp.where(valid, sigmas, 0.0)
        boundaries = scan.mark_pack_boundaries(ray_idx)
        weights, _, _ = scan.render_weight_from_density(
            ts_p, ts_p + renderer.render_step_size, sig, boundaries
        )
        weights = jnp.where(valid, weights, 0.0)
        rgb = scan.accumulate_along_rays(weights, ray_idx, rgbs, n_chunk)
        alpha = scan.accumulate_along_rays(
            weights, ray_idx, None, n_chunk
        )
        return (1.0 - alpha) + rgb

    timeit("  composite (scans)", jax.jit(composite), sigmas, rgbs,
           ray_idx, ts_p, valid)


if __name__ == "__main__":
    main()
