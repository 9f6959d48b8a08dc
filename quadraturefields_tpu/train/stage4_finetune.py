"""Stage 4: joint finetune of radiance field + mesh-deformation field,
rendering only at ray-mesh quadrature points.

TPU-native rebuild of examples/train_finetune.py:
  * host BVH prefetcher supplies dense [R, max_hits] hit rows (the
    reference's DataLoader-worker Embree path, nerf_synthetic.py:242-259);
  * one jitted step runs the deformed-quadrature render
    (render_finetune_rows), the volumetric twin render, the dual
    smooth-L1 loss (train_finetune.py:525-528), the deformation
    regularizer, AND the per-face deformation scatter accumulation;
  * the radiance field is frozen for the first 300 steps
    (train_finetune.py:487-492) via a stop-gradient step variant;
  * every `mesh_update_every` steps the accumulated deformation is
    applied to the vertices, the BVH is refit, and mesh.ply exported
    (train_finetune.py:708-724).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.nerf_synthetic import SubjectLoader
from ..geometry.intersect import HitPrefetcher, MeshIntersection
from ..geometry.meshio import Mesh, save_ply
from ..models.field import FieldConfig, field_apply, field_init
from ..models.ngp import NGPConfig, ngp_forward, ngp_init, ngp_query_density
from ..ops.grid import (
    OccGridConfig,
    OccGridState,
    occ_grid_init,
    occ_grid_update,
    max_march_steps,
    max_march_steps_cone,
)
from ..render.quadrature import (
    HitRows,
    mesh_accumulate_deformation,
    mesh_update_vertices,
    packed_hits_from_host,
    render_finetune_packed_stream,
    render_finetune_rows,
)
from ..render.renderer import RenderConfig, render_rays_occgrid
from ..utils.batching import bucket_num_rays, snap_pack_cap as _snap_pack_cap
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.metrics import lpips_metric, psnr, smooth_l1_loss, ssim
from ..utils.optim import donate_if_accelerator, reference_lr_schedule


@dataclasses.dataclass
class Stage4Config:
    scene: str = "lego"
    data_root: str = "data/nerf_synthetic"
    exp_name: str = "finetune"
    root: str = "runs/"
    ckpt_path: str = ""     # stage-1 ngp checkpoint
    mesh_path: str = ""     # smp_mesh.ply from stage 3
    max_steps: int = 10000
    init_batch_size: int = 1024
    batch_size_log2: int = 17
    occ_thres: float = 0.01
    scaling: float = 0.0434          # deformation clip (run script)
    up_sample: int = 2
    voxel_size: float = 150.0
    max_hits: int = 25
    num_lobes: int = 0               # plain NGP head in the shipped recipe
    num_layers: int = 2
    log2_hashmap_size: int = 19
    n_levels: int = 16        # hash-grid levels (8 for the TPU-fast
    n_features: int = 2       # L8F4 headline config; 16x2 = tcnn parity)
    interp: str = "tet"       # hash-grid interpolation (hashgrid.py)
    grad_mode: str = "auto"   # table-gradient strategy (hashgrid.py)
    layout: str = "corner"    # hash-table layout — must match the
                              # upstream checkpoint (hashgrid.py)
    grad_payload: str = "f32"  # cell table-grad precision
    scale: float = 1.5
    lr: float = 2e-2
    freeze_rf_steps: int = 300
    mesh_update_every: int = 2000
    grid_resolution: int = 128
    # two-level march granularity for the volumetric twin (stage-1's
    # knob, train_ngp CLI --coarse_factor; 0 = legacy single-level)
    coarse_factor: int = 4
    render_step_size: float = 5e-3
    ckpt_every: int = 1000
    log_every: int = 100
    seed: int = 42
    eval_views: Optional[int] = None
    # smp_mesh.ply arrives pre-decimated from stage 3; the reference
    # passes simplify_mesh=False here (train_finetune.py:242)
    simplify_mesh: bool = False
    # dynamic ray-batch cap: when few rays hit the mesh (early training,
    # sparse fixture scenes), target/nh explodes; unbounded growth OOMs
    # the deformation-field backward graph
    max_num_rays: int = 1 << 18
    # packed-hit query stream: device work scales with ACTUAL hits
    # (pack_slack x the sample target) instead of R*max_hits slots;
    # 0 disables (dense row path, kept for parity tests)
    pack_slack: float = 1.25
    # ray-batch data parallelism over the first N devices (0/1 = single
    # device). DP rides the dense-row hit transport with per-shard
    # on-device packing (parallel/dp.py make_dp_finetune_train_step)
    num_devices: int = 0
    # deformation-field capacity knobs (reference values: 24 / 512,
    # train_finetune.py:387-399)
    field_log2_hashmap_size: int = 24
    field_max_res: int = 512
    # unbounded/360: "auto" switches on MIPNERF360_UNBOUNDED_SCENES
    # (reference train_finetune.py:248-282); "360"/"synthetic" force it
    scene_type: str = "auto"
    data_factor: int = 4      # 360 loader downsample factor

    @property
    def is_unbounded(self) -> bool:
        from .stage1_ngp import MIPNERF360_UNBOUNDED_SCENES

        if self.scene_type == "auto":
            return self.scene in MIPNERF360_UNBOUNDED_SCENES
        return self.scene_type == "360"

    @property
    def target_sample_batch_size(self) -> int:
        return 1 << self.batch_size_log2

    @property
    def pack_cap(self) -> int:
        """Static packed-hit budget: slack x the sample target, rounded
        up to 1024 (the dynamic batcher holds true hits near the target,
        so the slack absorbs per-step jitter)."""
        cap = int(self.pack_slack * self.target_sample_batch_size)
        return -(-cap // 1024) * 1024

    @property
    def aabb(self) -> np.ndarray:
        if self.is_unbounded:
            # reference train_finetune.py:257 (contraction ROI box)
            return np.array([-1, -1, -1, 1, 1, 1], np.float32)
        return np.array([-1, -1, -1, 1, 1, 1], np.float32) * self.scale

    # per-scene-type render knobs (reference train_finetune.py:248-282);
    # far_plane capped at 1e2 as in stages 1-2 (static cone march)
    @property
    def eff_render_step_size(self) -> float:
        return 1e-3 if self.is_unbounded else self.render_step_size

    @property
    def eff_near_plane(self) -> float:
        return 0.2 if self.is_unbounded else 0.0

    @property
    def eff_far_plane(self) -> float:
        return 1e2 if self.is_unbounded else 1e10

    @property
    def eff_alpha_thre(self) -> float:
        return 1e-2 if self.is_unbounded else 0.0

    @property
    def eff_cone_angle(self) -> float:
        return 0.004 if self.is_unbounded else 0.0

    def ngp_config(self) -> NGPConfig:
        head = "sg" if self.num_lobes > 0 else "mlp"
        return NGPConfig(
            head=head,
            use_viewdirs=False,
            unbounded=self.is_unbounded,
            num_g_lobes=self.num_lobes,
            num_layers=self.num_layers,
            log2_hashmap_size=self.log2_hashmap_size,
            n_levels=self.n_levels,
            n_features=self.n_features,
            interp=self.interp,
            grad_mode=self.grad_mode,
            layout=self.layout,
            grad_payload=self.grad_payload,
        )

    def field_config(self) -> FieldConfig:
        # deformation field: log2_T=24, hidden 32, relu, output_dim 1
        # (reference train_finetune.py:387-399)
        return FieldConfig(
            scale=self.scale,
            back_prop=False,
            log2_hashmap_size=self.field_log2_hashmap_size,
            n_levels=16,
            max_resolution=self.field_max_res,
            min_resolution=16,
            output_dim=1,
            hidden_size=32,
            nl="relu",
            interp=self.interp,
            grad_mode=self.grad_mode,
            layout=self.layout,
            grad_payload=self.grad_payload,
        )

    def render_config(self) -> RenderConfig:
        if self.is_unbounded:
            max_steps = max_march_steps_cone(
                self.eff_near_plane, self.eff_far_plane,
                self.eff_render_step_size, self.eff_cone_angle,
            )
        else:
            max_steps = max_march_steps(
                self.aabb, self.eff_render_step_size
            )
        # two-level coarse march for the volumetric twin, exactly as
        # stage-1 configures it: without it the twin marches every ray
        # at single-dt granularity (O(R*max_steps) occupancy gathers —
        # measured 4x slower at the 2^17-ray contract, PERF_NOTES r4)
        from ..ops.grid import resolve_coarse_stride

        stride, dil = resolve_coarse_stride(
            -1, self.aabb, self.grid_resolution,
            self.coarse_factor, self.eff_render_step_size,
        )
        return RenderConfig(
            render_step_size=self.eff_render_step_size,
            near_plane=self.eff_near_plane,
            far_plane=self.eff_far_plane,
            cone_angle=self.eff_cone_angle,
            alpha_thre=self.eff_alpha_thre,
            max_steps=max_steps,
            max_samples_total=self.target_sample_batch_size,
            coarse_factor=0 if self.is_unbounded else self.coarse_factor,
            coarse_stride=stride,
            coarse_dilation=dil,
        )


class Stage4Trainer:
    def __init__(
        self,
        cfg: Stage4Config,
        ngp_params=None,
        occ_state=None,
        mesh: Optional[Mesh] = None,
        train_dataset=None,
        test_dataset=None,
    ):
        self.cfg = cfg
        self.ngp_cfg = cfg.ngp_config()
        self.field_cfg = cfg.field_config()
        self.rcfg = cfg.render_config()
        self.occ_cfg = OccGridConfig(
            resolution=cfg.grid_resolution, occ_thre=cfg.occ_thres
        )
        self.aabb = jnp.asarray(cfg.aabb)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k_field, k_ngp = jax.random.split(key, 3)

        if ngp_params is None:
            template = {
                "params": ngp_init(k_ngp, self.ngp_cfg),
                "occs": jnp.zeros((cfg.grid_resolution**3,), jnp.float32),
                "binaries": jnp.ones((cfg.grid_resolution,) * 3, bool),
            }
            ckpt = load_checkpoint(cfg.ckpt_path, template)
            ngp_params = ckpt["params"]
            occ_state = OccGridState(
                occs=jnp.asarray(ckpt["occs"]),
                binaries=jnp.asarray(ckpt["binaries"]),
                aabb=self.aabb,
            )
        self.occ_state = occ_state or occ_grid_init(self.aabb, self.occ_cfg)

        self.mesh_intersect = MeshIntersection(
            mesh_path=cfg.mesh_path or None,
            mesh=mesh,
            simplify_mesh=cfg.simplify_mesh,
            scale=cfg.scale,
            voxel_size=cfg.voxel_size,
            num_intersections=cfg.max_hits,
            render_step_size=cfg.eff_render_step_size,
        )
        n_faces = self.mesh_intersect.n_faces
        self.cache_d = jnp.zeros((n_faces, 3), jnp.float32)
        self.cache_w = jnp.full((n_faces,), 1e-8, jnp.float32)
        # packed host transport (12 B/hit) + device-resident face-vertex
        # table: the hash-grid queries AND the host->device upload scale
        # with actual hits, not R*max_hits slots (PERF_NOTES round 4)
        self._packed = cfg.pack_slack > 0
        self._dp = bool(cfg.num_devices and cfg.num_devices > 1)
        if self._dp:
            # the DP step shards dense [R,H] hit rows over rays and
            # packs per shard on device (VERDICT r4 missing #4)
            self._packed = False
        self.face_verts_dev = jnp.asarray(
            self.mesh_intersect.face_vertices_table()
        )

        self.params = {
            "rf": ngp_params,
            "field": field_init(k_field, self.field_cfg),
        }
        schedule = reference_lr_schedule(
            cfg.lr, cfg.max_steps, warmup_iters=1000,
            milestones=[
                cfg.max_steps // 4,
                cfg.max_steps * 2,
                cfg.max_steps * 6 // 10,
            ],
        )
        self.optimizer = optax.chain(
            optax.scale_by_adam(eps=1e-15),
            optax.scale_by_learning_rate(schedule),
        )
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

        if train_dataset is not None:
            self.train_dataset = train_dataset
        elif cfg.is_unbounded:
            # 360 loader + knobs (reference train_finetune.py:248-263)
            from ..data.nerf_360_v2 import SubjectLoader as Loader360

            self.train_dataset = Loader360(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split="train",
                num_rays=cfg.init_batch_size,
                color_bkgd_aug="random",
                factor=cfg.data_factor,
                seed=cfg.seed,
            )
        else:
            self.train_dataset = SubjectLoader(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split="train",
                num_rays=cfg.init_batch_size,
                upsample=cfg.up_sample,
                seed=cfg.seed,
            )
        self.test_dataset = test_dataset
        self.prefetcher = HitPrefetcher(
            self._make_train_batch, self.mesh_intersect, depth=2,
            packed_cap=cfg.pack_cap if self._packed else None,
        )

        if self._dp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.dp import (
                make_dp_finetune_train_step,
                make_dp_occ_update,
                make_mesh,
            )

            self.mesh = make_mesh(cfg.num_devices)
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())
            n_dev = self.mesh.devices.size
            shard_cap = -(-cfg.pack_cap // n_dev // 256) * 256
            dp_kwargs = dict(
                mesh=self.mesh, aabb=self.aabb, ngp_cfg=self.ngp_cfg,
                field_cfg=self.field_cfg, rcfg=self.rcfg,
                optimizer=self.optimizer, n_faces=n_faces,
                scaling=cfg.scaling,
                render_step_size=cfg.eff_render_step_size,
                pack_cap=shard_cap,
            )
            self._dp_step_frozen = make_dp_finetune_train_step(
                freeze_rf=True, **dp_kwargs
            )
            self._dp_step_joint = make_dp_finetune_train_step(
                freeze_rf=False, **dp_kwargs
            )
            self._dp_occ_update = make_dp_occ_update(
                self.mesh, self.aabb, self.ngp_cfg, self.occ_cfg,
                cfg.eff_render_step_size,
                contract_aabb=self.aabb if cfg.is_unbounded else None,
            )
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            self.occ_state = jax.device_put(self.occ_state, repl)
            self.cache_d = jax.device_put(self.cache_d, repl)
            self.cache_w = jax.device_put(self.cache_w, repl)
        self._occ_update = jax.jit(self._occ_update_impl)
        # params/opt_state/cache_d/cache_w are all reassigned from the
        # step outputs each call (argnums exclude occ_state at 2)
        _donate = donate_if_accelerator(0, 1, 3, 4)
        self._train_step_frozen = jax.jit(
            lambda *a: self._train_step_impl(*a, freeze_rf=True),
            donate_argnums=_donate,
        )
        self._train_step_joint = jax.jit(
            lambda *a: self._train_step_impl(*a, freeze_rf=False),
            donate_argnums=_donate,
        )
        self._eval_render = jax.jit(self._eval_render_impl)

    def _make_train_batch(self):
        return self.train_dataset.fetch_train_batch()

    def _occ_update_impl(self, params, occ_state, step, key):
        def occ_eval_fn(x):
            d = ngp_query_density(params["rf"], x, self.aabb, self.ngp_cfg)
            return d[..., 0] * self.cfg.eff_render_step_size

        return occ_grid_update(
            occ_state, step, key, occ_eval_fn, self.occ_cfg,
            contract_aabb=self.aabb if self.cfg.is_unbounded else None,
        )

    def _loss_fn(
        self, params, occ_state, origins, viewdirs, pixels, bkgd,
        hit_args, key, freeze_rf,
    ):
        """hit_args is mode-dependent (static python structure at trace
        time): packed -> (slots, tri, ts, num_valid, face_verts_table);
        dense -> (tri_ids, ts, valid, face_vertices [R,H,3,3])."""
        cfg = self.cfg
        render_kwargs = dict(
            ngp_forward_fn=lambda p, x, d, a, c: (
                lambda r: (r[0], r[1][..., 0])
            )(ngp_forward(p, x, d, a, c)),
            field_apply_fn=field_apply,
            scaling=cfg.scaling,
            render_step_size=cfg.eff_render_step_size,
            bg_color="random",
            render_bkgd=bkgd,
            key=key,
            stop_gradient_rf=freeze_rf,
        )
        if self._packed:
            slots, tri, ts, num_valid, face_verts = hit_args
            ph = packed_hits_from_host(
                slots, tri, ts, num_valid,
                n_rays=origins.shape[0], max_hits=cfg.max_hits,
            )
            out = render_finetune_packed_stream(
                params["rf"], params["field"], ph, origins.shape[0],
                cfg.max_hits, origins, viewdirs, face_verts,
                self.aabb, self.ngp_cfg, self.field_cfg, **render_kwargs,
            )
        else:
            tri_ids, ts, valid, face_vertices = hit_args
            hits = HitRows(tri_ids=tri_ids, ts=ts, valid=valid)
            out = render_finetune_rows(
                params["rf"], params["field"], hits, origins, viewdirs,
                face_vertices, self.aabb, self.ngp_cfg, self.field_cfg,
                **render_kwargs,
            )
        rf_params = (
            jax.tree_util.tree_map(jax.lax.stop_gradient, params["rf"])
            if freeze_rf else params["rf"]
        )
        vol = render_rays_occgrid(
            rf_params, self.aabb, self.ngp_cfg, occ_state,
            origins, viewdirs, self.rcfg, render_bkgd=bkgd,
            stratified=True, key=key,
        )
        # quad term: exclude cap-truncated rays (packed_ray_mask) —
        # their composite is missing hits; the volumetric twin is
        # per-ray complete and stays unmasked
        rgb_discrete = smooth_l1_loss(
            out["rgb"], pixels, ray_mask=out.get("ray_mask")
        )
        rgb_smooth = smooth_l1_loss(vol.rgb, pixels)
        loss = (rgb_discrete + rgb_smooth) / 2.0 + out["reg"]
        aux = {
            "rgb": out["rgb"],
            "weights": out["weights"],
            "tri_ids": out["tri_ids"],
            "valid": out["valid"],
            "dh": out["dh"],
            "n_hits": out["n_hits"],
            "reg": out["reg"],
        }
        return loss, aux

    def _train_step_impl(
        self, params, opt_state, occ_state, cache_d, cache_w,
        origins, viewdirs, pixels, bkgd, hit_args, key, freeze_rf,
    ):
        (loss, aux), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True
        )(params, occ_state, origins, viewdirs, pixels, bkgd,
          hit_args, key, freeze_rf)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        cache_d, cache_w = mesh_accumulate_deformation(
            cache_d, cache_w, aux["dh"], aux["weights"], aux["tri_ids"],
            aux["valid"], self.mesh_intersect.n_faces,
        )
        return params, opt_state, cache_d, cache_w, loss, aux["n_hits"], \
            jnp.mean((aux["rgb"] - pixels) ** 2)

    def _eval_render_impl(self, params, tri_ids, ts, valid, face_vertices,
                          origins, viewdirs, key):
        hits = HitRows(tri_ids=tri_ids, ts=ts, valid=valid)
        out = render_finetune_rows(
            params["rf"], params["field"], hits, origins, viewdirs,
            face_vertices, self.aabb, self.ngp_cfg, self.field_cfg,
            ngp_forward_fn=lambda p, x, d, a, c: (
                lambda r: (r[0], r[1][..., 0])
            )(ngp_forward(p, x, d, a, c)),
            field_apply_fn=field_apply,
            scaling=self.cfg.scaling,
            render_step_size=self.cfg.eff_render_step_size,
            bg_color="white",
            key=key,
        )
        return out["rgb"], out["alpha"], out["depth"]

    def train_one_step(self):
        cfg = self.cfg
        step = self.step
        self.key, k_occ, k_step = jax.random.split(self.key, 3)
        if step % self.occ_cfg.update_interval == 0:
            if self._dp:
                self.occ_state = self._dp_occ_update(
                    self.params["rf"], self.occ_state, jnp.int32(step),
                    k_occ,
                )
            else:
                self.occ_state = self._occ_update(
                    self.params, self.occ_state, step, k_occ
                )
        if self._dp:
            from ..parallel.multihost import put_process_batch

            batch, tri_ids, ts, valid, fv = self.prefetcher.next()
            (origins, viewdirs, pixels, tri_ids, ts, valid, fv) = (
                put_process_batch(
                    (batch["rays"].origins, batch["rays"].viewdirs,
                     batch["pixels"], tri_ids, ts, valid, fv),
                    self.mesh, self._data_sharding,
                )
            )
            step_fn = (
                self._dp_step_frozen
                if step < cfg.freeze_rf_steps
                else self._dp_step_joint
            )
            (self.params, self.opt_state, self.cache_d, self.cache_w,
             loss, n_hits) = step_fn(
                self.params, self.opt_state, self.occ_state,
                self.cache_d, self.cache_w, origins, viewdirs, pixels,
                jnp.asarray(batch["color_bkgd"]), tri_ids, ts, valid,
                fv, k_step,
            )
            nh = int(n_hits)
            if nh > 0:
                num_rays = int(
                    self.train_dataset.num_rays
                    * cfg.target_sample_batch_size / float(max(nh, 1))
                )
                self.train_dataset.update_num_rays(
                    bucket_num_rays(num_rays, max_rays=cfg.max_num_rays)
                )
            self.step += 1
            return loss, nh, None  # DP step reports no rgb MSE
        if self._packed:
            batch, slots, tri, ts, total = self.prefetcher.next()
            B = _snap_pack_cap(total, cfg.pack_cap)
            hit_args = (
                jnp.asarray(slots[:B]), jnp.asarray(tri[:B]),
                jnp.asarray(ts[:B]),
                jnp.asarray(np.int32(min(total, np.iinfo(np.int32).max))),
                self.face_verts_dev,
            )
        else:
            batch, tri_ids, ts, valid, fv = self.prefetcher.next()
            hit_args = (
                jnp.asarray(tri_ids), jnp.asarray(ts),
                jnp.asarray(valid), jnp.asarray(fv),
            )
        step_fn = (
            self._train_step_frozen
            if step < cfg.freeze_rf_steps
            else self._train_step_joint
        )
        (self.params, self.opt_state, self.cache_d, self.cache_w,
         loss, n_hits, mse) = step_fn(
            self.params, self.opt_state, self.occ_state,
            self.cache_d, self.cache_w,
            jnp.asarray(batch["rays"].origins),
            jnp.asarray(batch["rays"].viewdirs),
            jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["color_bkgd"]),
            hit_args, k_step,
        )
        nh = int(n_hits)
        if nh > 0:
            num_rays = int(
                self.train_dataset.num_rays
                * cfg.target_sample_batch_size / float(max(nh, 1))
            )
            self.train_dataset.update_num_rays(
                bucket_num_rays(num_rays, max_rays=cfg.max_num_rays)
            )
        self.step += 1
        return loss, nh, mse

    def apply_mesh_update(self, out_dir=None):
        """update_faces + BVH refit + optional mesh.ply export."""
        new_vertices = mesh_update_vertices(
            self.mesh_intersect.mesh.vertices,
            self.mesh_intersect.mesh.faces,
            self.cache_d,
            self.cache_w,
            self.cfg.scaling,
        )
        self.prefetcher.drain_and_pause()
        self.mesh_intersect.update_vertices(new_vertices.astype(np.float32))
        n_faces = self.mesh_intersect.n_faces
        self.cache_d = jnp.zeros((n_faces, 3), jnp.float32)
        self.cache_w = jnp.full((n_faces,), 1e-8, jnp.float32)
        if self._dp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            self.cache_d = jax.device_put(self.cache_d, repl)
            self.cache_w = jax.device_put(self.cache_w, repl)
        self.face_verts_dev = jnp.asarray(
            self.mesh_intersect.face_vertices_table()
        )
        if out_dir:
            save_ply(
                os.path.join(out_dir, "mesh.ply"), self.mesh_intersect.mesh
            )

    def render_view(self, data, chunk: int = 4096):
        """Quadrature render of a full view (white bkgd)."""
        origins = np.asarray(data["rays"].origins)
        viewdirs = np.asarray(data["rays"].viewdirs)
        n = origins.shape[0]
        n_pad = (n + chunk - 1) // chunk * chunk
        o = np.concatenate([origins, np.zeros((n_pad - n, 3), np.float32)])
        d = np.concatenate(
            [viewdirs, np.tile([[0, 0, 1.0]], (n_pad - n, 1))]
        ).astype(np.float32)
        outs = []
        for i in range(0, n_pad, chunk):
            oc, dc = o[i:i + chunk], d[i:i + chunk]
            tri_ids, ts, valid = self.mesh_intersect.intersect_rows(oc, dc)
            fv = self.mesh_intersect.face_vertices(tri_ids)
            self.key, k = jax.random.split(self.key)
            rgb, _, _ = self._eval_render(
                self.params, jnp.asarray(tri_ids), jnp.asarray(ts),
                jnp.asarray(valid), jnp.asarray(fv), jnp.asarray(oc),
                jnp.asarray(dc), k,
            )
            outs.append(np.asarray(rgb))
        return np.concatenate(outs)[:n]

    def evaluate(self, dataset, n_views=None):
        import cv2

        cfg = self.cfg
        n = len(dataset)
        if n_views is not None:
            n = min(n, n_views)
        H, W = dataset.HEIGHT, dataset.WIDTH
        h, w = H // cfg.up_sample, W // cfg.up_sample
        psnrs, ssims, lpipss = [], [], []
        for i in range(n):
            data = dataset.fetch_eval_view(i)
            rgb = self.render_view(data).reshape(H, W, 3)
            if cfg.up_sample != 1:
                rgb = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_AREA)
            pixels = data["pixels"].reshape(h, w, 3)
            psnrs.append(float(psnr(jnp.asarray(rgb), jnp.asarray(pixels))))
            ssims.append(float(ssim(jnp.asarray(rgb), jnp.asarray(pixels))))
            lpipss.append(lpips_metric(rgb, pixels))
        return {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "lpips": float(np.mean(lpipss)),
        }

    def train(self, log_fn=print):
        cfg = self.cfg
        out_dir = os.path.join(cfg.root, "results", cfg.scene, cfg.exp_name)
        ckpt_dir = os.path.join(cfg.root, "ckpts", cfg.scene, cfg.exp_name)
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        tic = time.time()
        while self.step <= cfg.max_steps:
            step = self.step
            loss, nh, mse = self.train_one_step()
            if step % cfg.log_every == 0:
                psnr_str = (
                    "" if mse is None else
                    f"psnr={-10.0 * float(jnp.log(mse)) / np.log(10):.2f}"
                    " | "
                )
                log_fn(
                    f"elapsed={time.time() - tic:.1f}s | step={step} | "
                    f"loss={float(loss):.5f} | {psnr_str}"
                    f"hits={nh} | num_rays={self.train_dataset.num_rays}"
                )
            if step > 0 and step % cfg.mesh_update_every == 0:
                # before/after eval sandwich around the vertex update
                # (reference train_finetune.py:696-743)
                results = {}
                if self.test_dataset is not None:
                    results["before"] = self.evaluate(
                        self.test_dataset, n_views=cfg.eval_views
                    )
                self.apply_mesh_update(out_dir)
                if self.test_dataset is not None:
                    results["after"] = self.evaluate(
                        self.test_dataset, n_views=cfg.eval_views
                    )
                    log_fn(f"step={step} mesh update: {results}")
                    with open(
                        os.path.join(out_dir, "log.txt"), "a"
                    ) as f:
                        f.write(f"step: {step}, {results}\n")
            if step > 0 and step % cfg.ckpt_every == 0:
                self.save(os.path.join(ckpt_dir, "finetune"))
        self.apply_mesh_update(out_dir)
        self.save(os.path.join(ckpt_dir, "finetune"))
        self.prefetcher.stop()

    def save(self, path):
        save_checkpoint(
            path,
            {
                "radiance_field": self.params["rf"],
                "field_model": self.params["field"],
                "occs": self.occ_state.occs,
                "binaries": self.occ_state.binaries,
                "opt_state": self.opt_state,
                "step": self.step,
            },
        )
