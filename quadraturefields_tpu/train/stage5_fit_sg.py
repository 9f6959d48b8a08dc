"""Stage 5: fit a spherical-Gaussian appearance model at mesh hits.

Rebuild of examples/train_fit_sg.py: the SG model (NGPRadianceFieldSGNew
head) learns rgb at ray-mesh hit points; density comes from the frozen
finetuned radiance field (no grad, utils.py:701-706); composite with
constant deltas and smooth-L1 against pixels (train_fit_sg.py:455-456).
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
from ..geometry.meshio import Mesh
from ..models.ngp import NGPConfig, ngp_forward, ngp_init, ngp_query_density
from ..ops.grid import (
    OccGridConfig,
    OccGridState,
    occ_grid_init,
    occ_grid_update,
    max_march_steps,
)
from ..render.quadrature import (
    HitRows,
    packed_hits_from_host,
    render_fit_sg_packed_stream,
    render_fit_sg_rows,
)
from ..utils.batching import bucket_num_rays, snap_pack_cap as _snap_pack_cap
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.metrics import psnr, smooth_l1_loss, ssim
from ..utils.optim import donate_if_accelerator, reference_lr_schedule


@dataclasses.dataclass
class Stage5Config:
    scene: str = "lego"
    data_root: str = "data/nerf_synthetic"
    exp_name: str = "finetune_sg"
    root: str = "runs/"
    ckpt_path: str = ""     # stage-4 finetune checkpoint
    mesh_path: str = ""     # mesh.ply from stage 4
    max_steps: int = 20000
    init_batch_size: int = 1024
    batch_size_log2: int = 18
    occ_thres: float = 0.01
    scaling: float = 0.0434
    up_sample: int = 2
    max_hits: int = 25
    num_lobes: int = 6
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
    grid_resolution: int = 128
    render_step_size: float = 5e-3
    ckpt_every: int = 1000
    log_every: int = 100
    seed: int = 42
    max_num_rays: int = 1 << 18
    # packed-hit query stream (see Stage4Config.pack_slack); 0 = dense
    pack_slack: float = 1.25
    # ray-batch data parallelism over the first N devices (0/1 = single
    # device); DP shards dense hit rows and packs per shard on device
    # (parallel/dp.py make_dp_fit_sg_train_step)
    num_devices: int = 0
    eval_views: Optional[int] = None
    # unbounded/360: "auto" switches on MIPNERF360_UNBOUNDED_SCENES
    # (reference train_fit_sg.py:233-260); "360"/"synthetic" force it
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
        """Static packed-hit budget (see Stage4Config.pack_cap)."""
        cap = int(self.pack_slack * self.target_sample_batch_size)
        return -(-cap // 1024) * 1024

    @property
    def aabb(self) -> np.ndarray:
        if self.is_unbounded:
            return np.array([-1, -1, -1, 1, 1, 1], np.float32)
        return np.array([-1, -1, -1, 1, 1, 1], np.float32) * self.scale

    @property
    def eff_render_step_size(self) -> float:
        return 1e-3 if self.is_unbounded else self.render_step_size

    def sg_config(self) -> NGPConfig:
        return NGPConfig(
            head="sg",
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

    def teacher_config(self) -> NGPConfig:
        return NGPConfig(
            head="mlp",
            use_viewdirs=False,
            unbounded=self.is_unbounded,
            num_layers=self.num_layers,
            log2_hashmap_size=self.log2_hashmap_size,
            n_levels=self.n_levels,
            n_features=self.n_features,
            interp=self.interp,
            grad_mode=self.grad_mode,
            layout=self.layout,
            grad_payload=self.grad_payload,
        )


class Stage5Trainer:
    def __init__(
        self,
        cfg: Stage5Config,
        teacher_params=None,
        occ_state=None,
        mesh: Optional[Mesh] = None,
        train_dataset=None,
    ):
        self.cfg = cfg
        self.sg_cfg = cfg.sg_config()
        self.teacher_cfg = cfg.teacher_config()
        self.occ_cfg = OccGridConfig(
            resolution=cfg.grid_resolution, occ_thre=cfg.occ_thres
        )
        self.aabb = jnp.asarray(cfg.aabb)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k_sg, k_t = jax.random.split(key, 3)
        if teacher_params is None:
            template = {
                "radiance_field": ngp_init(k_t, self.teacher_cfg),
                "occs": jnp.zeros((cfg.grid_resolution**3,), jnp.float32),
                "binaries": jnp.ones((cfg.grid_resolution,) * 3, bool),
            }
            ckpt = load_checkpoint(cfg.ckpt_path, template)
            teacher_params = ckpt["radiance_field"]
            occ_state = OccGridState(
                occs=jnp.asarray(ckpt["occs"]),
                binaries=jnp.asarray(ckpt["binaries"]),
                aabb=self.aabb,
            )
        self.teacher_params = teacher_params
        self.occ_state = occ_state or occ_grid_init(self.aabb, self.occ_cfg)

        # mesh.ply from stage 4 is already world-scaled: scale=1,
        # simplify_mesh=False (train_fit_sg.py:220-227)
        self.mesh_intersect = MeshIntersection(
            mesh_path=cfg.mesh_path or None,
            mesh=mesh,
            simplify_mesh=False,
            scale=1.0,
            num_intersections=cfg.max_hits,
            render_step_size=cfg.eff_render_step_size,
        )

        self.sg_params = ngp_init(k_sg, self.sg_cfg)
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
        self.opt_state = self.optimizer.init(self.sg_params)
        self.step = 0

        if train_dataset is not None:
            self.train_dataset = train_dataset
        elif cfg.is_unbounded:
            # 360 loader + knobs (reference train_fit_sg.py:233-247)
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
        # packed host transport: 12 B/hit upload instead of dense
        # [R, max_hits] rows (stage-5 never needs face vertices at all)
        self._packed = cfg.pack_slack > 0
        self._dp = bool(cfg.num_devices and cfg.num_devices > 1)
        if self._dp:
            # DP shards dense rows over rays; per-shard packing happens
            # on device inside the step (VERDICT r4 missing #4)
            self._packed = False
        self.prefetcher = HitPrefetcher(
            self.train_dataset.fetch_train_batch, self.mesh_intersect,
            depth=2,
            packed_cap=cfg.pack_cap if self._packed else None,
        )
        if self._dp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.dp import make_dp_fit_sg_train_step, make_mesh

            self.mesh = make_mesh(cfg.num_devices)
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())
            n_dev = self.mesh.devices.size
            shard_cap = -(-cfg.pack_cap // n_dev // 256) * 256
            self._dp_train_step = make_dp_fit_sg_train_step(
                self.mesh, self.aabb, self.sg_cfg, self.teacher_cfg,
                self.optimizer, cfg.eff_render_step_size,
                pack_cap=shard_cap,
            )
            self.sg_params = jax.device_put(self.sg_params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            self.teacher_params = jax.device_put(self.teacher_params, repl)
            self.occ_state = jax.device_put(self.occ_state, repl)
        self._occ_update = jax.jit(self._occ_update_impl)
        # sg_params/opt_state are reassigned from the step outputs
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=donate_if_accelerator(0, 1),
        )
        self._eval_render = jax.jit(self._eval_render_impl)

    def _occ_update_impl(self, occ_state, step, key):
        def occ_eval_fn(x):
            d = ngp_query_density(
                self.teacher_params, x, self.aabb, self.teacher_cfg
            )
            return d[..., 0] * self.cfg.eff_render_step_size

        return occ_grid_update(
            occ_state, step, key, occ_eval_fn, self.occ_cfg,
            contract_aabb=self.aabb if self.cfg.is_unbounded else None,
        )

    def _loss_fn(self, sg_params, origins, viewdirs, pixels, bkgd,
                 hit_args):
        """hit_args: packed -> (slots, tri, ts, num_valid);
        dense -> (tri_ids, ts, valid)."""
        kwargs = dict(
            ngp_forward_fn=lambda p, x, d, a, c: (
                lambda r: (r[0], r[1][..., 0])
            )(ngp_forward(p, x, d, a, c)),
            render_step_size=self.cfg.eff_render_step_size,
            bg_color="random",
            render_bkgd=bkgd,
        )
        ray_mask = None
        if self._packed:
            slots, tri, ts, num_valid = hit_args
            ph = packed_hits_from_host(
                slots, tri, ts, num_valid,
                n_rays=origins.shape[0], max_hits=self.cfg.max_hits,
            )
            rgb, alpha, depth, _, _, ray_mask = (
                render_fit_sg_packed_stream(
                    sg_params, self.teacher_params, ph,
                    origins.shape[0], origins, viewdirs,
                    self.aabb, self.sg_cfg, self.teacher_cfg, **kwargs,
                )
            )
            n_hits = ph.num_valid
        else:
            tri_ids, ts, valid = hit_args
            hits = HitRows(tri_ids=tri_ids, ts=ts, valid=valid)
            rgb, alpha, depth, _ = render_fit_sg_rows(
                sg_params, self.teacher_params, hits, origins, viewdirs,
                self.aabb, self.sg_cfg, self.teacher_cfg, **kwargs,
            )
            n_hits = jnp.sum(valid)
        loss = smooth_l1_loss(rgb, pixels, ray_mask=ray_mask)
        return loss, (rgb, n_hits)

    def _train_step_impl(self, sg_params, opt_state, origins, viewdirs,
                         pixels, bkgd, hit_args):
        (loss, (rgb, n_hits)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True
        )(sg_params, origins, viewdirs, pixels, bkgd, hit_args)
        updates, opt_state = self.optimizer.update(
            grads, opt_state, sg_params
        )
        sg_params = optax.apply_updates(sg_params, updates)
        return sg_params, opt_state, loss, n_hits, \
            jnp.mean((rgb - pixels) ** 2)

    def _eval_render_impl(self, sg_params, origins, viewdirs, tri_ids,
                          ts, valid):
        hits = HitRows(tri_ids=tri_ids, ts=ts, valid=valid)
        rgb, alpha, depth, _ = render_fit_sg_rows(
            sg_params, self.teacher_params, hits, origins, viewdirs,
            self.aabb, self.sg_cfg, self.teacher_cfg,
            ngp_forward_fn=lambda p, x, d, a, c: (
                lambda r: (r[0], r[1][..., 0])
            )(ngp_forward(p, x, d, a, c)),
            render_step_size=self.cfg.eff_render_step_size,
            bg_color="white",
        )
        return rgb, alpha, depth

    def train_one_step(self):
        cfg = self.cfg
        step = self.step
        self.key, k_occ = jax.random.split(self.key)
        if step % self.occ_cfg.update_interval == 0:
            self.occ_state = self._occ_update(self.occ_state, step, k_occ)
        if self._dp:
            from ..parallel.multihost import put_process_batch

            batch, tri_ids, ts, valid, _ = self.prefetcher.next()
            origins, viewdirs, pixels, tri_ids, ts, valid = (
                put_process_batch(
                    (batch["rays"].origins, batch["rays"].viewdirs,
                     batch["pixels"], tri_ids, ts, valid),
                    self.mesh, self._data_sharding,
                )
            )
            self.sg_params, self.opt_state, loss, n_hits = (
                self._dp_train_step(
                    self.sg_params, self.opt_state, self.teacher_params,
                    origins, viewdirs, pixels,
                    jnp.asarray(batch["color_bkgd"]), tri_ids, ts, valid,
                )
            )
            nh = int(n_hits)
            if nh > 0:
                num_rays = int(
                    self.train_dataset.num_rays
                    * cfg.target_sample_batch_size / float(nh)
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
            )
        else:
            batch, tri_ids, ts, valid, _ = self.prefetcher.next()
            hit_args = (
                jnp.asarray(tri_ids), jnp.asarray(ts), jnp.asarray(valid),
            )
        self.sg_params, self.opt_state, loss, n_hits, mse = \
            self._train_step(
                self.sg_params, self.opt_state,
                jnp.asarray(batch["rays"].origins),
                jnp.asarray(batch["rays"].viewdirs),
                jnp.asarray(batch["pixels"]),
                jnp.asarray(batch["color_bkgd"]),
                hit_args,
            )
        nh = int(n_hits)
        if nh > 0:
            num_rays = int(
                self.train_dataset.num_rays
                * cfg.target_sample_batch_size / float(nh)
            )
            self.train_dataset.update_num_rays(
                bucket_num_rays(num_rays, max_rays=cfg.max_num_rays)
            )
        self.step += 1
        return loss, nh, mse

    def render_view(self, data, chunk: int = 4096):
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
            rgb, _, _ = self._eval_render(
                self.sg_params, jnp.asarray(oc), jnp.asarray(dc),
                jnp.asarray(tri_ids), jnp.asarray(ts), jnp.asarray(valid),
            )
            outs.append(np.asarray(rgb))
        return np.concatenate(outs)[:n]

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
                    f"loss={float(loss):.5f} | {psnr_str}hits={nh} | "
                    f"num_rays={self.train_dataset.num_rays}"
                )
            if step > 0 and step % cfg.ckpt_every == 0:
                self.save(os.path.join(ckpt_dir, "fit_sg"))
        self.save(os.path.join(ckpt_dir, "fit_sg"))
        self.prefetcher.stop()

    def save(self, path):
        save_checkpoint(
            path,
            {
                "radiance_field": self.sg_params,
                "occs": self.occ_state.occs,
                "binaries": self.occ_state.binaries,
                "opt_state": self.opt_state,
                "step": self.step,
            },
        )
