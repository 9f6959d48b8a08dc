"""Stage 2: distill the frozen NGP's rendering weights into a
quadrature field.

TPU-native rebuild of examples/train_field.py: per step,
  1. (no grad) volumetric render of a ray batch with forward AND
     reverse per-sample weights (render_rays_field);
  2. sample positions are NGP-normalized to [0,1] then shifted by -0.5
     into the field domain (train_field.py:342-344);
  3. field + spatial gradient via vjp (field_with_grad);
  4. loss = mean | max(w, w_rev) - |grad_f . dir| | over valid samples
     (field.py:253-259), Adam lr 2e-2 with the reference schedule.
At the end: 1024^3 supersampled field/grad grid export + occupancy
binaries + checkpoint (train_field.py:396-419).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.nerf_synthetic import SubjectLoader
from ..models.field import (
    FieldConfig,
    field_init,
    field_loss,
    field_with_grad,
)
from ..models.ngp import NGPConfig, ngp_init, ngp_normalize, ngp_query_density
from ..ops.grid import (
    OccGridConfig,
    OccGridState,
    occ_grid_init,
    occ_grid_update,
    max_march_steps,
    max_march_steps_cone,
    resolve_coarse_stride as _resolve_coarse_stride,
)
from ..render.renderer import RenderConfig, render_rays_field
from ..utils.batching import bucket_num_rays
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.grid_export import (
    extract_density_grid,
    extract_field_grid,
    extract_field_grid_h5,
)
from ..utils.optim import donate_if_accelerator, make_ngp_optimizer


@dataclasses.dataclass
class Stage2Config:
    scene: str = "lego"
    data_root: str = "data/nerf_synthetic"
    exp_name: str = "field"
    root: str = "runs/"
    ckpt_path: str = ""  # stage-1 checkpoint (ngp)
    train_split: str = "train"
    max_steps: int = 25000
    init_batch_size: int = 1024
    batch_size_log2: int = 18
    occ_thres: float = 0.01
    num_lobes: int = 2  # must match the stage-1 model
    num_layers: int = 2
    log2_hashmap_size: int = 19  # stage-1 NGP table
    n_levels: int = 16        # stage-1 NGP levels (must match ckpt)
    n_features: int = 2       # stage-1 NGP features per level
    interp: str = "tet"       # hash-grid interpolation (hashgrid.py)
    grad_mode: str = "auto"   # table-gradient strategy (hashgrid.py)
    layout: str = "corner"    # hash-table layout — must match the
                              # upstream checkpoint (hashgrid.py)
    grad_payload: str = "f32"  # cell table-grad precision
    field_log2_hashmap_size: int = 30  # field table (run script value)
    field_scale: float = 0.5
    field_max_res: int = 512
    field_min_res: int = 16
    field_hidden_size: int = 16
    scale: float = 1.5
    lr: float = 2e-2
    grid_resolution: int = 128
    render_step_size: float = 5e-3
    alpha_thre: float = 0.0
    grid_export_size: int = 1024
    ckpt_every: int = 1000
    log_every: int = 100
    seed: int = 42
    # two-level march factor (0 = single-level; exact either way)
    coarse_factor: int = 4
    # coarse probe stride in dt units: -1 auto, 0 legacy, >0 explicit
    coarse_stride: int = -1
    max_num_rays: int = 1 << 20
    export_grids: bool = True
    # field slice plots every N steps (reference train_field.py:374-383;
    # 0 disables)
    plot_every: int = 0
    # unbounded/360: "auto" switches on MIPNERF360_UNBOUNDED_SCENES
    # (reference train_field.py:151-152); "360"/"synthetic" force it
    scene_type: str = "auto"
    data_factor: int = 4      # 360 loader downsample factor
    # ray-batch data parallelism over the first N devices (0/1 =
    # single device): field step + frozen-NGP occ refresh under a 1-D
    # mesh via parallel/dp.py (CLI --num_devices)
    num_devices: int = 0

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
    def aabb(self) -> np.ndarray:
        if self.is_unbounded:
            # reference train_field.py:159 (contraction ROI box)
            return np.array([-1, -1, -1, 1, 1, 1], np.float32)
        return np.array([-1, -1, -1, 1, 1, 1], np.float32) * self.scale

    # per-scene-type render knobs (reference train_field.py:151-196):
    # 360 = step 1e-3, near 0.2, alpha_thre 1e-2, cone 0.004. The
    # reference's far_plane is 1e10 there; static-shape cone marching
    # caps it at 1e2 like stage 1 (train_ngp_nerf_sg_occ.py:168) —
    # past t=100 every contracted sample lands in the same asymptotic
    # boundary shell of the occupancy grid.
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
        return 1e-2 if self.is_unbounded else self.alpha_thre

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
        # shipped values: scale=0.5, log2_T=30, L=16, max_res=512,
        # min_res=16, hidden=16, back_prop=False (train_field.py:238-252)
        return FieldConfig(
            scale=self.field_scale,
            back_prop=False,
            log2_hashmap_size=self.field_log2_hashmap_size,
            n_levels=16,
            max_resolution=self.field_max_res,
            min_resolution=self.field_min_res,
            output_dim=1,
            hidden_size=self.field_hidden_size,
            nl="elu",
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
        stride, dil = _resolve_coarse_stride(
            self.coarse_stride, self.aabb, self.grid_resolution,
            self.coarse_factor, self.eff_render_step_size,
        )
        return RenderConfig(
            render_step_size=self.eff_render_step_size,
            near_plane=self.eff_near_plane,
            far_plane=self.eff_far_plane,
            cone_angle=self.eff_cone_angle,
            alpha_thre=self.eff_alpha_thre,
            early_stop_eps=1e-4,  # more supervised points (utils.py:432)
            max_steps=max_steps,
            max_samples_total=self.target_sample_batch_size,
            coarse_factor=0 if self.is_unbounded else self.coarse_factor,
            coarse_stride=stride,
            coarse_dilation=dil,
        )


class Stage2Trainer:
    def __init__(self, cfg: Stage2Config, ngp_params=None, occ_state=None,
                 train_dataset=None):
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
            if cfg.ckpt_path:
                template = {
                    "params": ngp_init(k_ngp, self.ngp_cfg),
                    "occs": jnp.zeros(
                        (cfg.grid_resolution**3,), jnp.float32
                    ),
                    "binaries": jnp.ones(
                        (cfg.grid_resolution,) * 3, bool
                    ),
                }
                ckpt = load_checkpoint(cfg.ckpt_path, template)
                ngp_params = ckpt["params"]
                occ_state = OccGridState(
                    occs=jnp.asarray(ckpt["occs"]),
                    binaries=jnp.asarray(ckpt["binaries"]),
                    aabb=self.aabb,
                )
            else:
                raise ValueError("need ngp_params or ckpt_path")
        self.ngp_params = ngp_params
        self.occ_state = occ_state or occ_grid_init(self.aabb, self.occ_cfg)

        self.field_params = field_init(k_field, self.field_cfg)
        if train_dataset is not None:
            self.train_dataset = train_dataset
        elif cfg.is_unbounded:
            # 360 loader + knobs (reference train_field.py:151-165)
            from ..data.nerf_360_v2 import SubjectLoader as Loader360

            self.train_dataset = Loader360(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split=cfg.train_split,
                num_rays=cfg.init_batch_size,
                color_bkgd_aug="random",
                factor=cfg.data_factor,
                seed=cfg.seed,
            )
        else:
            self.train_dataset = SubjectLoader(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split=cfg.train_split,
                num_rays=cfg.init_batch_size,
                seed=cfg.seed,
            )
        # reference train_field.py:157/177: wd 0 (360), 1e-5
        # (materials/ficus/drums), else 1e-6
        if cfg.is_unbounded:
            wd = 0.0
        elif cfg.scene in ("materials", "ficus", "drums"):
            wd = 1e-5
        else:
            wd = 1e-6
        self.optimizer = make_ngp_optimizer(
            cfg.max_steps, lr=cfg.lr, weight_decay=wd
        )
        self.opt_state = self.optimizer.init(self.field_params)
        self.step = 0

        self._dp = cfg.num_devices and cfg.num_devices > 1
        if self._dp:
            # ray-batch DP like stage-1 (parallel/dp.py): field step +
            # frozen-NGP occ refresh under a 1-D mesh; params
            # replicated, ray tensors sharded
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.dp import (
                make_dp_field_train_step,
                make_dp_occ_update,
                make_mesh,
            )

            self.mesh = make_mesh(cfg.num_devices)
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())
            self._dp_train_step = make_dp_field_train_step(
                self.mesh, self.aabb, self.ngp_cfg, self.field_cfg,
                self.rcfg, self.optimizer,
            )
            self._dp_occ_update = make_dp_occ_update(
                self.mesh, self.aabb, self.ngp_cfg, self.occ_cfg,
                self.rcfg.render_step_size,
                contract_aabb=self.aabb if cfg.is_unbounded else None,
            )
            self.field_params = jax.device_put(self.field_params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            self.ngp_params = jax.device_put(self.ngp_params, repl)
            self.occ_state = jax.device_put(self.occ_state, repl)

        self._occ_update = jax.jit(self._occ_update_impl)
        # field_params/opt_state are reassigned from the step outputs
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=donate_if_accelerator(0, 1),
        )

    def _occ_update_impl(self, ngp_params, occ_state, step, key):
        def occ_eval_fn(x):
            d = ngp_query_density(ngp_params, x, self.aabb, self.ngp_cfg)
            return d[..., 0] * self.cfg.eff_render_step_size

        return occ_grid_update(
            occ_state, step, key, occ_eval_fn, self.occ_cfg,
            contract_aabb=self.aabb if self.cfg.is_unbounded else None,
        )

    def _train_step_impl(
        self, field_params, opt_state, ngp_params, occ_state,
        origins, viewdirs, pixels, bkgd, key,
    ):
        # 1-2: no-grad render with fwd+rev weights, then field domain map
        res = render_rays_field(
            ngp_params, self.aabb, self.ngp_cfg, occ_state,
            origins, viewdirs, self.rcfg,
            render_bkgd=bkgd, stratified=True, key=key,
        )
        _, pos01 = ngp_normalize(res.positions, self.aabb, self.ngp_cfg)
        positions = jax.lax.stop_gradient(pos01 - 0.5)

        def loss_fn(fp):
            _, fgrad = field_with_grad(fp, positions, self.field_cfg)
            return field_loss(
                res.weights, res.weights_rev, fgrad, res.dirs,
                mask=res.valid,
            )

        loss, grads = jax.value_and_grad(loss_fn)(field_params)
        updates, opt_state = self.optimizer.update(
            grads, opt_state, field_params
        )
        field_params = optax.apply_updates(field_params, updates)
        mse = jnp.mean((res.rgb - pixels) ** 2)
        return field_params, opt_state, loss, res.num_valid, mse

    def train_one_step(self):
        cfg = self.cfg
        step = self.step
        self.key, k_occ, k_render = jax.random.split(self.key, 3)
        if step % self.occ_cfg.update_interval == 0:
            if self._dp:
                self.occ_state = self._dp_occ_update(
                    self.ngp_params, self.occ_state, jnp.int32(step),
                    k_occ,
                )
            else:
                self.occ_state = self._occ_update(
                    self.ngp_params, self.occ_state, step, k_occ
                )
        data = self.train_dataset.fetch_train_batch()
        origins = jnp.asarray(data["rays"].origins)
        viewdirs = jnp.asarray(data["rays"].viewdirs)
        if self._dp:
            from ..parallel.multihost import put_process_batch

            origins, viewdirs = put_process_batch(
                (origins, viewdirs), self.mesh, self._data_sharding
            )
            (self.field_params, self.opt_state, loss, num_valid) = (
                self._dp_train_step(
                    self.field_params, self.opt_state, self.ngp_params,
                    self.occ_state, origins, viewdirs,
                    jnp.asarray(data["color_bkgd"]), k_render,
                )
            )
            mse = None  # the DP step reports the distillation loss only
        else:
            (self.field_params, self.opt_state, loss, num_valid, mse) = (
                self._train_step(
                    self.field_params, self.opt_state, self.ngp_params,
                    self.occ_state, origins, viewdirs,
                    jnp.asarray(data["pixels"]),
                    jnp.asarray(data["color_bkgd"]),
                    k_render,
                )
            )
        nv = int(num_valid)
        if cfg.target_sample_batch_size > 0 and nv > 0:
            num_rays = int(
                self.train_dataset.num_rays
                * cfg.target_sample_batch_size / float(nv)
            )
            self.train_dataset.update_num_rays(
                bucket_num_rays(num_rays, max_rays=cfg.max_num_rays)
            )
        self.step += 1
        return loss, nv, mse

    def field_with_grad_fn(self):
        """(coords [M,3]) -> (field [M], |grad| [M]) for grid export."""

        def fn(coords):
            f, g = field_with_grad(
                self.field_params, coords, self.field_cfg
            )
            return f[:, 0], jnp.linalg.norm(g, axis=-1)

        return fn

    def export_artifacts(self, out_dir):
        cfg = self.cfg
        os.makedirs(out_dir, exist_ok=True)
        np.save(
            os.path.join(out_dir, "binaries.npy"),
            np.asarray(self.occ_state.binaries)[None],
        )
        if cfg.export_grids:
            if cfg.is_unbounded:
                # memory-bounded chunked h5 export for 360 scenes
                # (reference field_utils.py:160-225, wired at
                # train_field.py's unbounded end-of-run path); the
                # field domain is the contracted cube either way
                extract_field_grid_h5(
                    self.field_with_grad_fn(),
                    os.path.join(out_dir, "grids_valid.h5"),
                    scale=cfg.field_scale,
                    grid_size=cfg.grid_export_size,
                )
            else:
                extract_field_grid(
                    self.field_with_grad_fn(),
                    out_dir,
                    scale=cfg.field_scale,
                    grid_size=cfg.grid_export_size,
                )
            extract_density_grid(
                lambda x: ngp_query_density(
                    self.ngp_params, x, self.aabb, self.ngp_cfg
                )[:, 0],
                out_dir,
                scale=cfg.scale,
                grid_size=cfg.grid_export_size,
            )

    def train(self, log_fn=print):
        cfg = self.cfg
        out_dir = os.path.join(cfg.root, "results", cfg.scene, cfg.exp_name)
        ckpt_dir = os.path.join(cfg.root, "ckpts", cfg.scene, cfg.exp_name)
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        tic = time.time()
        while self.step <= cfg.max_steps:
            step = self.step
            loss, nv, mse = self.train_one_step()
            if cfg.plot_every and step % cfg.plot_every == 0:
                from ..utils.field_plots import plot_field

                plot_field(
                    self.field_with_grad_fn(), out_dir,
                    scale=cfg.field_scale, grid_size=256, step=step,
                )
            if step % cfg.log_every == 0:
                # DP steps return no rgb MSE (mse=None): logging a
                # "psnr" derived from the distillation loss would be
                # meaningless (ADVICE r4 low)
                psnr_str = (
                    "" if mse is None else
                    f"psnr={-10.0 * float(jnp.log(mse)) / np.log(10):.2f}"
                    " | "
                )
                log_fn(
                    f"elapsed={time.time() - tic:.1f}s | step={step} | "
                    f"floss={float(loss):.5f} | {psnr_str}"
                    f"n_samples={nv} | "
                    f"num_rays={self.train_dataset.num_rays}"
                )
            if step > 0 and step % cfg.ckpt_every == 0:
                self.save(os.path.join(ckpt_dir, "field"))
        self.export_artifacts(out_dir)
        self.save(os.path.join(ckpt_dir, "field"))

    def save(self, path):
        save_checkpoint(
            path,
            {
                "field_params": self.field_params,
                "occs": self.occ_state.occs,
                "binaries": self.occ_state.binaries,
                "opt_state": self.opt_state,
                "step": self.step,
            },
        )
