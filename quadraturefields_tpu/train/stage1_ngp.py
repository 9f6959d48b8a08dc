"""Stage 1: train the NGP radiance field with an occupancy grid.

TPU-native rebuild of examples/train_ngp_nerf_sg_occ.py: the full train
step (occ-grid-sampled render, smooth-L1 + regularizer loss, Adam with
the reference's warmup/milestone schedule) is one jitted function;
dynamic ray-batch sizing snaps to shape buckets; evaluation renders
full views in fixed chunks. Optionally shards the ray batch across a
1-D device mesh (data parallel over ICI) — see parallel/dp.py.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.nerf_synthetic import SubjectLoader
from ..models.ngp import NGPConfig, ngp_init, ngp_query_density
from ..ops.distortion import flatten_eff_distloss
from ..ops.grid import (
    OccGridConfig,
    occ_grid_init,
    occ_grid_update,
    max_march_steps,
    max_march_steps_cone,
    resolve_coarse_stride as _resolve_coarse_stride,
)
from ..render.renderer import RenderConfig, render_rays_occgrid
from ..utils.batching import bucket_num_rays
from ..utils.checkpoint import save_checkpoint
from ..utils.metrics import lpips_metric, mse, psnr, smooth_l1_loss, ssim
from ..utils.optim import donate_if_accelerator, make_ngp_optimizer


# reference scene-type switch (examples/utils.py:30-45)
MIPNERF360_UNBOUNDED_SCENES = (
    "garden", "bicycle", "bonsai", "counter", "kitchen", "room", "stump",
)


@dataclasses.dataclass
class Stage1Config:
    scene: str = "lego"
    data_root: str = "data/nerf_synthetic"
    exp_name: str = "ngp"
    root: str = "runs/"
    train_split: str = "train"
    max_steps: int = 20000
    init_batch_size: int = 4096
    batch_size_log2: int = 18  # target sample batch 2^batch_size_log2
    occ_thres: float = 0.01
    reg_type: str = "occ"  # occ|entropy|cauchy|both|lol|none|distortion
    o_lambda: float = 1e-3
    c_lambda: float = 1e-5
    num_lobes: int = 2
    num_layers: int = 2
    log2_hashmap_size: int = 19
    interp: str = "tet"       # hash-grid interpolation (hashgrid.py)
    grad_mode: str = "auto"   # table-gradient strategy (hashgrid.py)
    layout: str = "corner"    # hash-table layout (hashgrid.py)
    grad_payload: str = "f32"  # cell table-grad precision (hashgrid.py)
    n_levels: int = 16        # hash-grid levels (tcnn L)
    n_features: int = 2       # features per level (tcnn F)
    scale: float = 1.5
    lr: float = 1e-2
    weight_decay: Optional[float] = None  # per-scene default if None
    grid_resolution: int = 128
    render_step_size: float = 5e-3
    near_plane: float = 0.0
    alpha_thre: float = 0.0
    eval_chunk: int = 8192
    # full-image eval path: "oneshot" renders each chunk in one jit with
    # a 4x sample budget; "window" uses the memory-bounded iterative
    # alive-ray renderer (reference utils.py:175-350); "auto" picks
    # "window" when a chunk's worst-case demand (eval_chunk * max march
    # steps) exceeds the one-shot budget — i.e. exactly when the
    # one-shot path could truncate samples on dense scenes (VERDICT #9)
    eval_renderer: str = "auto"
    ckpt_every: int = 1000
    log_every: int = 100
    seed: int = 42
    # two-level march factor (0 = single-level; exact either way)
    coarse_factor: int = 4
    # coarse probe stride in dt units: -1 auto (one coarse cell — the
    # largest stride with 1-cell dilation; ~4x fewer coarse occupancy
    # gathers, identical sample set), 0 legacy (= coarse_factor), >0
    # explicit
    coarse_stride: int = -1
    max_num_rays: int = 1 << 20
    compute_dtype: str = "bfloat16"
    eval_views: Optional[int] = None  # limit test views (None = all)
    save_images: bool = False
    # optional jax.sharding.NamedSharding to shard the ray batch (DP)
    data_sharding: object = None
    # ray-batch data parallelism over the first `num_devices` devices
    # (0/1 = single-device): the train step and the occupancy refresh
    # run under a 1-D mesh via parallel/dp.py (shard_map + ICI psum)
    num_devices: int = 0
    # unbounded/360: "auto" switches on MIPNERF360_UNBOUNDED_SCENES
    # (reference examples/utils.py:37-45); "360"/"synthetic" force it
    scene_type: str = "auto"
    data_factor: int = 4      # 360 loader downsample factor

    @property
    def is_unbounded(self) -> bool:
        if self.scene_type == "auto":
            return self.scene in MIPNERF360_UNBOUNDED_SCENES
        return self.scene_type == "360"

    @property
    def target_sample_batch_size(self) -> int:
        return 1 << self.batch_size_log2

    @property
    def aabb(self) -> np.ndarray:
        if self.is_unbounded:
            # reference train_ngp_nerf_sg_occ.py:166
            return np.array([-1, -1, -1, 1, 1, 1], np.float32)
        return np.array([-1, -1, -1, 1, 1, 1], np.float32) * self.scale

    # the reference's per-scene-type render knobs
    # (train_ngp_nerf_sg_occ.py:157-204)
    @property
    def eff_render_step_size(self) -> float:
        return 1e-3 if self.is_unbounded else self.render_step_size

    @property
    def eff_near_plane(self) -> float:
        return 0.2 if self.is_unbounded else self.near_plane

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
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_hashmap_size=self.log2_hashmap_size,
            compute_dtype=self.compute_dtype,
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
            alpha_thre=self.eff_alpha_thre,
            cone_angle=self.eff_cone_angle,
            max_steps=max_steps,
            max_samples_total=self.target_sample_batch_size,
            coarse_factor=0 if self.is_unbounded else self.coarse_factor,
            coarse_stride=stride,
            coarse_dilation=dil,
        )


def _regularizer(cfg: Stage1Config, acc, result, viewdirs, origins):
    """The 5 regularizer variants of train_ngp_nerf_sg_occ.py:315-334."""
    if cfg.reg_type == "occ":
        return (cfg.o_lambda * (-acc * jnp.log(acc + 1e-10))).mean()
    if cfg.reg_type == "entropy":
        w = result.weights
        return (cfg.o_lambda * (-w * jnp.log(w + 1e-7))).mean()
    if cfg.reg_type == "cauchy":
        return cfg.c_lambda * jnp.log(1 + result.sigmas**2).mean()
    if cfg.reg_type == "both":
        return (
            (cfg.o_lambda * (-acc * jnp.log(acc + 1e-10))).mean()
            + cfg.c_lambda * jnp.log(1 + result.sigmas**2).mean()
        )
    if cfg.reg_type == "lol":
        w = result.weights
        return (
            cfg.o_lambda
            * jnp.log(jnp.exp(-w) + jnp.exp(-jnp.abs(1 - w)))
        ).mean()
    if cfg.reg_type == "distortion":
        s = result.samples
        idx = jnp.clip(s.ray_indices, 0, origins.shape[0] - 1)
        t_mid = (s.t_starts + s.t_ends)[:, None] / 2.0
        pos = origins[idx] + viewdirs[idx] * t_mid
        m = jnp.abs(jnp.sum(pos * viewdirs[idx], axis=1))
        return cfg.o_lambda * flatten_eff_distloss(
            result.weights,
            m,
            jnp.full_like(result.weights, cfg.render_step_size),
            s.ray_indices,
            origins.shape[0],
        )
    return jnp.zeros(())


class Stage1Trainer:
    def __init__(self, cfg: Stage1Config, train_dataset=None,
                 test_dataset=None):
        self.cfg = cfg
        self.ngp_cfg = cfg.ngp_config()
        self.rcfg = cfg.render_config()
        self.occ_cfg = OccGridConfig(
            resolution=cfg.grid_resolution, occ_thre=cfg.occ_thres
        )
        self.aabb = jnp.asarray(cfg.aabb)

        if cfg.is_unbounded:
            # 360 loader + knobs from the reference unbounded branch
            # (train_ngp_nerf_sg_occ.py:157-180)
            from ..data.nerf_360_v2 import SubjectLoader as Loader360

            self.train_dataset = train_dataset or Loader360(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split=cfg.train_split,
                num_rays=10,
                color_bkgd_aug="random",
                factor=cfg.data_factor,
                seed=cfg.seed,
            )
            self.test_dataset = test_dataset or Loader360(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split="test",
                num_rays=None,
                factor=cfg.data_factor,
            )
        else:
            self.train_dataset = train_dataset or SubjectLoader(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split=cfg.train_split,
                num_rays=cfg.init_batch_size,
                seed=cfg.seed,
            )
            self.test_dataset = test_dataset or SubjectLoader(
                subject_id=cfg.scene,
                root_fp=cfg.data_root,
                split="test",
                num_rays=None,
            )

        key = jax.random.PRNGKey(cfg.seed)
        self.key, init_key = jax.random.split(key)
        self.params = ngp_init(init_key, self.ngp_cfg)
        self.occ_state = occ_grid_init(self.aabb, self.occ_cfg)
        wd = cfg.weight_decay
        if wd is None:
            if cfg.is_unbounded:
                wd = 0.0  # reference train_ngp_nerf_sg_occ.py:164
            else:
                wd = (
                    1e-5
                    if cfg.scene in ("materials", "ficus", "drums")
                    else 1e-6
                )
        self.optimizer = make_ngp_optimizer(
            cfg.max_steps, lr=cfg.lr, weight_decay=wd
        )
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

        self._dp = cfg.num_devices and cfg.num_devices > 1
        if self._dp:
            # DP mode (VERDICT r3 #5): step + occ refresh under a 1-D
            # mesh; params/occ replicated, ray batch sharded
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.dp import (
                make_dp_occ_update,
                make_dp_train_step,
                make_mesh,
            )

            if cfg.reg_type != "occ":
                raise NotImplementedError(
                    "DP stage-1 supports the shipped occ regularizer"
                )
            self.mesh = make_mesh(cfg.num_devices)
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            self._repl_sharding = NamedSharding(self.mesh, P())
            self._dp_train_step = make_dp_train_step(
                self.mesh, self.aabb, self.ngp_cfg, self.rcfg,
                self.optimizer, o_lambda=cfg.o_lambda,
            )
            self._dp_occ_update = make_dp_occ_update(
                self.mesh, self.aabb, self.ngp_cfg, self.occ_cfg,
                self.rcfg.render_step_size,
                contract_aabb=self.aabb if cfg.is_unbounded else None,
            )
            self.params = jax.device_put(self.params, self._repl_sharding)
            self.opt_state = jax.device_put(
                self.opt_state, self._repl_sharding
            )
            self.occ_state = jax.device_put(
                self.occ_state, self._repl_sharding
            )
        self._occ_update = jax.jit(self._occ_update_impl)
        # donate params/opt_state: train_one_step reassigns both from
        # the outputs, so the old buffers are dead — saves an HBM copy
        # of the hash tables every step (the bench harness measured the
        # donated step as the honest training number, BASELINE.md)
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=donate_if_accelerator(0, 1),
        )
        self._eval_render = jax.jit(self._eval_render_impl)
        self._window_render = None  # built lazily on first windowed eval

    # ---- jitted impls ----
    def _occ_update_impl(self, params, occ_state, step, key):
        def occ_eval_fn(x):
            d = ngp_query_density(params, x, self.aabb, self.ngp_cfg)
            return d[..., 0] * self.rcfg.render_step_size

        return occ_grid_update(
            occ_state, step, key, occ_eval_fn, self.occ_cfg,
            contract_aabb=self.aabb if self.cfg.is_unbounded else None,
        )

    def _loss_fn(self, params, occ_state, origins, viewdirs, pixels,
                 bkgd, key):
        result = render_rays_occgrid(
            params, self.aabb, self.ngp_cfg, occ_state, origins, viewdirs,
            self.rcfg, render_bkgd=bkgd, stratified=True, key=key,
        )
        rgb_loss = smooth_l1_loss(result.rgb, pixels)
        acc = result.opacity[:, 0]
        reg = _regularizer(self.cfg, acc, result, viewdirs, origins)
        loss = rgb_loss + reg
        aux = {
            "rgb_loss": rgb_loss,
            "reg": reg,
            "num_valid": result.num_valid,
            "mse": mse(result.rgb, pixels),
        }
        return loss, aux

    def _train_step_impl(
        self, params, opt_state, occ_state, origins, viewdirs, pixels,
        bkgd, key,
    ):
        (loss, aux), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True
        )(params, occ_state, origins, viewdirs, pixels, bkgd, key)
        updates, opt_state = self.optimizer.update(
            grads, opt_state, params
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    def _eval_render_impl(self, params, occ_state, origins, viewdirs):
        # larger sample budget for eval chunks (no dynamic resizing there)
        rcfg = dataclasses.replace(
            self.rcfg,
            max_samples_total=min(
                1 << 20, self.rcfg.max_samples_total * 4
            ),
        )
        return render_rays_occgrid(
            params, self.aabb, self.ngp_cfg, occ_state, origins, viewdirs,
            rcfg, render_bkgd=jnp.ones(3), stratified=False,
        )[:4]

    # ---- host loop ----
    def train_one_step(self):
        cfg = self.cfg
        step = self.step
        self.key, k_occ, k_render = jax.random.split(self.key, 3)

        if step % self.occ_cfg.update_interval == 0:
            if self._dp:
                self.occ_state = self._dp_occ_update(
                    self.params, self.occ_state, jnp.int32(step), k_occ
                )
            else:
                self.occ_state = self._occ_update(
                    self.params, self.occ_state, step, k_occ
                )

        data = self.train_dataset.fetch_train_batch()
        origins = jnp.asarray(data["rays"].origins)
        viewdirs = jnp.asarray(data["rays"].viewdirs)
        pixels = jnp.asarray(data["pixels"])
        bkgd = jnp.asarray(data["color_bkgd"])
        if self._dp:
            from ..parallel.multihost import put_process_batch

            origins, viewdirs, pixels = put_process_batch(
                (origins, viewdirs, pixels), self.mesh,
                self._data_sharding,
            )
        elif cfg.data_sharding is not None:
            origins = jax.device_put(origins, cfg.data_sharding)
            viewdirs = jax.device_put(viewdirs, cfg.data_sharding)
            pixels = jax.device_put(pixels, cfg.data_sharding)

        if self._dp:
            self.params, self.opt_state, loss, aux = self._dp_train_step(
                self.params, self.opt_state, self.occ_state,
                origins, viewdirs, pixels, bkgd, k_render,
            )
        else:
            self.params, self.opt_state, loss, aux = self._train_step(
                self.params, self.opt_state, self.occ_state,
                origins, viewdirs, pixels, bkgd, k_render,
            )

        n_valid = int(aux["num_valid"])
        if cfg.target_sample_batch_size > 0 and step > 100 and n_valid > 0:
            num_rays = int(
                len(pixels) * cfg.target_sample_batch_size / float(n_valid)
            )
            self.train_dataset.update_num_rays(
                bucket_num_rays(num_rays, max_rays=cfg.max_num_rays)
            )
        self.step += 1
        return loss, aux

    def train(self, log_fn=print):
        cfg = self.cfg
        out_dir = os.path.join(cfg.root, "results", cfg.scene, cfg.exp_name)
        ckpt_dir = os.path.join(cfg.root, "ckpts", cfg.scene, cfg.exp_name)
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(out_dir, "args.json"), "w") as f:
            json.dump(
                {k: v for k, v in dataclasses.asdict(cfg).items()
                 if not k.startswith("data_sharding")},
                f, indent=2, default=str,
            )

        from ..utils.logging import ExperimentLogger

        logger = ExperimentLogger(
            os.path.join(cfg.root, "logs", cfg.scene, cfg.exp_name),
            results_dir=out_dir,
        )
        tic = time.time()
        rays_done = 0
        while self.step <= cfg.max_steps:
            step = self.step
            loss, aux = self.train_one_step()
            rays_done += self.train_dataset.num_rays

            if step % cfg.log_every == 0:
                train_psnr = -10.0 * float(jnp.log(aux["mse"])) / np.log(10)
                elapsed = time.time() - tic
                logger.add_scalar("train/loss", float(loss), step)
                logger.add_scalar("train/psnr", train_psnr, step)
                logger.add_scalar(
                    "train/n_rendering_samples",
                    int(aux["num_valid"]), step,
                )
                log_fn(
                    f"elapsed_time={elapsed:.2f}s | step={step} | "
                    f"loss={float(loss):.5f} | psnr={train_psnr:.2f} | "
                    f"n_samples={int(aux['num_valid'])} | "
                    f"num_rays={self.train_dataset.num_rays} | "
                    f"rays/s={rays_done / max(elapsed, 1e-9):.0f}"
                )
            if step > 0 and step % cfg.ckpt_every == 0:
                self.save(os.path.join(ckpt_dir, "ngp"))
        metrics = self.evaluate(out_dir)
        logger.add_scalar("test/psnr", metrics["psnr"], self.step)
        logger.add_scalar("test/ssim", metrics["ssim"], self.step)
        logger.close()
        with open(os.path.join(out_dir, "log.json"), "a") as f:
            json.dump({"step": self.step - 1, **metrics}, f)
        return metrics

    def evaluate(self, out_dir=None):
        cfg = self.cfg
        n_views = len(self.test_dataset)
        if cfg.eval_views is not None:
            n_views = min(n_views, cfg.eval_views)
        psnrs, ssims, lpipss = [], [], []
        H, W = self.test_dataset.HEIGHT, self.test_dataset.WIDTH
        for i in range(n_views):
            data = self.test_dataset.fetch_eval_view(i)
            rgb = self.render_view(data)
            pixels = data["pixels"].reshape(H, W, 3)
            rgb_img = rgb.reshape(H, W, 3)
            psnrs.append(float(psnr(jnp.asarray(rgb_img), jnp.asarray(pixels))))
            ssims.append(float(ssim(jnp.asarray(rgb_img), jnp.asarray(pixels))))
            lpipss.append(lpips_metric(rgb_img, pixels))
            if cfg.save_images and out_dir is not None:
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(out_dir, f"rgb_test_{i:03d}.png"),
                    (np.clip(rgb_img, 0, 1) * 255).astype(np.uint8),
                )
                imageio.imwrite(
                    os.path.join(out_dir, f"rgb_error_{i:03d}.png"),
                    (np.clip(np.abs(rgb_img - pixels), 0, 1) * 255
                     ).astype(np.uint8),
                )
        if cfg.save_images and out_dir is not None:
            self._write_videos(out_dir)
        return {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "lpips": float(np.mean(lpipss)),
        }

    @staticmethod
    def _write_videos(out_dir):
        """Assemble eval PNGs into mp4s (reference
        train_ngp_nerf_sg_occ.py:444-456)."""
        import glob

        import imageio.v2 as imageio

        for pattern, name in (
            ("rgb_test_*.png", "rgb.mp4"),
            ("rgb_error_*.png", "rgb_error.mp4"),
        ):
            frames = sorted(glob.glob(os.path.join(out_dir, pattern)))
            if len(frames) < 2:
                continue
            try:
                imageio.mimsave(
                    os.path.join(out_dir, name),
                    [imageio.imread(f) for f in frames],
                    fps=20,
                )
            except Exception:
                pass  # no video codec in minimal environments

    def _use_window_eval(self) -> bool:
        cfg = self.cfg
        if cfg.eval_renderer == "window":
            return True
        if cfg.eval_renderer == "oneshot":
            return False
        oneshot_budget = min(1 << 20, self.rcfg.max_samples_total * 4)
        return cfg.eval_chunk * self.rcfg.max_steps > oneshot_budget

    def render_view(self, data):
        """Full-image render in fixed chunks; per-chunk the one-shot
        renderer or (when the chunk's worst-case sample demand exceeds
        the one-shot budget) the memory-bounded iterative window
        renderer — the reference's render_image_with_occgrid_test
        switch (utils.py:175-350)."""
        cfg = self.cfg
        use_window = self._use_window_eval()
        if use_window and self._window_render is None:
            from ..render.renderer import make_test_renderer

            # budget == chunk * window_steps: a window can NEVER
            # truncate (budget equals its worst-case demand) while peak
            # memory stays bounded by ~2^20 samples per call
            wsteps = int(np.clip((1 << 20) // cfg.eval_chunk, 16, 256))
            self._window_render = make_test_renderer(
                self.params, self.aabb, self.ngp_cfg, self.rcfg,
                window_steps=wsteps,
                window_budget=cfg.eval_chunk * wsteps,
            )
        origins = np.asarray(data["rays"].origins)
        viewdirs = np.asarray(data["rays"].viewdirs)
        n = origins.shape[0]
        chunk = cfg.eval_chunk
        n_pad = (n + chunk - 1) // chunk * chunk
        o = np.concatenate([origins, np.zeros((n_pad - n, 3), np.float32)])
        d = np.concatenate(
            [viewdirs, np.tile([[0, 0, 1.0]], (n_pad - n, 1))]
        ).astype(np.float32)
        outs = []
        for i in range(0, n_pad, chunk):
            oc = jnp.asarray(o[i:i + chunk])
            dc = jnp.asarray(d[i:i + chunk])
            if use_window:
                rgb, _, _, _ = self._window_render(
                    self.occ_state, oc, dc, render_bkgd=jnp.ones(3),
                    params=self.params,
                )
            else:
                rgb, _, _, _ = self._eval_render(
                    self.params, self.occ_state, oc, dc,
                )
            outs.append(np.asarray(rgb))
        return np.concatenate(outs)[:n]

    def save(self, path):
        save_checkpoint(
            path,
            {
                "params": self.params,
                "occs": self.occ_state.occs,
                "binaries": self.occ_state.binaries,
                "opt_state": self.opt_state,
                "step": self.step,
            },
        )
