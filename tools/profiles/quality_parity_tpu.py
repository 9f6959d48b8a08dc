"""TPU-side quality-parity run (VERDICT r3 #7): corner/f32/L16F2
(tcnn-parity layout) vs cell/L8F4/bf16factor (TPU-fast headline) on
the SAME fixture at a non-saturating regime, on the real chip — so
bf16 behavior on actual hardware is covered and the configs are
compared where PSNR differences are not compressed by a fixture
ceiling (the round-3 gate sat at the 15.66 dB 64px ceiling).

Fixture: 200x200, 12 train / 2 test views (the bench fixture), both
runs same seed/steps/batch. Reports per-config eval PSNR/SSIM and the
delta. Non-saturating: expect ~25-35 dB here, so a real quality gap
would show.

Run (idle chip): python tools/profiles/quality_parity_tpu.py [steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

if os.environ.get("QF_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2500

from quadraturefields_tpu.data.fixture import write_fixture_dataset
from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer

root = "/tmp/qf_bench_fixture"
if not os.path.exists(os.path.join(root, "fixture", "transforms_test.json")):
    write_fixture_dataset(root, res=200, n_train=12, n_test=2)

CONFIGS = {
    "corner_f32_l16f2": dict(
        layout="corner", grad_payload="f32", n_levels=16, n_features=2),
    "cell_l8f4_factor": dict(
        layout="cell", grad_payload="bf16factor", n_levels=8,
        n_features=4),
}

out = {"steps": STEPS}
for name, enc in CONFIGS.items():
    cfg = Stage1Config(
        scene="fixture", data_root=root, root=f"/tmp/qf_parity/{name}",
        max_steps=STEPS, init_batch_size=8192, batch_size_log2=17,
        grid_resolution=128, render_step_size=5e-3, num_lobes=0,
        eval_chunk=2048, ckpt_every=10**9, log_every=1000,
        save_images=False, **enc,
    )
    t0 = time.time()
    trainer = Stage1Trainer(cfg)
    metrics = trainer.train()
    out[name] = {
        "psnr": round(float(metrics["psnr"]), 3),
        "ssim": round(float(metrics["ssim"]), 4),
        "wall_s": round(time.time() - t0, 1),
    }
    print(f"{name}: {out[name]}", flush=True)

d = out["cell_l8f4_factor"]["psnr"] - out["corner_f32_l16f2"]["psnr"]
out["delta_db_headline_minus_parity"] = round(d, 3)
print("QUALITY_PARITY_TPU " + json.dumps(out), flush=True)
