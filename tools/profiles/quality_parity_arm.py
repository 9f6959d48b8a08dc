"""One extra quality_parity_tpu arm (same fixture/protocol): pass a
config name from CONFIGS. Used round 5 to test cell L16F2 bf16factor
(equal level count to corner, cell layout at 2^16 rows) after the
200x200 runs exposed a real L8F4 capacity gap the 64px fixture ceiling
had hidden.

Run: python tools/profiles/quality_parity_arm.py <name> [steps]
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

from quadraturefields_tpu.data.fixture import write_fixture_dataset
from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer

CONFIGS = {
    "corner_f32_l16f2": dict(
        layout="corner", grad_payload="f32", n_levels=16, n_features=2),
    "cell_l8f4_factor": dict(
        layout="cell", grad_payload="bf16factor", n_levels=8,
        n_features=4),
    "cell_l16f2_factor": dict(
        layout="cell", grad_payload="bf16factor", n_levels=16,
        n_features=2),
}

name = sys.argv[1]
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2500

root = "/tmp/qf_bench_fixture"
if not os.path.exists(os.path.join(root, "fixture", "transforms_test.json")):
    write_fixture_dataset(root, res=200, n_train=12, n_test=2)

cfg = Stage1Config(
    scene="fixture", data_root=root, root=f"/tmp/qf_parity/{name}",
    max_steps=STEPS, init_batch_size=8192, batch_size_log2=17,
    grid_resolution=128, render_step_size=5e-3, num_lobes=0,
    eval_chunk=2048, ckpt_every=10**9, log_every=1000,
    save_images=False, **CONFIGS[name],
)
t0 = time.time()
trainer = Stage1Trainer(cfg)
metrics = trainer.train()
out = {
    "config": name, "steps": STEPS,
    "psnr": round(float(metrics["psnr"]), 3),
    "ssim": round(float(metrics["ssim"]), 4),
    "wall_s": round(time.time() - t0, 1),
}
print("QUALITY_PARITY_ARM " + json.dumps(out), flush=True)
