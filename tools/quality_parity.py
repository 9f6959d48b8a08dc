"""Encoding quality-parity protocol (the BASELINE.md gate runs).

Trains stage-1 on the 64px procedural fixture for 600 equal steps per
encoding variant and prints test PSNR — the ≤0.1 dB gate behind every
throughput-motivated encoding change (VERDICT round-2 #1):

  * corner_cube — the tcnn-parity reference path
    (reference: examples/radiance_fields/ngp.py:340-358 hash encoding)
  * corner_tet  — Kuhn-simplex interpolation (round-1 TPU default)
  * cell_tet    — round-3 cell-layout table (one gather per level)
  * cell_l8f4   — cell layout at L=8/F=4 (halved forward indices at
    equal output width; the TPU-fast recipe encoding)
  * cell_bf16sim — cell layout with bf16-rounded table-gradient
    contributions (emulates grad_payload="bf16pair" on CPU)

Recorded results (2026-08-17, this protocol): corner_cube 15.643 dB /
corner_tet 15.649 / cell_tet 15.617 / cell_l8f4 15.650 / bf16sim
15.621 — all within 0.03 dB. At 1500 steps (fixture saturation):
corner_cube 15.661 / cell_l8f4 15.665.

Run: JAX_PLATFORMS=cpu python tools/quality_parity.py [--steps 600]
(~40 min on the throttled dev host; do not run concurrently with
other CPU-heavy jobs.)

On-chip variant (validates the REAL sorted/bf16pair Pallas kernels
rather than the CPU emulation): python tools/quality_parity.py
--platform tpu --only corner_cube,cell_l8f4_pair
"""
import argparse
import json
import sys

import jax

if "tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
sys.path.insert(0, "/root/repo")

from quadraturefields_tpu.data.fixture import write_fixture_dataset
from quadraturefields_tpu.train.stage1_ngp import Stage1Config, Stage1Trainer

VARIANTS = [
    ("corner_cube", dict(interp="cube", layout="corner")),
    ("corner_tet", dict(interp="tet", layout="corner")),
    ("cell_tet", dict(interp="tet", layout="cell")),
    ("cell_l8f4", dict(interp="tet", layout="cell",
                       n_levels=8, n_features=4)),
    ("cell_bf16sim", dict(interp="tet", layout="cell",
                          grad_payload="bf16sim")),
    ("cell_l8f4_bf16sim", dict(interp="tet", layout="cell",
                               n_levels=8, n_features=4,
                               grad_payload="bf16sim")),
    # on-chip only: the production packed-u32 pair sort + Pallas pair
    # kernel (grad_mode auto resolves to "sorted" on accelerators)
    ("cell_l8f4_pair", dict(interp="tet", layout="cell",
                            n_levels=8, n_features=4,
                            grad_payload="bf16pair")),
    # factorized payload (5-operand sort + product-recompute kernel);
    # grad_mode forced so the CPU run exercises the sorted path's
    # bf16(w)*bf16(g) reference math too
    ("cell_l8f4_factor", dict(interp="tet", layout="cell",
                              n_levels=8, n_features=4,
                              grad_mode="sorted",
                              grad_payload="bf16factor")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant names")
    ap.add_argument("--platform", type=str, default="cpu",
                    choices=["cpu", "tpu"])
    args = ap.parse_args()

    write_fixture_dataset("/tmp/qf_parity/data", res=64, n_train=10,
                          n_test=2)
    names = set(args.only.split(",")) if args.only else None
    results = {}
    for name, kw in VARIANTS:
        if names and name not in names:
            continue
        cfg = Stage1Config(
            scene="fixture", data_root="/tmp/qf_parity/data",
            root="/tmp/qf_parity/runs", exp_name=name,
            max_steps=args.steps, batch_size_log2=12,
            eval_chunk=4096, ckpt_every=10**9, log_every=200, **kw,
        )
        t = Stage1Trainer(cfg)
        while t.step <= cfg.max_steps:
            t.train_one_step()
        m = t.evaluate()
        results[name] = {k: float(v) for k, v in m.items()}
        print(name, results[name], flush=True)
    print("PARITY " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
