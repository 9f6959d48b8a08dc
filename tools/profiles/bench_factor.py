"""A/B the factorized backward payload on the chip at bench scale.

Runs bench.py's bench_stage1 (2^18 samples/step, occ refresh included)
for the L8F4 cell config with grad_payload bf16pair (the shipped
17->9-operand... at F=4: 17-operand path) vs bf16factor (5-operand
sort + product-recompute kernel). Same-session back-to-back so link
state is controlled.

Run: python tools/profiles/bench_factor.py [pair|factor]...
"""
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (enables the persistent compile cache)

WHICH = sys.argv[1:] or ["factor", "pair"]

for name in WHICH:
    payload = {"pair": "bf16pair", "factor": "bf16factor"}[name]
    sps, windows = bench.bench_stage1(
        layout="cell", grad_payload=payload, n_levels=8, n_features=4
    )
    print(f"{name} ({payload}): {sps:,.0f} samples/s "
          f"windows {[round(w, 2) for w in windows]}", flush=True)
