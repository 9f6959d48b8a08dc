"""A/B the stage-1 sample budget on the chip (same-session).

The reference contract targets 2^20 samples/step on chair
(/root/reference/script/run_nerfsynthetic.sh:15-16); bench.py has
historically measured at 2^18. The step carries ~15 ms of fixed
adam/donation glue (tools/profiles/profile_glue.py), so larger batches
amortize it. This runs bench_stage1 at the headline config
(cell L8F4 bf16factor) for samples_log2 in argv (default 18 19 20),
back-to-back so link state is controlled.

Run: python tools/profiles/bench_batch.py [18 19 20]
"""
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (enables the persistent compile cache)

SIZES = [int(a) for a in sys.argv[1:]] or [18, 19, 20]

for s in SIZES:
    sps, windows = bench.bench_stage1(
        layout="cell", grad_payload="bf16factor", n_levels=8,
        n_features=4, samples_log2=s,
    )
    print(f"2^{s}: {sps:,.0f} samples/s "
          f"windows {[round(w, 2) for w in windows]}", flush=True)
