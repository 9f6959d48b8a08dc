"""On-chip stage-1 throughput for cell-layout encoding variants.

The L=8/F=4 cell variant halves the forward gather indices (8 instead
of 16 per point) at equal output width (32 floats/point) and equal
fixture quality (tools/quality_parity.py: +0.007 dB vs corner_cube at
600 steps, +0.004 at 1500). This records what that buys at bench scale
on the real chip, next to the L=16/F=2 cell ladder in BASELINE.md.

Run (chip must be idle): python tools/profiles/bench_l8f4.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_stage1  # noqa: E402


def main():
    out = {}
    for name, kw in [
        ("cell_l8f4_f32", dict(layout="cell", n_levels=8,
                               n_features=4)),
        ("cell_l8f4_bf16pair", dict(layout="cell", n_levels=8,
                                    n_features=4,
                                    grad_payload="bf16pair")),
        ("cell_l16f2_bf16pair_control", dict(layout="cell",
                                             grad_payload="bf16pair")),
    ]:
        sps, windows = bench_stage1(**kw)
        out[name] = {"samples_per_sec": round(sps, 1),
                     "windows_s": [round(t, 3) for t in windows]}
        print(name, out[name], flush=True)
    print("L8F4 " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
