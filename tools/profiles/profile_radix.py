"""Price the Pallas-radix-binning replacement for the backward sort
(VERDICT r3 #4 / PERF_NOTES round-2 plan step 3) with on-chip numbers.

The backward's one `lax.sort` carries key + 4 payload u32 operands
(bf16factor, hashgrid_sorted.py:428-445). Any radix/binning scheme on
v5e decomposes into:
  1. digit histogram            — cheap (one-hot MXU matmul, measured)
  2. rank/offset computation    — cheap (scans)
  3. APPLYING the permutation   — the wall: Mosaic has no vector
     scatter (PERF_NOTES probe table), so the reorder must be an XLA
     gather of the payload columns at computed indices.
So the decision reduces to: is
    2-op sort (key,iota) + 4-column permutation gather
cheaper than the monolithic 5-op sort? This probe measures both, plus
the components, at the 2^20-contract contribution count (8.4M for cell
L8F4) and the khady 2^22 count (33.5M).

Run (idle chip): python tools/profiles/profile_radix.py [log2_M ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

if os.environ.get("QF_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/qf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import functools
import json

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=6, warm=2):
    for _ in range(warm):
        out = fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[..., :1]))  # host-transfer sync
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


@jax.jit
def sort5(key, p0, p1, p2, p3):
    return jax.lax.sort((key, p0, p1, p2, p3), num_keys=1)


@jax.jit
def sort2_gather(key, p0, p1, p2, p3):
    m = key.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    k_s, perm = jax.lax.sort((key, iota), num_keys=1)
    return k_s, p0[perm], p1[perm], p2[perm], p3[perm]


@jax.jit
def sort2_only(key):
    m = key.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    return jax.lax.sort((key, iota), num_keys=1)


@jax.jit
def perm_gather4(perm, p0, p1, p2, p3):
    return p0[perm], p1[perm], p2[perm], p3[perm]


def histogram_onehot_mxu(key, n_buckets=128, j=1024):
    """The radix pipeline's feasible half: per-bucket counts via
    one-hot MXU matmuls (Pallas-equivalent cost modeled in XLA — the
    matmul IS the kernel's only op, so XLA's fused lowering is the
    same systolic work)."""
    m = key.shape[0]
    bucket = (key >> jnp.uint32(19)).astype(jnp.int32) % n_buckets
    oh = jax.nn.one_hot(
        bucket.reshape(m // j, j), n_buckets, dtype=jnp.bfloat16
    )
    return jnp.sum(
        jnp.sum(oh, axis=1).astype(jnp.float32), axis=0
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [23, 25]
    rng = np.random.default_rng(0)
    out = {}
    for lg in sizes:
        m = 1 << lg
        key = jnp.asarray(
            rng.integers(0, 1 << 26, m, dtype=np.uint32)
        )
        pays = [
            jnp.asarray(rng.integers(0, 1 << 32, m, dtype=np.uint32))
            for _ in range(4)
        ]
        perm = jnp.asarray(rng.permutation(m).astype(np.int32))
        r = {
            "sort5_ms": timed(sort5, key, *pays) * 1e3,
            "sort2_ms": timed(sort2_only, key) * 1e3,
            "sort2_gather_ms": timed(sort2_gather, key, *pays) * 1e3,
            "perm_gather4_ms": timed(perm_gather4, perm, *pays) * 1e3,
            "histogram_mxu_ms": timed(
                jax.jit(functools.partial(histogram_onehot_mxu)), key
            ) * 1e3,
        }
        out[f"M=2^{lg}"] = {k: round(v, 2) for k, v in r.items()}
        print(f"M=2^{lg}: {out[f'M=2^{lg}']}", flush=True)
    print("PROFILE_RADIX " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
