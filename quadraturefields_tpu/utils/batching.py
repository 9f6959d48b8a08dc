"""Dynamic ray-batch sizing with jit-stable shape buckets.

The reference resizes the ray batch every step to hold the *sample*
count constant (train_ngp_nerf_sg_occ.py:303-309). Arbitrary shapes
would force a recompile per step under jit, so requested sizes snap to
a geometric bucket grid (ratio 2^(1/4), multiples of 256): ~40 distinct
shapes across [256, 2^22], each compiled once.
"""
from __future__ import annotations

import math

_RATIO = 2 ** 0.25


def bucket_num_rays(n: int, min_rays: int = 256, max_rays: int = 1 << 22):
    n = max(min_rays, min(int(n), max_rays))
    k = math.ceil(math.log(n / min_rays, _RATIO)) if n > min_rays else 0
    b = min_rays * (_RATIO**k)
    b = int(math.ceil(b / 256.0) * 256)
    return min(b, max_rays)
