"""quadraturefields_tpu: TPU-native (JAX/XLA/Pallas) rebuild of the
"Volumetric Rendering with Baked Quadrature Fields" (ECCV 2024) pipeline.

Reference capability source: ubc-vision/quadraturefields (CUDA/torch).
This package re-implements every stage of the six-stage pipeline
(NeRF -> quadrature field -> mesh -> finetune -> fit-SG -> bake) with a
TPU-first architecture: fixed-shape packed sample buffers, segmented
associative scans for volume rendering, gather-based multiresolution hash
encoding, bf16 MXU matmuls, and host-side C++ geometry tooling.
"""

__version__ = "0.1.0"
