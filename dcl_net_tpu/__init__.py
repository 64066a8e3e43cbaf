"""DCL-Net TPU: a TPU-native (JAX/XLA/Pallas/pjit) 6D object pose estimation framework.

A from-scratch re-design of the capabilities of Gorilla-Lab-SCUT/DCL-Net
("Deep Correspondence Learning Network", ECCV 2022) for TPU hardware:

- fixed-shape, padded+masked batches (XLA-friendly; no ragged tensors),
- sparse 3D convolution with exact submanifold/regular/avg-pool semantics
  expressed as masked dense convs on the 64^3 grid (MXU path) with a Pallas
  gather-GEMM fast path,
- brute-force masked KNN / 3-NN interpolation via distance matrices + top_k,
- SVD pose orthogonalization inside the jitted graph,
- pjit/shard_map data parallelism over a device mesh,
- optax training (Adam + cyclic/step LR, AutoClip percentile clipping),
- orbax checkpointing and a torch .pth checkpoint converter.

Reference layer map: see SURVEY.md in the repo root.
"""

__version__ = "0.1.0"

from dcl_net_tpu.config import Config  # noqa: F401
from dcl_net_tpu.registry import Registry, MODELS, DATASETS  # noqa: F401
