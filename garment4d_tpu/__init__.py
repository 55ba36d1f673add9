"""Garment4D-TPU: TPU-native garment reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Garment4D
(hongfz16/Garment4D, NeurIPS 2021): two-stage garment reconstruction from
CLOTH3D point-cloud sequences.

Layers (mirroring the reference's layer map, see SURVEY.md):
  ops/     - point-cloud geometry primitives (pure-XLA + Pallas kernels);
             replaces the reference CUDA extension `pointnet2_cuda`
  nn/      - PointNet++ set-abstraction / feature-propagation blocks, GCN
  smpl/    - SMPL body model + linear blend skinning as batched einsums
  models/  - canonical (PCA) and posed (LBS+GCN) garment models
  losses/  - segmentation / PCA / L2 / interpenetration / Laplacian /
             temporal losses and metrics
  data/    - CLOTH3D sequence dataset + synthetic fixtures
  train/   - jitted train/eval steps, optimizer, checkpointing
  parallel/- device mesh + sharding helpers (data parallelism over B, T)
"""

__version__ = "0.1.0"
