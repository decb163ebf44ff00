"""ov3det — TPU-native open-vocabulary 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
timsu1104/Open-vocabulary-3D-Object-Detection (a 3DETR fork with RegionCLIP
distillation for open-vocabulary 3D detection on SUN RGB-D / ScanNet).

Design principles (TPU-first):
  * everything on the hot path is jit-compiled with static shapes;
  * matching (Hungarian), GIoU (incl. rotated BEV), and NMS run on-device —
    no per-iteration host round trips (the reference syncs to CPU for all
    three every step: reference criterion.py:65-86, utils/box_util.py:683-694);
  * data parallelism via jax.sharding.Mesh + GSPMD-inserted collectives;
  * point-cloud set-abstraction ops (FPS, ball query, grouping) have pure-XLA
    reference implementations and fused Pallas kernels.

Layout:
  geometry/   box corner codecs, angle bins, IoU/GIoU (vectorized), NMS
  ops/        FPS, ball query+grouping, Hungarian matching, Pallas kernels
  models/     3DETR detector (flax), positional embeddings, RegionCLIP tower
  losses/     matcher costs + set criterion (fully in-jit)
  datasets/   SUN RGB-D / ScanNet configs, augmentations, synthetic fixture
  engine/     jit train/eval steps, LR schedule, checkpointing
  eval/       parse_predictions, AP calculator, VOC detection eval
  parallel/   device mesh + sharding helpers
  tools/      offline pseudo-label pipeline (2D→3D lifting etc.)
"""

__version__ = "0.1.0"
